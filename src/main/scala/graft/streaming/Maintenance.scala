package graft.streaming

import org.apache.spark.sql.SparkSession

/** Small-file maintenance shared by streaming sinks that append one tiny
  * parquet file per micro-batch ([[DocStreams.nearDupCurateToLake]]'s
  * corpus-key artifact, [[EventStreams.abMonitorSink]]'s state store):
  * without periodic compaction a long-lived stream accretes one file per
  * batch and every per-batch re-read pays one file open per HISTORICAL
  * batch — O(batches) listing cost for a few KB of state. The fix is the
  * same everywhere, so it lives here once.
  */
object Maintenance {

  /** Compact a parquet directory in place: read → exact-row `distinct()`
    * → `coalesce(targetFiles)` → complete write to a sibling temp dir →
    * two-rename swap, old directory deleted last.
    *
    * Consumer-identity argument: `distinct()` removes only EXACT row
    * duplicates — replay/crash artifacts, never two legitimate rows
    * (their key differs) — so any consumer that aggregates or logically
    * dedups over the rows reads identical results pre/post compaction.
    *
    * Safe to call from INSIDE the owning stream's `foreachBatch`:
    * micro-batches of one stream run serially, so no concurrent append
    * exists within the callback. Compaction from OUTSIDE a running
    * stream races its appends — run that variant only while the stream
    * is STOPPED. A crash mid-swap is recovered on the next call (or by
    * the stream's own pre-read [[recoverSwap]]): the temp directory is a
    * COMPLETE materialized write before any rename, so a missing live
    * dir with a complete temp rolls FORWARD. Returns the compacted row
    * count.
    */
  def compactParquetDir(spark: SparkSession, path: String,
                        targetFiles: Int = 1): Long = {
    require(targetFiles >= 1, s"targetFiles must be positive: $targetFiles")
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    recoverSwap(fs, path)
    require(fs.exists(p), s"nothing to compact at $path")
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "__compact_old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old)) fs.delete(old, true)
    val compacted = spark.read.parquet(path).distinct()
      .coalesce(targetFiles)
      .localCheckpoint() // count + write from one materialization
    compacted.write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(p, old), s"compaction swap failed moving $p aside")
    require(fs.rename(tmp, p), s"compaction swap failed moving $tmp in place")
    fs.delete(old, true)
    compacted.count()
  }

  /** Roll an interrupted [[compactParquetDir]] swap FORWARD: the only
    * crash window that leaves the live directory missing is after the
    * live→old rename and before the tmp→live rename — at which point the
    * temp directory is a complete, committed parquet write (it is fully
    * written BEFORE the first rename), so renaming it into place finishes
    * the compaction the crash interrupted. Every other window leaves the
    * live directory intact and at worst some leftover temp/old debris,
    * which the next compaction clears. No-op when the live dir exists.
    * Call BEFORE any read of — or append to — the directory: an append
    * that recreates a missing live dir would strand the complete temp.
    */
  def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
                  path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "__compact_old")
    if (!fs.exists(p) && fs.exists(tmp)) {
      require(fs.rename(tmp, p),
        s"compaction recovery failed moving $tmp into place")
      fs.delete(old, true)
    }
  }
}

package graft.streaming

import graft.functions.Text
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Continuous CORPUS ingest — the streaming face of the curation pipeline:
  * a crawl keeps dropping document files; each micro-batch is
  * NFC-normalized, quality-filtered, exact-deduped within the batch and
  * against the standing table, and appended to the lake. The batch
  * operators (`Text`, `Incremental`) are reused verbatim inside
  * `foreachBatch`, so stream and batch curation can never drift.
  */
object DocStreams {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source document stream (one file per crawl drop). */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Curating ingest sink. Per micro-batch:
    *
    *  1. `text` → NFC (composed/decomposed crawl spellings collapse BEFORE
    *     any fingerprint — the dedup-miss q109/FunctionsSpec pins);
    *  2. quality floor (`Text.qualityScore ≥ minQuality`);
    *  3. exact dedup on the normalized fingerprint: within the batch, then
    *     against the standing table via the bloom-prefilter + exact-verify
    *     path ([[graft.operators.Incremental.newRows]] — replay-idempotent
    *     without a marker, same contract as `EventStreams.dedupToLake`);
    *  4. append survivors (fingerprint persisted as `fp` for the next
    *     batch's verify — no rescan of text).
    *
    * SCALE: each batch touches the standing table only through the bloom
    * sidecar + the id-join verify; text never joins against the corpus.
    */
  def curateToLake(docs: DataFrame, lake: graft.sources.Lake, zone: String,
                   table: String, checkpoint: String,
                   minQuality: Double = 0.0,
                   expectedItems: Long = 1L << 20):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val cleaned = batch.toDF()
          .withColumn("text", Text.normalizeUnicode(col("text")))
          .where(Text.qualityScore(col("text")) >= minQuality)
          .withColumn("fp", Text.fingerprint(col("text")))
          .dropDuplicates("fp")
        val p = lake.path(zone, table)
        val hp = new org.apache.hadoop.fs.Path(p)
        val exists = hp.getFileSystem(spark.sessionState.newHadoopConf()).exists(hp)
        val survivors =
          if (!exists) cleaned
          else graft.operators.Incremental.newRows(cleaned,
            lake.read(spark, zone, table).select("fp"), "fp", expectedItems)
        // pin BEFORE appending: the survivor plan reads the directory it
        // appends to (same rule as EventStreams.dedupToLake)
        survivors.localCheckpoint().write.mode("append").parquet(p)
      }
      .start()

  /** NEAR-dup curating ingest — [[curateToLake]]'s screen upgraded from
    * exact fingerprints to banded MinHash against a PRECOMPUTED corpus-key
    * artifact ([[graft.operators.Incremental.bandedKeys]], read from
    * `corpusKeysPath`): the 100 TB ingest shape where the standing corpus
    * is never re-shingled per batch. Per micro-batch:
    *
    *  1. batch docs screen against the stored corpus keys
    *     ([[graft.operators.Incremental.minhashNewDocs]] — band collision
    *     = dup, saturation semantics included);
    *  2. survivors ALSO near-dup within the batch itself (one batch-local
    *     LSH pass — a crawl drop repeating its own boilerplate must not
    *     land twice);
    *  3. survivors append to the lake AND their band keys append to the
    *     corpus-key artifact, so the NEXT batch screens against them —
    *     the artifact grows incrementally, no corpus rescan ever.
    *
    * Replay safety: a replayed batch's docs collide with their own stored
    * keys and drop — key-idempotent without a marker, the
    * [[curateToLake]] contract.
    */
  def nearDupCurateToLake(docs: DataFrame, lake: graft.sources.Lake,
                          zone: String, table: String,
                          corpusKeysPath: String, checkpoint: String,
                          shingleSize: Int = 3, numHashes: Int = 16,
                          bands: Int = 4, maxCorpusBucket: Int = 4096):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val kp = new org.apache.hadoop.fs.Path(corpusKeysPath)
        val exists =
          kp.getFileSystem(spark.sessionState.newHadoopConf()).exists(kp)
        val screened =
          if (!exists) batch.toDF()
          else graft.operators.Incremental.minhashNewDocsAgainstKeys(
            batch.toDF(), spark.read.parquet(corpusKeysPath), "doc_id",
            "text", shingleSize, numHashes, bands, maxCorpusBucket)
        // batch-local near-dup: keep each within-batch cluster's min id
        val survivors = graft.operators.Dedup.minhashKeepIdsTransitive(
            screened, "doc_id", "text", shingleSize, numHashes, bands)
          .join(screened, Seq("doc_id"))
          .localCheckpoint() // pinned: read before the writes land below
        survivors.write.mode("append").parquet(lake.path(zone, table))
        graft.operators.Incremental.bandedKeys(survivors, "doc_id", "text",
            shingleSize, numHashes, bands)
          .write.mode("append").parquet(corpusKeysPath)
      }
      .start()
}

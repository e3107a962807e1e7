package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-root abstraction for the data-lake layout: the same code runs
  * against a local directory (`file:///...`), HDFS, or Azure Data Lake
  * (`abfss://container@account.dfs.core.windows.net/...`) — Spark resolves
  * the scheme through its Hadoop filesystem connectors, so nothing here is
  * path-scheme-specific.
  *
  * Layout convention (medallion): `<root>/<zone>/<table>` with zones
  * `bronze` (raw), `silver` (conformed), `gold` (marts). Facts are written
  * date-partitioned; dims plain.
  *
  * For ADLS the cluster supplies auth via standard hadoop-azure configs
  * (e.g. `spark.hadoop.fs.azure.account.auth.type.<account>.dfs.core.windows.net`
  * = `OAuth` plus the client-credential keys, or an account key) — config
  * only, no code change. This container has no network egress, so tests
  * exercise the `file://` scheme; the path arithmetic is identical.
  */
final case class Lake(root: String) {
  private def clean(s: String) = s.stripSuffix("/")

  def path(zone: String, table: String): String = s"${clean(root)}/$zone/$table"

  def read(spark: SparkSession, zone: String, table: String): DataFrame =
    spark.read.parquet(path(zone, table))

  def write(df: DataFrame, zone: String, table: String,
            partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path(zone, table))
  }

  /** Read `target` presenting each partition column with the dtype it has in
    * `updates` — the merge-side contract the partition-scoped [[upsert]]
    * depends on. A plain `spark.read.parquet` INFERS partition dtypes from
    * the directory names: `month=01` infers as int `1`, and after union
    * coercion a dynamic partition overwrite would lay down `month=1` BESIDE
    * the stale `month=01` directory, silently resurrecting replaced rows on
    * the next read. Reading with an explicit schema instead parses the raw
    * path string directly as the declared type, so a string column keeps
    * `"01"` verbatim.
    *
    * Fails loudly (instead of corrupting) when the table's on-disk layout
    * cannot canonically carry the requested dtype: a raw directory value
    * that does not parse as the dtype (`month=abc` as int), or one whose
    * re-rendering differs from the directory name (`month=01` as int
    * renders `month=1` — the resurrection case in the other direction).
    * The check walks partition DIRECTORIES only (metadata-bounded: one
    * name per partition value per level), never data files.
    */
  private[sources] def readWithPartitionTypesOf(
      spark: SparkSession, target: String,
      partitionCols: Seq[String], updates: DataFrame): DataFrame = {
    if (partitionCols.isEmpty) return spark.read.parquet(target)
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.types.{StringType, StructType}
    val wanted = updates.schema
    partitionCols.foreach(c => require(wanted.fieldNames.contains(c),
      s"partition column '$c' missing from updates"))
    val tz = Option(spark.sessionState.conf.sessionLocalTimeZone)
    val root = new org.apache.hadoop.fs.Path(target)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // Raw (unescaped) directory values per partition level.
    var level = Seq(root)
    partitionCols.foreach { c =>
      val next = level.flatMap { d =>
        fs.listStatus(d).filter(_.isDirectory).map(_.getPath)
          .filter(_.getName.startsWith(s"$c="))
      }
      val dt = wanted(c).dataType
      next.map(_.getName.drop(c.length + 1)).distinct.foreach { esc =>
        val raw = ExternalCatalogUtils.unescapePathName(esc)
        require(raw != ExternalCatalogUtils.DEFAULT_PARTITION_NAME,
          s"null partition value under '$target' for '$c'; upsert requires non-null partition values")
        if (dt != StringType) {
          val parsed = Cast(Literal(raw), dt, tz).eval()
          require(parsed != null,
            s"partition dir '$c=$raw' of '$target' does not parse as $dt — " +
              s"updates' dtype for '$c' does not match the table layout")
          val rendered = Cast(Literal.create(parsed, dt), StringType, tz).eval().toString
          require(rendered == raw,
            s"partition dir '$c=$raw' of '$target' re-renders as '$c=$rendered' under " +
              s"$dt — a dynamic overwrite would write '$c=$rendered' beside the stale " +
              s"'$c=$raw' directory; align updates' dtype for '$c' with the table layout")
        }
      }
      level = next
    }
    // Inferred schema gives the data-field types and column order; only the
    // partition columns' dtypes are overridden.
    val inferred = spark.read.parquet(target).schema
    val fixed = StructType(inferred.map(f =>
      if (partitionCols.contains(f.name)) f.copy(dataType = wanted(f.name).dataType)
      else f))
    spark.read.schema(fixed).parquet(target)
  }

  /** MERGE-style keyed upsert: rows in `updates` replace current rows with
    * the same `key`; among collisions the greatest `versionCol` wins, and at
    * equal versions the incoming row wins.
    *
    * `deleteCol` (MERGE's WHEN MATCHED AND flag THEN DELETE): an update row
    * whose boolean flag is true deletes its key — IF it wins the version
    * race. A stale delete (older version than the current row) loses and is
    * discarded; a delete for an absent key is a no-op; the winning delete
    * leaves no tombstone, so a later higher-versioned insert simply
    * re-creates the key. The flag column never persists to the table.
    *
    * ISOLATION: plain parquet has no MVCC, so this is read → union →
    * window-dedup → snapshot rewrite (`localCheckpoint` pins the merged
    * result before overwriting its own source, same safety as
    * `Tables.replaceTable`). Writers serialize per call, but a READER whose
    * plan was resolved before the overwrite observes the file swap:
    * FileNotFound or the new snapshot — never the old isolated snapshot
    * (LakeSpec documents this gap). On Delta/Iceberg the identical call
    * site maps to `MERGE INTO`, which rewrites only touched files and
    * gives readers snapshot isolation. The dedup is one shuffle on `key`.
    *
    * SCALE: when `partitionCols` is given (and matches how the table was
    * written), the rewrite is PARTITION-SCOPED — the touched partition
    * values are collected from `updates` (driver-bounded: one tuple per
    * touched partition), the current-table read is statically pruned to
    * those partitions, and the write uses dynamic partition overwrite, so
    * untouched partition files are never read or rewritten. A one-key
    * upsert on a date-partitioned 100 TB table moves one day, not 100 TB.
    * Requires keys to be partition-stable (a key never moves partitions —
    * standard for facts keyed within their partition date); partition
    * values must be non-null. Without `partitionCols` the full-table
    * rewrite of round 2 applies. For reader snapshot isolation and
    * time travel on top of the same scoping, see [[VersionedLake]].
    */
  def upsert(spark: SparkSession, zone: String, table: String,
             updates: DataFrame, key: String, versionCol: String,
             deleteCol: Option[String] = None,
             partitionCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val target = path(zone, table)
    val hconf = spark.sessionState.newHadoopConf()
    val exists = {
      val p = new org.apache.hadoop.fs.Path(target)
      p.getFileSystem(hconf).exists(p)
    }
    // Touched-partition tuples, collected once on the driver. Bounded by
    // the number of partitions the batch touches, not by data size.
    val touched: Array[org.apache.spark.sql.Row] =
      if (partitionCols.isEmpty) Array.empty
      else updates.select(partitionCols.map(col): _*).distinct().collect()
    // Static pruning via per-column IN-lists (compact predicates — an
    // OR-of-tuples disjunction grows with the touched count and bloats
    // analysis/codegen at thousands of partitions). For one partition
    // column IN is exact; for several, the per-column INs prune to the
    // cross-product superset and the tuple disjunction (only then needed)
    // restores exactness after the scan.
    def pruneToTouched(df: DataFrame): DataFrame =
      if (touched.isEmpty) df
      else {
        val inLists = partitionCols.zipWithIndex.map { case (c, i) =>
          col(c).isin(touched.map(_.get(i)).distinct.toIndexedSeq: _*)
        }.reduce(_ && _)
        if (partitionCols.length == 1) df.where(inLists)
        else df.where(inLists && touched.map { r =>
          partitionCols.zipWithIndex
            .map { case (c, i) => col(c) <=> lit(r.get(i)) }
            .reduce(_ && _)
        }.reduce(_ || _))
      }
    val current =
      if (exists)
        Some(pruneToTouched(readWithPartitionTypesOf(spark, target,
          partitionCols, updates)))
      else None
    // A persisted column with the flag's name (business data, or leaked by
    // an earlier flag-less upsert whose updates carried it) would make
    // current rows deletable by their own stored values — refuse loudly
    // rather than risk silent data loss.
    for (d <- deleteCol; c <- current)
      require(!c.columns.contains(d),
        s"deleteCol '$d' collides with a persisted column of '$table'; rename the flag")
    val merged = current match {
      // allowMissingColumns: current rows carry a NULL delete flag when
      // the table was written without one
      case Some(c) => c.withColumn("__src", lit(0))
        .unionByName(updates.withColumn("__src", lit(1)),
          allowMissingColumns = true)
      case None => updates.withColumn("__src", lit(1))
    }
    val w = Window.partitionBy(key)
      .orderBy(col(versionCol).desc, col("__src").desc)
    val winners = merged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    val alive = deleteCol match {
      // Only an UPDATE row can delete (__src = 1): a column of the same
      // name already persisted in the table (business data, or leaked by a
      // prior flag-less upsert) must never delete keys this batch didn't
      // touch.
      case Some(d) =>
        winners.where(!(coalesce(col(d), lit(false)) && col("__src") === 1))
          .drop(d)
      case None => winners
    }
    val result = alive.drop("__rn", "__src").localCheckpoint(eager = true)
    if (partitionCols.isEmpty || !exists) {
      val w = result.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(target)
    } else {
      // Dynamic partition overwrite: only partitions PRESENT in `result`
      // (⊆ touched) are replaced; everything else is untouched on disk.
      result.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCols: _*)
        .parquet(target)
      // A touched partition whose keys were ALL deleted has no surviving
      // rows, so dynamic overwrite never visits it — drop its directory
      // explicitly or the deleted keys would resurrect on the next read.
      val survived = result.select(partitionCols.map(col): _*).distinct()
        .collect().map(_.toSeq).toSet
      val fs = new org.apache.hadoop.fs.Path(target).getFileSystem(hconf)
      for (r <- touched if !survived.contains(r.toSeq)) {
        // Spark escapes partition path values (':', '#', '%', …) when it
        // lays down directories — build the delete path through the same
        // escaping or values like "a:b" would dodge the cleanup and their
        // deleted keys would resurrect on the next read.
        val dir = partitionCols.zipWithIndex
          .map { case (c, i) =>
            s"$c=${org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .escapePathName(String.valueOf(r.get(i)))}"
          }.mkString("/")
        fs.delete(new org.apache.hadoop.fs.Path(s"$target/$dir"), true)
      }
    }
  }

  /** Small-file compaction: rewrite a table into `numFiles` right-sized
    * files. Streaming ingest (one file per micro-batch per partition) decays
    * scan throughput — open/footer costs dominate once files ≪ the 128 MB
    * split size; periodic compaction restores it. Snapshot-pinned like
    * [[upsert]]; on Delta/Iceberg this is OPTIMIZE / rewrite_data_files.
    */
  def compact(spark: SparkSession, zone: String, table: String,
              numFiles: Int): Unit = {
    require(numFiles > 0)
    read(spark, zone, table)
      .localCheckpoint(eager = true)
      .repartition(numFiles)
      .write.mode("overwrite").parquet(path(zone, table))
  }

  /** Retention vacuum: delete ORPHANED files under a table directory —
    * files no longer part of the current snapshot (left behind by crashed
    * overwrite jobs, e.g. `_temporary` attempt dirs) whose modification
    * time is older than `olderThanMs`. Files the live snapshot references
    * (data files + `_SUCCESS`) are never touched, so a concurrent reader
    * of the CURRENT snapshot is safe; the age bound is what protects
    * still-running zombie writers, exactly like Delta's VACUUM retention
    * (where the manifest, not the directory listing, defines liveness).
    * Returns the number of files deleted.
    */
  def vacuum(spark: SparkSession, zone: String, table: String,
             olderThanMs: Long): Int = {
    val target = new org.apache.hadoop.fs.Path(path(zone, table))
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(target)) return 0
    // liveness = the files Spark's reader resolves for the current snapshot
    val live = spark.read.parquet(path(zone, table)).inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    val it = fs.listFiles(target, true)
    var deleted = 0
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath
      val isLive = live.contains(p.toUri.getPath) || p.getName == "_SUCCESS"
      if (!isLive && f.getModificationTime < cutoff && fs.delete(p, false))
        deleted += 1
    }
    deleted
  }

  /** Read with schema evolution: union the schemas of all files so a table
    * whose ingest added columns over time presents the full schema, older
    * files padding the new columns with NULL (parquet `mergeSchema`).
    */
  def readEvolved(spark: SparkSession, zone: String, table: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path(zone, table))

  /** Incremental aggregate maintenance: fold a batch of pre-aggregated
    * deltas into a gold table — union current + delta, re-sum on the keys.
    * Additive measures only (sum/count; avg must travel as sum+count).
    * The combine shuffles |gold| + |delta| rows on the group key — gold
    * tables are aggregate-sized, orders below the facts; on Delta this
    * becomes MERGE WHEN MATCHED THEN UPDATE SET x = x + delta.
    *
    * With `partitionCols` (must be a subset of `keys`, so groups never span
    * partitions) the fold is partition-scoped like [[upsert]]: only the
    * partitions present in `delta` are read, re-summed, and dynamically
    * overwritten — an hourly delta into a year-partitioned gold table
    * touches one partition, not the year.
    */
  def mergeAggregate(spark: SparkSession, zone: String, table: String,
                     delta: DataFrame, keys: Seq[String],
                     sumCols: Seq[String],
                     partitionCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions._
    require(partitionCols.forall(keys.contains),
      "partitionCols must be group keys, or groups would span partitions")
    val target = path(zone, table)
    val exists = {
      val p = new org.apache.hadoop.fs.Path(target)
      p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
    }
    val touched: Array[org.apache.spark.sql.Row] =
      if (partitionCols.isEmpty) Array.empty
      else delta.select(partitionCols.map(col): _*).distinct().collect()
    // Same compact IN-list pruning as upsert's pruneToTouched, over the
    // same dtype-canonicalized read (partition inference would coerce a
    // string 'hr=01' layout to int and corrupt the dynamic overwrite —
    // identical hazard to upsert's).
    val current =
      if (!exists) None
      else if (touched.isEmpty) Some(spark.read.parquet(target))
      else {
        val inLists = partitionCols.zipWithIndex.map { case (c, i) =>
          col(c).isin(touched.map(_.get(i)).distinct.toIndexedSeq: _*)
        }.reduce(_ && _)
        val exact =
          if (partitionCols.length == 1) inLists
          else inLists && touched.map { r =>
            partitionCols.zipWithIndex
              .map { case (c, i) => col(c) <=> lit(r.get(i)) }
              .reduce(_ && _)
          }.reduce(_ || _)
        Some(readWithPartitionTypesOf(spark, target, partitionCols, delta)
          .where(exact))
      }
    val combined = current match {
      case Some(c) => c.unionByName(delta)
      case None    => delta
    }
    val folded = combined
      .groupBy(keys.map(col): _*)
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
      .toDF(keys ++ sumCols: _*)
      .localCheckpoint(eager = true)
    if (partitionCols.isEmpty || !exists) {
      val w = folded.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(target)
    } else {
      folded.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionCols: _*)
        .parquet(target)
    }
  }

  /** Promote a table between zones (e.g. bronze → silver after conform). */
  def promote(spark: SparkSession, from: String, to: String, table: String,
              transform: DataFrame => DataFrame,
              partitionCols: Seq[String] = Nil): Unit =
    write(transform(read(spark, from, table)), to, table, partitionCols)
}

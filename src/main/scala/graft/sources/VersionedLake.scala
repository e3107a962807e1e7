package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import scala.collection.mutable.ArrayBuffer

/** Manifest-committed, snapshot-isolated lake tables over plain parquet —
  * the Delta-style semantics the reference relies on (it writes Delta for
  * every zone: `adls_bikeshare_project_IsmaelDawuda.ipynb:264,982,1593`)
  * rebuilt on nothing but a Hadoop filesystem, since Delta jars are out of
  * scope here.
  *
  * Layout per table (`<root>/<zone>/<table>/`):
  * {{{
  *   data/<commit-uuid>/[__gp_<col>=<value>/...]   immutable data dirs
  *   _manifests/v00000001.manifest                 snapshot definitions
  * }}}
  *
  * A snapshot IS a manifest file: a header naming the partition columns
  * (and, since round 6, the snapshot's schema), then one line per
  * `(partitionKey, dataDir)`. COMMIT = write the manifest under a temp
  * name, then atomically publish it as `v<N>.manifest` — server-side
  * atomic rename on HDFS/ABFS, `link(2)` create-if-absent on local
  * filesystems (see [[commitManifest]]) — so of two racing commits for the
  * same version exactly one wins and the loser retries against the new
  * snapshot — the same optimistic concurrency Delta gets from its commit
  * log. The CURRENT version is simply the highest manifest present; there
  * is no second mutable pointer file that could crash out of sync with the
  * log (resolution costs one directory listing — on an object store, one
  * LIST call).
  *
  * Readers resolve a manifest once, then read only the immutable data dirs
  * it references: a concurrent commit cannot disturb an in-flight reader
  * (snapshot isolation — the gap `Lake.upsert` documents is closed here),
  * and any retained older version reads the same way (time travel).
  * [[vacuum]] derives liveness from the retained manifests, never from
  * directory listings, exactly like Delta VACUUM.
  *
  * Partition-scoped maintenance: [[upsert]] / [[mergeAggregate]] write new
  * data dirs only for the partitions the batch touches and carry every
  * other partition's manifest entry forward VERBATIM — a one-key upsert on
  * a 100 TB table moves one partition of data and zero bytes of the rest
  * (not even a file copy; the old dirs are re-referenced).
  *
  * Partition columns are duplicated into shadow path columns
  * (`__gp_<col>=<value>/`) so the real column stays inside the data files:
  * a manifest reader just unions leaf dirs and never re-derives values from
  * paths. Partition values must be non-null and path-safe (no `/ = : \n`),
  * the normal shape for date/region/source partitions; keys must be
  * partition-stable (a key never moves partitions between batches).
  */
object VersionedLake {
  /** One snapshot line: which data dir holds which partition. `key` is the
    * `/`-joined partition values ("" for an unpartitioned table); `dir` is
    * relative to the table path and immutable once committed.
    */
  final case class Entry(key: String, dir: String)

  final case class Manifest(version: Int, partitionCols: Seq[String],
                            entries: Seq[Entry],
                            schemaJson: Option[String] = None)

  /** A racing writer committed the version this writer computed against.
    * Retryable by construction: recompute against the new current snapshot
    * and commit again (what [[VersionedLake.upsert]] does internally).
    */
  final class CommitConflictException(msg: String)
    extends IllegalStateException(msg)
}

final case class VersionedLake(root: String) {
  import VersionedLake.{Entry, Manifest}

  private def clean(s: String) = s.stripSuffix("/")

  def tablePath(zone: String, table: String): String =
    s"${clean(root)}/$zone/$table"

  private def manifestsDir(t: String) = new Path(s"$t/_manifests")

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private val ManifestName = """v(\d{8})\.manifest""".r

  /** All committed versions, ascending. Empty = table absent. */
  def versions(spark: SparkSession, zone: String, table: String): Seq[Int] = {
    val mdir = manifestsDir(tablePath(zone, table))
    val fs = fsFor(spark, mdir)
    if (!fs.exists(mdir)) Seq.empty
    else fs.listStatus(mdir).toSeq.map(_.getPath.getName).collect {
      case ManifestName(n) => n.toInt
    }.sorted
  }

  def currentVersion(spark: SparkSession, zone: String, table: String): Int =
    versions(spark, zone, table).lastOption.getOrElse(0)

  private def manifestPath(t: String, version: Int): Path =
    new Path(manifestsDir(t), f"v$version%08d.manifest")

  private def readManifest(spark: SparkSession, t: String,
                           version: Int): Manifest = {
    val p = manifestPath(t, version)
    val fs = fsFor(spark, p)
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.split("\n", -1).filter(_.nonEmpty)
    require(lines.nonEmpty && lines.head.startsWith("cols="),
      s"malformed manifest $p")
    val cols = lines.head.stripPrefix("cols=") match {
      case "" => Nil
      case s  => s.split(",", -1).toSeq
    }
    // Optional schema header (newer manifests): the committed snapshot's
    // full schema, so readers never have to derive one from data files.
    val (schemaJson, entryLines) = lines.tail.toSeq match {
      case h +: rest if h.startsWith("schema=") =>
        (Some(h.stripPrefix("schema=")), rest)
      case rest => (None, rest)
    }
    val entries = entryLines.map { l =>
      val i = l.lastIndexOf('\t')
      Entry(l.substring(0, i), l.substring(i + 1))
    }
    Manifest(version, cols, entries, schemaJson)
  }

  /** Atomic commit: temp write + atomic publish-if-absent. Exactly one of
    * two racing commits for `version` succeeds; the loser throws.
    *
    * The publish primitive is scheme-dependent: on HDFS/ABFS,
    * rename-to-absent-destination is SERVER-SIDE atomic, so `fs.rename` is
    * the claim. Hadoop's LOCAL filesystem rename, however, is
    * check-then-`File.renameTo` — a TOCTOU window in which two racers both
    * "succeed", the second silently replacing the first's manifest (POSIX
    * rename overwrites). For `file:` the atomic create-if-absent primitive
    * is `link(2)`: hard-linking the temp file to the destination fails
    * EEXIST atomically in the kernel. The two-writer race in
    * VersionedLakeSpec caught exactly this.
    */
  private[graft] def commitManifest(spark: SparkSession, t: String,
                                    version: Int,
                                    partitionCols: Seq[String],
                                    entries: Seq[VersionedLake.Entry],
                                    schemaJson: Option[String] = None): Unit = {
    require(partitionCols.forall(c => !c.contains(",") && !c.contains("\n")))
    require(schemaJson.forall(!_.contains("\n")), "schema JSON must be one line")
    val mdir = manifestsDir(t)
    val fs = fsFor(spark, mdir)
    fs.mkdirs(mdir)
    val body = (Seq(s"cols=${partitionCols.mkString(",")}") ++
      schemaJson.map(s => s"schema=$s") ++
      entries.map(e => s"${e.key}\t${e.dir}")).mkString("", "\n", "\n")
    val tmp = new Path(mdir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val dst = manifestPath(t, version)
    val won =
      if (fs.getScheme == "file")
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dst.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      else fs.rename(tmp, dst)
    if (fs.getScheme == "file" || !won) fs.delete(tmp, false)
    if (!won)
      throw new VersionedLake.CommitConflictException(
        s"concurrent commit lost the race for $dst — retry on the new snapshot")
  }

  /** Optimistic-concurrency loop: run `body` (one read-merge-commit
    * attempt); when its commit loses the rename race, recompute from the
    * NEW current snapshot and try again, up to `maxAttempts`. The merge
    * semantics make retries safe: an attempt re-reads the current manifest,
    * so the winner's rows are folded into the loser's next try (Delta's
    * MERGE conflict behavior). A lost attempt's data dirs are orphans that
    * [[vacuum]] sweeps. The last attempt's conflict propagates.
    */
  private[graft] def retryingCommit[T](maxAttempts: Int)(body: => T): T = {
    require(maxAttempts >= 1, "need at least one attempt")
    var attempt = 1
    while (attempt < maxAttempts) {
      try return body
      catch { case _: VersionedLake.CommitConflictException => attempt += 1 }
    }
    body
  }

  /** Write `df` as a new data commit under `t/data/<uuid>/` and return the
    * manifest entries it produced. Partitioned tables write through shadow
    * string columns (`__gp_<col>`) so the real columns stay in the files;
    * the entry key for each leaf dir is recovered from the directory names
    * Spark wrote. An empty `df` pins its schema with one empty part file
    * (repartition(1) forces a single write task) so an emptied table stays
    * readable.
    */
  private def writeDataCommit(t: String, df: DataFrame,
                              partitionCols: Seq[String]): Seq[Entry] = {
    val spark = df.sparkSession
    val rel = s"data/commit-${java.util.UUID.randomUUID()}"
    val dest = s"$t/$rel"
    if (partitionCols.isEmpty) {
      val out = if (df.isEmpty) df.repartition(1) else df
      out.write.parquet(dest)
      Seq(Entry("", rel))
    } else {
      val shadows = partitionCols.map(c => s"__gp_$c")
      df.select(df.columns.map(col).toSeq ++
          partitionCols.zip(shadows).map { case (c, s) =>
            col(c).cast("string").as(s)
          }: _*)
        .write.partitionBy(shadows: _*).parquet(dest)
      // Recover (partitionKey → leaf dir) from what Spark laid down.
      val base = new Path(dest)
      val fs = fsFor(spark, base)
      def leaves(p: Path, depth: Int): Seq[(String, Path)] =
        if (depth == 0) Seq(("", p))
        else fs.listStatus(p).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.contains("="))
          .flatMap { s =>
            val v = s.getPath.getName.split("=", 2)(1)
            leaves(s.getPath, depth - 1).map { case (k, leaf) =>
              (if (k.isEmpty) v else s"$v/$k", leaf)
            }
          }
      leaves(base, shadows.length).map { case (key, leaf) =>
        require(!key.contains("__HIVE_DEFAULT_PARTITION__"),
          "null partition values are not supported")
        Entry(key, leaf.toUri.getPath
          .stripPrefix(new Path(t).toUri.getPath).stripPrefix("/"))
      }
    }
  }

  /** Full-snapshot write: a new data commit replacing every partition.
    * Retries under a commit race (replace-all semantics are
    * version-independent, so a retry just re-commits at the next slot).
    */
  def write(df: DataFrame, zone: String, table: String,
            partitionCols: Seq[String] = Nil,
            maxCommitAttempts: Int = 5): Int = retryingCommit(maxCommitAttempts) {
    val spark = df.sparkSession
    val t = tablePath(zone, table)
    val entries = writeDataCommit(t, df, partitionCols)
    val v = currentVersion(spark, zone, table) + 1
    commitManifest(spark, t, v, partitionCols, entries, Some(df.schema.json))
    v
  }

  /** Read a snapshot — the current one, or any retained `version` (time
    * travel). Resolves the manifest once; the returned plan touches only
    * that snapshot's immutable dirs, so later commits can't disturb it.
    */
  def read(spark: SparkSession, zone: String, table: String,
           version: Option[Int] = None): DataFrame = {
    val t = tablePath(zone, table)
    val v = version.getOrElse {
      val cur = currentVersion(spark, zone, table)
      require(cur > 0, s"no committed snapshot for $zone/$table")
      cur
    }
    val m = readManifest(spark, t, v)
    require(m.entries.nonEmpty, s"empty manifest v$v for $zone/$table")
    readDirs(spark, t, m.entries, m.schemaJson)
  }

  /** Read a set of manifest data dirs under the snapshot's committed
    * schema: columns a later commit ADDED read back as NULL from older
    * data dirs (parquet pads missing columns), and the schema is
    * deterministic — no dependence on which file Spark samples, and no
    * `mergeSchema` footer sweep over the whole table (which at 100 TB
    * reads every file's footer just to plan). Pre-schema-header manifests
    * fall back to merging footers (correct, just not O(1) in planning).
    */
  private def readDirs(spark: SparkSession, t: String,
                       entries: Seq[Entry],
                       schemaJson: Option[String]): DataFrame = {
    val paths = entries.map(e => s"$t/${e.dir}")
    schemaJson match {
      case Some(json) =>
        val schema = org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        spark.read.schema(schema).parquet(paths: _*)
      case None => spark.read.option("mergeSchema", "true").parquet(paths: _*)
    }
  }

  /** MERGE-style keyed upsert with the same semantics as [[Lake.upsert]]
    * (greatest `versionCol` wins, incoming wins ties, winning `deleteCol`
    * rows drop their key) — but committed as a NEW SNAPSHOT: only touched
    * partitions get new data dirs; every untouched partition's entry is
    * carried forward verbatim, and readers of older versions are unaffected.
    * Returns the committed version.
    */
  def upsert(spark: SparkSession, zone: String, table: String,
             updates: DataFrame, key: String, versionCol: String,
             deleteCol: Option[String] = None,
             partitionCols: Seq[String] = Nil,
             maxCommitAttempts: Int = 5): Int = retryingCommit(maxCommitAttempts) {
    import org.apache.spark.sql.expressions.Window
    val t = tablePath(zone, table)
    val cur = currentVersion(spark, zone, table)
    val manifest =
      if (cur == 0) Manifest(0, partitionCols, Nil)
      else readManifest(spark, t, cur)
    require(manifest.version == 0 || manifest.partitionCols == partitionCols,
      s"table is partitioned by ${manifest.partitionCols}, not $partitionCols")

    // Touched partition keys, canonicalized exactly like entry keys
    // (cast-to-string, '/'-joined). Driver-bounded: one row per partition.
    val touchedKeys: Set[String] =
      if (partitionCols.isEmpty) Set("")
      else updates
        .select(concat_ws("/", partitionCols.map(c => col(c).cast("string")): _*))
        .distinct().collect().map(_.getString(0)).toSet
    val (touchedEntries, carried) =
      manifest.entries.partition(e => touchedKeys.contains(e.key))

    val currentScoped =
      if (touchedEntries.isEmpty) None
      else Some(readDirs(spark, t, touchedEntries, manifest.schemaJson))
    for (d <- deleteCol; c <- currentScoped)
      require(!c.columns.contains(d),
        s"deleteCol '$d' collides with a persisted column of '$table'")
    val merged = currentScoped match {
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
      case Some(d) =>
        winners.where(!(coalesce(col(d), lit(false)) && col("__src") === 1))
          .drop(d)
      case None => winners
    }
    val result = alive.drop("__rn", "__src")
    // New dirs for surviving touched partitions; a fully-deleted partition
    // simply has no entry in the new manifest. Data dirs are immutable, so
    // no checkpoint pin is needed — we never overwrite what we read.
    val newEntries = writeDataCommit(t, result, partitionCols)
    val entries = carried ++ newEntries
    // Everything deleted → pin the schema with one empty unpartitioned dir
    // (key "" never matches a real partition key, so it just carries).
    val finalEntries =
      if (entries.nonEmpty) entries
      else writeDataCommit(t, result.limit(0), Nil)
    val v = cur + 1
    // result.schema is the UNION of carried and new columns (unionByName
    // allowMissingColumns), so carried dirs read back with any column this
    // batch added (NULL-padded) instead of nondeterministically dropping it.
    commitManifest(spark, t, v, partitionCols, finalEntries,
      Some(result.schema.json))
    v
  }

  /** Additive gold-table fold, partition-scoped like [[upsert]]: only the
    * partitions present in `delta` are read, re-summed, and re-written;
    * the rest carry forward. `partitionCols` must be group keys.
    */
  def mergeAggregate(spark: SparkSession, zone: String, table: String,
                     delta: DataFrame, keys: Seq[String],
                     sumCols: Seq[String],
                     partitionCols: Seq[String] = Nil,
                     maxCommitAttempts: Int = 5): Int = retryingCommit(maxCommitAttempts) {
    require(partitionCols.forall(keys.contains),
      "partitionCols must be group keys, or groups would span partitions")
    val t = tablePath(zone, table)
    val cur = currentVersion(spark, zone, table)
    val manifest =
      if (cur == 0) Manifest(0, partitionCols, Nil)
      else readManifest(spark, t, cur)
    require(manifest.version == 0 || manifest.partitionCols == partitionCols,
      s"table is partitioned by ${manifest.partitionCols}, not $partitionCols")
    val touchedKeys: Set[String] =
      if (partitionCols.isEmpty) Set("")
      else delta
        .select(concat_ws("/", partitionCols.map(c => col(c).cast("string")): _*))
        .distinct().collect().map(_.getString(0)).toSet
    val (touchedEntries, carried) =
      manifest.entries.partition(e => touchedKeys.contains(e.key))
    val combined = touchedEntries match {
      case Seq() => delta
      case es => readDirs(spark, t, es, manifest.schemaJson).unionByName(delta)
    }
    val folded = combined
      .groupBy(keys.map(col): _*)
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
      .toDF(keys ++ sumCols: _*)
    val newEntries = writeDataCommit(t, folded, partitionCols)
    val v = cur + 1
    commitManifest(spark, t, v, partitionCols, carried ++ newEntries,
      Some(folded.schema.json))
    v
  }

  /** Compaction as a snapshot commit: rewrite the current data into at most
    * `filesPerPartition` files per partition (one data commit, readers of
    * prior versions unaffected). On Delta this is OPTIMIZE.
    *
    * Partitioned tables shuffle on (partition cols, salt∈[0,N)): each
    * (partition, salt) slice lands in one task and each task writes one
    * file per partition value it holds, so a skew-heavy partition still
    * compacts into N right-sized files in parallel instead of funneling
    * through a single writer task.
    */
  def compact(spark: SparkSession, zone: String, table: String,
              filesPerPartition: Int): Int = {
    require(filesPerPartition > 0)
    val t = tablePath(zone, table)
    val cur = currentVersion(spark, zone, table)
    require(cur > 0, s"no committed snapshot for $zone/$table")
    val m = readManifest(spark, t, cur)
    val df = read(spark, zone, table)
    val sized =
      if (m.partitionCols.isEmpty) df.repartition(filesPerPartition)
      else {
        // Explicit task count (AQE would otherwise coalesce the shuffle and
        // silently merge the salt slices): one slot per (partition, salt),
        // the manifest's distinct keys giving the partition count for free.
        val numParts =
          filesPerPartition * m.entries.map(_.key).distinct.size.max(1)
        df.withColumn("__salt",
            floor(rand(7919) * filesPerPartition).cast("int"))
          .repartition(numParts, m.partitionCols.map(col) :+ col("__salt"): _*)
          .sortWithinPartitions(m.partitionCols.map(col): _*)
          .drop("__salt")
      }
    val entries = writeDataCommit(t, sized, m.partitionCols)
    val v = cur + 1
    commitManifest(spark, t, v, m.partitionCols, entries,
      Some(df.schema.json))
    v
  }

  /** Retention vacuum: keep the newest `retainVersions` manifests; any data
    * file not referenced by a RETAINED manifest and older than `olderThanMs`
    * is deleted, along with expired manifests. Liveness comes from the
    * manifest set — never from directory listing heuristics — so a reader
    * of any retained version is safe by construction. Returns files deleted.
    */
  def vacuum(spark: SparkSession, zone: String, table: String,
             retainVersions: Int, olderThanMs: Long): Int = {
    require(retainVersions >= 1)
    val t = tablePath(zone, table)
    val vs = versions(spark, zone, table)
    if (vs.isEmpty) return 0
    val retained = vs.takeRight(retainVersions)
    val liveDirs: Set[String] = retained
      .flatMap(v => readManifest(spark, t, v).entries.map(_.dir)).toSet
    val dataRoot = new Path(s"$t/data")
    val fs = fsFor(spark, dataRoot)
    val cutoff = System.currentTimeMillis() - olderThanMs
    var deleted = 0
    if (fs.exists(dataRoot)) {
      val tRootLen = new Path(t).toUri.getPath.length
      val it = fs.listFiles(dataRoot, true)
      val toDelete = ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val f = it.next()
        val rel = f.getPath.toUri.getPath.drop(tRootLen + 1)
        val live = liveDirs.exists(d => rel.startsWith(d + "/") || {
          // the file sits directly inside a live dir (unpartitioned entry)
          val parent = rel.take(rel.lastIndexOf('/').max(0))
          parent == d
        })
        if (!live && f.getModificationTime < cutoff) toDelete += f.getPath
      }
      toDelete.foreach { p => if (fs.delete(p, false)) deleted += 1 }
      // sweep now-empty commit dirs (best-effort, never a live one)
      for (s <- fs.listStatus(dataRoot) if s.isDirectory) {
        val rel = s.getPath.toUri.getPath.drop(tRootLen + 1)
        val anyLive = liveDirs.exists(_.startsWith(rel))
        if (!anyLive && !fs.listFiles(s.getPath, true).hasNext)
          fs.delete(s.getPath, true)
      }
    }
    for (v <- vs.dropRight(retainVersions)) {
      val mp = manifestPath(t, v)
      if (fs.getFileStatus(mp).getModificationTime < cutoff)
        fs.delete(mp, false)
    }
    deleted
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeltaExport, DeltaRead}

/** [[DeltaExport]] ⇄ [[DeltaRead]] round trips: every log this engine
  * writes must reconstruct exactly through its own protocol reader (and
  * hence through any compliant Delta reader).
  */
class DeltaExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def tmp() = Files.createTempDirectory("delta_export").toString

  test("convert: existing parquet dir becomes Delta v0, zero movement") {
    import spark.implicits._
    val dir = tmp()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    df.write.mode("overwrite").parquet(dir)
    val before = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length).toMap
    assert(DeltaExport.convert(spark, dir) === 0L)
    // data files untouched, log readable, rows identical
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length).toMap
    assert(after === before)
    val got = DeltaRead.read(spark, dir)
    // parquet round-trip widens nullability; names/order/types must match
    assert(got.schema ===
      org.apache.spark.sql.types.StructType(
        df.schema.fields.map(_.copy(nullable = true))))
    assert(got.orderBy("k").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // double-convert refused
    intercept[IllegalArgumentException](DeltaExport.convert(spark, dir))
  }

  test("convert: hive-partitioned dir carries partition columns in the log") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("k", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    DeltaExport.convert(spark, dir)
    val snap = DeltaRead.snapshot(spark, dir)
    assert(snap.partitionColumns === Seq("lang"))
    assert(snap.files.forall(_._2.keySet === Set("lang")))
    val got = DeltaRead.read(spark, dir).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "en"), (2L, "de"), (3L, "en")))
  }

  test("overwrite/append build a multi-version log with time travel") {
    import spark.implicits._
    val dir = tmp()
    assert(DeltaExport.overwrite(Seq((1L, "x")).toDF("k", "v"), dir) === 0L)
    assert(DeltaExport.append(Seq((2L, "y")).toDF("k", "v"), dir) === 1L)
    assert(DeltaExport.overwrite(Seq((9L, "z")).toDF("k", "v"), dir) === 2L)
    assert(DeltaRead.versions(spark, dir) === Seq(0L, 1L, 2L))
    def keys(v: Option[Long]) = DeltaRead.read(spark, dir, v)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(keys(Some(0L)) === Seq(1L))
    assert(keys(Some(1L)) === Seq(1L, 2L))
    assert(keys(None) === Seq(9L)) // overwrite tombstoned v1's files
  }

  test("partitioned export round-trips values and stays plain-parquet readable") {
    import spark.implicits._
    val dir = tmp()
    val df = Seq((1L, 10.0, "en"), (2L, 20.0, "de")).toDF("k", "x", "lang")
    DeltaExport.overwrite(df, dir, partitionColumns = Seq("lang"))
    DeltaExport.append(Seq((3L, 30.0, "en")).toDF("k", "x", "lang"), dir,
      partitionColumns = Seq("lang"))
    val got = DeltaRead.read(spark, dir)
    assert(got.columns.toSeq === Seq("k", "x", "lang"))
    assert(got.where(col("lang") === "en").count() === 2L)
    assert(got.count() === 3L)
    // the same files read as plain hive-layout parquet agree on content
    val plain = spark.read.parquet(dir)
    assert(plain.select("k").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(1L, 2L, 3L))
    // declared-vs-written partitioning mismatch is refused
    intercept[IllegalArgumentException] {
      DeltaExport.append(df, dir, partitionColumns = Nil)
    }
  }

  test("txn actions make replayed appends no-ops (exactly-once under retry)") {
    import spark.implicits._
    val dir = tmp()
    DeltaExport.append(Seq((1L, "a")).toDF("k", "v"), dir,
      txn = Some(("stream-1", 0L)))
    DeltaExport.append(Seq((2L, "b")).toDF("k", "v"), dir,
      txn = Some(("stream-1", 1L)))
    // replay of batch 1 (restart before the offset commit): dropped
    val v = DeltaExport.append(Seq((2L, "b")).toDF("k", "v"), dir,
      txn = Some(("stream-1", 1L)))
    assert(v === 1L) // returns the already-committed version
    assert(DeltaRead.versions(spark, dir) === Seq(0L, 1L))
    assert(DeltaRead.read(spark, dir).count() === 2L)
    assert(DeltaRead.snapshot(spark, dir).txns === Map("stream-1" -> 1L))
    // a DIFFERENT writer's txn counter is independent
    DeltaExport.append(Seq((3L, "c")).toDF("k", "v"), dir,
      txn = Some(("stream-2", 0L)))
    assert(DeltaRead.read(spark, dir).count() === 3L)
  }

  test("timestamp time travel resolves to the newest commit at-or-before ts") {
    import spark.implicits._
    val dir = tmp()
    DeltaExport.overwrite(Seq((1L, "a")).toDF("k", "v"), dir)
    val log = new java.io.File(s"$dir/_delta_log")
    // pin distinct mtimes so the ordering is deterministic — match the
    // commit file NAME exactly: a contains/endsWith probe can land on the
    // Hadoop .crc sidecar depending on directory listing order, leaving
    // the real commit at wall-clock time (the full-suite flake)
    def commitFile(v: Long) =
      new java.io.File(log, f"$v%020d.json")
    assert(commitFile(0).setLastModified(1000000L))
    DeltaExport.append(Seq((2L, "b")).toDF("k", "v"), dir)
    assert(commitFile(1).setLastModified(2000000L))
    assert(DeltaRead.versionAsOfTimestamp(spark, dir, 1500000L) === 0L)
    assert(DeltaRead.readAsOfTimestamp(spark, dir, 1500000L).count() === 1L)
    assert(DeltaRead.versionAsOfTimestamp(spark, dir, 2000000L) === 1L)
    intercept[IllegalArgumentException] {
      DeltaRead.versionAsOfTimestamp(spark, dir, 1L)
    }
  }

  test("checkpoint + cleanLog: old commits removable, state and txns survive") {
    import spark.implicits._
    val dir = tmp()
    DeltaExport.overwrite(Seq((1L, "a")).toDF("k", "v"), dir)
    DeltaExport.append(Seq((2L, "b")).toDF("k", "v"), dir,
      txn = Some(("s", 7L)))
    DeltaExport.append(Seq((3L, "c")).toDF("k", "v"), dir)
    assert(DeltaExport.checkpoint(spark, dir) === 2L)
    assert(DeltaExport.cleanLog(spark, dir) === 2) // commits 0 and 1 removed
    assert(DeltaRead.versions(spark, dir) === Seq(2L))
    val snap = DeltaRead.snapshot(spark, dir)
    assert(snap.version === 2L)
    assert(snap.txns === Map("s" -> 7L)) // idempotence survives cleanup
    assert(DeltaRead.read(spark, dir).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    // replayed pre-cleanup batch still a no-op via the checkpointed txn
    assert(DeltaExport.append(Seq((2L, "b")).toDF("k", "v"), dir,
      txn = Some(("s", 7L))) === 2L)
    // and the log keeps working past the checkpoint
    DeltaExport.append(Seq((4L, "d")).toDF("k", "v"), dir)
    assert(DeltaRead.read(spark, dir).count() === 4L)
  }

  test("checkpoint carries a reader-features protocol verbatim (no downgrade after DVs compact away)") {
    import spark.implicits._
    val dir = tmp()
    DeltaExport.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    // a third-party writer upgraded the table to reader features this
    // reader accepts (timestampNtz) — append the protocol action to the
    // next commit the way a real upgrade commit does
    DeltaExport.append(Seq((3L, "c")).toDF("k", "v"), dir)
    val c1 = java.nio.file.Paths.get(f"$dir/_delta_log/${1L}%020d.json")
    val upgraded = new String(java.nio.file.Files.readAllBytes(c1), "UTF-8") +
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["timestampNtz"],""" +
      """"writerFeatures":["timestampNtz","deletionVectors"]}}""" + "\n"
    java.nio.file.Files.write(c1, upgraded.getBytes("UTF-8"))
    // no live DVs anywhere (the compacted-away shape) — the old code
    // re-derived (1, 2) from that absence and DOWNGRADED the table
    val snap = DeltaRead.snapshot(spark, dir)
    assert(snap.dvs.isEmpty)
    assert(snap.protocol ===
      Some(DeltaRead.Protocol(3, 7, Seq("timestampNtz"),
        Seq("timestampNtz", "deletionVectors"))))
    // checkpoint ABOVE the upgrade commit, then clean the upgrade commit
    // away — the seeded protocol can only come from the checkpoint itself
    DeltaExport.append(Seq((4L, "d")).toDF("k", "v"), dir)
    assert(DeltaExport.checkpoint(spark, dir) === 2L)
    assert(DeltaExport.cleanLog(spark, dir) === 2) // commits 0 AND 1 gone
    val seeded = DeltaRead.snapshot(spark, dir)
    assert(seeded.protocol === snap.protocol)
    assert(DeltaRead.read(spark, dir).count() === 4L)
    // and a plain (1, 2) table still checkpoints as (1, 2) when DV-free
    val dir2 = tmp()
    DeltaExport.overwrite(Seq((1L, "x")).toDF("k", "v"), dir2)
    DeltaExport.checkpoint(spark, dir2)
    DeltaExport.cleanLog(spark, dir2)
    assert(DeltaRead.snapshot(spark, dir2).protocol ===
      Some(DeltaRead.Protocol(1, 2, Nil, Nil)))
  }

  test("checkpoint's legacy-to-table-features upgrade seeds the implied legacy features") {
    import spark.implicits._
    val dir = tmp()
    DeltaExport.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      dir)
    DeltaExport.delete(spark, dir, col("k") === 2L)
    // make the log NON-conforming: strip delete's protocol upgrade so the
    // table still claims legacy (1, 2) while a live add carries a DV
    val c1 = java.nio.file.Paths.get(f"$dir/_delta_log/${1L}%020d.json")
    val stripped = new String(java.nio.file.Files.readAllBytes(c1), "UTF-8")
      .linesIterator.filterNot(_.contains("\"protocol\"")).mkString("\n") + "\n"
    java.nio.file.Files.write(c1, stripped.getBytes("UTF-8"))
    val snap = DeltaRead.snapshot(spark, dir)
    assert(snap.dvs.nonEmpty)
    assert(snap.protocol === Some(DeltaRead.Protocol(1, 2, Nil, Nil)))
    // the checkpoint must upgrade to (3, 7) AND enumerate the features the
    // legacy writer v2 implied — a features list of deletionVectors alone
    // would tell a conforming writer to stop enforcing invariants
    DeltaExport.checkpoint(spark, dir)
    DeltaExport.cleanLog(spark, dir)
    val seeded = DeltaRead.snapshot(spark, dir).protocol.get
    assert(seeded.minReaderVersion === 3 && seeded.minWriterVersion === 7)
    assert(seeded.writerFeatures.toSet ===
      Set("appendOnly", "invariants", "deletionVectors"))
    assert(seeded.readerFeatures === Seq("deletionVectors")) // reader v1 implies none
    // and the DV still masks row 2 for a reader seeding from the checkpoint
    assert(DeltaRead.read(spark, dir).select("k").as[Long].collect()
      .sorted.toSeq === Seq(1L, 3L))
  }

  test("compact + vacuum: small files merge, tombstones age out, reads hold") {
    import spark.implicits._
    val dir = tmp()
    // three appends = three data files (the streaming-sink accumulation)
    DeltaExport.append(Seq((1L, "a")).toDF("k", "v"), dir)
    DeltaExport.append(Seq((2L, "b")).toDF("k", "v"), dir)
    DeltaExport.append(Seq((3L, "c")).toDF("k", "v"), dir)
    assert(DeltaRead.snapshot(spark, dir).files.size === 3)
    val v = DeltaExport.compact(spark, dir)
    assert(v === 3L)
    val snap = DeltaRead.snapshot(spark, dir)
    assert(snap.files.size === 1, s"expected 1 compacted file, got ${snap.files.size}")
    assert(DeltaRead.read(spark, dir).select("k").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    // pre-compaction version still time-travels (files on disk)...
    assert(DeltaRead.read(spark, dir, Some(2L)).count() === 3L)
    // ...until vacuum with zero retention removes the 3 tombstoned files
    assert(DeltaExport.vacuum(spark, dir, retainMs = 0L) === 3)
    assert(DeltaRead.read(spark, dir).count() === 3L) // live state intact
    // partitioned compaction: one file per hive partition
    val pdir = tmp()
    DeltaExport.append(Seq((1L, "en"), (2L, "de")).toDF("k", "lang"), pdir,
      partitionColumns = Seq("lang"))
    DeltaExport.append(Seq((3L, "en")).toDF("k", "lang"), pdir,
      partitionColumns = Seq("lang"))
    DeltaExport.compact(spark, pdir)
    val psnap = DeltaRead.snapshot(spark, pdir)
    assert(psnap.files.size === 2)
    assert(psnap.files.map(_._2("lang")).sorted === Seq("de", "en"))
    assert(DeltaRead.read(spark, pdir).where(col("lang") === "en").count() === 2L)
  }

  test("compact zorderBy: Morton-clustered rewrite, refused when partitioned") {
    import spark.implicits._
    val dir = tmp()
    // rows scattered so a single-column sort can't make both columns tight
    val rows = for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong)
    DeltaExport.append(scala.util.Random.shuffle(rows).toDF("x", "y"), dir)
    DeltaExport.compact(spark, dir, numFiles = 4, zorderBy = Seq("x", "y"))
    val snap = DeltaRead.snapshot(spark, dir)
    assert(snap.files.size === 4)
    assert(DeltaRead.read(spark, dir).count() === 256L)
    // z-clustering bounds BOTH columns per file: every file's x-range and
    // y-range must be a strict subset of the full 0..15 domain
    val spans = DeltaRead.read(spark, dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .collect()
    assert(spans.length === 4)
    assert(spans.forall(r => r.getAs[Long]("dx") < 15L ||
      r.getAs[Long]("dy") < 15L))
    // hive-partitioned tables refuse z-ordering loudly
    val pdir = tmp()
    DeltaExport.append(Seq((1L, "en")).toDF("k", "lang"), pdir,
      partitionColumns = Seq("lang"))
    val e = intercept[IllegalArgumentException] {
      DeltaExport.compact(spark, pdir, zorderBy = Seq("k"))
    }
    assert(e.getMessage.contains("unpartitioned"))
  }

  test("readAppendsBetween: cursor-style tail of an append-only log") {
    import spark.implicits._
    val dir = tmp()
    DeltaExport.append(Seq((1L, "a")).toDF("k", "v"), dir)      // v0
    DeltaExport.append(Seq((2L, "b")).toDF("k", "v"), dir)      // v1
    DeltaExport.append(Seq((3L, "c")).toDF("k", "v"), dir)      // v2
    // consumer saw through v0; drains v1..v2 only
    assert(DeltaRead.readAppendsBetween(spark, dir, 0L, 2L)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
    // caught up → empty, schema intact
    val empty = DeltaRead.readAppendsBetween(spark, dir, 2L, 2L)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq === Seq("k", "v"))
    // compaction is dataChange=false → still drains as empty, not refused
    DeltaExport.compact(spark, dir)                              // v3
    assert(DeltaRead.readAppendsBetween(spark, dir, 2L, 3L).count() === 0L)
    // an overwrite in range is NOT append-only → refused loudly
    DeltaExport.overwrite(Seq((9L, "z")).toDF("k", "v"), dir)    // v4
    val e = intercept[IllegalArgumentException] {
      DeltaRead.readAppendsBetween(spark, dir, 3L, 4L)
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("streaming foreachBatch sink: micro-batches land as Delta versions") {
    import spark.implicits._
    val dir = tmp()
    val src = Files.createTempDirectory("delta_stream_src").toString
    val ckpt = Files.createTempDirectory("delta_stream_ckpt").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.mode("overwrite").parquet(src)
    val q = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
      .parquet(src)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(DeltaExport.foreachBatchSink(dir, appId = "spec-stream"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val got = DeltaRead.read(spark, dir)
    assert(got.select("k").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(DeltaRead.snapshot(spark, dir).txns.contains("spec-stream"))
  }

  test("partition values with '+' survive convert; checkpoint adds carry mtime") {
    import spark.implicits._
    val dir = tmp()
    // hive path escaping does NOT escape '+', so the directory is
    // literally "p=a+b" — URLDecoder-style decoding would corrupt it to
    // "a b" in the log's partitionValues
    Seq((1L, "a+b"), (2L, "c%d"), (3L, "e f")).toDF("k", "p")
      .write.mode("overwrite").partitionBy("p").parquet(dir)
    DeltaExport.convert(spark, dir)
    val vals = DeltaRead.snapshot(spark, dir).files
      .flatMap(_._2.get("p")).sorted
    assert(vals === Seq("a+b", "c%d", "e f"))
    assert(DeltaRead.read(spark, dir).where(col("p") === "a+b").count() === 1L)

    // checkpoint adds must carry the log's modificationTime (required by
    // the protocol; strict readers seeding from the checkpoint check it)
    DeltaExport.checkpoint(spark, dir)
    val ckpt = spark.read.parquet(
      f"$dir/_delta_log/${0L}%020d.checkpoint.parquet")
    val mts = ckpt.where(col("add").isNotNull)
      .select(col("add.modificationTime")).collect().map(_.getLong(0))
    assert(mts.length === 3 && mts.forall(_ > 0L),
      s"checkpoint adds must carry real mtimes, got ${mts.toSeq}")
  }

  test("optimistic concurrency: append retries past an interleaved commit") {
    import spark.implicits._
    val dir = tmp()
    DeltaExport.append(Seq((1L, "a")).toDF("k", "v"), dir) // v0
    // deterministic race: when our append is about to commit v1, a
    // competing writer lands v1 first — exactly once
    var fired = false
    DeltaExport.onCommitAttempt = Some { v =>
      if (!fired) {
        fired = true
        Files.writeString(
          java.nio.file.Paths.get(f"$dir/_delta_log/$v%020d.json"),
          """{"commitInfo":{"operation":"race"}}""")
      }
    }
    try {
      val v = DeltaExport.append(Seq((2L, "b")).toDF("k", "v"), dir)
      assert(v === 2L, "append must land AFTER the interleaved commit")
    } finally DeltaExport.onCommitAttempt = None
    val got = DeltaRead.read(spark, dir)
    assert(got.orderBy("k").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("optimistic concurrency: overwrite aborts on conflict, appends race cleanly") {
    import spark.implicits._
    val dir = tmp()
    DeltaExport.append(Seq((1L, "a")).toDF("k", "v"), dir)
    var fired = false
    DeltaExport.onCommitAttempt = Some { v =>
      if (!fired) {
        fired = true
        Files.writeString(
          java.nio.file.Paths.get(f"$dir/_delta_log/$v%020d.json"),
          """{"commitInfo":{"operation":"race"}}""")
      }
    }
    try intercept[java.util.ConcurrentModificationException] {
      DeltaExport.overwrite(Seq((9L, "z")).toDF("k", "v"), dir)
    } finally DeltaExport.onCommitAttempt = None

    // real threads: two writers interleave appends; every commit must land
    // (no lost updates) with contiguous versions
    val dir2 = tmp()
    DeltaExport.append(Seq((0L, "seed")).toDF("k", "v"), dir2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val futures = (1 to 2).map { t =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = (1 to 3).foreach { i =>
          DeltaExport.append(Seq((t * 10L + i, s"w$t-$i")).toDF("k", "v"), dir2)
        }
      })
    }
    futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    val snap = DeltaRead.snapshot(spark, dir2)
    assert(snap.version === 6L, "7 appends → versions 0..6")
    assert(DeltaRead.read(spark, dir2).count() === 7L)
  }

  test("delete: sparse DV DML — sidecar written, no data file rewritten, " +
    "repeat deletes union, time travel intact") {
    import spark.implicits._
    val dir = tmp()
    DeltaExport.overwrite(
      (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v"), dir)
    DeltaExport.append(
      (100L until 120L).map(i => (i, s"v$i")).toDF("k", "v"), dir)
    val dataBefore = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length, f.lastModified)).toMap
    // v2: delete two sparse slices across files
    val v2 = DeltaExport.delete(spark, dir, col("k") % 10 === 3)
    assert(v2 === 2L)
    // no parquet rewritten — DV sidecars only
    val dataAfter = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length, f.lastModified)).toMap
    assert(dataAfter === dataBefore)
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("deletion_vector_")))
    val snap = DeltaRead.snapshot(spark, dir)
    assert(snap.dvs.nonEmpty)
    assert(snap.dvs.values.map(_.cardinality).sum === 12L)
    def keys(v: Option[Long] = None) = DeltaRead.read(spark, dir, v)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(keys() === (0L until 120L).filterNot(_ % 10 == 3))
    // time travel to the pre-delete version still sees every row
    assert(keys(Some(1L)) === (0L until 120L))
    // v3: second delete UNIONS with the first file-level DVs (and a
    // re-matching predicate stays idempotent)
    val v3 = DeltaExport.delete(spark, dir,
      col("k") % 10 === 3 || col("k") === 50L)
    assert(v3 === 3L)
    assert(keys() ===
      (0L until 120L).filterNot(i => i % 10 == 3 || i == 50L))
    // nothing-matched delete commits nothing
    assert(DeltaExport.delete(spark, dir, col("k") === -1L) === 3L)
    assert(DeltaRead.snapshot(spark, dir).version === 3L)
    // checkpoint carries the DV descriptors (DeltaDvSpec exercises the
    // cleanLog round trip); compact purges the DVs by rewrite
    assert(DeltaExport.checkpoint(spark, dir) === 3L)
    DeltaExport.compact(spark, dir)
    assert(DeltaRead.snapshot(spark, dir).dvs.isEmpty)
    assert(keys() ===
      (0L until 120L).filterNot(i => i % 10 == 3 || i == 50L))
    // mass-delete guard names the rewrite path
    val e = intercept[IllegalArgumentException](
      DeltaExport.delete(spark, dir, lit(true), maxDeletedRows = 5))
    assert(e.getMessage.contains("SPARSE"))
  }

  test("delete: partitioned table, predicate on the partition column") {
    import spark.implicits._
    val dir = tmp()
    DeltaExport.overwrite(
      (0L until 30L).map(i => (i, if (i % 3 == 0) "en" else "de"))
        .toDF("k", "lang"),
      dir, partitionColumns = Seq("lang"))
    DeltaExport.delete(spark, dir,
      col("lang") === "en" && col("k") < 15L)
    val got = DeltaRead.read(spark, dir).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (0L until 30L).filterNot(i => i % 3 == 0 && i < 15))
    // partition values survive the remove+re-add round trip
    val snap = DeltaRead.snapshot(spark, dir)
    assert(snap.files.forall(_._2.keySet === Set("lang")))
  }
}

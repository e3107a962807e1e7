package graft

import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeltaDv, DeltaExport, DeltaRead}

/** Deletion-vector reads against hand-built fixtures: z85 round trip,
  * portable RoaringBitmapArray round trip, `u`-type sidecar files,
  * inline vectors, the DML same-commit remove+re-add shape, partitioned
  * tables, append-range refusal, and the checkpoint guard.
  */
class DeltaDvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
  }

  private val abSchema = StructType(Seq(
    StructField("a", LongType), StructField("b", StringType)))

  private def metaLine(s: StructType, partCols: Seq[String] = Seq.empty) =
    s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},""" +
      s""""schemaString":"${esc(s.json)}",""" +
      s""""partitionColumns":[${partCols.map(c => s""""$c"""").mkString(",")}],""" +
      s""""configuration":{},"createdTime":0}}"""

  private val dvProtocol =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["deletionVectors"],""" +
      """"writerFeatures":["deletionVectors"]}}"""

  private def dataFile(dir: String, name: String,
                       rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    val tmp = s"$dir/__stage"
    rows.toDF("a", "b").coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(s"$dir/$name").getParent)
    Files.move(part.toPath, Paths.get(s"$dir/$name"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  private def commit(dir: String, v: Long, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(s"$dir/_delta_log"))
    Files.writeString(
      Paths.get(f"$dir/_delta_log/$v%020d.json"), lines.mkString("\n"))
  }

  private def dvJson(d: DeltaDv.Descriptor): String =
    s"""{"storageType":"${d.storageType}","pathOrInlineDv":"${d.pathOrInlineDv}",""" +
      d.offset.map(o => s""""offset":$o,""").getOrElse("") +
      s""""sizeInBytes":${d.sizeInBytes},"cardinality":${d.cardinality}}"""

  private def addLine(dir: String, path: String,
                      pv: Map[String, String] = Map.empty,
                      dv: Option[DeltaDv.Descriptor] = None) = {
    val size = Files.size(Paths.get(dir, new java.net.URI(path).getPath))
    s"""{"add":{"path":"$path","partitionValues":{${
      pv.map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    }},"size":$size,"modificationTime":0,"dataChange":true""" +
      dv.map(d => s""","deletionVector":${dvJson(d)}""").getOrElse("") + "}}"
  }

  test("z85 round trip matches the ZeroMQ reference vector") {
    // the canonical z85 test vector from the spec (0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B)
    val hello = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(DeltaDv.z85Encode(hello) === "HelloWorld")
    assert(DeltaDv.z85Decode("HelloWorld").toSeq === hello.toSeq)
    val uuid = Array.tabulate(16)(i => (i * 17 + 3).toByte)
    assert(DeltaDv.z85Decode(DeltaDv.z85Encode(uuid)).toSeq === uuid.toSeq)
  }

  test("RoaringBitmapArray round trip, incl. a >32-bit row index") {
    val idx = Seq(0L, 2L, 63L, 100000L, (1L << 32) + 5L)
    val maps = DeltaDv.parseBitmapArray(DeltaDv.serializeBitmapArray(idx))
    assert(maps.length === 2)
    idx.foreach(i => assert(DeltaDv.contains(maps, i), s"missing $i"))
    Seq(1L, 3L, 99999L, (1L << 32) + 4L).foreach(i =>
      assert(!DeltaDv.contains(maps, i), s"false positive $i"))
  }

  test("u-type DV sidecar: deleted row positions drop from the read") {
    val dir = Files.createTempDirectory("delta_dv_u").toString
    dataFile(dir, "f0.parquet", Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    dataFile(dir, "f1.parquet", Seq((5L, "e"), (6L, "f")))
    // delete rows 0 and 2 of f0 (values 1 and 3)
    val d = DeltaDv.writeDvFile(fs(dir), new Path(dir), Seq(0L, 2L))
    commit(dir, 0, Seq(dvProtocol, metaLine(abSchema),
      addLine(dir, "f0.parquet", dv = Some(d)),
      addLine(dir, "f1.parquet")))

    val snap = DeltaRead.snapshot(spark, dir)
    assert(snap.dvs.keySet === Set("f0.parquet"))
    assert(snap.dvs("f0.parquet").cardinality === 2L)
    val got = DeltaRead.read(spark, dir).orderBy("a")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((2L, "b"), (4L, "d"), (5L, "e"), (6L, "f")))
  }

  test("inline DV and the DML same-commit remove+re-add shape") {
    val dir = Files.createTempDirectory("delta_dv_i").toString
    dataFile(dir, "f0.parquet", Seq((1L, "a"), (2L, "b"), (3L, "c")))
    commit(dir, 0, Seq(dvProtocol, metaLine(abSchema),
      addLine(dir, "f0.parquet")))
    // DELETE WHERE a = 2 → remove(f0) + add(f0, dv=[1]) in ONE commit
    val data = DeltaDv.serializeBitmapArray(Seq(1L))
    val d = DeltaDv.Descriptor("i", DeltaDv.z85EncodePadded(data), None,
      data.length, 1L)
    commit(dir, 1, Seq(
      """{"remove":{"path":"f0.parquet","deletionTimestamp":1,"dataChange":true}}""",
      addLine(dir, "f0.parquet", dv = Some(d))))

    // v0: all three rows; v1: row index 1 (value 2) deleted
    assert(DeltaRead.read(spark, dir, asOf = Some(0L)).count() === 3)
    val got = DeltaRead.read(spark, dir).orderBy("a")
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 3L))
  }

  test("partitioned table: DV filter composes with partition pruning") {
    val dir = Files.createTempDirectory("delta_dv_part").toString
    val dataSchema = StructType(Seq(StructField("a", LongType)))
    def oneCol(name: String, rows: Seq[Long]): Unit = {
      import spark.implicits._
      val tmp = s"$dir/__stage"
      rows.toDF("a").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.createDirectories(Paths.get(s"$dir/$name").getParent)
      Files.move(part.toPath, Paths.get(s"$dir/$name"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    val full = StructType(dataSchema.fields :+ StructField("p", StringType))
    oneCol("p=x/f0.parquet", Seq(1L, 2L, 3L))
    oneCol("p=y/f1.parquet", Seq(4L, 5L))
    val d = DeltaDv.writeDvFile(fs(dir), new Path(dir), Seq(0L))
    commit(dir, 0, Seq(dvProtocol, metaLine(full, Seq("p")),
      addLine(dir, "p=x/f0.parquet", pv = Map("p" -> "x"), dv = Some(d)),
      addLine(dir, "p=y/f1.parquet", pv = Map("p" -> "y"))))

    val df = DeltaRead.read(spark, dir)
    assert(df.orderBy("a").collect().map(_.getLong(0)).toSeq ===
      Seq(2L, 3L, 4L, 5L))
    assert(df.where(org.apache.spark.sql.functions.col("p") === "x")
      .orderBy("a").collect().map(_.getLong(0)).toSeq === Seq(2L, 3L))
  }

  test("versionAsOfTimestamp survives an out-of-order commit mtime") {
    val dir = Files.createTempDirectory("delta_ts_skew").toString
    dataFile(dir, "f0.parquet", Seq((1L, "a")))
    dataFile(dir, "f1.parquet", Seq((2L, "b")))
    dataFile(dir, "f2.parquet", Seq((3L, "c")))
    commit(dir, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine(abSchema), addLine(dir, "f0.parquet")))
    commit(dir, 1, Seq(addLine(dir, "f1.parquet")))
    commit(dir, 2, Seq(addLine(dir, "f2.parquet")))
    // v1's mtime is skewed HIGH (clock skew / file restore); v2 is normal.
    // "newest commit at-or-before ts" must still see v2, not stop at v0.
    def setM(v: Long, t: Long) = Files.setLastModifiedTime(
      java.nio.file.Paths.get(f"$dir/_delta_log/$v%020d.json"),
      java.nio.file.attribute.FileTime.fromMillis(t))
    setM(0, 1000L); setM(1, 2000L); setM(2, 1200L)
    assert(DeltaRead.versionAsOfTimestamp(spark, dir, 1500L) === 2L)
    assert(DeltaRead.versionAsOfTimestamp(spark, dir, 2500L) === 2L)
    assert(DeltaRead.versionAsOfTimestamp(spark, dir, 1000L) === 0L)
  }

  test("append-range cursor refuses DV-carrying adds") {
    val dir = Files.createTempDirectory("delta_dv_refuse").toString
    dataFile(dir, "f0.parquet", Seq((1L, "a"), (2L, "b")))
    commit(dir, 0, Seq(dvProtocol, metaLine(abSchema),
      addLine(dir, "f0.parquet")))
    val data = DeltaDv.serializeBitmapArray(Seq(0L))
    val d = DeltaDv.Descriptor("i", DeltaDv.z85EncodePadded(data), None,
      data.length, 1L)
    commit(dir, 1, Seq(
      """{"remove":{"path":"f0.parquet","deletionTimestamp":1,"dataChange":true}}""",
      addLine(dir, "f0.parquet", dv = Some(d))))

    val e1 = intercept[IllegalArgumentException] {
      DeltaRead.readAppendsBetween(spark, dir, 0L, 1L)
    }
    // the data-changing remove in the same commit already disqualifies the
    // range; the add-with-DV guard is defense in depth behind it
    assert(e1.getMessage.contains("not an append-only range"))
    // compact() purges the DVs; checkpoint then sees a DV-free snapshot
    DeltaExport.compact(spark, dir)
    assert(DeltaRead.snapshot(spark, dir).dvs.isEmpty)
    DeltaExport.checkpoint(spark, dir)
    assert(DeltaRead.read(spark, dir).collect().map(_.getLong(0)).toSeq ===
      Seq(2L))
  }

  test("DV-bearing checkpoint: delete -> checkpoint -> cleanLog round trip") {
    val dir = Files.createTempDirectory("delta_dv_ckpt").toString
    import spark.implicits._
    DeltaExport.overwrite(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("a", "b"), dir)
    DeltaExport.append(Seq((5L, "e"), (6L, "f")).toDF("a", "b"), dir)
    // sparse DELETE a IN (2, 5) → DV sidecars, protocol upgrade to (3, 7)
    val removed = DeltaExport.delete(spark, dir,
      org.apache.spark.sql.functions.col("a").isin(2L, 5L))
    assert(removed === 2L)
    assert(DeltaRead.snapshot(spark, dir).dvs.nonEmpty)
    // checkpoint must carry the descriptors instead of refusing
    val v = DeltaExport.checkpoint(spark, dir)
    assert(DeltaExport.cleanLog(spark, dir) === v.toInt)
    // reader now seeds from the checkpoint alone (older commits deleted):
    // the deleted rows must stay deleted
    val snap = DeltaRead.snapshot(spark, dir)
    assert(snap.dvs.nonEmpty, "checkpoint dropped the deletionVector structs")
    assert(DeltaRead.read(spark, dir).orderBy("a")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L, 6L))
    // a post-checkpoint append still composes with the DV state
    DeltaExport.append(Seq((7L, "g")).toDF("a", "b"), dir)
    assert(DeltaRead.read(spark, dir).orderBy("a")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L, 6L, 7L))
  }
}

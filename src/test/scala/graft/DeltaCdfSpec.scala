package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DeltaExport, DeltaRead}

/** [[DeltaRead.readChanges]] — the Change Data Feed surface: synthesized
  * insert/delete changes from cdc-less commits, explicit `_change_data`
  * files with update pre/post images, in-commit timestamps, refusals.
  */
class DeltaCdfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cdc-less commits synthesize inserts and deletes") {
    val dir = Files.createTempDirectory("cdf_synth").toString
    DeltaExport.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    DeltaExport.append(Seq((3L, "c")).toDF("k", "v"), dir)
    DeltaExport.overwrite(Seq((9L, "z")).toDF("k", "v"), dir)
    val ch = DeltaRead.readChanges(spark, dir, 0L, 2L)
      .select("k", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(ch === Set(
      (1L, "insert", 0L), (2L, "insert", 0L),     // v0 overwrite of nothing
      (3L, "insert", 1L),                          // v1 append
      (1L, "delete", 2L), (2L, "delete", 2L),      // v2 overwrite tombstones
      (3L, "delete", 2L), (9L, "insert", 2L)))
    // a sub-range sees only its commits
    val sub = DeltaRead.readChanges(spark, dir, 1L, 1L)
      .select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sub === Set((3L, "insert")))
    // commit timestamps are monotone non-decreasing and positive
    val ts = DeltaRead.readChanges(spark, dir, 0L, 2L)
      .select("_commit_version", "_commit_timestamp").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(ts.forall(_._2 > 0) && ts.map(_._2).sliding(2).forall(
      s => s.length < 2 || s(0) <= s(1)))
  }

  test("explicit cdc files win over add/remove; ICT read when present") {
    val dir = Files.createTempDirectory("cdf_explicit").toString
    DeltaExport.overwrite(Seq((1L, "old")).toDF("k", "v"), dir)
    // v1: an UPDATE written the CDF way — cdc file with pre/post images,
    // plus the add/remove pair a reader must NOT also synthesize from
    val cdcSchema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType), StructField("_change_type", StringType)))
    val stage = s"$dir/__cdc_stage"
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, "old", "update_preimage"),
        org.apache.spark.sql.Row(1L, "new", "update_postimage")), 1),
      cdcSchema).coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(s"$dir/_change_data"))
    Files.move(part.toPath, Paths.get(s"$dir/_change_data/cdc-0.parquet"))
    val newDataStage = s"$dir/__new_stage"
    Seq((1L, "new")).toDF("k", "v").coalesce(1)
      .write.mode("overwrite").parquet(newDataStage)
    val newPart = new java.io.File(newDataStage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(newPart.toPath, Paths.get(s"$dir/part-upd.parquet"))
    val oldFile = DeltaRead.snapshot(spark, dir).files.head._1
    val cdcSize = Files.size(Paths.get(s"$dir/_change_data/cdc-0.parquet"))
    val updSize = Files.size(Paths.get(s"$dir/part-upd.parquet"))
    Files.writeString(Paths.get(f"$dir/_delta_log/${1L}%020d.json"), Seq(
      """{"commitInfo":{"operation":"UPDATE","inCommitTimestamp":123456789}}""",
      s"""{"cdc":{"path":"_change_data/cdc-0.parquet","partitionValues":{},"size":$cdcSize,"dataChange":false}}""",
      s"""{"add":{"path":"part-upd.parquet","partitionValues":{},"size":$updSize,"modificationTime":0,"dataChange":true}}""",
      s"""{"remove":{"path":"$oldFile","dataChange":true}}""").mkString("\n"))
    val ch = DeltaRead.readChanges(spark, dir, 1L, 1L)
      .select("k", "v", "_change_type", "_commit_timestamp").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(ch === Set(
      (1L, "old", "update_preimage", 123456789L),
      (1L, "new", "update_postimage", 123456789L)))
    // the table itself reads post-state
    assert(DeltaRead.read(spark, dir).select("v").head.getString(0) === "new")
  }

  test("vacuumed remove target refuses instead of dropping the delete") {
    val dir = Files.createTempDirectory("cdf_vac").toString
    DeltaExport.overwrite(Seq((1L, "a")).toDF("k", "v"), dir)
    val f0 = DeltaRead.snapshot(spark, dir).files.head._1
    DeltaExport.overwrite(Seq((2L, "b")).toDF("k", "v"), dir)
    Files.delete(Paths.get(dir, f0)) // simulate vacuum
    val e = intercept[IllegalArgumentException] {
      DeltaRead.readChanges(spark, dir, 1L, 1L).collect()
    }
    assert(e.getMessage.contains("vacuumed"))
  }
}

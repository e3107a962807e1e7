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
}

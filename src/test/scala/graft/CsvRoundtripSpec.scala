package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** The S1 CSV write → declared-schema read → parse+cast round trip that
  * used to live inside the q44 gate query. Gate queries are read-only now
  * (they run repeatedly against shared scale dirs); the filesystem side
  * effects belong here, where each run gets its own temp dir.
  */
class CsvRoundtripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("headerless CSV round trip reproduces the parquet aggregate exactly") {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft-csv-rt").toString
    val src = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    src.write.mode("overwrite").option("header", "false").csv(tmp)
    val back = Tables.readCsv(spark, tmp, StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_returnflag", StringType))))
    assert(back.schema === StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType), StructField("l_returnflag", StringType))))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // the CSV path reproduces q44's read-only conform aggregate exactly
    assert(agg(back) === agg(src))
    assert(back.count() === src.count())
  }
}

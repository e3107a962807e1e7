package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** JSONL and ORC round trips — the same write → declared-schema read →
  * aggregate == parquet-truth contract as CsvRoundtripSpec, for the other
  * two interchange formats a lake actually meets (crawl dumps arrive as
  * JSONL; Hive estates standardize on ORC). Spec-level because gate
  * queries are read-only.
  */
class FormatsRoundtripSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def docAgg(df: org.apache.spark.sql.DataFrame) = df
    .groupBy("lang")
    .agg(count(lit(1)).as("n"), sum("n_chars").as("sum_chars"),
      count(md5(col("text"))).as("n_text"))
    .orderBy("lang").collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("JSONL write → declared-schema read reproduces the parquet truth") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl-rt").toString
    val src = spark.read.parquet(s"$dir/documents.parquet")
    Tables.writeJsonl(src, tmp)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val back = Tables.readJsonl(spark, tmp, schema).select(src.columns.map(col): _*)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(docAgg(back) === docAgg(src))
    // content equality, not just aggregates: every (id, text) hash matches
    val mismatch = back.select(col("doc_id"), md5(col("text")).as("h"))
      .join(src.select(col("doc_id"), md5(col("text")).as("h2")), Seq("doc_id"))
      .where(col("h") =!= col("h2")).count()
    assert(mismatch === 0L)
  }

  test("ORC round trip preserves content and pushes filters to the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-orc-rt").toString
    val src = spark.read.parquet(s"$dir/documents.parquet")
    Tables.writeOrc(src, tmp)
    val back = Tables.readOrc(spark, tmp).select(src.columns.map(col): _*)
    assert(docAgg(back) === docAgg(src))
    // predicate pushdown reaches the ORC scan like the parquet one
    val plan = Tables.readOrc(spark, tmp)
      .where(col("doc_id") === 42L).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replace(" ", "").contains("IsNotNull(doc_id)"),
      s"no pushdown in:\n$plan")
  }
}

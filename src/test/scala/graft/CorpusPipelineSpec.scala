package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CorpusPipeline

class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog and runs into the forest for fun"),
    (2L, "the  quick brown fox jumps over the lazy dog and runs into the forest for fun"), // ws variant of 1
    (3L, "der hund und die katze ist nicht in das haus mit den anderen"), // German
    (4L, "tiny"),                                                        // too short
    (5L, "An entirely different English story about the data lake and the analytics engine for the win"),
    (6L, "!!!! ???? ;;;; ....")                                          // junk
  ).toDF("doc_id", "text")

  test("annotate adds scan-side columns") {
    val a = CorpusPipeline.annotate(docs)
    assert(a.columns.toSet.intersect(
      Set("n_tokens", "quality", "lang_pred", "fp")).size === 4)
    val r = a.where("doc_id = 3").select("lang_pred").head().getString(0)
    assert(r === "de")
  }

  test("curate: filters short/junk/non-English, dedups whitespace variants") {
    val kept = CorpusPipeline.curate(docs).select("doc_id").as[Long]
      .collect().toSet
    assert(kept === Set(1L, 5L)) // 2 deduped into 1; 3 non-en; 4 short; 6 junk
  }

  test("curate keeps annotation columns on survivors") {
    val row = CorpusPipeline.curate(docs).where("doc_id = 5").head()
    assert(row.getAs[Int]("n_tokens") === 16)
    assert(row.getAs[String]("lang_pred") === "en")
  }
}

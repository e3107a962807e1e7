package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Classify

/** [[Classify]] — feature determinism, gradient-descent learning on a
  * separable fixture, scoring semantics.
  */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fcols = Seq("f0", "f1", "f2", "f3")

  test("textFeatures: integer-derived, empty text stays finite") {
    val docs = Seq((1L, "ab ab cd"), (2L, "")).toDF("doc_id", "text")
    val f = Classify.textFeatures(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = f(0)
    assert(r1.getDouble(r1.fieldIndex("f0")) === 1.0)
    assert(r1.getDouble(r1.fieldIndex("f1")) === 0.03)        // 3 tokens
    assert(r1.getDouble(r1.fieldIndex("f2")) === 8.0 / 30.0)  // 8 chars
    assert(r1.getDouble(r1.fieldIndex("f3")) === 2.0 / 3.0)   // 2 unique
    val r2 = f(1)
    fcols.foreach(c =>
      assert(!r2.getDouble(r2.fieldIndex(c)).isNaN, s"$c NaN on empty text"))
  }

  test("trainLogistic separates long from short docs") {
    // y=1 docs are 40 tokens, y=0 docs are 4 — f1 separates them linearly
    val long = (1L to 20L).map(i => (i, Seq.fill(40)(s"w$i").mkString(" "), 1.0))
    val short = (21L to 40L).map(i => (i, Seq.fill(4)(s"w$i").mkString(" "), 0.0))
    val feats = Classify.textFeatures(
      (long ++ short).toDF("doc_id", "text", "y"), "doc_id", "text")
    val w = Classify.trainLogistic(feats, fcols, "y",
      iterations = 60, lr = 8.0)
    val scored = Classify.scoreLogistic(feats, fcols, w)
      .select(col("y"), col("p")).collect()
    assert(scored.forall(r => (r.getDouble(1) >= 0.5) == (r.getDouble(0) == 1.0)),
      s"not separated with w=${w.toSeq}")
  }

  test("zero iterations scores one half everywhere; weights shape checked") {
    val feats = Classify.textFeatures(
      Seq((1L, "a b c", 1.0)).toDF("doc_id", "text", "y"), "doc_id", "text")
    val w = Classify.trainLogistic(feats, fcols, "y", iterations = 0)
    assert(w.toSeq === Seq(0.0, 0.0, 0.0, 0.0))
    val p = Classify.scoreLogistic(feats, fcols, w).select("p").head.getDouble(0)
    assert(p === 0.5)
    assertThrows[IllegalArgumentException] {
      Classify.scoreLogistic(feats, fcols, Array(1.0))
    }
  }
}

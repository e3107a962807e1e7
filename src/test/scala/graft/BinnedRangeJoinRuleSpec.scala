package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.BinnedRangeJoinRule

class BinnedRangeJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val values = Seq.tabulate(400)(i => (i.toLong, (i % 197).toDouble))
    .toDF("id", "v")
  private lazy val bands = Seq(
    (1L, 0.0, 50.0), (2L, 25.0, 125.0), (3L, 150.0, 200.0)
  ).toDF("band_id", "lo", "hi")

  private def inequalityJoin() =
    values.join(bands, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "band_id")

  private def withBinWidth[A](w: String)(f: => A): A = {
    spark.conf.set(BinnedRangeJoinRule.BinWidthKey, w)
    try f finally spark.conf.unset(BinnedRangeJoinRule.BinWidthKey)
  }

  test("rule off: inequality join plans a nested-loop join") {
    // the shared session may carry the conf from other specs (q69 sets it)
    spark.conf.unset(BinnedRangeJoinRule.BinWidthKey)
    val plan = inequalityJoin().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }

  test("rule on: same results through a hash join on the bin") {
    val expected = inequalityJoin().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    withBinWidth("50") {
      val df = inequalityJoin()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size) // exactly-once per (row, band)
      assert(got.toSet === expected)
    }
  }

  test("rule on: value side may be the right child") {
    val expected = bands.join(values, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "band_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    withBinWidth("50") {
      val df = bands.join(values, col("v") >= col("lo") && col("v") < col("hi"))
        .select("id", "band_id")
      assert(!df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === expected)
    }
  }

  test("rule tolerates malformed bands (lo > hi) like the original plan") {
    val bad = Seq((9L, 500.0, 100.0), (1L, 0.0, 50.0)).toDF("band_id", "lo", "hi")
    withBinWidth("50") {
      val got = values.join(bad, col("v") >= col("lo") && col("v") < col("hi"))
        .groupBy("band_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the inverted band matches nothing — no "Illegal sequence boundaries"
      assert(!got.contains(9L))
      assert(got(1L) > 0)
    }
  }

  test("rule leaves equi-joins and other shapes alone") {
    val oddExpected = values.join(bands,
      col("v") >= col("lo") && col("v") < col("hi") && col("v") =!= 10.0).count()
    withBinWidth("50") {
      val equi = values.join(bands, col("v") === col("lo"))
      // v = i % 197 over 400 rows: residues 0..5 occur 3×, others 2× →
      // lo ∈ {0, 25, 150} matches 3 + 2 + 2 rows
      assert(equi.count() === 7)
      // a left-only extra conjunct is PUSHED DOWN first, after which the
      // join IS the band pattern → rewritten, results still correct
      val odd = values.join(bands,
        col("v") >= col("lo") && col("v") < col("hi") && col("v") =!= 10.0)
      assert(!odd.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(odd.count() === oddExpected)
      // closed upper bound is NOT the half-open pattern → untouched
      val closed = values.join(bands,
        col("v") >= col("lo") && col("v") <= col("hi"))
      assert(closed.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    }
  }
}

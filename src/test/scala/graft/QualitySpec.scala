package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality

class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1L), Some(10.0), "O"),
    (Some(2L), Some(-5.0), "F"),   // range fail
    (None, Some(3.0), "X"),        // null fail + set fail
    (Some(2L), None, "P")          // dup key + null range input (fail)
  ).toDF("id", "amt", "status")

  test("audit counts failures per check in one result") {
    val got = Quality.audit(df, Seq(
        Quality.notNull("id"),
        Quality.inRange("amt", 0.0, 100.0),
        Quality.inSet("status", Seq("O", "F", "P")),
        Quality.unique("id")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("id_not_null") === ((4L, 1L)))
    // NULL predicate outcome counts as a failure, not a pass
    assert(got("amt_in_range") === ((4L, 2L)))
    assert(got("status_in_set") === ((4L, 1L)))
    // two rows share id=2; the NULL id row is its own group of 1
    assert(got("id_unique") === ((4L, 2L)))
  }

  test("audit reports 0 failures (not NULL) on an empty table") {
    val got = Quality.audit(df.where(lit(false)), Seq(
        Quality.notNull("id"), Quality.inRange("amt", 0, 1)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("id_not_null") === ((0L, 0L)))
    assert(got("amt_in_range") === ((0L, 0L)))
  }

  test("approx_percentile tracks exact percentile within the GK rank-error bound") {
    // q51b's gate is rows-only (sketch output is engine-specific); the
    // accuracy contract lives here as a VALUE tolerance: on this data the
    // extendedprice distribution is dense, so the GK sketch's rank error
    // (<= n/accuracy = a handful of rows at accuracy=10000) translates to
    // well under 1% relative value error. (A literal rank-bound check
    // would need the full sorted column; the value bound is what
    // downstream consumers of the percentile actually rely on.)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val got = li.groupBy("l_returnflag").agg(
        org.apache.spark.sql.functions.expr(
          "approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"),
        org.apache.spark.sql.functions.expr(
          "percentile(l_extendedprice, 0.5)").as("p50"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val ap = r.getDouble(1); val ex = r.getDouble(2)
      assert(math.abs(ap - ex) / math.max(ex, 1.0) < 0.01,
        s"${r.getString(0)}: approx $ap vs exact $ex")
    }
  }

  test("repetitionProfile: dup and top n-gram fractions from first principles") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),            // 2-grams: ab ba ab ba ab → 5 occ, 2 distinct
      (2L, "all distinct words here"), // 3 occ, 3 distinct → dup 0
      (3L, "single")                   // < 2 tokens → omitted
    ).toDF("doc_id", "text")
    val got = graft.operators.Quality.repetitionProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(math.abs(got(1L)._1 - (1.0 - 2.0 / 5.0)) < 1e-12)
    assert(math.abs(got(1L)._2 - 3.0 / 5.0) < 1e-12) // "a b" occurs 3 of 5
    assert(got(2L) === ((0.0, 1.0 / 3.0)))
  }

  test("unigramLogProb: NLL from first principles on a tiny corpus") {
    import spark.implicits._
    // corpus unigrams: a:2 b:2 c:1 (total 5)
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = graft.operators.Quality.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(math.abs(got(1L)._1 - (-math.log(0.4))) < 1e-12 && got(1L)._2 === 3L)
    assert(math.abs(got(2L)._1 -
      (-math.log(0.4) - math.log(0.2)) / 2.0) < 1e-12 && got(2L)._2 === 2L)
  }

  test("mixtureWeights: shares sum to 1; weight = target/actual; unlisted group drops") {
    import spark.implicits._
    val rows = Seq(("a", 60L), ("a", 20L), ("b", 15L), ("c", 5L))
      .toDF("src", "toks")
    val got = graft.operators.Analytics.mixtureWeights(rows, "src",
        col("toks"), Map("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got("a") === ((80L, 0.8, 0.5, 0.625)))
    assert(got("b") === ((15L, 0.15, 0.5, 0.5 / 0.15)))
    assert(got("c")._3 === 0.0 && got("c")._4 === 0.0) // target 0 → weight 0
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-12)
  }

  test("audit is a single scan for plain predicates") {
    val plan = Quality.audit(df, Seq(
        Quality.notNull("id"), Quality.inRange("amt", 0, 1)))
      .queryExecution.executedPlan.toString
    // no union of repeated scans — one aggregate over one source
    assert(!plan.contains("Union"))
  }
}

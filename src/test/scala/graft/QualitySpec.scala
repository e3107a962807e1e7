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

  test("audit is a single scan for plain predicates") {
    val plan = Quality.audit(df, Seq(
        Quality.notNull("id"), Quality.inRange("amt", 0, 1)))
      .queryExecution.executedPlan.toString
    // no union of repeated scans — one aggregate over one source
    assert(!plan.contains("Union"))
  }
}

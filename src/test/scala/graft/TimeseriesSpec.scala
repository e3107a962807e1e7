package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Timeseries

class TimeseriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("resampleFfill: dense grid, bin means, forward fill across gaps") {
    // user a: observations in bins 0, 0, and 3 (of a 60 s grid) — bins 1-2
    // are gaps; user b: a single observation → a single-bin spine
    val df = Seq(
      ("a", ts("2024-01-01 00:00:10"), 10.0),
      ("a", ts("2024-01-01 00:00:50"), 20.0),
      ("a", ts("2024-01-01 00:03:05"), 40.0),
      ("b", ts("2024-01-01 02:00:00"), 7.0))
      .toDF("k", "t", "v")
    val got = Timeseries.resampleFfill(df, "k", "t", "v", stepSeconds = 60L)
      .orderBy("k", "bin")
      .select("k", "n", "v", "v_ffill")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("a", 2L, Some(15.0), 15.0),   // mean of the two bin-0 rows
      ("a", 0L, None, 15.0),         // gap: carried forward
      ("a", 0L, None, 15.0),
      ("a", 1L, Some(40.0), 40.0),
      ("b", 1L, Some(7.0), 7.0)))
  }

  test("resampleFfill: spine is keyed — no key bleeds into another's range") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("b", ts("2024-06-01 00:00:00"), 2.0)) // half a year apart
      .toDF("k", "t", "v")
    val got = Timeseries.resampleFfill(df, "k", "t", "v", stepSeconds = 3600L)
    // a global spine would explode to thousands of rows here
    assert(got.count() === 2)
    assert(got.where($"v_ffill".isNull).count() === 0)
  }

  test("resampleFfill: bin boundary rows land in their own bin") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:59"), 1.0),
      ("a", ts("2024-01-01 00:01:00"), 3.0)) // exactly on the boundary
      .toDF("k", "t", "v")
    val got = Timeseries.resampleFfill(df, "k", "t", "v", stepSeconds = 60L)
      .orderBy("bin").select("v").as[Double].collect().toSeq
    assert(got === Seq(1.0, 3.0))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd

class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2 collapses runs and closes intervals with lead()") {
    val log = Seq(
      (1L, ts("2021-01-01 00:00:00"), 1L, "bronze"),
      (1L, ts("2021-02-01 00:00:00"), 2L, "bronze"), // unchanged → collapsed
      (1L, ts("2021-03-01 00:00:00"), 3L, "gold"),
      (2L, ts("2021-01-15 00:00:00"), 4L, "silver")
    ).toDF("cust", "at", "seq", "tier")
    val dim = Scd.scd2(log, "cust", "at", Seq("tier"), tiebreaker = Some("seq"))
      .orderBy("cust", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toString.take(10),
        Option(r.getTimestamp(3)).map(_.toString.take(10)),
        r.getBoolean(4)))
    assert(dim.toSeq === Seq(
      (1L, "bronze", "2021-01-01", Some("2021-03-01"), false),
      (1L, "gold", "2021-03-01", None, true),
      (2L, "silver", "2021-01-15", None, true)))
  }

  test("scd2 transitions on any field of a multi-attribute dim") {
    val log = Seq(
      (1L, ts("2021-01-01 00:00:00"), 1L, "a", 10),
      (1L, ts("2021-02-01 00:00:00"), 2L, "a", 20), // second attr changed
      (1L, ts("2021-03-01 00:00:00"), 3L, "a", 20)  // unchanged → collapsed
    ).toDF("k", "at", "seq", "s", "n")
    val dim = Scd.scd2(log, "k", "at", Seq("s", "n"), tiebreaker = Some("seq"))
    assert(dim.count() === 2)
    assert(dim.where(col("is_current")).select("n").head().getInt(0) === 20)
  }

  test("scd2 tiebreaker orders same-timestamp changes deterministically") {
    val t0 = ts("2021-01-01 00:00:00")
    val log = Seq((1L, t0, 2L, "late"), (1L, t0, 1L, "early"))
      .toDF("k", "at", "seq", "v")
    val dim = Scd.scd2(log, "k", "at", Seq("v"), tiebreaker = Some("seq"))
      .orderBy("valid_from", "v").collect()
    assert(dim.length === 2)
    val current = dim.filter(_.getBoolean(4))
    assert(current.map(_.getString(1)).toSeq === Seq("late"))
  }
}

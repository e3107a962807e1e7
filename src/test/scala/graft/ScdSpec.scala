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

  test("validityAudit: overlaps, gaps, dueling currents, clean chains") {
    val dim = Seq(
      // k1: clean chain, one current
      ("k1", Some(1L), Some(5L)), ("k1", Some(5L), Some(9L)),
      ("k1", Some(9L), None),
      // k2: overlap (4 < 5) and a gap (12 > 9)
      ("k2", Some(1L), Some(5L)), ("k2", Some(4L), Some(9L)),
      ("k2", Some(12L), None),
      // k3: a NON-final open interval swallows its successor → overlap,
      // and two currents
      ("k3", Some(1L), None), ("k3", Some(5L), None))
      .map { case (k, f, t) => (k, f.get, t) }.toDF("k", "vf", "vt")
    val got = Scd.validityAudit(dim, "k", "vf", "vt")
      .orderBy("k").collect()
      .map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("n_versions"), r.getAs[Long]("n_overlaps"),
          r.getAs[Long]("n_gaps"), r.getAs[Long]("n_current"))).toMap
    assert(got("k1") === ((3L, 0L, 0L, 1L)))
    assert(got("k2") === ((3L, 1L, 1L, 1L)))
    assert(got("k3") === ((2L, 1L, 0L, 2L)))
  }

  test("validityAudit: the scd2 builder's own output always audits clean") {
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-02-01 00:00:00"), "b"),
      (2L, ts("2024-01-15 00:00:00"), "x"))
      .toDF("id", "changed_at", "attr")
    val dim = Scd.scd2(changes, "id", "changed_at", Seq("attr"))
    val audit = Scd.validityAudit(dim, "id", "valid_from", "valid_to")
      .collect()
    assert(audit.forall(r => r.getAs[Long]("n_overlaps") == 0L &&
      r.getAs[Long]("n_gaps") == 0L && r.getAs[Long]("n_current") == 1L))
  }
}

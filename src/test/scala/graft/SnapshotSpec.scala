package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Snapshot

class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diff classifies added / removed / changed / unchanged") {
    val before = Seq(
      (1L, "a", Some(1.0)), (2L, "b", Some(2.0)),
      (3L, "c", None), (4L, "d", Some(4.0))
    ).toDF("id", "s", "x")
    val after = Seq(
      (1L, "a", Some(1.0)),          // unchanged
      (2L, "B", Some(2.0)),          // changed
      (3L, "c", Some(3.0)),          // changed (NULL → value must register)
      (5L, "e", Some(5.0))           // added; 4 removed
    ).toDF("id", "s", "x")
    val got = Snapshot.diff(before, after, Seq("id")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    val summary = Snapshot.diffSummary(before, after, Seq("id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary === Map("unchanged" -> 1L, "changed" -> 2L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("diff treats null-position swaps as changed") {
    val before = Seq((1L, Some("x"), Option.empty[String])).toDF("id", "a", "b")
    val after = Seq((1L, Option.empty[String], Some("x"))).toDF("id", "a", "b")
    val got = Snapshot.diff(before, after, Seq("id")).head().getString(1)
    assert(got === "changed")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graphs

/** [[Graphs.pageRank]] semantics on hand-built graphs: mass conservation,
  * dangling redistribution, and known fixed points.
  */
class GraphsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    Graphs.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("two-node cycle: uniform is the fixed point from round 0") {
    val r = ranks(Seq((1L, 2L), (2L, 1L)), iters = 7)
    assert(math.abs(r(1L) - 0.5) < 1e-12 && math.abs(r(2L) - 0.5) < 1e-12)
  }

  test("dangling node: mass conserved, sink outranks its source") {
    // a → b, b has no out-edges: b's mass teleports uniformly each round
    val r = ranks(Seq((1L, 2L)), iters = 20)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r(2L) > r(1L))
  }

  test("star: the hub accumulates; leaves stay at the teleport floor") {
    val leaves = (2L to 5L)
    val r = ranks(leaves.map(_ -> 1L) :+ (1L -> 2L), iters = 20)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(leaves.forall(l => r(1L) > r(l)))
    // leaves 3..5 have no in-edges: exactly the teleport share plus the
    // hub's redistributed... nothing — hub links only to leaf 2
    assert(math.abs(r(3L) - 0.15 / 5) < 1e-9)
    assert(r(2L) > r(3L))
  }

  test("zero iterations returns the uniform vector") {
    val r = ranks(Seq((1L, 2L), (2L, 3L)), iters = 0)
    assert(r.values.forall(v => math.abs(v - 1.0 / 3) < 1e-12))
  }
}

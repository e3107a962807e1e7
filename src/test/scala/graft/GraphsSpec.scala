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

  test("pageRankPersonalized: unit weights + no restart equals pageRank") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 5L), (5L, 3L),
      (3L, 0L), (4L, 2L))
    val plain = ranks(edges, iters = 5)
    val ppr = Graphs.pageRankPersonalized(edges.toDF("src", "dst"),
        iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain.keySet === ppr.keySet)
    plain.foreach { case (k, v) => assert(math.abs(v - ppr(k)) < 1e-12) }
  }

  test("pageRankPersonalized: restart mass stays seed-relative on a path") {
    // A→B→C, restart {A}, d=0.5, 1 round: pr⁰ = (1,0,0);
    // pr¹(A) = 0.5·1 (pure teleport), pr¹(B) = 0.5·pr⁰(A) = 0.5,
    // pr¹(C) = 0 — off the 1-step frontier, no global floor
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r = Graphs.pageRankPersonalized(edges, iterations = 1,
        damping = 0.5, restart = Some(seeds))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.5) < 1e-12)
    assert(math.abs(r(2L) - 0.5) < 1e-12)
    assert(r(3L) === 0.0)
    // round 2: C gets pr¹(B)·0.5 = 0.25, B gets pr¹(A)·0.5 = 0.25,
    // A keeps teleport 0.5 + dangling(C's 0)·r — mass stays 1
    val r2 = Graphs.pageRankPersonalized(edges, iterations = 2,
        damping = 0.5, restart = Some(seeds))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r2(1L) - 0.5) < 1e-12)
    assert(math.abs(r2(2L) - 0.25) < 1e-12)
    assert(math.abs(r2(3L) - 0.25) < 1e-12)
    assert(math.abs(r2.values.sum - 1.0) < 1e-12)
  }

  test("pageRankPersonalized: edge weights steer the walk; mass conserved") {
    // A splits 3:1 between B and C — B must end above C
    val edges = Seq((1L, 2L, 3.0), (1L, 3L, 1.0)).toDF("src", "dst", "w")
    val r = Graphs.pageRankPersonalized(edges, iterations = 3,
        weightCol = Some("w"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(2L) > r(3L))
    assert(math.abs(r.values.sum - 1.0) < 1e-12)
    // non-positive-weight edges drop: w=0 edge contributes nothing
    val rz = Graphs.pageRankPersonalized(
        Seq((1L, 2L, 1.0), (1L, 3L, 0.0)).toDF("src", "dst", "w"),
        iterations = 2, weightCol = Some("w"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // node 3 only appears via the zero edge → not in the graph at all
    assert(!rz.contains(3L))
  }

  test("pageRankPersonalized: a restart set disjoint from the graph is " +
    "refused") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val seeds = Seq(99L).toDF("node")
    val e = intercept[IllegalArgumentException] {
      Graphs.pageRankPersonalized(edges, iterations = 1,
        restart = Some(seeds)).collect()
    }
    assert(e.getMessage.contains("restart set"))
  }

  test("modularity: two triangles + bridge score 5/14 under the " +
    "natural partition; the one-community partition scores 0") {
    // degrees: 2,2,3 | 3,2,2 → d_c = 7 each, e_c = 3 each, m = 7
    // Q = 2·(3/7 − (7/14)²) = 6/7 − 1/2 = 5/14
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("node", "community")
    val r = Graphs.modularity(edges, labels).head()
    assert(r.getAs[Long]("n_nodes") === 6L)
    assert(r.getAs[Long]("n_edges") === 7L)
    assert(r.getAs[Long]("n_communities") === 2L)
    assert(math.abs(r.getAs[Double]("modularity") - 5.0 / 14) < 1e-12)
    val all = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 0L),
      (6L, 0L)).toDF("node", "community")
    val r1 = Graphs.modularity(edges, all).head()
    assert(math.abs(r1.getAs[Double]("modularity")) < 1e-12)
  }

  test("modularity: nodes missing from the labeling fall back to " +
    "singletons") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val labels = Seq((1L, 9L), (2L, 9L)).toDF("node", "community")
    val r = Graphs.modularity(edges, labels).head()
    // {1,2} intra edge + singleton {3}: Q = (1/2 − (3/4)²) + (0 − (1/4)²)
    assert(r.getAs[Long]("n_communities") === 2L)
    assert(math.abs(r.getAs[Double]("modularity") -
      (0.5 - 0.5625 - 0.0625)) < 1e-12)
  }

  test("degreeAssortativity: a star is perfectly disassortative; a " +
    "regular cycle reports null") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r = Graphs.degreeAssortativity(star).head()
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(math.abs(r.getAs[Double]("assortativity") - (-1.0)) < 1e-12)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val rc = Graphs.degreeAssortativity(cycle).head()
    assert(rc.isNullAt(rc.fieldIndex("assortativity")))
  }

  test("reciprocity: counts mutual directed edges exactly") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (3L, 3L))
      .toDF("src", "dst") // dup + self-loop must not count
    val r = Graphs.reciprocity(edges).head()
    assert(r.getAs[Long]("n_edges") === 3L)
    assert(r.getAs[Long]("n_reciprocal") === 2L)
    assert(math.abs(r.getAs[Double]("reciprocity") - 2.0 / 3) < 1e-12)
  }

  private def tri(edges: Seq[(Long, Long)]): (Long, Long, Long, Double) = {
    val r = Graphs.triangleStats(edges.toDF("src", "dst")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
  }

  test("triangleStats: K4 has 4 triangles and coefficient 1") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val (e, w, t, c) = tri(k4)
    assert(e === 6L && w === 12L && t === 4L && c === 1.0)
  }

  test("triangleStats: a path has wedges but no triangles") {
    val (e, w, t, c) = tri(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(e === 3L && w === 2L && t === 0L && c === 0.0)
  }

  private def aa(edges: Seq[(Long, Long)], cap: Int = 1000,
                 k: Int = 100): Seq[(Long, Long, Long, Double)] =
    Graphs.adamicAdar(edges.toDF("src", "dst"), maxBrokerDegree = cap,
        topK = k)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  test("adamicAdar: path 1-2-3 predicts exactly (1,3) at 1/ln 2") {
    val got = aa(Seq((1L, 2L), (2L, 3L)))
    assert(got === Seq((1L, 3L, 1L, 1.0 / math.log(2.0))))
  }

  test("adamicAdar: square predicts both diagonals via two brokers each") {
    val got = aa(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))).toSet
    assert(got.map { case (u, v, n, _) => (u, v, n) } ===
      Set((1L, 3L, 2L), (2L, 4L, 2L)))
    assert(got.forall { case (_, _, _, s) =>
      math.abs(s - 2.0 / math.log(2.0)) < 1e-12 })
  }

  test("adamicAdar: existing edges are never predicted") {
    // triangle: every 2-hop pair is already adjacent
    assert(aa(Seq((1L, 2L), (2L, 3L), (1L, 3L))).isEmpty)
  }

  test("adamicAdar: over-cap hubs are excluded from brokering") {
    val star = (2L to 6L).map(1L -> _) // center 1 has degree 5
    assert(aa(star, cap = 4).isEmpty)
    // with the cap lifted, the center brokers all C(5,2) leaf pairs
    assert(aa(star, cap = 5).size === 10)
  }

  private def hitsMap(edges: Seq[(Long, Long)],
                      iters: Int): Map[Long, (Double, Double)] =
    Graphs.hits(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r =>
        r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap

  test("hits: a single edge separates the pure hub from the pure authority") {
    val r = hitsMap(Seq((1L, 2L)), iters = 3)
    assert(r(1L) === ((1.0, 0.0)) && r(2L) === ((0.0, 1.0)))
  }

  test("hits: bipartite hubs and authorities split mass evenly") {
    val r = hitsMap(Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)), iters = 4)
    Seq(1L, 2L).foreach(n => assert(math.abs(r(n)._1 - 0.5) < 1e-12))
    Seq(3L, 4L).foreach(n => assert(math.abs(r(n)._2 - 0.5) < 1e-12))
  }

  test("hits: two hand-iterated rounds on an asymmetric graph") {
    // 1→3, 2→3, 2→4. round 1: a = (2/3, 1/3); h = (0.4, 0.6)
    // round 2: a = (0.625, 0.375); h = (5/13, 8/13)
    val r = hitsMap(Seq((1L, 3L), (2L, 3L), (2L, 4L)), iters = 2)
    assert(math.abs(r(1L)._1 - 5.0 / 13) < 1e-12)
    assert(math.abs(r(2L)._1 - 8.0 / 13) < 1e-12)
    assert(math.abs(r(3L)._2 - 0.625) < 1e-12)
    assert(math.abs(r(4L)._2 - 0.375) < 1e-12)
  }

  test("adamicAdar: topK cut is deterministic (score desc, then pair)") {
    val star = (2L to 6L).map(1L -> _)
    val got = aa(star, k = 3)
    assert(got.size === 3)
    // all scores tie at 1/ln 5: cut picks the (u, v)-smallest pairs
    assert(got.map { case (u, v, _, _) => (u, v) } ===
      Seq((2L, 3L), (2L, 4L), (2L, 5L)))
  }

  test("triangleStats: duplicates, reversals and self-loops collapse") {
    // the same triangle asserted three redundant ways + a self-loop
    val (e, w, t, _) = tri(Seq((1L, 2L), (2L, 1L), (1L, 2L),
      (2L, 3L), (3L, 1L), (1L, 1L)))
    assert(e === 3L && w === 3L && t === 1L)
  }

  test("triangleStats: hub wedges are counted at the center") {
    // star K1,3: 3 wedges centered at the hub, none elsewhere
    val (_, w, t, c) = tri(Seq((10L, 1L), (10L, 2L), (10L, 3L)))
    assert(w === 3L && t === 0L && c === 0.0)
  }

  test("localClustering: triangle credits all corners, bridges score low") {
    // a triangle {1,2,3} plus a pendant edge 3-4: vertices 1,2 have
    // coeff 1; vertex 3 has deg 3 → 1/C(3,2) = 1/3; vertex 4 (deg 1)
    // is excluded
    val got = Graphs.localClustering(
        Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === ((2L, 1L, 1.0)) && got(2L) === ((2L, 1L, 1.0)))
    assert(got(3L)._1 === 3L && got(3L)._2 === 1L)
    assert(math.abs(got(3L)._3 - 1.0 / 3) < 1e-15)
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graphs.labelPropagation(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: a barbell splits at the bridge") {
    // two triangles joined by one edge 3-4: hand-simulated sync rounds
    // with min-label ties settle A={1,2,3}→1 and B={4,5,6}→3 by round 4
    val got = lpa(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)), iters = 5)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation: disconnected components never mix") {
    val got = lpa(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L)), iters = 5)
    assert(Set(got(1L), got(2L), got(3L)).size === 1)
    assert(Set(got(10L), got(11L), got(12L)).size === 1)
    assert(got(1L) !== got(10L))
  }

  test("labelPropagation: the sync 2-cycle on a lone edge is deterministic") {
    // a single edge swaps labels every round — exactly why the operator
    // runs a FIXED horizon (matching the unrolled oracle) instead of
    // "until stable": 5 rounds (odd) lands on the swapped assignment
    assert(lpa(Seq((1L, 2L)), iters = 5) === Map(1L -> 2L, 2L -> 1L))
    assert(lpa(Seq((1L, 2L)), iters = 4) === Map(1L -> 1L, 2L -> 2L))
  }

  test("labelPropagation: zero iterations returns every node its own label") {
    val got = lpa(Seq((1L, 2L), (2L, 3L)), iters = 0)
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  private def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    Graphs.kCore(edges.toDF("src", "dst"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCore: a whisker chain peels iteratively, the clique survives") {
    // K4 {1,2,3,4} with a pendant chain 4-5-6: at k=2 the chain strips
    // end-first over TWO rounds (6 first, then 5) — the cascade case
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = core(k4 ++ Seq((4L, 5L), (5L, 6L)), k = 2)
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: core degrees are WITHIN the core, not the raw graph") {
    // triangle {1,2,3} + two pendants on node 3: raw deg(3) = 4, but
    // after the pendants peel at k=2 its core degree is 2
    val got = core(Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 10L), (3L, 11L)), k = 2)
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: no k-core yields empty, k=1 keeps every non-isolated node") {
    assert(core(Seq((1L, 2L), (2L, 3L)), k = 3) === Map.empty)
    assert(core(Seq((1L, 2L), (2L, 3L)), k = 1) ===
      Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  private def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  hops: Int): Map[Long, Long] =
    Graphs.bfsDistances(edges.toDF("src", "dst"),
        seeds.toDF("node"), maxHops = hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bfsDistances: path graph — horizon cuts off exactly at maxHops") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    assert(bfs(path, Seq(0L), hops = 2) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    assert(bfs(path, Seq(0L), hops = 0) === Map(0L -> 0L))
  }

  test("bfsDistances: nearest of several seeds wins; edges are undirected") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    // seeds at both ends: middle node 2 is 2 hops from each
    assert(bfs(path, Seq(0L, 4L), hops = 4) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
    // directed-looking edge list still relaxes against the arrow
    assert(bfs(Seq((1L, 0L), (2L, 1L)), Seq(0L), hops = 2) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("bfsDistances: a shortcut edge shortens the distance") {
    val g = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))
    assert(bfs(g, Seq(0L), hops = 3) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge tables. [[Dedup.connectedComponents]]
  * covers the undirected-closure case (dedup clusters); this module adds the
  * directed, value-propagating case — PageRank, the canonical importance
  * score for link/citation/reference graphs (domain authority in corpus
  * curation, entity salience in knowledge graphs).
  */
object Graphs {

  /** PageRank with damping `d` over a directed edge table `(src, dst)`:
    * {{{ pr'(v) = (1−d)/N + d · ( Σ_{u→v} pr(u)/outdeg(u) + D/N ) }}}
    * where `D` is the total rank mass on dangling nodes (outdeg 0) —
    * redistributed uniformly, the standard stochastic-matrix completion.
    * Runs exactly `iterations` rounds from the uniform vector (fixed
    * iteration count keeps the result deterministic and cross-engine
    * checkable; convergence-threshold stopping composes on top by reading
    * the delta between successive calls). Returns `(node, pr)`.
    *
    * Shape for scale — the [[Dedup.connectedComponents]] loop conventions:
    *  - nodes and inverse-outdegree-weighted edges are computed ONCE and
    *    pinned; each round re-reads pinned blocks, not recomputed lineage;
    *  - a round is one join (ranks ⋈ edges on `src`, both sides hash-
    *    partitioned on the key) + one partial-aggregable sum keyed on
    *    `dst` — shuffles carry (id, double), never adjacency lists, so
    *    skewed in-degree is absorbed by map-side combine;
    *  - the dangling mass is a one-row aggregate broadcast back via cross
    *    join — no driver collect inside the loop;
    *  - each round pins via `localCheckpoint` (or reliable `checkpoint`
    *    when `checkpointDir` is given — executor-loss-safe on a cluster),
    *    keeping the plan depth constant across iterations.
    */
  /** Exact triangle counting with degree orientation — the one-row graph
    * shape report: undirected edge count, wedge (open-triple) count,
    * triangle count, and the global clustering coefficient
    * `3·triangles / wedges` (0 when wedge-free). Input edges are treated
    * as undirected (normalized, deduped, self-loops dropped).
    *
    * Shape for scale (the standard MR-triangle algorithm): every edge is
    * oriented from its lower (degree, id) endpoint to the higher, which
    * (a) counts each triangle exactly once and (b) bounds any vertex's
    * out-degree by ~√m, so the wedge self-join — the quadratic step — is
    * per-vertex-bounded even on power-law graphs where a hub's raw degree
    * would explode an unoriented join. Wedges then close via one hash
    * join against the oriented edge set; shuffles carry only id pairs.
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("w"),
            col("db").as("dw")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"),
            col("da").as("dw"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"), col("e.dw").as("dw"))
      .localCheckpoint() // feeds the wedge join twice and the closing join
    // oriented wedges exist only at a triangle's (deg,id)-minimum vertex,
    // so the closure below counts each triangle exactly once; the WEDGE
    // total for the coefficient is the center-counted Σ C(deg,2) (an
    // oriented count would miss wedges centered at high-degree vertices,
    // whose edges orient inward)
    val candidates = oriented
      .select(col("u"), col("w").as("w1"), col("dw").as("d1"))
      .join(oriented.select(col("u"), col("w").as("w2"), col("dw").as("d2")),
        "u")
      .where(struct(col("d1"), col("w1")) < struct(col("d2"), col("w2")))
      .select(col("w1").as("u"), col("w2").as("w"))
    val closed = candidates.join(oriented.select("u", "w"), Seq("u", "w"),
      "left_semi")
    val nEdges = und.agg(count(lit(1)).as("n")).head.getLong(0)
    val nWedges = deg.agg(coalesce(sum(col("d") * (col("d") - 1) / 2),
      lit(0.0)).cast("long").as("n")).head.getLong(0)
    val nTri = closed.agg(count(lit(1)).as("n")).head.getLong(0)
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((nEdges, nWedges, nTri,
      if (nWedges == 0) 0.0 else 3.0 * nTri / nWedges))
      .toDF("n_edges", "n_wedges", "n_triangles", "clustering_coeff")
  }

  /** Per-vertex triangle counts and local clustering coefficients
    * `tri(v) / C(deg(v), 2)` for vertices with degree ≥ 2 — the
    * community-core signal (template families in a dup graph are
    * high-coefficient clusters; bridges are low). Same degree-oriented
    * closure as [[triangleStats]], with the apex carried so each found
    * triangle credits all three corners (one explode + a vertex-keyed
    * count — compact shuffles only). The coefficient is a ratio of exact
    * integers, so it is bit-identical cross-engine.
    */
  def localClustering(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("w"), col("db").as("dw")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"),
            col("da").as("dw"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"), col("e.dw").as("dw"))
      .localCheckpoint()
    val triangles = oriented
      .select(col("u").as("apex"), col("w").as("w1"), col("dw").as("d1"))
      .join(oriented.select(col("u").as("apex"), col("w").as("w2"),
        col("dw").as("d2")), "apex")
      .where(struct(col("d1"), col("w1")) < struct(col("d2"), col("w2")))
      .join(oriented.select(col("u").as("w1"), col("w").as("w2")),
        Seq("w1", "w2"), "left_semi")
    val perVertex = triangles
      .select(explode(array(col("apex"), col("w1"), col("w2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
    deg.where(col("d") >= 2)
      .join(perVertex, Seq("v"), "left")
      .select(col("v"), col("d").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        (coalesce(col("n_triangles"), lit(0L)) /
          (col("d") * (col("d") - 1) / 2)).as("clustering_coeff"))
  }

  def pageRank(edges: DataFrame, iterations: Int = 10, damping: Double = 0.85,
               checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 0, s"iterations must be ≥ 0: $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    // Round-frame layout (optimization guide §2.4, "remove shuffles
    // outright"): every pinned frame records an explicit HashPartitioning
    // on its loop join key ([[Pinning.pinBy]]), at a granularity derived
    // from the measured edge count ([[Pinning.partsFor]]), so a round's
    // plan is
    //   ew(src) ⋈ ranks(node→src)        — co-partitioned, NO exchange
    //   groupBy(dst)                      — the round's ONE exchange
    //   ranks(node) ⋈ contribs(dst→node)  — co-partitioned, NO exchange
    // The dangling flag rides ON the rank frame, so the dangling mass is
    // a filtered one-row aggregate over already-pinned blocks instead of
    // a per-round join, and ranks itself is the node spine (it always
    // carries every node), so the separate per-round nodes join is gone.
    // Previously each round re-exchanged edges, ranks (twice), nodes and
    // the dangling join — 94 AQE stage-jobs for 10 rounds at sf0.1.
    val e =
      if (checkpointDir.isDefined)
        edges.select(col("src"), col("dst")).checkpoint(eager = true)
      else edges.select(col("src"), col("dst"))
        .localCheckpoint(eager = true)
    val parts = Pinning.partsFor(e.count(), e)
    def pin(df: DataFrame, keys: String*): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else Pinning.pinBy(df, parts, keys: _*)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__outdeg"))
    // edge weight 1/outdeg precomputed — the per-round join then carries
    // only (src, dst, w) against (node, pr); aligned on src throughout
    val ew = pin(e.join(outdeg.hint("shuffle_hash"), "src")
      .select(col("src"), col("dst"),
        (lit(1.0) / col("__outdeg")).as("__w")), "src")
    val nodes = pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(outdeg.select(col("src").as("node"), lit(true).as("__nd"))
        .hint("shuffle_hash"), Seq("node"), "left")
      .select(col("node"), col("__nd").isNull.as("__dang")), "node")
    Pinning.unpin(e) // ew + node spine built; the raw edge pin is done
    // N is a bounded driver scalar (one long), like the CC convergence probe
    val n = nodes.count().toDouble
    val teleport = (1.0 - damping) / n
    // projection of the pinned node spine — round 1's unpin releases it
    var ranks = nodes.withColumn("pr", lit(1.0 / n))
    var i = 0
    while (i < iterations) {
      val contribs = ew
        .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"),
          "src")
        .groupBy(col("dst")).agg(sum(col("pr") * col("__w")).as("__m"))
      val dMass = ranks.where(col("__dang"))
        .agg(coalesce(sum("pr"), lit(0.0)).as("__dm"))
      val next = pin(ranks.select(col("node"), col("__dang"))
        .join(contribs.withColumnRenamed("dst", "node").hint("shuffle_hash"),
          Seq("node"), "left")
        .crossJoin(broadcast(dMass))
        .select(col("node"), col("__dang"),
          (lit(teleport) + lit(damping) *
            (coalesce(col("__m"), lit(0.0)) + col("__dm") / n)).as("pr")),
        "node")
      Pinning.unpin(ranks) // superseded round — release its pinned blocks
      ranks = next
      i += 1
    }
    val out = ranks.select(col("node"), col("pr"))
    Pinning.unpin(ew)
    out
  }

  /** Personalized / weighted PageRank — [[pageRank]] generalized along
    * the two axes a retrieval or trust pipeline actually needs: EDGE
    * WEIGHTS (transition probability ∝ weight within each source's
    * out-edges — co-citation counts, similarity scores, interaction
    * frequencies) and a RESTART SET (teleport mass lands uniformly on
    * `restart`'s nodes instead of all nodes — random walk with restart,
    * the topic-sensitive / TrustRank formulation). With unit weights and
    * no restart set the fixpoint IS pageRank's. Ranks initialize AT the
    * restart distribution (the RWR convention), nodes outside the
    * restart set get teleport mass 0 — they score only through walk
    * reachability, which is what makes the result a seed-RELATIVE
    * relevance rather than a global centrality — and dangling mass
    * redistributes to the restart distribution (the uniform variant's
    * convention restated over r). Non-positive-weight edges are dropped
    * up front (they would corrupt the per-source normalizer). Returns
    * (node, pr).
    *
    * Scale shape = pageRank's: weights normalize ONCE (one out-weight
    * aggregate + one join, pinned), each round is one join of the
    * normalized edges against the rank frame — shuffled on the same key
    * every round — plus a broadcast one-row dangling scalar; rank frames
    * pin per round and unpin when superseded, so plan depth stays
    * constant. |restart| is a bounded driver scalar (one count), never a
    * collected set.
    */
  def pageRankPersonalized(edges: DataFrame, iterations: Int = 10,
                           damping: Double = 0.85,
                           weightCol: Option[String] = None,
                           restart: Option[DataFrame] = None,
                           checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 0, s"iterations must be ≥ 0: $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    // Same aligned-pin round shape as [[pageRank]] (see the layout note
    // there): rank frames carry (node, __in_r, __dang) so the restart
    // expression and the dangling mass both read the already-pinned
    // round frame, and the per-round plan is one co-partitioned join, one
    // exchange (the dst aggregate), one co-partitioned spine join.
    val w = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val e0 = edges.select(col("src"), col("dst"), w.as("__ew"))
      .where(col("__ew") > 0.0)
    val e =
      if (checkpointDir.isDefined) e0.checkpoint(eager = true)
      else e0.localCheckpoint(eager = true)
    val parts = Pinning.partsFor(e.count(), e)
    def pin(df: DataFrame, keys: String*): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else Pinning.pinBy(df, parts, keys: _*)
    val nodes0 = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outw = e.groupBy(col("src")).agg(sum("__ew").as("__ow"))
    // restart AND dangling flags ride ON the pinned node frame — the
    // round loop then needs no side tables at all beyond ew
    val nodes = pin((restart match {
      case Some(r) =>
        val rs = r.select(col(r.columns.head).as("node")).distinct()
        nodes0.join(rs.select(col("node"), lit(1).as("__in_r")),
          Seq("node"), "left")
      case None => nodes0.withColumn("__in_r", lit(1))
    }).join(outw.select(col("src").as("node"), lit(true).as("__nd"))
        .hint("shuffle_hash"), Seq("node"), "left")
      .select(col("node"), col("__in_r"), col("__nd").isNull.as("__dang")),
      "node")
    val nR = nodes.where(col("__in_r") === 1).count().toDouble
    require(nR > 0,
      "pageRankPersonalized: the restart set shares no node with the graph")
    def rExpr: Column =
      when(col("__in_r") === 1, lit(1.0 / nR)).otherwise(lit(0.0))
    val ew = pin(e.join(outw.hint("shuffle_hash"), "src")
      .select(col("src"), col("dst"), (col("__ew") / col("__ow")).as("__w")),
      "src")
    Pinning.unpin(e) // ew + node spine built; the raw edge pin is done
    // projection of the pinned node spine — round 1's unpin releases it
    var ranks = nodes.withColumn("pr", rExpr)
    var i = 0
    while (i < iterations) {
      val contribs = ew
        .join(ranks.withColumnRenamed("node", "src").hint("shuffle_hash"),
          "src")
        .groupBy(col("dst")).agg(sum(col("pr") * col("__w")).as("__m"))
      val dMass = ranks.where(col("__dang"))
        .agg(coalesce(sum("pr"), lit(0.0)).as("__dm"))
      val next = pin(ranks.select(col("node"), col("__in_r"), col("__dang"))
        .join(contribs.withColumnRenamed("dst", "node").hint("shuffle_hash"),
          Seq("node"), "left")
        .crossJoin(broadcast(dMass))
        .select(col("node"), col("__in_r"), col("__dang"),
          ((lit(1.0) - damping) * rExpr + lit(damping) *
            (coalesce(col("__m"), lit(0.0)) + col("__dm") * rExpr))
            .as("pr")),
        "node")
      Pinning.unpin(ranks) // superseded round — release its pinned blocks
      ranks = next
      i += 1
    }
    val out = ranks.select(col("node"), col("pr"))
    Pinning.unpin(ew)
    out
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007, made deterministic): every node starts in its own community
    * (label = node id); each round, every node simultaneously adopts the
    * most frequent label among its neighbours, ties broken by the
    * SMALLEST label — the async/random variants of LPA are not
    * replayable, this one is, which is what makes it oracle-checkable
    * and idempotent across cluster sizes.
    *
    * Edges are treated as undirected (symmetrized + self-pair-deduped
    * here); isolated nodes keep their own label. Runs a FIXED number of
    * sync rounds rather than to convergence — sync LPA can 2-cycle on
    * bipartite structures, so "until stable" is not well-defined; a
    * fixed horizon is (and matches the unrolled oracle).
    *
    * Shape for scale: per round ONE join of edges against the label
    * frame (shuffle on node id, the same key every round), a (node,
    * label) count aggregate with map-side partials, and a per-node
    * arg-max window — all linear in |E|. Each round's result is
    * checkpointed to cut the lineage (the `connectedComponents`
    * discipline).
    */
  def labelPropagation(edges: DataFrame, iterations: Int = 5): DataFrame = {
    require(iterations >= 0, s"iterations must be ≥ 0: $iterations")
    // Aligned-pin round shape (see [[pageRank]]'s layout note). The one
    // per-round exchange repartitions the joined (src, lbl) pairs by src
    // BEFORE the vote count: HashPartitioning(src) satisfies both the
    // (src, lbl) aggregate (subset rule) and the per-src tie-break
    // window, so the previous agg-then-window double exchange collapses
    // into one, and the round output is already node-partitioned for the
    // pin and the next round's join.
    val und0 = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(eager = true)
    val parts = Pinning.partsFor(und0.count(), und0)
    def pin(df: DataFrame, keys: String*): DataFrame =
      Pinning.pinBy(df, parts, keys: _*)
    val und = pin(und0, "dst")
    val nodes = pin(und.select(col("src").as("node")).distinct(), "node")
    Pinning.unpin(und0)
    var labels = nodes.withColumn("lbl", col("node"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
      .orderBy(col("__c").desc, col("lbl"))
    var i = 0
    while (i < iterations) {
      val next = und
        .join(labels.withColumnRenamed("node", "dst").hint("shuffle_hash"),
          "dst")
        .select(col("src"), col("lbl"))
        .repartition(parts, col("src"))
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("__c"))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("src").as("node"), col("lbl"))
      val pinned = pin(next, "node")
      Pinning.unpin(labels) // superseded round — release its pinned blocks
      labels = pinned
      i += 1
    }
    if (iterations > 0) Pinning.unpin(und)
    labels.withColumnRenamed("lbl", "community")
  }

  /** Multi-source BFS: hop distance from the nearest seed node, out to
    * `maxHops` — the influence/contamination radius probe (how far does a
    * flagged document's link neighbourhood reach; which records sit
    * within N hops of a known-bad source). Nodes the frontier never
    * reaches within the horizon are absent from the result.
    *
    * Synchronous relaxation: every round joins the CURRENT distance
    * frame to the (symmetrized, deduped) edge list once and keeps the
    * per-node minimum of (old, neighbour+1) — shuffle on node id, the
    * same key each round, linear in |E|, checkpointed per round to cut
    * lineage. A fixed horizon of `maxHops` rounds relaxes every distance
    * ≤ maxHops exactly (round r finalizes hop r), so the run replays in
    * a fixed-unroll oracle.
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be ≥ 0: $maxHops")
    // Aligned-pin round shape (see [[pageRank]]'s layout note): the edge
    // list pins keyed on src (the frontier join key), distance frames on
    // node, so each round is one co-partitioned join plus the min-dist
    // aggregate's exchange — the round's only shuffle.
    val und0 = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(eager = true)
    val parts = Pinning.partsFor(und0.count(), und0)
    def pin(df: DataFrame, keys: String*): DataFrame =
      Pinning.pinBy(df, parts, keys: _*)
    val und = pin(und0, "src")
    Pinning.unpin(und0)
    var dist = pin(seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)), "node")
    var i = 0
    while (i < maxHops) {
      val relaxed = und
        .join(dist.withColumnRenamed("node", "src").hint("shuffle_hash"),
          "src")
        .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
        .union(dist)
        .groupBy("node").agg(min("dist").as("dist"))
      val pinned = pin(relaxed, "node")
      Pinning.unpin(dist) // superseded round — release its pinned blocks
      dist = pinned
      i += 1
    }
    Pinning.unpin(und)
    dist
  }

  /** k-core decomposition (the k-core): iteratively peel vertices with
    * degree < k until the remainder is stable — the standard dense-
    * subgraph extraction (spam rings, tightly-coupled near-dup clusters,
    * community cores). Returns the surviving vertices with their degree
    * WITHIN the core.
    *
    * Edges are symmetrized + deduped once; each peel round is one degree
    * aggregate over remaining edges plus two semi-joins to drop edges
    * incident to peeled vertices — all linear in |E|, checkpointed per
    * round. Convergence is detected by a bounded scalar (vertex count);
    * peeling a stable set removes nothing, so extra rounds are no-ops
    * (which is what lets a fixed-round oracle replay an until-stable
    * run exactly).
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 30): DataFrame = {
    require(k >= 1, s"k must be ≥ 1: $k")
    def pin(df: DataFrame): DataFrame = df.localCheckpoint(eager = true)
    var e = pin(edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct())
    var survivors = -1L
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      val keep = pin(deg.where(col("deg") >= k).select("src"))
      val n = keep.count()
      if (n == survivors) done = true
      else {
        survivors = n
        val next = pin(e
          .join(keep, Seq("src"), "left_semi")
          .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi"))
        Pinning.unpin(e) // superseded peel round — release its blocks
        e = next
      }
      Pinning.unpin(keep) // consumed by this round's (eager) peel only
      i += 1
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_degree"))
      .where(col("core_degree") >= k)
  }

  /** HITS hubs and authorities (Kleinberg 1999) over a directed edge
    * list: a node is a good AUTHORITY when good hubs point at it, a good
    * HUB when it points at good authorities — the mutual-reinforcement
    * ranking that separates link aggregators from link targets where
    * PageRank conflates them. Runs a FIXED number of synchronous rounds
    * (deterministic, oracle-replayable), each score vector L1-normalized
    * per round. Returns one row per node: (node, hub, authority).
    *
    * Same shape discipline as [[pageRank]]: edges dedupe once, each round
    * is ONE edge⋈score join + a partial-aggregable sum per endpoint (fan
    * bounded by degree), the normalizer is a one-row aggregate broadcast
    * back, and each round pins via localCheckpoint (or reliable
    * checkpoint) so plan depth stays constant. Nothing row-scale ever
    * collects; per-round shuffles carry only (id, double) rows.
    */
  def hits(edges: DataFrame, iterations: Int = 5,
           checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be ≥ 1: $iterations")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    // Aligned-pin round shape (see [[pageRank]]'s layout note): the edge
    // list pins TWICE — once per round join key (src for the authority
    // update, dst for the hub update) — so both per-round joins read
    // co-partitioned blocks with no exchange at all; storage pays 2× the
    // narrow (src, dst) frame, traded against two edge re-shuffles per
    // round. Score frames pin keyed on node; the normalizer reads the
    // aggregated frame directly (the node-spine left join only adds
    // zeros, so the sum is the same number).
    val e0 = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val eSrc =
      if (checkpointDir.isDefined) e0.checkpoint(eager = true)
      else e0.localCheckpoint(eager = true)
    val parts = Pinning.partsFor(eSrc.count(), eSrc)
    def pin(df: DataFrame, keys: String*): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else Pinning.pinBy(df, parts, keys: _*)
    val eS = pin(eSrc, "src")
    val eD = pin(eSrc, "dst")
    val nodes = pin(eS.select(col("src").as("node"))
      .union(eS.select(col("dst").as("node"))).distinct(), "node")
    Pinning.unpin(eSrc)
    def normalized(raw: DataFrame, out: String): DataFrame = {
      // Σ over the aggregated frame ≡ Σ over the node-complete frame
      // (the spine join only contributes exact 0.0 terms)
      val tot = raw.agg(sum("__s").as("__t"))
      pin(nodes.join(raw.hint("shuffle_hash"), Seq("node"), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"),
          (coalesce(col("__s"), lit(0.0)) / col("__t")).as(out)), "node")
    }
    var hub = pin(nodes.withColumn("hub", lit(1.0)), "node")
    var auth: DataFrame = null
    var i = 0
    while (i < iterations) {
      val nextAuth = normalized(
        eS.join(hub.withColumnRenamed("node", "src").hint("shuffle_hash"),
            "src")
          .groupBy(col("dst").as("node")).agg(sum("hub").as("__s")),
        "authority")
      if (auth != null) Pinning.unpin(auth)
      auth = nextAuth
      val nextHub = normalized(
        eD.join(auth.withColumnRenamed("node", "dst").hint("shuffle_hash"),
            "dst")
          .groupBy(col("src").as("node")).agg(sum("authority").as("__s")),
        "hub")
      Pinning.unpin(hub)
      hub = nextHub
      i += 1
    }
    Seq(eS, eD, nodes).foreach(Pinning.unpin) // scores are pinned; graph isn't needed
    hub.join(auth, "node")
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003): for every
    * NON-adjacent node pair sharing at least one neighbor, score
    * Σ_{w ∈ N(u)∩N(v)} 1/ln(deg(w)) — the standard "who should be
    * connected next" signal (entity-resolution candidate generation,
    * citation/co-occurrence completion). Input edges are treated as
    * undirected (normalized, deduped, self-loops dropped). Returns the
    * top-`topK` predicted pairs: (u, v, n_common, score), ordered by
    * (score desc, u, v) for a deterministic cut.
    *
    * Shape for scale: candidate pairs materialize through the COMMON
    * neighbor w (one self-join of the adjacency list keyed on w), so the
    * fan-out per broker is deg(w)² — quadratic in exactly the hubs a
    * power-law graph has. Brokers with deg(w) > `maxBrokerDegree` are
    * therefore EXCLUDED from brokering (not from being endpoints): a hub
    * contributes weight 1/ln(deg) ≈ 0 anyway, so the cap trades a
    * vanishing score term for the only super-linear step — the standard
    * production approximation. deg(w) = 1 cannot broker a pair of
    * distinct endpoints, so ln(deg) ≥ ln 2 and the weight never divides
    * by zero. Existing edges leave via one anti-join on the canonical
    * pair; the final top-K is TakeOrderedAndProject, never a full sort.
    */
  def adamicAdar(edges: DataFrame, maxBrokerDegree: Int = 1000,
                 topK: Int = 100): DataFrame = {
    require(maxBrokerDegree >= 2, s"maxBrokerDegree too small: $maxBrokerDegree")
    require(topK >= 1, s"topK must be positive: $topK")
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    // adjacency as (broker w, endpoint): both directions of every edge
    val adj = und.select(col("a").as("w"), col("b").as("e"))
      .union(und.select(col("b").as("w"), col("a").as("e")))
    val deg = adj.groupBy("w").agg(count(lit(1)).as("d"))
    val brokers = adj.join(
      deg.where(col("d").between(2, maxBrokerDegree)), "w")
    val pairs = brokers.select(col("w"), col("e").as("u"), col("d"))
      .join(brokers.select(col("w"), col("e").as("v")), "w")
      .where(col("u") < col("v"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("n_common"),
        sum(lit(1.0) / log(col("d").cast("double"))).as("score"))
    pairs
      .join(und.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"), "left_anti")
      .orderBy(col("score").desc, col("u"), col("v"))
      .limit(topK)
  }

  /** Newman modularity of a given node→community assignment — the
    * EVALUATION companion to [[labelPropagation]] (and to any external
    * clustering): Q = Σ_c [e_c/m − (d_c/2m)²], where e_c counts
    * intra-community edges, d_c sums member degrees, m is the undirected
    * edge count. Q ≈ 0 means the partition is no better than random
    * rewiring with the same degrees; community detectors optimize
    * exactly this number, so reporting it closes the loop. Edges are
    * symmetrized + self-pair-deduped (the labelPropagation convention);
    * nodes missing from `labels` form an implicit singleton each (they
    * contribute no intra-edges but their degree mass still counts). The
    * internal grouping key namespaces fallbacks ("n:" + node id) apart
    * from caller labels ("l:" + label) — labelPropagation labels ARE
    * node ids, so a raw node-id fallback could collide with a real
    * community and silently merge the unlabeled node into it. Returns
    * ONE row: (n_nodes, n_edges, n_communities, modularity).
    *
    * Two joins of the edge list against the label table (shuffles on the
    * node key) + community-sized aggregates; m and the Σ over
    * communities are the only scalars. All inputs are exact longs, so
    * every per-community term is a deterministic double.
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint() // feeds degree, intra-edge AND m computations
    val lbl = labels.select(col(labels.columns.head).as("node"),
      col(labels.columns(1)).as("__lbl"))
    val deg = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("__d"))
    // namespaced grouping key: caller labels and node-id fallbacks live
    // in disjoint prefixes, so an unlabeled node can never be absorbed
    // into a community whose label happens to equal its id
    val withL = deg.join(lbl, Seq("node"), "left")
      .withColumn("__lbl",
        when(col("__lbl").isNotNull,
          concat(lit("l:"), col("__lbl").cast("string")))
          .otherwise(concat(lit("n:"), col("node").cast("string"))))
    val dc = withL.groupBy("__lbl").agg(sum("__d").as("__dc"))
    // intra-community directed pair count = 2·e_c (both orientations
    // are in `und`), so e_c/m = __intra/(2m) with 2m = |und|
    val intra = und
      .join(withL.select(col("node").as("src"), col("__lbl")), "src")
      .join(withL.select(col("node").as("dst"),
        col("__lbl").as("__lbl2")), "dst")
      .where(col("__lbl") === col("__lbl2"))
      .groupBy("__lbl").agg(count(lit(1)).as("__intra"))
    val m2 = und.count().toDouble // = 2m, a bounded driver scalar
    val nNodes = withL.count()
    dc.join(intra, Seq("__lbl"), "left")
      .select(col("__lbl"),
        (coalesce(col("__intra"), lit(0L)) / m2 -
          (col("__dc") / m2) * (col("__dc") / m2)).as("__q"))
      .agg(count(lit(1)).as("n_communities"), sum("__q").as("modularity"))
      .select(lit(nNodes).as("n_nodes"),
        lit((m2 / 2).toLong).as("n_edges"),
        col("n_communities"), col("modularity"))
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of
    * endpoint degrees over every edge-end pair — positive when hubs link
    * to hubs (social graphs), negative when hubs link to leaves
    * (web/biology/star topologies). Computed over BOTH orientations of
    * every undirected edge (the standard symmetric estimator). Returns
    * ONE row: (n_nodes, n_edges, assortativity); a degree-regular graph
    * (zero variance) reports null.
    *
    * One degree aggregate + two joins of the symmetrized edge list +
    * one moment scan — integer moments below 2⁵³, so the coefficient is
    * a deterministic double in any engine.
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint() // feeds the degree table and the pair scan
    val deg = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("__d"))
    val nNodes = deg.count()
    val pairs = und
      .join(deg.select(col("node").as("src"), col("__d").as("__dx")),
        "src")
      .join(deg.select(col("node").as("dst"), col("__d").as("__dy")),
        "dst")
    val x = col("__dx").cast("double")
    val y = col("__dy").cast("double")
    pairs.agg(count(lit(1)).as("__n"),
        sum(x).as("__sx"), sum(y).as("__sy"), sum(x * y).as("__sxy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"))
      .withColumn("__vx",
        col("__sxx") / col("__n") -
          (col("__sx") / col("__n")) * (col("__sx") / col("__n")))
      .withColumn("__vy",
        col("__syy") / col("__n") -
          (col("__sy") / col("__n")) * (col("__sy") / col("__n")))
      .withColumn("__cov",
        col("__sxy") / col("__n") -
          (col("__sx") / col("__n")) * (col("__sy") / col("__n")))
      .select(lit(nNodes).as("n_nodes"),
        (col("__n") / 2).cast("long").as("n_edges"),
        when(col("__vx") > 0.0 && col("__vy") > 0.0,
          col("__cov") / sqrt(col("__vx") * col("__vy")))
          .as("assortativity"))
  }

  /** Directed reciprocity: the fraction of (deduped, non-self) directed
    * edges whose reverse edge also exists — near 1 on mutual-follow
    * social graphs, near 0 on citation/hyperlink graphs; the one-number
    * direction-structure diagnostic. Returns ONE row:
    * (n_edges, n_reciprocal, reciprocity).
    *
    * One dedup + one self-join on the flipped key (left-semi, so the
    * probe side never widens) + one count — exact longs throughout.
    */
  def reciprocity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint() // probe AND build side of the flip join
    val n = e.count()
    val rec = e.join(
        e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      .count()
    val one = e.sparkSession.range(1)
    one.select(lit(n).as("n_edges"), lit(rec).as("n_reciprocal"),
      (lit(rec) / lit(n).cast("double")).as("reciprocity"))
  }
}

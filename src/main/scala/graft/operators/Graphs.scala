package graft.operators

import org.apache.spark.sql.DataFrame
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
  def pageRank(edges: DataFrame, iterations: Int = 10, damping: Double = 0.85,
               checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 0, s"iterations must be ≥ 0: $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    val e = edges.select(col("src"), col("dst"))
    val nodes = pin(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__outdeg"))
    // edge weight 1/outdeg precomputed — the per-round join then carries
    // only (src, dst, w) against (node, pr)
    val ew = pin(e.join(outdeg, "src")
      .select(col("src"), col("dst"),
        (lit(1.0) / col("__outdeg")).as("__w")))
    // N is a bounded driver scalar (one long), like the CC convergence probe
    val n = nodes.count().toDouble
    val teleport = (1.0 - damping) / n
    var ranks = pin(nodes.withColumn("pr", lit(1.0 / n)))
    val dangling = pin(nodes.join(outdeg,
      col("node") === col("src"), "left_anti").select("node"))
    var i = 0
    while (i < iterations) {
      val contribs = ew
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst")).agg(sum(col("pr") * col("__w")).as("__m"))
      val dMass = dangling.join(ranks, "node")
        .agg(coalesce(sum("pr"), lit(0.0)).as("__dm"))
      ranks = pin(nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(dMass))
        .select(col("node"),
          (lit(teleport) + lit(damping) *
            (coalesce(col("__m"), lit(0.0)) + col("__dm") / n)).as("pr")))
      i += 1
    }
    ranks
  }
}

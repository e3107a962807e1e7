package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches over token streams.
  *
  * The exact heavy-hitter query (group-by token, top-N) is the oracle
  * anchor; the count–min sketch is the 100 TB path for interactive probes:
  * ONE aggregate pass builds a constant-size, mergeable summary (so it
  * parallelizes as a partial-agg like any sum), after which any number of
  * point-frequency probes cost zero cluster work.
  */
object Sketches {

  /** Count–min-sketch point-frequency estimates for a bounded probe set.
    *
    * One aggregate over `tokens` builds the sketch — `ceil(2/eps)` counters
    * × `ceil(ln(1/(1-confidence)))` hash rows, independent of both corpus
    * and vocabulary size — and the probe tokens are estimated driver-side
    * from the collected (constant-size) sketch bytes. The CM guarantee:
    * true ≤ estimate ≤ true + eps·N with probability ≥ confidence, N the
    * total token count; SketchSpec asserts both ends.
    */
  def cmsTokenCounts(tokens: DataFrame, tokenCol: String,
                     probes: Seq[String], eps: Double = 0.001,
                     confidence: Double = 0.99,
                     seed: Int = 42): Seq[(String, Long)] = {
    val bytes = tokens
      .agg(count_min_sketch(col(tokenCol), lit(eps), lit(confidence),
        lit(seed)).as("sk"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    probes.map(t => t -> cms.estimateCount(t))
  }

  /** Per-group HLL distinct-count SKETCHES (Apache DataSketches via
    * Spark's `hll_sketch_agg`) — not just estimates: the returned `sketch`
    * column is a mergeable binary summary. That mergeability is the
    * 100 TB pattern: sketch each partition/day/source ONCE at ingest,
    * persist the bytes (KBs per group at `lgK`=12, ~2.5% rel. error), and
    * answer any later union — all-time distincts, rollups across sources,
    * cross-vintage overlap-free counts — by merging sketches with
    * [[unionSketches]], never rescanning the corpus.
    */
  def distinctSketches(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"lgK out of datasketches range: $lgK")
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sketch"))
  }

  /** Merge sketch rows down to `groupCols` (empty = one global row) and
    * estimate — the no-rescan rollup over [[distinctSketches]] output.
    */
  def unionSketches(sketches: DataFrame, groupCols: Seq[String] = Nil,
                    allowDifferentLgK: Boolean = false): DataFrame = {
    val u = s"hll_union_agg(sketch, $allowDifferentLgK)"
    val merged =
      if (groupCols.isEmpty) sketches.agg(expr(u).as("sketch"))
      else sketches.groupBy(groupCols.map(col): _*).agg(expr(u).as("sketch"))
    merged.withColumn("distinct_est",
      expr("hll_sketch_estimate(sketch)"))
  }

  /** Estimates for sketch rows (adds `distinct_est`). */
  def estimate(sketches: DataFrame): DataFrame =
    sketches.withColumn("distinct_est", expr("hll_sketch_estimate(sketch)"))

  /** Per-group GK quantile SKETCHES ([[graft.functions.expressions.
    * QuantileSketchAgg]]) — the quantile member of the mergeable-summary
    * family. One aggregate pass emits a few-KB binary `qsketch` per group
    * whose estimates carry the Greenwald–Khanna guarantee (rank within
    * ±relativeError·n); persist them and later quantile questions —
    * per-source, rolled up, cross-vintage — merge sketches instead of
    * rescanning the corpus.
    */
  def quantileSketches(df: DataFrame, groupCols: Seq[String],
                       valueCol: String,
                       relativeError: Double = 0.01): DataFrame = {
    require(relativeError > 0 && relativeError < 1,
      s"relativeError must be in (0, 1): $relativeError")
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.expressions.QuantileSketchAgg
        .quantileSketch(col(valueCol).cast("double"), relativeError)
        .as("qsketch"))
  }

  /** Merge quantile-sketch rows down to `groupCols` (empty = one global
    * row) — the no-rescan rollup over [[quantileSketches]] output.
    */
  def mergeQuantileSketches(sketches: DataFrame,
                            groupCols: Seq[String] = Nil): DataFrame = {
    val m = graft.functions.expressions.QuantileSketchAgg
      .quantileSketchMerge(col("qsketch")).as("qsketch")
    if (groupCols.isEmpty) sketches.agg(m)
    else sketches.groupBy(groupCols.map(col): _*).agg(m)
  }

  /** Probe sketch rows at `probs`, adding one `q_<pct>` double column per
    * probability — executor-side, no driver round trip.
    */
  def quantileEstimates(sketches: DataFrame, probs: Seq[Double]): DataFrame = {
    val qs = sketches.withColumn("__qs",
      graft.functions.expressions.QuantileSketchAgg
        .quantileSketchQuery(col("qsketch"), probs))
    probs.zipWithIndex.foldLeft(qs) { case (df, (p, i)) =>
      df.withColumn(s"q_${(p * 100).round}", col("__qs").getItem(i))
    }.drop("__qs")
  }
}

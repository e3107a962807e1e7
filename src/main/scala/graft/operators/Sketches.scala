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

  /** Equi-join cardinality estimate from two count–min sketches — the
    * classic AMS/CM inner-product estimator: |A ⋈ B| = Σ_k cA(k)·cB(k),
    * approximated by min over hash rows of the counter-row dot product.
    * The planner-side question ("how big would this join be?") answered
    * from two constant-size summaries with ZERO join work — and since
    * sketches persist and merge, per-partition sketches answer it per
    * partition/vintage without rescanning either table.
    *
    * Guarantee (one-sided, like the point estimate): true ≤ estimate ≤
    * true + eps·|A|·|B| with probability ≥ confidence. Both sketches
    * MUST share (eps, confidence, seed) — enforced here by building both
    * with the same parameters. Returns (estimate, trueAUpper = |A|,
    * |B|) driver-side; the two builds are independent single aggregates.
    */
  def cmsJoinSizeEstimate(a: DataFrame, keyA: String,
                          b: DataFrame, keyB: String,
                          eps: Double = 0.0005, confidence: Double = 0.99,
                          seed: Int = 42): (Long, Long, Long) = {
    def sketchBytes(df: DataFrame, k: String): Array[Byte] = df
      .agg(count_min_sketch(col(k).cast("string"), lit(eps),
        lit(confidence), lit(seed)).as("sk"))
      .head().getAs[Array[Byte]](0)
    val (ta, tb) = (parseCms(sketchBytes(a, keyA)),
      parseCms(sketchBytes(b, keyB)))
    require(ta._3.length == tb._3.length &&
      ta._3.head.length == tb._3.head.length,
      "sketch geometries diverged despite shared parameters")
    val est = ta._3.zip(tb._3).map { case (ra, rb) =>
      ra.zip(rb).map { case (x, y) => x * y }.sum
    }.min
    (est, ta._1, tb._1)
  }

  /** Parse Spark's serialized CountMinSketch (public stable format,
    * `CountMinSketchImpl.writeTo`: version, totalCount, depth, width,
    * hashA[depth] longs, then table longs row-major) → (totalCount,
    * width, table[depth][width]). The class exposes no table accessor,
    * so the inner product reads the serialized form instead.
    */
  private def parseCms(bytes: Array[Byte]): (Long, Int, Array[Array[Long]]) = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val version = in.readInt()
    require(version == 1, s"unknown CountMinSketch version $version")
    val total = in.readLong()
    val depth = in.readInt()
    val width = in.readInt()
    (0 until depth).foreach(_ => in.readLong()) // hashA seeds
    val table = Array.fill(depth)(Array.fill(width)(in.readLong()))
    (total, width, table)
  }
}

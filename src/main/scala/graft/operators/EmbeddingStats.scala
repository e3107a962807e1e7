package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-level embedding statistics — the mean/covariance pass behind PCA,
  * whitening and anisotropy diagnostics on an embedding column. The
  * distributed part is ONE accumulation pass (per-partition outer-product
  * sums, d + d² doubles per partition); eigen-extraction happens on the
  * driver over the d×d matrix — the Lloyd-centroid budget, not a data
  * collect.
  */
object EmbeddingStats {

  /** One pass over the corpus → (n, mean[d], covariance[d][d]) (population
    * covariance). Per-partition accumulators are merged in partition order
    * (deterministic), so results are reproducible run-to-run on the same
    * partitioning; the gate rounds away sub-1e-8 layout noise.
    *
    * Shape for scale: `mapPartitions` holds ONE (d + d²)-double
    * accumulator per partition (the imperative-accumulator case the
    * engine reserves mapPartitions for — a posexplode self-join would
    * shuffle d²·N rows); the driver merges #partitions rows of d²+d+1
    * doubles. d is validated uniform.
    */
  def moments(df: DataFrame, vecCol: String): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(col(vecCol).cast("array<double>")).as[Seq[Double]]
    val partials = vecs.mapPartitions { it =>
      var n = 0L
      var sums: Array[Double] = null
      var outer: Array[Double] = null
      it.foreach { v =>
        val x = v.toArray
        if (sums == null) {
          sums = new Array[Double](x.length)
          outer = new Array[Double](x.length * x.length)
        }
        require(x.length == sums.length,
          s"ragged embeddings: ${x.length} vs ${sums.length}")
        n += 1
        var i = 0
        while (i < x.length) {
          sums(i) += x(i)
          var j = 0
          while (j < x.length) { outer(i * x.length + j) += x(i) * x(j); j += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else Iterator.single((n, sums.toSeq, outer.toSeq))
    }.collect()
    require(partials.nonEmpty, "moments of an empty corpus")
    val d = partials.head._2.size
    require(partials.forall(_._2.size == d), s"ragged embeddings across partitions")
    val n = partials.map(_._1).sum
    val sums = new Array[Double](d)
    val outer = new Array[Double](d * d)
    partials.foreach { case (_, s, o) =>
      var i = 0
      while (i < d) { sums(i) += s(i); i += 1 }
      var k = 0
      while (k < d * d) { outer(k) += o(k); k += 1 }
    }
    val mean = sums.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      outer(i * d + j) / n - mean(i) * mean(j))
    (n, mean, cov)
  }

  /** The covariance matrix as a (i, j, cov) DataFrame — 0-based indices,
    * d² rows (a local relation; broadcast-sized for any sane d).
    */
  def covarianceDF(spark: SparkSession, cov: Array[Array[Double]]): DataFrame = {
    val rows = for (i <- cov.indices; j <- cov.indices)
      yield Row(i, j, cov(i)(j))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(StructField("i", IntegerType, nullable = false),
        StructField("j", IntegerType, nullable = false),
        StructField("cov", DoubleType, nullable = false))))
  }

  /** Top-k principal directions by power iteration with deflation —
    * driver-side over the d×d covariance (deterministic: fixed start
    * 1/√d, fixed iteration count, sign fixed so the largest-|component|
    * entry is positive, lowest index on ties). Returns unit vectors.
    */
  def pcaTopDirections(cov: Array[Array[Double]], k: Int,
                       iterations: Int = 50): Seq[Array[Double]] = {
    val d = cov.length
    require(k >= 1 && k <= d, s"k must be in [1, $d]: $k")
    val a = cov.map(_.clone())
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += a(i)(j) * v(j); j += 1 }
        s
      }
    def normalize(v: Array[Double]): Array[Double] = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      if (nrm == 0.0) v else v.map(_ / nrm)
    }
    def signFix(v: Array[Double]): Array[Double] = {
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(-_) else v
    }
    (0 until k).map { _ =>
      var v = normalize(Array.fill(d)(1.0))
      var t = 0
      while (t < iterations) { v = normalize(matVec(v)); t += 1 }
      v = signFix(v)
      // deflate: A ← A − λ v vᵀ so the next round finds the next direction
      val av = matVec(v)
      val lambda = v.zip(av).map { case (x, y) => x * y }.sum
      for (i <- 0 until d; j <- 0 until d) a(i)(j) -= lambda * v(i) * v(j)
      v
    }
  }

  /** Project the embedding column onto fixed directions: adds `pc0..pcK`,
    * each a scan-side dot product against a literal vector (no shuffle,
    * no join). The vector binds to a projected column first (HOF rule).
    */
  def project(df: DataFrame, vecCol: String,
              directions: Seq[Array[Double]]): DataFrame = {
    val bound = df.withColumn("__v", col(vecCol).cast("array<double>"))
    directions.zipWithIndex.foldLeft(bound) { case (d0, (dir, k)) =>
      d0.withColumn(s"pc$k",
        aggregate(zip_with(col("__v"), lit(dir), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x))
    }.drop("__v")
  }

  /** Blocked linear-time MMD² drift between two embedding samples — did
    * the embedding DISTRIBUTION move between vintages, beyond what the
    * per-dimension moments (PSI etc.) can see. Kernel two-sample statistic
    * with the RBF kernel `k(a,b) = exp(−γ‖a−b‖²)`; near 0 = same
    * distribution, positive = drift.
    *
    * The estimator is the linear-time MMD (Gretton et al., JMLR 2012)
    * computed over id-blocked quadruples instead of a global ranking:
    * rows land in block `id div blockWidth`, each block contributes
    * `h = k(x₁,x₂) + k(y₁,y₂) − k(x₁,y₂) − k(x₂,y₁)` from its two
    * smallest-id members per side (blocks lacking 2+2 members skip).
    * Blocking keeps the pairing DETERMINISTIC and replayable without any
    * global sort — the only windows are partitioned by block, and the
    * final mean is a scalar aggregate. Returns ONE row:
    * (n_blocks, mmd2).
    */
  def mmdLinear(ref: DataFrame, cur: DataFrame, idCol: String,
                vecCol: String, gamma: Double,
                blockWidth: Long = 8): DataFrame = {
    require(gamma > 0 && blockWidth >= 2)
    import org.apache.spark.sql.expressions.Window
    def sides(df: DataFrame, tag: String): DataFrame = {
      val w = Window.partitionBy("__blk").orderBy(col(idCol))
      df.select(col(idCol),
          (col(idCol).cast("long") / blockWidth).cast("long").as("__blk"),
          col(vecCol).cast("array<double>").as("__v"))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= 2)
        .groupBy("__blk")
        // exactly one row carries each __rn, so first(ignoreNulls) is
        // deterministic — no array-ordering comparison needed
        .agg(first(when(col("__rn") === 1, col("__v")), ignoreNulls = true)
            .as(s"${tag}1"),
          first(when(col("__rn") === 2, col("__v")), ignoreNulls = true)
            .as(s"${tag}2"))
        .where(col(s"${tag}2").isNotNull)
    }
    def k(a: String, b: String): Column =
      exp(lit(-gamma) * aggregate(
        zip_with(col(a), col(b), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, t) => acc + t))
    sides(ref, "x").join(sides(cur, "y"), "__blk")
      .select((k("x1", "x2") + k("y1", "y2") -
        k("x1", "y2") - k("x2", "y1")).as("__h"))
      .agg(count(lit(1)).as("n_blocks"), avg("__h").as("mmd2"))
  }

  /** Per-dimension int8 (0..255) min-max quantization — 4× embedding
    * compression for ANN candidate stores. Codes are
    * `floor((x − mn_d)·255/(mx_d − mn_d) + ½)` with degenerate (constant)
    * dimensions coding 0; dequantization is the affine inverse, so the
    * worst-case reconstruction error per dimension is span/510.
    *
    * Per-dim extents come from ONE posexplode + d-group aggregate
    * (map-side partials, never a self-join) and bake into the scan-side
    * transform as two literal arrays — d·16 bytes of driver state, the
    * bounded-scalar budget. Returns (quantized rows `(idCol, codes)`,
    * the (dim, mn, mx) params table for dequantization).
    */
  def quantizeInt8(df: DataFrame, idCol: String,
                   vecCol: String): (DataFrame, DataFrame) = {
    val stats = df
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("dim", "x")))
      .groupBy("dim").agg(min("x").as("mn"), max("x").as("mx"))
    val params = stats.orderBy("dim").collect()
    require(params.nonEmpty, "quantizing an empty corpus")
    val mins = params.map(_.getDouble(1))
    val maxs = params.map(_.getDouble(2))
    val codes = transform(col(vecCol).cast("array<double>"), (x, i) => {
      val mn = element_at(lit(mins), i + 1)
      val span = element_at(lit(maxs), i + 1) - mn
      when(span > 0,
        floor((x - mn) * lit(255.0) / span + 0.5).cast("int"))
        .otherwise(lit(0))
    })
    (df.select(col(idCol), codes.as("codes")), stats)
  }

  /** Signed (±1) random projection — the Johnson–Lindenstrauss dimension
    * reducer in Achlioptas's database-friendly form (Achlioptas 2003:
    * ±1 entries preserve pairwise distances as well as Gaussians):
    * `rp[j] = Σᵢ s(i,j)·v[i]`, shrinking `inDim`-d embeddings to
    * `outDim`-d at scan speed. The cheap prefilter in front of exact
    * cosine: at 100 TB, fetching 64→16 dims per candidate quarters the
    * shuffle and cache volume of every downstream ANN/dedup pass, and
    * cosine is scale-invariant so the projection needs no 1/√outDim
    * rescale for ranking use.
    *
    * The sign matrix is DETERMINISTIC from a quadratic congruential mix
    * of (i, j, seed) — chosen over xxhash64 deliberately: a plain-SQL
    * oracle can replay integer multiply/mod exactly, making the whole
    * projection hash-checkable (production callers can swap any hash; the
    * JL bound only needs near-independent signs). All work is scan-side
    * HOFs over a literal matrix: no shuffle, no join, no UDF.
    */
  def signedRandomProjection(df: DataFrame, vecCol: String, inDim: Int,
                             outDim: Int, seed: Long = 42L,
                             outCol: String = "rp"): DataFrame = {
    require(inDim > 0 && outDim > 0 && outDim <= inDim,
      s"need 0 < outDim ≤ inDim: $outDim/$inDim")
    def sign(i: Int, j: Int): Double = {
      // floorMod, not %: the mix can overflow Long for large |seed| and
      // Scala % keeps the dividend's sign — a negative h would make
      // `h < 5004` always true and bias signs ~75/25 toward +1,
      // degrading the JL distance preservation for non-default seeds.
      val h = Math.floorMod(i.toLong * i * 7919 +
        (i + seed) * (j + 13) * 104729 + j.toLong * j * 131, 10007L)
      if (h < 5004) 1.0 else -1.0
    }
    val dirs = (0 until outDim).map(j => Array.tabulate(inDim)(sign(_, j)))
    // bind the cast ONCE as a projected column before the HOF lambdas
    // (interpreted lambdas re-evaluate captured expressions per element)
    val bound = df.withColumn("__v", col(vecCol).cast("array<double>"))
    bound.withColumn(outCol, array(dirs.map { dir =>
      aggregate(zip_with(col("__v"), lit(dir), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
    }: _*)).drop("__v")
  }

  /** Pairwise cosine similarity between GROUP CENTROIDS in embedding
    * space — the source-affinity matrix ("which crawls cover the same
    * semantic territory") that drives mixture design: near-1 pairs are
    * redundant sources a token budget shouldn't double-pay for, low pairs
    * are complementary coverage. The token-level sibling is
    * [[Dedup.groupJaccardExact]]; this sees PARAPHRASE-level overlap that
    * token sets miss. Returns one row per unordered pair (a < b):
    * (group_a, group_b, cosine); zero-norm centroids yield null.
    *
    * Shape for scale: the corpus collapses to (group, dim, mean) in one
    * explode + aggregate — groups×dims rows; the pair join runs entirely
    * on that bounded centroid table (dim-keyed partial dot products, the
    * q143 budget), never on vectors.
    */
  def groupCentroidSimilarity(df: DataFrame, groupCol: String,
                              vecCol: String): DataFrame = {
    val cent = df
      .select(col(groupCol).as("__g"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("__d", "__x")))
      .groupBy("__g", "__d").agg(avg("__x").as("__m"))
      .localCheckpoint() // both join sides + norms read it
    val norms = cent.groupBy("__g")
      .agg(sqrt(sum(col("__m") * col("__m"))).as("__n"))
    val dots = cent.select(col("__g").as("group_a"), col("__d"),
        col("__m").as("__ma"))
      .join(cent.select(col("__g").as("group_b"), col("__d"),
        col("__m").as("__mb")), Seq("__d"))
      .where(col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b")
      .agg(sum(col("__ma") * col("__mb")).as("__dot"))
    dots
      // norms is one row per group with no cardinality guard — no hint;
      // AQE broadcasts it when the group count is actually small
      .join(norms.select(col("__g").as("group_a"),
        col("__n").as("__na")), Seq("group_a"))
      .join(norms.select(col("__g").as("group_b"),
        col("__n").as("__nb")), Seq("group_b"))
      .withColumn("cosine", when(col("__na") > 0 && col("__nb") > 0,
        col("__dot") / (col("__na") * col("__nb"))))
      .select("group_a", "group_b", "cosine")
  }
}

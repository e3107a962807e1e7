package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

import scala.util.Random

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (queries × corpus cross join — correct
  * at any scale when the query set is small enough to broadcast). Scale
  * path: IVF (k-means-lite coarse quantizer, probe nearest cells) and
  * cosine-LSH bucketing, which bound the candidate set per query so the
  * cross product never materializes.
  */
object Similarity {

  /** Deterministic random hyperplanes for cosine LSH (driver-side literals,
    * broadcast into the plan as constants).
    */
  def randomPlanes(numPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Brute-force cosine top-k: every query against every corpus vector.
    * The query side should be the small one — it is broadcast, so the
    * corpus is scanned exactly once with no shuffle; per-query ranking is a
    * window top-k (partial top-k per partition under AQE).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", Vectors.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }

  /** Cosine-LSH top-k: only corpus vectors in the query's hyperplane bucket
    * are scored. Recall is approximate (bucket may miss true neighbors);
    * multi-probe = rerun with different seeds and union. Shuffle key is the
    * compact signature string.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int,
              numPlanes: Int = 6, seed: Long = 42L): DataFrame = {
    val planes = randomPlanes(numPlanes, dim, seed)
    val sig = (v: Column) => Vectors.lshSignature(v, planes)
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("cv"),
      sig(col(vecCol)).as("sig"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      sig(col(vecCol)).as("sig"))
    val scored = c.join(broadcast(q), Seq("sig"))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", Vectors.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }

  /** IVF coarse-quantizer centroids via Lloyd's algorithm, all-DataFrame:
    * deterministic hash-seeded initial cells (position-wise mean per
    * cell), then `iters` Lloyd rounds — assign every vector to its nearest
    * centroid (broadcast join, corpus scanned once per round), recompute
    * position-wise means. Each round's centroid table is numCells rows →
    * `localCheckpoint` pins it so plans stay flat and the broadcast input
    * is materialized, never a re-derivation. Returns (cell0, centroid
    * array<double>); always numCells-sized → broadcastable at any corpus
    * scale. A cell that loses every member simply drops out (k shrinks),
    * which only merges probe sets — never loses candidates.
    */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   numCells: Int, seed: Long = 42L, iters: Int = 4): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val vecsOnly = corpus.select(col(idCol), col(vecCol))
    def meansOf(assigned: DataFrame): DataFrame = assigned
      .select(col("cell0"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cell0", "pos").agg(avg("x").as("cx"))
      .groupBy("cell0").agg(
        transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          s => s.getField("cx")).as("centroid"))
    var centroids = meansOf(corpus.select(
        pmod(xxhash64(col(idCol), lit(seed)), lit(numCells)).as("cell0"),
        col(vecCol)))
      .localCheckpoint(eager = true)
    var i = 1
    while (i < iters) {
      val assigned = nearestCells(vecsOnly, idCol, vecCol, centroids, 1)
        .select(col("cell").as("cell0"), col(vecCol))
      centroids = meansOf(assigned).localCheckpoint(eager = true)
      i += 1
    }
    centroids
  }

  /** Assign every vector to its nearest centroid (one broadcast of the
    * centroid table, one scan of the corpus).
    */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
                numCells: Int, seed: Long = 42L, iters: Int = 4): DataFrame = {
    val centroids = ivfCentroids(corpus, idCol, vecCol, numCells, seed, iters)
    nearestCells(corpus.select(col(idCol), col(vecCol)), idCol, vecCol,
        centroids, 1)
      .select(col(idCol), col("cell"), col("dist"))
  }

  /** Per-row nearest `n` centroid cells by L2 distance. */
  private def nearestCells(df: DataFrame, idCol: String, vecCol: String,
                           centroids: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("dist"), col("cell0"))
    df.join(broadcast(centroids), lit(true))
      .withColumn("dist", Vectors.l2Distance(col(vecCol), col("centroid")))
      .withColumn("cell_rank", row_number().over(w))
      .where(col("cell_rank") <= n)
      .withColumnRenamed("cell0", "cell")
      .drop("centroid", "cell_rank")
  }

  /** IVF top-k: score only corpus vectors in the query's nearest `nprobe`
    * cells — the scan per query shrinks by ~numCells/nprobe while recall
    * stays high for clustered corpora. With `nprobe = numCells` every cell
    * is probed and the result is EXACTLY brute force (each corpus vector
    * lives in one cell, so each (query, corpus) pair scores once) — the
    * oracle-checked configuration; production sets nprobe ≪ numCells.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numCells: Int = 16,
              nprobe: Int = 4, seed: Long = 42L, iters: Int = 4): DataFrame = {
    val centroids = ivfCentroids(corpus, idCol, vecCol, numCells, seed, iters)
    val corpusCells = nearestCells(corpus.select(col(idCol), col(vecCol)),
        idCol, vecCol, centroids, 1)
      .select(col(idCol).as("nbr_id"), col(vecCol).as("cv"), col("cell"))
    val queryCells = nearestCells(queries.select(col(idCol), col(vecCol)),
        idCol, vecCol, centroids, nprobe)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("cell"))
    val probed = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", Vectors.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("nbr_id"))
    probed.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }
}

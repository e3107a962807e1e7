package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed classifier training for corpus curation — the fastText-style
  * quality/language filter stage of a training-data pipeline, built as pure
  * aggregate passes: the model (a handful of doubles) lives on the driver,
  * each gradient-descent step is ONE partial-aggregable aggregate over the
  * corpus. No MLlib, no collect of data rows.
  */
object Classify {

  /** Scan-side shallow text features (the fastText-ish signal set): bias,
    * token count / 100, chars-per-token / 10, unique-token ratio. All
    * integer-derived (counts and lengths) then divided — bit-identical
    * across engines, so trained models are cross-checkable. The token
    * split binds to a projected column before the HOF filter (no
    * per-element re-split), and `ntok` is floored at 1 so empty documents
    * yield finite features instead of NaN.
    */
  def textFeatures(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame =
    docs
      .withColumn("__toks",
        filter(split(col(textCol), " "), t => length(t) > 0))
      .withColumn("__ntok",
        greatest(size(col("__toks")), lit(1)).cast("double"))
      .withColumn("f0", lit(1.0))
      .withColumn("f1", col("__ntok") / 100.0)
      .withColumn("f2",
        length(col(textCol)).cast("double") / (col("__ntok") * 10.0))
      .withColumn("f3",
        size(array_distinct(col("__toks"))).cast("double") / col("__ntok"))
      .drop("__toks", "__ntok")

  private def margin(featureCols: Seq[String], w: Array[Double]): Column =
    featureCols.zip(w).map { case (c, wi) => col(c) * lit(wi) }
      .reduce(_ + _)

  private def sigmoid(m: Column): Column = lit(1.0) / (lit(1.0) + exp(-m))

  /** Batch gradient descent for logistic regression: `iterations` full
    * passes, each ONE aggregate producing the |features|-dimensional
    * gradient `avg((σ(w·x) − y)·x_j)`; weights update on the driver
    * (bounded: one double per feature per round — the same driver-scalar
    * budget as the CC convergence probe). `labelCol` must be 0.0/1.0.
    *
    * The feature projection is pinned once (`localCheckpoint`) so each
    * round re-reads compact feature rows, not the upstream text pipeline.
    * Deterministic: fixed iteration count, zero init (σ(0) = ½ exactly),
    * no sampling — the same recipe replays in SQL (gate q142).
    */
  def trainLogistic(data: DataFrame, featureCols: Seq[String],
                    labelCol: String, iterations: Int = 5,
                    lr: Double = 1.0): Array[Double] = {
    require(featureCols.nonEmpty && iterations >= 0)
    val d = data
      .select((featureCols.map(col) :+ col(labelCol).cast("double")): _*)
      .localCheckpoint()
    var w = Array.fill(featureCols.size)(0.0)
    var i = 0
    while (i < iterations) {
      val err = sigmoid(margin(featureCols, w)) - col(labelCol)
      val grad: Row = d.agg(
        avg(err * col(featureCols.head)).as("g0"),
        featureCols.tail.zipWithIndex.map { case (c, j) =>
          avg(err * col(c)).as(s"g${j + 1}") }: _*).head()
      w = w.indices.map(j => w(j) - lr * grad.getDouble(j)).toArray
      i += 1
    }
    w
  }

  /** Score rows with a trained model: adds `p = σ(w·x)` — a pure
    * projection (weights are literals), scan-side at any scale.
    */
  def scoreLogistic(data: DataFrame, featureCols: Seq[String],
                    weights: Array[Double]): DataFrame = {
    require(weights.length == featureCols.size)
    data.withColumn("p", sigmoid(margin(featureCols, weights)))
  }
}

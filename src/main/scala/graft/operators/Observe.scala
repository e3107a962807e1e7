package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Zero-extra-pass pipeline observability via Spark's `CollectMetrics`
  * (`Dataset.observe`): named aggregate metrics that ride the SAME job as
  * the main action — no second scan, no separate audit query. The 100 TB
  * discipline this enables: every production write carries its row count,
  * null rates and value totals as a side channel, and a reconciliation
  * check between pipeline stages costs nothing.
  *
  * Differs from [[Quality.audit]] (a standalone one-pass audit query):
  * `instrument` attaches to a frame the caller is ALREADY materializing.
  */
object Observe {

  /** Attach named metrics to the frame. Metric expressions must be
    * aggregates (the `observe` contract). Read them back after an action
    * with [[metricsOf]].
    */
  def instrument(df: DataFrame, name: String,
                 metrics: (String, Column)*): DataFrame = {
    require(metrics.nonEmpty, "need at least one metric")
    val cols = metrics.map { case (n, c) => c.as(n) }
    df.observe(name, cols.head, cols.tail: _*)
  }

  /** The standard write-side telemetry bundle: row count, per-column null
    * counts, and a measure total — the numbers a downstream consumer
    * reconciles against.
    */
  def instrumentStandard(df: DataFrame, name: String, nullCols: Seq[String],
                         measureCol: Option[String] = None): DataFrame = {
    val base: Seq[(String, Column)] =
      Seq("n_rows" -> count(lit(1))) ++
        nullCols.map(c =>
          s"n_null_$c" -> sum(when(col(c).isNull, 1L).otherwise(0L))) ++
        measureCol.map(m => s"sum_$m" -> sum(col(m).cast("double"))).toSeq
    instrument(df, name, base: _*)
  }

  /** Observed metrics of `df`'s OWN QueryExecution, keyed by observation
    * name. Valid after an action that ran THIS frame's plan — `collect`
    * and friends — NOT `count()`/`agg` (they build a derived plan) and
    * NOT `foreach`/`foreachPartition` (they run the separate RDD
    * execution); for write-path jobs register a QueryExecutionListener
    * and read the metrics off the write's execution. Reading from the
    * frame's QueryExecution avoids the listener's async race in the
    * interactive case. Before any action the accumulators hold defaults.
    */
  def metricsOf(df: DataFrame): Map[String, Row] =
    df.queryExecution.observedMetrics

  /** Reconcile two stages' observed metrics: every metric name present in
    * both must match exactly (the "rows in == rows out + rows filtered"
    * style of invariant is the caller's algebra; this checks the shared
    * names). Returns the mismatched names.
    */
  def reconcile(a: Row, b: Row): Seq[String] = {
    val shared = a.schema.fieldNames.toSet
      .intersect(b.schema.fieldNames.toSet)
    shared.toSeq.sorted.filter { f =>
      a.getAs[Any](f) != b.getAs[Any](f)
    }
  }
}

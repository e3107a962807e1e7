package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension builders — the lake-warehouse operator the
  * reference's star schema stops short of (its rider/station dims are
  * type-1 overwrites; SURVEY.md §2.11). Type 2 keeps history: one row per
  * (key, attribute-run) with a `[valid_from, valid_to)` interval and an
  * `is_current` flag, built from an append-only change log.
  */
object Scd {

  /** Build a type-2 dimension from a change log.
    *
    * Two windowed passes over a single shuffle on `key`:
    *  1. collapse consecutive rows whose `attrs` tuple is unchanged
    *     (`lag` compare — only genuine transitions survive);
    *  2. `lead(ts)` over the survivors closes each interval; the open run
    *     gets `valid_to = NULL` and `is_current = true`.
    *
    * Attributes compare as ONE struct so a multi-attribute dim transitions
    * when any field changes. `tiebreaker` (e.g. a change-log sequence id)
    * makes same-timestamp ordering deterministic — required for a stable
    * result when the log carries multiple changes per key per tick.
    *
    * Scale: both windows share the partitioning on `key`, so the whole
    * build is one shuffle + one sorted pass per key, regardless of history
    * depth. No driver state, no collect.
    */
  def scd2(changes: DataFrame, key: String, ts: String, attrs: Seq[String],
           tiebreaker: Option[String] = None): DataFrame = {
    val orderCols = col(ts) +: tiebreaker.map(col).toSeq
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val attrStruct = struct(attrs.map(col): _*)
    val transitions = changes
      .withColumn("__prev", lag(attrStruct, 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= attrStruct)
    transitions
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(key) +: attrs.map(col) :+ col("valid_from") :+
        col("valid_to") :+ col("is_current"): _*)
  }

  /** Validity-chain audit for an SCD2 dimension — the contract check a
    * lake runs on dims it did NOT build with [[scd2]] (hand-maintained or
    * externally loaded): per business key, do the `[valid_from, valid_to)`
    * intervals chain cleanly? Counts, per key ordered by
    * (valid_from, valid_to):
    *
    *  - `n_overlaps`: next.valid_from < this.valid_to — two versions
    *    claim the same instant (point-in-time joins become ambiguous);
    *  - `n_gaps`: next.valid_from > this.valid_to — instants where the
    *    key has NO version (as-of lookups silently miss);
    *  - `n_current`: open intervals (null valid_to) — anything but 1 is
    *    wrong (0 = key expired entirely, ≥2 = dueling currents);
    *  - a non-final null valid_to also counts as an overlap (an open
    *    interval before the last version swallows its successors).
    *
    * One key-partitioned window pass; returns one row per key:
    * (key, n_versions, n_overlaps, n_gaps, n_current).
    */
  def validityAudit(dim: DataFrame, key: String, fromCol: String,
                    toCol: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(fromCol), col(toCol))
    dim
      .withColumn("__nf", lead(col(fromCol), 1).over(w))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_versions"),
        sum(when(col("__nf").isNotNull &&
          (col(toCol).isNull || col("__nf") < col(toCol)), 1L)
          .otherwise(0L)).as("n_overlaps"),
        sum(when(col("__nf").isNotNull && col(toCol).isNotNull &&
          col("__nf") > col(toCol), 1L).otherwise(0L)).as("n_gaps"),
        sum(when(col(toCol).isNull, 1L).otherwise(0L)).as("n_current"))
  }
}

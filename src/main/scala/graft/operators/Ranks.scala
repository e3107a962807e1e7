package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact running aggregates over a globally-ordered frame —
  * the rank family's replacement for `agg.over(Window.orderBy(v))`.
  *
  * An unpartitioned window funnels EVERY row through one task: fine when
  * the frame is a bounded value-domain table (quantized scores, grades,
  * ≤64-bin histograms — the rank family's documented contract), a silent
  * single-node sort of the corpus when a caller feeds a continuous
  * unique-valued column and distinct ≈ N. This helper removes the cliff
  * instead of documenting it, using the closed form proven in
  * [[Splits.expandingTimeFolds]]:
  *
  *  1. range-partition the frame on the order columns (partition i's keys
  *     all precede partition i+1's under the given ordering);
  *  2. aggregate each partition once — count, per-column sums, per-column
  *     mins — into a ≤`spark.sql.shuffle.partitions`-row table;
  *  3. one window over THAT tiny table turns partition totals into
  *     exclusive prefix offsets (and exclusive suffix minima);
  *  4. broadcast the offsets back: global running sum = partition offset +
  *     within-partition running sum, global rank = offset + row_number,
  *     global suffix min = least(within-partition suffix min, later
  *     partitions' min).
  *
  * Every per-row window is now partition-local (~n/P rows) and the only
  * global window runs over P rows — a frame with per-row-unique values
  * scales like any other shuffle instead of collapsing to one task.
  *
  * CONTRACT: the order columns must be UNIQUE per row (the callers all
  * order a post-groupBy distinct-value table, or break ties with an id
  * column). With duplicate keys the within-partition frame order among
  * ties — and hence every inclusive running value on tied rows — is
  * nondeterministic, exactly as it is under a plain unpartitioned window.
  *
  * The per-partition-offsets side and the per-row side both read the one
  * range exchange — ReusedExchange (on by default, AQE included) makes
  * that literal: one shuffle, one set of partition boundaries. (Range
  * boundaries come from sampling, so two INDEPENDENT exchanges of the
  * same data need not agree — don't disable `spark.sql.exchange.reuse`
  * around this helper.)
  */
object Ranks {

  private val PID = "__rk_pid"

  /** Adds inclusive running sums, inclusive reverse (suffix) running
    * minima, and/or an exact 1-based global rank to `df`, all under the
    * total order given by `order` (use `col(...).desc` for descending).
    *
    * @param sums       (inputCol, outputCol): outputCol = Σ inputCol over
    *                   rows at-or-before this row in the global order —
    *                   identical to `sum(in).over(orderBy(order).rows-
    *                   Between(unboundedPreceding, currentRow))`.
    * @param suffixMins (inputCol, outputCol): outputCol = min inputCol
    *                   over rows at-or-after this row — identical to
    *                   `min(in).over(...rowsBetween(currentRow,
    *                   unboundedFollowing))`, evaluated as a growing
    *                   frame over the reverse of a pinned row_number (a
    *                   shrinking frame is O(n²) per partition in Spark).
    * @param rankCol    if set, adds the exact global row_number under
    *                   `order` (requires unique order keys, as above).
    * @param leadOrder  if set, adds the NEXT row's value of the first
    *                   order column (null on the global last row) —
    *                   `lead(v, 1).over(orderBy(v))` distributed. Valid
    *                   only when the first order column is a bare
    *                   ASCENDING column name (the boundary row's
    *                   successor is then the next partition's minimum).
    */
  def running(df: DataFrame, order: Seq[Column],
              sums: Seq[(String, String)] = Nil,
              suffixMins: Seq[(String, String)] = Nil,
              rankCol: Option[String] = None,
              leadOrder: Option[(String, String)] = None): DataFrame = {
    require(order.nonEmpty, "need at least one order column")
    // pinned: the offsets side and the per-row side MUST read one
    // PHYSICAL range partitioning. Exchange/stage reuse is not a reliable
    // mechanism for that — under a busy AQE session the two subtrees can
    // materialize as independent exchanges whose RangePartitioners sample
    // boundaries with different seeds, and the failure mode is silently
    // wrong statistics (measured on the sibling per-group helper as
    // nondeterministic row loss through the pid join). The lazy
    // localCheckpoint freezes the partitioning; both sides read the same
    // blocks, with or without exchange reuse.
    val ranged = df.repartitionByRange(order: _*)
      .withColumn(PID, spark_partition_id())
      .localCheckpoint(eager = false)
    val sumAggs = sums.zipWithIndex.map { case ((in, _), k) =>
      sum(col(in)).as(s"__rk_s$k")
    }
    val minAggs = suffixMins.zipWithIndex.map { case ((in, _), k) =>
      min(col(in)).as(s"__rk_m$k")
    }
    val leadAggs = leadOrder.map { case (in, _) =>
      min(col(in)).as("__rk_lo")
    }.toSeq
    val aggs = (count(lit(1)).as("__rk_pc") +: (sumAggs ++ minAggs ++ leadAggs))
    val per = ranged.groupBy(PID).agg(aggs.head, aggs.tail: _*)
    // exclusive prefix/suffix over the ≤P-row partition-totals table —
    // the ONLY unpartitioned windows, bounded by shuffle.partitions
    val wBefore = Window.orderBy(PID).rowsBetween(Window.unboundedPreceding, -1)
    val wAfter = Window.orderBy(PID).rowsBetween(1, Window.unboundedFollowing)
    val offCols =
      col(PID) +:
        (sums.indices.map(k =>
          coalesce(sum(col(s"__rk_s$k")).over(wBefore), lit(0))
            .as(s"__rk_off$k")) ++
          suffixMins.indices.map(k =>
            min(col(s"__rk_m$k")).over(wAfter).as(s"__rk_sfx$k")) ++
          rankCol.map(_ =>
            coalesce(sum(col("__rk_pc")).over(wBefore), lit(0L))
              .as("__rk_roff")).toSeq ++
          leadOrder.map(_ =>
            min(col("__rk_lo")).over(wAfter).as("__rk_nxt")).toSeq)
    val offsets = per.select(offCols: _*)
    val wIn = Window.partitionBy(PID).orderBy(order: _*)
    val wInCum = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // suffix minima run as a GROWING frame over the REVERSE of the
    // window's own physical order, never `(currentRow,
    // unboundedFollowing)`: Spark recomputes a shrinking frame from
    // scratch at every row — O(n²) per partition (the carriedMatches
    // lesson, same round). The reversal pins a within-partition
    // row_number under the caller's order first, then orders the second
    // window by it DESCENDING — exact for any caller order, ties
    // included, because the complement of every (currentRow, following)
    // frame under an enumerated total order IS the (preceding,
    // currentRow) frame of its reverse.
    var out = ranged.join(broadcast(offsets), PID)
    if (suffixMins.nonEmpty)
      out = out.withColumn("__rk_sfxrn", row_number().over(wIn))
    val wInSfx = Window.partitionBy(PID).orderBy(col("__rk_sfxrn").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sums.zipWithIndex.foreach { case ((in, dst), k) =>
      out = out.withColumn(dst,
        col(s"__rk_off$k") + sum(col(in)).over(wInCum))
    }
    suffixMins.zipWithIndex.foreach { case ((in, dst), k) =>
      // least skips nulls: a last partition has no later-partition min
      out = out.withColumn(dst,
        least(min(col(in)).over(wInSfx), col(s"__rk_sfx$k")))
    }
    rankCol.foreach { dst =>
      out = out.withColumn(dst, col("__rk_roff") + row_number().over(wIn))
    }
    leadOrder.foreach { case (in, dst) =>
      // within-partition successor, or — on each partition's last row —
      // the next partition's minimum (asc order ⇒ its first value);
      // null on the global maximum, matching lead()
      out = out.withColumn(dst,
        coalesce(lead(col(in), 1).over(wIn), col("__rk_nxt")))
    }
    out.drop(PID +: (sums.indices.map(k => s"__rk_off$k") ++
      suffixMins.indices.map(k => s"__rk_sfx$k") ++
      (if (suffixMins.nonEmpty) Seq("__rk_sfxrn") else Nil) ++
      rankCol.map(_ => "__rk_roff").toSeq ++
      leadOrder.map(_ => "__rk_nxt").toSeq): _*)
  }

  /** Running-sum convenience: one inclusive sum, no rank. */
  def runningSum(df: DataFrame, order: Seq[Column],
                 inputCol: String, outputCol: String): DataFrame =
    running(df, order, sums = Seq(inputCol -> outputCol))

  /** Per-GROUP analogue of [[running]]: inclusive running sum of `input`
    * within each group under `order`, distributed the same way —
    * range-partition on (group, order), per-(partition, group) partial
    * sums (≤ one row per partition a group touches), per-group exclusive
    * offsets over that tiny table, join back, within-partition windows.
    * `Window.partitionBy(group).orderBy(order)` puts a group's EVERY row
    * through one task — fine when groups are plentiful (users, docs),
    * fatal for the sampling family, where groups are sources/languages
    * numbering in the dozens and each holds a corpus-scale slice.
    *
    * `totalCol`, if set, adds each group's total of `input` (free — the
    * offsets table already holds it). The group match is NULL-SAFE (a
    * null group key is a real group). The range partitioning is pinned
    * with a lazy localCheckpoint, so correctness does not depend on
    * exchange reuse; order keys must be unique within a group for a
    * deterministic prefix (callers pass an (md5(key), key) pair).
    */
  def groupedRunningSum(df: DataFrame, groupCols: Seq[String],
                        order: Seq[Column], input: Column,
                        outputCol: String,
                        totalCol: Option[String] = None): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(order.nonEmpty, "need at least one order column")
    val gcols = groupCols.map(col)
    // pinned: the offsets and row sides must observe ONE physical range
    // partitioning — exchange/stage reuse is not reliable for that under
    // a busy AQE session (independent exchanges sample boundaries with
    // different seeds; measured as silent row loss through the pid join)
    val ranged = df.repartitionByRange((gcols ++ order): _*)
      .withColumn(PID, spark_partition_id())
      .localCheckpoint(eager = false)
    val wOff = Window.partitionBy(gcols: _*).orderBy(PID)
    val offsets = ranged.groupBy((col(PID) +: gcols): _*)
      .agg(sum(input).as("__rk_gpc"))
      .withColumn("__rk_goff", coalesce(sum("__rk_gpc").over(
        wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .withColumn("__rk_gtot", sum("__rk_gpc").over(
        wOff.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select((col(PID).as("__rk_gop") +:
        groupCols.map(c => col(c).as(s"__rk_g_$c"))) ++
        Seq(col("__rk_goff"), col("__rk_gtot")): _*)
    val cond = (col(PID) === col("__rk_gop")) +:
      groupCols.map(c => col(c) <=> col(s"__rk_g_$c"))
    val wIn = Window.partitionBy((col(PID) +: gcols): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = ranged.join(offsets, cond.reduce(_ && _))
      .withColumn(outputCol, col("__rk_goff") + sum(input).over(wIn))
    totalCol.foldLeft(joined)((d, t) => d.withColumn(t, col("__rk_gtot")))
      .drop((PID +: "__rk_gop" +: "__rk_goff" +: "__rk_gtot" +:
        groupCols.map(c => s"__rk_g_$c")): _*)
  }
}

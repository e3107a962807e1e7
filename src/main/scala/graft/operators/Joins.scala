package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond Spark's built-in strategies, composed from
  * primitives per the preference order in SURVEY §7.3 — these semantics are
  * expressible with union+window / salt+explode, so no custom SparkPlan is
  * warranted.
  */
object Joins {

  /** Comparable time value at the column's native best precision:
    * timestamps → epoch MICROSECONDS (second-flooring can invert
    * closeness and over-admit tolerances); numeric time columns pass
    * through unchanged (the caller's units are the contract).
    */
  private def timeKey(c: Column, isTimestamp: Boolean): Column =
    if (isTimestamp) unix_micros(c) else c.cast("long")

  private def isTsType(df: DataFrame, colName: String): Boolean =
    df.schema(colName).dataType
      .isInstanceOf[org.apache.spark.sql.types.TimestampType]

  /** Right side reduced to ONE deterministic row per (key, ts) — the
    * struct minimum, nearestJoin's rule applied to the as-of pair too —
    * so duplicate (key, rightTs) right rows can't make the window carry
    * return a caller-arbitrary duplicate. Unorderable payloads (MapType)
    * can't take a struct min; they pass through raw and keep arbitrary
    * tie order among duplicates (pre-collapse in the caller for
    * determinism). The collapse is one map-side-combinable aggregate on
    * rows that were about to shuffle on the key anyway, and it SHRINKS
    * the carry input — strictly cheaper at scale when ties exist.
    */
  private def collapsedRight(right: DataFrame, key: String,
                             rightTs: String, rStruct: Column): DataFrame = {
    val raw = right.select(col(key), col(rightTs).as("__ts"),
      rStruct.as("__r"))
    val orderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(raw.schema("__r").dataType)
    if (orderable)
      raw.groupBy(col(key), col("__ts")).agg(min(col("__r")).as("__r"))
    else raw
  }

  /** Distributed per-key carry over (__ts, __side) order: adds `__back`
    * (last non-null `__r` at-or-before each row) and/or `__fwd` (first
    * non-null at-or-after) WITHOUT a per-key window. A
    * `Window.partitionBy(key)` carry funnels each key's entire timeline
    * through one sort task — and as-of keys are often few (symbols,
    * devices, rooms), so that's the whole feed on one executor. Shape:
    * range-partition on (key, ts, side); per-(partition, key) boundary
    * summaries (the latest / earliest non-null payload the partition
    * holds — one tiny max_by/min_by aggregate keyed on (ts, side, row id),
    * so the payload itself never needs to be ORDERABLE and map-typed
    * right values work); per-key carry-in/out over that
    * ≤(P × keys-per-partition)-row table; partition-local windows with
    * the carry as fallback. Equal (key, ts, side) rows land in one range
    * partition, so tie behavior matches the single-window formulation;
    * exact (ts, side) ties inside a partition break by the pinned row id,
    * which follows physical row order — the same row the window's
    * last()/first() would pick.
    */
  private def carriedMatches(tagged: DataFrame, key: String,
                             back: Boolean, fwd: Boolean): DataFrame = {
    // The summary and row sides MUST observe identical range boundaries.
    // Exchange/stage reuse is NOT reliable for that: under a busy AQE
    // session the two subtrees can materialize as independent exchanges
    // whose RangePartitioners sample with different seeds — measured as
    // nondeterministic row LOSS through the (pid, key) join (q97 dumped
    // 79k of 1.26M rows on some runs). The lazy localCheckpoint freezes
    // ONE physical partitioning both sides read.
    // __mid is minted BEFORE the checkpoint so the pin freezes it with
    // the partitioning — it is the deterministic within-partition tiebreak
    val ranged = tagged
      .repartitionByRange(col(key), col("__ts"), col("__side"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(eager = false)
    // max_by/min_by key the pick on (ts, side, row id) — never on __r —
    // so a MapType (or any unorderable) right payload is fine; a null
    // ordering key makes the aggregate skip the row, which drops the
    // null-__r left rows exactly like the old when() filter did
    val ordKey = when(col("__r").isNotNull,
      struct(col("__ts").as("t"), col("__side").as("s"), col("__mid").as("m")))
    val aggs =
      (if (back) Seq(max_by(col("__r"), ordKey).as("__lastS")) else Nil) ++
      (if (fwd) Seq(min_by(col("__r"), ordKey).as("__firstS")) else Nil)
    val wPrev = Window.partitionBy(key).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(key).orderBy("__pid")
      .rowsBetween(1, Window.unboundedFollowing)
    var boundary = ranged.groupBy(col("__pid"), col(key))
      .agg(aggs.head, aggs.tail: _*)
    if (back) boundary = boundary.withColumn("__carryB",
      last(col("__lastS"), ignoreNulls = true).over(wPrev))
    if (fwd) boundary = boundary.withColumn("__carryF",
      first(col("__firstS"), ignoreNulls = true).over(wNext))
    val carryCols =
      (if (back) Seq(col("__carryB")) else Nil) ++
        (if (fwd) Seq(col("__carryF")) else Nil)
    val bSel = boundary.select(
      col("__pid").as("__bpid") +: col(key).as("__bkey") +: carryCols: _*)
    val wIn = Window.partitionBy(col("__pid"), col(key))
      .orderBy(col("__ts"), col("__side"))
    // the forward carry runs on the REVERSED order with a GROWING frame,
    // never `(currentRow, unboundedFollowing)`: Spark evaluates a
    // shrinking frame by recomputing the aggregate from scratch at every
    // row — O(n²) per (partition, key) slice, measured at 23 s for one
    // 100 k-row/16-key nearestJoin vs ~1 s for the backward half. The
    // reversal is exact whenever rows with a non-null `__r` are unique
    // per (key, __ts, __side) — i.e. whenever the caller pre-collapsed
    // the right side per (key, ts), which nearestJoin always does and
    // asOfJoin/asOfJoinForward do for orderable payloads. Then physical
    // tie order among the null-payload rows can never change which row
    // last()/first() picks. With an UNORDERABLE payload (MapType) the
    // right side arrives raw, and duplicate (key, ts) right rows keep
    // caller-arbitrary tie order — in BOTH sort directions, same as the
    // single-window formulation; the reversal adds no new nondeterminism.
    val wInDesc = Window.partitionBy(col("__pid"), col(key))
      .orderBy(col("__ts").desc, col("__side").desc)
    var out = ranged.join(bSel,
      col("__pid") === col("__bpid") && col(key) <=> col("__bkey"))
    if (back) out = out.withColumn("__back",
      coalesce(last(col("__r"), ignoreNulls = true)
        .over(wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        col("__carryB")))
    if (fwd) out = out.withColumn("__fwd",
      coalesce(last(col("__r"), ignoreNulls = true)
        .over(wInDesc
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        col("__carryF")))
    out.drop("__pid", "__mid", "__bpid", "__bkey", "__carryB", "__carryF")
  }

  /** As-of join: for each left row, the single right row with the greatest
    * `rightTs` ≤ `leftTs` within the same `key` (inner: left rows with no
    * prior right row are dropped) — DuckDB/kdb ASOF JOIN semantics.
    *
    * Implemented as union + sorted carry-forward rather than an
    * inequality join: one shuffle, a sorted pass per (partition, key)
    * with cross-partition carry ([[carriedMatches]] — no per-key funnel),
    * and no M:N intermediate blow-up — the inequality-join
    * formulation explodes to (left × right-per-key) before picking the max.
    * At equal timestamps the right row sorts first, so `ts ≥ ts` matches.
    * Duplicate right rows at one (key, ts) reduce to their struct minimum
    * first (nearestJoin's rule), so the matched row is deterministic —
    * except for unorderable (MapType) payloads, which pass through raw
    * with caller-arbitrary tie order among duplicates.
    *
    * `toleranceSec` drops matches whose right row is further in the past
    * than the bound (pandas merge_asof `tolerance` semantics, symmetric
    * with [[asOfJoinForward]]); it compares the two timestamp columns at
    * microsecond precision.
    *
    * Output: all left columns plus `rightValCols` (renamed via `asOfPrefix`).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               rightValCols: Seq[String], asOfPrefix: String = "asof_",
               toleranceSec: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // Right values travel as ONE struct so the carry-forward picks entire
    // right rows atomically — per-column last(ignoreNulls) would stitch
    // fields from different right rows whenever a matched row holds a NULL.
    // The matched right row's own timestamp rides along (__rts) so the
    // tolerance bound can compare it to the left timestamp.
    val rStruct = struct(col(rightTs).as("__rts") +: rightValCols.map(col): _*)
    val rStructType = right.select(rStruct.as("__r")).schema("__r").dataType
    val tagged =
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
        .select(Seq(col("__ts"), col("__side"), col(key)) ++
          leftCols.filterNot(_ == key).map(col) :+
          lit(null).cast(rStructType).as("__r"): _*)
        .unionByName(
          collapsedRight(right, key, rightTs, rStruct)
            .withColumn("__side", lit(0))
            .select(Seq(col("__ts"), col("__side"), col(key)) ++
              leftCols.filterNot(_ == key)
                .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
              col("__r"): _*))
    val matched = carriedMatches(tagged, key, back = true, fwd = false)
      .where(col("__side") === 1 && col("__back").isNotNull)
    val isTs = isTsType(right, rightTs)
    val tolScale = if (isTs) 1000000L else 1L
    val bounded = toleranceSec match {
      // µs precision on timestamps: epoch-second flooring would admit
      // matches up to a second beyond the bound (same rule as the
      // forward direction and nearestJoin)
      case Some(tol) => matched.where(
        timeKey(col("__ts"), isTs) - timeKey(col("__back.__rts"), isTs) <=
          tol * tolScale)
      case None => matched
    }
    bounded.select(leftCols.map(col) ++
      rightValCols.map(c => col(s"__back.$c").as(s"$asOfPrefix$c")): _*)
  }

  /** Forward as-of join: for each left row, the single right row with the
    * SMALLEST `rightTs` ≥ `leftTs` within the same `key` (the "next
    * observation" direction — e.g. the first sensor reading after an
    * order). Same union + single-sorted-pass shape as [[asOfJoin]], with
    * the carry running over the FOLLOWING frame; at equal timestamps the
    * left row sorts first so `ts ≤ ts` matches. Duplicate right rows at
    * one (key, ts) reduce to their struct minimum first (raw
    * pass-through with arbitrary tie order for unorderable payloads —
    * see [[asOfJoin]]). `toleranceSec` drops
    * matches further than the bound (inner semantics, like kdb `wj`
    * windows); it compares the two timestamp columns at microsecond
    * precision.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      rightValCols: Seq[String], asOfPrefix: String = "asof_",
                      toleranceSec: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // the matched right row's own timestamp travels in the struct (__rts)
    // so the tolerance bound can compare it to the left timestamp
    val rStruct = struct(col(rightTs).as("__rts") +: rightValCols.map(col): _*)
    val rStructType = right.select(rStruct.as("__r")).schema("__r").dataType
    val tagged =
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(0))
        .select(Seq(col("__ts"), col("__side"), col(key)) ++
          leftCols.filterNot(_ == key).map(col) :+
          lit(null).cast(rStructType).as("__r"): _*)
        .unionByName(
          collapsedRight(right, key, rightTs, rStruct)
            .withColumn("__side", lit(1))
            .select(Seq(col("__ts"), col("__side"), col(key)) ++
              leftCols.filterNot(_ == key)
                .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
              col("__r"): _*))
    val matched = carriedMatches(tagged, key, back = false, fwd = true)
      .withColumnRenamed("__fwd", "__match")
      .where(col("__side") === 0 && col("__match").isNotNull)
    val isTs = isTsType(right, rightTs)
    val tolScale = if (isTs) 1000000L else 1L
    val bounded = toleranceSec match {
      // µs precision on timestamps: epoch-second flooring would admit
      // matches up to a second beyond the bound; numeric time columns
      // compare in their own units (same rule as nearestJoin)
      case Some(tol) => matched.where(
        timeKey(col("__match.__rts"), isTs) - timeKey(col("__ts"), isTs) <=
          tol * tolScale)
      case None => matched
    }
    bounded.select(leftCols.map(col) ++
      rightValCols.map(c => col(s"__match.$c").as(s"$asOfPrefix$c")): _*)
  }

  /** Nearest join: for each left row, the right row minimizing
    * |rightTs − leftTs| within the same `key`, optionally bounded by
    * `toleranceSec` — the "closest sensor reading to the order" direction
    * [[asOfJoin]] (≤) and [[asOfJoinForward]] (≥) each cover half of.
    * Ties (equal distance before and after) resolve to the EARLIER right
    * row; right rows sharing one timestamp reduce to their struct-minimum
    * first, so every choice is deterministic and SQL-replayable.
    *
    * Same scale shape as the as-of pair: union + ONE shuffle on the key +
    * a single sorted window pass computing BOTH carries (backward `last`
    * and forward `first` share the sort), then per-row arithmetic picks
    * the closer side. No inequality join, no M:N blow-up. Inner
    * semantics: left rows with no in-tolerance right row drop. All
    * comparisons run at MICROSECOND precision (epoch-second flooring
    * would invert closeness across second boundaries). Output: left
    * columns + prefixed right values + `<prefix>dt_sec` (signed
    * rightTs − leftTs in seconds, double, µs-exact).
    */
  def nearestJoin(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String,
                  rightValCols: Seq[String],
                  prefix: String = "nearest_",
                  toleranceSec: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val isTs = isTsType(right, rightTs)
    val tolScale = if (isTs) 1000000L else 1L
    val rStruct = struct(col(rightTs).as("__rts") +: rightValCols.map(col): _*)
    val rStructType = right.select(rStruct.as("__r")).schema("__r").dataType
    // one deterministic right row per (key, ts): the struct minimum —
    // equal-timestamp ties otherwise make the window carry racy
    val rightOne = right.groupBy(col(key), col(rightTs).as("__ts"))
      .agg(min(rStruct).as("__r"))
      .withColumn("__side", lit(0))
    val tagged =
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
        .select(Seq(col("__ts"), col("__side"), col(key)) ++
          leftCols.filterNot(_ == key).map(col) :+
          lit(null).cast(rStructType).as("__r"): _*)
        .unionByName(rightOne
          .select(Seq(col("__ts"), col("__side"), col(key)) ++
            leftCols.filterNot(_ == key)
              .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
            col("__r"): _*))
    // right sorts before an equal-ts left row, so the exact-match case
    // lands in the BACKWARD carry (and wins every tie by the rule above);
    // both carries share one distributed sorted pass
    val matched = carriedMatches(tagged, key, back = true, fwd = true)
      .where(col("__side") === 1)
      // microsecond precision on timestamps, NOT cast("long"):
      // epoch-second flooring can invert which side is closer when
      // fractional seconds straddle a boundary (left 100.2s, back 99.9s,
      // fwd 100.9s: floored dt 1 vs 0 picks the farther row) — and the
      // testdata carries sub-second ts. Numeric time columns compare in
      // their own units.
      .withColumn("__db",
        timeKey(col("__ts"), isTs) - timeKey(col("__back.__rts"), isTs))
      .withColumn("__df",
        timeKey(col("__fwd.__rts"), isTs) - timeKey(col("__ts"), isTs))
      .withColumn("__m",
        when(col("__back").isNull, col("__fwd"))
          .when(col("__fwd").isNull, col("__back"))
          .when(col("__df") < col("__db"), col("__fwd"))
          .otherwise(col("__back")))
      .where(col("__m").isNotNull)
      .withColumn("__dt",
        timeKey(col("__m.__rts"), isTs) - timeKey(col("__ts"), isTs))
    val bounded = toleranceSec match {
      case Some(tol) =>
        require(tol >= 0, s"toleranceSec must be ≥ 0: $tol")
        matched.where(abs(col("__dt")) <= tol * tolScale)
      case None => matched
    }
    bounded.select(leftCols.map(col) ++
      rightValCols.map(c => col(s"__m.$c").as(s"$prefix$c")) :+
      (col("__dt") / tolScale.toDouble).as(s"${prefix}dt_sec"): _*)
  }

  /** Range join (`lo ≤ leftVal < hi`) accelerated by binning: both sides map
    * to fixed-width bins (ranges explode to every bin they cover, values to
    * the one bin containing them), the join becomes an equi-join on the bin
    * plus a residual range filter. A plain inequality join has no equi-key,
    * so Spark plans BroadcastNestedLoopJoin — O(|left|·|ranges|) compares;
    * binning bounds compares to rows sharing a bin. Each (row, range) match
    * appears exactly once: a value's bin is unique and a range covers it at
    * most once, so no post-dedup is needed. Pick `binWidth` near the median
    * range width — much smaller multiplies the range side's replication,
    * much larger degrades toward the nested loop inside oversized bins. The
    * range side is typically dim-sized and broadcast by Catalyst; the big
    * side then never shuffles.
    */
  def rangeJoinBinned(left: DataFrame, leftVal: String,
                      ranges: DataFrame, lo: String, hi: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // temp column name guaranteed absent from both inputs (a user column
    // named "__bin" would be silently overwritten and dropped otherwise)
    val bin = Iterator.from(0).map(i => s"__bin$i")
      .find(n => !left.columns.contains(n) && !ranges.columns.contains(n)).get
    val binnedRanges = ranges.withColumn(bin,
      explode(sequence(floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    left.withColumn(bin, floor(col(leftVal) / binWidth).cast("long"))
      .join(binnedRanges, Seq(bin))
      .where(col(leftVal) >= col(lo) && col(leftVal) < col(hi))
      .drop(bin)
  }

  /** Salted equi-join for skewed keys: replicate the small side `salt` ways
    * and scatter the large side's hot keys across the replicas, so no
    * single reducer owns a hot key. AQE's skew-join handles moderate skew
    * automatically; salting is the explicit tool for pathological keys.
    *
    * Two scatter modes — a real tradeoff:
    *  - DEFAULT (`uniformScatter = false`): salt = xxhash64 of the large
    *    row's content — stable across partition layout, task retries, and
    *    runs (bit-reproducible routing). Limitation: rows with identical
    *    or low-cardinality content share salts, so a hot key whose 10M
    *    rows carry only 2 distinct payloads still lands on ≤ 2 reducers.
    *  - `uniformScatter = true`: salt from
    *    `monotonically_increasing_id()` — scatters ANY hot key uniformly,
    *    duplicate rows included, at the cost of partition-layout- and
    *    retry-dependent routing (join RESULTS are identical either way;
    *    only row→reducer placement varies).
    * Pick uniform when the skew is duplicate-heavy; pick content when
    * reproducible placement matters.
    */
  /** The content row→salt mapping used by [[saltedJoin]] (exposed for
    * spec-level determinism assertions): hash of every column, mod `salt`.
    */
  private[graft] def saltOf(df: DataFrame, salt: Int) =
    pmod(xxhash64(df.columns.map(col): _*), lit(salt)).cast("int")

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salt: Int, uniformScatter: Boolean = false): DataFrame = {
    val saltCol =
      if (uniformScatter)
        pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int")
      else saltOf(large, salt)
    val saltedLarge = large.withColumn("__salt", saltCol)
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Interval-overlap join: every (left, right) pair whose HALF-OPEN
    * intervals [start, end) intersect — concurrency analysis, meeting/
    * session collision, downtime attribution. The inequality predicate
    * `ls < re AND rs < le` is a cross join to a hash-join engine, so the
    * scale shape is GRID BINNING: each interval explodes onto the
    * `binWidth`-sized cells it touches, the join runs as an EQUI-join on
    * (keys, cell), and the exact overlap predicate filters inside the
    * matched cell. A pair sharing several cells would emit once per
    * cell; the standard dedup-free trick keeps only the FIRST shared
    * cell — the cell holding the later of the two starts — so no
    * distinct pass is needed. Work = Σ cells-per-interval fan-out +
    * per-cell equi-join: pick binWidth near the median interval length
    * (too small → fan-out, too large → many intervals per cell).
    *
    * `keys` are extra equi-join columns (same name both sides, e.g. a
    * user or resource id) that partition the grid; all other column
    * names must be disjoint across the inputs. Returns left ++ right
    * columns with the key columns once.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          binWidth: Double,
                          keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val clash = (left.columns.toSet -- keys)
      .intersect(right.columns.toSet -- keys)
    require(clash.isEmpty, s"non-key columns must be disjoint: $clash")
    def cellsOf(df: DataFrame, s: String, e: String): DataFrame = df
      // half-open: an interval ending exactly on a cell edge does not
      // touch that cell — hence the tiny epsilon off the end
      .withColumn("__cell", explode(sequence(
        floor(col(s) / binWidth).cast("long"),
        greatest(floor(col(s) / binWidth),
          ceil(col(e) / binWidth) - 1).cast("long"))))
    cellsOf(left, lStart, lEnd)
      .join(cellsOf(right, rStart, rEnd), keys :+ "__cell")
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        // emit in ONE cell only: the one containing the later start
        col("__cell") === floor(greatest(col(lStart), col(rStart)) /
          binWidth).cast("long"))
      .drop("__cell")
  }
}

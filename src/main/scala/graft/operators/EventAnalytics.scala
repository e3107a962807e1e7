package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics beyond sessionization: conversion funnels and
  * retention cohorts — the two queries every product-analytics user runs
  * against an events table (the reference's bikeshare warehouse has no
  * event stream; this serves the engine's events surface alongside
  * [[Sessionize]] and the streaming module).
  */
object EventAnalytics {

  /** First-touch conversion funnel: per user, the timestamp of stage 0's
    * FIRST occurrence, then for each later stage the first occurrence
    * STRICTLY AFTER the previous stage's resolved time. A user's funnel
    * row carries one nullable timestamp per stage; a null at stage i means
    * the user never converted past stage i-1 (later stages are null too by
    * construction).
    *
    * Shape for scale: one filtered aggregate per stage, each a partial-
    * aggregable `min` keyed on the user — stage count is small and fixed,
    * so this is `stages` compact shuffles, never a per-user sort or a
    * window over raw events. Events outside the stage list are filtered
    * scan-side before any shuffle.
    */
  /** Funnel computation on INDEX-based internal column names (`__t0`,
    * `__t1`, ...): stage VALUES are data, and resolving columns named
    * after them (`t_<stage>`) breaks at analysis time the moment a stage
    * string contains '.', backticks or other name-special characters —
    * legitimate event-type values. Only the final projection derives
    * stage-named output columns (safe: `.as()` takes the name literally).
    */
  private def funnelIdx(df: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct: $stages")
    val relevant = df.where(col(typeCol).isin(stages: _*))
      .select(col(userCol).as("user"), col(tsCol).as("ts"),
        col(typeCol).as("tp"))
    val first = relevant.where(col("tp") === stages.head)
      .groupBy("user").agg(min("ts").as("__t0"))
    stages.indices.drop(1).foldLeft(first) { (acc, i) =>
      val prev = s"__t${i - 1}"
      val next = relevant.where(col("tp") === stages(i))
        .join(acc.select(col("user"), col(prev)), Seq("user"))
        .where(col("ts") > col(prev))
        .groupBy("user").agg(min("ts").as(s"__t$i"))
      acc.join(next.select(col("user").as("__u"), col(s"__t$i")),
          col("user") === col("__u"), "left")
        .drop("__u")
    }
  }

  def funnel(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
             stages: Seq[String]): DataFrame =
    funnelIdx(df, userCol, tsCol, typeCol, stages)
      .select(col("user") +: stages.indices.map(i =>
        col(s"__t$i").as(s"t_${stages(i)}")): _*)

  /** Funnel stage latency: for each consecutive stage pair, the
    * distribution of time-to-advance among users who DID advance —
    * conversion counts say how many drop; this says where the remaining
    * users stall (the p90 of view→cart is the page to fix). Gaps come
    * from [[funnel]]'s resolved first-touch times, quantize to
    * `quantizeSeconds` buckets (the rank family's bounded-domain
    * contract), and p50/p90 are lower-value-at-rank over the bucket
    * domain — exact, engine-replayable. Returns one row per transition:
    * (stage_from, stage_to, n_advanced, p50_sec, p90_sec) with
    * percentiles in seconds at bucket granularity.
    *
    * Shape: the funnel's user-keyed aggregates, then per-transition
    * bucket counts + running sums over the bounded gap domain — the
    * [[Stats.quantileTreatmentEffects]] budget per stage pair.
    */
  def funnelLatency(df: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, stages: Seq[String],
                    quantizeSeconds: Long = 60L): DataFrame = {
    require(stages.size >= 2, "need at least 2 stages")
    require(quantizeSeconds >= 1, "quantizeSeconds must be positive")
    val f = funnelIdx(df, userCol, tsCol, typeCol, stages)
    val gaps = stages.indices.drop(1).map { i =>
      f.where(col(s"__t$i").isNotNull)
        .select(lit(i).as("__i"),
          (floor((unix_timestamp(col(s"__t$i")) -
            unix_timestamp(col(s"__t${i - 1}"))) / quantizeSeconds) *
            quantizeSeconds).as("__gap"))
    }.reduce(_ unionByName _)
    val per = gaps.groupBy("__i", "__gap").agg(count(lit(1)).as("__c"))
    val names = stages.indices.drop(1).map(i =>
      struct(lit(i).as("i"), lit(stages(i - 1)).as("f"),
        lit(stages(i)).as("t")))
    val nameDf = df.sparkSession.range(1).select(
      explode(array(names: _*)).as("__s"))
      .select(col("__s.i").as("__i"), col("__s.f").as("stage_from"),
        col("__s.t").as("stage_to"))
    // distributed per-stage running count over the gap domain: the gap
    // domain is time-range-sized (quantized, but unbounded for a wide
    // log), and there are only |stages|-1 partitions — the exact shape a
    // per-stage ordered window would funnel through one task
    Ranks.groupedRunningSum(per, Seq("__i"), Seq(col("__gap")),
        col("__c"), "__cum", totalCol = Some("__n"))
      .groupBy("__i")
      .agg(max("__n").as("n_advanced"),
        min(when(col("__cum") >= ceil(col("__n") * 5 / 10.0),
          col("__gap"))).as("p50_sec"),
        min(when(col("__cum") >= ceil(col("__n") * 9 / 10.0),
          col("__gap"))).as("p90_sec"))
      .join(broadcast(nameDf), Seq("__i"))
      .select("stage_from", "stage_to", "n_advanced", "p50_sec", "p90_sec")
  }

  /** Funnel rollup: how many users reached each stage (reached = non-null
    * resolved time), in declared stage order.
    */
  def funnelCounts(df: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String]): DataFrame = {
    val f = funnelIdx(df, userCol, tsCol, typeCol, stages)
    val counts = stages.zipWithIndex.map { case (s, i) =>
      struct(lit(i).as("stage_idx"), lit(s).as("stage"),
        count(col(s"__t$i")).as("n_users"))
    }
    f.agg(explode(array(counts: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.n_users"))
  }

  /** Event-path transition counts: per user, events ordered by
    * (`tsCol`, `tieCol`); every adjacent (type → next type) pair counted
    * across the corpus. The "where do users go next" report — the bigram
    * of path analysis (longer n-grams compose by re-applying `lead`).
    *
    * Shape for scale: ONE shuffle on the user key feeds the `lead` window
    * (per-user sorted pass, state = one row); the transition aggregate is
    * keyed on (from, to) — cardinality `|types|²`, partial-aggregable
    * map-side, so the second exchange carries at most a few hundred rows
    * per task regardless of corpus size. `tieCol` makes the ordering total
    * (timestamps collide in real logs), so results are deterministic under
    * any partitioning.
    */
  def transitionCounts(df: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy("user").orderBy(col("ts"), col("tie"))
    df.select(col(userCol).as("user"), col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Last-touch attribution: each conversion event is credited to the
    * latest touch event (`touchTypes`) at-or-before it for the same user;
    * output aggregates conversion count and value by credited touch type.
    * Conversions with no prior touch are dropped (inner as-of semantics).
    *
    * Reuses [[Joins.asOfJoin]] — union + ONE user-keyed sorted window
    * pass, no per-conversion probe join. Touches are first reduced to one
    * row per (user, ts) keeping the highest `tieCol` (real logs collide on
    * timestamps; the as-of carry must see a total order to be
    * deterministic). Both inputs are filtered scan-side to the named event
    * types before any shuffle.
    */
  def lastTouchAttribution(df: DataFrame, userCol: String, tsCol: String,
                           typeCol: String, tieCol: String, valueCol: String,
                           conversionType: String,
                           touchTypes: Seq[String]): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      s"touchTypes must be non-empty and exclude the conversion type")
    val conv = df.where(col(typeCol) === conversionType)
      .select(col(userCol).as("user"), col(tsCol).as("ts"),
        col(valueCol).as("value"))
    val touches = df.where(col(typeCol).isin(touchTypes: _*))
      .groupBy(col(userCol).as("user"), col(tsCol).as("ts"))
      .agg(max_by(col(typeCol), col(tieCol)).as("touch_type"))
    Joins.asOfJoin(conv, touches, "user", "ts", "ts", Seq("touch_type"))
      .groupBy(col("asof_touch_type").as("touch_type"))
      .agg(count(lit(1)).as("n_conversions"),
        sum("value").as("total_value"))
  }

  /** Linear multi-touch attribution — the fractional-credit sibling of
    * [[lastTouchAttribution]]: each conversion splits its count and value
    * EQUALLY across every touch event (`touchTypes`) the same user had in
    * the `lookbackSeconds` window at-or-before it; a channel that showed
    * up anywhere on the path earns credit, not just the final click.
    * Conversions with no in-window touch are dropped (same inner
    * semantics as last-touch).
    *
    * Shape: touches and conversions are filtered scan-side, then ONE
    * user-keyed range join bounded by the lookback pairs each conversion
    * with its touches — per-user work is touches×conversions inside the
    * window, the price of multi-touch semantics (document the lookback;
    * it is the fan-out cap). A per-conversion count sets the 1/n share,
    * and a final touch-type aggregate folds the credit. No windows over
    * raw rows, no collect.
    */
  def linearAttribution(df: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, valueCol: String,
                        conversionType: String, touchTypes: Seq[String],
                        lookbackSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      s"touchTypes must be non-empty and exclude the conversion type")
    require(lookbackSeconds > 0, "lookbackSeconds must be positive")
    // conversions colliding on (user, ts) pre-merge (count + value sum):
    // the pair join identifies a conversion by its timestamp, so the
    // merge must happen BEFORE pairing or same-ts conversions would
    // double-join and nondeterministically share a value
    val conv = df.where(col(typeCol) === conversionType)
      .groupBy(col(userCol).as("user"),
        unix_timestamp(col(tsCol)).as("cts"))
      .agg(count(lit(1)).as("__nconv"), sum(col(valueCol)).as("__v"))
    val touches = df.where(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("user"),
        unix_timestamp(col(tsCol)).as("tts"),
        col(typeCol).as("touch_type"))
    val paired = conv.join(touches, Seq("user"))
      .where(col("tts") <= col("cts") &&
        col("tts") >= col("cts") - lookbackSeconds)
    // 1/n share per conversion slot: n in-window touches
    val shares = paired.groupBy("user", "cts")
      .agg(count(lit(1)).as("__n"))
    paired.join(shares, Seq("user", "cts"))
      .groupBy("touch_type")
      .agg(sum(col("__nconv").cast("double") / col("__n"))
        .as("credited_conversions"),
        sum(col("__v") / col("__n")).as("credited_value"))
  }

  /** Event-time disorder audit — the measurement a streaming watermark
    * is chosen FROM: per key, order events by arrival (`seqCol`, e.g. an
    * ingest-monotone id) and measure how badly event time (`tsCol`) runs
    * backwards: adjacent inversions, their rate, the worst single
    * backward jump, and the max lag of any event behind the running
    * event-time high-water mark (the number a `withWatermark` delay must
    * exceed to not drop that event). ONE key-partitioned window pass
    * (lag + running max), then a per-key aggregate. Returns
    * (key, n_events, n_inversions, inversion_rate, max_backstep_sec,
    * max_watermark_lag_sec).
    */
  def outOfOrderStats(df: DataFrame, keyCol: String, seqCol: String,
                      tsCol: String): DataFrame = {
    val w = Window.partitionBy("__k").orderBy("__seq")
    val hwm = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .select(col(keyCol).as("__k"), col(seqCol).as("__seq"),
        unix_timestamp(col(tsCol)).as("__ts"))
      .withColumn("__prev", lag("__ts", 1).over(w))
      .withColumn("__hwm", max("__ts").over(hwm))
      .groupBy(col("__k").as(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__ts") < col("__prev"), 1L).otherwise(0L))
          .as("n_inversions"),
        (sum(when(col("__ts") < col("__prev"), 1L).otherwise(0L))
          .cast("double") /
          greatest(count(col("__prev")), lit(1L))).as("inversion_rate"),
        max(when(col("__ts") < col("__prev"), col("__prev") - col("__ts"))
          .otherwise(0L)).as("max_backstep_sec"),
        max(col("__hwm") - col("__ts")).as("max_watermark_lag_sec"))
  }

  /** Two-proportion A/B conversion test: users are split by `variantCol`
    * (a deterministic 0/1 assignment, e.g. `user_id % 2` — hash-stable so
    * re-runs and late events land in the same arm); a user converts if
    * they have ≥1 `conversionType` event. Returns ONE row with per-arm
    * sizes, conversions, rates, the absolute lift, and the pooled
    * two-proportion z statistic.
    *
    * Shape for scale: one user-keyed aggregate (partial-aggregable `max`)
    * collapses the corpus to one row per user, then a single global
    * aggregate of conditional counts — the classic two-exchange scalar
    * report; no collect, no pivot.
    */
  def abLift(df: DataFrame, userCol: String, typeCol: String,
             conversionType: String, variantCol: Column): DataFrame = {
    val perUser = df
      .select(col(userCol).as("user"), variantCol.cast("int").as("variant"),
        (col(typeCol) === conversionType).cast("int").as("is_conv"))
      .groupBy("user", "variant")
      .agg(max("is_conv").as("converted"))
    val agg = perUser.agg(
      count(when(col("variant") === 0, 1)).as("n_a"),
      count(when(col("variant") === 1, 1)).as("n_b"),
      sum(when(col("variant") === 0, col("converted"))
        .otherwise(0)).as("conv_a"),
      sum(when(col("variant") === 1, col("converted"))
        .otherwise(0)).as("conv_b"))
    val pA = col("conv_a") / col("n_a")
    val pB = col("conv_b") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b"))
    agg.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      pA.as("rate_a"), pB.as("rate_b"), (pB - pA).as("lift"),
      ((pB - pA) /
        sqrt(pooled * (lit(1.0) - pooled) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))).as("z"))
  }

  /** Weekly retention cohorts: each user's cohort is the week-index of
    * their FIRST event (weeks = whole 7-day buckets since the global
    * earliest event — no calendar-week dialect to disagree on); for each
    * offset k ≤ `maxWeeks`, how many of the cohort's users were active in
    * cohort+k. One first-event aggregate, one distinct over (cohort, k,
    * user) — both user-keyed partial aggregates; the global min is a
    * scalar broadcast.
    */
  def weeklyRetention(df: DataFrame, userCol: String, tsCol: String,
                      maxWeeks: Int = 4): DataFrame = {
    require(maxWeeks >= 0)
    val ev = df.select(col(userCol).as("user"), col(tsCol).as("ts"))
    val epoch0 = ev.agg(min(unix_timestamp(col("ts"))).as("e0"))
    def weekOf(ts: Column, e0: Column) =
      floor((unix_timestamp(ts) - e0) / 604800L).cast("int")
    val firsts = ev.groupBy("user").agg(min("ts").as("first_ts"))
      .crossJoin(broadcast(epoch0))
      .select(col("user"), weekOf(col("first_ts"), col("e0")).as("cohort"))
    val active = ev.crossJoin(broadcast(epoch0))
      .select(col("user"), weekOf(col("ts"), col("e0")).as("week"))
      .distinct()
    firsts.join(active, Seq("user"))
      .withColumn("k", col("week") - col("cohort"))
      .where(col("k").between(0, maxWeeks))
      .groupBy("cohort", "k")
      .agg(countDistinct("user").as("n_users"))
  }

  /** Pairwise association rules over baskets — support / confidence /
    * lift for every ordered item pair co-occurring in at least
    * `minBasketCount` baskets: the market-basket view of an event log
    * ("users who error also churn", "docs tagged X also carry Y").
    *
    * A basket is the DISTINCT item set of a `basketCols` group (e.g.
    * user × day). For the pair (a → c): support = n(a,c)/N baskets,
    * confidence = n(a,c)/n(a), lift = support / (p(a)·p(c)) — lift > 1 is
    * positive association, < 1 avoidance.
    *
    * Shape for scale: the (basket, item) distinct is one shuffle of
    * compact keys; the pair self-join runs WITHIN basket keys, so its
    * output is Σ items-per-basket² — bounded by the item vocabulary per
    * basket (small in practice: event types, tags), never corpus². Item
    * marginals derive from the same distinct frame and broadcast onto
    * the pair counts.
    */
  def associationRules(df: DataFrame, basketCols: Seq[String],
                       itemCol: String,
                       minBasketCount: Long = 1): DataFrame = {
    require(basketCols.nonEmpty, "need at least one basket column")
    // \u0001-joined key: plain concat would collide "ab"+"c" with "a"+"bc"
    val bi = df.select(
        concat_ws("\u0001", basketCols.map(col): _*).as("basket"),
        col(itemCol).as("item"))
      .distinct()
      .localCheckpoint() // pair join + marginals + total share it
    val n = bi.select(col("basket")).distinct().count().toDouble
    val marg = bi.groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairs = bi.join(
        bi.select(col("basket"), col("item").as("cons")), "basket")
      .where(col("item") =!= col("cons"))
      .groupBy(col("item").as("ante"), col("cons"))
      .agg(count(lit(1)).as("n_both"))
      .where(col("n_both") >= minBasketCount)
    pairs
      // marg is one row per distinct item — item-vocabulary scale, so no
      // broadcast hint; AQE promotes it when the catalog is small
      .join(marg.select(col("item").as("ante"),
        col("n_item").as("n_ante")), "ante")
      .join(marg.select(col("item").as("cons"),
        col("n_item").as("n_cons")), "cons")
      .select(col("ante"), col("cons"), col("n_both"),
        (col("n_both") / n).as("support"),
        (col("n_both") / col("n_ante")).as("confidence"),
        (col("n_both") * n / (col("n_ante") * col("n_cons"))).as("lift"))
  }

  /** CUPED variance reduction for an A/B metric (Deng et al., WSDM 2013):
    * regress the experiment-period metric `y` on a pre-period covariate
    * `x` that the treatment cannot have affected, and analyze the
    * adjusted metric y′ = y − θ·(x − x̄) with θ = cov(x,y)/var(x) — same
    * expected lift, variance shrunk by the covariate's explanatory power
    * (often 40-60 % for "same metric last week"), i.e. the experiment
    * reads significant in half the runtime.
    *
    * Input is one row per unit (user) with its variant, covariate and
    * metric. One pass of raw moments (Σx, Σy, Σxy, Σx², per-variant
    * conditional sums) computes θ, both variants' raw and adjusted means
    * and both variances — nothing ever shuffles twice. Degenerate
    * var(x) = 0 reports θ = 0 (adjustment is a no-op, never a NaN).
    * Returns ONE row: (n_a, n_b, theta, mean_a, mean_b, diff, adj_diff,
    * var_y, var_adj, var_reduction).
    */
  def cuped(df: DataFrame, variantCol: Column, xCol: String,
            yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val va = variantCol.cast("int") === 0
    val base = df.agg(
      count(lit(1)).as("__n"),
      sum(when(va, 1L).otherwise(0L)).as("n_a"),
      sum(when(va, 0L).otherwise(1L)).as("n_b"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * y).as("__sxy"), sum(x * x).as("__sxx"),
      sum(y * y).as("__syy"),
      sum(when(va, y).otherwise(0.0)).as("__sya"),
      sum(when(va, x).otherwise(0.0)).as("__sxa"))
      .withColumn("__varx",
        col("__sxx") / col("__n") -
          (col("__sx") / col("__n")) * (col("__sx") / col("__n")))
      .withColumn("theta",
        when(col("__varx") > 0,
          (col("__sxy") / col("__n") -
            (col("__sx") / col("__n")) * (col("__sy") / col("__n"))) /
            col("__varx")).otherwise(0.0))
    // adjusted means need only θ and the conditional sums already held:
    // mean(y′ | A) = (Σy_A − θ·Σx_A)/n_A + θ·x̄  (the +θx̄ cancels in the
    // A−B difference but keeps per-variant means interpretable)
    base
      .withColumn("__mx", col("__sx") / col("__n"))
      .withColumn("mean_a", col("__sya") / col("n_a"))
      .withColumn("mean_b",
        (col("__sy") - col("__sya")) / col("n_b"))
      .withColumn("adj_mean_a",
        (col("__sya") - col("theta") * col("__sxa")) / col("n_a") +
          col("theta") * col("__mx"))
      .withColumn("adj_mean_b",
        ((col("__sy") - col("__sya")) -
          col("theta") * (col("__sx") - col("__sxa"))) / col("n_b") +
          col("theta") * col("__mx"))
      .withColumn("var_y",
        col("__syy") / col("__n") -
          (col("__sy") / col("__n")) * (col("__sy") / col("__n")))
      // var(y − θx) = var(y) − 2θ·cov + θ²·var(x) = var(y) − θ²·var(x)
      .withColumn("var_adj",
        col("var_y") - col("theta") * col("theta") * col("__varx"))
      .withColumn("var_reduction",
        when(col("var_y") > 0,
          lit(1.0) - col("var_adj") / col("var_y")).otherwise(0.0))
      .select(col("n_a"), col("n_b"), col("theta"),
        col("mean_a"), col("mean_b"),
        (col("mean_a") - col("mean_b")).as("diff"),
        (col("adj_mean_a") - col("adj_mean_b")).as("adj_diff"),
        col("var_y"), col("var_adj"), col("var_reduction"))
  }

  /** Top-k CONSECUTIVE event paths of length `steps`: the sequential
    * sibling of [[transitionCounts]] (which only sees 2-grams) — every
    * run of `steps` back-to-back events inside a user's timeline becomes
    * one path string, counted by distinct users (support) and total
    * occurrences. The "what do users actually do in order" query that
    * association rules (basket, orderless) cannot answer.
    *
    * Shape for scale: ONE shuffle on the user key feeds all `steps−1`
    * `lead`s (a single per-user sort window — no self-joins, where the
    * textbook k-way sequence join shuffles the log k times), then a
    * path-keyed count aggregate; the bounded path domain (|event types|^
    * steps) makes the final top-k a TakeOrderedAndProject. Ordering ties
    * on `tsCol` break by `tieCol` so paths are a pure function of the
    * data. Returns `topK` rows: (path, n_users, n_occurrences), ordered
    * by support then path (a total order — the cut is deterministic).
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               tieCol: String, typeCol: String, steps: Int,
               topK: Int, sep: String = ">"): DataFrame = {
    require(steps >= 2, s"a path needs at least 2 steps: $steps")
    require(topK >= 1, s"topK must be positive: $topK")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val stepCols = (0 until steps).map { i =>
      if (i == 0) col(typeCol).as("__s0")
      else lead(col(typeCol), i).over(w).as(s"__s$i")
    }
    events
      .select(col(userCol).as("__u") +: stepCols: _*)
      .where((1 until steps).map(i => col(s"__s$i").isNotNull)
        .reduce(_ && _))
      .select(col("__u"),
        concat_ws(sep, (0 until steps).map(i => col(s"__s$i")): _*)
          .as("path"))
      // two-level aggregate instead of countDistinct: the per-(path,user)
      // partial collapses map-side, where a distinct-agg would expand
      // every row 2× before the shuffle
      .groupBy("path", "__u")
      .agg(count(lit(1)).as("__c"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_users"), sum("__c").as("n_occurrences"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(topK)
  }

  /** Markov removal-effect attribution — the principled sibling of
    * [[lastTouchAttribution]] and [[linearAttribution]]: build the
    * first-order Markov chain over user journeys (START → touches… →
    * CONV/NULL), estimate each channel's removal effect
    * `1 − P(conv | channel's state deleted) / P(conv)`, and credit
    * conversions proportionally. Position heuristics over- or
    * under-credit assist channels; the chain counts every path a channel
    * actually participates in.
    *
    * Journey semantics: touches strictly BEFORE the user's first
    * conversion (by `(tsCol, orderCol)`), in that order; converters with
    * no prior touch transition START → CONV directly; non-converters end
    * at NULL. Absorption probabilities use FIXED-ITERATION power steps
    * (`iters`, like pageRank/kmeans here) so results are deterministic
    * and SQL-replayable — the chain's defined output is the K-step value,
    * not the unconverged limit.
    *
    * Shape for scale: transition extraction is one user-keyed window over
    * pre-conversion touches plus user-keyed aggregates — the same budget
    * as sessionization. The chain itself is bounded by
    * (|touchTypes| + 3)² transition rows, a codebook-sized collect (the
    * kmeans-centroid budget); iteration runs on the driver over that
    * bounded matrix in sorted-state order, so replays are bit-stable.
    * Returns one row per touch type:
    * (touch_type, base_p, removal_effect, share, credited_conversions);
    * share/credits null when no channel has any effect.
    */
  def markovAttribution(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, orderCol: String,
                        conversionType: String, touchTypes: Seq[String],
                        iters: Int = 40): DataFrame = {
    val (prob, nConv) = journeyChain(events, userCol, tsCol, typeCol,
      orderCol, conversionType, touchTypes)
    val base = absorbP(prob, touchTypes, Set.empty, iters)
    val re = touchTypes.map(t =>
      t -> (if (base > 0)
        1.0 - absorbP(prob, touchTypes, Set(t), iters) / base
      else 0.0))
    val reSum = re.map(_._2).sum
    val s = events.sparkSession
    import s.implicits._
    re.map { case (t, r) =>
      val share = if (reSum > 0) Some(r / reSum) else None
      (t, base, r, share, share.map(_ * nConv))
    }.toDF("touch_type", "base_p", "removal_effect", "share",
      "credited_conversions")
  }

  /** Exact Shapley-value attribution over the [[markovAttribution]] chain:
    * each channel's credit is its average marginal contribution to the
    * chain's conversion probability across ALL 2^K channel subsets
    * (v(S) = absorption at CONV with every channel outside S blocked) —
    * the axiomatic answer to "who gets the conversion" where removal
    * effects are a heuristic normalization. Satisfies efficiency:
    * Σ shapley = v(all) − v(none) (asserted in spec), so credits are in
    * probability units; credited conversions scale by total conversions
    * over that same span.
    *
    * Cost: 2^K fixed-iteration absorptions over the collected bounded
    * transition matrix — driver-side arithmetic, invariant in corpus
    * size (K ≤ 8 enforced; the row-scale work is the same single
    * journey-extraction pass markovAttribution does). Returns one row
    * per channel: (touch_type, shapley, share, credited_conversions,
    * v_all, v_none).
    */
  def markovShapley(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, orderCol: String,
                    conversionType: String, touchTypes: Seq[String],
                    iters: Int = 40): DataFrame = {
    require(touchTypes.size <= 8, "Shapley is exact over 2^K chains; K ≤ 8")
    val (prob, nConv) = journeyChain(events, userCol, tsCol, typeCol,
      orderCol, conversionType, touchTypes)
    val k = touchTypes.size
    // v over subsets, memoized by bitmask (bit i = touchTypes(i) active)
    val v: Map[Int, Double] = (0 until (1 << k)).map { m =>
      val blocked = touchTypes.zipWithIndex
        .collect { case (t, i) if (m & (1 << i)) == 0 => t }.toSet
      m -> absorbP(prob, touchTypes, blocked, iters)
    }.toMap
    val fact = (1 to 8).scanLeft(1L)(_ * _) // fact(n) = n!, n ∈ 0..8
    val phi = touchTypes.zipWithIndex.map { case (t, i) =>
      val bit = 1 << i
      val contrib = (0 until (1 << k)).filter(m => (m & bit) == 0)
        .sortBy(identity).foldLeft(0.0) { (acc, m) =>
          val s = Integer.bitCount(m)
          val w = fact(s).toDouble * fact(k - 1 - s).toDouble / fact(k)
          acc + w * (v(m | bit) - v(m))
        }
      t -> contrib
    }
    val phiSum = phi.map(_._2).sum
    val s = events.sparkSession
    import s.implicits._
    phi.map { case (t, p) =>
      val share = if (phiSum > 0) Some(p / phiSum) else None
      (t, p, share, share.map(_ * nConv), v((1 << k) - 1), v(0))
    }.toDF("touch_type", "shapley", "share", "credited_conversions",
      "v_all", "v_none")
  }

  /** Journey transitions → (sorted transition probabilities, conversion
    * count). The collect is bounded by (|touchTypes| + 3)² transition
    * rows — the kmeans-centroid budget; see [[markovAttribution]].
    */
  private def journeyChain(events: DataFrame, userCol: String,
                           tsCol: String, typeCol: String, orderCol: String,
                           conversionType: String, touchTypes: Seq[String])
    : (Map[String, Seq[(String, Double)]], Double) = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      "touchTypes must be non-empty and exclude the conversion type")
    val scoped = events
      .where(col(typeCol).isin((touchTypes :+ conversionType): _*))
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(orderCol).as("__o"), col(typeCol).as("__t"))
    val firstConv = scoped.where(col("__t") === conversionType)
      .groupBy("__u")
      .agg(min(struct(col("__ts"), col("__o"))).as("__fc"))
    val touches = scoped.where(col("__t") =!= conversionType)
      .join(firstConv, Seq("__u"), "left")
      .where(col("__fc").isNull ||
        struct(col("__ts"), col("__o")) < col("__fc"))
    val w = Window.partitionBy("__u").orderBy("__ts", "__o")
    val touchTrans = touches
      .withColumn("__prev", lag("__t", 1).over(w))
      .select(coalesce(col("__prev"), lit(MkStart)).as("__from"),
        col("__t").as("__to"))
    val lastTouch = touches.groupBy("__u")
      .agg(max(struct(col("__ts"), col("__o"), col("__t"))).as("__lt"))
      .select(col("__u"), col("__lt.__t").as("__last"))
    val terminal = firstConv.select(col("__u"), lit(true).as("__conv"))
      .join(lastTouch, Seq("__u"), "full")
      .select(coalesce(col("__last"), lit(MkStart)).as("__from"),
        when(coalesce(col("__conv"), lit(false)), lit(MkConv))
          .otherwise(lit(MkNull)).as("__to"))
    val trans = touchTrans.unionByName(terminal)
      .groupBy("__from", "__to").agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val prob = trans.groupBy(_._1).map { case (f, rs) =>
      val tot = rs.map(_._3).sum.toDouble
      f -> rs.sortBy(_._2).map { case (_, t, c) => (t, c / tot) }.toSeq
    }
    (prob, trans.filter(_._2 == MkConv).map(_._3).sum.toDouble)
  }

  private val MkStart = "__START__"
  private val MkConv = "__CONV__"
  private val MkNull = "__NULL__"

  /** Fixed-iteration absorption probability from START with `blocked`
    * states pinned to 0 — deterministic sorted-order folds, so replays
    * are bit-stable (see [[markovAttribution]]).
    */
  private def absorbP(prob: Map[String, Seq[(String, Double)]],
                      touchTypes: Seq[String], blocked: Set[String],
                      iters: Int): Double = {
    require(iters >= 1 && iters <= 500, s"iters out of range: $iters")
    val transient = MkStart +: touchTypes
    var v = Map(MkConv -> 1.0).withDefaultValue(0.0)
    for (_ <- 1 to iters) {
      v = (transient.map { s =>
        s -> (if (blocked.contains(s)) 0.0
        else prob.getOrElse(s, Nil)
          .foldLeft(0.0) { case (a, (t, p)) => a + p * v(t) })
      }.toMap + (MkConv -> 1.0) + (MkNull -> 0.0)).withDefaultValue(0.0)
    }
    v(MkStart)
  }

  /** Weekly cohort lifetime value: users cohorted by the week of their
    * FIRST event (relative to the corpus's earliest event), value
    * accumulated by week offset since that first event — the "how much is
    * a week-N user worth by week K" curve retention charts only hint at.
    * Returns one row per (cohort_week, week_offset): cohort_size,
    * n_active (distinct users touching that offset), value, cum_value
    * (running by offset within the cohort) and ltv_per_user
    * (cum_value / cohort_size).
    *
    * Shape: one per-user first-event aggregate, one per-(cohort, offset)
    * cell aggregate, and a running sum whose window partitions hold at
    * most the TIMELINE's week count (offsets, never users or rows) — the
    * one place a plain window is scale-safe by construction.
    */
  def cohortLtv(df: DataFrame, userCol: String, tsCol: String,
                valueCol: String): DataFrame = {
    val e = df.select(col(userCol).as("__u"),
      col(tsCol).cast("long").as("__ep"),
      col(valueCol).cast("double").as("__v"))
    val m0 = e.agg(min("__ep").as("__m0"))
    val firsts = e.groupBy("__u").agg(min("__ep").as("__f"))
    val sizes = firsts.crossJoin(broadcast(m0))
      .groupBy(floor((col("__f") - col("__m0")) / 604800).as("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val cells = e.join(firsts, "__u").crossJoin(broadcast(m0))
      .groupBy(
        floor((col("__f") - col("__m0")) / 604800).as("cohort_week"),
        floor((col("__ep") - col("__f")) / 604800).as("week_offset"))
      .agg(countDistinct(col("__u")).as("n_active"),
        sum("__v").as("value"))
    cells.join(sizes, "cohort_week")
      .withColumn("cum_value", sum("value").over(
        Window.partitionBy("cohort_week").orderBy("week_offset")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ltv_per_user",
        col("cum_value") / col("cohort_size").cast("double"))
      .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
        col("n_active"), col("value"), col("cum_value"),
        col("ltv_per_user"))
  }

  /** RFM segmentation — the classic customer-value grid: per user,
    * Recency (days since last event, against the corpus's latest event),
    * Frequency (event count) and Monetary (value mass), each scored into
    * `numBuckets` equal-population tiers so segments read as "545"-style
    * codes. Scores orient so HIGHER is better on every axis (recent,
    * frequent, valuable → numBuckets).
    *
    * Tiering rides [[Splits.quantileBuckets]] — one global percentile
    * aggregate per axis broadcast back, bucketing scan-side — never an
    * `ntile()` global-sort window. Returns one row per user: (user,
    * recency_days, frequency, monetary, r_score, f_score, m_score,
    * segment).
    */
  def rfm(df: DataFrame, userCol: String, tsCol: String, valueCol: String,
          numBuckets: Int = 5): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be ≥ 2: $numBuckets")
    val e = df.select(col(userCol).as("user"),
      col(tsCol).cast("long").as("__ep"),
      col(valueCol).cast("double").as("__v"))
    val now = e.agg(max("__ep").as("__now"))
    val per = e.groupBy("user")
      .agg(max("__ep").as("__last"), count(lit(1)).as("frequency"),
        sum("__v").as("monetary"))
      .crossJoin(broadcast(now))
      .withColumn("recency_days",
        floor((col("__now") - col("__last")) / 86400))
      .drop("__now", "__last")
    val scored = Seq("recency_days" -> "__rb", "frequency" -> "__fb",
      "monetary" -> "__mb").foldLeft(per) { case (acc, (in, out)) =>
      Splits.quantileBuckets(acc, in, numBuckets)
        .withColumnRenamed("bucket", out)
    }
    scored.select(col("user"), col("recency_days"), col("frequency"),
        col("monetary"),
        (lit(numBuckets) - col("__rb")).as("r_score"),
        (col("__fb") + 1).as("f_score"),
        (col("__mb") + 1).as("m_score"))
      .withColumn("segment", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
  }

  /** Always-valid A/B monitoring (mixture SPRT, Robbins 1970 /
    * Johari et al. 2017): the peeking-safe alternative to [[abLift]]'s
    * fixed-horizon z — a per-period e-process that stays a valid test no
    * matter how often the dashboard looks. Per `binSeconds` bucket:
    * cumulative arm counts/conversions, the pooled-variance difference,
    * and the LOG mixture e-value
    * ln Λ_n = ½·ln(Vₙ/(Vₙ+τ)) + δₙ²·τ/(2·Vₙ·(Vₙ+τ)); `can_stop` fires
    * when ln Λ_n ≥ ln(1/α). Reported in log space deliberately — the raw
    * e-value overflows binary64 once the effect is decisive. Returns one
    * row per bin: (bin, n_a, n_b, conv_a, conv_b, p_a, p_b, diff,
    * log_e_value, can_stop); bins before both arms have data report a
    * null e-value.
    *
    * Shape: one per-bin aggregate (arm pivoted to columns), cumulative
    * counts from ONE [[operators.Ranks.running]] pass over the bin
    * domain, closed-form projections after — never a per-arm window or a
    * global sort.
    */
  def alwaysValidMonitor(df: DataFrame, armACol: Column, tsCol: String,
                         convCol: Column, binSeconds: Long,
                         tau: Double = 1e-4,
                         alpha: Double = 0.05): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    require(tau > 0, s"tau must be positive: $tau")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val conv = when(convCol, 1L).otherwise(0L)
    val per = df
      .groupBy(floor(col(tsCol).cast("long") / binSeconds).as("bin"))
      .agg(sum(when(armACol, 1L).otherwise(0L)).as("__na"),
        sum(when(!armACol, 1L).otherwise(0L)).as("__nb"),
        sum(when(armACol, conv).otherwise(0L)).as("__ca"),
        sum(when(!armACol, conv).otherwise(0L)).as("__cb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = col("conv_a") / na
    val pb = col("conv_b") / nb
    val pool = (col("conv_a") + col("conv_b")).cast("double") /
      (na + nb)
    val v = pool * (lit(1.0) - pool) * (lit(1.0) / na + lit(1.0) / nb)
    Ranks.running(per, Seq(col("bin")),
        sums = Seq("__na" -> "n_a", "__nb" -> "n_b",
          "__ca" -> "conv_a", "__cb" -> "conv_b"))
      .withColumn("p_a", pa)
      .withColumn("p_b", pb)
      .withColumn("diff", pa - pb)
      .withColumn("__v", v)
      .withColumn("log_e_value",
        when(col("n_a") > 0 && col("n_b") > 0 && col("__v") > 0,
          lit(0.5) * log(col("__v") / (col("__v") + tau)) +
            col("diff") * col("diff") * tau /
              (lit(2.0) * col("__v") * (col("__v") + tau))))
      .withColumn("can_stop",
        col("log_e_value") >= math.log(1.0 / alpha))
      .select(col("bin"), col("n_a"), col("n_b"), col("conv_a"),
        col("conv_b"), col("p_a"), col("p_b"), col("diff"),
        col("log_e_value"), col("can_stop"))
  }

  /** Sequential sample-ratio-mismatch guard —
    * [[graft.operators.Stats.sampleRatioMismatch]]'s anytime-valid
    * sibling, and the hygiene monitor that should run ALONGSIDE
    * [[alwaysValidMonitor]]: a fixed-horizon SRM χ² is only valid at one
    * pre-declared readout, but a broken splitter should page the moment
    * the evidence accumulates, under continuous peeking. Per bin:
    * cumulative arm counts, the realized share p̂_A = n_A/n, its
    * deviation from the declared allocation p₀, and the same mixture
    * e-process as [[alwaysValidMonitor]] on δ = p̂_A − p₀ with the
    * H0-exact binomial variance V = p₀(1−p₀)/n. `srm_detected` fires
    * when ln Λ ≥ ln(1/α) — at which point every downstream metric is
    * suspect and the experiment stops for triage, not for a winner.
    * Returns one row per bin: (bin, n_a, n_b, share_a, expected_share_a,
    * diff, log_e_value, srm_detected).
    *
    * Shape: one per-bin aggregate, ONE [[operators.Ranks.running]]
    * cumulative pass over the bin domain, closed-form projections after
    * — bins are the only rows past the first aggregate.
    */
  def alwaysValidSrm(df: DataFrame, armACol: Column, binCol: Column,
                     expectedShareA: Double, tau: Double = 1e-4,
                     alpha: Double = 0.05): DataFrame = {
    require(expectedShareA > 0 && expectedShareA < 1,
      s"expectedShareA must be in (0,1): $expectedShareA")
    require(tau > 0, s"tau must be positive: $tau")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val per = df.groupBy(binCol.as("bin"))
      .agg(sum(when(armACol, 1L).otherwise(0L)).as("__ba"),
        sum(when(!armACol, 1L).otherwise(0L)).as("__bb"))
    val n = (col("n_a") + col("n_b")).cast("double")
    val p0 = lit(expectedShareA)
    Ranks.running(per, Seq(col("bin")),
        sums = Seq("__ba" -> "n_a", "__bb" -> "n_b"))
      .withColumn("share_a", col("n_a") / n)
      .withColumn("diff", col("share_a") - p0)
      .withColumn("__v", p0 * (lit(1.0) - p0) / n)
      .withColumn("log_e_value",
        when(n > 0 && col("__v") > 0,
          lit(0.5) * log(col("__v") / (col("__v") + tau)) +
            col("diff") * col("diff") * tau /
              (lit(2.0) * col("__v") * (col("__v") + tau))))
      .withColumn("srm_detected",
        col("log_e_value") >= math.log(1.0 / alpha))
      .select(col("bin"), col("n_a"), col("n_b"), col("share_a"),
        p0.as("expected_share_a"), col("diff"), col("log_e_value"),
        col("srm_detected"))
  }

  /** Variance-reduced always-valid monitoring — [[alwaysValidMonitor]]
    * composed with [[cuped]], for a MEAN metric with a pre-experiment
    * covariate: at every bin the cumulative moments yield θ_t =
    * cov_t(x,y)/var_t(x), the adjusted difference
    * diff_adj = diff_raw − θ_t(x̄_A − x̄_B), the adjusted variance
    * var_adj = var(y) − θ_t²·var(x), and the same mixture e-process on
    * BOTH the raw and adjusted statistics — the point of the pairing
    * made visible: the adjusted e-value crosses ln(1/α) earlier by
    * exactly the covariate's explanatory power. θ_t is STRICTLY
    * PREDICTABLE: bin t's adjustment uses θ_{t−1}, fit on the EXCLUSIVE
    * prefix (bins < t; the first bin gets θ=0, i.e. no adjustment), so
    * the adjusted statistic never sees its own bin's outcomes and the
    * e-process's anytime validity holds exactly, not approximately.
    * Because θ_{t−1} is generally not the current-prefix OLS optimum,
    * var_adj uses the full quadratic var(y−θx) = var_y − 2θ·cov(x,y) +
    * θ²·var_x (which collapses to var_y − θ²·var_x only at the OLS θ).
    * x predates assignment, so the adjustment cannot inject treatment
    * signal. Returns one row per bin: (bin, n_a, n_b, theta,
    * diff_raw, diff_adj, var_y, var_adj, log_e_raw, log_e_adj,
    * can_stop) — can_stop gates on the ADJUSTED e-value.
    *
    * Shape: one per-bin conditional-moment aggregate (nine sums), the
    * [[Ranks.running]] cumulative pass (range-partitioned, no single-
    * partition window), then per-row scalar algebra — bins are the only
    * rows after the first aggregate, so nothing row-scale moves twice.
    */
  def alwaysValidCuped(df: DataFrame, armACol: Column, binCol: Column,
                       yCol: String, xCol: String,
                       tau: Double = 1e-4,
                       alpha: Double = 0.05): DataFrame = {
    require(tau > 0, s"tau must be positive: $tau")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    val y = col(yCol).cast("double")
    val x = col(xCol).cast("double")
    // per-bin aliases must NOT differ from the cumulative output names
    // by case alone ("__sxa" vs "__Sxa"): Spark's default
    // case-insensitive resolution makes running's withColumn REPLACE
    // the per-bin column, silently zeroing every lagged moment
    val per = df.groupBy(binCol.as("bin"))
      .agg(sum(when(armACol, 1L).otherwise(0L)).as("__na"),
        sum(when(!armACol, 1L).otherwise(0L)).as("__nb"),
        sum(when(armACol, y).otherwise(0.0)).as("__bya"),
        sum(when(!armACol, y).otherwise(0.0)).as("__byb"),
        sum(when(armACol, x).otherwise(0.0)).as("__bxa"),
        sum(when(!armACol, x).otherwise(0.0)).as("__bxb"),
        sum(y * y).as("__byy"), sum(x * x).as("__bxx"),
        sum(x * y).as("__bxy"))
    val run = Ranks.running(per, Seq(col("bin")),
      sums = Seq("__na" -> "n_a", "__nb" -> "n_b",
        "__bya" -> "__Sya", "__byb" -> "__Syb",
        "__bxa" -> "__Sxa", "__bxb" -> "__Sxb",
        "__byy" -> "__Syy", "__bxx" -> "__Sxx", "__bxy" -> "__Sxy"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = na + nb
    val sx = col("__Sxa") + col("__Sxb")
    val sy = col("__Sya") + col("__Syb")
    // exclusive-prefix (lagged) moments: cumulative minus the current
    // bin's own contribution — Ranks.running keeps the per-bin inputs,
    // so θ_{t−1} costs no extra window, just per-row subtraction
    val nL = (na - col("__na").cast("double")) +
      (nb - col("__nb").cast("double"))
    val sxL = sx - col("__bxa") - col("__bxb")
    val syL = sy - col("__bya") - col("__byb")
    val sxxL = col("__Sxx") - col("__bxx")
    val sxyL = col("__Sxy") - col("__bxy")
    def logE(diff: Column, v: Column): Column =
      when(col("n_a") > 0 && col("n_b") > 0 && v > 0,
        lit(0.5) * log(v / (v + tau)) +
          diff * diff * tau / (lit(2.0) * v * (v + tau)))
    run
      .withColumn("__varx", col("__Sxx") / n - (sx / n) * (sx / n))
      .withColumn("var_y", col("__Syy") / n - (sy / n) * (sy / n))
      .withColumn("__cov", col("__Sxy") / n - (sx / n) * (sy / n))
      .withColumn("__varxL",
        when(nL > 0, sxxL / nL - (sxL / nL) * (sxL / nL)).otherwise(0.0))
      .withColumn("theta",
        when(nL > 0 && col("__varxL") > 0,
          (sxyL / nL - (sxL / nL) * (syL / nL)) / col("__varxL"))
          .otherwise(0.0))
      .withColumn("diff_raw",
        col("__Sya") / na - col("__Syb") / nb)
      .withColumn("diff_adj",
        col("diff_raw") - col("theta") *
          (col("__Sxa") / na - col("__Sxb") / nb))
      .withColumn("var_adj",
        col("var_y") - lit(2.0) * col("theta") * col("__cov") +
          col("theta") * col("theta") * col("__varx"))
      .withColumn("__vr", col("var_y") * (lit(1.0) / na + lit(1.0) / nb))
      .withColumn("__va", col("var_adj") * (lit(1.0) / na + lit(1.0) / nb))
      .withColumn("log_e_raw", logE(col("diff_raw"), col("__vr")))
      .withColumn("log_e_adj", logE(col("diff_adj"), col("__va")))
      .withColumn("can_stop",
        col("log_e_adj") >= math.log(1.0 / alpha))
      .select(col("bin"), col("n_a"), col("n_b"), col("theta"),
        col("diff_raw"), col("diff_adj"), col("var_y"), col("var_adj"),
        col("log_e_raw"), col("log_e_adj"), col("can_stop"))
  }

  /** Difference-in-differences — [[cuped]]'s observational sibling: when
    * assignment was NOT randomized but both groups are observed before and
    * after the intervention, the treatment effect is the treated group's
    * pre→post change minus the control group's (parallel-trends
    * assumption). Input: one row per unit-period with its metric; `treated`
    * and `post` are boolean column expressions. Returns ONE row: the four
    * cell counts and means, both trends, `did`, and `se_did` (Welch-style:
    * √Σ s²ᵢ/nᵢ over the four cells — the two-way-fixed-effects OLS SE for
    * the 2×2 design).
    *
    * ONE partial-aggregable aggregate computes all four cells' moments —
    * conditional sums, same discipline as [[cuped]]; nothing shuffles
    * twice and nothing is row-scale after the scan.
    */
  def diffInDiff(df: DataFrame, treated: Column, post: Column,
                 yCol: String): DataFrame = {
    val y = col(yCol).cast("double")
    def cell(t: Boolean, p: Boolean, tag: String) = {
      val in = (if (t) treated else !treated) && (if (p) post else !post)
      Seq(sum(when(in, 1L).otherwise(0L)).as(s"n_$tag"),
        avg(when(in, y)).as(s"mean_$tag"),
        var_samp(when(in, y)).as(s"var_$tag"))
    }
    val aggs = cell(t = true, p = false, "t_pre") ++
      cell(t = true, p = true, "t_post") ++
      cell(t = false, p = false, "c_pre") ++
      cell(t = false, p = true, "c_post")
    df.agg(aggs.head, aggs.tail: _*)
      .withColumn("trend_treated", col("mean_t_post") - col("mean_t_pre"))
      .withColumn("trend_control", col("mean_c_post") - col("mean_c_pre"))
      .withColumn("did", col("trend_treated") - col("trend_control"))
      .withColumn("se_did", sqrt(
        col("var_t_pre") / col("n_t_pre") + col("var_t_post") / col("n_t_post") +
          col("var_c_pre") / col("n_c_pre") +
          col("var_c_post") / col("n_c_post")))
      .select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"),
        col("n_c_post"), col("mean_t_pre"), col("mean_t_post"),
        col("mean_c_pre"), col("mean_c_post"), col("trend_treated"),
        col("trend_control"), col("did"), col("se_did"))
  }
}

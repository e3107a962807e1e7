package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling for event streams — the standard prep step that
  * turns irregular logs/sensor data into fixed-interval training series.
  *
  * The reference's pipeline has no time-series surface (its date spines are
  * calendar dimensions, `adls_bikeshare_project_IsmaelDawuda.ipynb` cell
  * building `dim_date`); this extends the same spine idea to per-key
  * regular grids with gap fill.
  */
object Timeseries {

  /** Resample `df` onto a `stepSeconds`-regular grid per key:
    *
    *  1. bucket rows to their bin (epoch-second floor division) and
    *     aggregate observed values — ONE shuffle on (key, bin) with
    *     map-side partials;
    *  2. build each key's dense spine from a cheap per-key min/max
    *     aggregate with a TWO-LEVEL explode (4096-bin chunks, then bins
    *     within a chunk) — `sequence(lo, hi)` in one shot would build a
    *     key's entire range as one in-memory array in one task (a 3-key
    *     feed spanning years is tens of millions of elements); chunked,
    *     no array exceeds 4096 and chunks spread across partitions;
    *  3. left-join observations onto the spine (same (key, bin) keys the
    *     aggregate already shuffled on) and forward-fill gaps with a
    *     CHUNK-LEVEL carry: last(ignoreNulls) within each (key, chunk)
    *     (≤ 4096 rows per window partition), plus each chunk's carry-in —
    *     the last observed value of any earlier chunk — from a
    *     per-(key, chunk) summary table (chunks-per-key rows, tiny).
    *     The chunk id is DATA-derived (bin arithmetic), so both sides
    *     agree by construction — no range-partitioner sampling, no
    *     exchange-reuse dependency, and no per-key window putting a
    *     key's whole spine through one sort task.
    *
    * Returns (key, bin timestamp, n observed rows, v mean-of-bin or NULL,
    * v_ffill gap-filled). Bins before a key's first observation cannot
    * fill (no history) — by construction the spine starts at the first
    * observed bin, so `v_ffill` is never NULL.
    */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    val step = lit(stepSeconds)
    val binSec = (col(tsCol).cast("long") / step).cast("long") * step
    // pinned: the compact observed-bins table feeds the spine stats, the
    // spine join, and the chunk summaries — without the pin the events
    // scan + aggregate executes three times. Pinned BY KEY (pinBy, not a
    // plain localCheckpoint): HashPartitioning(key) satisfies the
    // ClusteredDistribution of every downstream consumer — the stats/obs
    // aggregates, the (key, bin) spine join, the (key, chunk) carry join
    // and both windows — so the whole fill runs exchange-free AND the
    // exploded spine (thousands of bins per pre-explode row) inherits the
    // key-spread layout instead of whatever AQE coalesced the tiny
    // pre-explode shuffle to (measured: the entire 12.5M-row spine ran as
    // ONE task per stage at sf0.1). Width = the session shuffle conf, the
    // cluster's scale knob.
    val binned = Pinning.pinByWith(
      df.groupBy(col(keyCol), timestamp_seconds(binSec).as("bin"))
        .agg(count(lit(1)).as("n"), avg(col(valueCol)).as("v")),
      df.sparkSession.sessionState.conf.numShufflePartitions,
      eager = false, keyCol)
    val chunkBins = 4096L
    val chunkSec = stepSeconds * chunkBins
    val stats = binned
      .groupBy(col(keyCol))
      .agg(unix_seconds(min("bin")).as("__lo"),
        unix_seconds(max("bin")).as("__hi"))
    val chunkSpine = stats
      .select(col(keyCol), col("__lo"), col("__hi"),
        explode(sequence(lit(0L),
          floor((col("__hi") - col("__lo")) / chunkSec).cast("long")))
          .as("__ci"))
    val spine = chunkSpine
      .select(col(keyCol), col("__ci"),
        (col("__lo") + col("__ci") * chunkSec).as("__cs"), col("__hi"))
      .select(col(keyCol), col("__ci"), explode(sequence(col("__cs"),
        least(col("__hi"), col("__cs") + (chunkBins - 1) * stepSeconds),
        step)).as("__bs"))
      .select(col(keyCol), col("__ci"),
        timestamp_seconds(col("__bs")).as("bin"))
    val joined = spine.join(binned, Seq(keyCol, "bin"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    // per-(key, chunk) carry-ins over the CHUNK spine (gap chunks with no
    // observation still need the last earlier value), computed from the
    // observed bins only — a chunks-per-key-sized table
    val wPrev = Window.partitionBy(keyCol).orderBy("__ci")
      .rowsBetween(Window.unboundedPreceding, -1)
    // no broadcast hint: stats is one row PER KEY — it scales with the
    // data (billions of keys at the 100 TB target would blow the
    // broadcast ceiling). AQE broadcasts it by itself when it is small.
    val obs = binned.join(stats, Seq(keyCol))
      .withColumn("__ci",
        floor((unix_seconds(col("bin")) - col("__lo")) / chunkSec)
          .cast("long"))
      .groupBy(col(keyCol), col("__ci"))
      .agg(max(when(col("v").isNotNull,
        struct(col("bin").as("b"), col("v").as("lv")))).as("__ls"))
    val carries = chunkSpine.join(obs, Seq(keyCol, "__ci"), "left")
      .withColumn("__cin",
        last(col("__ls"), ignoreNulls = true).over(wPrev).getField("lv"))
      .select(col(keyCol).as("__ck"), col("__ci").as("__cc"), col("__cin"))
    // chunk-local fill with the carry-in as fallback: every window
    // partition is (key, chunk) — at most 4096 rows, never a key's spine
    val wIn = Window.partitionBy(col(keyCol), col("__ci")).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same: carries is one row per (key, chunk) — keys-scale, never an
    // unconditional broadcast; the join keys match the spine join's
    // (key, chunk) so a shuffled join co-locates without extra exchanges
    joined.join(carries,
        col(keyCol) <=> col("__ck") && col("__ci") === col("__cc"))
      .withColumn("v_ffill",
        coalesce(last("v", ignoreNulls = true).over(wIn), col("__cin")))
      .drop("__ci", "__ck", "__cc", "__cin")
  }

  /** Rolling z-score anomaly detection: flag rows whose value deviates
    * from the trailing per-key window by more than `zThreshold` standard
    * deviations — the standard streaming-metrics outlier screen (and, on
    * a training corpus's per-source quality scores, the drift alarm).
    *
    * The window is `ROWS BETWEEN lookback PRECEDING AND 1 PRECEDING` over
    * `orderCols` WITHIN each key — strictly trailing, so a spike never
    * suppresses its own detection by inflating the baseline it is judged
    * against. Rows with fewer than `minPoints` trailing observations or a
    * zero trailing stddev are unjudgeable and never flagged.
    *
    * Shape for scale: one keyed window (shuffle on `keyCol`, per-key
    * sort) — no global sort, no self-join; avg/stddev over a ROWS frame
    * are O(1) per row in Spark's sliding-frame aggregation. `orderCols`
    * must make the per-key order total (e.g. ts + a unique id) or the
    * trailing frame is nondeterministic under ties.
    *
    * Returns the flagged rows: key, order columns, value, `mu`/`sigma`
    * (the trailing baseline) and `zscore`.
    */
  def rollingAnomalies(df: DataFrame, keyCol: String, orderCols: Seq[String],
                       valueCol: String, lookback: Int = 20,
                       zThreshold: Double = 3.0,
                       minPoints: Int = 5): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(lookback >= minPoints && minPoints >= 2,
      s"need lookback ≥ minPoints ≥ 2: $lookback / $minPoints")
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(-lookback, -1)
    df
      .withColumn("mu", avg(col(valueCol)).over(w))
      .withColumn("sigma", stddev_samp(col(valueCol)).over(w))
      .withColumn("__n", count(col(valueCol)).over(w))
      .where(col("__n") >= minPoints && col("sigma") > 0)
      .withColumn("zscore", (col(valueCol) - col("mu")) / col("sigma"))
      .where(abs(col("zscore")) > zThreshold)
      .drop("__n")
  }

  /** Finite-window exponentially-weighted moving average per key:
    * `y_t = Σ_{i=0..L} (1−α)^i · x_{t−i} / Σ_{i} (1−α)^i` over the
    * trailing `lookback` rows — the standard metric smoother, normalized
    * over the weights actually present so warm-up rows are unbiased
    * (pandas `ewm(adjust=True)` semantics, truncated at L where the
    * dropped tail mass is (1−α)^L).
    *
    * Shape for scale: ONE keyed window (shuffle on key, per-key sort on
    * `orderCols`); the trailing frame materializes as a ≤(L+1)-element
    * array via `collect_list` OVER the frame (frame order = sort order,
    * so `reverse` puts the current row at index 0) and the weighted fold
    * is a scan-side indexed-lambda HOF — O(L) per row, no self-join, no
    * global sort. The list column binds ONCE as a projection before the
    * HOF lambdas (the bind-once discipline: interpreted lambdas re-
    * evaluate referenced expressions per element).
    *
    * `orderCols` must totally order rows within a key (ts + unique id)
    * or the trailing frame is nondeterministic under ties.
    */
  def ewmaSmooth(df: DataFrame, keyCol: String, orderCols: Seq[String],
                 valueCol: String, alpha: Double,
                 lookback: Int): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    require(lookback >= 1, s"lookback must be ≥ 1: $lookback")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(-lookback, Window.currentRow)
    val decay = 1.0 - alpha
    df
      .withColumn("__xs",
        reverse(collect_list(col(valueCol).cast("double")).over(w)))
      .withColumn("ewma",
        aggregate(zip_with(col("__xs"),
            transform(col("__xs"), (_, i) => pow(lit(decay), i)),
            (x, wt) => x * wt),
          lit(0.0), (acc, t) => acc + t) /
          aggregate(transform(col("__xs"), (_, i) => pow(lit(decay), i)),
            lit(0.0), (acc, t) => acc + t))
      .drop("__xs")
  }

  /** Autocorrelation function of an event stream at lags 1..`maxLag` over a
    * `stepSeconds`-regular grid: the seasonality probe run before choosing
    * resample grain or drift windows. The series is the per-bin MEAN of
    * `valueCol` (empty bins are absent and simply never pair).
    *
    * acf(k) = Σ (x_t − μ)(x_{t+k} − μ) / Σ (x_t − μ)², with μ and the
    * denominator taken over the FULL series (the standard sample-ACF
    * normalization — one shared denominator, so acf(0) ≡ 1).
    *
    * Shape for scale: raw rows collapse to the bin grid in one shuffle
    * (bounded by time-range/step, not row count); each lag is an equi-join
    * of the bin table against itself shifted by k·step — `maxLag` joins of
    * bin-table size, driven by one exploded lag column, with μ and the
    * denominator broadcast as scalars. Nothing row-scale is touched after
    * the first aggregate. Returns (lag, n_pairs, acf).
    */
  def autocorrelation(df: DataFrame, tsCol: String, valueCol: String,
                      stepSeconds: Long, maxLag: Int): DataFrame = {
    require(stepSeconds > 0 && maxLag >= 1)
    val bin = (col(tsCol).cast("long") / stepSeconds).cast("long")
    val series = df.groupBy(bin.as("__bin"))
      .agg(avg(col(valueCol)).as("__x"))
    val mom = series.agg(avg("__x").as("__mu"),
      sum(col("__x") * col("__x")).as("__sxx"),
      count(lit(1)).cast("double").as("__n"))
    val lags = series.crossJoin(broadcast(mom))
      .select(col("__bin"), (col("__x") - col("__mu")).as("__c"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
    val shifted = series.crossJoin(broadcast(mom))
      .select(col("__bin").as("__bin2"), (col("__x") - col("__mu")).as("__c2"))
    lags
      .join(shifted, lags("__bin") + col("lag") === col("__bin2"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__c") * col("__c2")).as("__num"))
      .crossJoin(broadcast(mom.select(
        (col("__sxx") - col("__n") * col("__mu") * col("__mu"))
          .as("__den"))))
      .withColumn("acf",
        when(col("__den") > 0, col("__num") / col("__den")).otherwise(0.0))
      .select(col("lag"), col("n_pairs"), col("acf"))
  }

  /** Additive seasonal decomposition on a `binSeconds` grid with a period
    * of `periodBins` bins: observed (per-bin mean) = seasonal (mean of the
    * bin's period position) + residual. The classical
    * seasonal-subseries estimate — the prep step behind deseasonalized
    * drift monitors and the q206 anomaly screen.
    *
    * Scale shape: raw rows collapse to the bin grid in ONE shuffle; the
    * seasonal component is a window mean PARTITIONED by period position
    * (≤ periodBins partitions of grid-sized rows — the grid, not the
    * corpus, pays the window). Returns (bin, pos, observed, seasonal,
    * residual).
    */
  def seasonalDecompose(df: DataFrame, tsCol: String, valueCol: String,
                        binSeconds: Long, periodBins: Int): DataFrame = {
    require(binSeconds > 0 && periodBins > 1)
    val bin = (col(tsCol).cast("long") / binSeconds).cast("long")
    val series = df.groupBy(bin.as("bin"))
      .agg(avg(col(valueCol)).as("observed"))
      .withColumn("pos", (col("bin") % periodBins).cast("int"))
    val w = Window.partitionBy("pos")
    series
      .withColumn("seasonal", avg(col("observed")).over(w))
      .withColumn("residual", col("observed") - col("seasonal"))
      .select("bin", "pos", "observed", "seasonal", "residual")
  }

  /** Trend / seasonal strength (Hyndman's F_T, F_S) — the one-row triage
    * that says whether a series is worth decomposing at all:
    * F_T = max(0, 1 − var(R)/var(observed − S)) and
    * F_S = max(0, 1 − var(R)/var(detrended)), with the trend a centered
    * OLS line over the bin grid ([[olsTrend]]'s algebra), the seasonal
    * component the period-position means of the DETRENDED series
    * ([[seasonalDecompose]]'s estimate), and R the remainder. A strength
    * near 1 means the component explains almost all of its layer's
    * variance; a zero-variance denominator (e.g. no trend AND no noise)
    * reports null rather than inventing a strength.
    *
    * Scale shape: raw rows collapse to the bin grid in one shuffle; every
    * later step is grid-sized (scalar moment broadcasts, a ≤periodBins-
    * partition window, one final aggregate). Variances are explicit
    * avg(x²) − avg(x)² so the algebra replays in SQL. Returns ONE row:
    * (n_bins, var_obs, var_detrended, var_remainder, trend_strength,
    * seasonal_strength).
    */
  def componentStrengths(df: DataFrame, tsCol: String, valueCol: String,
                         binSeconds: Long, periodBins: Int): DataFrame = {
    require(binSeconds > 0 && periodBins > 1)
    val bin = (col(tsCol).cast("long") / binSeconds).cast("long")
    val grid = df.groupBy(bin.as("bin"))
      .agg(avg(col(valueCol).cast("double")).as("obs"))
      .withColumn("pos", (col("bin") % periodBins).cast("int"))
    val g = grid.crossJoin(broadcast(grid.agg(min("bin").as("__b0"))))
      .withColumn("__x", (col("bin") - col("__b0")).cast("double"))
    val fit = g.agg(count(lit(1)).cast("double").as("__n"),
        sum("__x").as("__sx"), sum("obs").as("__sy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("obs")).as("__sxy"))
      .withColumn("__dxx",
        col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("slope", when(col("__dxx") > 0,
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          col("__dxx")).otherwise(0.0))
      .withColumn("icept",
        (col("__sy") - col("slope") * col("__sx")) / col("__n"))
      .select("slope", "icept")
    val comp = g.crossJoin(broadcast(fit))
      .withColumn("det",
        col("obs") - (col("icept") + col("slope") * col("__x")))
      .withColumn("seasonal",
        avg(col("det")).over(Window.partitionBy("pos")))
      .withColumn("rem", col("det") - col("seasonal"))
      .withColumn("deseas", col("obs") - col("seasonal"))
    def varOf(c: String): Column =
      (avg(col(c) * col(c)) - avg(col(c)) * avg(col(c))).as(s"var_$c")
    comp.agg(count(lit(1)).as("n_bins"), varOf("obs"), varOf("det"),
        varOf("rem"), varOf("deseas"))
      .withColumn("trend_strength", when(col("var_deseas") > 0,
        greatest(lit(0.0), lit(1.0) - col("var_rem") / col("var_deseas"))))
      .withColumn("seasonal_strength", when(col("var_det") > 0,
        greatest(lit(0.0), lit(1.0) - col("var_rem") / col("var_det"))))
      .select(col("n_bins"), col("var_obs").as("var_obs"),
        col("var_det").as("var_detrended"),
        col("var_rem").as("var_remainder"),
        col("trend_strength"), col("seasonal_strength"))
  }

  /** Seasonally-adjusted anomaly screen: z-score each bin against the
    * mean/σ_pop of ITS period position (hour-of-day bins compare to the
    * same hour, so a nightly lull is not an anomaly and a nightly spike
    * is). Rows with |z| ≥ `zThreshold` flag; z compares 6dp-rounded so an
    * engine-boundary ulp can't flip membership. Same grid shape as
    * [[seasonalDecompose]]. Returns flagged bins only: (bin, pos,
    * observed, z).
    */
  def seasonalAnomalies(df: DataFrame, tsCol: String, valueCol: String,
                        binSeconds: Long, periodBins: Int,
                        zThreshold: Double): DataFrame = {
    require(binSeconds > 0 && periodBins > 1)
    val bin = (col(tsCol).cast("long") / binSeconds).cast("long")
    val series = df.groupBy(bin.as("bin"))
      .agg(avg(col(valueCol)).as("observed"))
      .withColumn("pos", (col("bin") % periodBins).cast("int"))
    val w = Window.partitionBy("pos")
    series
      .withColumn("__mu", avg(col("observed")).over(w))
      .withColumn("__sd", stddev_pop(col("observed")).over(w))
      .where(col("__sd") > 0)
      .withColumn("z", round((col("observed") - col("__mu")) / col("__sd"), 6))
      .where(abs(col("z")) >= zThreshold)
      .select("bin", "pos", "observed", "z")
  }

  /** Two-sided CUSUM change-point statistic per key over a `binSeconds`
    * grid: the standardized per-bin mean is drifted by `kSigma` (the
    * slack) and accumulated through S_i = max(0, S_{i-1} + d_i) in both
    * directions; bins where either side exceeds `hSigma` flag a level
    * shift.
    *
    * The recursion is NOT window-expressible directly, but its closed
    * form is: S_i = P_i − min(0, min_{j≤i} P_j) with P the prefix sum of
    * the drifted deviations — one running sum + one running min per
    * direction, both over the key-partitioned bin grid (the q174
    * grid-bound window budget; a per-row formulation would sort the
    * corpus). μ/σ_pop are per-key window scalars over the same grid.
    * Returns (key, bin, x, s_pos, s_neg, change) for every bin.
    */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
            binSeconds: Long, kSigma: Double, hSigma: Double): DataFrame = {
    require(binSeconds > 0 && kSigma >= 0 && hSigma > 0)
    val bin = (col(tsCol).cast("long") / binSeconds).cast("long")
    val series = df.groupBy(col(keyCol).as("key"), bin.as("bin"))
      .agg(avg(col(valueCol)).as("x"))
    val wAll = Window.partitionBy("key")
    val wRun = Window.partitionBy("key").orderBy("bin")
    series
      .withColumn("__mu", avg(col("x")).over(wAll))
      .withColumn("__sd", stddev_pop(col("x")).over(wAll))
      .where(col("__sd") > 0)
      .withColumn("__dp", (col("x") - col("__mu")) / col("__sd") - kSigma)
      .withColumn("__dn", -(col("x") - col("__mu")) / col("__sd") - kSigma)
      .withColumn("__pp", sum(col("__dp")).over(wRun))
      .withColumn("__pn", sum(col("__dn")).over(wRun))
      .withColumn("s_pos",
        round(col("__pp") - least(lit(0.0), min(col("__pp")).over(wRun)), 6))
      .withColumn("s_neg",
        round(col("__pn") - least(lit(0.0), min(col("__pn")).over(wRun)), 6))
      .withColumn("change",
        (col("s_pos") > hSigma || col("s_neg") > hSigma).cast("int"))
      .select("key", "bin", "x", "s_pos", "s_neg", "change")
  }

  /** Seasonal-naive forecast backtest: forecast each bin as the observed
    * value one season earlier (f(b) = o(b − period)), score with sMAPE
    * per expanding fold — the baseline every fancier forecaster must
    * beat, and the backtest harness that says WHERE (which fold, i.e.
    * which regime) it wins or loses. Folds split the bin timeline into
    * `folds` equal spans; the first season (no prior season to forecast
    * from) is excluded by construction, not scored as a miss.
    *
    * All work is on the bounded bin grid: one (key, bin) aggregate over
    * the fact, a per-key LAG over bins for the forecast, fold assignment
    * by pure arithmetic on the bin index (no ntile — fold edges derive
    * from the key's min/max bin, a per-key scalar), and one (key, fold)
    * aggregate for the score. Returns (key, fold, n_scored, smape).
    */
  def backtestSeasonalNaive(df: DataFrame, keyCol: String, tsCol: String,
                            valueCol: String, binSeconds: Long,
                            periodBins: Int, folds: Int): DataFrame = {
    require(binSeconds > 0 && periodBins >= 1 && folds >= 1)
    val bins = df
      .groupBy(col(keyCol).as("__k"),
        floor(unix_timestamp(col(tsCol)) / binSeconds).as("__b"))
      .agg(avg(col(valueCol).cast("double")).as("__o"))
    val ext = Window.partitionBy("__k")
    bins
      // lag(period) is positional; seasonal-naive needs the bin EXACTLY
      // one period back, so gaps must not shift the season — join on the
      // bin key instead of a positional lag
      .join(bins.select(col("__k"), (col("__b") + periodBins).as("__b"),
        col("__o").as("__f")), Seq("__k", "__b"), "left")
      .withColumn("__lo", min("__b").over(ext))
      .withColumn("__hi", max("__b").over(ext))
      .withColumn("fold",
        least(lit(folds - 1), floor((col("__b") - col("__lo")) * folds /
          (col("__hi") - col("__lo") + 1))).cast("int"))
      .where(col("__f").isNotNull &&
        (abs(col("__f")) + abs(col("__o"))) > 0)
      .groupBy(col("__k").as(keyCol), col("fold"))
      .agg(count(lit(1)).as("n_scored"),
        avg(lit(2.0) * abs(col("__f") - col("__o")) /
          (abs(col("__f")) + abs(col("__o")))).as("smape"))
  }

  /** Exact percentile bands per (key, time bin) — the p50/p90/p99
    * latency chart. Percentiles use the LOWER-value-at-rank convention
    * (smallest quantized value whose cumulative count reaches ⌈p·n⌉),
    * computed rank-family style over each bin's bounded value domain:
    * per-(key, bin, value) counts, a running-sum window, then ONE
    * conditional-min aggregate emits every requested band — no sort of
    * raw rows, no percentile buffer, and the convention replays exactly
    * in SQL. `percentiles` are integer percents (50, 90, 99 → columns
    * p50, p90, p99). Returns (key, bin, n, p<…>...).
    */
  def percentileBands(df: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String, binSeconds: Long,
                      percentiles: Seq[Int] = Seq(50, 90, 99),
                      roundTo: Int = 6): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    require(percentiles.nonEmpty &&
      percentiles.forall(p => p >= 1 && p <= 100), s"percents in [1,100]")
    val per = df
      .groupBy(col(keyCol).as("__k"),
        floor(unix_timestamp(col(tsCol)) / binSeconds).as("__b"),
        round(col(valueCol).cast("double"), roundTo).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("__k", "__b").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("__k", "__b")
    val ranked = per
      .withColumn("__cum", sum("__c").over(w))
      .withColumn("__n", sum("__c").over(tot))
    val bands = percentiles.map(p =>
      min(when(col("__cum") >= ceil(lit(p / 100.0) * col("__n")),
        col("__v"))).as(s"p$p"))
    ranked.groupBy(col("__k").as(keyCol), col("__b").as("bin"))
      .agg(max("__n").as("n"), bands: _*)
  }

  /** Per-key OLS trend over a declared grain — the least-squares sibling
    * of [[theilSenTrend]] (use OLS when the bins are trusted and you
    * also want fit quality; Theil–Sen when a corrupted bin must not move
    * the slope). Series are binned like every operator in this family
    * (per-bin avg, quantized to `roundTo` so the moment algebra replays
    * bit-for-bit in SQL), then slope/intercept/R² come from ONE moment
    * aggregate per key — five sums over the bounded bin set, no window
    * over raw rows, no matrix. x is the bin offset from the key's FIRST
    * bin, which is both the interpretable origin (intercept = fitted
    * value at the series start, slope = change per bin) and the
    * numerically necessary one: raw epoch-grain indices (~2×10⁴ for
    * days) put n·Σx² and (Σx)² at ~10¹¹ and their cancellation eats six
    * significant digits of the intercept. Keys with a single bin (or
    * zero x-variance) return null slope/intercept; constant-y keys
    * return null r2 (0/0 — fit quality of a flat line is undefined, not
    * perfect). Returns (key, n_bins, bin0, slope, intercept, r2).
    */
  def olsTrend(df: DataFrame, keyCol: String, tsCol: String,
               valueCol: String, binSeconds: Long,
               roundTo: Int = 6): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val bins = df
      .groupBy(col(keyCol).as("__k"),
        floor(unix_timestamp(col(tsCol)) / binSeconds).as("__b"))
      .agg(round(avg(col(valueCol).cast("double")), roundTo).as("__v"))
      .withColumn("__b0", min("__b").over(Window.partitionBy("__k")))
    val x = (col("__b") - col("__b0")).cast("double")
    val m = bins.groupBy(col("__k").as(keyCol))
      .agg(count(lit(1)).as("n_bins"), min("__b0").as("bin0"),
        sum(x).as("__sx"), sum(col("__v")).as("__sy"),
        sum(x * x).as("__sxx"),
        sum(col("__v") * col("__v")).as("__syy"),
        sum(x * col("__v")).as("__sxy"))
    val n = col("n_bins").cast("double")
    val dxx = n * col("__sxx") - col("__sx") * col("__sx")
    val dyy = n * col("__syy") - col("__sy") * col("__sy")
    val dxy = n * col("__sxy") - col("__sx") * col("__sy")
    m.withColumn("slope", when(dxx > 0, dxy / dxx))
      .withColumn("intercept",
        when(dxx > 0, (col("__sy") - col("slope") * col("__sx")) / n))
      .withColumn("r2", when(dxx > 0 && dyy > 0, dxy * dxy / (dxx * dyy)))
      .select(keyCol, "n_bins", "bin0", "slope", "intercept", "r2")
  }

  /** Theil–Sen robust trend per key: bin the series to a declared grain,
    * then slope = median over ALL bin-pair slopes (vⱼ−vᵢ)/(binⱼ−binᵢ)
    * and intercept = median of (vᵢ − slope·binᵢ) — the trend estimator a
    * single corrupted day cannot move (OLS's breakdown point is one
    * outlier; Theil–Sen tolerates ~29 %). The metric-drift slope to put
    * on a dashboard fed by flaky telemetry.
    *
    * The pair set is BINS², not rows² — the declared grain bounds it
    * (a year of dailies = 66k pairs per key) — via one per-key bin
    * aggregate and a key-local self-join; medians are exact interpolated
    * percentiles over the bounded pair set. Returns one row per key:
    * (key, n_bins, slope, intercept).
    */
  def theilSenTrend(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, binSeconds: Long): DataFrame = {
    require(binSeconds > 0, s"binSeconds must be positive: $binSeconds")
    val bins = df
      .groupBy(col(keyCol).as("__k"),
        floor(unix_timestamp(col(tsCol)) / binSeconds).as("__b"))
      .agg(avg(col(valueCol).cast("double")).as("__v"))
      .localCheckpoint() // pair join + the intercept pass share it
    val slopes = bins.alias("a")
      .join(bins.alias("b"),
        col("a.__k") === col("b.__k") && col("b.__b") > col("a.__b"))
      .select(col("a.__k").as("__k"),
        ((col("b.__v") - col("a.__v")) /
          (col("b.__b") - col("a.__b")).cast("double")).as("__s"))
      .groupBy("__k")
      .agg(percentile(col("__s"), lit(0.5)).as("slope"))
    // slopes is one row per key — keys-scale, so no broadcast hint;
    // AQE promotes it to broadcast when the key count is actually small
    bins.join(slopes, Seq("__k"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n_bins"), first(col("slope")).as("slope"),
        percentile(col("__v") - col("slope") * col("__b"), lit(0.5))
          .as("intercept"))
      .select(col("__k").as(keyCol), col("n_bins"), col("slope"),
        col("intercept"))
  }
}

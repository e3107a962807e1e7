package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Timeseries

class TimeseriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("resampleFfill: dense grid, bin means, forward fill across gaps") {
    // user a: observations in bins 0, 0, and 3 (of a 60 s grid) — bins 1-2
    // are gaps; user b: a single observation → a single-bin spine
    val df = Seq(
      ("a", ts("2024-01-01 00:00:10"), 10.0),
      ("a", ts("2024-01-01 00:00:50"), 20.0),
      ("a", ts("2024-01-01 00:03:05"), 40.0),
      ("b", ts("2024-01-01 02:00:00"), 7.0))
      .toDF("k", "t", "v")
    val got = Timeseries.resampleFfill(df, "k", "t", "v", stepSeconds = 60L)
      .orderBy("k", "bin")
      .select("k", "n", "v", "v_ffill")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getDouble(3)))
    assert(got.toSeq === Seq(
      ("a", 2L, Some(15.0), 15.0),   // mean of the two bin-0 rows
      ("a", 0L, None, 15.0),         // gap: carried forward
      ("a", 0L, None, 15.0),
      ("a", 1L, Some(40.0), 40.0),
      ("b", 1L, Some(7.0), 7.0)))
  }

  test("resampleFfill: spine is keyed — no key bleeds into another's range") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1.0),
      ("b", ts("2024-06-01 00:00:00"), 2.0)) // half a year apart
      .toDF("k", "t", "v")
    val got = Timeseries.resampleFfill(df, "k", "t", "v", stepSeconds = 3600L)
    // a global spine would explode to thousands of rows here
    assert(got.count() === 2)
    assert(got.where($"v_ffill".isNull).count() === 0)
  }

  test("resampleFfill: bin boundary rows land in their own bin") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:59"), 1.0),
      ("a", ts("2024-01-01 00:01:00"), 3.0)) // exactly on the boundary
      .toDF("k", "t", "v")
    val got = Timeseries.resampleFfill(df, "k", "t", "v", stepSeconds = 60L)
      .orderBy("bin").select("v").as[Double].collect().toSeq
    assert(got === Seq(1.0, 3.0))
  }

  private def anomalyRows(vals: Seq[Double], lookback: Int = 20,
                          z: Double = 3.0): Seq[(Int, Double)] = {
    val df = vals.zipWithIndex
      .map { case (v, i) => ("k", i, v) }.toDF("k", "i", "v")
    Timeseries.rollingAnomalies(df, "k", Seq("i"), "v",
        lookback = lookback, zThreshold = z, minPoints = 5)
      .orderBy("i").select("i", "zscore").as[(Int, Double)].collect().toSeq
  }

  test("rollingAnomalies: a spike over a varying baseline is flagged") {
    // alternating 9/11 baseline (sigma ≈ 1), one 100 — only the spike trips
    val base = Seq.tabulate(30)(i => if (i % 2 == 0) 9.0 else 11.0)
    val got = anomalyRows(base ++ Seq(100.0) ++ base.take(5))
    assert(got.map(_._1) === Seq(30))
    assert(got.head._2 > 50)
  }

  test("rollingAnomalies: strictly-trailing frame — the spike cannot " +
    "suppress itself, and post-spike rows are judged against it") {
    // after the spike enters the lookback window the baseline sigma
    // explodes, so ordinary rows right after it must NOT be flagged
    val base = Seq.tabulate(30)(i => if (i % 2 == 0) 9.0 else 11.0)
    val got = anomalyRows(base ++ Seq(100.0) ++ base.take(10))
    assert(got.map(_._1) === Seq(30)) // the spike and nothing else
  }

  test("rollingAnomalies: warm-up rows below minPoints are never judged") {
    // huge jump at row 3 — still unjudgeable (only 3 trailing points)
    val got = anomalyRows(Seq(9.0, 11.0, 9.0, 1000.0, 9.0, 11.0, 9.0, 11.0))
    assert(got.isEmpty)
  }

  test("rollingAnomalies: a constant baseline (sigma 0) never flags") {
    val got = anomalyRows(Seq.fill(25)(10.0) ++ Seq(100.0))
    assert(got.isEmpty)
  }

  test("autocorrelation: alternating series — closed-form ACF signs") {
    import org.apache.spark.sql.functions.timestamp_seconds
    // x_t = (-1)^t over 6 one-second bins: μ = 0 exactly, Σx² = 6;
    // lag 1 → 5 pairs of −1 → −5/6; lag 2 → 4 pairs of +1 → 4/6
    val rows = (0 until 6)
      .map(i => (i.toLong, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("sec", "value")
      .select(timestamp_seconds($"sec").as("ts"), $"value")
    val acf = Timeseries.autocorrelation(rows, "ts", "value",
        stepSeconds = 1, maxLag = 2)
      .orderBy("lag").collect()
    assert(acf.map(_.getAs[Long]("n_pairs")).toSeq === Seq(5L, 4L))
    assert(math.abs(acf(0).getAs[Double]("acf") - (-5.0 / 6)) < 1e-12)
    assert(math.abs(acf(1).getAs[Double]("acf") - 4.0 / 6) < 1e-12)
  }

  test("ewmaSmooth: closed-form weights, per-key isolation") {
    import org.apache.spark.sql.functions.timestamp_seconds
    val rows = Seq((1L, 0L, 0.0), (1L, 1L, 1.0), (2L, 0L, 5.0))
      .toDF("k", "sec", "value")
      .select($"k", timestamp_seconds($"sec").as("ts"),
        $"sec".as("event_id"), $"value")
    val got = Timeseries.ewmaSmooth(rows, "k", Seq("ts", "event_id"),
        "value", alpha = 0.5, lookback = 10)
      .orderBy("k", "ts").collect()
    // key 1 row 1: frame [0]: ewma 0; row 2: rev [1,0], w [1,.5]
    assert(got(0).getAs[Double]("ewma") === 0.0)
    assert(math.abs(got(1).getAs[Double]("ewma") - 1.0 / 1.5) < 1e-12)
    // key 2 never sees key 1's history
    assert(got(2).getAs[Double]("ewma") === 5.0)
  }

  test("ewmaSmooth: constant series is a fixed point; lookback truncates") {
    import org.apache.spark.sql.functions.timestamp_seconds
    val rows = (0 until 30).map(i => (1L, i.toLong, 7.0))
      .toDF("k", "sec", "value")
      .select($"k", timestamp_seconds($"sec").as("ts"),
        $"sec".as("event_id"), $"value")
    val got = Timeseries.ewmaSmooth(rows, "k", Seq("ts", "event_id"),
        "value", alpha = 0.3, lookback = 5)
      .select("ewma").collect().map(_.getDouble(0))
    assert(got.forall(v => math.abs(v - 7.0) < 1e-12))
  }

  test("autocorrelation: in-bin rows average before lagging") {
    import org.apache.spark.sql.functions.timestamp_seconds
    // two rows land in bin 0 (mean 1.0); bins 1,2 hold one row each —
    // identical to the pre-averaged 3-bin series
    val raw = Seq((0L, 0.5), (0L, 1.5), (1L, -1.0), (2L, 1.0))
      .toDF("sec", "value")
      .select(timestamp_seconds($"sec").as("ts"), $"value")
    val pre = Seq((0L, 1.0), (1L, -1.0), (2L, 1.0))
      .toDF("sec", "value")
      .select(timestamp_seconds($"sec").as("ts"), $"value")
    val a = Timeseries.autocorrelation(raw, "ts", "value", 1, 1).head()
    val b = Timeseries.autocorrelation(pre, "ts", "value", 1, 1).head()
    assert(a.getAs[Long]("n_pairs") === b.getAs[Long]("n_pairs"))
    assert(math.abs(a.getAs[Double]("acf") - b.getAs[Double]("acf")) < 1e-12)
  }

  test("seasonalDecompose: recovers a planted period, identity holds") {
    import org.apache.spark.sql.functions.timestamp_seconds
    // 4 days of hourly values: value = pos (pure seasonality, zero residual)
    val rows = (0 until 96).map(i => (i * 3600L, (i % 24).toDouble))
      .toDF("sec", "value")
      .select(timestamp_seconds($"sec").as("ts"), $"value")
    val got = Timeseries.seasonalDecompose(rows, "ts", "value", 3600L, 24)
      .collect()
    assert(got.length === 96)
    assert(got.forall(r => math.abs(r.getAs[Double]("residual")) < 1e-12))
    assert(got.forall(r =>
      math.abs(r.getAs[Double]("seasonal") - r.getAs[Int]("pos")) < 1e-12))
    // identity: observed = seasonal + residual, exactly as computed
    assert(got.forall(r => r.getAs[Double]("observed") ===
      r.getAs[Double]("seasonal") + r.getAs[Double]("residual")))
  }

  test("seasonalAnomalies: spike vs own-hour baseline flags; lull hour doesn't") {
    import org.apache.spark.sql.functions.timestamp_seconds
    // hour 3 is a quiet hour (value 1) except day 9 spikes to 2;
    // hour 5 is always loud (value 100) — loud-but-normal must NOT flag
    val rows = (0 until 240).map { i =>
      val pos = i % 24
      val v = if (pos == 3 && i / 24 == 9) 2.0
              else if (pos == 3) 1.0
              else if (pos == 5) 100.0
              else 10.0
      (i * 3600L, v)
    }.toDF("sec", "value")
      .select(timestamp_seconds($"sec").as("ts"), $"value")
    val got = Timeseries.seasonalAnomalies(rows, "ts", "value", 3600L, 24, 2.0)
      .collect()
    assert(got.length === 1)
    assert(got.head.getAs[Int]("pos") === 3)
    assert(got.head.getAs[Long]("bin") === 9L * 24 + 3)
  }

  test("cusum: closed form equals the recursion; shift detected, stationary not") {
    import org.apache.spark.sql.functions.timestamp_seconds
    // key "a": level shift at day 20 (0 → 3); key "b": alternating (stationary)
    val rows = (0 until 40).flatMap { d =>
      Seq(("a", d * 86400L, if (d >= 20) 3.0 else 0.0),
        ("b", d * 86400L, if (d % 2 == 0) 1.0 else -1.0))
    }.toDF("k", "sec", "value")
      .select($"k", timestamp_seconds($"sec").as("ts"), $"value")
    val got = Timeseries.cusum(rows, "k", "ts", "value", 86400L, 0.5, 4.0)
      .orderBy("key", "bin").collect()
    val a = got.filter(_.getAs[String]("key") == "a")
    val b = got.filter(_.getAs[String]("key") == "b")
    // global μ=1.5 splits the shifted series: the EARLY regime is 1σ below
    // the mean, so the downward side accumulates from bin 0 and fires
    // first (two-sided CUSUM semantics); the upward side fires after the
    // shift. Both flag `change`, on opposite sides.
    assert(a.take(4).forall(_.getAs[Int]("change") === 0))
    assert(a.take(20).exists(_.getAs[Double]("s_neg") > 4.0))
    assert(a.take(20).forall(_.getAs[Double]("s_pos") <= 4.0))
    assert(a.drop(25).exists(_.getAs[Double]("s_pos") > 4.0))
    assert(b.forall(_.getAs[Int]("change") === 0))
    // replay the recursion S_i = max(0, S_{i-1} + d_i) on the driver
    val xs = a.map(_.getAs[Double]("x"))
    val mu = xs.sum / xs.length
    val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / xs.length)
    var s = 0.0
    a.zipWithIndex.foreach { case (r, i) =>
      s = math.max(0.0, s + (xs(i) - mu) / sd - 0.5)
      assert(math.abs(r.getAs[Double]("s_pos") - s) < 1e-6,
        s"bin $i: ${r.getAs[Double]("s_pos")} vs $s")
    }
  }

  test("theilSenTrend: exact line recovered; one corrupted bin cannot move it") {
    import org.apache.spark.sql.functions.col
    // v = 3·bin + 1 on bins 0..4, except bin 4 is poisoned to 1000:
    // 6 of 10 pair slopes are exactly 3 → median 3; intercept median
    // over (v − 3·bin) = (1,1,1,1,988) → 1
    val rows = Seq((0L, 1.0), (1L, 4.0), (2L, 7.0), (3L, 10.0),
      (4L, 1000.0))
      .map { case (b, v) => ("k", b * 86400L, v) }
      .toDF("key", "sec", "v")
      .withColumn("ts", col("sec").cast("timestamp"))
    val r = Timeseries.theilSenTrend(rows, "key", "ts", "v", 86400L)
      .head()
    assert(r.getAs[Long]("n_bins") === 5L)
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 1.0) < 1e-9)
  }

  test("theilSenTrend: even pair count interpolates the median slope") {
    import org.apache.spark.sql.functions.col
    // bins 0,1,2 with v = 0, 1, 4: slopes 1, 2, 3 → median 2; intercept
    // median(0, -1, 0) = interpolated median of (-1, 0, 0) = 0
    val rows = Seq((0L, 0.0), (1L, 1.0), (2L, 4.0))
      .map { case (b, v) => ("k", b * 86400L, v) }
      .toDF("key", "sec", "v")
      .withColumn("ts", col("sec").cast("timestamp"))
    val r = Timeseries.theilSenTrend(rows, "key", "ts", "v", 86400L)
      .head()
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 0.0) < 1e-9)
  }

  test("backtestSeasonalNaive: aligned season scores zero; folds span the grid") {
    import org.apache.spark.sql.functions.col
    // bins 0..5 alternate 10/20 with period 2 → every forecast is exact
    val rows = (0 to 5).map(b => ("k", b * 3600L,
      if (b % 2 == 0) 10.0 else 20.0)).toDF("key", "sec", "v")
      .withColumn("ts", col("sec").cast("timestamp"))
    val got = Timeseries.backtestSeasonalNaive(rows, "key", "ts", "v",
        binSeconds = 3600L, periodBins = 2, folds = 2)
      .orderBy("fold").collect()
    assert(got.map(_.getAs[Int]("fold")).toSeq === Seq(0, 1))
    assert(got.map(_.getAs[Long]("n_scored")).toSeq === Seq(1L, 3L))
    assert(got.forall(r => math.abs(r.getAs[Double]("smape")) < 1e-9))
  }

  test("backtestSeasonalNaive: a gap must not shift the season") {
    import org.apache.spark.sql.functions.col
    // bins 0,1,3 (bin 2 missing), period 2: bin 3's forecast is bin 1's
    // 20 (bin-keyed join); a positional lag would wrongly use bin 0's 10
    val rows = Seq((0L, 10.0), (1L, 20.0), (3L, 40.0))
      .map { case (b, v) => ("k", b * 3600L, v) }
      .toDF("key", "sec", "v")
      .withColumn("ts", col("sec").cast("timestamp"))
    val got = Timeseries.backtestSeasonalNaive(rows, "key", "ts", "v",
        binSeconds = 3600L, periodBins = 2, folds = 1).collect()
    assert(got.length === 1 && got.head.getAs[Long]("n_scored") === 1L)
    // sMAPE = 2·|20 − 40| / (20 + 40) = 2/3
    assert(math.abs(got.head.getAs[Double]("smape") - 2.0 / 3) < 1e-9)
  }

  test("percentileBands: lower-value-at-rank per bin") {
    import org.apache.spark.sql.functions.col
    // one bin, values 1..10: p50 → rank ⌈5⌉ = 5; p90 → 9; p99 → ⌈9.9⌉ = 10
    val rows = (1 to 10).map(i => ("k", 30L, i.toDouble))
      .toDF("key", "sec", "v")
      .withColumn("ts", col("sec").cast("timestamp"))
    val r = Timeseries.percentileBands(rows, "key", "ts", "v",
      binSeconds = 3600L, percentiles = Seq(50, 90, 99)).head()
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Double]("p50") === 5.0)
    assert(r.getAs[Double]("p90") === 9.0)
    assert(r.getAs[Double]("p99") === 10.0)
  }

  test("componentStrengths: exact line + trend-orthogonal pattern → both 1") {
    // period-4 pattern (+2,−2,−2,+2) is orthogonal to a linear trend over
    // complete periods (an alternating ±2 is NOT — it correlates with x
    // and biases the OLS slope): detrended is exactly the pattern,
    // seasonal means absorb it fully, remainder 0
    val pat = Array(2.0, -2.0, -2.0, 2.0)
    val rows = (0 to 7).map(b => (b * 3600L, 10.0 + 3.0 * b + pat(b % 4)))
    val df = rows.toDF("sec", "v")
    val r = Timeseries.componentStrengths(df, "sec", "v", 3600L, 4).head()
    assert(r.getAs[Long]("n_bins") === 8L)
    assert(math.abs(r.getAs[Double]("trend_strength") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("seasonal_strength") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("var_remainder")) < 1e-9)
  }

  test("componentStrengths: zero-variance layers report null, not 1") {
    // pure period-4 pattern, no trend: deseasonalized is constant → F_T null
    val pat = Array(2.0, -2.0, -2.0, 2.0)
    val seasonal = (0 to 7).map(b => (b * 3600L, pat(b % 4))).toDF("sec", "v")
    val rs = Timeseries.componentStrengths(seasonal, "sec", "v", 3600L, 4)
      .head()
    assert(rs.isNullAt(rs.fieldIndex("trend_strength")))
    assert(math.abs(rs.getAs[Double]("seasonal_strength") - 1.0) < 1e-9)
    // pure line, no seasonality or noise: detrended is constant → F_S null
    val line = (0 to 7).map(b => (b * 3600L, 3.0 * b)).toDF("sec", "v")
    val rl = Timeseries.componentStrengths(line, "sec", "v", 3600L, 2).head()
    assert(math.abs(rl.getAs[Double]("trend_strength") - 1.0) < 1e-9)
    assert(rl.isNullAt(rl.fieldIndex("seasonal_strength")))
  }

  test("componentStrengths: period-3 wiggle under period-2 lens scores low") {
    val rows = (0 to 11).map(b => (b * 3600L, 3.0 * b + (b % 3).toDouble))
    val r = Timeseries.componentStrengths(rows.toDF("sec", "v"),
      "sec", "v", 3600L, 2).head()
    assert(r.getAs[Double]("trend_strength") > 0.9)
    assert(r.getAs[Double]("seasonal_strength") < 0.5)
  }

  test("olsTrend: exact fit on a noiseless line, x centered at bin0") {
    // key a: daily bins with v = 3 + 2·offset (perfect line starting at
    // an epoch-day ~19700 — the shape that exposed the cancellation bug:
    // uncentered x puts n·Σx² at ~1e11 and the intercept extrapolates to
    // 1970); key b: one bin (no slope); key c: constant y (r2 undefined)
    val day0 = 19700L
    val rows =
      (0 to 4).map(o => ("a", (day0 + o) * 86400L, 3.0 + 2.0 * o)) ++
        Seq(("b", day0 * 86400L, 7.0)) ++
        (0 to 2).map(o => ("c", (day0 + o) * 86400L, 5.0))
    val df = rows.toDF("k", "sec", "v")
      .withColumn("ts", $"sec".cast("timestamp"))
    val got = Timeseries.olsTrend(df, "k", "ts", "v", binSeconds = 86400L)
      .orderBy("k").collect()
    val a = got(0)
    assert(a.getAs[Long]("n_bins") === 5L)
    assert(a.getAs[Long]("bin0") === day0)
    assert(math.abs(a.getAs[Double]("slope") - 2.0) < 1e-9)
    assert(math.abs(a.getAs[Double]("intercept") - 3.0) < 1e-9)
    assert(math.abs(a.getAs[Double]("r2") - 1.0) < 1e-9)
    val b = got(1)
    assert(b.getAs[Long]("n_bins") === 1L)
    assert(b.isNullAt(b.fieldIndex("slope")) &&
      b.isNullAt(b.fieldIndex("intercept")))
    val c = got(2)
    assert(math.abs(c.getAs[Double]("slope")) < 1e-9)
    assert(math.abs(c.getAs[Double]("intercept") - 5.0) < 1e-9)
    assert(c.isNullAt(c.fieldIndex("r2"))) // flat line: fit quality is 0/0
  }

  test("olsTrend: multiple rows per bin average before the fit") {
    // bin 0 holds 10 and 20 (mean 15), bin 1 holds 25 → slope 10
    val rows = Seq(("a", 0L, 10.0), ("a", 30L, 20.0), ("a", 86400L, 25.0))
    val df = rows.toDF("k", "sec", "v")
      .withColumn("ts", $"sec".cast("timestamp"))
    val r = Timeseries.olsTrend(df, "k", "ts", "v", binSeconds = 86400L)
      .head()
    assert(math.abs(r.getAs[Double]("slope") - 10.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 15.0) < 1e-9)
  }
}

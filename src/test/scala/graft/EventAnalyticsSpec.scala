package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EventAnalytics

/** [[EventAnalytics]] funnel/retention semantics on hand-built event logs
  * — first-touch ordering rules and week bucketing pinned exactly.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: stages must advance strictly; pre-view clicks don't count") {
    val ev = Seq(
      // u1 converts fully in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:09:00"), "purchase"),
      // u2: click BEFORE the first view — not a conversion click; the
      // later click is, but no purchase follows it
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 09:30:00"), "purchase"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 11:00:00"), "click"),
      // u3: view only
      (3L, ts("2024-01-01 08:00:00"), "view"),
      // u4: never viewed → not in the funnel at all
      (4L, ts("2024-01-01 08:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val f = EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
          Option(r.getTimestamp(3)))).toMap
    assert(f.keySet === Set(1L, 2L, 3L))
    assert(f(1L) === ((Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 10:05:00")), Some(ts("2024-01-01 10:09:00")))))
    assert(f(2L) === ((Some(ts("2024-01-01 10:00:00")),
      Some(ts("2024-01-01 11:00:00")), None)))
    assert(f(3L)._2 === None && f(3L)._3 === None)
    val counts = EventAnalytics.funnelCounts(ev, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(counts === Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L))
  }

  test("funnel: stage values with name-special characters work") {
    // event types containing '.', backticks and spaces are legitimate DATA
    // — the internal computation must not resolve columns named after them
    val stages = Seq("page.view", "cart`add", "checkout done")
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "page.view"),
      (1L, ts("2024-01-01 10:05:00"), "cart`add"),
      (1L, ts("2024-01-01 10:09:00"), "checkout done"),
      (2L, ts("2024-01-01 10:00:00"), "page.view")
    ).toDF("user_id", "ts", "event_type")
    val f = EventAnalytics.funnel(ev, "user_id", "ts", "event_type", stages)
    assert(f.columns.toSeq ===
      Seq("user", "t_page.view", "t_cart`add", "t_checkout done"))
    val rows = f.collect().map(r => r.getLong(0) ->
      (0 to 2).map(i => Option(r.getTimestamp(i + 1)))).toMap
    assert(rows(1L).forall(_.isDefined))
    assert(rows(2L) === Seq(Some(ts("2024-01-01 10:00:00")), None, None))
    val counts = EventAnalytics.funnelCounts(ev, "user_id", "ts",
        "event_type", stages)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(counts === Map("page.view" -> 2L, "cart`add" -> 1L,
      "checkout done" -> 1L))
  }

  test("transitionCounts: adjacent pairs per user, tie column totalizes order") {
    val ev = Seq(
      // u1 path: view → click → purchase
      (1L, ts("2024-01-01 10:00:00"), 10L, "view"),
      (1L, ts("2024-01-01 10:05:00"), 11L, "click"),
      (1L, ts("2024-01-01 10:09:00"), 12L, "purchase"),
      // u2: two events at the SAME ts — event_id decides order
      (2L, ts("2024-01-01 09:00:00"), 21L, "view"),
      (2L, ts("2024-01-01 09:00:00"), 20L, "error"),
      // u3: a single event yields no transition
      (3L, ts("2024-01-01 08:00:00"), 30L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = EventAnalytics.transitionCounts(ev, "user_id", "ts",
        "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(
      ("view", "click") -> 1L, ("click", "purchase") -> 1L,
      ("error", "view") -> 1L))
  }

  test("lastTouchAttribution: latest touch at-or-before wins; ties by id") {
    val ev = Seq(
      // u1: view then click then purchase → click credited
      (1L, ts("2024-01-01 10:00:00"), 1L, "view", 0.0),
      (1L, ts("2024-01-01 10:05:00"), 2L, "click", 0.0),
      (1L, ts("2024-01-01 10:09:00"), 3L, "purchase", 50.0),
      // u1 second purchase, no new touch → still the same click
      (1L, ts("2024-01-01 11:00:00"), 4L, "purchase", 25.0),
      // u2: touch at the SAME instant as the purchase counts; two touches
      // at that instant → higher event_id (click) wins
      (2L, ts("2024-01-01 09:00:00"), 5L, "view", 0.0),
      (2L, ts("2024-01-01 09:00:00"), 6L, "click", 0.0),
      (2L, ts("2024-01-01 09:00:00"), 7L, "purchase", 10.0),
      // u3: purchase with no prior touch → dropped
      (3L, ts("2024-01-01 08:00:00"), 8L, "purchase", 99.0),
      (3L, ts("2024-01-01 09:00:00"), 9L, "view", 0.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = EventAnalytics.lastTouchAttribution(ev, "user_id", "ts",
        "event_type", "event_id", "value", "purchase", Seq("view", "click"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got === Map("click" -> ((3L, 85.0))))
  }

  test("abLift: arm sizes, conversion rates and pooled z on a known split") {
    val ev = Seq(
      // arm 0: users 0,2 — user 0 converts
      (0L, "view"), (0L, "purchase"), (2L, "view"),
      // arm 1: users 1,3,5 — users 1 and 3 convert
      (1L, "purchase"), (3L, "view"), (3L, "purchase"), (5L, "click")
    ).toDF("user_id", "event_type")
    val r = EventAnalytics.abLift(ev, "user_id", "event_type", "purchase",
      col("user_id") % 2).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 3L, 1L, 2L)))
    assert(r.getDouble(4) === 0.5) // rate_a
    assert(math.abs(r.getDouble(5) - 2.0 / 3.0) < 1e-12) // rate_b
    val p = 3.0 / 5.0
    val expZ = (2.0 / 3.0 - 0.5) /
      math.sqrt(p * (1 - p) * (1.0 / 2 + 1.0 / 3))
    assert(math.abs(r.getDouble(7) - expZ) < 1e-12)
  }

  test("weeklyRetention: 7-day buckets from the earliest event, k offsets") {
    val ev = Seq(
      // u1 first in week 0, active weeks 0,1,2
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-08 12:00:00")),
      (1L, ts("2024-01-16 00:00:00")),
      // u2 first in week 0, active week 0 only
      (2L, ts("2024-01-02 00:00:00")),
      // u3 first in week 1, active weeks 1,2
      (3L, ts("2024-01-09 00:00:00")), (3L, ts("2024-01-15 23:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.weeklyRetention(ev, "user_id", "ts", maxWeeks = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (0, 0) -> 2L, (0, 1) -> 1L, (0, 2) -> 1L,
      (1, 0) -> 1L, (1, 1) -> 1L))
  }

  test("associationRules: hand-computed support/confidence/lift; dup rows collapse") {
    // baskets: b1 {x,y}, b2 {x,y}, b3 {x}, b4 {y,z} — x appears twice in
    // b3 to prove the distinct; N = 4 baskets
    val rows = Seq(
      ("b1", "x"), ("b1", "y"), ("b2", "x"), ("b2", "y"),
      ("b3", "x"), ("b3", "x"), ("b4", "y"), ("b4", "z"))
      .toDF("b", "item")
    val got = EventAnalytics.associationRules(rows, Seq("b"), "item")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // x→y: n=2, support 0.5, conf 2/3, lift 4·2/(3·3)
    assert(got(("x", "y")) === ((2L, 0.5, 2.0 / 3, 8.0 / 9)))
    // y→x symmetric support/lift, conf 2/3 too (ny = 3)
    assert(got(("y", "x")) === ((2L, 0.5, 2.0 / 3, 8.0 / 9)))
    // y→z: n=1, conf 1/3, lift 4/(3·1)
    assert(got(("y", "z")) === ((1L, 0.25, 1.0 / 3, 4.0 / 3)))
    assert(!got.contains(("x", "z"))) // never co-occur
  }

  test("associationRules: multi-column baskets don't collide on concat") {
    // ("a","bc") and ("ab","c") would collide under plain concat — the
    // \u0001 separator keeps them distinct baskets
    val rows = Seq(
      ("a", "bc", "x"), ("a", "bc", "y"),
      ("ab", "c", "x"), ("ab", "c", "z"))
      .toDF("b1", "b2", "item")
    val got = EventAnalytics.associationRules(rows, Seq("b1", "b2"), "item")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // collision would fabricate x→z and x→y cross-pairs in one basket of
    // four items; with distinct baskets y and z never share a basket
    assert(got === Set(("x", "y"), ("y", "x"), ("x", "z"), ("z", "x")))
  }

  test("cuped: a fully-explanatory covariate removes all variance and bias") {
    // y = 2x exactly; variants got different x draws, so the RAW diff is
    // pure covariate imbalance: A = (1,2),(3,6); B = (2,4),(4,8)
    // θ = cov/var = 2, every adjusted y′ = ȳ, adj_diff = 0, reduction = 1
    val rows = Seq((0, 1.0, 2.0), (0, 3.0, 6.0),
      (1, 2.0, 4.0), (1, 4.0, 8.0)).toDF("variant", "x", "y")
    val r = EventAnalytics.cuped(rows, col("variant"), "x", "y").head()
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    assert(math.abs(r.getAs[Double]("theta") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("diff") - (-2.0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("adj_diff")) < 1e-9)
    assert(math.abs(r.getAs[Double]("var_reduction") - 1.0) < 1e-9)
  }

  test("cuped: a constant covariate is a guarded no-op (θ = 0)") {
    val rows = Seq((0, 5.0, 1.0), (0, 5.0, 3.0),
      (1, 5.0, 2.0), (1, 5.0, 6.0)).toDF("variant", "x", "y")
    val r = EventAnalytics.cuped(rows, col("variant"), "x", "y").head()
    assert(r.getAs[Double]("theta") === 0.0)
    assert(math.abs(r.getAs[Double]("adj_diff") -
      r.getAs[Double]("diff")) < 1e-9)
    assert(r.getAs[Double]("var_reduction") === 0.0)
  }

  test("topPaths: consecutive 3-step runs with per-user support") {
    val rows = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C"), (1L, 4L, "D"),
      (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "C"))
      .toDF("user_id", "seq", "event_type")
      .withColumn("ts", col("seq").cast("timestamp"))
    val got = EventAnalytics.topPaths(rows, "user_id", "ts", "seq",
        "event_type", steps = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(("A>B>C", 2L, 2L), ("B>C>D", 1L, 1L)))
  }

  test("topPaths: equal timestamps break by the tie column") {
    // both events at ts=1: order must follow seq, giving X>Y>Z not X>Z>Y
    val rows = Seq(
      (1L, 1L, 1L, "X"), (1L, 1L, 2L, "Y"), (1L, 2L, 3L, "Z"))
      .toDF("user_id", "t", "seq", "event_type")
      .withColumn("ts", col("t").cast("timestamp"))
    val got = EventAnalytics.topPaths(rows, "user_id", "ts", "seq",
        "event_type", steps = 3, topK = 5)
      .collect().map(_.getString(0))
    assert(got.toSeq === Seq("X>Y>Z"))
  }

  test("linearAttribution: equal split in-window, lookback excludes, no-touch drops") {
    import spark.implicits._
    // user 1: touches view@10, click@20, then buy@30 v=60 → 0.5 each, 30 each;
    //   a view@1 is OUTSIDE the 25s lookback (30−25=5 ≤ tts — 1 < 5 excluded)
    // user 2: buy@50 with no touches → dropped entirely
    val rows = Seq(
      (1L, 1L, "view", 0.0), (1L, 10L, "view", 0.0),
      (1L, 20L, "click", 0.0), (1L, 30L, "buy", 60.0),
      (2L, 50L, "buy", 99.0))
      .toDF("user_id", "t", "event_type", "value")
      .withColumn("ts", col("t").cast("timestamp"))
    val got = EventAnalytics.linearAttribution(rows, "user_id", "ts",
        "event_type", "value", "buy", Seq("view", "click"),
        lookbackSeconds = 25L)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    assert(got === Set(("view", 0.5, 30.0), ("click", 0.5, 30.0)))
  }

  test("linearAttribution: same-second conversions pre-merge their credit") {
    import spark.implicits._
    // two buys in the same second (v=10, v=20) share the single view:
    // view gets 2 conversions and value 30 — not a nondeterministic one
    val rows = Seq(
      (1L, 5L, "view", 0.0), (1L, 9L, "buy", 10.0), (1L, 9L, "buy", 20.0))
      .toDF("user_id", "t", "event_type", "value")
      .withColumn("ts", col("t").cast("timestamp"))
    val got = EventAnalytics.linearAttribution(rows, "user_id", "ts",
        "event_type", "value", "buy", Seq("view"), lookbackSeconds = 60L)
      .collect()
    assert(got.length === 1)
    assert(got.head.getDouble(1) === 2.0 && got.head.getDouble(2) === 30.0)
  }

  test("outOfOrderStats: inversions, worst backstep, watermark lag") {
    import spark.implicits._
    // arrival 1..5, event times 100, 90, 200, 180, 210:
    // inversions at #2 (100→90) and #4 (200→180); worst backstep 20;
    // watermark lag: hwm after #3 is 200, #4 lags 20; #2 lags 10
    val rows = Seq((1L, 100L), (2L, 90L), (3L, 200L), (4L, 180L),
      (5L, 210L)).map { case (s, t) => ("u", s, t) }
      .toDF("k", "seq", "t")
      .withColumn("ts", col("t").cast("timestamp"))
    val r = EventAnalytics.outOfOrderStats(rows, "k", "seq", "ts").head()
    assert(r.getAs[Long]("n_events") === 5L)
    assert(r.getAs[Long]("n_inversions") === 2L)
    assert(math.abs(r.getAs[Double]("inversion_rate") - 0.5) < 1e-9)
    assert(r.getAs[Long]("max_backstep_sec") === 20L)
    assert(r.getAs[Long]("max_watermark_lag_sec") === 20L)
  }

  test("outOfOrderStats: ordered feed reports zeros") {
    import spark.implicits._
    val rows = Seq(("u", 1L, 10L), ("u", 2L, 20L), ("v", 1L, 5L))
      .toDF("k", "seq", "t")
      .withColumn("ts", col("t").cast("timestamp"))
    val got = EventAnalytics.outOfOrderStats(rows, "k", "seq", "ts")
      .collect()
    assert(got.forall(r => r.getAs[Long]("n_inversions") == 0L &&
      r.getAs[Long]("max_watermark_lag_sec") == 0L))
  }

  test("funnelLatency: lower-value-at-rank gap percentiles per transition") {
    // advance gaps 120 s / 60 s / 600 s; u4 never advances → excluded
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:02:00"), "cart"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:01:00"), "cart"),
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:10:00"), "cart"),
      (4L, ts("2024-01-01 10:00:00"), "view"))
      .toDF("u", "t", "typ")
    val got = EventAnalytics.funnelLatency(ev, "u", "t", "typ",
      Seq("view", "cart"), quantizeSeconds = 60L).head()
    assert(got.getAs[String]("stage_from") === "view")
    assert(got.getAs[String]("stage_to") === "cart")
    assert(got.getAs[Long]("n_advanced") === 3L)
    assert(got.getAs[Long]("p50_sec") === 120L) // rank ⌈1.5⌉ = 2nd of 3
    assert(got.getAs[Long]("p90_sec") === 600L)
  }

  test("markovAttribution: hand-solved 2-channel chain") {
    // u1 view→click→buy, u2 view (no conv), u3 click→buy:
    //   p(START→view)=2/3  p(START→click)=1/3
    //   p(view→click)=1/2  p(view→NULL)=1/2  p(click→CONV)=1
    // base = 2/3·(1/2·1) + 1/3·1 = 2/3;
    // drop view → 1/3 (RE 1/2); drop click → 0 (RE 1)
    val ev = Seq(
      (1L, 1L, 10L, "view"), (1L, 2L, 11L, "click"), (1L, 3L, 12L, "buy"),
      (2L, 1L, 20L, "view"),
      (3L, 1L, 30L, "click"), (3L, 2L, 31L, "buy"))
      .toDF("u", "t", "id", "typ")
    val got = EventAnalytics.markovAttribution(ev, "u", "t", "typ", "id",
        conversionType = "buy", touchTypes = Seq("click", "view"))
      .orderBy("touch_type").collect()
    val Array(c, v) = got
    assert(math.abs(c.getAs[Double]("base_p") - 2.0 / 3) < 1e-12)
    assert(math.abs(c.getAs[Double]("removal_effect") - 1.0) < 1e-12)
    assert(math.abs(v.getAs[Double]("removal_effect") - 0.5) < 1e-12)
    assert(math.abs(c.getAs[Double]("share") - 2.0 / 3) < 1e-12)
    // 2 conversions credited 4/3 to click, 2/3 to view
    assert(math.abs(c.getAs[Double]("credited_conversions") - 4.0 / 3) < 1e-12)
    assert(math.abs(v.getAs[Double]("credited_conversions") - 2.0 / 3) < 1e-12)
  }

  test("markovShapley: hand-solved values, efficiency axiom holds") {
    // same chain as the removal-effect test: v(∅)=0, v({view})=0,
    // v({click})=1/3, v(all)=2/3 → φ_click = ½·⅓ + ½·⅔ = ½,
    // φ_view = 0 + ½·(2/3 − 1/3) = 1/6; Σφ = v(all) − v(∅)
    val ev = Seq(
      (1L, 1L, 10L, "view"), (1L, 2L, 11L, "click"), (1L, 3L, 12L, "buy"),
      (2L, 1L, 20L, "view"),
      (3L, 1L, 30L, "click"), (3L, 2L, 31L, "buy"))
      .toDF("u", "t", "id", "typ")
    val got = EventAnalytics.markovShapley(ev, "u", "t", "typ", "id",
        conversionType = "buy", touchTypes = Seq("click", "view"))
      .orderBy("touch_type").collect()
    val Array(c, v) = got
    assert(math.abs(c.getAs[Double]("shapley") - 0.5) < 1e-12)
    assert(math.abs(v.getAs[Double]("shapley") - 1.0 / 6) < 1e-12)
    assert(math.abs(c.getAs[Double]("v_all") - 2.0 / 3) < 1e-12)
    assert(c.getAs[Double]("v_none") === 0.0)
    val phiSum = got.map(_.getAs[Double]("shapley")).sum
    assert(math.abs(phiSum -
      (c.getAs[Double]("v_all") - c.getAs[Double]("v_none"))) < 1e-12)
    // shares 3/4 and 1/4 of the 2 conversions
    assert(math.abs(c.getAs[Double]("credited_conversions") - 1.5) < 1e-12)
    assert(math.abs(v.getAs[Double]("credited_conversions") - 0.5) < 1e-12)
  }

  test("markovAttribution: post-conversion touches ignored; no-effect " +
    "channels yield null shares") {
    // u1 converts with NO prior touch (its view is after the buy) →
    // START→CONV; u2's view dead-ends → removing view changes nothing
    val ev = Seq(
      (1L, 1L, 10L, "buy"), (1L, 2L, 11L, "view"),
      (2L, 1L, 20L, "view"))
      .toDF("u", "t", "id", "typ")
    val got = EventAnalytics.markovAttribution(ev, "u", "t", "typ", "id",
      conversionType = "buy", touchTypes = Seq("view")).head()
    assert(math.abs(got.getAs[Double]("base_p") - 0.5) < 1e-12)
    assert(got.getAs[Double]("removal_effect") === 0.0)
    assert(got.isNullAt(got.fieldIndex("share")))
    assert(got.isNullAt(got.fieldIndex("credited_conversions")))
  }

  test("cohortLtv: cohorting, cells and the per-cohort running value") {
    val wk = 604800L
    val rows = Seq(
      ("a", 0L, 10.0),        // cohort 0, offset 0
      ("a", wk + 200L, 5.0),  // cohort 0, offset 1
      ("b", wk, 2.0))         // cohort 1, offset 0
      .toDF("u", "ep", "v")
    val got = EventAnalytics.cohortLtv(rows, "u", "ep", "v")
      .orderBy("cohort_week", "week_offset").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((0L, 0L), (0L, 1L), (1L, 0L)))
    assert(got(1).getAs[Double]("cum_value") === 15.0)
    assert(got(1).getAs[Double]("ltv_per_user") === 15.0)
    assert(got.forall(_.getAs[Long]("cohort_size") === 1L))
  }

  test("rfm: hand-placed users land in the right halves (2 buckets)") {
    val day = 86400L
    val rows = Seq(
      ("u1", 0L, 1.0),
      ("u2", 5L * day, 4.0), ("u2", 10L * day, 6.0),
      ("u3", 10L * day, 10.0), ("u3", 15L * day, 10.0),
      ("u3", 20L * day, 10.0))
      .toDF("u", "ep", "v")
    val got = EventAnalytics.rfm(rows, "u", "ep", "v", numBuckets = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
          r.getAs[Double]("monetary"), r.getAs[String]("segment")))).toMap
    assert(got("u1") === ((20L, 1L, 1.0, "111")))
    assert(got("u2") === ((10L, 2L, 10.0, "211")))
    assert(got("u3") === ((0L, 3L, 30.0, "222")))
  }

  test("alwaysValidMonitor: hand-computed bin, cumulation, null guard") {
    // bin 0: arm A 2/2 converts, arm B 0/2 — pooled p = .5, V = .25;
    // with τ = .25: ln Λ = .5·ln(.5) + 1·.25/(2·.25·.5) ≈ 0.6534
    val rows = Seq(
      (true, 10L, true), (true, 20L, true),
      (false, 30L, false), (false, 40L, false),
      // bin 1: only arm A reports — e-value must stay defined (cumulative
      // counts still cover both arms) and conversions accumulate
      (true, 100000L, false))
      .toDF("a", "ep", "conv")
    val got = operators.EventAnalytics.alwaysValidMonitor(rows, col("a"),
        "ep", col("conv"), binSeconds = 86400L, tau = 0.25, alpha = 0.5)
      .orderBy("bin").collect()
    assert(got.length === 2)
    val b0 = got(0)
    assert(b0.getAs[Long]("n_a") === 2L && b0.getAs[Long]("conv_b") === 0L)
    assert(math.abs(b0.getAs[Double]("diff") - 1.0) < 1e-12)
    assert(math.abs(b0.getAs[Double]("log_e_value") -
      (0.5 * math.log(0.5) + 1.0)) < 1e-12)
    assert(!b0.getAs[Boolean]("can_stop")) // ln(1/.5) ≈ .693 > .653
    val b1 = got(1)
    assert(b1.getAs[Long]("n_a") === 3L && b1.getAs[Long]("n_b") === 2L)
    assert(!b1.isNullAt(b1.fieldIndex("log_e_value")))
  }

  test("alwaysValidCuped: lagged (predictable) theta, adjusted diff, " +
    "variance reduction per bin") {
    // bin 1 — A (y,x): (3,1),(5,3); B: (1,2),(3,4). θ₁ is fit on the
    // EMPTY exclusive prefix → 0: the first bin is unadjusted
    // (diff_adj = diff_raw = 2, var_adj = var_y = 2).
    // bin 2 adds A (7,5), B (1,0): θ₂ is the bin-1-only OLS —
    // varx 1.25, cov .5 → θ = .4. Cumulative means: x̄_A 3, x̄_B 2,
    // diff_raw = 5 − 5/3 = 10/3, diff_adj = 10/3 − .4·(3−2).
    // Cumulative var_y 41/9, cov 17/6, varx 35/12 → full quadratic
    // var_adj = 41/9 − 2·.4·17/6 + .16·35/12.
    val rows = Seq(
      (true, 3.0, 1.0, 1L), (true, 5.0, 3.0, 1L),
      (false, 1.0, 2.0, 1L), (false, 3.0, 4.0, 1L),
      (true, 7.0, 5.0, 2L), (false, 1.0, 0.0, 2L))
      .toDF("arma", "y", "x", "bin")
    val got = EventAnalytics.alwaysValidCuped(rows, col("arma"),
        col("bin"), "y", "x")
      .orderBy("bin").collect()
    assert(got.length === 2)
    val b1 = got(0)
    assert(b1.getAs[Long]("n_a") === 2L && b1.getAs[Long]("n_b") === 2L)
    assert(b1.getAs[Double]("theta") === 0.0)
    assert(math.abs(b1.getAs[Double]("diff_raw") - 2.0) < 1e-12)
    assert(math.abs(b1.getAs[Double]("diff_adj") - 2.0) < 1e-12)
    assert(math.abs(b1.getAs[Double]("var_adj") -
      b1.getAs[Double]("var_y")) < 1e-12)
    val b2 = got(1)
    assert(b2.getAs[Long]("n_a") === 3L && b2.getAs[Long]("n_b") === 3L)
    assert(math.abs(b2.getAs[Double]("theta") - 0.4) < 1e-12)
    assert(math.abs(b2.getAs[Double]("diff_raw") - (5.0 - 5.0 / 3)) < 1e-12)
    assert(math.abs(b2.getAs[Double]("diff_adj") -
      (10.0 / 3 - 0.4)) < 1e-12)
    assert(math.abs(b2.getAs[Double]("var_adj") -
      (41.0 / 9 - 0.8 * 17.0 / 6 + 0.16 * 35.0 / 12)) < 1e-12)
    // smaller adjusted variance → the adjusted e-process leads once a
    // lagged θ exists — the whole point of the pairing
    assert(b2.getAs[Double]("log_e_adj") > b2.getAs[Double]("log_e_raw"))
  }

  test("alwaysValidSrm: a balanced split stays quiet; a broken splitter " +
    "pages once the cumulative evidence crosses ln(1/alpha)") {
    // bin 1: 5/5 against p0=.5 — diff 0, e-value is the pure variance
    // penalty .5·ln(v/(v+τ)), never a detection. bin 2 adds 40 A / 0 B:
    // cumulative share .9 on n=50 → detection at τ=.01, α=.5
    val rows = (1 to 5).map(i => (true, 1L)) ++
      (1 to 5).map(i => (false, 1L)) ++
      (1 to 40).map(i => (true, 2L))
    val df = rows.toDF("isa", "bin")
    val got = EventAnalytics.alwaysValidSrm(df, col("isa"), col("bin"),
        expectedShareA = 0.5, tau = 0.01, alpha = 0.5)
      .orderBy("bin").collect()
    assert(got.length === 2)
    val b1 = got(0)
    assert(b1.getAs[Long]("n_a") === 5L && b1.getAs[Long]("n_b") === 5L)
    assert(b1.getAs[Double]("diff") === 0.0)
    assert(math.abs(b1.getAs[Double]("log_e_value") -
      0.5 * math.log(0.025 / 0.035)) < 1e-12)
    assert(!b1.getAs[Boolean]("srm_detected"))
    val b2 = got(1)
    assert(b2.getAs[Long]("n_a") === 45L && b2.getAs[Long]("n_b") === 5L)
    assert(math.abs(b2.getAs[Double]("share_a") - 0.9) < 1e-12)
    // v = .25/50 = .005: logΛ = .5·ln(.005/.015) + .16·.01/(2·.005·.015)
    assert(math.abs(b2.getAs[Double]("log_e_value") -
      (0.5 * math.log(0.005 / 0.015) +
        0.4 * 0.4 * 0.01 / (2.0 * 0.005 * 0.015))) < 1e-9)
    assert(b2.getAs[Boolean]("srm_detected")) // ≈10.1 ≥ ln 2
  }

  test("alwaysValidCuped: a constant covariate is a guarded no-op") {
    val rows = Seq((true, 3.0, 7.0, 1L), (true, 5.0, 7.0, 1L),
      (false, 1.0, 7.0, 1L), (false, 3.0, 7.0, 1L))
      .toDF("arma", "y", "x", "bin")
    val r = EventAnalytics.alwaysValidCuped(rows, col("arma"),
      col("bin"), "y", "x").head()
    assert(r.getAs[Double]("theta") === 0.0)
    assert(math.abs(r.getAs[Double]("diff_adj") -
      r.getAs[Double]("diff_raw")) < 1e-12)
    assert(math.abs(r.getAs[Double]("var_adj") -
      r.getAs[Double]("var_y")) < 1e-12)
  }

  test("alwaysValidMonitor: one-arm prefix reports a null e-value") {
    val rows = Seq((true, 10L, true), (true, 20L, false))
      .toDF("a", "ep", "conv")
    val r = operators.EventAnalytics.alwaysValidMonitor(rows, col("a"),
      "ep", col("conv"), binSeconds = 86400L).head()
    assert(r.isNullAt(r.fieldIndex("log_e_value")))
  }

  test("diffInDiff: hand-computed 2×2 cells, effect and SE") {
    val rows = Seq(
      (true, false, 1.0), (true, false, 2.0),   // treated pre: mean 1.5
      (true, true, 4.0), (true, true, 5.0),     // treated post: mean 4.5
      (false, false, 1.0), (false, false, 3.0), // control pre: mean 2
      (false, true, 2.0), (false, true, 4.0))   // control post: mean 3
      .toDF("tr", "post", "y")
    val r = EventAnalytics.diffInDiff(rows, col("tr"), col("post"), "y")
      .head()
    assert(Seq("n_t_pre", "n_t_post", "n_c_pre", "n_c_post")
      .forall(c => r.getAs[Long](c) === 2L))
    assert(math.abs(r.getAs[Double]("trend_treated") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("trend_control") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("did") - 2.0) < 1e-12)
    // cell variances: 0.5, 0.5, 2, 2 over n = 2 each
    assert(math.abs(r.getAs[Double]("se_did") - math.sqrt(2.5)) < 1e-12)
  }

  test("diffInDiff: parallel trends means zero effect") {
    val rows = Seq(
      (true, false, 10.0), (true, true, 12.0),
      (false, false, 5.0), (false, true, 7.0))
      .toDF("tr", "post", "y")
    val r = EventAnalytics.diffInDiff(rows, col("tr"), col("post"), "y")
      .head()
    assert(math.abs(r.getAs[Double]("did")) < 1e-12)
  }
}

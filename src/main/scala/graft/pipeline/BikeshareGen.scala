package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Bikeshare

/** Deterministic synthetic bikeshare corpus at the REFERENCE's published
  * scale (BASELINE.md: ≈4.58 M trips over the 2021-02-01→2022-01-31 year,
  * ≈2.05 M payments over 2013-02-01→2022-02-01, ≈75 K riders with ids from
  * 1000, a small alphanumeric-id station dim) — the reference's own 4.58 M
  * -row corpus is not in the sandbox, so the 24 analytical queries were
  * previously proven only on 5-row fixtures; this generator closes that
  * by E2E-running the 5-stage pipeline + Q1-Q22 at the real row counts
  * (gate q129, BikeshareScaleSpec).
  *
  * Every column is a pure function of the row id through `xxhash64`, so
  * generation is scan-side distributed compute: `spark.range` gives each
  * partition its id span, no driver-side data, no RNG state, identical
  * output at any parallelism (the property `Math.random`-style generators
  * lack). Foreign keys are valid BY CONSTRUCTION (trip/payment rider ids
  * and station ids reuse the dims' id formulas), which the E2E asserts via
  * join-preservation invariants rather than assuming.
  *
  * Shape for scale: generating 100× this corpus is the same one-pass
  * `range → project` plan; nothing collects, nothing joins, nothing
  * shuffles. Facts land value-clustered on the row id, deliberately NOT
  * time-sorted — a worst case for the date-dim joins, like real ingest.
  */
object BikeshareGen {

  final case class Sizes(trips: Long, payments: Long, riders: Long,
                         stations: Int)

  /** Reference scale (scale = 1.0): BASELINE.md row counts. */
  def sizes(scale: Double): Sizes = {
    require(scale > 0 && scale <= 1.0, s"scale $scale must be in (0, 1]")
    Sizes(
      trips = math.max(1000L, math.round(4580000L * scale)),
      payments = math.max(500L, math.round(2050000L * scale)),
      riders = math.max(100L, math.round(75000L * scale)),
      stations = math.max(20, math.round(150 * scale).toInt))
  }

  /** Uniform deterministic draw in [0, n) from (id, salt). */
  private def u(salt: Int, n: Long): Column =
    pmod(xxhash64(col("id"), lit(salt)), lit(n))

  /** Divvy-style alphanumeric station id, shared by the dim and the fact
    * FK columns so referential integrity holds without a join.
    */
  private def stationId(ordinal: Column): Column =
    concat(
      element_at(array(Seq("KA", "TA", "WL", "LP", "HQ").map(lit): _*),
        pmod(ordinal, lit(5)).cast("int") + 1),
      lpad(ordinal.cast("string"), 10, "0"))

  private val tripEpochLo = 1612141200L     // 2021-02-01 01:00:00 UTC
  private val tripSpanSeconds = 365L * 24 * 3600 - 3600
  private val payEpochDayLo = "2013-02-01"
  private val paySpanDays = 3288L           // → 2022-02-01

  def riders(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      (col("id") + 1000).cast("int").as("rider_id"),
      concat(lit("First"), u(1, 5000)).as("first"),
      concat(lit("Last"), u(2, 20000)).as("last"),
      concat(u(3, 9899) + 100, lit(" W Addison St")).as("address"),
      // births 1946..2000 → ages ~21-75 at ride time, always before the
      // account start (age derivations never go negative)
      date_add(lit(java.sql.Date.valueOf("1946-01-01")),
        u(4, 20000).cast("int")).as("birthday"),
      date_add(lit(java.sql.Date.valueOf(payEpochDayLo)),
        u(5, 3250).cast("int")).as("account_start_date"),
      // ~70% active (NULL end date), closures within ~5 years of start
      when(u(6, 10) < 7, lit(null).cast("date"))
        .otherwise(date_add(lit(java.sql.Date.valueOf(payEpochDayLo)),
          (u(5, 3250) + u(7, 1800) + 30).cast("int"))).as("account_end_date"),
      (u(8, 100) < 80).as("is_member"))

  def stations(spark: SparkSession, n: Int): DataFrame =
    spark.range(n).select(
      stationId(col("id")).as("station_id"),
      concat(lit("Station "), col("id")).as("name"),
      (lit(41.78f) + (u(9, 3000).cast("float") / 10000.0f)).as("latitude"),
      (lit(-87.83f) + (u(10, 3000).cast("float") / 10000.0f)).as("longitude"))

  def trips(spark: SparkSession, n: Long, nRiders: Long,
            nStations: Int): DataFrame = {
    val startEpoch = lit(tripEpochLo) + u(12, tripSpanSeconds)
    // 300..2315 s uniform → mean ≈ 1307 s, the reference's observed avg
    val duration = lit(300L) + u(13, 2016)
    spark.range(n).select(
      substring(md5(concat(lit("trip"), col("id"))), 1, 16).as("trip_id"),
      element_at(array(Seq("classic_bike", "electric_bike", "docked_bike")
        .map(lit): _*), u(14, 3).cast("int") + 1).as("rideable_type"),
      timestamp_seconds(startEpoch).as("started_at"),
      timestamp_seconds(startEpoch + duration).as("ended_at"),
      stationId(u(15, nStations)).as("start_station_id"),
      stationId(u(16, nStations)).as("end_station_id"),
      (u(17, nRiders) + 1000).cast("int").as("rider_id"))
  }

  def payments(spark: SparkSession, n: Long, nRiders: Long): DataFrame =
    spark.range(n).select(
      (col("id") + 1).cast("int").as("payment_id"),
      date_add(lit(java.sql.Date.valueOf(payEpochDayLo)),
        u(21, paySpanDays).cast("int")).as("date_id"),
      // whole-dollar decimal(10,0) fees 0..20 → mean ≈ 10.00 (BASELINE.md)
      u(22, 21L).cast(Bikeshare.payments("amount").dataType).as("amount"),
      (u(23, nRiders) + 1000).cast("int").as("rider_id"))

  /** The conformed (post-stage-3) table set at `scale` — what
    * [[BikesharePipeline.build]] takes. Column order/types match
    * [[Bikeshare]]'s declared schemas exactly (spec-asserted).
    */
  def conformed(spark: SparkSession, scale: Double): BikesharePipeline.Conformed = {
    val s = sizes(scale)
    // `.to(declared)` projects each generated table through the declared
    // schema — the generated columns are provably non-null (derived from
    // spark.range ids), so this only WIDENS nullability to the declared
    // nullable=true, making schema equality hold exactly as a real
    // parquet-read warehouse would.
    BikesharePipeline.Conformed(
      payments = payments(spark, s.payments, s.riders).to(Bikeshare.payments),
      trips = trips(spark, s.trips, s.riders, s.stations).to(Bikeshare.trips),
      riders = riders(spark, s.riders).to(Bikeshare.riders),
      stations = stations(spark, s.stations).to(Bikeshare.stations))
  }

  /** Session-cached MATERIALIZED corpus: generated once per (session,
    * scale), persisted via eager localCheckpoint so the 22 analytical
    * queries read stored columnar batches instead of regenerating — the
    * same cost shape as reading the warehouse's parquet. (The corpus is
    * ≈0.5 GB at scale 1; local checkpoints spill to disk if needed.)
    */
  private val cache = new graft.SessionCache[BikesharePipeline.Conformed]
  def conformedCached(spark: SparkSession,
                      scale: Double): BikesharePipeline.Conformed =
    cache.getOrElseUpdate(spark, scale.toString) {
      val c = conformed(spark, scale)
      BikesharePipeline.Conformed(
        payments = c.payments.localCheckpoint(),
        trips = c.trips.localCheckpoint(),
        riders = c.riders.localCheckpoint(),
        stations = c.stations.localCheckpoint())
    }

  /** Disk-cached warehouse under `target/` keyed by scale: generated once
    * ACROSS sessions (the session cache above dies with the JVM — every
    * bench/verify/QTime run was paying a full regenerate, the round-11
    * bench's single biggest contention amplifier), then read back as
    * parquet with the declared schemas — which is also the highest-fidelity
    * cost shape, since the reference's 22 queries read a stored warehouse,
    * not a generator. A per-table `_SUCCESS` marker gates reuse; a partial
    * write (killed run) regenerates.
    */
  def conformedWarehouse(spark: SparkSession,
                         scale: Double): BikesharePipeline.Conformed = {
    val root = s"target/bikeshare_wh/scale_$scale"
    val names = Seq("payments", "trips", "riders", "stations")
    val complete = names.forall(n =>
      new java.io.File(s"$root/$n/_SUCCESS").exists())
    if (!complete) {
      val c = conformed(spark, scale)
      c.payments.write.mode("overwrite").parquet(s"$root/payments")
      c.trips.write.mode("overwrite").parquet(s"$root/trips")
      c.riders.write.mode("overwrite").parquet(s"$root/riders")
      c.stations.write.mode("overwrite").parquet(s"$root/stations")
    }
    // explicit declared schemas: a bare parquet read infers all-nullable
    // and (for trips' interval-derived columns) would drift from the
    // spec-asserted Bikeshare schemas
    BikesharePipeline.Conformed(
      payments = spark.read.schema(Bikeshare.payments)
        .parquet(s"$root/payments"),
      trips = spark.read.schema(Bikeshare.trips).parquet(s"$root/trips"),
      riders = spark.read.schema(Bikeshare.riders).parquet(s"$root/riders"),
      stations = spark.read.schema(Bikeshare.stations)
        .parquet(s"$root/stations"))
  }

  /** Session-cached BUILT warehouse on top of the disk cache: the enrich
    * join (trips ⋈ riders + age arithmetic over the full fact) and the two
    * date spines are pinned once per (session, scale) — without this every
    * one of the 22 analytical queries re-executed the enrichment (22 fact
    * scans + joins) and each dates join re-derived its spine (two more
    * fact scans per query) — exactly what a real warehouse's stored
    * enriched table amortizes.
    */
  private val whCache = new graft.SessionCache[BikesharePipeline.Warehouse]
  def warehouseCached(spark: SparkSession,
                      scale: Double): BikesharePipeline.Warehouse =
    whCache.getOrElseUpdate(spark, s"wh:$scale") {
      val w = BikesharePipeline.build(spark, conformedWarehouse(spark, scale))
      BikesharePipeline.Warehouse(
        payments = w.payments,
        trips = w.trips.localCheckpoint(),
        riders = w.riders.localCheckpoint(),
        stations = w.stations,
        tripDates = w.tripDates.localCheckpoint(),
        paymentDates = w.paymentDates.localCheckpoint())
    }

  /** The full E2E at `scale`: conform → enrich → dims → all 22 analytical
    * queries, summarized one row per query (name, result cardinality, a
    * rounded control total over the result's numeric columns). `count()`
    * on this executes the entire reference workload; the per-query
    * invariants live in BikeshareScaleSpec.
    */
  /** The 22 query frames the gate summarizes, with each avg/sum PAIR
    * projected from ONE fused aggregation (q1/q2, q3/q4, q5/q6, q7/q8,
    * q9/q10, q11/q12, q13/q14, q15/q16, q17/q18, q19/q20 differ only in
    * the measure over the same grouped join): computing both measures in
    * one `groupBy` halves the fact-scan/aggregation subtrees of the gate
    * union — the guide's "aggregate before you shuffle / share the
    * exchange" applied to the reference's query catalog. Each projection
    * carries exactly the individual query's columns, so its rows equal
    * the public qN function's rows (BikesharePipelineSpec asserts this
    * per pair on the fixture warehouse; the qN functions stay the
    * spec-pinned public surface). q21/q22 have no pair and keep their
    * own frames.
    */
  private[graft] def gateFrames(w: BikesharePipeline.Warehouse)
      : Seq[(String, DataFrame)] = {
    val durAggs = Seq(avg("duration").as("avg_duration"),
      sum("duration").as("total_duration"))
    val amtAggs = Seq(sum("amount").as("total_amount"),
      avg("amount").as("avg_amount"))
    def fused(df: DataFrame, key: String, aggs: Seq[Column]) =
      df.groupBy(key).agg(aggs.head, aggs.tail: _*)
    val fDow = fused(BikesharePipeline.tripsByDow(w), "day_of_week", durAggs)
    val fStart = fused(w.trips, "started_at", durAggs)
    val fSSt = fused(w.trips, "start_station_id", durAggs)
    val fESt = fused(w.trips, "end_station_id", durAggs)
    val fAge = fused(BikesharePipeline.tripsJoinRidersExpr(w),
      "age_at_account_start", durAggs)
    val fMem = fused(w.trips.join(w.riders, Seq("rider_id")), "is_member",
      durAggs)
    def fPay(part: String) =
      fused(w.payments.join(w.paymentDates, Seq("date_id")), part, amtAggs)
    val fMonth = fPay("month")
    val fQuarter = fPay("quarter")
    val fYear = fPay("year")
    val fMemAge = fused(
      w.payments.join(w.riders.where(col("is_member") === true),
        Seq("rider_id")), "age_at_account_start", amtAggs)
    Seq(
      "q1_avg_duration_dow" -> fDow.select("day_of_week", "avg_duration"),
      "q2_total_duration_dow" -> fDow.select("day_of_week", "total_duration"),
      "q3_avg_duration_start" -> fStart.select("started_at", "avg_duration"),
      "q4_total_duration_start" -> fStart.select("started_at", "total_duration"),
      "q5_avg_duration_sstation" -> fSSt.select("start_station_id", "avg_duration"),
      "q6_total_duration_sstation" -> fSSt.select("start_station_id", "total_duration"),
      "q7_avg_duration_estation" -> fESt.select("end_station_id", "avg_duration"),
      "q8_total_duration_estation" -> fESt.select("end_station_id", "total_duration"),
      "q9_total_duration_age" -> fAge.select("age_at_account_start", "total_duration"),
      "q10_avg_duration_age" -> fAge.select("age_at_account_start", "avg_duration"),
      "q11_avg_duration_member" -> fMem.select("is_member", "avg_duration"),
      "q12_total_duration_member" -> fMem.select("is_member", "total_duration"),
      "q13_sum_month" -> fMonth.select("month", "total_amount"),
      "q14_avg_month" -> fMonth.select("month", "avg_amount"),
      "q15_sum_quarter" -> fQuarter.select("quarter", "total_amount"),
      "q16_avg_quarter" -> fQuarter.select("quarter", "avg_amount"),
      "q17_sum_year" -> fYear.select("year", "total_amount"),
      "q18_avg_year" -> fYear.select("year", "avg_amount"),
      "q19_sum_member_age" -> fMemAge.select("age_at_account_start", "total_amount"),
      "q20_avg_member_age" -> fMemAge.select("age_at_account_start", "avg_amount"),
      "q21_monthly_spend" -> BikesharePipeline.q21MonthlySpendPerMember(w),
      "q22_spend_per_minute" -> BikesharePipeline.q22SpendPerMinutePerMember(w))
  }

  def runAll(spark: SparkSession, scale: Double): DataFrame = {
    val w = warehouseCached(spark, scale)
    val qs = gateFrames(w)
    // the four outputs the invariant rows below ALSO consume — shared
    // PLAN subtrees (no checkpoint: an eager pin is a serial extra job,
    // while inside the one union job the duplicated aggregation
    // exchanges dedupe via ReusedExchange)
    val byName = qs.toMap
    val q2df = byName("q2_total_duration_dow")
    val q12df = byName("q12_total_duration_member")
    val q13df = byName("q13_sum_month")
    val q17df = byName("q17_sum_year")
    val base = qs.map { case (name, df) =>
      // control total: sum of every numeric result column, rounded — a
      // cheap cross-run regression fingerprint on top of the cardinality
      val numerics = df.schema.fields.filter(f => f.dataType match {
        case _: org.apache.spark.sql.types.NumericType => true
        case _ => false
      }).map(f => sum(col(f.name).cast("double")))
      val ctrl =
        if (numerics.isEmpty) lit(0.0d)
        else round(numerics.reduce(_ + _), 2)
      df.agg(count(lit(1)).as("n_rows"), ctrl.as("control_total"))
        .select(lit(name).as("query"), col("n_rows"),
          col("control_total").cast("double").as("control_total"))
    }.reduce(_ unionByName _)
    // Invariant-golden rows: derived from the query outputs above
    // (≤12-row frames, no extra fact scan beyond the queries' own
    // aggregates), they
    // make the rows-only gate SELF-VALIDATING — the conservation residuals
    // must read exactly 0.00 (group sums re-adding to the global totals:
    // the property that breaks when a join type, key, or dim span is
    // wrong) and the totals/member-share pin BASELINE.md's golden anchors
    // at this scale (the generator is deterministic), so the driver's
    // hash of q129 pins VALUES, not just shape. BikeshareScaleSpec
    // asserts the same numbers against independent aggregates.
    val dur = q2df
      .agg(sum(col("total_duration").cast("double")).as("a"),
        count(lit(1)).as("cd"))
    val durM = q12df
      .agg(sum(col("total_duration").cast("double")).as("b"),
        sum(when(col("is_member"), col("total_duration").cast("double"))
          .otherwise(0.0)).as("mem"),
        count(lit(1)).as("cm"))
    val pay = q13df
      .agg(sum(col("total_amount").cast("double")).as("p"),
        count(lit(1)).as("cp"))
    val payY = q17df
      .agg(sum(col("total_amount").cast("double")).as("py"),
        count(lit(1)).as("cy"))
    // ONE invariant branch: the 5 rows explode out of a struct array
    // over the single one-row crossJoin, so the four source aggregations
    // appear once in the final plan (5 separate union branches would
    // re-evaluate them up to 5x, and an eager pin is a serial extra job)
    val one = dur.crossJoin(broadcast(durM)).crossJoin(broadcast(pay))
      .crossJoin(broadcast(payY))
    val invRows = Seq[(String, Column, Column)](
      ("_inv_total_duration", col("cd"), round(col("a"), 2)),
      ("_inv_duration_dow_vs_member", col("cm"),
        round(col("a") - col("b"), 2)),
      ("_inv_member_duration_share", col("cm"),
        round(col("mem") / col("b"), 6)),
      ("_inv_total_payments", col("cp"), round(col("p"), 2)),
      ("_inv_payments_month_vs_year", col("cy"),
        round(col("p") - col("py"), 2)))
      .map { case (n, c, v) =>
        struct(lit(n).as("query"), c.as("n_rows"),
          v.cast("double").as("control_total"))
      }
    val inv = one
      .select(explode(array(invRows: _*)).as("__r"))
      .select(col("__r.query"), col("__r.n_rows"),
        col("__r.control_total"))
    base.unionByName(inv)
  }
}

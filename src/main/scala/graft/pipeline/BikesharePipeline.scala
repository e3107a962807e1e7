package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schema.Bikeshare
import graft.sources.Tables
import graft.functions.Derived
import graft.operators.{Analytics, DateSpine}

/** The reference's 5-stage batch ETL (SURVEY.md §3.4) plus all 24 analytical
  * queries (§2.11), re-expressed Spark-first.
  *
  * Stage boundaries in the reference are Delta tables; here each stage is a
  * pure `DataFrame => DataFrame` so callers choose whether to materialize
  * (pipeline-breaking at scale) or fuse. `build` materializes nothing — on
  * a cluster you'd persist `conform`/`enrich` outputs partitioned by date.
  */
object BikesharePipeline {

  final case class Conformed(payments: DataFrame, trips: DataFrame,
                             riders: DataFrame, stations: DataFrame)
  final case class Warehouse(payments: DataFrame, trips: DataFrame,
                             riders: DataFrame, stations: DataFrame,
                             tripDates: DataFrame, paymentDates: DataFrame)

  /** Stages 2+3 — raw headerless CSV → typed tables (nb:250-264, 960-996).
    * Schema is declared at read time: the CSV parser casts in one pass.
    */
  def conformFromCsv(spark: SparkSession, dir: String): Conformed = Conformed(
    payments = Tables.readCsv(spark, s"$dir/payments.csv", Bikeshare.payments),
    trips    = Tables.readCsv(spark, s"$dir/trips.csv", Bikeshare.trips),
    riders   = Tables.readCsv(spark, s"$dir/riders.csv", Bikeshare.riders),
    stations = Tables.readCsv(spark, s"$dir/stations.csv", Bikeshare.stations))

  /** Stage 4a — derived columns + the build-time trips⋈riders
    * denormalization (nb:1072-1101). The riders side is pre-projected to
    * (rider_id, birthday) before the join — at scale this is a broadcast of
    * two columns, not the whole dim.
    */
  def enrichRiders(riders: DataFrame): DataFrame =
    riders.withColumn("age_at_account_start",
      Derived.ageYears(col("account_start_date"), col("birthday")))

  def enrichTrips(trips: DataFrame, riders: DataFrame): DataFrame =
    trips
      .withColumn("duration", Derived.durationSeconds(col("ended_at"), col("started_at")))
      .withColumn("time_id", Derived.timeId(col("started_at")))
      .join(broadcast(riders.select("rider_id", "birthday")), Seq("rider_id"), "inner")
      .withColumn("age_at_ride_time",
        Derived.ageYears(to_date(col("started_at")), col("birthday")))
      .select("trip_id", "rideable_type", "started_at", "ended_at",
        "start_station_id", "end_station_id", "rider_id", "duration",
        "time_id", "age_at_ride_time")

  /** Stages 4-5 — enrich + generated date dims → queryable warehouse. */
  def build(spark: SparkSession, c: Conformed): Warehouse = {
    val trips = enrichTrips(c.trips, c.riders)
    Warehouse(
      payments = c.payments,
      trips = trips,
      riders = enrichRiders(c.riders),
      stations = c.stations,
      tripDates = DateSpine.tripDates(spark, trips),
      paymentDates = DateSpine.paymentDates(spark, c.payments))
  }

  // ---- The 24 analytical queries (SURVEY.md §2.11) -------------------------
  // Q1-Q8: aggregate trips by an intrinsic column (template nb:1828-1848).

  private[pipeline] def tripsByDow(w: Warehouse): DataFrame =
    w.trips.withColumn("day_of_week", dayofweek(col("started_at")))

  def q1AvgDurationByDayOfWeek(w: Warehouse): DataFrame =
    Analytics.aggregateBy(tripsByDow(w), Seq("day_of_week"),
      Seq(avg("duration").as("avg_duration")))

  def q2TotalDurationByDayOfWeek(w: Warehouse): DataFrame =
    Analytics.aggregateBy(tripsByDow(w), Seq("day_of_week"),
      Seq(sum("duration").as("total_duration")))

  def q3AvgDurationByStartTime(w: Warehouse): DataFrame =
    Analytics.aggregateBy(w.trips, Seq("started_at"),
      Seq(avg("duration").as("avg_duration")))

  def q4TotalDurationByStartTime(w: Warehouse): DataFrame =
    Analytics.aggregateBy(w.trips, Seq("started_at"),
      Seq(sum("duration").as("total_duration")))

  def q5AvgDurationByStartStation(w: Warehouse): DataFrame =
    Analytics.aggregateBy(w.trips, Seq("start_station_id"),
      Seq(avg("duration").as("avg_duration")))

  def q6TotalDurationByStartStation(w: Warehouse): DataFrame =
    Analytics.aggregateBy(w.trips, Seq("start_station_id"),
      Seq(sum("duration").as("total_duration")))

  def q7AvgDurationByEndStation(w: Warehouse): DataFrame =
    Analytics.aggregateBy(w.trips, Seq("end_station_id"),
      Seq(avg("duration").as("avg_duration")))

  def q8TotalDurationByEndStation(w: Warehouse): DataFrame =
    Analytics.aggregateBy(w.trips, Seq("end_station_id"),
      Seq(sum("duration").as("total_duration")))

  // Q9/Q10 — by rider age at account start; expression-form join that keeps
  // both rider_id columns (J2 quirk, nb:3330-3332).
  private[pipeline] def tripsJoinRidersExpr(w: Warehouse): DataFrame =
    w.trips.join(w.riders, w.trips("rider_id") === w.riders("rider_id"))

  def q9TotalDurationByAge(w: Warehouse): DataFrame =
    tripsJoinRidersExpr(w).groupBy("age_at_account_start")
      .agg(sum("duration").as("total_duration"))
      .orderBy(col("total_duration").desc)

  def q10AvgDurationByAge(w: Warehouse): DataFrame =
    tripsJoinRidersExpr(w).groupBy("age_at_account_start")
      .agg(avg("duration").as("avg_duration"))
      .orderBy(col("avg_duration").desc)

  // Q11/Q12 — by membership (USING join, nb:3849-3874).
  def q11AvgDurationByMembership(w: Warehouse): DataFrame =
    Analytics.aggregateOverJoin(w.trips, w.riders, "rider_id", Seq("is_member"),
      Seq(avg("duration").as("avg_duration")))

  def q12TotalDurationByMembership(w: Warehouse): DataFrame =
    Analytics.aggregateOverJoin(w.trips, w.riders, "rider_id", Seq("is_member"),
      Seq(sum("duration").as("total_duration")))

  // Q13-Q18 — payments by month/quarter/year via the daily date dim
  // (template nb:4626-4657).
  def paymentsByDatePart(w: Warehouse, part: String, aggName: String): DataFrame = {
    val aggCol = aggName match {
      case "sum" => sum("amount").as("total_amount")
      case "avg" => avg("amount").as("avg_amount")
      case other => throw new IllegalArgumentException(
        s"aggName must be 'sum' or 'avg', got '$other'")
    }
    Analytics.aggregateOverJoin(w.payments, w.paymentDates, "date_id",
      Seq(part), Seq(aggCol))
  }

  // Q19/Q20 — member payments by age (J3 + F1, nb:4933-4965).
  def memberPaymentsByAge(w: Warehouse, aggName: String): DataFrame = {
    val aggCol = aggName match {
      case "sum" => sum("amount").as("total_amount")
      case "avg" => avg("amount").as("avg_amount")
      case other => throw new IllegalArgumentException(
        s"aggName must be 'sum' or 'avg', got '$other'")
    }
    Analytics.aggregateOverFilteredJoin(w.payments, w.riders,
      col("is_member") === true, "rider_id", Seq("age_at_account_start"), Seq(aggCol))
  }

  /** Q21 (EC1, nb:5160-5171) — per (rider, month): avg amount + ride count
    * for members. The reference's J5 trips⋈payments per-rider fan-out
    * aggregates over trips×payments PAIRS; that aggregate factorizes
    * exactly, so the pair rows are never materialized: within a
    * (rider, month) group every trip meets the rider's full payment set,
    * hence avg(amount) over pairs = (n_t·Σp)/(n_t·n_p) = the rider's plain
    * payment average (decimal sums are exact and mathematically equal
    * fractions round identically at the avg's result scale), and
    * count(trip_id) over pairs = n_t·n_p. Same rows, same types, same
    * values — without the |trips|×|payments|-per-rider intermediate
    * (~24M pair rows at bench scale 0.2, quadratic in rider activity at
    * 100 TB).
    */
  def q21MonthlySpendPerMember(w: Warehouse): DataFrame = {
    val payAgg = w.payments.groupBy("rider_id")
      .agg(avg("amount").as("avg_amount"), count(lit(1)).as("__n_pay"))
    w.trips
      .select(col("rider_id"), month(col("time_id")).as("month"), col("trip_id"))
      .groupBy("rider_id", "month")
      .agg(count("trip_id").as("__n_trip"))
      .join(payAgg, Seq("rider_id"))
      .join(w.riders.where(col("is_member") === true).select("rider_id"), Seq("rider_id"))
      .select(col("rider_id"), col("month"), col("avg_amount"),
        (col("__n_trip") * col("__n_pay")).as("num_rides"))
      .orderBy(col("num_rides").desc)
  }

  /** Q22 (EC2, nb:5365-5380) — per (rider, minutes, month): avg amount +
    * avg duration for members; the same exact factorization as Q21
    * (avg(duration) over pairs repeats each trip n_p times: integer-valued
    * double sums below 2^53 are exact, and (n_p·Σd)/(n_p·n_t) rounds to
    * the same double as Σd/n_t).
    */
  def q22SpendPerMinutePerMember(w: Warehouse): DataFrame = {
    val payAgg = w.payments.groupBy("rider_id")
      .agg(avg("amount").as("avg_amount"))
    w.trips
      .withColumn("month", month(col("time_id")))
      .withColumn("minutes", Derived.minutes(col("duration")))
      .groupBy("rider_id", "minutes", "month")
      .agg(avg("duration").as("avg_duration"))
      .join(payAgg, Seq("rider_id"))
      .join(w.riders.where(col("is_member")).select("rider_id"), Seq("rider_id"))
      .select("rider_id", "minutes", "month", "avg_amount", "avg_duration")
      .orderBy(col("avg_duration").desc)
  }

  // ---- Geo extensions (beyond the reference's 24 queries) -----------------
  // The stations dimension carries (latitude, longitude) the notebook never
  // computes with (nb:991); these are the distance queries that schema
  // implies.

  /** Station pairs within `maxKm` — the docking-network density /
    * rebalancing-radius report, via the grid-blocked proximity join (no
    * stations² cross product even at city scale).
    */
  def stationNeighbors(w: Warehouse, maxKm: Double): DataFrame =
    graft.functions.Geo.neighborPairs(
      w.stations.select(col("station_id").as("id"),
        col("latitude"), col("longitude")),
      "id", "latitude", "longitude", maxKm)

  /** Per-trip great-circle distance and straight-line speed: trips join
    * the stations dim twice (both broadcast — the dim is tiny), then one
    * scan-side haversine. Round trips (same start/end) report 0 km.
    */
  def tripDistances(w: Warehouse): DataFrame = {
    val start = w.stations.select(col("station_id").as("start_station_id"),
      col("latitude").as("__lat_s"), col("longitude").as("__lon_s"))
    val end = w.stations.select(col("station_id").as("end_station_id"),
      col("latitude").as("__lat_e"), col("longitude").as("__lon_e"))
    w.trips
      .join(broadcast(start), Seq("start_station_id"))
      .join(broadcast(end), Seq("end_station_id"))
      .withColumn("km", graft.functions.Geo.haversineKm(
        col("__lat_s"), col("__lon_s"), col("__lat_e"), col("__lon_e")))
      .withColumn("kmh",
        when(col("duration") > 0, col("km") / (col("duration") / 3600.0)))
      .drop("__lat_s", "__lon_s", "__lat_e", "__lon_e")
  }
}

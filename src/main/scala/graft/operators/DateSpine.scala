package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Derived

/** Date-dimension builders (SURVEY.md §2.8 G1, nb:1181-1196 / 1578-1661).
  *
  * The reference collects min/max scalars, splices them into SQL text, and
  * explodes a `sequence(...)`. We keep the two-step (scalar agg → generate)
  * but pass the scalars as typed literals — no string splicing. The
  * `Generate` node produces the spine on a single task (spines are ≤ tens of
  * thousands of rows regardless of fact scale, so this never bottlenecks);
  * the expensive part is the min/max scan, which is a partial+final agg over
  * the fact.
  */
object DateSpine {

  /** Daily spine over [min, max] of a date column → payment_dates-shaped dim:
    * `date_id date, month int, quarter int, year int` (nb:1649-1661).
    */
  def paymentDates(spark: SparkSession, payments: DataFrame,
                   dateCol: String = "date_id"): DataFrame = {
    val r = payments.agg(min(to_date(col(dateCol))), max(to_date(col(dateCol)))).head()
    if (r.isNullAt(0)) // empty/all-null input → empty spine, not a NullType crash
      return spark.emptyDataFrame.select(lit(null).cast("date").as("date_id"),
        lit(null).cast("int").as("month"), lit(null).cast("int").as("quarter"),
        lit(null).cast("int").as("year")).limit(0)
    val (lo, hi) = (r.getDate(0), r.getDate(1))
    spark.range(1).select(
        explode(sequence(lit(lo), lit(hi), expr("INTERVAL 1 DAY"))).as("date_id"))
      .select(col("date_id"),
        month(col("date_id")).as("month"),
        quarter(col("date_id")).as("quarter"),
        year(col("date_id")).as("year"))
      .orderBy("date_id")
  }

  /** Hourly spine over [min, max] of a timestamp column → trip_dates-shaped
    * dim: `time_id timestamp, day_of_week int, time_of_day string`
    * (nb:1578-1593). `day_of_week` keeps Spark's 1=Sunday semantics —
    * golden outputs depend on it (SURVEY.md §4.3).
    */
  def tripDates(spark: SparkSession, trips: DataFrame,
                tsCol: String = "time_id"): DataFrame = {
    val r = trips.agg(min(col(tsCol)), max(col(tsCol))).head()
    if (r.isNullAt(0))
      return spark.emptyDataFrame.select(
        lit(null).cast("timestamp").as("time_id"),
        lit(null).cast("int").as("day_of_week"),
        lit(null).cast("string").as("time_of_day")).limit(0)
    val (lo, hi) = (r.getTimestamp(0), r.getTimestamp(1))
    spark.range(1).select(
        explode(sequence(lit(lo), lit(hi), expr("INTERVAL 1 HOUR"))).as("time_id"))
      .select(col("time_id"),
        dayofweek(col("time_id")).as("day_of_week"),
        Derived.timeOfDay(col("time_id")).as("time_of_day"))
      .orderBy("time_id")
  }
}

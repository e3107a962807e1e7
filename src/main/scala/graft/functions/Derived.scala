package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Derived-column library (SURVEY.md §2.2 P4 and §2.9 scalar functions).
  *
  * Each function mirrors a derived column the reference builds, expressed as
  * a pure `Column` expression so it stays inside whole-stage codegen and is
  * usable in any projection.
  */
object Derived {

  /** Trip duration in whole seconds (nb:1080). The reference computes
    * `(ended_at - started_at).cast(long)`; interval semantics changed
    * between Spark 3.2 and 4.x, so we subtract epoch-seconds directly —
    * identical result, version-stable (SURVEY.md §4.3).
    */
  def durationSeconds(endedAt: Column, startedAt: Column): Column =
    (endedAt.cast("long") - startedAt.cast("long")).as("duration")

  /** Hour-truncated timestamp FK into the hourly date dim (nb:1081). */
  def timeId(startedAt: Column): Column =
    date_trunc("hour", startedAt).as("time_id")

  /** Age in whole years via day-count / 365, truncated toward zero —
    * the reference's exact (non-calendar) formula (nb:1084, nb:1094).
    */
  def ageYears(atDate: Column, birthday: Column): Column =
    (datediff(atDate, birthday) / lit(365)).cast("int")

  /** Duration bucketed to whole minutes (nb:5370). */
  def minutes(durationSecs: Column): Column =
    (durationSecs / lit(60)).cast("int").as("minutes")

  /** Time-of-day bucketing CASE (nb:1582-1587): hour 5-11 morning,
    * 12-16 afternoon, 17-21 evening, else night.
    */
  def timeOfDay(ts: Column): Column = {
    val h = hour(ts)
    when(h.between(5, 11), "morning")
      .when(h.between(12, 16), "afternoon")
      .when(h.between(17, 21), "evening")
      .otherwise("night")
  }
}

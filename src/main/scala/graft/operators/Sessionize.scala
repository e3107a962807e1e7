package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization (gap-based) as a window-function pipeline — the
  * batch mirror of the streaming session windows in
  * [[graft.streaming.EventStreams]]. One shuffle on the user key; the
  * lag/cumsum pass is a single sorted scan per user partition.
  */
object Sessionize {

  /** Assign a session id per (user, run of events with gaps < `gapSeconds`).
    * Deterministic tiebreaker on the event id keeps equal timestamps stable.
    */
  def assign(events: DataFrame, userCol: String, tsCol: String, idCol: String,
             gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull, 1)
          .when(col(tsCol).cast("long") - col("prev_ts").cast("long") > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("prev_ts", "new_session")
  }

  /** Session count + bounds per user. */
  def perUserStats(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, gapSeconds: Long): DataFrame =
    assign(events, userCol, tsCol, idCol, gapSeconds)
      .groupBy(userCol)
      .agg(max("session_seq").as("n_sessions"),
        count(lit(1)).as("n_events"))
}

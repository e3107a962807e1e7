package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface over the `events` table shape
  * (`event_id long, ts timestamp, user_id long, event_type string,
  * value double, props string`).
  *
  * The reference is batch-only (SURVEY.md §2.10); this is the engine's
  * streaming extension: the same aggregations expressed incrementally with
  * watermarked state. Transform functions are shared between the batch and
  * streaming paths — `spark.read` vs `spark.readStream` produce the same
  * logical plan shape, so correctness is testable in batch and the
  * streaming path only adds state/watermark semantics.
  */
object EventStreams {

  val eventsSchema: StructType = StructType.fromDDL(
    "event_id long, ts timestamp, user_id long, event_type string, " +
      "value double, props string")

  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema).parquet(dir)

  /** Tumbling-window counts/sums per event type with a 10-minute watermark —
    * late rows beyond the watermark are dropped, state is bounded.
    */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding-window per-user activity (1h window, 15m slide). */
  def slidingUserActivity(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("user_id"), col("n_events"))

  /** Session windows (native session_window, gap-based) — streaming
    * equivalent of [[graft.operators.Sessionize]].
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Run a streaming query to completion against a static directory via the
    * memory sink — used by tests to assert streaming results equal the batch
    * equivalents.
    */
  def runToMemory(df: DataFrame, name: String, mode: String = "append"): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
  }
}

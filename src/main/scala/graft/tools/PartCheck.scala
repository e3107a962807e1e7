package graft.tools

import graft.Engine
import org.apache.spark.sql.functions._

/** Scratch experiment: does a localCheckpoint of a repartitioned frame
  * preserve its HashPartitioning (so a downstream same-key join skips the
  * exchange)? Prints the physical plans; look for Exchange nodes.
  */
object PartCheck {
  def main(args: Array[String]): Unit = {
    val spark = Engine.localSession(8, "partcheck")
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    println(s"numShufflePartitions=$n")
    val a = (1L to 10000L).toDF("id")
      .withColumn("v", col("id") * 2)
      .repartition(n, col("id"))
      .localCheckpoint(eager = true)
    val b = (1L to 10000L).toDF("id")
      .withColumn("w", col("id") * 3)
      .repartition(n, col("id"))
      .localCheckpoint(eager = true)
    println("=== a plan (pinned) ===")
    println(a.queryExecution.executedPlan.outputPartitioning)
    val j = a.join(b.hint("shuffle_hash"), "id")
    println("=== join plan ===")
    println(j.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    // after an agg keyed the same way, is partitioning carried?
    val g = j.groupBy("id").agg(sum("v").as("sv"))
    val j2 = g.join(a.hint("shuffle_hash"), "id")
    println("=== agg-then-join plan ===")
    println(j2.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    // rename path: does partitioning survive withColumnRenamed?
    val j3 = a.withColumnRenamed("id", "nid")
      .join(b.hint("shuffle_hash"), col("nid") === col("id"))
    println("=== renamed join plan ===")
    println(j3.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-log analytics beyond sessionization: conversion funnels and
  * retention cohorts — the two queries every product-analytics user runs
  * against an events table (the reference's bikeshare warehouse has no
  * event stream; this serves the engine's events surface alongside
  * [[Sessionize]] and the streaming module).
  */
object EventAnalytics {

  /** First-touch conversion funnel: per user, the timestamp of stage 0's
    * FIRST occurrence, then for each later stage the first occurrence
    * STRICTLY AFTER the previous stage's resolved time. A user's funnel
    * row carries one nullable timestamp per stage; a null at stage i means
    * the user never converted past stage i-1 (later stages are null too by
    * construction).
    *
    * Shape for scale: one filtered aggregate per stage, each a partial-
    * aggregable `min` keyed on the user — stage count is small and fixed,
    * so this is `stages` compact shuffles, never a per-user sort or a
    * window over raw events. Events outside the stage list are filtered
    * scan-side before any shuffle.
    */
  /** Funnel computation on INDEX-based internal column names (`__t0`,
    * `__t1`, ...): stage VALUES are data, and resolving columns named
    * after them (`t_<stage>`) breaks at analysis time the moment a stage
    * string contains '.', backticks or other name-special characters —
    * legitimate event-type values. Only the final projection derives
    * stage-named output columns (safe: `.as()` takes the name literally).
    */
  private def funnelIdx(df: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct: $stages")
    val relevant = df.where(col(typeCol).isin(stages: _*))
      .select(col(userCol).as("user"), col(tsCol).as("ts"),
        col(typeCol).as("tp"))
    val first = relevant.where(col("tp") === stages.head)
      .groupBy("user").agg(min("ts").as("__t0"))
    stages.indices.drop(1).foldLeft(first) { (acc, i) =>
      val prev = s"__t${i - 1}"
      val next = relevant.where(col("tp") === stages(i))
        .join(acc.select(col("user"), col(prev)), Seq("user"))
        .where(col("ts") > col(prev))
        .groupBy("user").agg(min("ts").as(s"__t$i"))
      acc.join(next.select(col("user").as("__u"), col(s"__t$i")),
          col("user") === col("__u"), "left")
        .drop("__u")
    }
  }

  def funnel(df: DataFrame, userCol: String, tsCol: String, typeCol: String,
             stages: Seq[String]): DataFrame =
    funnelIdx(df, userCol, tsCol, typeCol, stages)
      .select(col("user") +: stages.indices.map(i =>
        col(s"__t$i").as(s"t_${stages(i)}")): _*)

  /** Funnel rollup: how many users reached each stage (reached = non-null
    * resolved time), in declared stage order.
    */
  def funnelCounts(df: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String]): DataFrame = {
    val f = funnelIdx(df, userCol, tsCol, typeCol, stages)
    val counts = stages.zipWithIndex.map { case (s, i) =>
      struct(lit(i).as("stage_idx"), lit(s).as("stage"),
        count(col(s"__t$i")).as("n_users"))
    }
    f.agg(explode(array(counts: _*)).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.n_users"))
  }

  /** Weekly retention cohorts: each user's cohort is the week-index of
    * their FIRST event (weeks = whole 7-day buckets since the global
    * earliest event — no calendar-week dialect to disagree on); for each
    * offset k ≤ `maxWeeks`, how many of the cohort's users were active in
    * cohort+k. One first-event aggregate, one distinct over (cohort, k,
    * user) — both user-keyed partial aggregates; the global min is a
    * scalar broadcast.
    */
  def weeklyRetention(df: DataFrame, userCol: String, tsCol: String,
                      maxWeeks: Int = 4): DataFrame = {
    require(maxWeeks >= 0)
    val ev = df.select(col(userCol).as("user"), col(tsCol).as("ts"))
    val epoch0 = ev.agg(min(unix_timestamp(col("ts"))).as("e0"))
    def weekOf(ts: Column, e0: Column) =
      floor((unix_timestamp(ts) - e0) / 604800L).cast("int")
    val firsts = ev.groupBy("user").agg(min("ts").as("first_ts"))
      .crossJoin(broadcast(epoch0))
      .select(col("user"), weekOf(col("first_ts"), col("e0")).as("cohort"))
    val active = ev.crossJoin(broadcast(epoch0))
      .select(col("user"), weekOf(col("ts"), col("e0")).as("week"))
      .distinct()
    firsts.join(active, Seq("user"))
      .withColumn("k", col("week") - col("cohort"))
      .where(col("k").between(0, maxWeeks))
      .groupBy("cohort", "k")
      .agg(countDistinct("user").as("n_users"))
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.BikesharePipeline
import graft.schema.Bikeshare

/** Reference-exact semantics on the in-repo bikeshare fixtures
  * (FIXTURES.md §A). Goldens are hand-computed from the fixture rows per
  * SURVEY.md §2.11 — including the Q21 trips⋈payments fan-out quirk.
  */
class BikesharePipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val dir = TestSpark.resourceDir("bikeshare")
  private lazy val conformed = BikesharePipeline.conformFromCsv(spark, dir)
  private lazy val wh = BikesharePipeline.build(spark, conformed)

  test("conform: declared schemas applied at read time") {
    assert(conformed.trips.schema === Bikeshare.trips)
    assert(conformed.riders.schema === Bikeshare.riders)
    assert(conformed.payments.schema === Bikeshare.payments)
    assert(conformed.stations.schema === Bikeshare.stations)
    assert(conformed.trips.count() === 5)
    assert(conformed.riders.count() === 3)
    assert(conformed.payments.count() === 6)
  }

  test("enrich: durations, time_id, ages (nb:1080-1095 semantics)") {
    val d = wh.trips.select("trip_id", "duration").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d === Map("T1" -> 1800L, "T2" -> 600L, "T3" -> 2700L,
      "T4" -> 1200L, "T5" -> 3600L))
    val tid = wh.trips.where("trip_id = 'T1'")
      .select("time_id").head().getTimestamp(0)
    assert(tid === java.sql.Timestamp.valueOf("2021-02-01 06:00:00"))
    // rider 1000: born 1989-02-13, account 2019-04-23 → floor(days/365)=30
    val age = wh.riders.where("rider_id = 1000")
      .select("age_at_account_start").head().getInt(0)
    assert(age === 30)
  }

  test("Q1: avg duration by day_of_week (golden)") {
    val got = BikesharePipeline.q1AvgDurationByDayOfWeek(wh).collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
    // Sun(1)=3600 (T5), Tue(3)=2700 (T3), Mon(2)=(1800+600)/2=1200, Wed(4)=1200
    assert(got.head === ((1, 3600.0)))
    assert(got(1) === ((3, 2700.0)))
    assert(got.map(_._2).sorted.reverse === got.map(_._2))
  }

  test("Q2-Q8: remaining intrinsic-column aggregates (goldens)") {
    val q2 = BikesharePipeline.q2TotalDurationByDayOfWeek(wh).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(q2 === Map(1 -> 3600L, 2 -> 2400L, 3 -> 2700L, 4 -> 1200L))
    // Q3/Q4 group by raw started_at (near-unique keys — per-trip rank)
    assert(BikesharePipeline.q3AvgDurationByStartTime(wh).count() === 5)
    val q4Top = BikesharePipeline.q4TotalDurationByStartTime(wh).head()
    assert(q4Top.getLong(1) === 3600L) // T5 longest
    val q5 = BikesharePipeline.q5AvgDurationByStartStation(wh).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(q5 === Map("S1" -> 2000.0, "S2" -> 1950.0)) // S1: (1800+600+3600)/3
    val q6 = BikesharePipeline.q6TotalDurationByStartStation(wh).collect()
    assert(q6.head.getString(0) === "S1" && q6.head.getLong(1) === 6000L)
    val q7 = BikesharePipeline.q7AvgDurationByEndStation(wh).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(q7 === Map("S1" -> 3150.0, "S2" -> 1200.0)) // S1 end: T3,T5
    val q8 = BikesharePipeline.q8TotalDurationByEndStation(wh).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q8 === Map("S1" -> 6300L, "S2" -> 3600L))
    val q10 = BikesharePipeline.q10AvgDurationByAge(wh).collect()
    assert(q10.map(_.getDouble(1)).sorted.reverse === q10.map(_.getDouble(1)))
  }

  test("Q11/Q12: membership aggregates via USING join (golden)") {
    val avg = BikesharePipeline.q11AvgDurationByMembership(wh).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) === 2175.0)  // (1800+600+3600+2700)/4
    assert(avg(false) === 1200.0) // T4
    val tot = BikesharePipeline.q12TotalDurationByMembership(wh).collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(tot(true) === 8700L)
    assert(tot(false) === 1200L)
  }

  test("Q9: expression-form join keeps duplicate rider_id columns upstream (J2 quirk)") {
    val joined = wh.trips.join(wh.riders,
      wh.trips("rider_id") === wh.riders("rider_id"))
    assert(joined.columns.count(_ == "rider_id") === 2)
    val got = BikesharePipeline.q9TotalDurationByAge(wh).collect()
    assert(got.map(_.getLong(1)).sorted.reverse === got.map(_.getLong(1)))
  }

  test("date dims: hourly + daily spines (G1 golden row counts)") {
    // trips: 2021-02-01 06:00 → 2021-02-07 06:00 hourly = 6*24+1 = 145
    assert(wh.tripDates.count() === 145)
    // payments: 2020-12-01 → 2021-04-01 daily = 121+1 = 122
    assert(wh.paymentDates.count() === 122)
    assert(wh.tripDates.schema.fields.map(f => (f.name, f.dataType)).toSeq === Seq(
      ("time_id", TimestampType),
      ("day_of_week", IntegerType),
      ("time_of_day", StringType)))
    val tod = wh.tripDates.where("time_id = timestamp'2021-02-01 06:00:00'")
      .select("time_of_day").head().getString(0)
    assert(tod === "morning")
  }

  test("date spines on empty input return empty dims, not a crash") {
    import graft.operators.DateSpine
    val emptyP = conformed.payments.where("payment_id < 0")
    val emptyT = wh.trips.where("trip_id = 'none'")
    assert(DateSpine.paymentDates(spark, emptyP).count() === 0)
    assert(DateSpine.tripDates(spark, emptyT).count() === 0)
    intercept[IllegalArgumentException] {
      BikesharePipeline.paymentsByDatePart(wh, "month", "median")
    }
  }

  test("Q13-18: payment aggregates by month/quarter/year") {
    val byYear = BikesharePipeline.paymentsByDatePart(wh, "year", "sum").collect()
      .map(r => r.getInt(0) -> r.getDecimal(1).longValue()).toMap
    assert(byYear === Map(2021 -> 42L, 2020 -> 9L))
    val avgByMonth = BikesharePipeline.paymentsByDatePart(wh, "month", "avg").collect()
      .map(r => r.getInt(0) -> r.getDecimal(1).doubleValue()).toMap
    // Feb: (9+12+7)/3 ; Mar: 9 ; Apr: 5 ; Dec: 9
    assert(avgByMonth(2).round === 9L)
    assert(avgByMonth(3) === 9.0)
  }

  test("gate fusion: every fused pair projection equals its public query") {
    // the q129 gate derives each avg/sum query pair from ONE fused
    // aggregation (BikeshareGen.gateFrames); the projections must carry
    // the exact rows of the individual spec-pinned functions
    val fused = graft.pipeline.BikeshareGen.gateFrames(wh).toMap
    val pub: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "q1_avg_duration_dow" -> BikesharePipeline.q1AvgDurationByDayOfWeek(wh),
      "q2_total_duration_dow" -> BikesharePipeline.q2TotalDurationByDayOfWeek(wh),
      "q3_avg_duration_start" -> BikesharePipeline.q3AvgDurationByStartTime(wh),
      "q4_total_duration_start" -> BikesharePipeline.q4TotalDurationByStartTime(wh),
      "q5_avg_duration_sstation" -> BikesharePipeline.q5AvgDurationByStartStation(wh),
      "q6_total_duration_sstation" -> BikesharePipeline.q6TotalDurationByStartStation(wh),
      "q7_avg_duration_estation" -> BikesharePipeline.q7AvgDurationByEndStation(wh),
      "q8_total_duration_estation" -> BikesharePipeline.q8TotalDurationByEndStation(wh),
      "q9_total_duration_age" -> BikesharePipeline.q9TotalDurationByAge(wh),
      "q10_avg_duration_age" -> BikesharePipeline.q10AvgDurationByAge(wh),
      "q11_avg_duration_member" -> BikesharePipeline.q11AvgDurationByMembership(wh),
      "q12_total_duration_member" -> BikesharePipeline.q12TotalDurationByMembership(wh),
      "q13_sum_month" -> BikesharePipeline.paymentsByDatePart(wh, "month", "sum"),
      "q14_avg_month" -> BikesharePipeline.paymentsByDatePart(wh, "month", "avg"),
      "q15_sum_quarter" -> BikesharePipeline.paymentsByDatePart(wh, "quarter", "sum"),
      "q16_avg_quarter" -> BikesharePipeline.paymentsByDatePart(wh, "quarter", "avg"),
      "q17_sum_year" -> BikesharePipeline.paymentsByDatePart(wh, "year", "sum"),
      "q18_avg_year" -> BikesharePipeline.paymentsByDatePart(wh, "year", "avg"),
      "q19_sum_member_age" -> BikesharePipeline.memberPaymentsByAge(wh, "sum"),
      "q20_avg_member_age" -> BikesharePipeline.memberPaymentsByAge(wh, "avg"))
    pub.foreach { case (name, df) =>
      val f = fused(name)
      assert(f.columns.toSeq === df.columns.toSeq, s"$name columns")
      assert(f.schema.map(_.dataType) === df.schema.map(_.dataType),
        s"$name types")
      assert(f.collect().toSet === df.collect().toSet, s"$name rows")
    }
  }

  test("Q21: EC1 fan-out semantics preserved (trips×payments per rider)") {
    val got = BikesharePipeline.q21MonthlySpendPerMember(wh).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDecimal(2).doubleValue(), r.getLong(3)))
    // rider 1000: 3 trips × 3 payments = 9 pairs, all trips in Feb; avg amount 9
    // rider 1001: 1 trip × 2 payments = 2 pairs; avg (12+7)/2 = 9.5
    assert(got.toSet === Set((1000, 2, 9.0, 9L), (1001, 2, 9.5, 2L)))
    assert(got.head._4 === 9L) // ordered by num_rides desc
  }

  test("Q22: EC2 per (rider, minutes, month)") {
    val got = BikesharePipeline.q22SpendPerMinutePerMember(wh).collect()
    assert(got.nonEmpty)
    val durs = got.map(_.getAs[Double]("avg_duration"))
    assert(durs.sorted.reverse === durs)
  }

  test("geo extensions: station proximity and per-trip distances") {
    // S1 (41.0, -87.6) ↔ S2 (42.0, -87.7): ~111.5 km apart
    val pairs = BikesharePipeline.stationNeighbors(wh, maxKm = 120.0)
      .collect()
    assert(pairs.length === 1)
    assert(math.abs(pairs.head.getAs[Double]("km") - 111.5) < 1.0)
    assert(BikesharePipeline.stationNeighbors(wh, maxKm = 100.0)
      .count() === 0)
    val d = BikesharePipeline.tripDistances(wh)
      .select("trip_id", "km", "kmh").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    // S1↔S2 trips carry the station distance; same-station trips are 0
    assert(math.abs(d("T1")._1 - 111.5) < 1.0)
    assert(math.abs(d("T3")._1 - 111.5) < 1.0)
    assert(d("T4")._1 === 0.0 && d("T5")._1 === 0.0)
    // T1: 1800 s over ~111.5 km → ~223 "km/h" straight-line
    assert(math.abs(d("T1")._2 - d("T1")._1 * 2) < 1e-9)
  }

  test("pipeline writes/reads managed tables (S2-S5 round trip)") {
    import graft.sources.Tables
    Tables.dropTable(spark, "graft_test_riders")
    Tables.saveTable(conformed.riders, "graft_test_riders")
    val back = Tables.table(spark, "graft_test_riders")
    assert(back.count() === 3)
    // snapshot-safe self-overwrite (Parquet lacks Delta's MVCC; §3.4 risk)
    Tables.replaceTable(back.where("is_member = true"), "graft_test_riders")
    assert(Tables.table(spark, "graft_test_riders").count() === 2)
    Tables.dropTable(spark, "graft_test_riders")
  }

  test("partitioned + bucketed table sinks (100 TB layout helpers)") {
    import graft.sources.Tables
    import org.apache.spark.sql.functions._
    Tables.dropTable(spark, "graft_test_trips_part")
    Tables.dropTable(spark, "graft_test_trips_buck")
    val trips = wh.trips.withColumn("trip_date", to_date(col("started_at")))
    Tables.savePartitioned(trips, "graft_test_trips_part", Seq("trip_date"))
    val part = Tables.table(spark, "graft_test_trips_part")
    assert(part.count() === 5)
    // partition pruning: a date filter must prune at the partition level
    val pruned = part.where(col("trip_date") === "2021-02-01")
    assert(pruned.count() === 2)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    Tables.saveBucketed(wh.trips, "graft_test_trips_buck", 4, Seq("rider_id"))
    assert(Tables.table(spark, "graft_test_trips_buck").count() === 5)
    Tables.dropTable(spark, "graft_test_trips_part")
    Tables.dropTable(spark, "graft_test_trips_buck")
  }

  test("co-located join: tables bucketed on the same key join with ZERO exchanges") {
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    Tables.dropTable(spark, "graft_buck_a")
    Tables.dropTable(spark, "graft_buck_b")
    Tables.saveBucketed(
      spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("va")),
      "graft_buck_a", 4, Seq("k"))
    Tables.saveBucketed(
      spark.range(0, 1000).select(col("id").as("k"), (col("id") * 3).as("vb")),
      "graft_buck_b", 4, Seq("k"))
    // force the SMJ path a 100 TB fact-fact join takes (no broadcast)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Tables.table(spark, "graft_buck_a")
        .join(Tables.table(spark, "graft_buck_b"), Seq("k"))
      // matching bucket layout on both sides: sort happens per bucket, but
      // NO shuffle (and no broadcast) anywhere in the plan
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.linesIterator.take(12).mkString("\n"))
      assert(j.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      Tables.dropTable(spark, "graft_buck_a")
      Tables.dropTable(spark, "graft_buck_b")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{BikeshareGen, BikesharePipeline}
import graft.schema.Bikeshare

/** The reference-scale E2E (VERDICT r6 item 1): the 5-stage pipeline +
  * Q1-Q22 run at the reference's published row counts (≈4.58 M trips,
  * ≈2.05 M payments, 75 K riders — BASELINE.md), with invariant goldens
  * instead of value goldens: the corpus is synthetic, so what must hold
  * are the CONSERVATION laws of the star schema (joins preserve facts,
  * partition sums re-add to global totals, fan-out multiplicities equal
  * their closed-form products) — exactly the properties that break when a
  * join type, key, or dim span is wrong, independent of the data's values.
  * Value-level semantics are pinned by BikesharePipelineSpec's hand-
  * computed fixture goldens; this spec proves the same plans behave at
  * 6 orders of magnitude more rows.
  */
class BikeshareScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val sizes = BikeshareGen.sizes(1.0)
  private lazy val conformed = BikeshareGen.conformedCached(spark, 1.0)
  private lazy val wh = BikesharePipeline.build(spark, conformed)

  // Nullability-normalized comparison: the generator derives every column
  // from non-null range ids, so some arrive provably non-null — a STRICTLY
  // STRONGER guarantee than the declared nullable=true (parquet-read data
  // is always nullable). Names/order/types must still match exactly;
  // `.to(declared)` in BikeshareGen.conformed pins those, and Spark's `to`
  // deliberately keeps the tighter nullability rather than widening it.
  private def relaxed(s: org.apache.spark.sql.types.StructType) =
    org.apache.spark.sql.types.StructType(
      s.fields.map(_.copy(nullable = true, metadata =
        org.apache.spark.sql.types.Metadata.empty)))

  test("generated corpus matches the reference's schemas and row counts") {
    assert(relaxed(conformed.trips.schema) === relaxed(Bikeshare.trips))
    assert(relaxed(conformed.riders.schema) === relaxed(Bikeshare.riders))
    assert(relaxed(conformed.payments.schema) === relaxed(Bikeshare.payments))
    assert(relaxed(conformed.stations.schema) === relaxed(Bikeshare.stations))
    assert(conformed.trips.count() === sizes.trips)       // 4,580,000
    assert(conformed.payments.count() === sizes.payments) // 2,050,000
    assert(conformed.riders.count() === sizes.riders)     // 75,000
    assert(conformed.stations.count() === sizes.stations.toLong)
    // dims are keyed: no duplicate ids at any scale
    assert(conformed.riders.select("rider_id").distinct().count() === sizes.riders)
    assert(conformed.stations.select("station_id").distinct().count()
      === sizes.stations.toLong)
  }

  test("enrichment joins preserve every fact row (FK integrity by construction)") {
    // trips⋈riders is inner: a single orphan rider_id would drop rows here
    assert(wh.trips.count() === sizes.trips)
    // station FKs resolve against the dim the same way
    val resolved = conformed.trips
      .join(conformed.stations.select(col("station_id").as("start_station_id")),
        Seq("start_station_id"))
      .count()
    assert(resolved === sizes.trips)
    // enriched trips carry the derived columns with sane values
    val bad = wh.trips.where(
      col("duration") < 300 || col("duration") > 2315 ||
        col("age_at_ride_time") < 20 || col("age_at_ride_time") > 77 ||
        col("time_id") =!= date_trunc("hour", col("started_at"))).count()
    assert(bad === 0L)
  }

  test("date spines span the fact ranges exactly (hourly / daily grain)") {
    val t = wh.trips.agg(min("time_id"), max("time_id")).head()
    val hours = (t.getTimestamp(1).getTime - t.getTimestamp(0).getTime) /
      3600000L + 1
    assert(wh.tripDates.count() === hours)
    // ≈ the reference's 8,735-row hourly spine (1-year span)
    assert(hours > 8700 && hours <= 8761, s"hourly spine $hours")
    val p = conformed.payments.agg(min("date_id"), max("date_id")).head()
    val days = (p.getDate(1).toLocalDate.toEpochDay -
      p.getDate(0).toLocalDate.toEpochDay) + 1
    assert(wh.paymentDates.count() === days)
    // ≈ the reference's 3,288-row daily spine (9-year span)
    assert(days > 3250 && days <= 3288, s"daily spine $days")
    // spine keys are unique — the dim join can only preserve, never fan out
    assert(wh.tripDates.select("time_id").distinct().count() === hours)
    assert(wh.paymentDates.select("date_id").distinct().count() === days)
  }

  test("Q2/Q12: group sums re-add to the global duration total") {
    val total = wh.trips.agg(sum("duration")).head().getLong(0)
    val byDow = BikesharePipeline.q2TotalDurationByDayOfWeek(wh).collect()
    assert(byDow.length === 7)
    assert(byDow.map(_.getAs[Long]("total_duration")).sum === total)
    val byMember = BikesharePipeline.q12TotalDurationByMembership(wh).collect()
    assert(byMember.length === 2) // members and casuals both present
    assert(byMember.map(_.getAs[Long]("total_duration")).sum === total)
    // mean duration lands on the generator's design center (≈1307 s, the
    // reference's observed 1307.5 s avg)
    val avg = total.toDouble / sizes.trips
    assert(avg > 1290 && avg < 1325, s"avg duration $avg")
  }

  test("Q13/Q17: date-part sums re-add to the global payment total") {
    val total = conformed.payments.agg(sum(col("amount").cast("long")))
      .head().getLong(0)
    val byMonth = BikesharePipeline.paymentsByDatePart(wh, "month", "sum").collect()
    assert(byMonth.length === 12)
    assert(byMonth.map(_.getAs[java.math.BigDecimal]("total_amount").longValue).sum
      === total)
    val byYear = BikesharePipeline.paymentsByDatePart(wh, "year", "sum").collect()
    assert(byYear.length === 10) // 2013..2022
    assert(byYear.map(_.getAs[java.math.BigDecimal]("total_amount").longValue).sum
      === total)
    // whole-dollar decimal(10,0) fees, mean ≈ the reference's 10.00
    val mean = total.toDouble / sizes.payments
    assert(mean > 9.8 && mean < 10.2, s"mean amount $mean")
  }

  test("Q9: expression join keeps both rider_id columns (J2 quirk) at scale") {
    val joined = wh.trips.join(wh.riders,
      wh.trips("rider_id") === wh.riders("rider_id"))
    assert(joined.columns.count(_ == "rider_id") === 2)
    val byAge = BikesharePipeline.q9TotalDurationByAge(wh)
    val ages = byAge.collect().map(_.getAs[Int]("age_at_account_start"))
    assert(ages.length === ages.distinct.length)
    // descending order as declared
    val totals = byAge.collect().map(_.getAs[Long]("total_duration"))
    assert(totals.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("Q21 fan-out: num_rides equals trips-in-month × payments, per rider") {
    // the reference's J5 quirk: joining trips⋈payments on rider_id before
    // grouping multiplies each month's ride count by the rider's payment
    // count — verify the closed form on the 3 busiest result rows
    val top = BikesharePipeline.q21MonthlySpendPerMember(wh).limit(3).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      val rid = r.getAs[Int]("rider_id")
      val m = r.getAs[Int]("month")
      val nTrips = wh.trips.where(col("rider_id") === rid &&
        month(col("time_id")) === m).count()
      val nPays = conformed.payments.where(col("rider_id") === rid).count()
      assert(r.getAs[Long]("num_rides") === nTrips * nPays,
        s"rider $rid month $m: ${r.getAs[Long]("num_rides")} != $nTrips*$nPays")
      // and the rider really is a member (the filter side of the join)
      assert(conformed.riders.where(col("rider_id") === rid)
        .head().getAs[Boolean]("is_member"))
    }
  }

  test("runAll executes all 22 queries and is deterministic across runs") {
    val a = BikeshareGen.runAll(spark, 1.0).orderBy("query").collect()
    assert(a.length === 27) // 22 queries + 5 invariant-golden rows
    assert(a.forall(_.getAs[Long]("n_rows") > 0))
    // group-by-raw-timestamp queries (Q3/Q4) have near-fact cardinality;
    // the rest are small aggregates — both shapes present and plausible
    val byName = a.map(r => r.getAs[String]("query") ->
      r.getAs[Long]("n_rows")).toMap
    assert(byName("q3_avg_duration_start") > 4000000L)
    assert(byName("q1_avg_duration_dow") === 7L)
    assert(byName("q11_avg_duration_member") === 2L)
    val b = BikeshareGen.runAll(spark, 1.0).orderBy("query").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("runAll invariant rows: residuals exactly zero, totals and member " +
    "share equal independent aggregates") {
    val inv = BikeshareGen.runAll(spark, 1.0)
      .where(col("query").startsWith("_inv_")).collect()
      .map(r => r.getAs[String]("query") ->
        r.getAs[Double]("control_total")).toMap
    assert(inv.size === 5)
    // conservation residuals: group sums re-add to the global totals
    assert(inv("_inv_duration_dow_vs_member") === 0.0)
    assert(inv("_inv_payments_month_vs_year") === 0.0)
    // totals against independent aggregates over the conformed facts
    val durTotal = wh.trips.agg(sum(col("duration").cast("double")))
      .head().getDouble(0)
    assert(inv("_inv_total_duration") ===
      math.round(durTotal * 100.0) / 100.0)
    val payTotal = conformed.payments
      .agg(sum(col("amount").cast("double"))).head().getDouble(0)
    assert(inv("_inv_total_payments") ===
      math.round(payTotal * 100.0) / 100.0)
    // member share of total duration — BASELINE.md's golden split is
    // ≈ 4,818,499,899 / 5,993,800,969 ≈ 0.8039; the generator's design
    // center must land in the same band
    val share = inv("_inv_member_duration_share")
    assert(share > 0.7 && share < 0.9, s"member share $share")
    val memTotal = wh.trips
      .join(wh.riders, wh.trips("rider_id") === wh.riders("rider_id"))
      .where(col("is_member"))
      .agg(sum(col("duration").cast("double"))).head().getDouble(0)
    assert(math.abs(share - memTotal / durTotal) < 5e-7)
  }
}

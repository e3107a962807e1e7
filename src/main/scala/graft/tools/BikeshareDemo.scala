package graft.tools

import graft.Engine
import graft.pipeline.BikesharePipeline
import org.apache.spark.sql.DataFrame

/** End-to-end reference-parity demo: the full 5-stage ETL plus all 24
  * analytical queries over a bikeshare CSV directory — the notebook's whole
  * flow as one main. Usage:
  * runMain graft.tools.BikeshareDemo [csvDir] (defaults to test fixtures)
  */
object BikeshareDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("src/test/resources/bikeshare")
    val spark = Engine.localSession(4, "bikeshare-demo")
    val wh = BikesharePipeline.build(spark, BikesharePipeline.conformFromCsv(spark, dir))

    def show(title: String, df: DataFrame, n: Int = 10): Unit = {
      println(s"\n== $title ==")
      df.show(n, truncate = false)
    }

    show("Q1 avg duration by day_of_week", BikesharePipeline.q1AvgDurationByDayOfWeek(wh))
    show("Q2 total duration by day_of_week", BikesharePipeline.q2TotalDurationByDayOfWeek(wh))
    show("Q3 avg duration by started_at", BikesharePipeline.q3AvgDurationByStartTime(wh))
    show("Q4 total duration by started_at", BikesharePipeline.q4TotalDurationByStartTime(wh))
    show("Q5 avg duration by start station", BikesharePipeline.q5AvgDurationByStartStation(wh))
    show("Q6 total duration by start station", BikesharePipeline.q6TotalDurationByStartStation(wh))
    show("Q7 avg duration by end station", BikesharePipeline.q7AvgDurationByEndStation(wh))
    show("Q8 total duration by end station", BikesharePipeline.q8TotalDurationByEndStation(wh))
    show("Q9 total duration by age", BikesharePipeline.q9TotalDurationByAge(wh))
    show("Q10 avg duration by age", BikesharePipeline.q10AvgDurationByAge(wh))
    show("Q11 avg duration by membership", BikesharePipeline.q11AvgDurationByMembership(wh))
    show("Q12 total duration by membership", BikesharePipeline.q12TotalDurationByMembership(wh))
    for (part <- Seq("month", "quarter", "year"); agg <- Seq("sum", "avg"))
      show(s"Q13-18 $agg amount by $part", BikesharePipeline.paymentsByDatePart(wh, part, agg))
    for (agg <- Seq("avg", "sum"))
      show(s"Q19/Q20 $agg amount by age (members)", BikesharePipeline.memberPaymentsByAge(wh, agg))
    show("Q21 EC1 monthly spend per member", BikesharePipeline.q21MonthlySpendPerMember(wh))
    show("Q22 EC2 spend per minute per member", BikesharePipeline.q22SpendPerMinutePerMember(wh))
    show("trip_dates preview", wh.tripDates, 20)
    show("payment_dates preview", wh.paymentDates, 20)
    spark.stop()
  }
}

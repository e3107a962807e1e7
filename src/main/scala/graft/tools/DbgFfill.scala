package graft.tools
import graft.Engine
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object DbgFfill {
  def main(args: Array[String]): Unit = {
    val spark = Engine.localSession(8, "dbg")
    val ev = graft.sources.Tables.loadEvents(spark, "/root/testdata/sf0.01")
    val out = graft.operators.Timeseries.resampleFfill(ev, "user_id", "ts", "value", 300L)
    println("NEWROWS=" + out.count())
    val step = 300L
    val binSec = (col("ts").cast("long") / step).cast("long") * step
    val binned = ev.groupBy(col("user_id"), timestamp_seconds(binSec).as("bin"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("v"))
    val spineOld = binned.groupBy(col("user_id"))
      .agg(min("bin").as("lo"), max("bin").as("hi"))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"),
        expr(s"interval $step seconds"))).as("bin"))
    println("OLDSPINE=" + spineOld.count())
    val stats = binned.groupBy("user_id")
      .agg(unix_seconds(min("bin")).as("lo"), unix_seconds(max("bin")).as("hi"))
    println("SPAN=" + stats.agg(avg(col("hi") - col("lo")), count(lit(1))).collect().mkString)
    spark.stop()
  }
}

package graft.tools

import graft.Engine
import org.apache.spark.sql.functions._

/** Scratch profiler for the chiMerge cost centers at sf0.1. */
object ChiProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.localSession(appName = "chiprof")
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_extendedprice"),
        (col("l_quantity") > 25).cast("int").as("y"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"CHIPROF $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    time("warm")(df.count())
    val ps = array((1 until 12).map(b => lit(b.toDouble / 12)): _*)
    val v = col("l_extendedprice")
    time("pct_raw")(df.agg(percentile(v, ps)).collect())
    time("pct_grouped")(df.groupBy(v.as("__v")).agg(count(lit(1)).as("__c"))
      .agg(percentile(col("__v"), ps, col("__c"))).collect())
    time("distinct_count")(println(df.select(v).distinct().count()))
    val ths = df.groupBy(v.as("__v")).agg(count(lit(1)).as("__c"))
      .agg(percentile(col("__v"), ps, col("__c")).as("__ths"))
    val pre = df.crossJoin(broadcast(ths))
      .withColumn("bucket", size(filter(col("__ths"), t => v > t)))
    time("bucket_assign")(pre.groupBy(col("bucket").cast("int").as("__b"))
      .agg(count(lit(1)).as("__n"),
        sum(col("y").cast("double")).cast("long").as("__e")).collect())
    time("bucket_assign2")(pre.groupBy(col("bucket").cast("int").as("__b"))
      .agg(count(lit(1)).as("__n"),
        sum(col("y").cast("double")).cast("long").as("__e")).collect())
    spark.stop()
  }
}

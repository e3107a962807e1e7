package graft.tools

import graft.Engine
import graft.operators.Linkage
import org.apache.spark.sql.functions._

/** Scratch profiler for the q202/q203 linkage cost centers at sf0.1. */
object LinkProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.localSession(appName = "linkprof")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val clean = docs.select(col("doc_id").as("id"),
      array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 6), " ")
        .as("key"))
    val dirty = clean
      .withColumn("__p", (col("id") % length(col("key"))).cast("int"))
      .select((col("id") + 1000000L).as("id"),
        concat(col("key").substr(lit(1), col("__p")),
          col("key").substr(col("__p") + 2, length(col("key")))).as("key"))
    val recs = clean.unionAll(dirty)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"LINKPROF $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    time("warm")(recs.count())
    // raw candidate volume via the public pair API (includes the dedup)
    time("blocked_pairs_count")(
      println("pairs " + Linkage.blockedPairs(recs, "id", "key").count()))
    // verified candidates (JW + threshold before dedup)
    time("linkPairs_094")(
      println("links " + Linkage.linkPairs(recs, "id", "key", 0.94).count()))
    time("linkPairs_094_again")(
      println("links " + Linkage.linkPairs(recs, "id", "key", 0.94).count()))
    spark.stop()
  }
}

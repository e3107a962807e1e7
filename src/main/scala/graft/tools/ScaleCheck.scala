package graft.tools

import graft.Engine
import graft.operators.{Dedup, Joins, Scd, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling sanity check: replicate sf0.1 tables 10× (shifted keys) into
  * /tmp and compare operator runtimes at 1× vs 10×. Near-linear ratios are
  * evidence the plans don't have a hidden quadratic/driver bottleneck.
  * Usage: runMain graft.tools.ScaleCheck [replication]
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(10)
    val base = "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale_x$rep"
    val spark = Engine.localSession(8, "scalecheck")

    def replicate(name: String, keyCols: Seq[String]): Unit = {
      val src = spark.read.parquet(s"$base/$name.parquet")
      val shifted = (0 until rep).map { i =>
        keyCols.foldLeft(src)((d, k) =>
          d.withColumn(k, col(k) + lit(i.toLong * 100000000L)))
      }.reduce(_ union _)
      shifted.write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    replicate("lineitem", Seq("l_orderkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("customer", Seq("c_custkey"))
    replicate("documents", Seq("doc_id"))
    replicate("embeddings", Seq("vec_id"))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $label ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }

    def starJoin(dir: String): Long = {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val o = spark.read.parquet(s"$dir/orders.parquet")
      val c = spark.read.parquet(s"$dir/customer.parquet")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        .count()
    }
    def minhash(dir: String): Long =
      Dedup.minhashCandidatePairs(
        spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text").count()
    def ann(dir: String): Long = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") <= 20),
        "vec_id", "embedding", 3).count()
    }

    def rangeJoin(dir: String): Long = {
      val bands = spark.range(0, 40).select(col("id").as("band_id"),
        (col("id") * lit(2500.0)).as("lo"), ((col("id") + 1) * lit(2500.0)).as("hi"))
      Joins.rangeJoinBinned(spark.read.parquet(s"$dir/lineitem.parquet"),
          "l_extendedprice", bands, "lo", "hi", 2500.0)
        .groupBy("band_id").count().count()
    }
    def tfidf(dir: String): Long = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val terms = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfq), "term").count()
    }
    def scd2(dir: String): Long =
      Scd.scd2(spark.read.parquet(s"$dir/documents.parquet")
          .select(col("source"), col("doc_id"), col("lang")),
        key = "source", ts = "doc_id", attrs = Seq("lang")).count()

    // warm both paths once, then measure
    starJoin(base); minhash(base); ann(base); rangeJoin(base); tfidf(base); scd2(base)
    time("star_join_1x")(starJoin(base))
    time(s"star_join_${rep}x")(starJoin(out))
    time("minhash_1x")(minhash(base))
    time(s"minhash_${rep}x")(minhash(out))
    time("ann_1x")(ann(base))
    time(s"ann_${rep}x")(ann(out))
    time("range_join_1x")(rangeJoin(base))
    time(s"range_join_${rep}x")(rangeJoin(out))
    time("tfidf_1x")(tfidf(base))
    time(s"tfidf_${rep}x")(tfidf(out))
    time("scd2_1x")(scd2(base))
    time(s"scd2_${rep}x")(scd2(out))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val toks = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(explode(split(col("text"), " ")).as("token"))
    .where(length(col("token")) > 0)

  test("count-min estimates obey true <= est <= true + eps*N on every probe") {
    val eps = 0.001
    val total = toks.count()
    val exact = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(50).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val est = Sketches.cmsTokenCounts(toks, "token", exact.map(_._1).toSeq,
      eps = eps).toMap
    val slack = math.ceil(eps * total).toLong
    exact.foreach { case (tk, n) =>
      val e = est(tk)
      assert(e >= n, s"CM underestimated '$tk': $e < $n")
      assert(e <= n + slack,
        s"CM overestimated '$tk' beyond eps*N: $e > $n + $slack")
    }
  }

  test("a token never inserted estimates at most eps*N, and usually 0") {
    val eps = 0.01
    val total = toks.count()
    val est = Sketches.cmsTokenCounts(toks, "token",
      Seq("__definitely_not_a_token__"), eps = eps).head._2
    assert(est <= math.ceil(eps * total).toLong)
  }

  test("HLL sketches: per-group accuracy, lossless union, no-rescan rollup") {
    import org.apache.spark.sql.functions.{col, countDistinct, explode, lit, sequence}
    val spark2 = spark
    import spark2.implicits._
    // two groups with overlapping value ranges (union must dedupe)
    val df = Seq.tabulate(30000)(i => (if (i % 2 == 0) "a" else "b", i % 9000))
      .toDF("g", "v")
    val perGroup = Sketches.distinctSketches(df, Seq("g"), "v")
    val est = Sketches.estimate(perGroup).collect()
      .map(r => r.getString(0) -> r.getLong(2).toDouble).toMap
    val exact = df.groupBy("g").agg(countDistinct("v").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) / n < 0.05, s"group $g: ${est(g)} vs $n")
    }
    // union of per-group sketches == sketching the whole stream: HLL
    // union at equal lgK is lossless, so the estimates are EQUAL
    val merged = Sketches.unionSketches(perGroup).head.getLong(1)
    val direct = Sketches.estimate(
      Sketches.distinctSketches(df.withColumn("g", lit("all")), Seq("g"), "v"))
      .head.getLong(2)
    assert(merged === direct)
    // and the rollup is accurate vs the exact global distinct (9000)
    val exactAll = df.agg(countDistinct("v")).head.getLong(0)
    assert(math.abs(merged.toDouble - exactAll) / exactAll < 0.05)
  }
}

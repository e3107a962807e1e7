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

  test("quantile sketches: GK rank guarantee per group and after merge") {
    val spark2 = spark
    import spark2.implicits._
    val relErr = 0.01
    val n = 10000
    // values 0..9999, deterministically scrambled across two groups —
    // the true quantile of p is ~p·n, so a rank-error bound is a VALUE
    // bound: |est − p·n| ≤ relErr·n (+1 for rank/index off-by-one)
    val df = Seq.tabulate(n)(i =>
      ((i * 7919) % 2 match { case 0 => "a"; case _ => "b" },
        ((i.toLong * 2654435761L) % n).toDouble))
      .toDF("g", "v")
    val per = Sketches.quantileSketches(df, Seq("g"), "v", relErr)
    val probs = Seq(0.1, 0.5, 0.9)
    // per-group bound: each group holds every OTHER residue, still
    // uniform over 0..n-1, half the count → same value bound
    val perEst = Sketches.quantileEstimates(per, probs)
      .select("g", "q_10", "q_50", "q_90").collect()
    perEst.foreach { r =>
      probs.zipWithIndex.foreach { case (p, i) =>
        val est = r.getDouble(1 + i)
        assert(math.abs(est - p * n) <= 2 * relErr * n + 2,
          s"group ${r.getString(0)} p=$p est=$est")
      }
    }
    // merged rollup: GK merge degrades error at most 2×; the merged
    // sketch over both groups must estimate the GLOBAL quantiles
    val merged = Sketches.quantileEstimates(
        Sketches.mergeQuantileSketches(per), probs)
      .select("q_10", "q_50", "q_90").head
    probs.zipWithIndex.foreach { case (p, i) =>
      val est = merged.getDouble(i)
      assert(math.abs(est - p * n) <= 2 * relErr * n + 2,
        s"merged p=$p est=$est")
    }
  }

  test("quantile sketches: empty-group probe is NULL, single value exact") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("a", Some(5.0)), ("b", None: Option[Double]))
      .toDF("g", "v")
    val per = Sketches.quantileSketches(df, Seq("g"), "v")
    val got = Sketches.quantileEstimates(per, Seq(0.5))
      .select("g", "q_50").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("a") === Some(5.0)) // one value is every quantile
    assert(got("b") === None)      // no non-null inputs → NULL probe
  }

  test("cmsJoinSizeEstimate: one-sided bound around the exact join size") {
    import spark.implicits._
    val a = (1L to 500L).map(i => i % 50).toDF("k")  // 10 × each of 50 keys
    val b = (1L to 200L).map(i => i % 40).toDF("k2") // 5 × each of 40 keys
    val exact = a.join(b, col("k") === col("k2")).count()
    val (est, na, nb) = Sketches.cmsJoinSizeEstimate(a, "k", b, "k2",
      eps = 0.001)
    assert(na === 500L && nb === 200L)
    assert(est >= exact, s"CM inner product must never undercount: $est < $exact")
    assert(est <= exact + (0.001 * na * nb).toLong + 1,
      s"estimate $est beyond the ε·|A|·|B| slack of exact $exact")
    // disjoint key spaces estimate ≈ 0 within slack
    val c = (1L to 300L).map(i => 1000L + i % 30).toDF("k2")
    val (estDisjoint, _, _) = Sketches.cmsJoinSizeEstimate(a, "k", c, "k2",
      eps = 0.001)
    assert(estDisjoint <= (0.001 * 500 * 300).toLong + 1)
  }
}

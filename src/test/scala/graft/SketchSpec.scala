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
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.EmbeddingStats

/** [[EmbeddingStats]] — hand-computed moments, power-iteration PCA on a
  * planted anisotropic cloud, scan-side projection equivalence.
  */
class EmbeddingStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("moments: hand-computed mean and population covariance") {
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 6.0f))
      .toDF("embedding")
    val (n, mean, cov) = EmbeddingStats.moments(df, "embedding")
    assert(n === 2L)
    assert(mean.toSeq === Seq(2.0, 4.0))
    // population cov: var(x)=1, var(y)=4, cov(x,y)=2
    assert(cov(0)(0) === 1.0 && cov(1)(1) === 4.0)
    assert(cov(0)(1) === 2.0 && cov(1)(0) === 2.0)
  }

  test("moments rejects ragged embeddings") {
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f)).toDF("embedding").coalesce(1)
    assertThrows[Exception] { EmbeddingStats.moments(df, "embedding") }
  }

  test("pcaTopDirections recovers a planted dominant direction + deflation") {
    // deterministic cloud: strong variance along dir1=(3,4)/5, weak along
    // the orthogonal dir2=(-4,3)/5
    val d1 = Array(0.6, 0.8); val d2 = Array(-0.8, 0.6)
    val pts = (0 until 200).map { i =>
      val t = (i % 21) - 10.0          // major axis: ±10
      val s = ((i * 7) % 5) - 2.0      // minor axis: ±2
      Seq((t * d1(0) + s * d2(0)).toFloat, (t * d1(1) + s * d2(1)).toFloat)
    }
    val (_, _, cov) = EmbeddingStats.moments(pts.toDF("embedding"), "embedding")
    val dirs = EmbeddingStats.pcaTopDirections(cov, k = 2)
    def cosAbs(a: Array[Double], b: Array[Double]) =
      math.abs(a.zip(b).map { case (x, y) => x * y }.sum)
    assert(cosAbs(dirs(0), d1) > 0.99, s"pc0=${dirs(0).toSeq}")
    assert(cosAbs(dirs(1), d2) > 0.99, s"pc1=${dirs(1).toSeq}")
    // sign convention: largest-|component| entry positive
    dirs.foreach { v =>
      val p = v.indices.maxBy(i => (math.abs(v(i)), -i))
      assert(v(p) > 0)
    }
  }

  test("project: scan-side dot products match driver arithmetic") {
    val vecs = Seq(Seq(1.0f, 2.0f, 3.0f), Seq(-1.0f, 0.0f, 4.0f))
    val dirs = Seq(Array(1.0, 0.0, 0.0), Array(0.5, 0.5, 0.5))
    val got = EmbeddingStats.project(vecs.toDF("embedding"), "embedding", dirs)
      .select("pc0", "pc1").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(got.toSet === Set((1.0, 3.0), (-1.0, 1.5)))
  }
}

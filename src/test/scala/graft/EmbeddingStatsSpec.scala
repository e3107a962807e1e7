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

  test("mmdLinear: identical samples → 0, shifted samples → positive") {
    def mk(ids: Seq[Long], shift: Float) = ids
      .map(i => (i, Seq((i % 5).toFloat + shift, (i % 3).toFloat - shift)))
      .toDF("vec_id", "embedding")
    // even ids 0..30 and odd ids 1..31 trace the SAME (id%5, id%3) orbit
    // family; identical distributions via identical values per block pair
    val ref = mk(0L to 30L by 2, 0f)
    val same = mk(0L to 30L by 2, 0f)
    val r0 = graft.operators.EmbeddingStats.mmdLinear(ref, same,
      "vec_id", "embedding", gamma = 0.5, blockWidth = 8).head()
    // x-members and y-members coincide per block → h ≡ 0 exactly
    assert(math.abs(r0.getAs[Double]("mmd2")) < 1e-12)
    // distant sample: cross-kernels vanish, so mmd2 ≈ the within-sample
    // kernel mass E[k(x,x')] + E[k(y,y')] — strictly positive drift
    val far = mk(0L to 30L by 2, 50f)
    val r1 = graft.operators.EmbeddingStats.mmdLinear(ref, far,
      "vec_id", "embedding", gamma = 0.5, blockWidth = 8).head()
    assert(r1.getAs[Double]("mmd2") > 0.01,
      s"distant sample must drift: ${r1.getAs[Double]("mmd2")}")
  }

  test("mmdLinear: blocks lacking two members per side are skipped") {
    val ref = Seq((0L, Seq(1f)), (2L, Seq(2f)), (8L, Seq(3f)))
      .toDF("vec_id", "embedding") // block 1 has only one ref member
    val cur = Seq((1L, Seq(1f)), (3L, Seq(2f)), (9L, Seq(3f)),
      (11L, Seq(4f))).toDF("vec_id", "embedding")
    val r = graft.operators.EmbeddingStats.mmdLinear(ref, cur,
      "vec_id", "embedding", gamma = 1.0, blockWidth = 8).head()
    assert(r.getAs[Long]("n_blocks") === 1L) // only block 0 qualifies
  }

  test("quantizeInt8: extremes hit 0/255, midpoints round, constant dim → 0") {
    val vecs = Seq((1L, Seq(0.0f, 10.0f, 7.0f)), (2L, Seq(5.0f, 20.0f, 7.0f)),
      (3L, Seq(10.0f, 30.0f, 7.0f))).toDF("vec_id", "embedding")
    val (codes, params) = EmbeddingStats.quantizeInt8(vecs, "vec_id",
      "embedding")
    val byId = codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(byId(1L) === Seq(0, 0, 0))
    // dim0: 5/10·255 = 127.5 → floor(128.0) = 128; dim1: 10/20·255 = 127.5
    assert(byId(2L) === Seq(128, 128, 0))
    assert(byId(3L) === Seq(255, 255, 0))
    val p = params.orderBy("dim").collect()
    assert(p.map(_.getDouble(1)).toSeq === Seq(0.0, 10.0, 7.0)) // mins
    assert(p.map(_.getDouble(2)).toSeq === Seq(10.0, 30.0, 7.0)) // maxs
  }

  test("quantizeInt8: dequantization error bounded by span/510") {
    val vecs = (1L to 50L)
      .map(i => (i, Seq.tabulate(4)(d => (i * (d + 3) % 17).toFloat)))
      .toDF("vec_id", "embedding")
    val (codes, params) = EmbeddingStats.quantizeInt8(vecs, "vec_id",
      "embedding")
    val p = params.orderBy("dim").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val orig = vecs.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble)).toMap
    codes.collect().foreach { r =>
      val xs = orig(r.getLong(0))
      r.getSeq[Int](1).zipWithIndex.foreach { case (c, d) =>
        val (mn, mx) = p(d)
        val recon = mn + c * (mx - mn) / 255.0
        assert(math.abs(recon - xs(d)) <= (mx - mn) / 510.0 + 1e-9,
          s"dim $d code $c recon $recon vs ${xs(d)}")
      }
    }
  }

  test("signedRandomProjection: matches the sign matrix recomputed by hand") {
    import org.apache.spark.sql.functions.col
    val seed = 42L
    def sign(i: Int, j: Int): Double = {
      val h = Math.floorMod(i.toLong * i * 7919 +
        (i + seed) * (j + 13) * 104729 + j.toLong * j * 131, 10007L)
      if (h < 5004) 1.0 else -1.0
    }
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, -3.0f, 0.5f)),
      (2L, Array(0.0f, -1.0f, 4.0f, 2.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = EmbeddingStats.signedRandomProjection(df, "embedding",
        inDim = 4, outDim = 3, seed = seed)
      .select(col("vec_id"), col("rp")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    vecs.foreach { case (id, xs) =>
      (0 until 3).foreach { j =>
        val want = xs.zipWithIndex
          .map { case (x, i) => x.toDouble * sign(i, j) }.sum
        assert(math.abs(got(id)(j) - want) < 1e-9, s"id $id dim $j")
      }
    }
  }

  test("signedRandomProjection: signs are balanced and rows differ") {
    // JL usefulness needs a near-balanced, non-degenerate sign matrix:
    // check the generator directly over the 64×16 production shape
    val seed = 42L
    def sign(i: Int, j: Int): Double = {
      val h = Math.floorMod(i.toLong * i * 7919 +
        (i + seed) * (j + 13) * 104729 + j.toLong * j * 131, 10007L)
      if (h < 5004) 1.0 else -1.0
    }
    val m = Array.tabulate(16, 64)((j, i) => sign(i, j))
    val balance = m.map(_.sum.abs / 64.0)
    assert(balance.forall(_ <= 0.35),
      s"a sign row is badly unbalanced: ${balance.mkString(",")}")
    // pairwise row agreement should hover near half, far from 0/64
    for (a <- 0 until 16; b <- a + 1 until 16) {
      val agree = (0 until 64).count(i => m(a)(i) == m(b)(i))
      assert(agree >= 16 && agree <= 48, s"rows $a/$b agree on $agree/64")
    }
  }

  test("signedRandomProjection: signs stay balanced at overflow-inducing seeds") {
    // the (i+seed)*(j+13)*104729 mix overflows Long for large |seed|;
    // floorMod (not %) keeps the residue in [0, 10007) so the 5004 cut
    // stays ~50/50 — a plain % would send negative h always-+1 (~75/25)
    for (seed <- Seq(Long.MinValue / 3, -987654321987654321L, Long.MaxValue / 2)) {
      def sign(i: Int, j: Int): Double = {
        val h = Math.floorMod(i.toLong * i * 7919 +
          (i + seed) * (j + 13) * 104729 + j.toLong * j * 131, 10007L)
        if (h < 5004) 1.0 else -1.0
      }
      val m = Array.tabulate(16, 64)((j, i) => sign(i, j))
      val balance = m.map(_.sum.abs / 64.0)
      assert(balance.forall(_ <= 0.4),
        s"seed $seed produced an unbalanced sign row: ${balance.mkString(",")}")
    }
  }

  test("groupCentroidSimilarity: hand-computed centroid cosines") {
    import spark.implicits._
    val rows = Seq(
      ("A", Array(1.0f, 0.0f)), ("A", Array(1.0f, 0.0f)),
      ("B", Array(0.0f, 1.0f)),
      ("C", Array(1.0f, 1.0f)), ("C", Array(1.0f, 1.0f)),
      ("D", Array(0.0f, 0.0f)))
      .toDF("src", "embedding")
    val got = EmbeddingStats.groupCentroidSimilarity(rows, "src", "embedding")
      .collect().map(r => (r.getAs[String]("group_a"),
        r.getAs[String]("group_b")) ->
        Option(r.getAs[java.lang.Double]("cosine"))).toMap
    assert(got.size === 6)
    assert(math.abs(got(("A", "B")).get) < 1e-12)
    assert(math.abs(got(("A", "C")).get - 1.0 / math.sqrt(2)) < 1e-12)
    assert(math.abs(got(("B", "C")).get - 1.0 / math.sqrt(2)) < 1e-12)
    // the zero-centroid group pairs are null, not NaN
    assert(got(("A", "D")).isEmpty && got(("C", "D")).isEmpty)
  }
}

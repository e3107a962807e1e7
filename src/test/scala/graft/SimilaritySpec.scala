package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Vectors
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f)),
    (5L, Array(1.0f, 0.0f, 0.01f))
  ).toDF("vec_id", "embedding")

  test("vector primitives: dot / norm / cosine") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val r = df.select(
      Vectors.dot(col("a"), col("b")),
      Vectors.norm(col("a")),
      Vectors.cosine(col("a"), col("a")),
      Vectors.l2Distance(col("a"), col("b"))).head()
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.sqrt(27)) < 1e-12)
  }

  test("cosine of zero vector is 0, not NaN") {
    val r = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(Vectors.cosine(col("a"), col("b"))).head().getDouble(0)
    assert(r === 0.0)
  }

  test("brute-force top-k ranks nearest first, excludes self") {
    val got = Similarity.bruteForceTopK(vecs, vecs.where("vec_id = 1"),
        "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("nbr_id"), r.getAs[Int]("rank")))
    assert(got.length === 2)
    assert(got(0)._1 === 5L) // cos ≈ 0.99995
    assert(got(1)._1 === 2L) // cos ≈ 0.9939
  }

  test("LSH top-k returns only same-bucket neighbors with correct scores") {
    val got = Similarity.lshTopK(vecs, vecs.where("vec_id = 1"),
        "vec_id", "embedding", dim = 3, k = 3, numPlanes = 2)
      .collect()
    // recall is approximate; whatever comes back must be correctly scored
    got.foreach { r =>
      assert(r.getAs[Double]("cos") <= 1.0 + 1e-12)
      assert(r.getAs[Long]("nbr_id") !== 1L)
    }
  }

  test("IVF assigns every vector to exactly one cell") {
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding", numCells = 2)
    assert(assigned.count() === 5)
    assert(assigned.select("vec_id").distinct().count() === 5)
    val topk = Similarity.ivfTopK(vecs, vecs.where("vec_id = 1"),
      "vec_id", "embedding", k = 2, numCells = 2)
    topk.collect().foreach(r => assert(r.getAs[Long]("nbr_id") !== 1L))
  }
}

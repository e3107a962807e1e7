package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Incremental

class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = (0L until 1000L).map(i => (i, s"doc-$i"))
    .toDF("id", "key")
  // 50 re-ingested keys + 50 genuinely new ones
  private lazy val batch = ((0L until 50L) ++ (5000L until 5050L))
    .map(i => (i, s"doc-$i")).toDF("id", "key")

  test("newRows equals the plain anti-join (bloom is value-transparent)") {
    val got = Incremental.newRows(batch, corpus, "key")
      .select("id").as[Long].collect().toSet
    val want = batch.join(corpus.select("key"), Seq("key"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(want === (5000L until 5050L).toSet)
    assert(got === want)
  }

  test("undersized sketch (high fpp) still yields the exact result") {
    // 1000 keys crammed into a 16-item sketch: most probes are false
    // positives, so nearly the whole batch takes the verify join — the
    // result must not change, only the prefilter's effectiveness.
    val got = Incremental.newRows(batch, corpus, "key", expectedItems = 16)
      .select("id").as[Long].collect().toSet
    assert(got === (5000L until 5050L).toSet)
  }

  test("bloom has no false negatives: every corpus key probes true") {
    val bloom = Incremental.buildBloom(corpus, col("key"), 1 << 20)
    val misses = corpus.where(!Incremental.mightContain(bloom, col("key"))).count()
    assert(misses === 0)
  }

  test("prefilter prunes: most genuinely-new keys skip the verify join") {
    val bloom = Incremental.buildBloom(corpus, col("key"), 1 << 20)
    val defNew = batch.where(!Incremental.mightContain(bloom, col("key"))).count()
    // 50 new keys; a well-sized sketch (fpp ~3% at this fill) lets nearly
    // all of them bypass the join — require a clear majority to guard
    // against a sketch that degenerates to might-contain-everything
    assert(defNew >= 40, s"only $defNew of 50 new keys bypassed the join")
  }

  test("empty corpus: every batch row is new") {
    val empty = corpus.where(lit(false))
    assert(Incremental.newRows(batch, empty, "key").count() === batch.count())
  }

  test("null keys are values: dropped when the corpus has one, kept when it doesn't") {
    val withNull = Seq((Some("k1"), 1L), (None, 2L))
      .toDF("key", "id").select(col("key"), col("id"))
    val corpusNull = Seq(Option.empty[String]).toDF("key")
    // corpus holds a null key → the batch's null-key row is NOT new
    val got = Incremental.newRows(withNull, corpusNull, "key")
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L))
    // corpus without nulls → the null-key row is new (appended once)
    val got2 = Incremental.newRows(withNull, Seq("other").toDF("key"), "key")
      .select("id").as[Long].collect().toSet
    assert(got2 === Set(1L, 2L))
  }

  test("duplicate keys WITHIN the batch are preserved (dedup is vs corpus only)") {
    val doubled = batch.union(batch)
    assert(Incremental.newRows(doubled, corpus, "key").count() === 100)
  }

  test("deltaJoin: materialized ∪ delta equals the full refreshed join") {
    val a = (1L to 40L).map(i => (i % 7, i, s"a$i")).toDF("k", "ai", "av")
    val b = (1L to 30L).map(i => (i % 5, i, s"b$i")).toDF("k", "bi", "bv")
    val (snapA, deltaA) = (a.where($"ai" <= 30), a.where($"ai" > 30))
    val (snapB, deltaB) = (b.where($"bi" <= 20), b.where($"bi" > 20))
    val full = a.join(b, Seq("k"))
    val incremental = snapA.join(snapB, Seq("k")).unionByName(
      Incremental.deltaJoin(snapA, deltaA, snapB, deltaB, Seq("k")))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "ai", "bi").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(canon(incremental) === canon(full))
    // empty deltas: the delta term is empty, not an error
    assert(Incremental.deltaJoin(snapA, deltaA.limit(0),
      snapB, deltaB.limit(0), Seq("k")).count() === 0)
  }
}

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

  // near-dup ingest fixtures: corpus docs + a batch holding (a) verbatim
  // near-copies (one token appended), (b) genuinely new texts, (c) a doc
  // too short to shingle
  private lazy val nearCorpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "pack my box with five dozen liquor jugs before noon"),
    (3L, "sphinx of black quartz judge my vow said the king"))
    .toDF("doc_id", "text")
  private lazy val nearBatch = Seq(
    // verbatim copy: identical shingle set → identical signature →
    // guaranteed band hit under either hash family (a near-copy's hit is
    // probabilistic per-seed; determinism matters more in a spec)
    (11L, "the quick brown fox jumps over the lazy dog tonight"),
    (12L, "completely unrelated sentence about distributed query planning"),
    (13L, "so short")).toDF("doc_id", "text")

  test("minhashNewDocs: re-ingested copies drop, novel and short docs survive") {
    for (ex <- Seq(true, false)) {
      val got = Incremental.minhashNewDocs(nearBatch, nearCorpus,
          "doc_id", "text", exact = ex)
        .select("doc_id").as[Long].collect().toSet
      assert(got === Set(12L, 13L), s"exact=$ex")
    }
  }

  test("minhashNewDocs: precomputed corpusKeys give identical results") {
    val keys = Incremental.bandedKeys(nearCorpus, "doc_id", "text")
      .localCheckpoint()
    val a = Incremental.minhashNewDocs(nearBatch, nearCorpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val b = Incremental.minhashNewDocs(nearBatch, nearCorpus, "doc_id", "text",
        corpusKeys = Some(keys))
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
    // the keys-only entry point (no corpus texts at hand) agrees too
    val c = Incremental.minhashNewDocsAgainstKeys(nearBatch, keys,
        "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(a === c)
  }

  test("minhashNewDocs: saturated corpus bucket drops the batch doc without pairing") {
    // 50 identical corpus docs flood one bucket; cap 10 → the batch copy
    // must drop via the saturation branch (no 50-way pair fan-out), the
    // novel doc must survive
    val flood = (100L until 150L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val b = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "novel content entirely its own words here today"))
      .toDF("doc_id", "text")
    val matches = Incremental.minhashIngestMatches(b, flood, "doc_id", "text",
      maxCorpusBucket = 10)
    // saturation rows carry a null corpus id; no member-level pairs exist
    assert(matches.where(col("id_corpus").isNotNull).count() === 0)
    assert(matches.where(col("id_corpus").isNull)
      .select("id_batch").as[Long].collect().toSet === Set(1L))
    val got = Incremental.minhashNewDocs(b, flood, "doc_id", "text",
        maxCorpusBucket = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(2L))
  }

  test("minhashNewDocs: verifyJaccard rescues banding false positives, keeps true dups dropped") {
    // 11-token docs sharing a 3-token tail: banding may collide them, but
    // exact 3-gram Jaccard is far below 0.5 → verification must rescue
    val c = Seq((1L, "one two three four five six seven eight alpha beta gamma"))
      .toDF("doc_id", "text")
    val b = Seq(
      (21L, "nine ten eleven twelve thirteen fourteen fifteen xx alpha beta gamma"),
      (22L, "one two three four five six seven eight alpha beta gamma"))
      .toDF("doc_id", "text")
    val got = Incremental.minhashNewDocs(b, c, "doc_id", "text",
        verifyJaccard = Some(0.5))
      .select("doc_id").as[Long].collect().toSet
    // 22 is a verbatim dup (jaccard 1.0) → dropped; 21 survives whether or
    // not banding collided it (verification gates the drop)
    assert(got === Set(21L))
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

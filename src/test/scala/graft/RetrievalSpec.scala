package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusPipeline, Retrieval}

/** [[Retrieval.bm25]] scoring semantics and the
  * [[CorpusPipeline.sourceReport]] rollup on hand-built corpora.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bm25: rare terms outrank common ones; repeated tf saturates") {
    // 'rare' appears in one doc, 'common' in all four → idf(rare) ≫
    // idf(common); d1 (rare) must outrank d2..d4 (common only)
    val docs = Seq(
      (1L, "rare common x"),
      (2L, "common y z"),
      (3L, "common common common y"),
      (4L, "common w")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, "doc_id", "text",
        Seq("rare", "common"), topK = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.head._1 === 1L)
    // saturation: tf=3 in d3 scores above tf=1 at the same idf but far
    // less than 3× — the (k1+1)/(tf+k1·norm) curve flattens
    val byId = got.toMap
    val s3 = byId(3L); val s2 = byId(2L)
    assert(s3 > s2 && s3 < 3 * s2)
  }

  test("bm25: length normalization favors the shorter doc at equal tf") {
    val docs = Seq(
      (1L, "term a"),
      (2L, "term a b c d e f g h i j k l m n o p")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, "doc_id", "text", Seq("term"), topK = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L))
  }

  test("bm25: only matching docs return; topK truncates by (score, id)") {
    val docs = Seq(
      (1L, "hit x"), (2L, "hit x"), (3L, "miss y")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25(docs, "doc_id", "text", Seq("hit"), topK = 1)
      .collect()
    // d1 and d2 tie exactly — doc_id breaks the tie; d3 never appears
    assert(got.length === 1 && got.head.getLong(0) === 1L)
  }

  test("sourceReport: dup flag is corpus-wide, measures per source") {
    val docs = Seq(
      // 'dup text' appears in BOTH sources → both copies flagged
      (1L, "dup text", "a"),
      (2L, "dup text", "b"),
      (3L, "solo one", "a"),
      (4L, "three tok doc", "b")
    ).toDF("doc_id", "text", "source")
    val got = CorpusPipeline.sourceReport(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a"); val b = got("b")
    assert(a.getLong(1) === 2L && b.getLong(1) === 2L) // n_docs
    assert(a.getDouble(2) === 0.5)                     // share
    assert(a.getLong(3) === 1L && b.getLong(3) === 1L) // n_dup_docs
    assert(a.getDouble(4) === 0.5)                     // dup_rate
    assert(b.getLong(6) === 5L)                        // sum_tokens: 2 + 3
    assert(a.getLong(5) === ("dup text".length + "solo one".length).toLong)
  }

  test("invertedIndex: banded postings, id-sorted, total df on every band") {
    val docs = Seq(
      (0L, "w a"), (1L, "w b"), (2L, "w c"), (3L, "w w d")
    ).toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(docs, "doc_id", "text", bandSize = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getSeq[org.apache.spark.sql.Row](3)
          .map(p => (p.getLong(0), p.getLong(1))))))
      .toMap
    // 'w' in all 4 docs → two bands of 2, BOTH carrying df = 4
    assert(idx(("w", 0L)) === ((4L, Seq(0L -> 1L, 1L -> 1L))))
    assert(idx(("w", 1L)) === ((4L, Seq(2L -> 1L, 3L -> 2L)))) // tf 2 in d3
    assert(idx(("a", 0L)) === ((1L, Seq(0L -> 1L))))
  }

  test("searchIndex over the prebuilt index == bm25 over the corpus") {
    val docs = Seq(
      (1L, "rare common x"), (2L, "common y z"),
      (3L, "common common common y"), (4L, "common w"),
      (5L, "nothing matches here")
    ).toDF("doc_id", "text")
    val direct = Retrieval.bm25(docs, "doc_id", "text",
        Seq("rare", "common"), topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val viaIndex = Retrieval.searchIndex(
        Retrieval.invertedIndex(docs, "doc_id", "text", bandSize = 2),
        Retrieval.docLengths(docs, "doc_id", "text"),
        Seq("rare", "common"), topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(viaIndex === direct)
  }

  test("reciprocalRankFusion: consensus beats a single system's favourite") {
    val sysA = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val sysB = Seq((3L, 1), (2L, 2), (9L, 3)).toDF("id", "rank")
    val got = Retrieval.reciprocalRankFusion(Seq(sysA, sysB), "id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // id 3 (ranks 3+1) and id 2 (2+2): 1/63+1/61 > 2/62, so 3 wins;
    // both outrank the single-system ids 1 and 9
    assert(got.map(_._1).toSeq === Seq(3L, 2L, 1L, 9L))
    assert(math.abs(got(0)._2 - (1.0 / 63 + 1.0 / 61)) < 1e-15)
    assert(math.abs(got(1)._2 - 2.0 / 62) < 1e-15)
    assert(got.take(2).forall(_._3 === 2L) && got.drop(2).forall(_._3 === 1L))
  }

  test("reciprocalRankFusion: exact ties break by id; topK truncates") {
    // symmetric ranks → identical fused scores for 1 and 2
    val sysA = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val sysB = Seq((2L, 1), (1L, 2)).toDF("id", "rank")
    val got = Retrieval.reciprocalRankFusion(Seq(sysA, sysB), "id",
        topK = 1).collect()
    assert(got.length === 1 && got.head.getLong(0) === 1L)
  }

  test("tfidfCosineJoin: identical docs reach cos 1, disjoint docs never pair") {
    val docs = Seq(
      (1L, "apple banana"), (2L, "apple banana"), (3L, "cherry durian"))
      .toDF("doc_id", "text")
    val got = Retrieval.tfidfCosineJoin(docs, "doc_id", "text",
        threshold = 0.5, maxDfRatio = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getDouble(3)))
    assert(got.length === 1)
    val (a, b, shared, cos) = got.head
    assert((a, b) === (1L, 2L) && shared === 2L)
    assert(math.abs(cos - 1.0) < 1e-9)
  }

  test("tfidfCosineJoin: the df cap prunes stopwords before the join") {
    // 'the' appears in every doc; with maxDfRatio 0.5 it is dropped, so
    // no pair shares a surviving term and the join is empty
    val docs = Seq(
      (1L, "the apple"), (2L, "the banana"), (3L, "the cherry"))
      .toDF("doc_id", "text")
    assert(Retrieval.tfidfCosineJoin(docs, "doc_id", "text",
      threshold = 0.01, maxDfRatio = 0.5).count() === 0)
    // without the cap, 'the' pairs every doc (idf ln(1) = 0 → cos NaN
    // guarded out by threshold? no: weights all-zero docs drop via norm 0)
    val all = Retrieval.tfidfCosineJoin(docs, "doc_id", "text",
      threshold = 0.01, maxDfRatio = 1.0)
    assert(all.count() === 0) // zero-weight dots never reach a threshold
  }

  test("rankBiasedOverlap: identical rankings score 1, disjoint score 0") {
    val a = (1 to 10).map(i => (i.toLong, i)).toDF("id", "rank")
    val same = Retrieval.rankBiasedOverlap(a, a, "id", "rank", depth = 10)
      .head()
    // X_d = d everywhere → the series telescopes to exactly 1
    assert(math.abs(same.getAs[Double]("rbo") - 1.0) < 1e-9)
    assert(same.getAs[Long]("overlap_at_k") === 10L)
    val b = (1 to 10).map(i => (i + 100L, i)).toDF("id", "rank")
    val none = Retrieval.rankBiasedOverlap(a, b, "id", "rank", depth = 10)
      .head()
    assert(none.getAs[Double]("rbo") === 0.0)
    assert(none.getAs[Long]("overlap_at_k") === 0L)
  }

  test("rankBiasedOverlap: hand-computed swap at depth 2, p = 0.5") {
    // A = [x, y], B = [y, x]: both items enter at d = 2 → X_1 = 0, X_2 = 2
    // RBO = (1−p)[p⁰·0/1 + p¹·2/2] + p²·2/2 = 0.5·0.5 + 0.25 = 0.5
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((2L, 1), (1L, 2)).toDF("id", "rank")
    val r = Retrieval.rankBiasedOverlap(a, b, "id", "rank",
      depth = 2, p = 0.5).head()
    assert(math.abs(r.getAs[Double]("rbo") - 0.5) < 1e-12)
  }

  test("rankBiasedOverlap: per-group scoping keeps zero-overlap groups") {
    val a = Seq(("q1", 1L, 1), ("q1", 2L, 2), ("q2", 5L, 1))
      .toDF("q", "id", "rank")
    val b = Seq(("q1", 1L, 1), ("q1", 2L, 2), ("q2", 9L, 1))
      .toDF("q", "id", "rank")
    val got = Retrieval.rankBiasedOverlap(a, b, "id", "rank", depth = 2,
        p = 0.9, groupCols = Seq("q"))
      .collect().map(r => r.getAs[String]("q") -> r.getAs[Double]("rbo"))
      .toMap
    assert(math.abs(got("q1") - 1.0) < 1e-9)
    assert(got("q2") === 0.0) // disjoint, but the group still reports
  }

  test("queryLikelihood: Dirichlet smoothing scores every doc; exact " +
    "closed forms; absent term contributes the collection prior") {
    // corpus: 9 tokens, cf(a)=3 → p(a|C)=1/3; μ=1
    val docs = Seq((1L, "a a b"), (2L, "a c c"), (3L, "b b b"))
      .toDF("doc_id", "text")
    val got = Retrieval.queryLikelihood(docs, "doc_id", "text",
        Seq("a"), mu = 1.0, topK = 10)
      .orderBy(org.apache.spark.sql.functions.col("score").desc)
      .collect()
    assert(got.length === 3) // smoothing ranks non-matching docs too
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(math.abs(got(0).getAs[Double]("score") -
      math.log((2 + 1.0 / 3) / 4)) < 1e-12)
    assert(math.abs(got(1).getAs[Double]("score") -
      math.log((1 + 1.0 / 3) / 4)) < 1e-12)
    assert(math.abs(got(2).getAs[Double]("score") -
      math.log((1.0 / 3) / 4)) < 1e-12)
    assert(got(0).getAs[Long]("n_terms_matched") === 1L)
    assert(got(2).getAs[Long]("n_terms_matched") === 0L)
  }

  test("queryLikelihood: an out-of-vocabulary term degrades uniformly " +
    "instead of nulling every score") {
    val docs = Seq((1L, "a a b"), (2L, "a c c"), (3L, "b b b"))
      .toDF("doc_id", "text")
    val inVocab = Retrieval.queryLikelihood(docs, "doc_id", "text",
      Seq("a"), mu = 1.0, topK = 10).collect()
    val withOov = Retrieval.queryLikelihood(docs, "doc_id", "text",
      Seq("a", "zzz_not_in_corpus"), mu = 1.0, topK = 10).collect()
    assert(withOov.length === 3)
    // cf(zzz) = 0 → its contribution is 0.0 for every document, so the
    // scores (and ranking) equal the in-vocab-only query's — never NULL
    withOov.foreach(r => assert(!r.isNullAt(1)))
    val a = inVocab.map(r => (r.getLong(0), r.getDouble(1))).toMap
    withOov.foreach { r =>
      assert(math.abs(r.getDouble(1) - a(r.getLong(0))) < 1e-15)
      assert(r.getAs[Long]("n_terms_matched") ===
        inVocab.find(_.getLong(0) == r.getLong(0)).get
          .getAs[Long]("n_terms_matched"))
    }
  }

  test("bm25f: a title hit outranks the same hit in the body; " +
    "cross-field tf combines BEFORE saturation") {
    // all fields length 4 → every normalization denominator is exactly 1
    val docs = Seq(
      (1L, "spark x y z", "a b c d"),   // title hit (weight 2)
      (2L, "p q r s", "spark b c d"),   // body hit (weight 1)
      (3L, "p q r s", "a b c d"))       // no hit
      .toDF("doc_id", "title", "body")
    val got = Retrieval.bm25f(docs, "doc_id",
        Seq("title" -> 2.0, "body" -> 1.0), Seq("spark"))
      .orderBy(org.apache.spark.sql.functions.col("score").desc)
      .collect()
    assert(got.length === 2) // non-matching docs never surface
    assert(got(0).getLong(0) === 1L && got(1).getLong(0) === 2L)
    // closed forms: idf = ln(1.6) (N=3, df=2); title tfw=2 → idf·4.4/3.2,
    // body tfw=1 → idf·2.2/2.2
    val idf = math.log(1.6)
    assert(got(0).getAs[Double]("score") ===
      math.round(math.round(idf * 4.4 / 3.2 * 1e6) / 1e6 * 1e4) / 1e4)
    assert(got(1).getAs[Double]("score") ===
      math.round(math.round(idf * 1e6) / 1e6 * 1e4) / 1e4)
    // saturation: a term hitting BOTH fields forms one pseudo-frequency
    // (tfw=3 → idf·3·2.2/4.2), strictly less than the per-field score
    // sum a naive field-BM25 union would give (idf·1.375 + idf·1.0)
    val both = Seq((4L, "spark x y z", "spark b c d"),
      (5L, "p q r s", "a b c d"), (6L, "p q r s", "a b c d"))
      .toDF("doc_id", "title", "body")
    val s4 = Retrieval.bm25f(both, "doc_id",
        Seq("title" -> 2.0, "body" -> 1.0), Seq("spark"))
      .head().getAs[Double]("score")
    val idf1 = math.log(1.0 + (3.0 - 1 + 0.5) / 1.5) // df=1 here
    assert(math.abs(s4 - idf1 * 3 * 2.2 / 4.2) < 1e-4)
    assert(s4 < idf1 * (4.4 / 3.2) + idf1 * 1.0)
  }

  test("RAG assembly: RM3-expanded retrieval differs from and beats the " +
    "unexpanded query; MMR diversifies and the pack machinery composes") {
    import org.apache.spark.sql.functions._
    // Planted corpus: seeds 1–3 carry the query term AND the bridge term
    // "satellite"; hidden-relevant 4–6 carry ONLY the bridge term (the
    // unexpanded query cannot see them); 7–12 are distractors.
    val docs = Seq(
      (1L, "anchor satellite alpha"), (2L, "anchor satellite beta"),
      (3L, "anchor satellite gamma"), (4L, "satellite payload delta"),
      (5L, "satellite payload epsilon"), (6L, "satellite relay zeta"),
      (7L, "cats purr softly"), (8L, "dogs bark loudly"),
      (9L, "rain falls today"), (10L, "sun shines bright"),
      (11L, "wind blows cold"), (12L, "snow melts fast"))
      .toDF("doc_id", "text")
    val relevant = (1L to 6L).toSet
    val plain = Retrieval.bm25(docs, "doc_id", "text", Seq("anchor"),
      topK = 6).select("doc_id").as[Long].collect().toSet
    // all 3 seeds vote "satellite" (3 docs) over the 1-doc filler terms
    val exp = Retrieval.pseudoRelevanceExpansion(docs, "doc_id", "text",
        Seq("anchor"), fbDocs = 3, fbTerms = 1)
      .select("term").as[String].collect().toSeq
    assert(exp === Seq("satellite"))
    val expandedHits = Retrieval.bm25(docs, "doc_id", "text",
      Seq("anchor") ++ exp, topK = 6)
    val expanded = expandedHits.select("doc_id").as[Long].collect().toSet
    // the expanded top-k DIFFERS from and BEATS the unexpanded one
    assert(plain === Set(1L, 2L, 3L)) // the bridge docs are invisible
    assert(expanded === relevant)     // expansion surfaces 4–6
    assert((expanded & relevant).size > (plain & relevant).size)
    // MMR over the expanded pool: 4 and 5 are embedding twins, the rest
    // orthogonal — diversification must never select both twins in a
    // k=4 context (their round-2 penalty (1−λ)·1.0 dominates the small
    // BM25 score gaps at λ=0.3)
    def basis(i: Int): Array[Float] =
      Array.tabulate(5)(j => if (j == i) 1.0f else 0.0f)
    val vecs = Seq(1L -> basis(0), 2L -> basis(1), 3L -> basis(2),
      4L -> basis(3), 5L -> basis(3), 6L -> basis(4))
      .toDF("doc_id", "vec")
    val cands = expandedHits.join(vecs, "doc_id").withColumn("q", lit(0L))
    val picked = operators.Similarity.mmrRerank(cands, "q", "doc_id",
      "score", "vec", k = 4, lambda = 0.3)
    val sel = picked.select("doc_id").as[Long].collect().toSet
    assert(picked.select("rank").as[Int].collect().sorted.toSeq ===
      Seq(1, 2, 3, 4))
    assert(!(sel.contains(4L) && sel.contains(5L)),
      s"twins both selected: $sel")
    // pack the context set in rank order: 300 tokens each at budget 512
    // → packs of exactly 2 (floor((cum − tok)/512) = 0,0,1,1)
    val packed = operators.Splits.packByBudget(
      picked.withColumn("n_tokens", lit(300L)), "rank", "n_tokens", 512L)
    val byPack = packed.groupBy("pack_id").count()
      .orderBy("pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(byPack.toSeq === Seq((0L, 2L), (1L, 2L)))
  }

  test("pseudoRelevanceExpansion: feedback docs vote their terms; " +
    "query terms excluded; normalized weights") {
    val docs = Seq(
      (1L, "spark is fast"), (2L, "spark joins tables"),
      (3L, "cats purr"), (4L, "dogs bark"))
      .toDF("doc_id", "text")
    val got = Retrieval.pseudoRelevanceExpansion(docs, "doc_id", "text",
        queryTerms = Seq("spark"), fbDocs = 2, fbTerms = 10)
      .collect()
    // feedback = d1, d2 (equal scores); their 4 non-query terms each
    // carry (1/3)·score → normalized weights are exactly 1/4
    assert(got.length === 4)
    assert(got.map(_.getString(0)).toSet ===
      Set("is", "fast", "joins", "tables"))
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("weight") - 0.25) < 1e-9)
      assert(r.getAs[Long]("n_fb_docs") === 1L)
    }
    // weight ties order by term — deterministic cut
    assert(got.map(_.getString(0)).toSeq ===
      Seq("fast", "is", "joins", "tables"))
    // fbDocs = 1: only the tie-broken first hit (lower doc_id) votes
    val one = Retrieval.pseudoRelevanceExpansion(docs, "doc_id", "text",
        queryTerms = Seq("spark"), fbDocs = 1, fbTerms = 10)
      .collect().map(_.getString(0)).toSet
    assert(one === Set("is", "fast"))
  }
}

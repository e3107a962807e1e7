package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked retrieval over a documents table — BM25, the lexical scoring
  * function behind every search / RAG candidate-generation stage. Complements
  * the corpus-weighting TF-IDF (TestQueries q63) with the saturating,
  * length-normalized variant that actually ranks.
  */
object Retrieval {

  /** BM25 ranking of `docs` against a fixed bag of `queryTerms`:
    * {{{ score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) }}}
    * with the standard smoothed idf `ln(1 + (N − df + 0.5)/(df + 0.5))`.
    * Tokenization is single-space splitting (the corpus convention shared
    * with TF-IDF/token counting); `dl` is the token count of the document.
    * Returns the `topK` documents by `(score desc, id)` with per-term
    * contributions rounded to 6dp and the total to 4dp (deterministic
    * cross-engine ranking — the q63 rounding convention).
    *
    * Shape for scale:
    *  - the corpus is exploded ONCE and filtered to query terms *scan-side*
    *    (`isin` on the exploded term before any shuffle) — tf rows are
    *    `|query| × matching docs`, never corpus-sized;
    *  - `df` derives from tf (≤ |query| rows) → broadcast; `N`/`avgdl` are
    *    one-row scalar aggregates → broadcast cross join;
    *  - doc length is a scan-side expression on the documents row (one row
    *    per doc — no aggregate), with the split bound to a projected column
    *    first so the HOF filter does not re-split per element;
    *  - final ranking is `orderBy(...).limit(k)` → TakeOrderedAndProject,
    *    never a global sort.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(topK > 0, s"topK must be positive: $topK")
    val base = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("__toks"))
      .withColumn("dl",
        size(filter(col("__toks"), t => length(t) > 0)).cast("double"))
    val stats = base.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val tf = base
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("c", round(
        col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 6))
    contrib.groupBy("doc_id")
      .agg(round(sum("c"), 4).as("score"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** BM25F (Robertson, Zaragoza & Taylor 2004, "Simple BM25 extension to
    * multiple weighted fields") — the field-weighted scorer a structured
    * corpus needs: a query-term hit in the title should count more than
    * one buried in the body, but naive per-field BM25 score summing
    * breaks tf saturation (a term matching twice across fields saturates
    * as two independent terms). BM25F fixes it by combining at the TF
    * level: per field f, the length-normalized
    * {{{ tf̃_f = w_f · tf_f / (1 − b + b·len_f/avglen_f) }}}
    * sums across fields into ONE pseudo-frequency tf̃, which then
    * saturates once:
    * {{{ score(d) = Σ_t idf(t) · tf̃·(k1+1) / (tf̃ + k1) }}}
    * idf is document-level (`ln(1 + (N − df + 0.5)/(df + 0.5))`, df = docs
    * where tf̃ > 0 in ANY field). Tokenization/rounding follow [[bm25]]
    * (single-space split; 6dp per-term, 4dp total). Returns the topK by
    * `(score desc, id)`.
    *
    * Shape for scale: one scan per FIELD (fields are a bounded literal
    * list, 2–3 in practice), each exploded and filtered to query terms
    * scan-side exactly like [[bm25]]; per-field average lengths are
    * one-row broadcast aggregates; the cross-field combine is a
    * `(doc, term)`-keyed sum over `|query| × matching docs` rows — never
    * corpus-sized after the scan.
    */
  def bm25f(docs: DataFrame, idCol: String, fields: Seq[(String, Double)],
            queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
            topK: Int = 10): DataFrame = {
    require(fields.nonEmpty, "fields must be non-empty")
    require(fields.forall(_._2 > 0), "field weights must be positive")
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(topK > 0, s"topK must be positive: $topK")
    val perField = fields.map { case (fc, wt) =>
      val base = docs.select(col(idCol).as("doc_id"),
          split(col(fc), " ").as("__toks"))
        .withColumn("lf",
          size(filter(col("__toks"), t => length(t) > 0)).cast("double"))
      val avgLen = base.agg(avg("lf").as("avglf"))
      base
        .select(col("doc_id"), col("lf"), explode(col("__toks")).as("term"))
        .where(col("term").isin(queryTerms: _*))
        .groupBy("doc_id", "lf", "term").agg(count(lit(1)).as("tf"))
        .crossJoin(broadcast(avgLen))
        .select(col("doc_id"), col("term"),
          (lit(wt) * col("tf") /
            (lit(1.0 - b) + lit(b) * col("lf") / col("avglf"))).as("wtf"))
    }
    val combined = perField.reduce(_ unionByName _)
      .groupBy("doc_id", "term").agg(sum("wtf").as("tfw"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val dfT = combined.groupBy("term").agg(count(lit(1)).as("df"))
    combined.join(broadcast(dfT), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("c", round(
        col("idf") * col("tfw") * (lit(k1) + 1.0) /
          (col("tfw") + lit(k1)), 6))
      .groupBy("doc_id")
      .agg(round(sum("c"), 4).as("score"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Query-likelihood ranking with Dirichlet smoothing (Zhai & Lafferty
    * 2001) — the language-modeling alternative to [[bm25]]:
    * {{{ score(d) = Σ_t ln( (tf(t,d) + μ·cf(t)/|C|) / (dl + μ) ) }}}
    * where cf is the term's collection frequency and μ the Dirichlet
    * pseudo-count. Smoothing means EVERY document scores on every term
    * (a missing term contributes the collection prior, not −∞), so the
    * ranking reflects both presence and document length without BM25's
    * two tuning knobs. A term absent from the whole collection (cf = 0)
    * has no prior to smooth toward — its textbook contribution is the
    * same −∞ for every document, i.e. zero ranking signal — so it
    * degrades uniformly to a 0.0 contribution rather than letting
    * Spark's ln(0) = NULL null out every score. Ties cut by
    * (score desc, id). Returns the topK: (doc_id, score,
    * n_terms_matched).
    *
    * Shape for scale — deliberately SHUFFLE-FREE: per-term tf comes from
    * counting the document's own token array scan-side (query terms are
    * a bounded literal list — no explode, no (doc, term) shuffle);
    * collection frequencies are |query| conditional sums in ONE
    * aggregate, broadcast back as a one-row frame; the only movement is
    * the TakeOrderedAndProject top-k. Everything between scan and top-k
    * is codegen'd row-local arithmetic.
    */
  def queryLikelihood(docs: DataFrame, idCol: String, textCol: String,
                      queryTerms: Seq[String], mu: Double = 2000.0,
                      topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(mu > 0, s"mu must be positive: $mu")
    require(topK > 0, s"topK must be positive: $topK")
    val base = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("__toks"))
      .withColumn("__toks", filter(col("__toks"), t => length(t) > 0))
      .withColumn("dl", size(col("__toks")).cast("double"))
    val cfAggs = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(size(filter(col("__toks"), x => x === lit(t))).cast("long"))
        .as(s"__cf$i")
    } :+ sum(size(col("__toks")).cast("long")).as("__ctot")
    val cf = base.agg(cfAggs.head, cfAggs.tail: _*)
    val scored = base.crossJoin(broadcast(cf))
    val terms = queryTerms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("__toks"), x => x === lit(t)))
        .cast("double")
      val prior = lit(mu) * (col(s"__cf$i").cast("double") / col("__ctot"))
      // Out-of-vocabulary guard: cf = Σ tf, so cf = 0 forces tf = 0 in
      // EVERY document and the contribution would be ln(0) — which Spark
      // evaluates to NULL, silently nulling the whole score for every
      // document (not the −∞ the formula intends). Such a term carries no
      // ranking signal (identical −∞ shift for all docs), so it degrades
      // UNIFORMLY to a 0.0 contribution instead; n_terms_matched already
      // reads 0 for it everywhere.
      val contrib = when(col(s"__cf$i") === 0, lit(0.0))
        .otherwise(log((tf + prior) / (col("dl") + mu)))
      (contrib, (tf > 0).cast("long"))
    }
    scored
      .withColumn("score", terms.map(_._1).reduce(_ + _))
      .withColumn("n_terms_matched", terms.map(_._2).reduce(_ + _))
      .select(col("doc_id"), col("score"), col("n_terms_matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Pseudo-relevance feedback (the RM3 relevance-model idea, Lavrenko &
    * Croft 2001): run [[bm25]], treat the top `fbDocs` hits as
    * pseudo-relevant, and score every term in them by
    * w(t) = Σ_d (tf_td / dl_d) · score_d — each feedback doc votes its
    * length-normalized term distribution weighted by its retrieval
    * score — then return the top `fbTerms` NON-query terms, weights
    * normalized to sum 1. These are the expansion terms a second-pass
    * query adds; surfacing them as data (rather than re-querying
    * internally) keeps the operator composable with any downstream
    * retrieval. Deterministic end to end: the feedback cut is bm25's
    * (score desc, doc_id) total order, the term cut ties on
    * (weight desc, term).
    *
    * Shape: the bm25 pass (compact (doc, term, tf) aggregates, one-row
    * corpus stats broadcast), ONE semi-join of the corpus against the
    * fbDocs-sized hit list (broadcast — it is ≤ fbDocs rows), one
    * explode→aggregate over ONLY the feedback docs' text, and a
    * TakeOrdered fbTerms cut. Raw corpus text never shuffles.
    */
  def pseudoRelevanceExpansion(docs: DataFrame, idCol: String,
                               textCol: String, queryTerms: Seq[String],
                               fbDocs: Int = 10, fbTerms: Int = 10,
                               k1: Double = 1.2, b: Double = 0.75):
      DataFrame = {
    require(fbDocs > 0, s"fbDocs must be positive: $fbDocs")
    require(fbTerms > 0, s"fbTerms must be positive: $fbTerms")
    val hits = bm25(docs, idCol, textCol, queryTerms, k1, b, topK = fbDocs)
      .select(col("doc_id"), col("score"))
    val fb = docs.select(col(idCol).as("doc_id"), col(textCol).as("__txt"))
      .join(broadcast(hits), "doc_id")
      .withColumn("__toks",
        filter(split(col("__txt"), " "), t => length(t) > 0))
      .withColumn("dl", size(col("__toks")).cast("double"))
    val weighted = fb
      .select(col("doc_id"), col("dl"), col("score"),
        explode(col("__toks")).as("term"))
      .where(!col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "score", "term")
      .agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(sum(col("tf") / col("dl") * col("score")).as("__w"),
        countDistinct(col("doc_id")).as("n_fb_docs"))
    val total = weighted.agg(sum("__w").as("__tot"))
    weighted.crossJoin(broadcast(total))
      .select(col("term"), col("n_fb_docs"),
        (col("__w") / col("__tot")).as("weight"))
      .orderBy(col("weight").desc, col("term"))
      .limit(fbTerms)
  }

  /** Materialized inverted index: one row per (term, band) with an
    * id-sorted posting array of (id, tf) structs — the persist-once
    * search artifact. Banding (`floor(id / bandSize)`) caps every
    * posting ARRAY at the band's doc count, so a stop-word's postings
    * shard across rows instead of concentrating 10⁹ entries in one
    * array/task — the skew guard that makes the build safe at corpus
    * scale. `df` on each row is the term's TOTAL document frequency
    * (repeated across its bands, so any slice of the index scores
    * correctly without a second lookup).
    *
    * Build shape: explode once → (term, id) count agg → band rollup with
    * `sort_array(collect_list(...))` per (term, band) — two compact-key
    * shuffles, raw text never moves past the first projection.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    bandSize: Long = 1 << 20): DataFrame = {
    require(bandSize >= 1, s"bandSize must be positive: $bandSize")
    val tf = docs
      .select(col(idCol).cast("long").as("id"),
        explode(filter(split(col(textCol), " "), t => length(t) > 0))
          .as("term"))
      .groupBy("term", "id").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.withColumn("band", floor(col("id") / bandSize))
      .groupBy("term", "band")
      .agg(sort_array(collect_list(struct(col("id"), col("tf"))))
        .as("postings"))
      .join(df, "term")
      .select("term", "band", "df", "postings")
  }

  /** Per-document token lengths — the index's companion dictionary
    * (BM25's `dl`); persist alongside [[invertedIndex]].
    */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("id"),
      size(filter(split(col(textCol), " "), t => length(t) > 0))
        .cast("double").as("dl"))

  /** BM25 search over a PREBUILT [[invertedIndex]] — the no-rescan query
    * path: only the query terms' index rows are touched (a scan-side
    * `isin` filter the parquet reader can push down on the `term`
    * column), their postings explode into |query| × df tf rows, and
    * scoring proceeds exactly as [[bm25]] — same idf, same saturation,
    * same rounding, same ranking, so search-over-index ≡ search-over-
    * corpus row for row. Corpus stats (N, avgdl) come from the lengths
    * dictionary, never the corpus.
    */
  def searchIndex(index: DataFrame, lengths: DataFrame,
                  queryTerms: Seq[String], k1: Double = 1.2,
                  b: Double = 0.75, topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val stats = lengths.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val tf = index
      .where(col("term").isin(queryTerms: _*))
      .select(col("term"), col("df"),
        explode(col("postings")).as("p"))
      .select(col("term"), col("df"),
        col("p.id").as("doc_id"), col("p.tf").as("tf"))
      .join(lengths.withColumnRenamed("id", "doc_id"), "doc_id")
    val contrib = tf
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("c", round(
        col("idf") * col("tf") * (lit(k1) + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 6))
    contrib.groupBy("doc_id")
      .agg(round(sum("c"), 4).as("score"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
    * merge heterogeneous candidate lists (lexical BM25 + embedding ANN,
    * the hybrid-retrieval shape) without calibrating their incomparable
    * scores: each system contributes `1/(rrfK + rank)` and the fused
    * score is the sum, so an item ranked well by several systems beats a
    * single system's favourite.
    *
    * Inputs are already-ranked candidate lists (`idCol`, `rankCol` with
    * rank 1 = best) — BOUNDED top-k frames by construction, which is why
    * a plain union + per-id aggregate is the whole plan: the fused work
    * is O(systems × k), independent of corpus size; the corpus-scale
    * work happened inside the upstream rankers. Ties are broken by id.
    *
    * With two systems the fused sum is order-exact (IEEE addition is
    * commutative); at three or more, compare at rounded precision
    * (summation order is not guaranteed).
    */
  def reciprocalRankFusion(rankings: Seq[DataFrame], idCol: String,
                           rankCol: String = "rank", rrfK: Int = 60,
                           topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(rrfK > 0 && topK > 0, s"rrfK/topK must be positive: $rrfK/$topK")
    rankings
      .map(df => df.select(col(idCol),
        col(rankCol).cast("long").as("__rank")))
      .reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(sum(lit(1.0) / (lit(rrfK) + col("__rank"))).as("rrf_score"),
        count(lit(1)).as("n_systems"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topK)
  }

  /** Sparse TF-IDF cosine self-join: every document pair whose tf-idf
    * cosine reaches `threshold` — the LEXICAL near-duplicate / related-
    * document detector that complements the embedding-space joins
    * ([[graft.operators.Similarity]]) when no embeddings exist or when
    * "same words" matters more than "same meaning".
    *
    * The join is TERM-PARTITIONED, the sparse-vector trick that makes
    * document cosine feasible at corpus scale: weights join on the term
    * key, each shared term contributes one partial product, and a
    * (doc_a, doc_b)-keyed sum assembles the dots — only pairs that SHARE
    * a term ever materialize, vs the dense all-pairs cross join. The
    * quadratic hot-term risk is capped by `maxDfRatio`: terms in more
    * than that share of docs are dropped BEFORE the join (stopwords
    * carry ~zero idf weight anyway — the cap changes cost, not meaning,
    * and mirrors the prefix-filter discipline of the exact Jaccard
    * join).
    *
    * Candidate generation is PREFIX-FILTERED (Bayardo et al., "Scaling
    * Up All Pairs Similarity Search", WWW'07): order terms globally by
    * descending df (most common first); for each doc the running bound
    * B(t) = Σ_{t' ⪯ t} ŵ(t')·maxŵ(t') — normalized weight times the
    * corpus-max normalized weight of the term — overestimates the cosine
    * any other doc can reach through terms up to t, so only terms with
    * B(t) ≥ threshold (the doc's rare, discriminative "prefix" under the
    * reversed order) need to be indexed. For any pair with cos ≥ t, its
    * ⪰-minimal shared term is provably in BOTH prefixes, so joining
    * prefix-to-prefix finds every qualifying pair (exact, not
    * approximate); a second, candidate-scoped join over the FULL vectors
    * computes the true dot. High-df terms carry tiny ŵ·maxŵ, so they
    * fall out of every prefix and the hot-term df² blowup never runs —
    * candidate work tracks the number of TRUE near-pairs, not the number
    * of docs sharing a mid-frequency term. Pairs emit once
    * (doc_a < doc_b). Returns (doc_a, doc_b, n_shared_terms, cos).
    */
  def tfidfCosineJoin(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, maxDfRatio: Double = 0.5,
                      maxDf: Long = Long.MaxValue): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1]: $threshold")
    require(maxDfRatio > 0 && maxDfRatio <= 1,
      s"maxDfRatio in (0,1]: $maxDfRatio")
    require(maxDf > 0, s"maxDf must be positive: $maxDf")
    val tf = docs
      .select(col(idCol).as("__id"),
        explode(graft.functions.Text.shingles(col(textCol), 1)).as("__t"))
      .groupBy("__id", "__t").agg(count(lit(1)).as("__tf"))
      .localCheckpoint() // df counts + weights + norms all read it
    val n = tf.select(col("__id")).distinct().count().toDouble
    // maxDf is the ABSOLUTE stopword cap — the knob that stays put as
    // the corpus grows: a ratio cap admits ever-more-common terms at
    // ever-larger N (0.3 of 50k docs readmits terms the same ratio
    // dropped at 5k), silently re-weighting the whole similarity space
    // between a pilot run and the full corpus
    val idf = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= least(lit(n * maxDfRatio), lit(maxDf)))
      .withColumn("__idf", log(lit(n) / col("__df")))
    val w = tf.join(idf.select("__t", "__df", "__idf"), "__t")
      .select(col("__id"), col("__t"), col("__df"),
        (col("__tf") * col("__idf")).as("__w"))
      .localCheckpoint() // norm pass, prefix index + verify join share it
    val norms = w.groupBy("__id")
      .agg(sqrt(sum(col("__w") * col("__w"))).as("__norm"))
    // ---- prefix index (normalized weights used ONLY to bound; the
    // emitted cos below keeps the original dot/(na·nb) float path) ----
    val wn = w.join(norms, "__id")
      .withColumn("__nw", col("__w") / col("__norm"))
    val maxw = wn.groupBy("__t").agg(max("__nw").as("__maxw"))
    // suffix-bound window: df desc puts common terms first, so the
    // running sum at term t covers t and everything RARER than it —
    // the most a shared-at-or-after-t pair can score
    val pfx = Window.partitionBy("__id")
      .orderBy(col("__df").desc, col("__t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val index = wn.join(maxw, "__t")
      .withColumn("__bnd", sum(col("__nw") * col("__maxw")).over(pfx))
      // 1e-9 slack: the bound is float arithmetic; a pair at exactly the
      // threshold must not lose its witness term to an ulp
      .where(col("__bnd") >= threshold - 1e-9)
      .select(col("__id"), col("__t"))
      .localCheckpoint() // both sides of the candidate self-join
    val cand = index.select(col("__id").as("doc_a"), col("__t"))
      .join(index.select(col("__id").as("doc_b"), col("__t")), "__t")
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // candidate-scoped verify over the FULL capped vectors: fan each
    // pair by doc_a's terms, keep doc_b's matching terms, sum the dot
    val dots = cand
      .join(w.select(col("__id").as("doc_a"), col("__t"),
        col("__w").as("__wa")), "doc_a")
      .join(w.select(col("__id").as("doc_b"), col("__t"),
        col("__w").as("__wb")), Seq("doc_b", "__t"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared_terms"),
        sum(col("__wa") * col("__wb")).as("__dot"))
    // norms are doc-count-sized: plain keyed joins (AQE broadcasts them
    // when small; at corpus scale they must shuffle, not broadcast)
    dots
      .join(norms.select(col("__id").as("doc_a"),
        col("__norm").as("__na")), "doc_a")
      .join(norms.select(col("__id").as("doc_b"),
        col("__norm").as("__nb")), "doc_b")
      .withColumn("cos", col("__dot") / (col("__na") * col("__nb")))
      .where(col("cos") >= threshold)
      .select("doc_a", "doc_b", "n_shared_terms", "cos")
  }

  /** Rank-biased overlap (Webber et al. 2010) between two top-`depth`
    * rankings — the top-weighted agreement measure for comparing ranker
    * outputs (did swapping BM25 for the new embedding ranker change what
    * users actually see?), where Kendall/Spearman weight every position
    * equally and demand identical item sets. An item in both rankings
    * enters the overlap at d = max(rank_a, rank_b), so the agreement at
    * depth d is X_d = |{items: max rank ≤ d}| — one running count. The
    * extrapolated score at evaluation depth k:
    *
    *   RBO = (1−p) Σ_{d=1..k} p^{d−1} X_d/d  +  p^k X_k/k
    *
    * p ∈ (0, 1) sets top-weightedness (p = 0.9 ≈ the top 10 carry ~86 %
    * of the mass). 1 on identical rankings, 0 on disjoint ones; defined
    * even when the two rankings cover different item sets (the case that
    * breaks the correlation coefficients).
    *
    * Both inputs are top-`depth` RANKING ARTIFACTS (rank ∈ 1..depth, the
    * [[reciprocalRankFusion]] contract) — k-bounded per group by caller
    * contract, so the per-group depth spine and its cumulative window are
    * ≤ depth rows; corpus-scale work stays in the upstream rankers. The
    * weighted sum folds in ASCENDING d order via a sorted-array
    * `aggregate` (strict left-to-right binary64 — an oracle replaying the
    * same order agrees bit-for-bit; a plain SUM would drift at the ulp).
    *
    * `groupCols` scopes the comparison (e.g. per query id); empty
    * compares two global rankings → one row. Returns
    * (groupCols..., overlap_at_k, rbo).
    */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, idCol: String,
                        rankCol: String, depth: Int, p: Double = 0.9,
                        groupCols: Seq[String] = Nil): DataFrame = {
    require(depth >= 1, s"depth must be positive: $depth")
    require(p > 0 && p < 1, s"p must be in (0,1): $p")
    val g = if (groupCols.isEmpty) Seq("__g") else groupCols
    def side(df: DataFrame, out: String): DataFrame = {
      val base = if (groupCols.isEmpty) df.withColumn("__g", lit(0)) else df
      base.select(g.map(col) :+ col(idCol).as("__id") :+
        col(rankCol).cast("int").as(out): _*)
        .where(col(out) <= depth)
    }
    val entries = side(a, "__ra").join(side(b, "__rb"), g :+ "__id")
      .select(g.map(col) :+ greatest(col("__ra"), col("__rb")).as("__d"): _*)
      .groupBy((g :+ "__d").map(col): _*).agg(count(lit(1)).as("__c"))
    // groups present in EITHER ranking emit a row (zero-overlap pairs
    // score 0, they don't vanish); the spine is depth rows per group
    val groups = side(a, "__ra").select(g.map(col): _*)
      .unionByName(side(b, "__rb").select(g.map(col): _*)).distinct()
    val spine = groups.select(g.map(col) :+
      explode(sequence(lit(1), lit(depth))).as("__d"): _*)
    val wCum = Window.partitionBy(g.map(col): _*).orderBy("__d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val xd = spine.join(entries, g :+ "__d", "left")
      .withColumn("__x", sum(coalesce(col("__c"), lit(0L))).over(wCum))
      .withColumn("__term",
        lit(1.0 - p) * pow(lit(p), col("__d") - 1) * col("__x") / col("__d"))
    xd.groupBy(g.map(col): _*)
      .agg(sort_array(collect_list(struct(col("__d"), col("__term"))))
          .as("__terms"),
        max(when(col("__d") === depth, col("__x"))).as("overlap_at_k"))
      .withColumn("rbo",
        aggregate(col("__terms"), lit(0.0),
          (acc, t) => acc + t.getField("__term")) +
          pow(lit(p), lit(depth)) * col("overlap_at_k") / depth)
      .select((if (groupCols.isEmpty) Nil else groupCols.map(col)) ++
        Seq(col("overlap_at_k"), col("rbo")): _*)
  }
}

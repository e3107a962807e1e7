package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality audits over a table — the dbt-test /
  * Deequ-style contract layer a lake pipeline runs between zones (the
  * reference eyeballs its conform step; this makes the checks queryable).
  *
  * All checks evaluate in ONE scan: each predicate becomes a conditional
  * count inside a single aggregate, then the wide row unpivots to one row
  * per check. N checks cost one pass regardless of N — never a scan per
  * check (the naive UNION ALL formulation is N scans).
  */
object Quality {

  /** Run named validity predicates (`true` = row passes); returns one row
    * per check: `check_name, n_rows, n_failed`. NULL predicate results
    * count as failures (a null check outcome is not a pass).
    */
  def audit(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty)
    // Evaluate predicates in a projection first: window-based checks (e.g.
    // `unique`) are legal in a select but not inside an aggregate call.
    val flags = checks.zipWithIndex.map { case ((_, pred), i) =>
      coalesce(pred, lit(false)).as(s"__p$i")
    }
    // coalesce: sum() over zero rows is NULL, but an empty (e.g. fully
    // filtered) table must report 0 failures, not null-poison the gate
    val aggs = count(lit(1)).as("__n") +:
      checks.indices.map(i =>
        coalesce(sum(when(col(s"__p$i"), 0L).otherwise(1L)), lit(0L))
          .as(s"__c$i"))
    val wide = df.select(flags: _*).agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.zipWithIndex
      .map { case ((name, _), i) => s"'${name.replace("'", "''")}', __c$i" }
      .mkString(", ")
    wide.select(
      expr(s"stack(${checks.size}, $stackArgs) AS (check_name, n_failed)"),
      col("__n").as("n_rows"))
      .select("check_name", "n_rows", "n_failed")
  }

  /** Per-document repetition profile over word n-grams — the
    * Gopher/RefinedWeb-style "repetitious text" quality signal: boilerplate
    * and generation loops show up as a high duplicate-n-gram fraction or a
    * single n-gram dominating the document.
    *
    * Returns (id, dup_frac, top_frac): fraction of n-gram OCCURRENCES that
    * are repeats of an earlier one, and the most frequent n-gram's share.
    * Docs with fewer than `n` tokens have no n-grams and are omitted
    * (filter them with a length check first — they're a different failure
    * mode).
    *
    * Shape for scale: shingles come from the scan-side native expression;
    * the per-(doc, gram) count partial-aggregates map-side, and the second
    * aggregate carries only (doc, count) rows. Both shuffles are keyed on
    * the doc id — no corpus-wide hot key is possible.
    */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 2): DataFrame =
    df.where(graft.functions.Text.tokenCount(col(textCol)) >= n)
      .select(col(idCol),
        explode(graft.functions.Text.shingles(col(textCol), n)).as("__g"))
      .groupBy(col(idCol), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(
        sum("__c").as("__tot"), max("__c").as("__mx"), count(lit(1)).as("__nd"))
      .select(col(idCol),
        (lit(1.0) - col("__nd").cast("double") / col("__tot")).as("dup_frac"),
        (col("__mx").cast("double") / col("__tot")).as("top_frac"))

  /** Corpus-relative unigram negative-log-likelihood per document — the
    * cheap proxy for the LM-perplexity quality filter (CCNet-style): docs
    * whose tokens are improbable UNDER THIS CORPUS's own unigram
    * distribution score high (gibberish, encoding damage, wrong-language
    * residue); boilerplate scores low. Returns (id, nll, n_toks).
    *
    * Shape for scale: one explode of the corpus; the unigram frequency
    * table (vocabulary ≪ corpus) broadcasts back onto the token stream —
    * identical to the TF-IDF plan (q63), one shuffle keyed on the doc id
    * for the final per-doc average; the corpus total is a broadcast
    * one-row cross join (the A5 scalar pattern).
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.where(graft.functions.Text.tokenCount(col(textCol)) >= 1)
      .select(col(idCol),
        explode(graft.functions.Text.shingles(col(textCol), 1)).as("__tok"))
    val freq = toks.groupBy("__tok").agg(count(lit(1)).as("__c"))
    val total = freq.agg(sum("__c").cast("double").as("__t"))
    // freq is the corpus VOCABULARY — heaps-law data-scale (URLs, typos,
    // unicode junk), so no unconditional broadcast hint; AQE promotes it
    // when it is actually small
    toks.join(freq, Seq("__tok"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol)).agg(
        avg(-log(col("__c").cast("double") / col("__t"))).as("nll"),
        count(lit(1)).as("n_toks"))
  }

  /** Gopher-style quality-rule report (Rae et al. 2021, table A1
    * simplified to the signals derivable from a bare text column): per doc,
    * the raw signals AND the per-rule pass flags, so a pipeline can both
    * filter (`passes`) and AUDIT which rule fires where — filter stacks
    * tuned blind are how good corpora get gutted.
    *
    *  - `n_words` ∈ [minWords, maxWords]
    *  - mean word length ∈ [3, 10]
    *  - symbol-to-char ratio (# @ % ^ * { } | ~) < 0.1
    *  - ≥ 2 standalone hits from a tiny English stopword set (the
    *    "real prose, not a keyword list" signal)
    *
    * Entirely scan-side: one projection computes every signal (the
    * stopword count is a `filter` HOF over the token split, no explode,
    * no shuffle at all until the caller aggregates).
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minWords: Long = 50, maxWords: Long = 100000): DataFrame = {
    val stops = Seq("the", "and", "of", "to", "a", "in", "is", "that")
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val nWords = graft.functions.Text.tokenCount(col(textCol)).cast("long")
    val nLetters = length(regexp_replace(col(textCol), "\\s", "")).cast("double")
    val meanWlen = when(nWords === 0, 0.0).otherwise(nLetters / nWords)
    val nSymbols = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "[#@%^*{}|~]", ""))).cast("double")
    val symRatio = when(length(col(textCol)) === 0, 0.0)
      .otherwise(nSymbols / length(col(textCol)))
    val stopHits = when(nWords === 0, 0)
      .otherwise(size(filter(toks, t =>
        stops.map(s => t === s).reduce(_ || _))))
    df.select(col(idCol),
        nWords.as("n_words"), meanWlen.as("mean_wlen"),
        symRatio.as("sym_ratio"), stopHits.cast("long").as("stop_hits"))
      .withColumn("ok_words", col("n_words").between(minWords, maxWords))
      .withColumn("ok_wlen", col("mean_wlen").between(3.0, 10.0))
      .withColumn("ok_sym", col("sym_ratio") < 0.1)
      .withColumn("ok_stop", col("stop_hits") >= 2)
      .withColumn("passes",
        col("ok_words") && col("ok_wlen") && col("ok_sym") && col("ok_stop"))
  }

  /** C4-style line-level cleaning (Raffel et al. 2020, §2.2 heuristics
    * derivable from a bare text column): keep only lines that end in a
    * terminal punctuation mark (`. ! ? "`), carry at least `minLineWords`
    * words, and do not mention "javascript"; flag docs containing
    * "lorem ipsum" or a curly brace (code/template leakage), and docs
    * whose surviving line count falls below `minLines`. Returns per doc:
    * `text_clean` (kept lines, original order, `lineSep`-joined),
    * `n_kept`, `n_lines`, `has_lorem`, `has_brace`, `passes` — signals
    * AND flags, same auditability contract as [[gopherRules]].
    *
    * Entirely scan-side: one projection — the line split, per-line rule
    * stack, and reassembly are all `filter`/`concat_ws` HOFs over the
    * split array, no explode, ZERO shuffle at any corpus size.
    */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
              lineSep: String = "\n", minLineWords: Int = 5,
              minLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), java.util.regex.Pattern.quote(lineSep))
    val kept = filter(lines, l =>
      rtrim(l).rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= minLineWords &&
        !lower(l).contains("javascript"))
    df.select(col(idCol),
        concat_ws(lineSep, kept).as("text_clean"),
        size(kept).cast("long").as("n_kept"),
        size(lines).cast("long").as("n_lines"),
        lower(col(textCol)).contains("lorem ipsum").as("has_lorem"),
        col(textCol).contains("{").as("has_brace"))
      .withColumn("passes",
        !col("has_lorem") && !col("has_brace") && col("n_kept") >= minLines)
  }

  /** CCNet-style boilerplate removal: drop text units (sentences /
    * paragraphs, split on `unitRegex`) that recur across `minDocs` or more
    * DISTINCT documents — nav bars, cookie banners, license footers — and
    * reassemble each doc's surviving units in original order. Returns
    * `(idCol, text_clean, n_kept, n_dropped)`; a doc whose every unit is
    * boilerplate survives with empty `text_clean` (so the caller can count
    * gutted docs rather than silently losing them).
    *
    * Shape for scale (the CCNet shard recipe): unit frequency aggregates
    * on `md5(unit)` — the 32-byte digest shuffles, never the unit text —
    * and the frequent set (bounded by corpus_units / minDocs) joins back
    * as a LEFT join marker — strategy left to AQE: at web-corpus scale
    * the frequent-unit set can be far from broadcastable (its bound grows
    * with the corpus), and a forced broadcast would OOM exactly where the
    * operator is most needed. The one full-text shuffle is the per-doc
    * reassembly groupBy, unavoidable for order-preserving re-join and
    * doc-keyed so it skews only if a single doc is huge. md5 collisions
    * (2^-128-scale) could at worst mark one rare unit as boilerplate —
    * the same trade CCNet's sha1 paragraph hashing makes.
    */
  def boilerplateFilter(df: DataFrame, idCol: String, textCol: String,
                        unitRegex: String = "[.!?]+\\s+", minDocs: Long = 3,
                        joinSep: String = ". "): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would drop every unit")
    val units = df
      .select(col(idCol), posexplode(filter(
        split(trim(col(textCol)), unitRegex), s => length(s) > 0)))
      .select(col(idCol), col("pos"), col("col").as("__unit"),
        md5(col("col")).as("__uh"))
    val frequent = units.groupBy("__uh")
      .agg(countDistinct(col(idCol)).as("__df"))
      .where(col("__df") >= minDocs)
      .select(col("__uh"), lit(true).as("__boiler"))
    units.join(frequent, Seq("__uh"), "left")
      .groupBy(col(idCol))
      .agg(
        concat_ws(joinSep, transform(
          array_sort(collect_list(when(col("__boiler").isNull,
            struct(col("pos"), col("__unit"))))),
          _.getField("__unit"))).as("text_clean"),
        sum(when(col("__boiler").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__boiler").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
  }

  /** Per-document character Shannon entropy (nats) — the cheap
    * gibberish/encoding-damage detector: natural prose sits in a narrow
    * entropy band, base64/hex blobs and mojibake score high, repeated-char
    * padding scores near zero. Returns `(idCol, entropy, n_chars)`;
    * empty/null docs are omitted.
    *
    * Shape for scale: one explode keyed by the doc id; the per-(doc, char)
    * count partial-aggregates map-side, and the second aggregate carries
    * only (doc, char-count) rows — both shuffles doc-keyed, no corpus-wide
    * hot key.
    */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.where(length(col(textCol)) >= 1)
      .select(col(idCol), explode(split(col(textCol), "")).as("__ch"))
      .groupBy(col(idCol), col("__ch")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(
        sum("__c").as("__n"),
        sum(col("__c") * log(col("__c"))).as("__clogc"))
      // H = ln(n) − Σ c·ln(c) / n  (algebraic form: one pass, no second
      // join against the total)
      .select(col(idCol),
        (log(col("__n")) - col("__clogc") / col("__n")).as("entropy"),
        col("__n").cast("long").as("n_chars"))

  /** Bigram stupid-backoff NLL vs a REFERENCE corpus — one rung up the
    * perplexity-filter ladder from [[unigramLogProb]] (CCNet trains a
    * 5-gram KenLM on Wikipedia and filters web text by perplexity; the
    * bigram stupid-backoff model is its shuffle-friendly sketch). Score of
    * an occurrence `w1 w2`:
    * `c2(w1 w2) / c1(w1)` when the bigram is in the reference, else
    * `backoff × (c1(w2) + 1) / (N + V)` (add-1-smoothed unigram fallback,
    * so out-of-vocabulary words stay finite). Returns
    * `(idCol, nll_bg, n_bigrams)` = avg −ln(score) over the doc's bigram
    * occurrences; docs with < 2 tokens are omitted.
    *
    * Shape for scale: scoring joins happen once per DISTINCT bigram of the
    * scored corpus (vocabulary-sized), not per occurrence; the occurrence
    * stream then joins the scored-bigram table and aggregates per doc.
    * No broadcast is forced — reference n-gram tables grow with the
    * reference corpus, so AQE picks broadcast vs shuffle join by size.
    *
    * The reference must contain at least one token: with an empty
    * reference the smoothing denominator `N + V` is 0 and every score
    * degenerates (there is no distribution to score against).
    */
  def bigramLogProb(df: DataFrame, reference: DataFrame, idCol: String,
                    textCol: String, backoff: Double = 0.4): DataFrame = {
    require(backoff > 0 && backoff <= 1)
    def grams(d: DataFrame, n: Int, ids: Seq[Column]) =
      d.where(graft.functions.Text.tokenCount(col(textCol)) >= n)
        .select(ids :+
          explode(graft.functions.Text.shingles(col(textCol), n)).as("__g"): _*)
    val c1 = grams(reference, 1, Nil).groupBy("__g").agg(count(lit(1)).as("__c1"))
    val c2 = grams(reference, 2, Nil).groupBy("__g").agg(count(lit(1)).as("__c2"))
      .withColumnRenamed("__g", "__bg")
    val scal = c1.agg(coalesce(sum("__c1"), lit(0L)).cast("double").as("__n"),
      count(lit(1)).cast("double").as("__v"))
    val docBg = grams(df, 2, Seq(col(idCol))).withColumnRenamed("__g", "__bg")
    val scoredBg = docBg.select("__bg").distinct()
      .withColumn("__w1", substring_index(col("__bg"), " ", 1))
      .withColumn("__w2", substring_index(col("__bg"), " ", -1))
      .join(c2, Seq("__bg"), "left")
      .join(c1.withColumnRenamed("__g", "__w1"), Seq("__w1"), "left")
      .join(c1.withColumnRenamed("__g", "__w2")
        .withColumnRenamed("__c1", "__c1b"), Seq("__w2"), "left")
      .crossJoin(broadcast(scal))
      .select(col("__bg"),
        when(col("__c2").isNotNull,
          col("__c2").cast("double") / col("__c1"))
          .otherwise(lit(backoff) * (coalesce(col("__c1b"), lit(0L)) + 1.0) /
            (col("__n") + col("__v"))).as("__s"))
    docBg.join(scoredBg, Seq("__bg"))
      .groupBy(col(idCol)).agg(
        avg(-log(col("__s"))).as("nll_bg"), count(lit(1)).as("n_bigrams"))
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1998's interpolated form) — the stronger sibling of
    * [[bigramLogProb]]'s stupid backoff, and the model CCNet-style
    * perplexity filtering actually wants: continuation probability ranks
    * words by how many CONTEXTS they follow, so "francisco" (frequent but
    * only after "san") stops looking like a plausible continuation
    * everywhere.
    *
    *   P(w₂|w₁) = max(c(w₁w₂) − d, 0)/c(w₁)
    *            + d·N₁₊(w₁,·)/c(w₁) · P_cont(w₂)
    *   P_cont(w₂) = (N₁₊(·,w₂) + 1) / (B + V)
    *
    * with d the absolute discount, N₁₊(w₁,·) the distinct continuations
    * of w₁, N₁₊(·,w₂) the distinct contexts of w₂, B the distinct-bigram
    * count and V the vocabulary size. The continuation term carries +1/+V
    * smoothing (a deviation from the textbook, documented here) so
    * out-of-reference words score finitely instead of −ln 0; contexts the
    * reference never saw fall straight through to P_cont.
    *
    * Shape for scale: identical to [[bigramLogProb]] — reference n-gram
    * counts and the two fertility tables are vocabulary-sized aggregates,
    * scoring joins run over DISTINCT doc bigrams only, and the per-doc
    * NLL is one partial-aggregable avg. Returns (idCol, nll_kn,
    * n_bigrams).
    */
  def kneserNeyLogProb(df: DataFrame, reference: DataFrame, idCol: String,
                       textCol: String, discount: Double = 0.75)
  : DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1): $discount")
    def grams(d: DataFrame, n: Int, ids: Seq[Column]) =
      d.where(graft.functions.Text.tokenCount(col(textCol)) >= n)
        .select(ids :+
          explode(graft.functions.Text.shingles(col(textCol), n)).as("__g"): _*)
    val c1 = grams(reference, 1, Nil).groupBy("__g")
      .agg(count(lit(1)).as("__c1"))
    val c2 = grams(reference, 2, Nil).groupBy("__g")
      .agg(count(lit(1)).as("__c2"))
      .withColumn("__w1", substring_index(col("__g"), " ", 1))
      .withColumn("__w2", substring_index(col("__g"), " ", -1))
      .withColumnRenamed("__g", "__bg")
      .localCheckpoint() // feeds both fertility aggregates + the scorer
    // N1+(w1,·) / N1+(·,w2): row counts of the bigram table, per side
    val fert = c2.groupBy("__w1").agg(count(lit(1)).as("__fert"))
    val cont = c2.groupBy("__w2").agg(count(lit(1)).as("__cont"))
    val scal = c2.agg(count(lit(1)).cast("double").as("__b"))
      .crossJoin(c1.agg(count(lit(1)).cast("double").as("__v")))
    val docBg = grams(df, 2, Seq(col(idCol))).withColumnRenamed("__g", "__bg")
    val scoredBg = docBg.select("__bg").distinct()
      .withColumn("__w1", substring_index(col("__bg"), " ", 1))
      .withColumn("__w2", substring_index(col("__bg"), " ", -1))
      .join(c2.select("__bg", "__c2"), Seq("__bg"), "left")
      .join(c1.withColumnRenamed("__g", "__w1"), Seq("__w1"), "left")
      .join(fert, Seq("__w1"), "left")
      .join(cont, Seq("__w2"), "left")
      .crossJoin(broadcast(scal))
      .withColumn("__pc",
        (coalesce(col("__cont"), lit(0L)) + 1.0) / (col("__b") + col("__v")))
      .select(col("__bg"),
        when(col("__c1").isNull || col("__fert").isNull, col("__pc"))
          .otherwise(
            greatest(coalesce(col("__c2"), lit(0L)) - discount, lit(0.0)) /
              col("__c1") +
              lit(discount) * col("__fert") / col("__c1") * col("__pc"))
          .as("__s"))
    docBg.join(scoredBg, Seq("__bg"))
      .groupBy(col(idCol)).agg(
        avg(-log(col("__s"))).as("nll_kn"), count(lit(1)).as("n_bigrams"))
  }

  /** CCNet-style perplexity tiers (Wenzek et al. 2020): score every doc's
    * [[bigramLogProb]] NLL against a trusted `reference` corpus, then cut
    * the corpus into `numTiers` equal-population tiers by NLL quantile —
    * `head` (lowest perplexity, most reference-like), `middle`, `tail`.
    * CCNet keeps head+middle for LM training and drops or down-weights
    * tail; returning the assignment (not a filtered corpus) keeps that
    * policy choice with the caller. Labels are head/middle/tail for 3
    * tiers, `tier_k` otherwise. NLL is rounded to `roundTo` decimals
    * BEFORE bucketing so thresholds sit on reproducible values.
    *
    * Shape for scale: [[bigramLogProb]]'s vocabulary-sized scoring joins,
    * then ONE threshold aggregate broadcast back ([[Splits.quantileBuckets]]
    * — pass `approxAccuracy` at real scale for a mergeable sketch instead
    * of exact percentile's full sort).
    */
  def perplexityTiers(df: DataFrame, reference: DataFrame, idCol: String,
                      textCol: String, numTiers: Int = 3, roundTo: Int = 4,
                      approxAccuracy: Option[Int] = None): DataFrame = {
    val labels =
      if (numTiers == 3) Seq("head", "middle", "tail")
      else (0 until numTiers).map(i => s"tier_$i")
    val nll = bigramLogProb(df, reference, idCol, textCol)
      .select(col(idCol), round(col("nll_bg"), roundTo).as("nll_bg"),
        col("n_bigrams"))
    graft.operators.Splits
      .quantileBuckets(nll, "nll_bg", numTiers, approxAccuracy)
      .withColumn("tier",
        element_at(array(labels.map(lit): _*), col("bucket") + 1))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each candidate
    * document by how much more likely its hashed-unigram bag is under the
    * TARGET corpus's distribution than under the candidate pool's own —
    * `log w = Σ_tok [ log p̂_target(b(tok)) − log p̂_raw(b(tok)) ]` with
    * add-α smoothing over `buckets` hash buckets. Positive = looks like the
    * target domain; the standard cheap proxy for "select web data that
    * resembles Wikipedia/books" at pre-training scale.
    *
    * Returns `(idCol, weight, n_toks)` for every candidate with ≥1 token.
    *
    * `bucket` overrides the token→bucket hash (default murmur3 `hash()`,
    * codegen'd); the md5-prefix variant ([[Quality.md5Bucket]]) exists so a
    * SQL oracle can reproduce the bucketing exactly (same pattern as the
    * SimHash exact-oracle variant).
    *
    * Shape for scale: both corpora tokenize scan-side; the two bucket
    * histograms are ≤ `buckets` rows each (constants), so the log-ratio
    * table broadcasts back onto the candidate token stream — the only
    * data-sized shuffle is the final per-doc sum, keyed on the doc id, and
    * partial aggregation compacts it map-side. The target corpus is read
    * once and never joined row-to-row against candidates.
    */
  def importanceWeights(candidates: DataFrame, target: DataFrame,
                        idCol: String, textCol: String,
                        buckets: Int = 4096, alpha: Double = 1.0,
                        bucket: Option[Column => Column] = None): DataFrame = {
    require(buckets > 0 && alpha > 0)
    val bfn = bucket.getOrElse(murmurBucket(buckets) _)
    // target only needs textCol — it may be a different table than candidates
    def toks(df: DataFrame, ids: Seq[Column]): DataFrame =
      df.where(graft.functions.Text.tokenCount(col(textCol)) >= 1)
        .select(ids :+
          explode(graft.functions.Text.shingles(col(textCol), 1)).as("__tok"): _*)
        .select(ids :+ bfn(col("__tok")).as("__b"): _*)
    val candToks = toks(candidates, Seq(col(idCol)))
    val tgtHist = toks(target, Nil).groupBy("__b").agg(count(lit(1)).as("__ct"))
    val rawHist = candToks.groupBy("__b").agg(count(lit(1)).as("__cr"))
    val totals = tgtHist.agg(coalesce(sum("__ct"), lit(0L)).cast("double").as("__nt"))
      .crossJoin(rawHist.agg(coalesce(sum("__cr"), lit(0L)).cast("double").as("__nr")))
    val aB = alpha * buckets
    val llr = tgtHist.join(rawHist, Seq("__b"), "full_outer")
      .crossJoin(broadcast(totals))
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)) + alpha) / (col("__nt") + aB)) -
         log((coalesce(col("__cr"), lit(0L)) + alpha) / (col("__nr") + aB)))
          .as("__llr"))
    candToks.join(broadcast(llr), Seq("__b"))
      .groupBy(col(idCol)).agg(
        sum("__llr").as("weight"), count(lit(1)).as("n_toks"))
  }

  /** One multiplicative-weights step of DoReMi-style domain reweighting:
    * given per-ROW losses tagged by domain, the next mixture weight of
    * domain g is
    *
    *   w'_g ∝ ref_g · exp(η · (L̄_g − max_h L̄_h))
    *
    * normalized to sum 1, then smoothed toward uniform:
    * w_g = (1−ε)·w'_g + ε/G — domains the current model finds HARD
    * (high mean excess loss) gain mass, easy ones shrink, and ε keeps
    * every domain sampled (the DoReMi paper's smoothing). The reference
    * weight ref_g is the domain's share of `measureCol` mass (token
    * share by default intent) — the natural-distribution anchor, so a
    * hard-but-tiny domain cannot swallow the mixture in one step.
    * Subtracting the max loss before exp is the standard log-sum-exp
    * stabilizer: it cancels in the normalization and keeps exp() in
    * range for any loss magnitude.
    *
    * Scale shape: ONE partial-aggregable per-domain aggregate (mean
    * loss + mass), scalar max/total broadcasts back onto the
    * domain-count-sized frame — corpus rows are touched exactly once.
    * Returns (domainCol, n_rows, mass, ref_share, avg_loss, weight);
    * weights sum to 1 exactly up to binary64 rounding.
    */
  def domainReweight(df: DataFrame, domainCol: String, lossCol: Column,
                     measureCol: Column, eta: Double = 1.0,
                     epsilon: Double = 0.0): DataFrame = {
    require(eta > 0, s"eta must be positive: $eta")
    require(epsilon >= 0 && epsilon < 1, s"epsilon must be in [0,1): $epsilon")
    val per = df.groupBy(domainCol)
      .agg(count(lit(1)).as("n_rows"),
        sum(measureCol).cast("double").as("mass"),
        avg(lossCol).as("avg_loss"))
    val scal = per.agg(sum("mass").as("__tm"), max("avg_loss").as("__lm"),
      count(lit(1)).as("__ng"))
    val raw = per.crossJoin(broadcast(scal))
      .withColumn("ref_share", col("mass") / col("__tm"))
      .withColumn("__u",
        col("ref_share") * exp(lit(eta) * (col("avg_loss") - col("__lm"))))
    val norm = raw.agg(sum("__u").as("__z"))
    raw.crossJoin(broadcast(norm))
      .withColumn("weight",
        lit(1.0 - epsilon) * col("__u") / col("__z") +
          lit(epsilon) / col("__ng"))
      .select(col(domainCol), col("n_rows"), col("mass"), col("ref_share"),
        col("avg_loss"), col("weight"))
  }

  /** Gumbel-top-k importance RESAMPLE over [[importanceWeights]]: draw `k`
    * candidates without replacement with probability ∝ exp(weight) — the
    * paper's sampling step, which keeps diversity that a hard top-k cut
    * destroys (top-k alone concentrates on near-duplicates of the target).
    * The Gumbel noise is seeded per doc id (`-ln(-ln(u))`,
    * `u = (xxhash64(id, seed) mod M + ½)/M`), so the draw is deterministic
    * and re-runs select the identical set — auditable data selection.
    * `temperature` scales the weights (→0 approaches hard top-k; large
    * flattens toward uniform); `gumbel = false` gives the hard top-k cut.
    *
    * Top-k plans as TakeOrderedAndProject — no global sort materializes.
    * Returns the selected candidate ROWS (all their columns) with `weight`
    * and `n_toks` attached: the k-row winner set joins back onto the
    * candidate table (id-keyed; AQE sizes the join — broadcast for typical
    * k, shuffle when k is itself corpus-scale).
    */
  def importanceResample(candidates: DataFrame, target: DataFrame,
                         idCol: String, textCol: String, k: Int,
                         seed: Long = 42L, temperature: Double = 1.0,
                         gumbel: Boolean = true,
                         buckets: Int = 4096, alpha: Double = 1.0,
                         bucket: Option[Column => Column] = None): DataFrame = {
    require(k > 0 && temperature > 0)
    val w = importanceWeights(candidates, target, idCol, textCol,
      buckets, alpha, bucket)
    val m = 1L << 20
    val u = (pmod(xxhash64(col(idCol), lit(seed)), lit(m)).cast("double") + 0.5) / m
    val key =
      if (gumbel) col("weight") / temperature - log(-log(u)) else col("weight")
    val picked = w.withColumn("__k", key)
      .orderBy(col("__k").desc, col(idCol))
      .limit(k)
      .drop("__k")
    candidates.join(picked, Seq(idCol))
  }

  /** Default token→bucket hash: murmur3, codegen'd. */
  def murmurBucket(buckets: Int)(tok: Column): Column =
    pmod(hash(tok), lit(buckets))

  /** md5-prefix bucket over 256 buckets — SQL-oracle-reproducible
    * (`(hexdigit₁ × 16 + hexdigit₂)` of `md5(tok)`). Use with
    * `buckets = 256`.
    */
  def md5Bucket(tok: Column): Column =
    conv(substring(md5(tok), 1, 2), 16, 10).cast("int")

  /** Token↔class mutual information — which tokens carry the most signal
    * about a class column (source, language, label): the feature-selection
    * score behind contamination probes ("which tokens give away the eval
    * split?") and domain-classifier vocabularies. Over token OCCURRENCES,
    * per token t: MI(t) = Σ_c p(t,c)·ln(p(t,c) / (p(t)·p(c))), natural
    * log, probabilities from global occurrence counts. A token used
    * uniformly across classes scores ~0; one concentrated in a single
    * class scores high.
    *
    * Shape for scale: three hash aggregates off one tokenize pass —
    * (token, class) joint counts, then token and class marginals derived
    * FROM the joint (never re-scanning text) — a broadcast of the class
    * marginals (|classes| rows) onto the joint, and a global-count scalar
    * cross join. The top-N head is TakeOrderedAndProject, not a sort.
    * Tokens below `minCount` total occurrences are dropped before the MI
    * arithmetic (rare-token MI is noise).
    *
    * Returns the `topN` tokens by (MI desc, token): (tok, n, mi).
    */
  def tokenClassMI(df: DataFrame, textCol: String, classCol: String,
                   minCount: Long = 50, topN: Int = 50): DataFrame = {
    val occ = df.select(col(classCol).as("cls"),
      explode(filter(split(col(textCol), " "), t => length(t) > 0)).as("tok"))
    val joint = occ.groupBy("tok", "cls").agg(count(lit(1)).as("ntc"))
      .localCheckpoint() // marginals + MI both read it
    val tokMarg = joint.groupBy("tok").agg(sum("ntc").as("nt"))
      .where(col("nt") >= minCount)
    val clsMarg = joint.groupBy("cls").agg(sum("ntc").as("nc"))
    val total = joint.agg(sum("ntc").as("ntot"))
    joint
      .join(tokMarg, "tok") // drops rare tokens before any arithmetic
      .join(broadcast(clsMarg), "cls")
      .crossJoin(broadcast(total))
      .groupBy(col("tok"), col("nt"))
      // double products, not long: ntc·ntot overflows int64 on a corpus
      // with ~1e13 tokens (the 100 TB shape); the double rounding is
      // mirrored verbatim in the oracle SQL
      .agg(sum((col("ntc") / col("ntot")) *
        log((col("ntc").cast("double") * col("ntot")) /
          (col("nt").cast("double") * col("nc")))).as("mi"))
      .orderBy(col("mi").desc, col("tok"))
      .limit(topN)
      .select(col("tok"), col("nt").as("n"), col("mi"))
  }

  /** Top bigram collocations by pointwise mutual information — the
    * phrase-mining pass (multi-word entities, boilerplate phrases, tokens
    * that should be merged before vocabulary building). For a bigram
    * (x,y): PMI = ln( p(x,y) / (p(x)·p(y)) ) with p(x,y) from bigram
    * counts over the bigram total and p(x) from unigram counts over the
    * unigram total. High PMI = the pair co-occurs far above chance.
    *
    * Shape for scale: tokens are bound as a projected column and bigrams
    * built scan-side from one `transform(sequence(...))` over it (no
    * self-join on position, no per-element re-split — the q50b HOF
    * lesson); then two compact count aggregates (bigram, unigram), the
    * unigram marginals joined back TWICE on token keys (w1, w2) — both
    * joins carry count rows, never corpus rows. Bigrams below `minCount`
    * drop before the join. Top-N is TakeOrderedAndProject.
    *
    * Returns the `topN` bigrams by (PMI desc, w1, w2): (w1, w2, n, pmi).
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 25,
                   topN: Int = 50): DataFrame = {
    val toked = df
      .select(filter(split(col(textCol), " "), t => length(t) > 0).as("toks"))
      .where(size(col("toks")) >= 1)
      .localCheckpoint() // unigram and bigram passes share the tokenize
    val uni = toked.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("nx"))
    val uniTotal = uni.agg(sum("nx").as("nu"))
    val bi = toked.where(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))")).as("bg"))
      .select(col("bg.w1"), col("bg.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("nxy"))
      .where(col("nxy") >= minCount)
    val biTotal = toked.where(size(col("toks")) >= 2)
      .agg(sum(size(col("toks")) - 1).as("nb"))
    bi
      .join(uni.select(col("tok").as("w1"), col("nx").as("nx1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("nx").as("nx2")), "w2")
      .crossJoin(broadcast(uniTotal))
      .crossJoin(broadcast(biTotal))
      // double products (nxy·nu² overflows int64 at ~1e13 corpus tokens)
      .withColumn("pmi",
        log((col("nxy").cast("double") * col("nu") * col("nu")) /
          (col("nb").cast("double") * col("nx1") * col("nx2"))))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topN)
      .select(col("w1"), col("w2"), col("nxy").as("n"), col("pmi"))
  }

  /** Pairwise column-dependency profile — entropies and the uncertainty
    * coefficient U(A|B) = (H(A) − H(A|B)) / H(A) for each requested
    * (a, b) column pair: the data-profiling step that surfaces
    * near-functional dependencies (U ≈ 1: B determines A — a denormalized
    * copy, a derivable column) and independent pairs (U ≈ 0) before
    * choosing partition/clustering keys. Natural-log entropies.
    *
    * Shape for scale: per pair ONE joint-count aggregate over the fact
    * (compact (a, b) cardinality), then TWO tiny re-aggregations of those
    * count rows — group by a (carrying na = Σnab, the joint-entropy
    * partial Σnab·ln(nab), and the joint-row count) and group by b
    * (nb = Σnab) — each collapsing to a single scalar row. Entropies come
    * from the log identity H(A) = ln n − (Σ na·ln na)/n and the chain rule
    * H(A|B) = H(A,B) − H(B) = (Σ nb·ln nb − Σ nab·ln nab)/n, so the
    * conditional term needs NO joint⋈marginal join, no broadcast of the
    * scalar total, and no eager pin: the whole profile (all pairs,
    * unioned) is ONE parallel job whose only data-scale shuffle is the
    * per-pair joint count. Degenerate cases are pinned by INTEGER tests
    * (exact longs, never fp dust): a constant column (one distinct value)
    * pins its entropy to exactly 0.0, and B functionally determining A
    * (joint cardinality == |domain(b)|) pins H(A|B) to exactly 0.0.
    * Output is one row per pair.
    */
  def columnDependencies(df: DataFrame,
                         pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one column pair")
    pairs.map { case (a, b) =>
      val joint = df.groupBy(col(a).as("__a"), col(b).as("__b"))
        .agg(count(lit(1)).as("nab"))
      val byA = joint.groupBy("__a").agg(
        sum("nab").as("na"),
        sum(col("nab") * log(col("nab"))).as("sj"),
        count(lit(1)).as("cj"))
      val fa = byA.agg(
        sum("na").as("n"), sum(col("na") * log(col("na"))).as("sa"),
        sum("sj").as("sjoint"), count(lit(1)).as("ka"),
        sum("cj").as("cjoint"))
      val fb = joint.groupBy("__b").agg(sum("nab").as("nb"))
        .agg(sum(col("nb") * log(col("nb"))).as("sb"),
          count(lit(1)).as("kb"))
      fa.crossJoin(fb)
        .withColumn("h_a",
          when(col("ka") === 1, lit(0.0))
            .otherwise(log(col("n")) - col("sa") / col("n")))
        .withColumn("h_b",
          when(col("kb") === 1, lit(0.0))
            .otherwise(log(col("n")) - col("sb") / col("n")))
        .withColumn("h_a_given_b",
          when(col("cjoint") === col("kb"), lit(0.0))
            .otherwise((col("sb") - col("sjoint")) / col("n")))
        .select(lit(a).as("col_a"), lit(b).as("col_b"),
          col("h_a"), col("h_b"), col("h_a_given_b"),
          when(col("h_a") === 0.0, lit(1.0))
            .otherwise((col("h_a") - col("h_a_given_b")) / col("h_a"))
            .as("uncertainty_coef"))
    }.reduce(_ unionByName _)
  }

  /** Population stability index between a reference and a current
    * distribution of `valueCol` — the vintage-drift alarm: run it between
    * last crawl's quality scores / doc lengths / language mix and this
    * crawl's before letting a new vintage into the training mix. Bucket
    * edges are the REFERENCE quantiles (equal-population buckets), both
    * sides are bucketed on those same edges, and each bucket contributes
    * `(cur − ref)·ln(cur/ref)` with +0.5 count smoothing so empty buckets
    * are defined. PSI < 0.1 ≈ stable, > 0.25 ≈ population shift.
    *
    * Shape for scale: edges come from ONE exact-percentile aggregate on
    * the reference (a bounded scalar row — swap `percentile_approx` in at
    * petabyte scale), then both sides take one scan-side CASE bucketing +
    * count aggregate each. Nothing but bucket counts crosses the wire.
    *
    * Returns one row per bucket: (bucket, ref_share, cur_share,
    * psi_term); total PSI = sum(psi_term).
    */
  def populationStability(reference: DataFrame, current: DataFrame,
                          valueCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets: $buckets")
    val v = col(valueCol).cast("double")
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val edges = reference
      .agg(percentile(v, lit(ps.toArray)).as("qs"))
      .head().getSeq[Double](0)
    // CASE chain over the broadcast edge literals: first edge ≥ v wins
    def bucketOf(c: Column): Column =
      edges.zipWithIndex.foldRight(lit(buckets - 1)) {
        case ((e, i), rest) => when(c <= lit(e), lit(i)).otherwise(rest)
      }
    def shares(df: DataFrame, name: String): DataFrame = {
      val counts = df.select(bucketOf(v).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
      val total = counts.agg(sum("n").as("t"))
      // dense bucket spine so empty buckets still smooth to 0.5
      reference.sparkSession.range(buckets)
        .select(col("id").cast("int").as("bucket"))
        .join(counts, Seq("bucket"), "left")
        .crossJoin(broadcast(total))
        .select(col("bucket"),
          ((coalesce(col("n"), lit(0L)) + 0.5) /
            (col("t") + 0.5 * buckets)).as(name))
    }
    shares(reference, "ref_share")
      .join(shares(current, "cur_share"), "bucket")
      .withColumn("psi_term",
        (col("cur_share") - col("ref_share")) *
          log(col("cur_share") / col("ref_share")))
      .orderBy("bucket")
  }

  /** Categorical drift between vintages — the discrete sibling of
    * [[populationStability]]: per-category share comparison of `catCol`
    * (language mix, source mix, license tags) with the two standard
    * summary statistics as per-category terms: chi-square (current
    * observed vs reference-expected counts) and Jensen–Shannon
    * divergence (symmetric, bounded by ln 2, defined even for disjoint
    * supports). Categories are the UNION of both sides; +0.5 count
    * smoothing keeps vanished/new categories finite.
    *
    * Shape for scale: one count aggregate per side (category
    * cardinality rows), a full outer join on the category, scalar
    * totals broadcast — nothing corpus-sized moves.
    *
    * Returns (category, ref_share, cur_share, chi2_term, js_term);
    * chi² = Σ chi2_term, JS = Σ js_term.
    */
  def categoricalDrift(reference: DataFrame, current: DataFrame,
                       catCol: String): DataFrame = {
    def counts(df: DataFrame, name: String): DataFrame =
      df.groupBy(col(catCol).as("category"))
        .agg(count(lit(1)).as(name))
    val joined = counts(reference, "__rn")
      .join(counts(current, "__cn"), Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("__rn"), lit(0L)).as("__rn"),
        coalesce(col("__cn"), lit(0L)).as("__cn"))
      .localCheckpoint() // totals + terms both read it
    val k = joined.count().toDouble // distinct categories (bounded)
    val totals = joined.agg(sum("__rn").as("__rt"), sum("__cn").as("__ct"))
    joined.crossJoin(broadcast(totals))
      .withColumn("ref_share",
        (col("__rn") + 0.5) / (col("__rt") + 0.5 * k))
      .withColumn("cur_share",
        (col("__cn") + 0.5) / (col("__ct") + 0.5 * k))
      .withColumn("__exp", col("ref_share") * (col("__ct") + 0.5 * k))
      .withColumn("chi2_term",
        ((col("__cn") + 0.5) - col("__exp")) *
          ((col("__cn") + 0.5) - col("__exp")) / col("__exp"))
      .withColumn("__m", (col("ref_share") + col("cur_share")) / 2.0)
      .withColumn("js_term",
        lit(0.5) * col("ref_share") * log(col("ref_share") / col("__m")) +
          lit(0.5) * col("cur_share") * log(col("cur_share") / col("__m")))
      .select("category", "ref_share", "cur_share", "chi2_term", "js_term")
  }

  /** Flesch-style readability per document: words, sentences (split on
    * `[.!?]+` runs), syllables (vowel-group runs `[aeiouy]+` per word —
    * the standard dictionary-free approximation), and the Flesch
    * reading-ease score `206.835 − 1.015·(W/S) − 84.6·(Syl/W)`. A crude
    * but useful quality axis orthogonal to length/entropy: token-soup
    * junk scores deep-negative, natural prose lands 30–90.
    *
    * Pure codegen'd string expressions over the scan (split +
    * regexp_extract_all + size aggregates in a HOF) — no shuffle, no
    * UDF. Documents with zero words or sentences are excluded (the
    * score is undefined).
    */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = filter(split(lower(col(textCol)), "\\s+"),
      w => length(w) > 0)
    val out = df
      .withColumn("__w", words)
      .withColumn("n_words", size(col("__w")).cast("long"))
      .withColumn("n_sentences",
        size(filter(split(col(textCol), "[.!?]+"),
          s => length(trim(s)) > 0)).cast("long"))
      .withColumn("n_syllables",
        aggregate(transform(col("__w"),
          w => size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0)))
            .cast("long")),
          lit(0L), (acc, v) => acc + v))
    out.where(col("n_words") > 0 && col("n_sentences") > 0)
      .select(col(idCol), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        (lit(206.835)
          - lit(1.015) * (col("n_words") / col("n_sentences"))
          - lit(84.6) * (col("n_syllables") / col("n_words")))
          .as("flesch"))
  }

  /** Zipf-law fit over the corpus vocabulary: least-squares regression of
    * ln(frequency) on ln(rank) for the top `topN` tokens — the corpus
    * health diagnostic (natural language slopes ≈ −1; template/boilerplate
    * corpora flatten, deduped-to-death corpora steepen). Uses the
    * engine's closed-form regression aggregates (`regr_slope` /
    * `regr_intercept` / `regr_r2`).
    *
    * Token counts are one hash aggregate; the rank window runs over the
    * top-N VOCABULARY rows (bounded by `topN`, not the corpus). Returns
    * ONE row: (n_tokens, slope, intercept, r2).
    */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 1000): DataFrame = {
    require(topN >= 3, s"need at least 3 ranks to fit: $topN")
    val counts = df
      .select(explode(filter(split(col(textCol), " "),
        t => length(t) > 0)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(topN)
    val ranked = counts.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("tok"))))
      .withColumn("x", log(col("rank").cast("double")))
      .withColumn("y", log(col("n").cast("double")))
    ranked.agg(count(lit(1)).as("n_tokens"),
      regr_slope(col("y"), col("x")).as("slope"),
      regr_intercept(col("y"), col("x")).as("intercept"),
      regr_r2(col("y"), col("x")).as("r2"))
  }

  /** One-pass column profile: per column, row/null/distinct counts and
    * min/max — the table-level data-profiling report a lake catalog
    * surfaces next to every dataset. Returns one row per profiled
    * column: (column, n, n_null, n_distinct, min_value, max_value), the
    * extremes computed on the NATIVE type (so numeric columns order
    * numerically) and rendered as strings only in the output.
    *
    * All statistics fold in ONE aggregate pass over the scan (the
    * distinct counts expand internally but never materialize a second
    * read); the unpivot touches |cols| rows.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val total = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n"),
        (col("__n") - col(s"__cnt_$c")).as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
    }
    total.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** Out-of-vocabulary rate per document against a reference vocabulary —
    * the tokenizer-migration / domain-shift check (how much of each doc
    * would a tokenizer trained on the reference corpus fragment into
    * unknowns). `vocab` is a one-column (`token`) table; returns
    * (idCol, n_tokens, n_oov, oov_rate), empty docs rating 0.
    *
    * One explode + token-keyed left join against the vocab (AQE
    * broadcasts it when small; at 10⁸-token vocabularies the join
    * shuffles on the token key) + a doc-keyed count rollup.
    */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
              vocab: DataFrame): DataFrame = {
    // explode_outer keeps token-less (empty/null) docs as a null-token
    // row, so they rate 0 instead of vanishing from the report
    val toks = df.select(col(idCol),
      explode_outer(filter(split(col(textCol), " "), t => length(t) > 0))
        .as("token"))
    val marked = toks.join(
      vocab.select(col("token")).distinct().withColumn("__in", lit(1)),
      Seq("token"), "left")
    marked.groupBy(col(idCol))
      .agg(count(col("token")).as("n_tokens"),
        sum(when(col("token").isNotNull && col("__in").isNull, 1L)
          .otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_tokens") > 0,
          col("n_oov") / col("n_tokens").cast("double")).otherwise(0.0))
  }

  /** Gini concentration of the head vocabulary: how unequal are the top-N
    * token frequencies — 0 = uniform usage, →1 = a few tokens dominate.
    * The corpus-diversity companion to [[zipfFit]] (Zipf says HOW the
    * frequencies decay, Gini compresses the inequality into one number a
    * mixing dashboard can track per vintage/source).
    *
    * G = Σᵢ (2i − n − 1)·xᵢ / (n·Σx) over the ascending-sorted counts.
    * Token counts are one hash aggregate; sorting and ranking touch only
    * the ≤ topN vocabulary rows (the zipfFit discipline — the window is
    * head-sized, never corpus-sized). Returns ONE row:
    * (n_tokens, total_count, gini).
    */
  def giniConcentration(df: DataFrame, textCol: String,
                        topN: Int = 1000): DataFrame = {
    require(topN >= 2, s"need at least 2 ranks: $topN")
    val counts = df
      .select(explode(filter(split(col(textCol), " "),
        t => length(t) > 0)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(topN)
    val ranked = counts.withColumn("i", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("n").asc, col("tok"))))
    val tot = counts.agg(count(lit(1)).as("__ntok"), sum("n").as("__tot"))
    ranked.crossJoin(broadcast(tot))
      .agg(max("__ntok").as("n_tokens"), max("__tot").as("total_count"),
        sum((lit(2) * col("i") - col("__ntok") - 1) *
          col("n").cast("double")).as("__num"))
      .withColumn("gini",
        col("__num") / (col("n_tokens") * col("total_count")))
      .drop("__num")
  }

  /** Benford first-digit audit: the observed distribution of first
    * significant digits of `valueCol` (positive rows only) against
    * Benford's law `log10(1 + 1/d)` — the classic fabricated-or-truncated
    * numbers screen for financial/measurement columns. Returns one row
    * per digit 1..9: (digit, n, obs_share, exp_share, chi2_term); Σ
    * chi2_term is the 8-dof test statistic.
    *
    * Digit extraction is `floor(x / 10^floor(log10 x))` CLAMPED into
    * [1, 9]: a last-ulp `log10` disagreement at an exact power of 10
    * yields 0 or 10 and clamps back to the correct digit, so the
    * derivation is stable across engines/libms. One scan-side projection
    * plus a 9-group aggregate; the total joins back as a broadcast
    * scalar.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val digit = least(greatest(
      floor(x / pow(lit(10.0), floor(log10(x)))).cast("int"), lit(1)), lit(9))
    val per = df.where(x > 0)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val spine = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
    val tot = per.agg(sum("n").cast("double").as("__t"))
    spine.join(per, Seq("digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("obs_share", col("n") / col("__t"))
      .withColumn("exp_share",
        log10(lit(1.0) + lit(1.0) / col("digit")))
      .withColumn("chi2_term",
        (col("n") - col("__t") * col("exp_share")) *
          (col("n") - col("__t") * col("exp_share")) /
          (col("__t") * col("exp_share")))
      .drop("__t")
  }

  // ---- common predicate builders ------------------------------------------

  /** Mixed-language screen: language-ID per `windowTokens`-token window
    * (same stopword scorer as the q35 doc-level [[functions.Text.languageId]]),
    * then per doc the majority window language, its share, and how many
    * distinct languages the windows carry — code-switched or
    * concatenation-corrupted docs poison monolingual training even when
    * their DOC-level majority vote looks clean, and this is the screen
    * that catches them. Majority ties break (count desc, lang asc) so
    * replays are exact. Returns
    * (idCol, n_windows, top_lang, top_share, n_langs).
    *
    * Scale shape: windows come from one scan-side HOF slice (tokens bound
    * as a projected column FIRST — the q50b lesson), language scores are
    * the native codegen expression per window, and both aggregates key on
    * the doc id; the majority window is bounded by ≤5 language rows per
    * doc. No corpus-wide key anywhere.
    */
  def langConsistency(df: DataFrame, idCol: String, textCol: String,
                      windowTokens: Int = 50): DataFrame = {
    require(windowTokens >= 1, "windowTokens must be positive")
    val toks = df.select(col(idCol),
      filter(split(lower(trim(col(textCol))), "\\s+"),
        t => length(t) > 0).as("__toks"))
    val starts = sequence(lit(1), greatest(size(col("__toks")), lit(1)),
      lit(windowTokens))
    val wins = toks.select(col(idCol),
        explode(transform(starts,
          i => array_join(slice(col("__toks"), i, lit(windowTokens)), " ")))
          .as("__wtext"))
      .select(col(idCol),
        graft.functions.Text.languageId(col("__wtext")).as("__lang"))
    val perLang = wins.groupBy(col(idCol), col("__lang"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("__c").desc, col("__lang"))
    perLang
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(sum("__c").as("n_windows"),
        max(when(col("__rn") === 1, col("__lang"))).as("top_lang"),
        max(when(col("__rn") === 1, col("__c"))).as("__topc"),
        count(lit(1)).as("n_langs"))
      .withColumn("top_share", col("__topc") / col("n_windows"))
      .select(idCol, "n_windows", "top_lang", "top_share", "n_langs")
  }

  /** Referential-integrity audit for a declared FK: how many child rows
    * (and distinct keys) point at a parent that does not exist — the
    * between-zones lake contract [[checks]] can't express (it is
    * single-table; this is the join-shaped sibling). Null FKs are counted
    * separately (`n_null_rows`): a missing reference and a dangling one
    * are different bugs. Returns ONE row: (n_child_rows, n_child_keys,
    * n_orphan_rows, n_orphan_keys, n_null_rows, orphan_row_rate).
    *
    * Shape for scale: the child collapses to (key, count) in one partial
    * agg — the only row-scale pass; the key-level anti-join against the
    * parent's distinct keys is strategy-free (AQE picks broadcast when
    * the parent key set fits, shuffle join when it doesn't).
    */
  def fkAudit(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame = {
    val perKey = child
      .groupBy(col(childKey).as("__k"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // totals + orphan side both read it
    val totals = perKey.agg(
      coalesce(sum(when(col("__k").isNotNull, col("__c"))), lit(0L))
        .as("n_child_rows"),
      sum(when(col("__k").isNotNull, 1L).otherwise(0L)).as("n_child_keys"),
      coalesce(sum(when(col("__k").isNull, col("__c"))), lit(0L))
        .as("n_null_rows"))
    val orphans = perKey.where(col("__k").isNotNull)
      .join(parent.select(col(parentKey).as("__k")).distinct(),
        Seq("__k"), "left_anti")
      .agg(coalesce(sum("__c"), lit(0L)).as("n_orphan_rows"),
        count(lit(1)).as("n_orphan_keys"))
    totals.crossJoin(broadcast(orphans))
      .withColumn("orphan_row_rate",
        when(col("n_child_rows") > 0,
          col("n_orphan_rows") / col("n_child_rows")).otherwise(0.0))
      .select("n_child_rows", "n_child_keys", "n_orphan_rows",
        "n_orphan_keys", "n_null_rows", "orphan_row_rate")
  }

  def notNull(c: String): (String, Column) =
    (s"${c}_not_null", col(c).isNotNull)

  def inRange(c: String, lo: Double, hi: Double): (String, Column) =
    (s"${c}_in_range", col(c).between(lo, hi))

  def inSet(c: String, values: Seq[String]): (String, Column) =
    (s"${c}_in_set", col(c).isin(values: _*))

  def unique(c: String): (String, Column) = {
    // uniqueness needs a per-key count — expressed as a window so it still
    // composes into the single-pass audit (one extra shuffle on the key)
    import org.apache.spark.sql.expressions.Window
    (s"${c}_unique", count(lit(1)).over(Window.partitionBy(c)) === 1)
  }

  /** Pre-join hot-key diagnostic — the measurement behind every
    * salt-or-not decision ([[Joins.saltedJoin]]'s sizing input): per-key
    * row counts for the heaviest `topN` keys, each with its corpus
    * share, rank, and skew factor (count / mean-count — AQE handles
    * skew factors in the tens, explicit salting is for the hundreds).
    * ONE key aggregate (map-side partials) + TakeOrdered of N rows +
    * two broadcast scalars; nothing row-scale moves twice. Returns
    * (keyCols…, n, share, rank, n_keys, skew_factor).
    */
  def keySkew(df: DataFrame, keyCols: Seq[String],
              topN: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(topN >= 1, s"topN must be ≥ 1: $topN")
    // unpinned: totals + top-N share the aggregate exchange via
    // ReusedExchange; a localCheckpoint would pin a key-cardinality-
    // sized block (near row scale for join keys) until session death
    val per = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val tot = per.agg(sum("n").as("__rows"), count(lit(1)).as("n_keys"))
    val w = Window.orderBy(col("n").desc +: keyCols.map(col): _*)
    per.orderBy(col("n").desc +: keyCols.map(col): _*).limit(topN)
      .withColumn("rank", row_number().over(w))
      .crossJoin(broadcast(tot))
      .select(keyCols.map(col) ++ Seq(col("n"),
        (col("n") / col("__rows").cast("double")).as("share"),
        col("rank"), col("n_keys"),
        (col("n") * col("n_keys") / col("__rows").cast("double"))
          .as("skew_factor")): _*)
  }

  /** One-call dataset card — the tall (metric, value) summary a corpus
    * release ships with: row/empty counts, token totals and central
    * tendency (mean + exact median), character volume, and exact-
    * duplicate pressure (md5-distinct texts vs rows). Two bounded jobs:
    * one scan-side aggregate over per-doc token/char counts (the median
    * via `percentile` — a corpus-card runs occasionally, exactness beats
    * the sketch here) and one digest-keyed distinct count. Compose with
    * [[duplicationSpectrum]] / [[piiScan]] / [[gopherRules]] for the
    * full card; this row set is the header every card starts with.
    */
  def corpusCard(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val toks = size(filter(split(t, " "), w => length(w) > 0)).cast("long")
    val agg = df.select(toks.as("__tk"), length(t).cast("long").as("__ch"),
        md5(t).as("__h"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__tk") === 0, 1L).otherwise(0L)).as("n_empty"),
        sum("__tk").as("total_tokens"),
        avg("__tk").as("mean_tokens"),
        expr("percentile(__tk, 0.5)").as("p50_tokens"),
        sum("__ch").as("total_chars"),
        count_distinct(col("__h")).as("__distinct"))
    agg.select(explode(array(
      struct(lit("n_docs").as("metric"),
        col("n_docs").cast("double").as("value")),
      struct(lit("n_empty").as("metric"),
        col("n_empty").cast("double").as("value")),
      struct(lit("total_tokens").as("metric"),
        col("total_tokens").cast("double").as("value")),
      struct(lit("mean_tokens").as("metric"), col("mean_tokens").as("value")),
      struct(lit("p50_tokens").as("metric"), col("p50_tokens").as("value")),
      struct(lit("total_chars").as("metric"),
        col("total_chars").cast("double").as("value")),
      struct(lit("exact_dup_excess").as("metric"),
        (col("n_docs") - col("__distinct")).cast("double").as("value")),
      struct(lit("exact_dup_share").as("metric"),
        ((col("n_docs") - col("__distinct")) /
          col("n_docs").cast("double")).as("value")))).as("m"))
      .select(col("m.metric").as("metric"), col("m.value").as("value"))
  }

  /** Per-document PII census — the release/scrub-planning scan that runs
    * BEFORE [[graft.functions.Text.redactPii]] rewrites anything: counts
    * per pattern family, with card candidates additionally gated by the
    * Luhn checksum ([[graft.functions.Text.luhnValid]]) so the number a
    * compliance review sees is "actual card numbers", not "16-digit
    * strings". One scan-side pass (regexp_extract_all + HOFs), zero
    * shuffles. Returns (idCol, n_emails, n_ssns, n_phones,
    * n_card_candidates, n_cards_valid).
    */
  def piiScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.Text
    val t = coalesce(col(textCol), lit(""))
    val pat = Text.piiPatterns.map { case (re, tok) => tok -> re }.toMap
    def hits(tok: String) =
      regexp_extract_all(t, lit(pat(tok)), lit(0))
    val cards = hits("<CARD>")
    df.select(col(idCol),
      size(hits("<EMAIL>")).cast("long").as("n_emails"),
      size(hits("<SSN>")).cast("long").as("n_ssns"),
      size(hits("<PHONE>")).cast("long").as("n_phones"),
      size(cards).cast("long").as("n_card_candidates"),
      size(filter(cards, c =>
        Text.luhnValid(regexp_replace(c, "[ -]", ""))))
        .cast("long").as("n_cards_valid"))
  }

  /** Intra-document paragraph dedup — a curation TRANSFORM, not a
    * signal: drop every repeated unit (paragraph/line) after its first
    * occurrence, preserving order — the boilerplate pattern WITHIN one
    * document (repeated headers, duplicated list blocks, copy-paste
    * stutter) that corpus-level dedup never sees. Returns the input
    * plus (deduped_text, n_units, n_dropped).
    *
    * Pure scan-side HOF work — split, an index-aware filter keeping a
    * unit iff its first occurrence IS this position, re-join; no
    * shuffle, no UDF, codegen-hosted. Per-row cost is O(units²) string
    * compares — bounded by document structure, never corpus size (the
    * same contract as pairStats' token HOFs).
    */
  def dedupeParagraphs(df: DataFrame, textCol: String,
                       sep: String = "\n"): DataFrame = {
    require(sep.nonEmpty, "separator must be non-empty")
    val parts = split(coalesce(col(textCol), lit("")),
      java.util.regex.Pattern.quote(sep))
    val kept = filter(parts, (x, i) => array_position(parts, x) - 1 === i)
    df.withColumn("deduped_text", array_join(kept, sep))
      .withColumn("n_units", size(parts).cast("long"))
      .withColumn("n_dropped", (size(parts) - size(kept)).cast("long"))
  }

  /** Heaps-law fit — vocabulary GROWTH, where [[vocabCoverage]] measures
    * the current unseen mass: cut the corpus into `numBuckets` ordered
    * prefix slices (quantiles of `orderCol` over documents), track exact
    * cumulative token count N_k and vocabulary V_k per prefix, and fit
    * ln V = ln K + β·ln N — Heaps' V = K·N^β, the planning curve for
    * "how much vocabulary will 10× more crawl buy". Returns ONE row:
    * (n_buckets, n_tokens, vocab, beta, k_coef, r2).
    *
    * The cumulative vocabulary is EXACT without any prefix re-scan:
    * each token's FIRST bucket is one (token)-keyed min, so
    * V_k = Σ_{b ≤ k} first-appearances(b) — the heaps-law token table
    * shuffles once; the regression runs over ≤ numBuckets points
    * (closed-form regr_* aggregates), and the only window spans those
    * same ≤ numBuckets rows.
    */
  def heapsLawFit(df: DataFrame, textCol: String, orderCol: String,
                  numBuckets: Int = 32): DataFrame = {
    require(numBuckets >= 3, s"need ≥ 3 prefix points to fit: $numBuckets")
    import org.apache.spark.sql.expressions.Window
    val docs = df.select(col(orderCol).cast("double").as("__o"),
      col(textCol).as("__txt"))
    val ps = array((1 until numBuckets)
      .map(b => lit(b.toDouble / numBuckets)): _*)
    val ths = docs.agg(percentile(col("__o"), ps).as("__ths"))
    val toks = docs.crossJoin(broadcast(ths))
      .withColumn("__b", size(filter(col("__ths"), t => col("__o") > t)))
      .select(col("__b"),
        explode(split(lower(trim(col("__txt"))), "\\s+")).as("__tok"))
      .where(length(col("__tok")) > 0)
    val perBucket = toks.groupBy("__b").agg(count(lit(1)).as("__n"))
    val firstSeen = toks.groupBy("__tok").agg(min("__b").as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("__new"))
    val w = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.join(firstSeen, Seq("__b"), "left")
      .withColumn("__nc", sum("__n").over(w))
      .withColumn("__vc", sum(coalesce(col("__new"), lit(0L))).over(w))
      .agg(count(lit(1)).as("n_buckets"),
        max("__nc").as("n_tokens"), max("__vc").as("vocab"),
        min("__vc").as("__vmin"),
        regr_slope(log(col("__vc").cast("double")),
          log(col("__nc").cast("double"))).as("__beta"),
        regr_intercept(log(col("__vc").cast("double")),
          log(col("__nc").cast("double"))).as("__ic"),
        regr_r2(log(col("__vc").cast("double")),
          log(col("__nc").cast("double"))).as("__r2"))
      // the exactly-FLAT curve (vocabulary saturated before the first
      // cut — tiny or synthetic corpora): SST is 0 up to fp dust, so
      // regr_r2 is a noise-dominated tiny/tiny ratio that differs run to
      // run with summation order. The integer min==max test is exact in
      // any engine; a constant fits itself perfectly: β=0, K=V, r²=1.
      .withColumn("__flat", col("__vmin") === col("vocab"))
      .withColumn("beta",
        when(col("__flat"), lit(0.0)).otherwise(col("__beta")))
      .withColumn("r2",
        when(col("__flat"), lit(1.0)).otherwise(col("__r2")))
      .withColumn("k_coef",
        when(col("__flat"), col("vocab").cast("double"))
          .otherwise(exp(col("__ic"))))
      .select(col("n_buckets"), col("n_tokens"), col("vocab"),
        col("beta"), col("k_coef"), col("r2"))
  }

  /** Vocabulary-coverage estimators per group — "how much of this source's
    * vocabulary have we actually seen?", the question behind corpus-size
    * planning and crawl-stop decisions. From each group's token-frequency
    * table: Good–Turing unseen mass N₁/N (the probability the NEXT token
    * is novel — Gale & Sampson 1995), its complement `coverage`, and the
    * Chao1 richness floor V + N₁(N₁−1)/(2(N₂+1)) (bias-corrected form,
    * defined even with no doubletons) estimating TOTAL vocabulary
    * including the unseen tail. Returns per group: (groupCols..., n_tokens,
    * vocab, n_hapax, n_dis, unseen_mass, coverage, chao1).
    *
    * Two aggregates, both partial-aggregable: (group, token) counts, then
    * a per-group rollup OVER the count table — frequency-of-frequencies
    * never materializes row-scale data twice. The vocabulary frame is a
    * heaps-law operand (billions of distinct tokens at 100 TB), so nothing
    * here broadcasts or collects; groups are independent shuffle keys.
    */
  def vocabCoverage(df: DataFrame, textCol: String,
                    groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val toks = df.select(groupCols.map(col) :+
        explode(split(lower(trim(col(textCol))), "\\s+")).as("__tok"): _*)
      .where(length(col("__tok")) > 0)
    val counts = toks.groupBy(groupCols.map(col) :+ col("__tok"): _*)
      .agg(count(lit(1)).as("__n"))
    val n1 = col("n_hapax").cast("double")
    counts.groupBy(groupCols.map(col): _*)
      .agg(sum("__n").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("__n") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("__n") === 2, 1L).otherwise(0L)).as("n_dis"))
      .withColumn("unseen_mass", n1 / col("n_tokens").cast("double"))
      .withColumn("coverage", lit(1.0) - col("unseen_mass"))
      .withColumn("chao1",
        col("vocab").cast("double") + n1 * (n1 - 1.0) /
          (lit(2.0) * (col("n_dis").cast("double") + 1.0)))
  }

  /** Scaling-law fit L(N) = c + a·N^(−b) over (scale, loss) observations
    * — [[heapsLawFit]]'s sibling for LOSS curves (Hestness 2017 /
    * Kaplan 2020 empirics): the planning number behind "what loss does
    * 10× more data buy", with the irreducible term c that a plain
    * log-log fit (b from ln L on ln N) silently gets wrong whenever the
    * curve is bottoming out. c is searched over a FIXED fractional grid
    * of the minimum observed loss (c = frac·L_min, every frac < 1, so
    * every point stays positive after the shift); each candidate's OLS
    * of ln(L − c) on ln N is closed-form, the winner minimizes
    * transformed-space SSE (ties → smaller c). Returns ONE row:
    * (n_points, c, a, b, r2). Caller contract: positive losses, ≥ 3
    * distinct scales (degenerate inputs report null fit fields).
    *
    * ONE |grid|-conditional-moment scan over the points table (the
    * temperatureScaling pattern) + a one-row L_min broadcast — the
    * points are checkpoint-level rows, but the shape would hold at any
    * cardinality.
    */
  def scalingLawFit(df: DataFrame, nCol: String, lossCol: String,
                    cFracs: Seq[Double] = Seq(0.0, 0.25, 0.5, 0.75,
                      0.9, 0.95, 0.99)): DataFrame = {
    require(cFracs.nonEmpty && cFracs.forall(f => f >= 0 && f < 1),
      s"cFracs must lie in [0, 1): $cFracs")
    val nC = col(nCol).cast("double")
    val lC = col(lossCol).cast("double")
    val lmin = df.agg(min(lC).as("__lmin"))
    val based = df.crossJoin(broadcast(lmin))
      .withColumn("__x", log(nC))
    val perC = cFracs.zipWithIndex.flatMap { case (f, i) =>
      val y = log(lC - lit(f) * col("__lmin"))
      Seq(sum(y).as(s"__sy$i"),
        sum(col("__x") * y).as(s"__sxy$i"),
        sum(y * y).as(s"__syy$i"))
    }
    val aggs = Seq(count(lit(1)).as("n_points"),
      min(col("__lmin")).as("__lmin"), // constant — carried for c = f·Lmin
      sum(col("__x")).as("__sx"),
      sum(col("__x") * col("__x")).as("__sxx")) ++ perC
    val base = based.agg(aggs.head, aggs.tail: _*)
      .withColumn("__n", col("n_points").cast("double"))
      .withColumn("__mx", col("__sx") / col("__n"))
      .withColumn("__vx",
        col("__sxx") / col("__n") - col("__mx") * col("__mx"))
    val candidates = cFracs.zipWithIndex.map { case (f, i) =>
      val my = col(s"__sy$i") / col("__n")
      val cov = col(s"__sxy$i") / col("__n") - col("__mx") * my
      val vy = col(s"__syy$i") / col("__n") - my * my
      val slope = cov / col("__vx")
      val sse = col("__n") * (vy - cov * cov / col("__vx"))
      val r2 = cov * cov / (col("__vx") * vy)
      struct(
        coalesce(when(col("__vx") > 0.0, sse), lit(Double.MaxValue))
          .as("sse"),
        (lit(f) * col("__lmin")).as("c"),
        exp(my - slope * col("__mx")).as("a"),
        (-slope).as("b"), r2.as("r2"))
    }
    base
      .withColumn("__best", array_min(array(candidates: _*)))
      .select(col("n_points"), col("__best.c").as("c"),
        col("__best.a").as("a"), col("__best.b").as("b"),
        col("__best.r2").as("r2"))
  }

  /** Word grams for the eval family: [[graft.functions.Text.shingles]]
    * minus empty grams — shingles mirrors SQL `split`, whose split of an
    * EMPTY string is `[""]`, so an empty candidate/reference would
    * otherwise carry one phantom empty unigram (and a length of 1).
    */
  private def wordGrams(c: Column, n: Int): Column =
    filter(graft.functions.Text.shingles(c, n), g => length(g) > 0)

  /** Clipped n-gram overlap per (candidate, reference) pair — the shared
    * counting core of [[bleu]] and [[rougeN]]: per pair, Σ_g min(count in
    * candidate, count in reference) plus both totals. Tokenization is
    * [[wordGrams]] (trim → lowercase → whitespace split, empty grams
    * dropped), the corpus convention every n-gram operator here shares.
    * One explode per side, a (pair, gram)-keyed count + join — rows are
    * token-scale, never pair-crossed.
    */
  private def clippedNgramOverlap(pairs: DataFrame, n: Int,
      grams: (Column, Int) => Column = wordGrams): DataFrame = {
    val cn = pairs
      .select(col("__id"), explode(grams(col("__cand"), n)).as("__g"))
      .groupBy("__id", "__g").agg(count(lit(1)).as("__cc"))
    val rn = pairs
      .select(col("__id"), explode(grams(col("__ref"), n)).as("__g"))
      .groupBy("__id", "__g").agg(count(lit(1)).as("__rc"))
    cn.join(rn, Seq("__id", "__g"), "full")
      .groupBy("__id")
      .agg(sum(least(coalesce(col("__cc"), lit(0L)),
          coalesce(col("__rc"), lit(0L)))).as(s"__clip$n"),
        sum(coalesce(col("__cc"), lit(0L))).as(s"__ctot$n"),
        sum(coalesce(col("__rc"), lit(0L))).as(s"__rtot$n"))
  }

  /** Sentence/segment BLEU (Papineni et al. 2002) per (candidate,
    * reference) pair — the generation-eval staple: modified n-gram
    * precisions p_n = Σ_g min(tf_cand, tf_ref) / Σ_g tf_cand for
    * n = 1..maxN (clipping stops a candidate from farming credit by
    * repeating one matched gram), the brevity penalty
    * BP = 1 if c ≥ r else e^(1−r/c), and
    * BLEU = BP · exp(Σ ln p_n / maxN). A pair with any p_n = 0 (or a
    * candidate shorter than maxN tokens) scores 0 — the standard smooth-
    * nothing convention; smooth upstream if segments are that short.
    * Returns one row per pair: (id, cand_len, ref_len, p1..p_maxN, bp,
    * bleu).
    *
    * maxN bounded explode/count/join passes over the pair table (each
    * token-scale, (id, gram)-keyed — nothing pair-crossed), folded onto
    * the pair spine by id; lengths are scan-side expressions. The pair
    * frame pins once so the maxN passes re-read one materialization.
    */
  def bleu(pairs: DataFrame, idCol: String, candCol: String,
           refCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1,8]: $maxN")
    val base = pairs.select(col(idCol).as("__id"),
        col(candCol).as("__cand"), col(refCol).as("__ref"))
      .localCheckpoint() // scanned once per n
    val lens = base.select(col("__id"),
      size(wordGrams(col("__cand"), 1)).cast("long").as("cand_len"),
      size(wordGrams(col("__ref"), 1)).cast("long").as("ref_len"))
    val joined = (1 to maxN)
      .map(n => clippedNgramOverlap(base, n))
      .foldLeft(lens)((acc, p) => acc.join(p, Seq("__id"), "left"))
    val withP = (1 to maxN).foldLeft(joined) { (acc, n) =>
      acc.withColumn(s"p$n",
        when(coalesce(col(s"__ctot$n"), lit(0L)) > 0,
          coalesce(col(s"__clip$n"), lit(0L)).cast("double") /
            col(s"__ctot$n")))
    }
    val allPos = (1 to maxN).map(n => col(s"p$n") > 0).reduce(_ && _)
    val logSum = (1 to maxN).map(n => log(col(s"p$n"))).reduce(_ + _)
    withP
      .withColumn("bp",
        when(col("cand_len") >= col("ref_len"), 1.0)
          .otherwise(when(col("cand_len") > 0,
            exp(lit(1.0) - col("ref_len").cast("double") /
              col("cand_len"))).otherwise(0.0)))
      .withColumn("bleu",
        when(allPos, col("bp") * exp(logSum / maxN)).otherwise(0.0))
      .select(col("__id").as(idCol) +: col("cand_len") +: col("ref_len") +:
        ((1 to maxN).map(n => col(s"p$n")) ++
          Seq(col("bp"), col("bleu"))): _*)
  }

  /** ROUGE-N recall (Lin 2004) per (candidate, reference) pair — BLEU's
    * recall-side complement, the summarization-eval convention: clipped
    * n-gram overlap over the REFERENCE total,
    * recall = Σ_g min(tf_cand, tf_ref) / Σ_g tf_ref. A reference shorter
    * than n tokens reports a null recall (no grams to recall). Returns
    * one row per pair: (id, n_overlap, n_ref, recall). Same counting
    * core and shape as [[bleu]], one n.
    */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String,
             refCol: String, n: Int = 2): DataFrame = {
    require(n >= 1 && n <= 8, s"n must be in [1,8]: $n")
    val base = pairs.select(col(idCol).as("__id"),
      col(candCol).as("__cand"), col(refCol).as("__ref"))
    base.select("__id")
      .join(clippedNgramOverlap(base, n), Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col(s"__clip$n"), lit(0L)).as("n_overlap"),
        coalesce(col(s"__rtot$n"), lit(0L)).as("n_ref"),
        when(coalesce(col(s"__rtot$n"), lit(0L)) > 0,
          coalesce(col(s"__clip$n"), lit(0L)).cast("double") /
            col(s"__rtot$n")).as("recall"))
  }

  /** chrF (Popović 2015) per (candidate, reference) pair — the
    * character-level eval metric that survives tokenizer and morphology
    * differences where word BLEU breaks: clipped character n-gram
    * matches for n = 1..maxN over whitespace-stripped lowercased text
    * (the corpus lowercasing convention — standard chrF is
    * case-sensitive; documented deviation), macro-averaged precision and
    * recall over the orders that HAVE grams on the respective side, then
    * F_β = (1+β²)·P·R / (β²·P + R) with the recall-weighted β = 2
    * default. A pair with no grams at all (or P+R = 0) scores 0.
    * Returns one row per pair: (id, chr_p, chr_r, chrf).
    *
    * Same counting core and shape as [[bleu]] (maxN token-scale
    * explode/count/join passes); the cleaned strings project FIRST and
    * the gram lambda only references the bound column — an inline
    * regexp_replace inside the HOF would re-clean per character (the
    * q50b per-element re-evaluation lesson).
    */
  def chrF(pairs: DataFrame, idCol: String, candCol: String,
           refCol: String, maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1,8]: $maxN")
    require(beta > 0, s"beta must be positive: $beta")
    def cleaned(c: Column): Column =
      regexp_replace(lower(trim(c)), "\\s+", "")
    val base = pairs.select(col(idCol).as("__id"),
        cleaned(col(candCol)).as("__cand"),
        cleaned(col(refCol)).as("__ref"))
      .localCheckpoint() // scanned once per n
    // sequence(1, 0) would run DESCENDING ([1,0]) — guard short strings
    def grams(c: Column, n: Int): Column =
      when(length(c) >= n,
        transform(sequence(lit(1), length(c) - n + 1),
          i => c.substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
    val joined = (1 to maxN)
      .map(n => clippedNgramOverlap(base, n, grams))
      .foldLeft(base.select("__id"))((acc, p) =>
        acc.join(p, Seq("__id"), "left"))
    def avgOver(tot: Int => Column): Column = {
      val num = (1 to maxN).map { n =>
        when(coalesce(tot(n), lit(0L)) > 0,
          coalesce(col(s"__clip$n"), lit(0L)).cast("double") / tot(n))
          .otherwise(0.0)
      }.reduce(_ + _)
      val den = (1 to maxN)
        .map(n => when(coalesce(tot(n), lit(0L)) > 0, 1.0).otherwise(0.0))
        .reduce(_ + _)
      when(den > 0, num / den).otherwise(0.0)
    }
    val b2 = beta * beta
    joined
      .withColumn("chr_p", avgOver(n => col(s"__ctot$n")))
      .withColumn("chr_r", avgOver(n => col(s"__rtot$n")))
      .withColumn("chrf",
        when(col("chr_p") + col("chr_r") > 0,
          lit(1 + b2) * col("chr_p") * col("chr_r") /
            (lit(b2) * col("chr_p") + col("chr_r"))).otherwise(0.0))
      .select(col("__id").as(idCol), col("chr_p"), col("chr_r"),
        col("chrf"))
  }

  /** TextRank extractive salience (Mihalcea & Tarau 2004) — the
    * unsupervised summarization pass a curation pipeline runs to keep a
    * document's load-bearing sentences (context distillation, snippet
    * selection for RAG, highlight extraction): sentences become nodes of
    * a PER-DOCUMENT graph, edge weight = the paper's normalized overlap
    * |tokens_i ∩ tokens_j| / (ln|tokens_i| + ln|tokens_j|) over DISTINCT
    * lowercased alphanumeric tokens (documented deviation: the paper
    * leaves tokenization open), and the weighted PageRank recurrence
    * WS(i) = (1−d) + d·Σ_j w_ji/Σ_k w_jk · WS(j) runs `iterations` fixed
    * synchronous rounds from WS=1.0 (fixed rounds + fixed init = the
    * deterministic, oracle-replayable convention of [[Graphs.pageRank]];
    * note TextRank's teleport is the CONSTANT (1−d), not pageRank's
    * (1−d)/N — per-doc scores are comparable across docs of different
    * lengths). Zero-overlap and both-single-token pairs (ln denominator
    * ≤ 0) carry no edge; a sentence with no edges scores (1−d).
    * Sentence split = [[Splits.sentenceChunks]]'s RE2-safe
    * `[.!?]+\s+` rule. Returns one row per sentence:
    * (idCol, sent_idx 1-based, sentence, n_tokens, score,
    * rank per doc by (score desc, sent_idx)).
    *
    * SCALE: every shuffle is doc-keyed — the sentence self-join is
    * per-doc quadratic but bounded by `maxSentences` (docs truncate to
    * their first `maxSentences` sentences, the standard long-doc guard),
    * so a 100 TB corpus costs O(docs · maxSentences²) edge rows spread
    * across doc-hash partitions, never a corpus-crossed join. Normalized
    * edges pin once; each round is ONE join + a doc-keyed partial-agg
    * sum, score frames pin per round and unpin when superseded (the
    * pageRank discipline).
    */
  def textRank(df: DataFrame, idCol: String, textCol: String,
               iterations: Int = 10, damping: Double = 0.85,
               maxSentences: Int = 64): DataFrame = {
    require(iterations >= 0, s"iterations must be ≥ 0: $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    require(maxSentences >= 1, s"maxSentences must be ≥ 1: $maxSentences")
    val sentArr = slice(filter(split(trim(col(textCol)), "[.!?]+\\s+"),
      s => length(s) > 0), 1, maxSentences)
    // Aligned-pin round shape (see [[Graphs.pageRank]]'s layout note),
    // with the extra property that EVERYTHING here is doc-keyed: because
    // a HashPartitioning on __doc satisfies every (__doc, x) clustering
    // requirement (subset rule), the sentence self-join, the edge
    // normalization, the per-round contribution join + aggregate and the
    // spine join ALL run exchange-free over the doc-partitioned pinned
    // frames — zero shuffles per round (previously ~4).
    val sents0 = df
      .select(col(idCol).as("__doc"), posexplode(sentArr))
      .select(col("__doc"), (col("pos") + 1).cast("long").as("__sid"),
        col("col").as("__sent"),
        array_distinct(filter(split(lower(col("col")), "[^a-z0-9]+"),
          t => length(t) > 0)).as("__toks"))
      .withColumn("__ntok", size(col("__toks")).cast("long"))
      .localCheckpoint() // both self-join sides + the spine + assembly
    val parts = Pinning.partsFor(sents0.count(), sents0)
    val sents = Pinning.pinBy(sents0, parts, "__doc")
    Pinning.unpin(sents0)
    val overlap = size(array_intersect(col("__ti"), col("__tj")))
      .cast("double")
    val lnDen = log(col("__ni").cast("double")) +
      log(col("__nj").cast("double"))
    val edges = sents
      .select(col("__doc"), col("__sid").as("__i"),
        col("__toks").as("__ti"), col("__ntok").as("__ni"))
      .join(sents.select(col("__doc"), col("__sid").as("__j"),
        col("__toks").as("__tj"), col("__ntok").as("__nj"))
        .hint("shuffle_hash"), Seq("__doc"))
      .where(col("__i") =!= col("__j"))
      .select(col("__doc"), col("__i"), col("__j"),
        overlap.as("__ov"), lnDen.as("__den"))
      .where(col("__ov") > 0 && col("__den") > 0)
      .withColumn("__w", col("__ov") / col("__den"))
    // out-normalize once: the per-round join carries (doc, src, dst, wn)
    val ew = Pinning.pinBy(edges
      .join(edges.groupBy("__doc", "__i").agg(sum("__w").as("__os"))
        .hint("shuffle_hash"), Seq("__doc", "__i"))
      .select(col("__doc"), col("__i").as("__src"),
        col("__j").as("__dst"), (col("__w") / col("__os")).as("__wn")),
      parts, "__doc")
    var scores = Pinning.pinBy(sents.select(col("__doc"), col("__sid"),
        lit(1.0).as("__score")), parts, "__doc")
    var r = 0
    while (r < iterations) {
      val contribs = ew
        .join(scores.withColumnRenamed("__sid", "__src")
          .hint("shuffle_hash"), Seq("__doc", "__src"))
        .groupBy(col("__doc"), col("__dst"))
        .agg(sum(col("__wn") * col("__score")).as("__m"))
      val next = Pinning.pinBy(sents.select("__doc", "__sid")
        .join(contribs.withColumnRenamed("__dst", "__sid")
          .hint("shuffle_hash"), Seq("__doc", "__sid"), "left")
        .select(col("__doc"), col("__sid"),
          (lit(1.0 - damping) + lit(damping) *
            coalesce(col("__m"), lit(0.0))).as("__score")), parts, "__doc")
      Pinning.unpin(scores) // superseded round
      scores = next
      r += 1
    }
    Pinning.unpin(ew)
    val wRank = Window.partitionBy("__doc")
      .orderBy(col("__score").desc, col("__sid"))
    sents.select(col("__doc"), col("__sid"), col("__sent"), col("__ntok"))
      .join(scores, Seq("__doc", "__sid"))
      .withColumn("rank", row_number().over(wRank))
      .select(col("__doc").as(idCol), col("__sid").as("sent_idx"),
        col("__sent").as("sentence"), col("__ntok").as("n_tokens"),
        col("__score").as("score"), col("rank"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    toks.join(broadcast(freq), Seq("__tok"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol)).agg(
        avg(-log(col("__c").cast("double") / col("__t"))).as("nll"),
        count(lit(1)).as("n_toks"))
  }

  // ---- common predicate builders ------------------------------------------

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
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Composed training-data curation pipeline over a documents table:
  * annotate (tokens, quality, language) → filter → dedup (exact-normalized,
  * then MinHash-LSH). The shape of a real corpus-prep job: every stage is a
  * pure DataFrame transform, annotation is scan-side, dedup shuffles only
  * hashes, so the pipeline's cost is one scan + two compact-key shuffles.
  */
object CorpusPipeline {

  final case class Config(minTokens: Int = 5, minQuality: Double = 0.05,
                          languages: Seq[String] = Seq("en"),
                          shingleSize: Int = 3, numHashes: Int = 16,
                          bands: Int = 4)

  /** Stage 1 — scan-side annotation (no shuffle). */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tokens", Text.tokenCount(col(textCol)))
      .withColumn("quality", Text.qualityScore(col(textCol)))
      .withColumn("lang_pred", Text.languageId(col(textCol)))
      .withColumn("fp", Text.fingerprint(col(textCol)))

  /** Stage 2 — quality/language gate (pushdown-able predicates). */
  def qualityFilter(annotated: DataFrame, cfg: Config): DataFrame =
    annotated.where(col("n_tokens") >= cfg.minTokens &&
      col("quality") >= cfg.minQuality &&
      col("lang_pred").isin(cfg.languages.map(x => x: Any): _*))

  /** Stage 3 — two-tier dedup: normalized-fingerprint exact pass (one
    * hash-agg shuffle), then MinHash-LSH near-dup pass over the survivors.
    *
    * The annotated input is materialized first (`localCheckpoint`): the
    * dedup graph references it from several branches, and without a
    * materialization boundary Catalyst re-inlines (and re-executes) the
    * whole annotate expression tree per branch — measured 49 s → 3 s at
    * sf0.1. On a cluster this boundary is the persisted silver table.
    */
  def dedup(filtered: DataFrame, idCol: String, textCol: String,
            cfg: Config): DataFrame = {
    val mat = filtered.localCheckpoint()
    val fpSurvivors = mat.groupBy("fp").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    val afterExact = mat.join(fpSurvivors, Seq(idCol), "left_semi")
    Dedup.minhashKeepIds(afterExact, idCol, textCol,
        cfg.shingleSize, cfg.numHashes, cfg.bands)
      .join(afterExact, Seq(idCol), "inner")
  }

  /** Full pipeline: annotate → filter → dedup → curated corpus. */
  def curate(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text", cfg: Config = Config()): DataFrame =
    dedup(qualityFilter(annotate(docs, textCol), cfg), idCol, textCol, cfg)

  /** The pipeline with the near-dup tier swapped for exact
    * normalized-fingerprint dedup only — every stage SQL-expressible, so
    * the whole composition (annotate → filter → dedup → select) is
    * hash-checked end-to-end by the gate (q45b); [[curate]] adds the
    * LSH tier, whose recall is gated separately (q38/q77).
    */
  def curateExact(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", cfg: Config = Config()): DataFrame = {
    // materialized for the same reason as dedup(): the keep-aggregate and
    // the semi-join both reference it, and without the boundary Catalyst
    // re-inlines the whole annotate tree into each branch
    val filtered = qualityFilter(annotate(docs, textCol), cfg).localCheckpoint()
    val keep = filtered.groupBy("fp").agg(min(col(idCol)).as(idCol)).select(idCol)
    filtered.join(keep, Seq(idCol), "left_semi")
  }

  /** Per-source curation report — the "what is my corpus made of" table a
    * data-mixing decision starts from: for each source its document count
    * and corpus share, how many of its docs are exact duplicates of ANY
    * corpus doc (md5-of-text occurring ≥2 times corpus-wide) and the dup
    * rate, plus char/token volume and means.
    *
    * Shape for scale: char/token measures are scan-side expressions (the
    * split bound to a projected column before the HOF filter); the dup flag
    * is one md5-keyed aggregate joined back on the same compact key (two
    * 16-byte-key shuffles, never raw text); the per-source rollup is a
    * partial-aggregable hash agg and the corpus total a one-row broadcast.
    */
  def sourceReport(docs: DataFrame, textCol: String = "text",
                   sourceCol: String = "source"): DataFrame = {
    val base = docs
      .select(col(sourceCol).as("source"), md5(col(textCol)).as("__fp"),
        length(col(textCol)).cast("long").as("__chars"),
        split(col(textCol), " ").as("__toks"))
      .withColumn("__ntok",
        size(filter(col("__toks"), t => length(t) > 0)).cast("long"))
      .drop("__toks")
    val fpCounts = base.groupBy("__fp").agg(count(lit(1)).as("__fp_n"))
    val perSource = base.join(fpCounts, "__fp")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__fp_n") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        sum("__chars").as("sum_chars"),
        sum("__ntok").as("sum_tokens"))
    val total = docs.agg(count(lit(1)).as("__total"))
    perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"),
        round(col("n_docs") / col("__total").cast("double"), 6).as("share"),
        col("n_dup_docs"),
        round(col("n_dup_docs") / col("n_docs").cast("double"), 6)
          .as("dup_rate"),
        col("sum_chars"), col("sum_tokens"),
        round(col("sum_chars") / col("n_docs").cast("double"), 4)
          .as("mean_chars"),
        round(col("sum_tokens") / col("n_docs").cast("double"), 4)
          .as("mean_tokens"))
  }
}

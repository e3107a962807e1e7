package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-pair (RLHF / reward-model training data) audits. A
  * preference dataset is (prompt, chosen, rejected) triples; its known
  * failure modes are STRUCTURAL, not semantic, and therefore measurable
  * at corpus scale before any model sees the data:
  *
  *  - LENGTH BIAS: if `chosen` is longer than `rejected` in ≫ 50 % of
  *    pairs, a reward model trained on it learns "longer is better"
  *    (the classic verbosity reward hack) — the single most reported
  *    preference-data pathology.
  *  - DEGENERATE PAIRS: identical or near-identical chosen/rejected
  *    (high token overlap) carry no preference signal but still spend
  *    gradient steps; exact duplicates are labeling-pipeline bugs.
  *
  * Scale shape: [[pairStats]] is pure scan-side HOF work (token splits,
  * array_distinct/array_intersect per row — no shuffle, no UDF);
  * [[lengthBiasAudit]] adds ONE global aggregate. A billion-pair dump
  * audits in a single pass.
  */
object Preferences {

  private def toks(c: Column): Column =
    filter(split(coalesce(c, lit("")), " "), w => length(w) > 0)

  /** Per-pair structural row: (…, len_chosen, len_rejected,
    * chosen_longer, len_ratio, jaccard, identical). `len_ratio` =
    * chosen/rejected token counts (null when rejected is empty);
    * `jaccard` over DISTINCT tokens (null when both are empty);
    * `identical` = exact string equality.
    */
  def pairStats(df: DataFrame, idCol: String, chosenCol: String,
                rejectedCol: String): DataFrame = {
    val bound = df.withColumn("__ct", toks(col(chosenCol)))
      .withColumn("__rt", toks(col(rejectedCol)))
    val lc = size(col("__ct")).cast("long")
    val lr = size(col("__rt")).cast("long")
    val cd = array_distinct(col("__ct"))
    val rd = array_distinct(col("__rt"))
    val inter = size(array_intersect(cd, rd))
    val union = size(cd) + size(rd) - inter
    bound.select(
      col(idCol),
      lc.as("len_chosen"),
      lr.as("len_rejected"),
      (lc > lr).as("chosen_longer"),
      when(lr > 0, lc.cast("double") / lr).as("len_ratio"),
      when(union > 0, inter.cast("double") / union).as("jaccard"),
      (col(chosenCol) === col(rejectedCol)).as("identical"))
  }

  /** The one-row corpus audit: (n_pairs, frac_chosen_longer,
    * mean_len_ratio, frac_identical, frac_high_overlap, mean_jaccard).
    * `frac_chosen_longer` near 0.5 = length-neutral labels; ≫ 0.5 =
    * the reward model will learn verbosity. `frac_high_overlap` counts
    * pairs with jaccard ≥ `overlapThreshold` (default 0.8) — the
    * no-signal mass.
    */
  def lengthBiasAudit(df: DataFrame, idCol: String, chosenCol: String,
                      rejectedCol: String,
                      overlapThreshold: Double = 0.8): DataFrame = {
    require(overlapThreshold > 0 && overlapThreshold <= 1,
      s"overlapThreshold in (0,1]: $overlapThreshold")
    pairStats(df, idCol, chosenCol, rejectedCol).agg(
      count(lit(1)).as("n_pairs"),
      avg(col("chosen_longer").cast("double")).as("frac_chosen_longer"),
      avg("len_ratio").as("mean_len_ratio"),
      avg(col("identical").cast("double")).as("frac_identical"),
      avg((col("jaccard") >= overlapThreshold).cast("double"))
        .as("frac_high_overlap"),
      avg("jaccard").as("mean_jaccard"))
  }

  /** Bradley–Terry strength fitting over pairwise preferences (the batch
    * analog of Elo, and the model RLHF reward data implicitly assumes):
    * P(i beats j) = θᵢ/(θᵢ+θⱼ), fit by the classic MM iteration
    * (Hunter 2004) θᵢ ← Wᵢ / Σⱼ nᵢⱼ/(θᵢ+θⱼ), normalized to Σθ = 1 per
    * round. A FIXED number of synchronous rounds keeps it deterministic
    * and oracle-replayable (the Graphs.pageRank discipline). Items with
    * zero wins pin to strength 0 (MM's fixed point for them — they only
    * ever lose). Returns one row per item: (item, wins, games, strength).
    *
    * Input: one row per comparison (winnerCol, loserCol). Shape: the
    * comparison log collapses ONCE to a per-(i, j) game-count table
    * (symmetrized) and a per-item win table; each round is one
    * games⋈θ⋈θ join + a partial-aggregable per-item sum + a one-row
    * normalizer broadcast, pinned per round — plan depth constant, and
    * the row-scale log is never rescanned.
    */
  def bradleyTerry(df: DataFrame, winnerCol: String, loserCol: String,
                   iterations: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be ≥ 1: $iterations")
    // Aligned-pin round shape (see [[Graphs.pageRank]]'s layout note):
    // games pin keyed on __i, θ/wins on item, so the __i-side join, the
    // per-item denominator aggregate's output and the wins join all line
    // up exchange-free; a round's shuffles are the one __j-side
    // re-exchange of the game table plus the per-item aggregate.
    val w = df.select(col(winnerCol).as("__w"), col(loserCol).as("__l"))
      .where(col("__w") =!= col("__l"))
    val winCounts = w.groupBy(col("__w")).agg(count(lit(1)).as("__n"))
    val games0 = w.select(col("__w").as("__i"), col("__l").as("__j"))
      .union(w.select(col("__l").as("__i"), col("__w").as("__j")))
      .groupBy("__i", "__j").agg(count(lit(1)).as("__g"))
      .localCheckpoint(eager = true)
    val parts = Pinning.partsFor(games0.count(), games0)
    def pin(d: DataFrame, keys: String*): DataFrame =
      Pinning.pinBy(d, parts, keys: _*)
    val games = pin(games0, "__i")
    Pinning.unpin(games0)
    val items = pin(games.select(col("__i").as("item")).distinct(), "item")
    val wins = pin(items
      .join(winCounts.withColumnRenamed("__w", "item").hint("shuffle_hash"),
        Seq("item"), "left")
      .select(col("item"), coalesce(col("__n"), lit(0L)).as("wins")), "item")
    var theta = pin(items.withColumn("__t", lit(1.0)), "item")
    var i = 0
    while (i < iterations) {
      val denom = games
        .join(theta.select(col("item").as("__i"), col("__t").as("__ti"))
          .hint("shuffle_hash"), "__i")
        .join(theta.select(col("item").as("__j"), col("__t").as("__tj"))
          .hint("shuffle_hash"), "__j")
        .groupBy(col("__i").as("item"))
        .agg(sum(col("__g") / (col("__ti") + col("__tj"))).as("__d"))
      val raw = wins.join(denom.hint("shuffle_hash"), "item")
        .select(col("item"), (col("wins") / col("__d")).as("__t"))
      val tot = raw.agg(sum("__t").as("__s"))
      val next = pin(raw.crossJoin(broadcast(tot))
        .select(col("item"), (col("__t") / col("__s")).as("__t")), "item")
      Pinning.unpin(theta)
      theta = next
      i += 1
    }
    val totalGames = games.groupBy(col("__i").as("item"))
      .agg(sum("__g").as("games"))
    // games/wins stay pinned: the returned plan still reads them (a
    // localCheckpoint has no lineage to recompute from); only the
    // item spine is safe to release
    Pinning.unpin(items)
    wins.join(totalGames, "item")
      .join(theta.withColumnRenamed("__t", "strength"), "item")
  }
}

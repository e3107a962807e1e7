package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.StringSimExpressions

/** Record linkage / entity resolution: multi-pass blocking → Jaro-Winkler
  * verification → connected-component entity clusters → golden records.
  *
  * The reference's bikeshare lake joins on clean surrogate keys; real
  * ingest rarely has them — rider/station feeds arrive with typo'd names
  * that must be linked before any of the §2 joins apply. The design
  * follows the standard multi-pass blocking literature (Hernández &
  * Stolfo's merge/purge): each pass buckets records by a cheap derived
  * key, candidate pairs form only within buckets, and an exact similarity
  * verifies candidates. Against 100 TB the invariants are the engine's
  * usual ones: pairs form per-bucket (one shuffle per pass keyed on the
  * block key, quadratic only within buckets), verification is scan-side
  * native [[graft.functions.expressions.JaroWinklerSim]], and the cluster
  * step shuffles only (id, label) rows through the checkpointed
  * pointer-jumping loop shared with [[Dedup.connectedComponents]].
  *
  * Recall semantics — stated, not hand-waved: prefix-k ∪ suffix-k blocking
  * is COMPLETE for a single insertion/deletion/substitution on keys of
  * length ≥ 2k (an edit at position p breaks the k-prefix only when
  * p ≤ k and the k-suffix only when p > len−k — both cannot hold), and
  * heuristic for multi-edit noise; the default passes add a mid-token key
  * so pairs dirtied at BOTH ends still block. LinkageSpec measures recall
  * against brute force; the q202 gate's oracle replays the exact blocking
  * in SQL, so the hash match proves the pipeline (blocking join + native
  * JW + threshold) rather than silently assuming perfect recall.
  *
  * Bucket-size caution (the q147 lesson): frequency-skewed block keys
  * degrade pair generation quadratically — prefix keys over a tiny
  * vocabulary are hot. Pass design is the caller's first scale lever;
  * `maxBlockSize` is the backstop: blocks above it split into hash
  * sub-buckets with consecutive sub-bucket representatives chained in as
  * extra candidates (the [[Similarity.semDedup]] skew cap), so one
  * dominant block costs N·cap pair work instead of N², a true
  * near-identical flood still closes into one entity through the
  * verified chain, and — because every candidate passes the same
  * verification — the cap can only LOSE cross-sub recall on
  * merely-similar keys, never merge anything spurious. Blocks ≤ cap
  * behave exactly as the uncapped operator.
  */
object Linkage {

  /** Native Jaro similarity column (DuckDB-exact; see [[graft.functions.expressions.JaroUtil]]). */
  def jaro(a: Column, b: Column): Column = StringSimExpressions.jaro(a, b)

  /** Native Jaro-Winkler similarity column (DuckDB-exact). */
  def jaroWinkler(a: Column, b: Column): Column = StringSimExpressions.jaroWinkler(a, b)

  /** Default passes: k-prefix, k-suffix, and the middle two tokens —
    * complete for one edit anywhere (prefix/suffix) plus both-ends noise
    * that keeps the token core (mid).
    */
  def defaultPasses(k: Int = 4): Seq[Column => Column] = Seq(
    key => substring(key, 1, k),
    // SQL substring with a negative start counts from the end
    key => substring(key, -k, k),
    key => array_join(slice(split(key, "\\s+"), 3, 2), " ")
  )

  /** Candidate pairs (id_a < id_b, distinct) from multi-pass blocking over
    * one record set. Each pass is one self-equi-join on its block key;
    * passes union and dedupe on the id pair, so a pair caught by several
    * passes verifies once. Empty block keys are skipped (a pass that
    * can't derive a key for a record abstains rather than bucketing all
    * such records together).
    *
    * Skew cap: a block larger than `maxBlockSize` splits into
    * ⌈n/cap⌉ hash sub-buckets (pairing runs within (block, sub) — per-pass
    * pair work N·cap, not N² on a hot block), with consecutive sub-bucket
    * min-id representatives chained in as extra candidates so a flood of
    * genuinely-matching keys still closes transitively downstream. The
    * hot-block count table is ≤ N/cap rows (only split blocks join back);
    * blocks ≤ cap are byte-identical to the uncapped operator.
    */
  def blockedPairs(records: DataFrame, idCol: String, keyCol: String,
                   passes: Seq[Column => Column] = defaultPasses(),
                   maxBlockSize: Int = 4096): DataFrame =
    blockedPairsRaw(records, idCol, keyCol, passes, maxBlockSize)
      .dropDuplicates("id_a", "id_b")

  /** Per-pass candidate pairs BEFORE the cross-pass id-pair dedup — the
    * same multiset the public [[blockedPairs]] dedupes. Kept separate so
    * [[linkPairs]] can verify scan-side FIRST: a deterministic row-wise
    * predicate commutes with `dropDuplicates`, so filtering before the
    * dedup yields the identical pair set while the all-candidates shuffle
    * (every blocked pair × two key strings) shrinks to survivors only —
    * at 100 TB the candidate multiset is the largest frame in the whole
    * linkage pipeline and never needs to cross the wire unverified.
    */
  private def blockedPairsRaw(records: DataFrame, idCol: String,
                              keyCol: String,
                              passes: Seq[Column => Column],
                              maxBlockSize: Int): DataFrame = {
    require(maxBlockSize > 1, s"maxBlockSize must exceed 1: $maxBlockSize")
    // Pin (id, key) once: every pass scans the record set twice (left and
    // right of its self-join), and a caller's key column is typically
    // DERIVED from heavyweight payloads (title-from-text here; name
    // normalization in general). Without the pin those upstream
    // expressions re-execute 2·|passes| times — measured 29 s → 3 s at
    // sf0.1. The pinned frame is (id, short key) — corpus-key-sized, the
    // same budget as the q63 tf pin, never the payloads. It is
    // repartitioned by id first (one narrow shuffle of the compact frame,
    // amortized across every pass) because the within-block self-joins —
    // and the scan-side JW verification linkPairs fuses into them —
    // inherit ITS partitioning when the per-block side broadcasts: a
    // single-file source would otherwise run the whole quadratic pair
    // stage, and every verification, on one task.
    val base = records.select(col(idCol).as("__id"), col(keyCol).as("__key"))
      .repartition(
        records.sparkSession.sessionState.conf.numShufflePartitions,
        col("__id")) // explicit count: AQE must not coalesce the pin to 1
      .localCheckpoint(eager = false)
    // All passes in ONE pass-tagged frame: (__pass, __block) replaces the
    // per-pass plan fan-out, so the hot-block aggregate, the left join
    // attaching split factors, the within-block self-join and the chain
    // join each run ONCE over the union of passes instead of once per
    // pass — same candidate multiset keyed identically (a pair blocks in
    // pass i iff it shares (__pass=i, __block, __sub)), one third the
    // jobs/exchanges of the per-pass shape (guide §2.4).
    val keyed = base.select(col("__id"), col("__key"),
        posexplode(array(passes.map(p => p(col("__key"))): _*))
          .as(Seq("__pass", "__block")))
      .where(col("__block").isNotNull && col("__block") =!= "")
    val hot = keyed.groupBy("__pass", "__block")
      .agg(ceil(count(lit(1)) / maxBlockSize.toDouble).cast("int").as("__m"))
      .where(col("__m") > 1)
    val sub = keyed.join(hot, Seq("__pass", "__block"), "left")
      .withColumn("__m", coalesce(col("__m"), lit(1)))
      .withColumn("__sub",
        pmod(xxhash64(col("__id")), col("__m").cast("long")).cast("int"))
    val l = sub.select(col("__pass"), col("__block"), col("__sub"),
      col("__id").as("id_a"), col("__key").as("key_a"))
    val r = sub.select(col("__pass").as("__rpass"),
      col("__block").as("__rblock"), col("__sub").as("__rsub"),
      col("__id").as("id_b"), col("__key").as("key_b"))
    val within = l.join(r,
        col("__pass") === col("__rpass")
          && col("__block") === col("__rblock")
          && col("__sub") === col("__rsub")
          && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "key_a", "key_b")
    // chain: min-id representative of sub k ↔ of sub k+1, split blocks
    // only — linear in sub-bucket count, verified like any candidate
    val reps = sub.where(col("__m") > 1)
      .groupBy("__pass", "__block", "__sub")
      .agg(min_by(struct(col("__id").as("id"), col("__key").as("key")),
        col("__id")).as("r"))
    val chain = reps.alias("x")
      .join(reps.alias("y"),
        col("x.__pass") === col("y.__pass") &&
          col("x.__block") === col("y.__block") &&
          col("x.__sub") + 1 === col("y.__sub"))
      .select(
        least(col("x.r.id"), col("y.r.id")).as("id_a"),
        greatest(col("x.r.id"), col("y.r.id")).as("id_b"),
        when(col("x.r.id") <= col("y.r.id"), col("x.r.key"))
          .otherwise(col("y.r.key")).as("key_a"),
        when(col("x.r.id") <= col("y.r.id"), col("y.r.key"))
          .otherwise(col("x.r.key")).as("key_b"))
      .select("id_a", "id_b", "key_a", "key_b")
    within.unionAll(chain)
  }

  /** Blocked candidates verified at `threshold`: (id_a, id_b, jw). The
    * threshold compares the 6dp-rounded score so a last-ulp disagreement
    * between engines cannot flip membership at the boundary (the repo's
    * standard cross-engine float discipline).
    *
    * `idCol` must identify records uniquely (the standard linkage
    * contract — every operator here treats one id as one record; under
    * duplicate ids a pair's keys, and so its score, would be ambiguous).
    *
    * Shape for scale: verification runs scan-side on the raw per-pass
    * join output and the id-pair dedup runs AFTER it, on survivors only —
    * JW is a deterministic function of the carried keys, so a pair caught
    * by several passes scores identically in each and the filter commutes
    * with the dedup (same result set as verify-after-dedup). The
    * alternative order shuffles every blocked candidate (ids + both key
    * strings) just to drop the few that verify — measured 2.87 M-row
    * dedup → 5.3 k-row dedup on the q203 corpus at sf0.1.
    */
  def linkPairs(records: DataFrame, idCol: String, keyCol: String,
                threshold: Double,
                passes: Seq[Column => Column] = defaultPasses(),
                maxBlockSize: Int = 4096): DataFrame =
    blockedPairsRaw(records, idCol, keyCol, passes, maxBlockSize)
      // threshold-gated JW (guide §4, the q149 banded-levenshtein shape):
      // cheap sound length/prefix gates skip the match scan for pairs that
      // provably cannot reach the threshold — survivors take the exact
      // ungated arithmetic, and the 1e-6 slack clears the 6dp rounding, so
      // the filtered pair set and its jw values are bit-identical
      .withColumn("jw", round(StringSimExpressions.jaroWinklerGte(
        col("key_a"), col("key_b"), threshold - 1e-6), 6))
      .where(col("jw") >= threshold)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "jw")

  /** Entity resolution: link → connected components → one row per record
    * with its entity label, plus the entity's golden record. Survivorship:
    * the record with the HIGHEST `completeness` score wins (ties and the
    * default `None` fall back to minimum id — deterministic either way).
    * Pass e.g. a count of non-null fields, a source-trust rank, or a
    * recency epoch as the score; it is evaluated against `records`'
    * columns. Singletons are their own entity.
    *
    * Scale shape: the score travels with the already-shuffled label join;
    * the golden pick is ONE min_by aggregate per entity (keyed on
    * (−score, id), so the richer record wins and the id breaks ties) —
    * no extra shuffle over the no-survivorship formulation.
    */
  def resolveEntities(records: DataFrame, idCol: String, keyCol: String,
                      threshold: Double,
                      passes: Seq[Column => Column] = defaultPasses(),
                      maxBlockSize: Int = 4096,
                      completeness: Option[Column] = None): DataFrame = {
    val pairs = linkPairs(records, idCol, keyCol, threshold, passes,
      maxBlockSize)
    val labels = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
    val base = records.select(col(idCol).as("id"), col(keyCol).as("key"),
      coalesce(completeness.getOrElse(lit(0.0)).cast("double"), lit(0.0))
        .as("__comp"))
    val labeled = base
      .join(labels, Seq("id"), "left")
      .select(col("id"), col("key"), col("__comp"),
        coalesce(col("cluster"), col("id")).as("entity"))
    val golden = labeled
      .groupBy("entity")
      .agg(min_by(col("id"),
          struct((-col("__comp")).as("c"), col("id").as("i"))).as("__gid"),
        count(lit(1)).as("n_records"))
      .join(base.select(col("id").as("__gid"), col("key").as("golden_key")), Seq("__gid"))
      .select("entity", "n_records", "golden_key")
    labeled.join(golden, Seq("entity"))
      .select("id", "key", "entity", "n_records", "golden_key")
  }

  /** Distinct termlist hits per row via one Aho-Corasick pass: appends
    * `matchedCol` = sorted indices into `terms` of the phrases the text
    * contains. One text scan for any termlist size — the k-`contains`
    * formulation (the oracle) scans k times.
    */
  def tagTerms(df: DataFrame, textCol: String, terms: Seq[String],
               matchedCol: String = "matched_terms"): DataFrame =
    df.withColumn(matchedCol,
      StringSimExpressions.multiContains(col(textCol), terms))
}

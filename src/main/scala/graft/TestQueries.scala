package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Derived, Text, Vectors}
import graft.operators.{Analytics, Classify, DateSpine, Dedup, Multimodal, Sessionize, Similarity, Sketches, Timeseries}
import graft.sources.Tables

import scala.collection.immutable.ListMap

/** The testdata-shaped embodiment of every operator in SURVEY.md §2 plus the
  * training-data-pipeline extensions, each paired with ANSI SQL the driver
  * runs in DuckDB over the same parquet tables (the t2 correctness gate).
  *
  * Cross-engine determinism rules applied throughout:
  *  - double aggregates are `round(...)`-ed (summation order differs between
  *    engines at the ulp level; SURVEY.md §7.4 risk 5);
  *  - computed integers are cast to BIGINT on both sides (DuckDB widens,
  *    Spark doesn't);
  *  - Spark `dayofweek` is 1=Sunday, DuckDB 0=Sunday → oracle adds +1;
  *  - top-K queries carry a unique tiebreaker so LIMIT picks the same rows;
  *  - vector math accumulates in double, array order, in both engines.
  */
object TestQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = n match {
    // the vintage-defended tables route through their normalizing loaders
    // (physical-type drift in regenerated testdata must be normalized or
    // refused at the scan, never propagated — the round-8 lesson)
    case "documents"  => Tables.loadDocuments(s, dir)
    case "events"     => Tables.loadEvents(s, dir)
    case "embeddings" => Tables.loadEmbeddings(s, dir)
    case _            => Tables.load(s, dir, n)
  }

  /** Session-scoped cache of trained ANN quantizer artifacts (codebook /
    * centroid DataFrames — LOCAL relations of collected literals, so no
    * cluster state is retained). Training is deterministic (hash-seeded
    * Lloyd), so a cache hit is bit-identical to retraining; the gate and
    * bench thereby exercise the production train-once / search-many shape
    * instead of paying Lloyd per query invocation. Keyed by session
    * identity so a stale session's artifacts are never reused.
    */
  private val annModels = new graft.SessionCache[AnyRef]
  private def annModel[T <: AnyRef](s: SparkSession, dir: String,
                                    config: String)(train: => T): T =
    annModels.getOrElseUpdate(s, s"$dir:$config")(train).asInstanceOf[T]

  // ---- §2.1/2.2 sources + projection --------------------------------------

  def q01ScanProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")

  def q02ConformRenameCast(s: SparkSession, dir: String): DataFrame =
    Tables.conform(
      t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_returnflag"),
      renames = Map("l_orderkey" -> "okey", "l_linenumber" -> "ln",
        "l_returnflag" -> "rflag"),
      types = Map("okey" -> org.apache.spark.sql.types.StringType,
        "ln" -> org.apache.spark.sql.types.LongType))

  // ---- §2.3 filters --------------------------------------------------------

  def q03FilterPredicates(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_returnflag") === "R" && col("l_quantity").between(10, 20) &&
        col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")

  def q04CaseBucketTod(s: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(s, dir)
      .withColumn("tod", Derived.timeOfDay(col("ts")))
      .groupBy("tod")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))

  // ---- §2.5 aggregations ---------------------------------------------------

  def q05AggReturnflag(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy("l_returnflag").agg(
      round(sum("l_quantity"), 2).as("sum_qty"),
      round(avg("l_extendedprice"), 4).as("avg_price"),
      min("l_extendedprice").as("min_price"),
      max("l_extendedprice").as("max_price"),
      count(lit(1)).as("n"))

  def q06AggMultikey(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy("l_returnflag", "l_linestatus").agg(
      count(lit(1)).as("n"),
      round(sum("l_extendedprice"), 2).as("revenue"))

  def q07GlobalMinmax(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").agg(
      min("o_orderdate").as("dmin"), max("o_orderdate").as("dmax"),
      min("o_totalprice").as("pmin"), max("o_totalprice").as("pmax"),
      count(lit(1)).as("n"))

  // ---- §2.4 joins ----------------------------------------------------------

  /** Dim-contract note (applies to q08/q09/q11): customer is the
    * reference's "dim" analog, but its cardinality scales with SF (15 B
    * rows at sf100k) — by the broadcast-hint rule it gets NO hint; AQE
    * promotes it at small SF where it genuinely fits. nation (25 rows) and
    * region (5 rows) are spec-FIXED cardinality independent of SF, so
    * their hints are legitimate bounded-regardless-of-scale promises.
    */
  def q08JoinOrdersCustomer(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total_price"))
  }

  def q09JoinFilteredDim(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))
  }

  /** J5-style many-to-many fan-out: self-join orders on the customer key. */
  def q10JoinFanout(s: SparkSession, dir: String): DataFrame = {
    val a = t(s, dir, "orders").select("o_custkey", "o_orderkey")
    val b = t(s, dir, "orders").select(col("o_custkey"),
      col("o_totalprice").as("b_totalprice"))
    a.join(b, Seq("o_custkey"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_pairs"), round(sum("b_totalprice"), 2).as("fan_total"))
  }

  def q11StarJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
  }

  // ---- §2.6 sort / top-K ---------------------------------------------------

  def q12TopkSuppliers(s: SparkSession, dir: String): DataFrame =
    Analytics.topK(
      t(s, dir, "lineitem").groupBy("l_suppkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_suppkey")), 10)

  def q13SortLimit(s: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(s, dir)
      .orderBy(col("ts"), col("event_id"))
      .select(col("event_id"), date_trunc("minute", col("ts")).as("ts_min"),
        col("value"))
      .limit(100)

  // ---- §2.8 generators -----------------------------------------------------

  def q14DateSpine(s: SparkSession, dir: String): DataFrame =
    DateSpine.paymentDates(s, t(s, dir, "orders"), "o_orderdate")
      .select(col("date_id"), col("month").cast("long").as("month"),
        col("quarter").cast("long").as("quarter"), col("year").cast("long").as("year"))

  // ---- §2.9 scalar functions -----------------------------------------------

  def q15DowHour(s: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(s, dir)
      .groupBy(dayofweek(col("ts")).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("n"))

  def q16DatediffMonthly(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(month(col("o_orderdate")).cast("long").as("m"))
      .agg(round(avg(datediff(col("l_shipdate"), col("o_orderdate"))), 4)
        .as("avg_delay"), count(lit(1)).as("n"))
  }

  def q17YearQuarter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))

  def q18Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("y", year(col("o_orderdate")).cast("long"))
      .withColumn("q", quarter(col("o_orderdate")).cast("long"))
      .rollup("y", "q")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))

  // ---- §2.7 set operations (engine extension; none in reference) -----------

  def q19Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()

  def q20Union(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region").select(col("r_name").as("name"))
      .union(t(s, dir, "nation").select(col("n_name").as("name")))
      .distinct()

  def q21SemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey")

  def q22AntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey")

  // ---- window functions (engine extension) ---------------------------------

  def q23WindowRank(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem").groupBy("l_returnflag", "l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("revenue").desc, col("l_suppkey"))
    rev.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
  }

  def q24WindowRunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running"))
  }

  def q25Having(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .where(col("n") >= 2)

  def q26ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy("l_returnflag").agg(
      sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("n_disc"),
      sum(when(col("l_quantity") >= 25, 1L).otherwise(0L)).as("n_big"))

  /** §3.2/3.3 — the `spark.sql(text)` entry path over temp views (S6). */
  def q27SqlEntry(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders_v WHERE o_orderstatus = 'F' GROUP BY o_orderpriority""".stripMargin)
  }

  def q28CountDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy("l_returnflag").agg(
      countDistinct("l_partkey").as("nd_parts"),
      countDistinct("l_suppkey").as("nd_supp"))

  /** approx_count_distinct (HLL) — engine capability; sketch estimates are
    * engine-specific so this is a rows-only check, with exactness asserted
    * relative to q28 in tests.
    */
  def q28bApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy("l_returnflag").agg(
      approx_count_distinct("l_partkey").as("approx_parts"))

  def q29Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))

  // ---- dedup (training-data extensions) ------------------------------------

  def q30DedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactKeepIds(t(s, dir, "documents"), "doc_id", Seq("text"))

  def q31DedupNormalized(s: SparkSession, dir: String): DataFrame =
    Dedup.fingerprintKeepIds(t(s, dir, "documents"), "doc_id", "text")

  def q32TextQuality(s: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    t(s, dir, "documents").select(col("doc_id"),
      length(txt).cast("long").as("n_chars_txt"),
      Text.punctCount(txt).cast("long").as("n_punct"),
      Text.digitCount(txt).cast("long").as("n_digit"),
      Text.upperCount(txt).cast("long").as("n_upper"),
      round(Text.meanWordLength(txt), 4).as("mean_wlen"))
  }

  def q33TokenCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      Text.tokenCount(col("text")).cast("long").as("n_tokens"),
      Text.subwordCount(col("text")).cast("long").as("n_subwords"))

  def q34FingerprintMd5(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"), md5(col("text")).as("fp"))

  def q35LangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      Text.languageId(col("text")).as("lang_pred"))

  def q36MinhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidatePairs(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("id_a", "id_b")

  /** Exact MinHash anchor (the q37b treatment for q36): band-bucketed
    * candidates over the MD5 signature must hash-match DuckDB's exact
    * all-pairs "≥ 1 band agrees" recomputation of the SAME signature —
    * covering tokenize→shingle→min-hash→band→bucket→pair in one gate.
    * The xxhash production path (q36) keeps its rows-only check.
    * Runs on a deterministic 1/3 slice (doc_id % 3 = 0): the semantics
    * under test are per-doc signature arithmetic + banding, which a slice
    * exercises identically, and the anchor is quadratic by definition —
    * the slice keeps it an anchor instead of the bench's top spender.
    */
  def q36bMinhashExact(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidatePairsMd5(
        t(s, dir, "documents").where(col("doc_id") % 3 === 0),
        "doc_id", "text")
      .orderBy("id_a", "id_b")

  def q37SimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashCandidatePairs(t(s, dir, "documents"), "doc_id", "text")
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")

  /** Exact SimHash anchor (what q38 is to MinHash): block-bucketed
    * candidates over the MD5-hash signature, post-filtered to Hamming ≤ 3,
    * must hash-match DuckDB's exact all-pairs recomputation of the SAME
    * signature — covering tokenize→shingle→per-bit-vote→sign AND the
    * 4-block pigeonhole recall in one gate.
    */
  def q37bSimhashExact(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashCandidatePairsMd5(t(s, dir, "documents"), "doc_id", "text")
      .where(col("hamming") <= 3)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      .orderBy("id_a", "id_b")

  def q38JaccardDups(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val cands = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
    Dedup.jaccardVerify(docs, cands, "doc_id", "text", n = 3, threshold = 0.5)
      .withColumn("jaccard", round(col("jaccard"), 4))
      .orderBy("id_a", "id_b")
  }

  // ---- similarity search ---------------------------------------------------

  def q39EmbeddingTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    Similarity.bruteForceTopK(emb, emb.where(col("vec_id") <= 20), "vec_id",
        "embedding", k = 3)
      .select(col("query_id"), col("nbr_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos_r"))
  }

  def q39bEmbeddingNorms(s: SparkSession, dir: String): DataFrame =
    Tables.loadEmbeddings(s, dir).select(col("vec_id"),
      round(Vectors.norm(col("embedding")), 6).as("l2_norm"))

  def q39cLshTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    // (planes, tables) solved for 85% recall of pairs at cosine >= 0.2 —
    // resolves to (3, 10); SimilaritySpec asserts measured recall tracks
    // the formula's prediction.
    Similarity.lshTopKForRecall(emb, emb.where(col("vec_id") <= 20), "vec_id",
        "embedding", dim = 64, k = 3, targetRecall = 0.85, cosineThreshold = 0.2)
      .select(col("query_id"), col("nbr_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos_r"))
  }

  /** IVF top-k through the Lloyd-iterated quantizer with `nprobe =
    * numCells`: every cell probed → EXACTLY brute force (each corpus vector
    * is in one cell), so the full IVF machinery — Lloyd centroids, cell
    * assignment, probe join, scoring — is oracle-checked against the exact
    * SQL. Production recall at nprobe ≪ numCells is spec-asserted
    * (SimilaritySpec) since a partial probe has no SQL equivalent.
    */
  def q39dIvfTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    Similarity.ivfTopK(emb, emb.where(col("vec_id") <= 20), "vec_id",
        "embedding", k = 3, numCells = 8, nprobe = 8)
      .select(col("query_id"), col("nbr_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos_r"))
  }

  /** PQ top-k with an exhaustive refine pool: `refine·k ≥ corpus size`
    * makes the ADC candidate stage a total preorder, so the exact re-rank
    * reproduces brute force EXACTLY and the whole PQ machinery — subspace
    * Lloyd codebooks, code assignment, per-query lookup table, ADC scoring,
    * candidate window, re-rank join — is oracle-checked against the same
    * SQL as q39. Production sets a small constant refine (q95b); its recall
    * is spec-measured (SimilaritySpec), as with LSH/IVF.
    */
  def q95PqTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    // refine·k = 30M ≥ any gate corpus → the pool is exhaustive WITHOUT
    // paying a count job; the window keeps every candidate either way.
    // iters=1: with an exhaustive pool the ADC stage only ORDERS candidates,
    // so the result is exact for ANY codebook — don't pay extra Lloyd rounds.
    // Train-once / search-many: the codebook artifact is session-cached
    val books = annModel[DataFrame](s, dir, "pq:16:16:i1")(
      Similarity.pqCodebooks(emb, "vec_id", "embedding", dim = 64,
        numSub = 16, ksub = 16, iters = 1))
    Similarity.pqSearch(emb, emb.where(col("vec_id") <= 20), "vec_id",
        "embedding", dim = 64, k = 3, codebooks = books, refine = 10000000)
      .select(col("query_id"), col("nbr_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos_r"))
  }

  /** Production-config PQ: 16 subspaces × 16 cells (64 floats → 16 codes),
    * constant refine pool. Rows-only; recall floor spec-asserted.
    */
  def q95bPqTopkProd(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    val books = annModel[DataFrame](s, dir, "pq:16:16:i3")(
      Similarity.pqCodebooks(emb, "vec_id", "embedding", dim = 64,
        numSub = 16, ksub = 16))
    Similarity.pqSearch(emb, emb.where(col("vec_id") <= 20), "vec_id",
        "embedding", dim = 64, k = 3, codebooks = books, refine = 8)
      .select(col("query_id"), col("nbr_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos_r"))
  }

  /** IVF+PQ (coarse cells + residual product codes) in its oracle
    * configuration: every cell probed and an exhaustive refine pool make
    * the two-level pipeline exactly brute force — coarse assignment,
    * residual encoding, per-cell ADC tables, and re-rank all hash-checked.
    * Pruned-probe recall is spec-measured (SimilaritySpec).
    */
  def q96IvfPqTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    // constant exhaustive refine bound — see q95's note
    val model = annModel[Similarity.IvfPqModel](s, dir, "ivfpq:8:8:16:i1")(
      Similarity.ivfPqTrain(emb, "vec_id", "embedding", dim = 64,
        numCells = 8, numSub = 8, ksub = 16, iters = 1))
    Similarity.ivfPqSearch(emb, emb.where(col("vec_id") <= 20), "vec_id",
        "embedding", dim = 64, k = 3, model, nprobe = 8, refine = 10000000)
      .select(col("query_id"), col("nbr_id"), col("rank").cast("long").as("rank"),
        round(col("cos"), 6).as("cos_r"))
  }

  /** 5-minute regular-grid resample of per-user event values with forward
    * fill — bins emitted as epoch seconds so the DuckDB oracle compares
    * integers, not timezone-sensitive timestamp renderings.
    */
  def q97ResampleFfill(s: SparkSession, dir: String): DataFrame =
    Timeseries.resampleFfill(Tables.loadEvents(s, dir), "user_id", "ts",
        "value", stepSeconds = 300L)
      .select(col("user_id"), col("bin").cast("long").as("bin_sec"),
        col("n"), round(col("v"), 6).as("v_r"),
        round(col("v_ffill"), 6).as("v_ffill_r"))

  /** Semantic clustering profile: every embedding assigned scan-side to
    * its nearest seed exemplar (the first 8 vectors — literal centroids,
    * driver-bounded), then per-cluster size and distance stats. The
    * seed-anchored assignment is exactly SQL-expressible, so the whole
    * NearestCells scan-side path (double accumulation, sqrt, (dist, cell)
    * tie order) is hash-checked; Lloyd-TRAINED clustering reuses this exact
    * assignment machinery and is spec-covered (SimilaritySpec).
    */
  def q98SemanticClusters(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    val seeds = emb.where(col("vec_id") <= 8)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0).toInt -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .sortBy(_._1)
    Similarity.assignToCentroids(emb, "vec_id", "embedding",
        seeds.map(_._1).toSeq, seeds.map(_._2).toSeq)
      .groupBy("cell").agg(count(lit(1)).as("n"),
        round(min("dist"), 6).as("min_dist"),
        round(max("dist"), 6).as("max_dist"),
        round(avg("dist"), 4).as("avg_dist_r"))
  }

  /** Tokenizer-vocabulary construction: corpus-wide token frequencies,
    * top-100 by (count desc, token). Partial map-side aggregation shrinks
    * the shuffle to the vocabulary; the top-100 is a
    * TakeOrderedAndProject, never a global sort.
    */
  def q99VocabTopn(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(100)

  /** Count–min-sketch point frequencies vs exact, for the top-20 tokens:
    * one constant-size mergeable sketch pass replaces a full group-by when
    * only point probes are needed. Rows-only (estimates are
    * sketch-internal); SketchSpec asserts the CM error bound
    * true ≤ est ≤ true + eps·N on every probe.
    */
  def q99bCmsCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .where(length(col("token")) > 0)
    val top = toks.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(20).collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val est = Sketches.cmsTokenCounts(toks, "token", top.map(_._1).toSeq).toMap
    top.toSeq.map { case (tk, n) => (tk, n, est(tk)) }
      .toDF("token", "n_exact", "n_cms")
  }

  /** Source rebalancing: cap every source at 80 documents
    * ([[operators.Splits.balancedDownsample]]) so no crawl dominates the
    * mixture, then profile what survived. The kept subset is a pure
    * function of the data (md5 order), so the oracle reproduces it
    * exactly.
    */
  def q100BalanceSources(s: SparkSession, dir: String): DataFrame =
    operators.Splits.balancedDownsample(t(s, dir, "documents"),
        Seq("source"), 80L, "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars").cast("long")).as("sum_chars"))

  /** Snapshot reconciliation as a gate query ([[sources.Snapshot.diff]]):
    * per-key added/removed/changed/unchanged between two table versions in
    * ONE full-outer join — Spark compares the value tuple as a single
    * 64-bit hash (only key + hash shuffle, O(1) per row for wide tables);
    * the oracle compares the columns directly, so the hash shortcut is
    * checked for classification equivalence.
    */
  def q101SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val before = docs.where(col("doc_id") % 3 =!= 0)
    val after = docs.where(col("doc_id") % 2 =!= 0)
      .withColumn("lang",
        when(col("doc_id") % 7 === 0, lit("xx")).otherwise(col("lang")))
    graft.sources.Snapshot.diff(before, after, Seq("doc_id"))
  }

  /** BPE tokenizer training ([[functions.Text.bpeMerges]]): ONE
    * vocabulary-sized aggregate over the corpus, then a driver loop over
    * the bounded word-frequency table. Rows-only (the merge loop has no
    * SQL equivalent); FunctionsSpec hand-checks the classic merge sequence
    * and the partition property.
    */
  def q102BpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Text.bpeMerges(t(s, dir, "documents"), "text", numMerges = 50)
      .zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r, l + r) }
      .toDF("rank", "left", "right", "merged")
  }

  /** BPE segmentation at corpus scale: the trained merge table rides into
    * a scan-side expression ([[functions.expressions.BpeSegment]]) — no
    * shuffle, no UDF; per-doc subword/word counts profile the compression.
    */
  def q103BpeSegment(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val merges = Text.bpeMerges(docs, "text", numMerges = 30)
    docs.select(col("doc_id"),
      size(Text.bpeSegment(col("text"), merges)).cast("long").as("n_subwords"),
      size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_words"))
  }

  /** Training-loop EXACT anchor for q102 (the one family with no
    * hash-checked sibling until round 10): the first 5 BPE merges,
    * matched against a DuckDB oracle that replays the same algorithm with
    * the merge loop UNROLLED into five explicit CTE stages — pair counts
    * via a list comprehension over separator-joined symbols, argmax under
    * the identical (count desc, left, right) tie-break, re-segmentation
    * via left-to-right non-overlapping `replace` (exactly BPE's
    * single-pass application: a merged symbol can never re-match its own
    * pair, so scan-forward replace == the merge loop). ASCII corpus ⇒
    * char split == code-point split, and the 0x1F separator never occurs
    * in text.
    */
  def q102bBpeTrainExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Text.bpeMerges(t(s, dir, "documents"), "text", numMerges = 5)
      .zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r, l + r) }
      .toDF("rank", "left", "right", "merged")
  }

  /** Segmentation EXACT anchor for q103: corpus-wide [[BpeSegment]] with a
    * FIXED literal merge table (chained multi-char merges included, so the
    * rank-order replay is genuinely exercised), per-doc subword count and
    * md5 of the space-joined segmentation. The oracle replays it with
    * chained `replace` over unit-separator-joined symbols (words joined by
    * the record separator so merges can't cross word boundaries).
    */
  def q103bBpeSegmentExact(s: SparkSession, dir: String): DataFrame = {
    val merges = Seq("e" -> "r", "i" -> "n", "t" -> "h", "th" -> "e",
      "o" -> "n", "a" -> "n", "an" -> "d", "er" -> "s")
    t(s, dir, "documents")
      .select(col("doc_id"), Text.bpeSegment(col("text"), merges).as("__seg"))
      .select(col("doc_id"),
        size(col("__seg")).cast("long").as("n_subwords"),
        md5(array_join(col("__seg"), " ")).as("seg_hash"))
  }

  /** Contrastive negative pairs ([[operators.Splits.negativePairs]]): 5
    * arithmetic negatives per anchor (never the anchor itself, zero
    * shuffle to generate), scored by exact cosine after one join. The gate
    * uses a modulo mixer both engines compute identically (the q64
    * pattern); the operator's default is xxhash64 (SplitsSpec).
    */
  def q104NegativePairs(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    val n = emb.count()
    val pairs = operators.Splits.negativePairs(
      emb.where(col("vec_id") <= 20), "vec_id", k = 5, n = n,
      mix = (id, slot) => id * lit(2654435761L) + slot * lit(40503L))
    pairs
      .join(emb.select(col("vec_id").as("anchor_id"), col("embedding").as("av")),
        Seq("anchor_id"))
      .join(emb.select(col("vec_id").as("neg_id"), col("embedding").as("nv")),
        Seq("neg_id"))
      .select(col("anchor_id"), col("slot"), col("neg_id"),
        round(Vectors.cosine(col("av"), col("nv")), 6).as("cos_r"))
  }

  /** Hard-negative mining: for each anchor, the cosine ranks m+1..m+k —
    * near misses that are similar but NOT top-m neighbors, the standard
    * contrastive-curriculum slice. Same broadcast-query / corpus-unshuffled
    * plan as q39; the rank window just takes a different band.
    */
  def q105HardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    val (m, k) = (3, 5)
    Similarity.bruteForceTopK(emb, emb.where(col("vec_id") <= 20), "vec_id",
        "embedding", k = m + k)
      .where(col("rank") > m)
      .select(col("query_id").as("anchor_id"), col("nbr_id").as("hard_neg_id"),
        col("rank").cast("long").as("rank"), round(col("cos"), 6).as("cos_r"))
  }

  /** Unigram KL divergence D(p‖q) between each source's token distribution
    * and the corpus-wide one — the data-mixing diagnostic (which crawls
    * skew the token distribution, and by how much). Add-one smoothing over
    * the corpus vocabulary keeps q > 0 without dropping source-absent
    * tokens. Plan: one token explode feeding both frequency tables. The
    * corpus and per-source-total frames grow with vocabulary / source
    * count (heaps law on web text — billions of distinct tokens at
    * 100 TB), so neither carries a broadcast hint: AQE promotes them when
    * the runtime stats say they fit. Only the one-row vocab scalar is
    * hinted.
    */
  def q106UnigramKl(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("source"), explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
    val bySource = toks.groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val corpus = toks.groupBy("tok").agg(count(lit(1)).as("cc"))
    val vocab = corpus.agg(count(lit(1)).as("v"),
      sum("cc").cast("double").as("n"))
    val srcTotals = bySource.groupBy("source")
      .agg(sum("c").cast("double").as("sn"))
    bySource.join(corpus, Seq("tok"))
      .join(srcTotals, Seq("source"))
      .crossJoin(broadcast(vocab))
      .select(col("source"),
        (col("c") / col("sn") *
          log((col("c") / col("sn")) /
            ((col("cc") + lit(1.0)) / (col("n") + col("v"))))).as("term"))
      .groupBy("source").agg(round(sum("term"), 6).as("kl"))
  }

  /** Diversity sampling — the composed pipeline: assign every embedding to
    * its nearest seed exemplar (q98's scan-side machinery), then cap each
    * cluster at 20 rows in deterministic md5 order (q100's rebalancer).
    * Semantic balance instead of source balance: no cluster dominates the
    * sample. Both stages reuse their individually-proven oracle recipes.
    */
  def q107DiverseSample(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    val seeds = emb.where(col("vec_id") <= 8)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0).toInt -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .sortBy(_._1)
    val assigned = Similarity.assignToCentroids(emb, "vec_id", "embedding",
      seeds.map(_._1).toSeq, seeds.map(_._2).toSeq)
    operators.Splits.balancedDownsample(assigned.select("vec_id", "cell"),
        Seq("cell"), 20L, "vec_id")
      .groupBy("cell").agg(count(lit(1)).as("n_kept"),
        sum("vec_id").as("sum_ids"))
  }

  /** DSIR importance weights ([[operators.Quality.importanceWeights]]):
    * hashed-unigram log-likelihood ratio of each candidate doc against a
    * target domain (sources src0/src1), md5-prefix bucketing (256 buckets)
    * so DuckDB reproduces the hash exactly. The Gumbel resample step is
    * spec-tested (QualitySpec) — selection is a top-k over these weights.
    */
  def q108DsirWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val target = docs.where(col("source").isin("src0", "src1"))
    val cands = docs.where(!col("source").isin("src0", "src1"))
    operators.Quality.importanceWeights(cands, target, "doc_id", "text",
        buckets = 256, alpha = 1.0, bucket = Some(operators.Quality.md5Bucket))
      .select(col("doc_id"), round(col("weight"), 4).as("weight"),
        col("n_toks").cast("long").as("n_toks"))
      .orderBy("doc_id")
  }

  /** Unicode normalization + accent folding ([[functions.Text
    * .normalizeUnicode]] / [[functions.Text.foldAccents]]): decomposed
    * sequences are synthesized by suffixing every `a` with a combining
    * acute (U+0301), then NFC must re-compose them (byte-level change,
    * hash-checked) and folding must strip them back to the original text.
    * Oracle: DuckDB `nfc_normalize` / `strip_accents`.
    */
  def q109UnicodeNorm(s: SparkSession, dir: String): DataFrame = {
    val troubled = regexp_replace(col("text"), "a", "á")
    t(s, dir, "documents")
      .select(col("doc_id"),
        md5(Text.normalizeUnicode(troubled)).as("nfc_hash"),
        md5(Text.foldAccents(troubled)).as("folded_hash"),
        (Text.foldAccents(troubled) === col("text")).as("refolds"))
      .orderBy("doc_id")
  }

  /** Bigram stupid-backoff NLL ([[operators.Quality.bigramLogProb]]):
    * perplexity-proxy scoring of the WHOLE corpus against a 5-source
    * reference slice — unseen bigrams exercise the smoothed unigram
    * backoff path, not just the happy path.
    */
  def q110BigramNll(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val ref = docs.where(col("source")
      .isin("src0", "src1", "src2", "src3", "src4"))
    operators.Quality.bigramLogProb(docs, ref, "doc_id", "text")
      .select(col("doc_id"), round(col("nll_bg"), 4).as("nll_bg"),
        col("n_bigrams").cast("long").as("n_bigrams"))
      .orderBy("doc_id")
  }

  /** CCNet perplexity tiers ([[operators.Quality.perplexityTiers]]):
    * q110's NLL (same src0–4 reference) cut into head/middle/tail
    * tertiles. Thresholds interpolate over 4-dp-rounded NLLs, so the
    * cross-engine comparison is stable away from exact threshold hits.
    */
  def q126PerplexityTiers(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val ref = docs.where(col("source")
      .isin("src0", "src1", "src2", "src3", "src4"))
    operators.Quality.perplexityTiers(docs, ref, "doc_id", "text")
      .select(col("doc_id"), col("nll_bg"),
        col("bucket").cast("int").as("tier_idx"), col("tier"))
      .orderBy("doc_id")
  }

  /** Tokenizer fertility ([[operators.Analytics.tokenizerFertility]]):
    * GPT-2-style pre-token counts per language. The synthetic corpus is
    * space-separated ASCII words, so fertility degenerates to 1.0 here —
    * the oracle still pins the full count/ratio arithmetic; the per-script
    * contrast (CJK runs, contractions) is spec-covered in FunctionsSpec.
    */
  def q127TokenizerFertility(s: SparkSession, dir: String): DataFrame =
    operators.Analytics.tokenizerFertility(
        t(s, dir, "documents"), "lang", "text")
      .orderBy("lang")

  /** Repeat allocation ([[operators.Analytics.repeatAllocation]]): budget
    * = 1.2× the corpus's unique tokens, so the cap-1 web tier binds at
    * every sf, the cap-2 tier binds or rides λ depending on the mass
    * split, and the cap-4 tier absorbs the remainder — the full waterfill
    * path, deterministically (integer token sums; cap-sorted scan).
    */
  def q128RepeatAllocation(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val utot = docs
      .agg(sum(functions.Text.tokenCount(col("text"))).cast("long"))
      .head.getLong(0)
    val budget = (utot.toDouble * 1.2).floor.toLong
    operators.Analytics.repeatAllocation(docs, "source",
        functions.Text.tokenCount(col("text")), budget,
        Map("src0" -> 4.0, "src1" -> 4.0, "src2" -> 2.0, "src3" -> 2.0),
        defaultCap = 1.0)
      .orderBy("source")
  }

  /** Reference-scale bikeshare E2E ([[pipeline.BikeshareGen.runAll]]):
    * the 5-stage pipeline + all 22 analytical queries over the generated
    * reference-shape corpus. Output is one row per query (cardinality +
    * rounded control total) PLUS five `_inv_*` invariant-golden rows
    * (conservation residuals that must read exactly 0.00, and the
    * duration/payment totals + member share pinning BASELINE.md's golden
    * anchors at this scale) — so the gate hash pins values, not just
    * shape. Value semantics are pinned by the fixture goldens
    * (BikesharePipelineSpec) and the conservation invariants by
    * BikeshareScaleSpec. Rows-only in the driver gate: the corpus is
    * generated, not a parquet table DuckDB can see.
    *
    * Bench posture (VERDICT r7/r8 item): the FULL reference scale (1.0 =
    * 4.58 M trips, the reference's own row counts) runs in
    * BikeshareScaleSpec, where the conservation invariants need it; the
    * bench dir (sf0.1) runs scale 0.2 so one e2e anchor doesn't dominate
    * the ~60 s sf0.1 envelope — the 22 query plans are scale-invariant
    * (broadcast dims + partial aggs; PLANS.md), so 0.2 times the same
    * plans the spec proves at 1.0. Smaller gate dirs scale down further
    * so Verify stays fast.
    */
  def q129BikeshareScale(s: SparkSession, dir: String): DataFrame =
    pipeline.BikeshareGen.runAll(s, bikeshareScale(dir)).orderBy("query")

  /** The bikeshare corpus scale a given sf dir maps to (shared by q129
    * and Bench's setup phase so both warm the SAME warehouse).
    */
  def bikeshareScale(dir: String): Double =
    if (dir.contains("sf0.001")) 0.01
    else if (dir.contains("sf0.01")) 0.1
    else 0.2

  /** Pre-build q129's warehouse (disk parquet + pinned enrich spine) so
    * a timed q129 measures the 22 reference queries, not the one-time
    * corpus build — Bench calls this in its setup phase and reports the
    * build seconds separately (a cold `target/` otherwise reads as a
    * ~3x q129 "regression" every fresh-checkout round).
    */
  def warmBikeshareWarehouse(s: SparkSession, dir: String): Unit = {
    pipeline.BikeshareGen.warehouseCached(s, bikeshareScale(dir))
    ()
  }

  /** Character entropy ([[operators.Quality.charEntropy]]): the
    * gibberish/encoding-damage band check over every document.
    */
  def q111CharEntropy(s: SparkSession, dir: String): DataFrame =
    operators.Quality.charEntropy(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), round(col("entropy"), 4).as("entropy"),
        col("n_chars"))
      .orderBy("doc_id")

  /** Pack materialization ([[operators.Splits.materializePacks]]): q79's
    * assignment turned into actual training sequences — member texts
    * concatenated in doc order; the gate hashes each sequence.
    */
  def q112PackConcat(s: SparkSession, dir: String): DataFrame =
    operators.Splits.materializePacks(
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"),
            Text.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", "text", budget = 500L,
        partitionCols = Seq("lang"))
      .select(col("lang"), col("pack_id"), col("n_docs").cast("long").as("n_docs"),
        col("sum_tokens").cast("long").as("sum_tokens"),
        md5(col("seq_text")).as("seq_hash"))
      .orderBy("lang", "pack_id")

  /** Curriculum buckets ([[operators.Splits.quantileBuckets]]): quartile
    * difficulty tiers over doc length — exact-percentile thresholds are
    * dyadic-fraction interpolations over integers, so Spark and DuckDB
    * compute bit-identical cutoffs.
    */
  def q113Curriculum(s: SparkSession, dir: String): DataFrame =
    operators.Splits.quantileBuckets(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "n_chars", numBuckets = 4)
      .select(col("doc_id"), col("bucket"))
      .orderBy("doc_id")

  /** Source signature keywords: q63's TF-IDF machinery at the SOURCE
    * grain (each source's text = one pseudo-doc; df = sources containing
    * the term) → top-5 distinguishing terms per source. The corpus-triage
    * view: what makes src7 different. Ranking is over the ROUNDED score
    * (q63's rule — unrounded ln can differ in the last ulp across
    * engines), term-tiebroken.
    */
  def q114SourceKeywords(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val terms = docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
    // same pin rationale as q63: tf feeds both the join and the df agg
    val tf = terms.groupBy("source", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // df is vocabulary-sized (heaps law) — no hint; AQE decides. nSrc is a
    // one-row scalar, the only legitimate broadcast here.
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nSrc = docs.agg(countDistinct("source").as("n_src"))
    val scored = tf.join(df, "term").crossJoin(broadcast(nSrc))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_src") + 1) / (col("df") + lit(1.0))), 6))
    val w = Window.partitionBy("source")
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select(col("source"), col("rn").cast("long").as("rank"),
        col("term"), col("tfidf"))
      .orderBy("source", "rank")
  }

  /** Dedup survivor selection ([[operators.Dedup.keepBestTransitiveVerified]]):
    * q77's LSH→verify→CC clusters, but each family keeps its LONGEST
    * member (n_chars, tie → min id) instead of the arbitrary min-id.
    * Same parameters as q77, whose LSH recall is exact on this data, so
    * the recursive-CTE oracle is ground truth here too.
    */
  def q115DedupSurvivors(s: SparkSession, dir: String): DataFrame =
    Dedup.keepBestTransitiveVerified(
        t(s, dir, "documents").select(col("doc_id"), col("text"), col("n_chars")),
        "doc_id", "text", "n_chars", n = 3, threshold = 0.5)
      .select(col("doc_id"), col("n_dups").cast("long").as("n_dups"))
      .orderBy("doc_id")

  /** Exact containment pairs ([[operators.Dedup.containmentPairsExact]])
    * on a bounded slice — the quote/subset detector Jaccard can't see
    * (asymmetric |A∩B|/|A|); chunk dedup (q50) is the scale sibling.
    */
  def q116Containment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairsExact(
        t(s, dir, "documents").where(col("doc_id") < 80),
        "doc_id", "text", n = 3, threshold = 0.5)
      .orderBy("id_a", "id_b")

  /** Materialized mixture sample ([[operators.Splits.mixtureSample]]):
    * q90's target language shares executed — the kept subset whose token
    * mass matches the mixture, md5-order membership.
    */
  def q117MixtureSample(s: SparkSession, dir: String): DataFrame =
    operators.Splits.mixtureSample(
        t(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            Text.tokenCount(col("text")).cast("long").as("n_tokens")),
        "lang", col("n_tokens"),
        Map("en" -> 0.3, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.2, "zh" -> 0.1),
        "doc_id")
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .orderBy("doc_id")

  /** SemDeDup ([[operators.Similarity.semDedup]]): cluster-confined
    * semantic dedup — q98's seed assignment, cosine pairs within cells
    * only, q77's transitive min-id keep. Oracle rebuilds the identical
    * pipeline from its three proven pieces.
    */
  def q118SemDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    val seeds = emb.where(col("vec_id") <= 8)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0).toInt -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .sortBy(_._1)
    Similarity.semDedup(emb, "vec_id", "embedding",
        seeds.map(_._1).toSeq, seeds.map(_._2).toSeq, threshold = 0.3)
      .select(col("vec_id"))
      .orderBy("vec_id")
  }

  /** Prototypicality scores (the D4/SSL-prototypes selection signal):
    * per-cluster percent-rank of the distance to the assigned centroid —
    * 1.0 = the cell's most central (prototypical) vector, 0.0 = its
    * farthest outlier. Downstream selection keeps a band (drop exact
    * prototypes AND far outliers). Cell-keyed window; input is the
    * assignment, never pairwise.
    */
  def q119Prototypicality(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    val seeds = emb.where(col("vec_id") <= 8)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0).toInt -> r.getSeq[Float](1).map(_.toDouble).toSeq)
      .sortBy(_._1)
    val w = Window.partitionBy("cell").orderBy(col("dist").desc, col("vec_id"))
    Similarity.assignToCentroids(emb, "vec_id", "embedding",
        seeds.map(_._1).toSeq, seeds.map(_._2).toSeq)
      .withColumn("proto", round(percent_rank().over(w), 6))
      .select(col("vec_id"), col("cell"), round(col("dist"), 4).as("dist_r"),
        col("proto"))
      .orderBy("vec_id")
  }

  /** Padding waste by length bucket — the training-efficiency analytic
    * that motivates packing (q79/q112): batch docs by 64-token buckets
    * (dynamic batching) and report the tokens burned as pad vs a packed
    * layout's zero waste. Pure integer bucket arithmetic + one agg.
    */
  def q120PaddingWaste(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(Text.tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("bucket_len", ((col("n_tok") + 63L) / 64L).cast("long") * 64L)
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"))
      .select(col("bucket_len"), col("n_docs"),
        col("sum_tokens").cast("long").as("sum_tokens"),
        (col("bucket_len") * col("n_docs") - col("sum_tokens")).cast("long")
          .as("pad_tokens"),
        round(when(col("bucket_len") === 0, 0.0)
          .otherwise((col("bucket_len") * col("n_docs") - col("sum_tokens"))
            .cast("double") / (col("bucket_len") * col("n_docs"))), 6)
          .as("waste_frac"))
      .orderBy("bucket_len")

  /** Temperature mixture ([[operators.Analytics.temperatureAllocation]]):
    * τ = 0.7 language allocation out of a 1M-token budget — low-resource
    * languages up-weighted relative to their natural share.
    */
  def q121TemperatureMix(s: SparkSession, dir: String): DataFrame =
    operators.Analytics.temperatureAllocation(
        t(s, dir, "documents")
          .select(col("lang"), Text.tokenCount(col("text")).cast("long").as("n_tok")),
        "lang", col("n_tok"), temperature = 0.7, budgetTokens = 1000000L)
      .select(col("lang"), col("n_tokens"),
        round(col("share"), 6).as("share"),
        round(col("temp_share"), 6).as("temp_share"),
        col("alloc_tokens"))
      .orderBy("lang")

  /** Gopher quality rules ([[operators.Quality.gopherRules]]): per-doc
    * signals + per-rule pass flags over the corpus (minWords lowered to
    * 5 — the synthetic docs are short).
    */
  def q122GopherRules(s: SparkSession, dir: String): DataFrame =
    operators.Quality.gopherRules(t(s, dir, "documents"), "doc_id", "text",
        minWords = 5)
      .select(col("doc_id"), col("n_words"),
        round(col("mean_wlen"), 4).as("mean_wlen"),
        round(col("sym_ratio"), 6).as("sym_ratio"),
        col("stop_hits"), col("ok_words"), col("ok_wlen"), col("ok_sym"),
        col("ok_stop"), col("passes"))
      .orderBy("doc_id")

  /** Sentence chunking ([[operators.Splits.sentenceChunks]]): 3-sentence
    * windows, stride 2, over synthesized multi-sentence docs (the corpus
    * text is single-sentence, so sentences are manufactured by replacing
    * every " the " with ". The " — deterministic in both engines).
    */
  def q123SentenceChunks(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        regexp_replace(col("text"), " the ", ". The ").as("text"))
    operators.Splits.sentenceChunks(docs, "doc_id", "text",
        window = 3, stride = 2)
      .select(col("doc_id"), col("chunk_idx"), col("n_sentences"),
        md5(col("chunk_text")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Boilerplate removal ([[operators.Quality.boilerplateFilter]]): a
    * shared footer is appended to every doc (manufactured boilerplate —
    * deterministic in both engines), sentences manufactured as in q123;
    * the footer sentences recur in every doc and must be dropped, the
    * organic sentences survive in order.
    */
  def q124Boilerplate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        regexp_replace(
          concat(col("text"),
            lit(" Accept all cookies to continue. Subscribe to the newsletter.")),
          " the ", ". The ").as("text"))
    operators.Quality.boilerplateFilter(docs, "doc_id", "text", minDocs = 3)
      .select(col("doc_id"), md5(col("text_clean")).as("clean_hash"),
        col("n_kept"), col("n_dropped"))
      .orderBy("doc_id")
  }

  /** C4 line rules ([[operators.Quality.c4Clean]]): lines manufactured by
    * breaking at " the " (each line then ends with '.', except the doc's
    * final line which keeps the corpus text's own ending — so the
    * terminal-punctuation rule genuinely fires), 5-word minimum.
    */
  def q125C4Clean(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        regexp_replace(col("text"), " the ", ".\nThe ").as("text"))
    operators.Quality.c4Clean(docs, "doc_id", "text", minLineWords = 5)
      .select(col("doc_id"), md5(col("text_clean")).as("clean_hash"),
        col("n_kept"), col("n_lines"), col("has_lorem"), col("has_brace"),
        col("passes"))
      .orderBy("doc_id")
  }

  // ---- events: batch mirrors of the streaming surface ----------------------

  def q40EventsHourly(s: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  def q41Sessionize(s: SparkSession, dir: String): DataFrame =
    Sessionize.perUserStats(Tables.loadEvents(s, dir), "user_id", "ts", "event_id", 1800)
      .select(col("user_id"), col("n_sessions").cast("long").as("n_sessions"),
        col("n_events"))

  // ---- multimodal plumbing -------------------------------------------------

  def q42BinaryMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.describe(Multimodal.fromText(t(s, dir, "documents"), "doc_id", "text"))
      .select(col("media_id"), col("modality"),
        col("n_bytes").cast("long").as("n_bytes"))

  /** Conform-then-aggregate over the projection the CSV source declares
    * (nb:250-264 semantics), READ-ONLY: gate queries never write (the
    * gate runs repeatedly and must be side-effect-free). The actual CSV
    * write → declared-schema read → parse+cast round trip lives in
    * CsvRoundtripSpec, which asserts the CSV path reproduces this exact
    * aggregate.
    */
  def q44ConformAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))

  /** Composed corpus curation (annotate → filter → two-tier dedup). */
  def q45CorpusPipeline(s: SparkSession, dir: String): DataFrame =
    operators.CorpusPipeline.curate(t(s, dir, "documents"))
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"),
        round(col("quality"), 4).as("quality"))
      .orderBy("doc_id")

  /** The curation pipeline with the near-dup tier swapped for exact
    * fingerprint dedup ([[operators.CorpusPipeline.curateExact]]) — every
    * stage (annotate → quality/lang filter → normalized dedup → select) is
    * SQL-expressible, so the COMPOSITION is hash-checked end-to-end, not
    * just the stages; q45 keeps the LSH tier whose recall gates via
    * q38/q77.
    */
  def q45bCorpusPipelineExact(s: SparkSession, dir: String): DataFrame =
    operators.CorpusPipeline.curateExact(t(s, dir, "documents"))
      .select(col("doc_id"), col("lang_pred"),
        col("n_tokens").cast("long").as("n_tokens"),
        round(col("quality"), 4).as("quality"))
      .orderBy("doc_id")

  /** As-of join (operator Spark lacks; composed union+window — see
    * [[operators.Joins.asOfJoin]]): each click matched to the user's most
    * recent view at or before it.
    */
  def q46AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("event_id").as("view_id"))
      .withColumnRenamed("ts", "vts")
    operators.Joins.asOfJoin(clicks, views, "user_id", "ts", "vts",
        Seq("view_id", "vts"), asOfPrefix = "")
      .select(col("click_id"), col("user_id"), col("view_id"),
        (col("ts").cast("long") - col("vts").cast("long")).as("lag_sec"))
  }

  /** Salted-join correctness in the gate: same aggregate as q08 but through
    * [[operators.Joins.saltedJoin]] — the oracle is the plain join, so the
    * salt/scatter/gather must be value-transparent.
    */
  def q47SaltedJoin(s: SparkSession, dir: String): DataFrame =
    operators.Joins.saltedJoin(
        t(s, dir, "orders").withColumnRenamed("o_custkey", "custkey"),
        t(s, dir, "customer").withColumnRenamed("c_custkey", "custkey"),
        "custkey", salt = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total_price"))

  /** JSON column parsing: structured `from_json` over the events `props`
    * payload (codegen'd Jackson parse scan-side), aggregated per type.
    */
  def q48JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(s, dir)
      .withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG")).getField("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))

  /** Corpus-level content overlap via per-source MinHash union sketches,
    * on the MD5 hash family ([[operators.Dedup.groupMinhashSimilarityMd5]])
    * so DuckDB replays every coordinate (lexicographic min of
    * `md5(i:shingle)` hex over the group's shingle union — the q36b trick
    * lifted to groups) and the gate hash-checks
    * shingle→min→union-agg→pairwise-agreement end to end. The xxhash
    * production sketch keeps its exact-anchor telemetry at q259.
    */
  def q49SourceSimilarity(s: SparkSession, dir: String): DataFrame =
    Dedup.groupMinhashSimilarityMd5(t(s, dir, "documents"), "source", "text")
      .withColumn("est_jaccard", round(col("est_jaccard"), 4))
      .orderBy("group_a", "group_b")

  /** Content-defined chunk dedup: rolling-hash chunk fingerprints → docs
    * sharing chunks (partial-overlap detection MinHash shingles miss).
    */
  def q50ChunkDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.chunkCandidatePairs(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("id_a", "id_b")

  /** Exact chunk-dedup anchor: token-windowed MD5 content-defined cuts
    * DuckDB replays digit-for-digit — chunking, fingerprints, the bounded
    * bucket counting, and the per-pair shared-chunk counts all
    * hash-checked. The byte-rolling production path (q50) keeps its
    * rows-only check.
    */
  def q50bChunkDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.chunkCandidatePairsMd5(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("id_a", "id_b")

  /** Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`).
    */
  def q51Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy("l_returnflag").agg(
      round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
      round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"),
      count(lit(1)).as("n"))

  /** approx_percentile (GK sketch) — engine capability; sketch outputs are
    * engine-specific so the gate is rows-only, with a value-tolerance
    * accuracy check against exact `percentile` in QualitySpec.
    */
  def q51bApproxPercentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").groupBy("l_returnflag").agg(
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"),
      expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("ap95"),
      count(lit(1)).as("n"))

  /** Collection aggregates: collect_set (sorted for determinism) and a
    * collect_list-derived measure — the §2.5 list-aggregation surface.
    * The set is emitted as a comma-joined scalar, not an ARRAY column:
    * the driver's pandas-side row sort cannot hash arrays.
    */
  def q80CollectAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(array_join(sort_array(collect_set(col("l_linestatus"))), ",")
          .as("statuses"),
        // count(lit(1)), not size(collect_list(...)): collect_list drops
        // NULLs while the oracle's count(*) counts every row
        count(lit(1)).as("n_rows"),
        size(array_distinct(collect_list(col("l_suppkey")))).cast("long")
          .as("n_supp"))

  /** String-function family: case, substring, concat, regex extract. */
  def q52StringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part").select(
      col("p_partkey"),
      upper(col("p_brand")).as("brand_u"),
      substring(col("p_name"), 1, 8).as("name8"),
      concat_ws("|", col("p_brand"), col("p_type")).as("bt"),
      regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
      length(col("p_name")).cast("long").as("name_len"))

  /** Null-handling family: nullif / coalesce / CASE over nulls. */
  def q53NullHandling(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey"),
      coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"),
      when(nullif(col("o_orderpriority"), col("o_orderpriority")).isNull, 1L)
        .otherwise(0L).as("always_one"))

  /** Window family: lag + ntile per customer. */
  def q54WindowLagNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
      ntile(4).over(w).cast("long").as("tile"))
  }

  /** Pivot (wide aggregation) — oracle is the conditional-agg equivalent. */
  def q55Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(count(lit(1)))
      .na.fill(0L)

  /** posexplode of a real array column (1-based pos to match SQL
    * ordinality).
    */
  def q56Posexplode(s: SparkSession, dir: String): DataFrame =
    Tables.loadEmbeddings(s, dir).where(col("vec_id") <= 3)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos0", "x")))
      .select(col("vec_id"), (col("pos0") + 1).cast("long").as("pos"),
        round(col("x").cast("double"), 6).as("xr"))

  /** Binned range join ([[operators.Joins.rangeJoinBinned]]): events bucketed
    * into fixed-width value bands via equi-join on the bin, not a nested
    * loop. The oracle is the plain inequality join.
    */
  def q57RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val bands = s.range(0, 10).select(col("id").as("band_id"),
      (col("id") * lit(50.0)).as("lo"), ((col("id") + 1) * lit(50.0)).as("hi"))
    operators.Joins.rangeJoinBinned(Tables.loadEvents(s, dir), "value", bands,
        "lo", "hi", binWidth = 50.0)
      .groupBy("band_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
  }

  /** Type-2 SCD build ([[operators.Scd.scd2]]) over the events log: each
    * user's event_type runs become [valid_from, valid_to) intervals.
    * Timestamps truncate to seconds on both sides (ns-precision parquet).
    */
  def q58Scd2(s: SparkSession, dir: String): DataFrame =
    operators.Scd.scd2(
        Tables.loadEvents(s, dir).select("user_id", "ts", "event_id", "event_type"),
        key = "user_id", ts = "ts", attrs = Seq("event_type"),
        tiebreaker = Some("event_id"))
      .select(col("user_id"), col("event_type"),
        date_trunc("second", col("valid_from")).as("valid_from"),
        date_trunc("second", col("valid_to")).as("valid_to"),
        col("is_current"))

  /** GROUPING SETS (partial-rollup shape rollup/cube can't express) via the
    * SQL surface.
    */
  def q59GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    s.sql(
      "SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n, " +
        "round(sum(l_quantity), 2) AS sum_qty FROM lineitem_gs " +
        "GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())")
  }

  /** Array function family over tokenized documents. */
  def q60ArrayFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
        array_contains(col("toks"), "spark").as("has_spark"),
        element_at(sort_array(col("toks")), 1).as("first_tok"))

  /** Date arithmetic family: add_months (month-end clamping), last_day,
    * day offsets, datediff.
    */
  def q61DateArith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_orderkey"),
      add_months(to_date(col("o_orderdate")), 1).as("next_month"),
      last_day(to_date(col("o_orderdate"))).as("month_end"),
      date_add(to_date(col("o_orderdate")), 30).as("plus30"),
      datediff(lit("1998-01-01").cast("date"), to_date(col("o_orderdate")))
        .cast("long").as("days_to_98"))

  /** Epoch round-trip: unix_timestamp (floor-to-second) and the formatted
    * conversion back.
    */
  def q62Unixtime(s: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(s, dir).select(col("event_id"),
      unix_timestamp(col("ts")).as("epoch_s"),
      from_unixtime(unix_timestamp(col("ts"))).as("ts_str"))

  /** TF-IDF top term per document — the classic corpus-weighting pipeline:
    * explode terms once, tf per (doc, term), df per term, smoothed idf,
    * top-1 by score with a term tiebreak. The df side is vocabulary-sized —
    * which on 100 TB web text grows by heaps law into billions of distinct
    * terms, so it carries NO broadcast hint (AQE promotes it when runtime
    * stats fit); only the one-row n_docs scalar is hinted. Ranking orders
    * by the ROUNDED score so the oracle agrees at ties.
    */
  def q63Tfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val terms = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
    // df derives from tf (tf rows are unique per (doc, term), so df = row
    // count per term), and tf is localCheckpoint-pinned: it feeds BOTH the
    // join and the df aggregate, and without the pin each consumer re-runs
    // the corpus explode (column pruning diverges the subtrees, defeating
    // ReuseExchange). On a cluster the pin is a persisted intermediate.
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_docs") + 1) / (col("df") + lit(1.0))), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("doc_id"), col("term").as("top_term"), col("tfidf"))
  }

  /** Deterministic train/val/test split ([[operators.Splits.hashSplit]]).
    * The gate uses a modulo bucketer both engines compute identically; the
    * operator's default is xxhash64 (uniform for clustered keys) —
    * SplitsSpec covers that path.
    */
  def q64HashSplit(s: SparkSession, dir: String): DataFrame =
    operators.Splits.hashSplit(t(s, dir, "documents"), "doc_id",
        Seq("train" -> 80, "val" -> 90, "test" -> 100),
        bucket = k => pmod(k.cast("long"), lit(100)))
      .groupBy("source", "split")
      // exact-integer measure: avg() rounded to 2dp sits on a half-boundary
      // at some scales and Spark/DuckDB disagree at the final ulp
      .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("sum_chars"))

  /** Two-pass min-max normalization + dispersion per group (feature
    * scaling): per-group extrema broadcast back over the fact.
    */
  def q65Normalize(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val mm = li.groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
    li.join(broadcast(mm), "l_returnflag")
      .withColumn("norm",
        (col("l_extendedprice") - col("lo")) / (col("hi") - col("lo")))
      .groupBy("l_returnflag")
      .agg(round(avg("norm"), 4).as("avg_norm"),
        round(stddev_samp("norm"), 4).as("sd_norm"),
        count(lit(1)).as("n"))
  }

  /** Z-order layout statistics, READ-ONLY and oracle-checked: bucket both
    * cluster columns into range quarters (global min/max scalars broadcast
    * back — one extra tiny aggregate, no sketch), Morton-interleave the
    * bucket bits through [[sources.Layout.interleave]] (the exact bit math
    * `zorderWrite` files by), and report per-cell row counts and column
    * extents — the statistic parquet min/max pruning sees. No filesystem
    * write, so the result is environment-independent and the DuckDB oracle
    * replicates the full bucket+interleave arithmetic; the write path
    * (repartitionByRange + per-file extents, sampled quantile cuts) stays
    * covered by LayoutSpec.
    */
  def q66ZorderStats(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val mm = li.agg(min("l_partkey").as("pk_lo"), max("l_partkey").as("pk_hi"),
      min("l_extendedprice").as("pr_lo"), max("l_extendedprice").as("pr_hi"))
    def bucket(v: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column,
               hi: org.apache.spark.sql.Column) =
      (0 until 3).map { k =>
        when(v.cast("double") > lo + lit(k + 1) * ((hi - lo) / lit(4.0)), 1)
          .otherwise(0)
      }.reduce(_ + _)
    li.crossJoin(broadcast(mm))
      .withColumn("zcell", sources.Layout.interleave(Seq(
        bucket(col("l_partkey"), col("pk_lo").cast("double"), col("pk_hi").cast("double")),
        bucket(col("l_extendedprice"), col("pr_lo"), col("pr_hi"))), bitsPerCol = 2))
      .groupBy("zcell")
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("pk_min"), max("l_partkey").as("pk_max"),
        min("l_extendedprice").as("price_min"), max("l_extendedprice").as("price_max"))
  }

  /** Single-pass data-quality audit ([[operators.Quality.audit]]): N checks
    * = one scan + stack unpivot. The oracle is the N-scan UNION ALL.
    */
  def q67DataQuality(s: SparkSession, dir: String): DataFrame =
    operators.Quality.audit(t(s, dir, "orders"), Seq(
      operators.Quality.notNull("o_orderkey"),
      operators.Quality.inRange("o_totalprice", 0.0, 100000.0),
      operators.Quality.inSet("o_orderstatus", Seq("O", "F", "P"))))

  /** Deterministic 10% sample ([[operators.Splits.hashSample]]) — modulo
    * bucketer for cross-engine parity; the xxhash64 default is spec-tested.
    */
  def q68HashSample(s: SparkSession, dir: String): DataFrame =
    operators.Splits.hashSample(t(s, dir, "documents"), "doc_id", 10,
        bucket = k => pmod(k.cast("long"), lit(100)))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("sum_chars"))

  /** The [[plans.BinnedRangeJoinRule]] optimizer rule end-to-end: the join
    * is written as a NAIVE inequality join; with the bin-width conf set the
    * injected rule rewrites it to the binned equi-join (no
    * BroadcastNestedLoopJoin — BinnedRangeJoinRuleSpec asserts the plan).
    * Oracle = the same inequality join, so the rewrite's semantics gate too.
    */
  private val rangeJoinSessions = new graft.SessionCache[SparkSession]

  def q69AutoRangeJoin(s: SparkSession, dir: String): DataFrame = {
    // Cloned session: the bin-width conf arms the rewrite for THIS query
    // only instead of leaking into every later query on the shared session.
    // Cached per parent session — register/arm once, not per call.
    val s2 = rangeJoinSessions.getOrElseUpdate(s, "binned-range-join") {
      val c = s.newSession()
      GraftExtensions.register(c) // extraOptimizations are per-session
      c.conf.set(plans.BinnedRangeJoinRule.BinWidthKey, "50")
      c
    }
    val bands = s2.range(0, 10).select(col("id").as("band_id"),
      (col("id") * lit(50.0)).as("lo"), ((col("id") + 1) * lit(50.0)).as("hi"))
    Tables.loadEvents(s2, dir)
      .join(bands, col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
  }

  /** Fixed-width histogram — the profiling primitive behind quality scoring
    * distributions; one scan, one small shuffle on the bucket id.
    */
  def q70Histogram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(floor(col("l_extendedprice") / 5000.0).cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))

  /** Correlation / covariance aggregates per group (feature diagnostics). */
  def q71Corr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(corr("l_quantity", "l_extendedprice"), 6).as("qty_price_corr"),
        round(covar_samp("l_quantity", "l_discount"), 6).as("qty_disc_covar"),
        count(lit(1)).as("n"))

  /** PII scrubbing over synthesized dirty text (the raw documents are
    * clean, so emails/phones are spliced in from other columns — the oracle
    * must then perform the identical redactions).
    */
  def q72PiiRedact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      Text.redactPii(concat_ws(" ", col("text"),
        concat(col("source"), lit("@example.com")),
        lit("call 555-123-4567 or 555.987.6543"))).as("clean_text"))

  /** Key-skew report ([[operators.Analytics.keySkew]]) — pre-join
    * diagnostics for salt/partition sizing.
    */
  def q73SkewReport(s: SparkSession, dir: String): DataFrame =
    operators.Analytics.keySkew(t(s, dir, "lineitem"), "l_suppkey", 10)

  /** K-fold assignment ([[operators.Splits.kFold]]) — modulo fold for
    * cross-engine parity; xxhash64 default covered by SplitsSpec.
    */
  def q74KFold(s: SparkSession, dir: String): DataFrame =
    operators.Splits.kFold(t(s, dir, "documents"), "doc_id", 5,
        fold = c => c.cast("long"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("sum_chars"))

  /** Exact all-pairs n-gram Jaccard on a bounded subset, top-20 — the
    * deterministic complement to q38's LSH path (LSH recall is
    * probabilistic, so only the exact formulation can be oracle-checked;
    * DuckDB builds identical shingles via a list comprehension). Scores
    * round BEFORE ranking, pair ids break ties.
    */
  def q75JaccardExact(s: SparkSession, dir: String): DataFrame = {
    val sh = t(s, dir, "documents").where(col("doc_id") < 50)
      .select(col("doc_id"),
        array_distinct(Text.shingles(col("text"), 3)).as("sh"))
    val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 4)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(20)
  }

  /** Verified-transitive dedup, oracle-checked end-to-end: LSH candidates →
    * exact-Jaccard verify (≥ 0.5) → connected components over verified
    * pairs → surviving doc ids. The DuckDB oracle computes exact
    * connected components over exact-Jaccard pairs with a recursive CTE, so
    * a hash-match proves BOTH 100% LSH recall at the threshold AND a
    * correct transitive closure ([[operators.Dedup.minhashKeepIdsTransitiveVerified]]).
    */
  def q77TransitiveDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashKeepIdsTransitiveVerified(t(s, dir, "documents"), "doc_id",
        "text", n = 3, threshold = 0.5)
      .orderBy("doc_id")

  /** Train/eval contamination ([[operators.Dedup.contamination]]): docs
    * 100+ are "training data", docs < 20 the "eval benchmark"; flag train
    * docs sharing any 3-gram shingle with the eval set. Eval shingles
    * broadcast; the train side never shuffles.
    */
  def q78Contamination(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.contamination(docs.where(col("doc_id") >= 100),
        docs.where(col("doc_id") < 20), "doc_id", "text", n = 3, minShared = 1)
      .orderBy("doc_id")
  }

  /** Token-budget sequence packing ([[operators.Splits.packByBudget]]):
    * pack documents into 500-token context windows per language shard,
    * report per-pack doc counts and token sums.
    */
  def q79PackBudget(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        Text.tokenCount(col("text")).as("n_tokens"))
    operators.Splits.packByBudget(docs, "doc_id", "n_tokens", 500, Seq("lang"))
      .groupBy("lang", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").cast("long").as("sum_tokens"))
  }

  /** Multimodal → ANN hand-off: REAL PNG payloads (text bytes packed into
    * lossless rasters, [[operators.Multimodal.textToPng]]) through the
    * batched ImageIO feature extractor
    * ([[operators.Multimodal.extractFeatures]] → real pixel luma
    * histograms) into cosine top-k — the media-dedup/retrieval shape.
    * Rows-only (a real codec has no SQL equivalent); the per-stage pieces
    * are oracle/spec-checked (q42, MultimodalSpec, q39) — and the output
    * CARRIES its own measured number (the q187 convention): each query
    * doc gets a planted one-character-edited PNG twin at id+10000, every
    * result row is flagged `is_planted`, and the constant
    * `planted_recall` column reports how many of the 5 queries surfaced
    * their twin in the top-k — ground truth by construction, so the gate
    * artifact itself proves the decode→histogram→cosine path retrieves.
    */
  def q76MediaAnn(s: SparkSession, dir: String): DataFrame = {
    // Mixed real-codec corpus: PNG images for doc_id < 100, MJPEG-AVI
    // clips for 100-199 — every feature vector comes from an actual
    // decode (pixels or frames), none from the byte-hash fallback.
    val docs = t(s, dir, "documents")
    val queries = docs.where(col("doc_id") < 5)
    val media = operators.Multimodal.textToPng(
        docs.where(col("doc_id") < 100), "doc_id", "text").toDF()
      .unionByName(operators.Multimodal.textToAvi(
        docs.where(col("doc_id") >= 100 && col("doc_id") < 200),
        "doc_id", "text").toDF())
      .unionByName(operators.Multimodal.textToPng(
        queries.select((col("doc_id") + 10000).as("doc_id"),
          overlay(col("text"), lit("X"), lit(1)).as("text")),
        "doc_id", "text").toDF())
    val feats = operators.Multimodal.extractFeatures(media, dim = 16).toDF()
      .select(col("media_id").as("vec_id"), col("feature").as("embedding"))
      .localCheckpoint() // corpus AND query side — avoid double extraction
    val topk = operators.Similarity.bruteForceTopK(feats,
        feats.where(col("vec_id") < 5), "vec_id", "embedding", k = 3)
      .withColumn("is_planted",
        col("nbr_id") === col("query_id") + 10000L)
      .localCheckpoint() // feeds both the recall aggregate and the rows
    val nQueries = queries.agg(count(lit(1)).as("n_planted"))
    val recall = topk.agg(
        countDistinct(when(col("is_planted"), col("query_id")))
          .as("n_planted_found"))
      .crossJoin(broadcast(nQueries))
      .select(col("n_planted"), col("n_planted_found"),
        round(col("n_planted_found") / col("n_planted"), 4)
          .as("planted_recall"))
    topk.crossJoin(broadcast(recall)).orderBy("query_id", "rank")
  }

  /** RANGE-frame window (time-based rolling aggregate — value-bounded
    * frame, not row-bounded like q24): per user, the sum of event values in
    * the trailing hour. The frame is over epoch seconds so both engines
    * bound it identically; ties at one timestamp are all frame-peers.
    */
  def q81RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").cast("long"))
      .rangeBetween(-3600, 0)
    Tables.loadEvents(s, dir)
      .select(col("user_id"), col("event_id"),
        round(sum("value").over(w), 2).as("rolling_1h"))
  }

  /** Rank-distribution family: percent_rank / cume_dist / dense_rank with a
    * unique ordering so peer groups are single rows in both engines.
    */
  def q82RankFamily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables.loadEvents(s, dir)
      .select(col("event_type"), col("event_id"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        dense_rank().over(w).cast("long").as("dr"))
  }

  /** Incremental ingest dedup ([[operators.Incremental.newRows]]): the
    * standing corpus is docs < 400; the incoming "re-crawl" batch mixes
    * genuinely new docs (≥ 450) with already-ingested ones (< 30). The
    * bloom sketch prefilters the batch scan-side; bloom-positive rows are
    * verified with an exact anti-join, so the oracle is the plain anti-join
    * — the sketch must be value-transparent, exactly like q47's salt.
    */
  def q83BloomIncrement(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val corpus = docs.where(col("doc_id") < 400)
      .select(md5(col("text")).as("fp"))
    val batch = docs.where(col("doc_id") >= 450 || col("doc_id") < 30)
      .select(col("doc_id"), md5(col("text")).as("fp"))
    // sketch sized to the corpus: 64k items ≈ 60 KB of bloom bits — the
    // default 4M sizing costs ~MB-scale partials per task for no fpp gain
    operators.Incremental.newRows(batch, corpus, "fp", expectedItems = 1L << 16)
      .orderBy("doc_id")
  }

  /** Semantic transitive dedup ([[operators.Dedup.embeddingDedupExact]]):
    * exact cosine ≥ 0.30 pairs on a bounded slice → connected components →
    * surviving vec_ids. The DuckDB oracle recomputes the pairs with the
    * bit-identical list arithmetic and closes them with a recursive CTE —
    * hash-matching proves the embedding-side closure end-to-end (the text
    *-side twin is q77).
    */
  def q84EmbeddingDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingDedupExact(
        Tables.loadEmbeddings(s, dir).where(col("vec_id") < 150),
        "vec_id", "embedding", threshold = 0.30)
      .orderBy("vec_id")

  /** Exact-quota stratified sample ([[operators.Splits.stratifiedSample]]):
    * 20% per language, hash-ordered — corpus mixing with exact per-stratum
    * quotas, deterministic across engines (both order by md5 of the id).
    */
  def q85StratifiedSample(s: SparkSession, dir: String): DataFrame =
    operators.Splits.stratifiedSample(
        t(s, dir, "documents").select("doc_id", "lang"),
        Seq("lang"), 0.2, "doc_id")
      .orderBy("doc_id")

  /** Exact source-pair content overlap ([[operators.Dedup.groupJaccardExact]])
    * — the deterministic anchor for q49's MinHash-union sketches: same
    * shingle sets, inverted-index counting, J = i/(na+nb−i).
    */
  def q86SourceJaccardExact(s: SparkSession, dir: String): DataFrame =
    Dedup.groupJaccardExact(t(s, dir, "documents"), "source", "text")
      .withColumn("jaccard", round(col("jaccard"), 4))
      .orderBy("group_a", "group_b")

  /** Exact embedding near-dup PAIRS ([[operators.Dedup.embeddingNearDupExact]]):
    * the pair-level gate under q84's closure — ids and cosine values both
    * hash-checked (threshold cut happens on the unrounded double in both
    * engines; display rounds to 6).
    */
  def q87CosinePairs(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupExact(
        Tables.loadEmbeddings(s, dir).where(col("vec_id") < 150),
        "vec_id", "embedding", threshold = 0.30)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_r"))
      .orderBy("id_a", "id_b")

  /** Repetition quality profile ([[operators.Quality.repetitionProfile]]):
    * duplicate-2-gram fraction and dominant-2-gram share per document —
    * the repetitious-text filter signal.
    */
  def q88Repetition(s: SparkSession, dir: String): DataFrame =
    operators.Quality.repetitionProfile(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), round(col("dup_frac"), 4).as("dup_frac"),
        round(col("top_frac"), 4).as("top_frac"))
      .orderBy("doc_id")

  /** Corpus-relative unigram NLL ([[operators.Quality.unigramLogProb]]) —
    * the LM-perplexity-proxy quality filter. avg of ~n_toks doubles: round
    * 4 absorbs cross-engine summation-order ulp drift.
    */
  def q89UnigramNll(s: SparkSession, dir: String): DataFrame =
    operators.Quality.unigramLogProb(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), round(col("nll"), 4).as("nll"),
        col("n_toks").cast("long").as("n_toks"))
      .orderBy("doc_id")

  /** Source-mixture reweighting ([[operators.Analytics.mixtureWeights]]):
    * token share per language vs a target mixture, and the up/down-sampling
    * weight that would hit it.
    */
  def q90MixtureWeights(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("lang"), Text.tokenCount(col("text")).as("n_tokens"))
    operators.Analytics.mixtureWeights(docs, "lang", col("n_tokens"),
        Map("en" -> 0.3, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.2, "zh" -> 0.1))
      .select(col("lang"), col("measure").cast("long").as("n_tokens"),
        round(col("actual_share"), 6).as("actual_share"),
        round(col("target_share"), 6).as("target_share"),
        round(col("weight"), 6).as("weight"))
      .orderBy("lang")
  }

  /** Forward as-of join ([[operators.Joins.asOfJoinForward]]): each click
    * matched to the user's NEXT view at or after it — the "what happened
    * next" direction, oracle-checked against DuckDB's native ASOF JOIN
    * with the inequality reversed.
    */
  /** HTML boilerplate strip over a deterministic synthetic page per doc:
    * script content (with < > inside) must vanish wholesale, tags flatten
    * to spaces, entities unescape exactly once (&amp;amp; → &amp;, not &),
    * whitespace collapses. Output hashes the cleaned text so the gate
    * compares content, not megabytes.
    */
  def q92HtmlStrip(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), concat(
        lit("<html><body onload=\"f()\"><h1>"), col("source"),
        lit("</h1> <p class=\"a\">"), col("text"),
        lit("</p><script>var x = 1 < 2;</script> &lt;tail&gt; &amp;amp;"))
        .as("html"))
      .select(col("doc_id"), functions.Text.stripHtml(col("html")).as("clean"))
      .select(col("doc_id"), length(col("clean")).cast("long").as("n_chars"),
        md5(col("clean")).as("clean_hash"))

  /** Expanding-window time-series CV folds over the event stream (second-
    * truncated timestamps — the ns-precision parity rule). Train/test row
    * counts and boundary per fold; the backtest protocol where random
    * k-fold would leak the future.
    */
  def q93ExpandingCv(s: SparkSession, dir: String): DataFrame =
    operators.Splits.expandingTimeFolds(
        Tables.loadEvents(s, dir)
          .withColumn("ts", date_trunc("second", col("ts"))),
        "ts", k = 4)
      .select(col("fold"), col("train_rows"), col("test_rows"),
        unix_timestamp(col("train_end")).as("train_end_s"))

  /** Token-budget chunking with overlap: long docs split into ≤64-token
    * chunks striding 48 (16-token overlap); emits per-chunk token count +
    * content hash, the shape per-chunk dedup/contamination consumes.
    */
  def q94TokenChunks(s: SparkSession, dir: String): DataFrame =
    operators.Splits.tokenChunks(t(s, dir, "documents"), "doc_id", "text",
      maxTokens = 64, overlap = 16)

  def q91AsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("event_id").as("view_id"))
      .withColumnRenamed("ts", "vts")
    operators.Joins.asOfJoinForward(clicks, views, "user_id", "ts", "vts",
        Seq("view_id", "vts"), asOfPrefix = "")
      .select(col("click_id"), col("user_id"), col("view_id"),
        (col("vts").cast("long") - col("ts").cast("long")).as("lead_sec"))
  }

  /** Verified transitive chunk dedup ([[operators.Dedup.chunkKeepIdsVerifiedMd5]]):
    * md5-rule chunk candidates → exact containment (overlap-coefficient)
    * verification → connected components → survivors. The chunk path's
    * q77: candidates alone never delete; DuckDB replays cut rule,
    * verification and closure exactly. Runs on the q36b-style
    * deterministic 1/3 slice — the md5 chunk/verify cost is per-doc and
    * the cut→verify→closure semantics are slice-invariant; the
    * production xxhash path is held to linear by the
    * `chunk_dedup_verified` SCALING anchor at full size.
    */
  def q131ChunkDedupVerified(s: SparkSession, dir: String): DataFrame =
    Dedup.chunkKeepIdsVerifiedMd5(
        t(s, dir, "documents").where(col("doc_id") % 3 === 0),
        "doc_id", "text")
      .orderBy("doc_id")

  /** First-touch funnel ([[operators.EventAnalytics.funnel]]): per-user
    * resolved view→click→purchase times (each stage strictly after the
    * previous), plus the rollup counts. DuckDB replays the per-stage
    * conditional minima exactly.
    */
  def q134Funnel(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.funnel(Tables.loadEvents(s, dir),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .select(col("user").as("user_id"),
        col("t_view"), col("t_click"), col("t_purchase"))
      .orderBy("user_id")

  /** Weekly retention cohorts ([[operators.EventAnalytics.weeklyRetention]]):
    * cohort = 7-day bucket of first activity since the global earliest
    * event; n_users active at each offset k.
    */
  def q135Retention(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.weeklyRetention(Tables.loadEvents(s, dir),
        "user_id", "ts", maxWeeks = 4)
      .orderBy("cohort", "k")

  /** Event-path transitions ([[operators.EventAnalytics.transitionCounts]]):
    * adjacent (type → next type) pairs per user ordered by (ts, event_id),
    * counted corpus-wide. DuckDB replays the `lead` window exactly.
    */
  def q136Transitions(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.transitionCounts(Tables.loadEvents(s, dir),
        "user_id", "ts", "event_type", "event_id")
      .orderBy("from_type", "to_type")

  /** Last-touch attribution ([[operators.EventAnalytics.lastTouchAttribution]]):
    * each purchase credited to the latest view/click at-or-before it for
    * the same user (as-of semantics); count + value by credited type.
    */
  def q137Attribution(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.lastTouchAttribution(Tables.loadEvents(s, dir),
        "user_id", "ts", "event_type", "event_id", "value",
        conversionType = "purchase", touchTypes = Seq("view", "click"))
      .select(col("touch_type"), col("n_conversions"),
        round(col("total_value"), 4).as("total_value"))
      .orderBy("touch_type")

  /** A/B conversion lift ([[operators.EventAnalytics.abLift]]): users split
    * by `user_id % 2`, conversion = any purchase event; one-row report with
    * per-arm sizes/rates, absolute lift and the pooled two-proportion z.
    */
  def q138AbLift(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.abLift(Tables.loadEvents(s, dir),
        "user_id", "event_type", "purchase", col("user_id") % 2)
      .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        round(col("rate_a"), 6).as("rate_a"),
        round(col("rate_b"), 6).as("rate_b"),
        round(col("lift"), 6).as("lift"),
        round(col("z"), 6).as("z"))

  /** BM25 ranked retrieval ([[operators.Retrieval.bm25]]): top-10 documents
    * for a fixed 3-term query, per-term contributions rounded 6dp, totals
    * 4dp. DuckDB replays tf/df/length-normalization exactly.
    */
  def q139Bm25(s: SparkSession, dir: String): DataFrame =
    operators.Retrieval.bm25(t(s, dir, "documents"), "doc_id", "text",
      queryTerms = Seq("spark", "join", "window"), topK = 10)

  /** Per-source curation report ([[operators.CorpusPipeline.sourceReport]]):
    * corpus composition, exact-dup rate (corpus-wide md5 collisions), and
    * char/token volume per source.
    */
  def q140SourceReport(s: SparkSession, dir: String): DataFrame =
    operators.CorpusPipeline.sourceReport(t(s, dir, "documents"))
      .orderBy("source")

  /** PageRank ([[operators.Graphs.pageRank]]) over a deterministic
    * citation-style graph derived from the documents table: doc i links to
    * (i+1) mod N always, (i+7) mod N when i is even, (i+101) mod N when
    * i ≡ 0 (mod 3) — varied out/in-degree, no dangling nodes, identical on
    * both engines. 10 fixed rounds, damping 0.85, ranks rounded 9dp;
    * DuckDB replays the rounds as unrolled CTEs.
    */
  def q141PageRank(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id")
    val nDf = docs.agg(count(lit(1)).as("n"))
    val base = docs.crossJoin(broadcast(nDf))
    val edges = base
      .select(col("doc_id").as("src"),
        ((col("doc_id") + 1) % col("n")).as("dst"))
      .union(base.where(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 7) % col("n")).as("dst")))
      .union(base.where(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 101) % col("n")).as("dst")))
    operators.Graphs.pageRank(edges, iterations = 10)
      .select(col("node"), round(col("pr"), 9).as("pr"))
      .orderBy("node")
  }

  /** Distributed logistic regression ([[operators.Classify.trainLogistic]]):
    * a language-filter classifier (y = lang=='en') trained with 5 batch-GD
    * rounds over scan-side text features — each round ONE gradient
    * aggregate, the model on the driver — then scored per doc. DuckDB
    * replays the training loop as unrolled CTEs and matches scores at 6dp.
    */
  def q142LogReg(s: SparkSession, dir: String): DataFrame = {
    val fcols = Seq("f0", "f1", "f2", "f3")
    val feats = operators.Classify.textFeatures(
        t(s, dir, "documents"), "doc_id", "text")
      .withColumn("y", when(col("lang") === "en", 1.0).otherwise(0.0))
    val w = operators.Classify.trainLogistic(feats, fcols, "y",
      iterations = 5, lr = 1.0)
    operators.Classify.scoreLogistic(feats, fcols, w)
      .select(col("doc_id"), round(col("p"), 6).as("p"), col("y"))
      .orderBy("doc_id")
  }

  /** Embedding covariance ([[operators.EmbeddingStats.moments]]): the
    * distributed mean/outer-product pass behind PCA/whitening, emitted as
    * the full d×d population covariance (0-based indices, 8dp). DuckDB
    * rebuilds it from an unnest self-join.
    */
  def q143EmbedCov(s: SparkSession, dir: String): DataFrame = {
    val (_, _, cov) = operators.EmbeddingStats.moments(
      Tables.loadEmbeddings(s, dir), "embedding")
    operators.EmbeddingStats.covarianceDF(s, cov)
      .select(col("i"), col("j"), round(col("cov"), 8).as("cov"))
      .orderBy("i", "j")
  }

  /** Weighted sampling without replacement ([[operators.Splits.weightedSample]],
    * A-Res): top-20 documents by `u^(1/n_chars)` priority. The gate swaps
    * the production xxhash64 uniform for a multiplicative-modulo uniform
    * both engines compute identically (the q64 bucketer pattern); the
    * xxhash64 default is spec-covered.
    */
  def q144WeightedSample(s: SparkSession, dir: String): DataFrame =
    operators.Splits.weightedSample(t(s, dir, "documents"),
        "doc_id", "n_chars", k = 20,
        uniform = c => ((c * 2654435761L) % 1000003L).cast("double")
          / 1000003.0)
      .select(col("doc_id"), col("n_chars"),
        round(col("__priority"), 9).as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))

  /** Triangle counting ([[operators.Graphs.triangleStats]]) over a second
    * derived doc graph (steps +1 always, +2 for even ids, +3 for ids
    * divisible by 3, mod N — 1+2=3 closes triangles): edge/wedge/triangle
    * counts and the global clustering coefficient, all exact. DuckDB
    * replays orientation, wedge join and closure.
    */
  def q145Triangles(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id")
    val nDf = docs.agg(count(lit(1)).as("n"))
    val base = docs.crossJoin(broadcast(nDf))
    val edges = base
      .select(col("doc_id").as("src"),
        ((col("doc_id") + 1) % col("n")).as("dst"))
      .union(base.where(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 2) % col("n")).as("dst")))
      .union(base.where(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 3) % col("n")).as("dst")))
    operators.Graphs.triangleStats(edges)
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        round(col("clustering_coeff"), 6).as("clustering_coeff"))
  }

  /** Local clustering coefficients ([[operators.Graphs.localClustering]])
    * on the q145 graph: top-20 vertices by `tri(v)/C(deg,2)` (the ratio is
    * exact-integer arithmetic — bit-identical cross-engine), vertex id
    * tiebreak.
    */
  def q146LocalClustering(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id")
    val nDf = docs.agg(count(lit(1)).as("n"))
    val base = docs.crossJoin(broadcast(nDf))
    val edges = base
      .select(col("doc_id").as("src"),
        ((col("doc_id") + 1) % col("n")).as("dst"))
      .union(base.where(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 2) % col("n")).as("dst")))
      .union(base.where(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 3) % col("n")).as("dst")))
    operators.Graphs.localClustering(edges)
      .orderBy(col("clustering_coeff").desc, col("v"))
      .limit(20)
      .select(col("v"), col("degree"), col("n_triangles"),
        round(col("clustering_coeff"), 6).as("clustering_coeff"))
  }

  /** Exact set-similarity join ([[operators.Dedup.jaccardJoinExact]],
    * prefix filtering): ALL pairs with token-set Jaccard ≥ 0.9 — no LSH
    * recall caveat. The DuckDB oracle computes ground truth from the full
    * inverted-index join, so this also PROVES the prefix filter's
    * completeness on real data.
    */
  def q147JaccardJoin(s: SparkSession, dir: String): DataFrame =
    // 3-token shingle sets (the q38 population), NOT whitespace unigrams:
    // the synthetic corpus has a ~31-word vocabulary, so every unigram is
    // common and prefix filtering over words degenerates to all-pairs
    // (measured 80 s at sf0.1); shingle frequencies stay low and the same
    // join runs in under a second with the identical completeness proof
    operators.Dedup.jaccardJoinExact(t(s, dir, "documents"),
        "doc_id", "text", threshold = 0.9,
        tokens = c => Text.shingles(c, 3))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")

  /** Mergeable HLL distinct sketches ([[operators.Sketches.distinctSketches]]):
    * per-source distinct-token estimates plus the `__all__` row computed by
    * UNIONING the per-source sketches (never rescanning tokens). Rows-only
    * (datasketches estimates have no DuckDB mirror); SketchSpec gates
    * accuracy and lossless mergeability, and the gate artifact carries the
    * MEASURED error itself: each row joins the exact distinct count and
    * reports `rel_err`, so a reader of CORRECTNESS_r{N} sees the observed
    * accuracy without trusting the spec (the q258/q259 telemetry pattern).
    */
  def q148HllSketches(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) > 0)
    val perSource = operators.Sketches.distinctSketches(
      toks, Seq("source"), "tok")
    val est = operators.Sketches.estimate(perSource)
      .select(col("source"), col("distinct_est"))
      .unionByName(operators.Sketches.unionSketches(perSource)
        .select(lit("__all__").as("source"), col("distinct_est")))
    val exact = toks.groupBy("source")
      .agg(countDistinct("tok").as("distinct_exact"))
      .unionByName(toks.agg(countDistinct("tok").as("distinct_exact"))
        .select(lit("__all__").as("source"), col("distinct_exact")))
    est.join(exact, Seq("source"))
      .withColumn("rel_err",
        round(abs(col("distinct_est") - col("distinct_exact")) /
          col("distinct_exact"), 6))
      .orderBy("source")
  }

  /** Exact edit-distance≤1 record linkage ([[operators.Dedup.editDistanceJoin]]):
    * SymSpell deletion-neighborhood blocking over customer names, then
    * `levenshtein` verification. The oracle is the UNBLOCKED brute-force
    * levenshtein join, so the gate hash-match proves the deletion blocks
    * are a complete candidate generator on real keys.
    */
  def q149EditDistance(s: SparkSession, dir: String): DataFrame =
    Dedup.editDistanceJoin(t(s, dir, "customer"), "c_custkey", "c_name",
        maxDist = 1)
      .select(col("id_a"), col("id_b"), col("dist").cast("long").as("dist"))
      .orderBy("id_a", "id_b")

  /** Rolling z-score anomaly screen ([[operators.Timeseries.rollingAnomalies]]):
    * events whose value sits > 3 trailing-window standard deviations from
    * the same user's previous 20 observations. DuckDB replays the keyed
    * trailing frame (ts + event_id total order) exactly.
    */
  def q150Anomaly(s: SparkSession, dir: String): DataFrame =
    Timeseries.rollingAnomalies(t(s, dir, "events"), "user_id",
        Seq("ts", "event_id"), "value",
        lookback = 20, zThreshold = 3.0, minPoints = 5)
      .select(col("user_id"), col("event_id"), col("value"),
        round(col("zscore"), 4).as("zscore"))
      .orderBy("user_id", "event_id")

  /** Token↔source mutual information ([[operators.Quality.tokenClassMI]]):
    * the top source-discriminating tokens over occurrence counts. Ranking
    * happens on the unrounded MI in both engines; the output re-sorts by
    * token so summation-order ulps can't reorder rounded ties.
    */
  def q151TokenMi(s: SparkSession, dir: String): DataFrame =
    operators.Quality.tokenClassMI(t(s, dir, "documents"), "text", "source",
        minCount = 50, topN = 50)
      .select(col("tok"), col("n").cast("long").as("n"),
        round(col("mi"), 6).as("mi"))
      .orderBy("tok")

  /** Per-source robust scaling ([[operators.Analytics.robustScale]]):
    * median/IQR calibration of document lengths within each source —
    * exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`), ±3 clip.
    */
  def q152RobustScale(s: SparkSession, dir: String): DataFrame =
    Analytics.robustScale(t(s, dir, "documents"), "source", "n_chars",
        clip = 3.0)
      .select(col("doc_id"), col("source"), col("n_chars"),
        round(col("robust_z"), 4).as("robust_z"))
      .orderBy("doc_id")

  /** Deterministic label-propagation communities
    * ([[operators.Graphs.labelPropagation]]): 5 synchronous rounds with
    * (count desc, label asc) adoption over the q141 ring+chords graph;
    * DuckDB unrolls the rounds as CTEs and must land every node in the
    * identical community.
    */
  def q153Communities(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id")
    val nDf = docs.agg(count(lit(1)).as("n"))
    val base = docs.crossJoin(broadcast(nDf))
    val edges = base
      .select(col("doc_id").as("src"),
        ((col("doc_id") + 1) % col("n")).as("dst"))
      .union(base.where(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 7) % col("n")).as("dst")))
      .union(base.where(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 101) % col("n")).as("dst")))
    operators.Graphs.labelPropagation(edges, iterations = 5)
      .select(col("node"), col("community").cast("long").as("community"))
      .orderBy("node")
  }

  /** Hybrid retrieval via reciprocal-rank fusion
    * ([[operators.Retrieval.reciprocalRankFusion]]): the BM25 lexical
    * top-50 (q139's terms) fused with the embedding-cosine top-50 around
    * vector 0 (doc_id ≡ vec_id in the testdata). Both input ranks are
    * cross-engine deterministic (rounded score + id tiebreaks), and the
    * two-term RRF sum is order-exact, so DuckDB replays the fusion
    * digit-for-digit.
    */
  def q154RrfFusion(s: SparkSession, dir: String): DataFrame = {
    val lex = operators.Retrieval.bm25(t(s, dir, "documents"),
        "doc_id", "text", Seq("spark", "join", "window"), topK = 50)
      // bounded 50-row frame — the unpartitioned window is fine here
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select("doc_id", "rank")
    val emb = Tables.loadEmbeddings(s, dir)
    val sem = Similarity.bruteForceTopK(emb,
        emb.where(col("vec_id") === 0), "vec_id", "embedding", k = 50)
      .select(col("nbr_id").as("doc_id"), col("rank"))
    operators.Retrieval.reciprocalRankFusion(Seq(lex, sem), "doc_id",
        topK = 10)
      .select(col("doc_id"), round(col("rrf_score"), 6).as("rrf_score"),
        col("n_systems"))
      .orderBy("doc_id")
  }

  /** Bigram PMI collocations ([[operators.Quality.collocations]]): the
    * phrase-mining pass; counts, totals and the double-product PMI all
    * replay exactly in DuckDB, ranking on the unrounded PMI.
    */
  def q155Collocations(s: SparkSession, dir: String): DataFrame =
    operators.Quality.collocations(t(s, dir, "documents"), "text",
        minCount = 25, topN = 50)
      .select(col("w1"), col("w2"), col("n").cast("long").as("n"),
        round(col("pmi"), 6).as("pmi"))
      .orderBy("w1", "w2")

  /** Column-dependency profile ([[operators.Quality.columnDependencies]]):
    * entropies + uncertainty coefficients over orders column pairs — the
    * near-functional-dependency probe. One row per pair, 6dp.
    */
  def q156ColumnDeps(s: SparkSession, dir: String): DataFrame =
    operators.Quality.columnDependencies(t(s, dir, "orders"),
        Seq(("o_orderstatus", "o_orderpriority"),
          ("o_orderpriority", "o_orderstatus"),
          ("o_orderstatus", "o_custkey")))
      .select(col("col_a"), col("col_b"),
        round(col("h_a"), 6).as("h_a"), round(col("h_b"), 6).as("h_b"),
        round(col("h_a_given_b"), 6).as("h_a_given_b"),
        round(col("uncertainty_coef"), 6).as("uncertainty_coef"))
      .orderBy("col_a", "col_b")

  /** Mergeable GK quantile sketches ([[operators.Sketches.quantileSketches]]):
    * per-source document-length p50/p95 plus the `__all__` row computed by
    * MERGING the per-source sketches (never rescanning documents).
    * Rows-only (GK estimates depend on fold order and have no DuckDB
    * mirror); SketchSpec gates the rank-error guarantee and merge bound,
    * q51's exact percentiles are the family's exact anchor — and the gate
    * artifact carries the MEASURED error itself: each row joins the exact
    * p50/p95 and reports relative errors, so a reader of CORRECTNESS_r{N}
    * sees the observed accuracy without trusting the spec.
    */
  def q157QuantileSketch(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val per = operators.Sketches.quantileSketches(docs, Seq("source"), "n_chars")
    val est = operators.Sketches.quantileEstimates(per, Seq(0.5, 0.95))
      .select(col("source"), col("q_50"), col("q_95"))
      .unionByName(operators.Sketches.quantileEstimates(
          operators.Sketches.mergeQuantileSketches(per), Seq(0.5, 0.95))
        .select(lit("__all__").as("source"), col("q_50"), col("q_95")))
    val v = col("n_chars").cast("double")
    val exact = docs.groupBy("source")
      .agg(percentile(v, lit(0.5)).as("q_50_exact"),
        percentile(v, lit(0.95)).as("q_95_exact"))
      .unionByName(docs
        .agg(percentile(v, lit(0.5)).as("q_50_exact"),
          percentile(v, lit(0.95)).as("q_95_exact"))
        .select(lit("__all__").as("source"), col("q_50_exact"),
          col("q_95_exact")))
    est.join(exact, Seq("source"))
      .withColumn("q_50_rel_err",
        round(abs(col("q_50") - col("q_50_exact")) / col("q_50_exact"), 6))
      .withColumn("q_95_rel_err",
        round(abs(col("q_95") - col("q_95_exact")) / col("q_95_exact"), 6))
      .orderBy("source")
  }

  /** PSI vintage drift ([[operators.Quality.populationStability]]):
    * even-doc lengths as the reference vintage, odd docs as the current —
    * reference-decile edges, +0.5-smoothed shares, per-bucket PSI terms.
    * DuckDB rebuilds identical quantile edges (quantile_cont ≡ Spark
    * percentile) and replays the bucketing and smoothing.
    */
  def q158PsiDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    operators.Quality.populationStability(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "n_chars", buckets = 10)
      .select(col("bucket"), round(col("ref_share"), 6).as("ref_share"),
        round(col("cur_share"), 6).as("cur_share"),
        round(col("psi_term"), 6).as("psi_term"))
      .orderBy("bucket")
  }

  /** Association rules ([[operators.EventAnalytics.associationRules]]):
    * (user × day) baskets of event types — support/confidence/lift per
    * ordered pair, the market-basket report. DuckDB replays the distinct
    * basket sets and the rule arithmetic exactly.
    */
  def q159AssociationRules(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.associationRules(
        t(s, dir, "events").withColumn("day", to_date(col("ts"))),
        Seq("user_id", "day"), "event_type", minBasketCount = 5)
      .select(col("ante"), col("cons"), col("n_both").cast("long").as("n_both"),
        round(col("support"), 6).as("support"),
        round(col("confidence"), 6).as("confidence"),
        round(col("lift"), 6).as("lift"))
      .orderBy("ante", "cons")

  /** k-core decomposition ([[operators.Graphs.kCore]]) over a ring with a
    * planted dense core (ids < 40 chord to +2/+3/+4 mod 40): at k = 5 the
    * degree-2 ring peels in one synchronous round and exactly the planted
    * core survives. Peeling a stable set is a no-op, so the fixed-round
    * oracle replays the until-stable run exactly.
    */
  def q160KCore(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id")
    val nDf = docs.agg(count(lit(1)).as("n"))
    val base = docs.crossJoin(broadcast(nDf))
    val ring = base.select(col("doc_id").as("src"),
      ((col("doc_id") + 1) % col("n")).as("dst"))
    val core = base.where(col("doc_id") < 40)
      .select(col("doc_id").as("src"),
        explode(array(lit(2), lit(3), lit(4))).as("j"))
      .select(col("src"), ((col("src") + col("j")) % 40).as("dst"))
    operators.Graphs.kCore(ring.unionByName(core), k = 5)
      .select(col("node"), col("core_degree").cast("long").as("core_degree"))
      .orderBy("node")
  }

  /** Heap-based top-k per group ([[operators.Analytics.topKPerGroup]]):
    * top-3 longest docs per source via the k-bounded partial aggregate —
    * shuffle carries ≤ k entries per group per map task, no window sort.
    * The oracle is the window formulation, proving equivalence.
    */
  def q161TopkPerGroup(s: SparkSession, dir: String): DataFrame =
    Analytics.topKPerGroup(t(s, dir, "documents"), Seq("source"),
        "n_chars", "doc_id", k = 3)
      .select(col("source"), col("rank").cast("long").as("rank"),
        col("ord").cast("long").as("n_chars"), col("tie").as("doc_id"))
      .orderBy("source", "rank")

  /** Search over a materialized inverted index
    * ([[operators.Retrieval.invertedIndex]]/[[operators.Retrieval.searchIndex]]):
    * the same BM25 query as q139 answered from posting lists instead of
    * rescanning the corpus — search-over-index must equal
    * search-over-corpus row for row, so the oracle IS q139's.
    */
  def q162IndexSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val idx = operators.Retrieval.invertedIndex(docs, "doc_id", "text",
      bandSize = 128) // small band → the band-rollup path is exercised
    val lens = operators.Retrieval.docLengths(docs, "doc_id", "text")
    operators.Retrieval.searchIndex(idx, lens,
      Seq("spark", "join", "window"), topK = 10)
  }

  /** Categorical drift ([[operators.Quality.categoricalDrift]]): language
    * mix of even vs odd docs — chi-square and Jensen–Shannon terms per
    * category, +0.5-smoothed. DuckDB replays counts, smoothing and the
    * explicit-multiply arithmetic.
    */
  def q163CategoricalDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    operators.Quality.categoricalDrift(
        docs.where(col("doc_id") % 2 === 0),
        docs.where(col("doc_id") % 2 === 1), "lang")
      .select(col("category"), round(col("ref_share"), 6).as("ref_share"),
        round(col("cur_share"), 6).as("cur_share"),
        round(col("chi2_term"), 6).as("chi2_term"),
        round(col("js_term"), 6).as("js_term"))
      .orderBy("category")
  }

  /** Neyman allocation ([[operators.Splits.neymanAllocation]]): a
    * 1000-row audit budget split across sources by N_h·S_h — the
    * variance-optimal stratified-sampling plan, fractional allocations.
    */
  /** Margin-based bitext mining ([[operators.Similarity.marginMining]]):
    * even vec_ids play the source language, odd the target; cosine top-4
    * retrieval re-scored by the Artetxe–Schwenk margin, best pair per
    * source at margin ≥ 1. DuckDB replays retrieval, both denominator
    * directions and the re-ranking exactly.
    */
  def q165MarginMining(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEmbeddings(s, dir)
    Similarity.marginMining(
        e.where(col("vec_id") % 2 === 0), e.where(col("vec_id") % 2 === 1),
        "vec_id", "embedding", k = 4, threshold = 1.0)
      .select(col("src_id"), col("tgt_id"), round(col("cos"), 6).as("cos"),
        round(col("margin"), 5).as("margin"))
      .orderBy("src_id")
  }

  def q164NeymanAllocation(s: SparkSession, dir: String): DataFrame =
    operators.Splits.neymanAllocation(t(s, dir, "documents"),
        Seq("source"), "n_chars", totalBudget = 1000)
      .select(col("source"), col("n_rows").cast("long").as("n_rows"),
        round(col("stddev"), 6).as("stddev"),
        round(col("allocation"), 4).as("allocation"))
      .orderBy("source")

  /** Flesch readability ([[operators.Quality.readability]]): words,
    * sentence runs, vowel-group syllables and the reading-ease score —
    * DuckDB replays the tokenization, both regexes and the arithmetic.
    */
  def q166Readability(s: SparkSession, dir: String): DataFrame =
    operators.Quality.readability(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"), round(col("flesch"), 4).as("flesch"))
      .orderBy("doc_id")

  /** Zipf-law fit ([[operators.Quality.zipfFit]]): ln-freq on ln-rank
    * least squares over the top vocabulary via the engine's closed-form
    * regression aggregates; DuckDB's regr_* replay the fit.
    */
  def q167ZipfFit(s: SparkSession, dir: String): DataFrame =
    operators.Quality.zipfFit(t(s, dir, "documents"), "text", topN = 1000)
      .select(col("n_tokens"), round(col("slope"), 5).as("slope"),
        round(col("intercept"), 5).as("intercept"),
        round(col("r2"), 5).as("r2"))

  /** Deflate compression-ratio quality signal
    * ([[graft.functions.expressions.DeflateRatio]]): rows-only (DuckDB
    * has no zlib mirror); QualitySpec gates the repetitive ≪ prose <
    * noise ordering and determinism.
    */
  def q168CompressRatio(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        round(functions.expressions.CompressionExpressions
          .compressionRatio(col("text")), 4).as("deflate_ratio"))
      .where(col("deflate_ratio").isNotNull)
      .orderBy("doc_id")

  /** kNN label propagation ([[operators.Similarity.knnLabelPropagation]]):
    * vectors with `vec_id % 5 = 0` play the unlabeled pool, the rest the
    * labeled seed set; each pool vector takes the majority label of its 5
    * nearest seeds by cosine. DuckDB replays scoring, top-k and the
    * vote/tie rules exactly.
    */
  def q132KnnLabels(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEmbeddings(s, dir)
    Similarity.knnLabelPropagation(
        labeled = e.where(col("vec_id") % 5 =!= 0),
        unlabeled = e.where(col("vec_id") % 5 === 0),
        "vec_id", "embedding", "label", k = 5)
      .select(col("query_id"), col("predicted_label").cast("int").as("predicted_label"),
        col("votes"))
      .orderBy("query_id")
  }

  /** Centroid-margin mislabel screen ([[operators.Similarity.centroidMargins]]):
    * cosine to own label's centroid minus best cosine to any other — the
    * label-noise audit. Rounded to 4dp; DuckDB rebuilds the per-label mean
    * embeddings and the same margins.
    */
  def q133CentroidMargin(s: SparkSession, dir: String): DataFrame =
    Similarity.centroidMargins(Tables.loadEmbeddings(s, dir),
        "vec_id", "embedding", "label")
      .select(col("vec_id"), col("label"),
        round(col("own_cos"), 4).as("own_cos"),
        col("nearest_other_label").cast("int").as("nearest_other_label"),
        round(col("other_cos"), 4).as("other_cos"),
        round(col("margin"), 4).as("margin"))
      .orderBy("vec_id")

  /** Delta-protocol read interop ([[sources.DeltaRead]]): a 2-commit Delta
    * log is staged once per gate dir over the gate's own `region` rows —
    * commit 0 adds two data files, commit 1 tombstones one and re-adds its
    * rows as a new file, so the read exercises latest-action-wins replay,
    * not just a file listing. Oracle = the region table itself: correct
    * replay reconstructs exactly the original rows; a reader that missed
    * the remove would double rows 0-1, one that missed the re-add would
    * drop them.
    */
  def q130DeltaRead(s: SparkSession, dir: String): DataFrame = {
    // v2 suffix: fixture CONTENT is versioned into the path so a staged
    // dir from an older code vintage (e.g. pre-real-sizes) never survives
    // the marker check
    val root = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_delta_q130v2_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    stageDeltaFixture(s, dir, root)
    sources.DeltaRead.read(s, root).orderBy("r_regionkey")
  }

  private def stageDeltaFixture(s: SparkSession, dir: String,
                                root: String): Unit = synchronized {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val marker = Paths.get(root, "_delta_log", f"${1L}%020d.json")
    if (Files.exists(marker)) return // staged content is deterministic per dir
    val rootF = new java.io.File(root)
    if (rootF.exists()) org.apache.commons.io.FileUtils.deleteDirectory(rootF)
    val region = t(s, dir, "region")
    def part(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$root/__stage"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val p = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(p.toPath, Paths.get(root, name),
        StandardCopyOption.REPLACE_EXISTING)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stage))
    }
    part(region.where(col("r_regionkey") < 2), "a0.parquet")
    part(region.where(col("r_regionkey") >= 2), "b0.parquet")
    part(region.where(col("r_regionkey") < 2), "a1.parquet")
    def esc(x: String) = x.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    }
    // size must be the REAL length: the protocol requires it accurate and
    // the scan plans splits from it
    def add(p: String) =
      s"""{"add":{"path":"$p","partitionValues":{},""" +
        s""""size":${Files.size(Paths.get(root, p))},""" +
        s""""modificationTime":0,"dataChange":true}}"""
    Files.createDirectories(Paths.get(root, "_delta_log"))
    Files.writeString(Paths.get(root, "_delta_log", f"${0L}%020d.json"), Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"q130","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(region.schema.json)}","partitionColumns":[],""" +
        s""""configuration":{},"createdTime":0}}""",
      add("a0.parquet"), add("b0.parquet")).mkString("\n"))
    Files.writeString(marker, Seq(
      """{"remove":{"path":"a0.parquet","deletionTimestamp":1,"dataChange":true}}""",
      add("a1.parquet")).mkString("\n"))
  }

  // ---- evaluation / statistics family (operators.Stats & friends) ---------

  /** Ranked-retrieval evaluation ([[operators.Stats.rankingMetrics]]):
    * per-source rankings (docs by length desc, doc_id tiebreak) scored
    * against a deterministic relevance marker (`doc_id % 7 = 0`) —
    * recall@10, MRR and NDCG@10 per query. The binary-gain IDCG prefix
    * table ships as a broadcast literal; DuckDB rebuilds it from
    * `range()` and replays every metric.
    */
  def q169RankingMetrics(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val ranked = t(s, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rank", row_number().over(w))
      .withColumn("rel", (col("doc_id") % 7 === 0).cast("int"))
    operators.Stats.rankingMetrics(ranked, "source", "rank", "rel", k = 10)
      .select(col("source"), col("n_rel"), col("hits_k"),
        round(col("recall_k"), 6).as("recall_k"),
        round(col("mrr"), 6).as("mrr"),
        round(col("ndcg_k"), 6).as("ndcg_k"))
      .orderBy("source")
  }

  /** Reliability diagram / ECE ([[operators.Stats.calibrationBins]]): a
    * deterministic pseudo-score (modular arithmetic, identical in both
    * engines) against a quantity-threshold label, 10 equal-width bins —
    * per-bin confidence, accuracy and ECE contribution.
    */
  def q170Calibration(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "lineitem").select(
      (((col("l_orderkey") * 7 + col("l_linenumber")) % 100) / lit(100.0))
        .as("score"),
      (col("l_quantity") > 25).cast("int").as("label"))
    operators.Stats.calibrationBins(scored, "score", "label", bins = 10)
      .select(col("bin"), col("n").cast("long").as("n"),
        round(col("confidence"), 6).as("confidence"),
        round(col("accuracy"), 6).as("accuracy"),
        round(col("ece_term"), 6).as("ece_term"))
      .orderBy("bin")
  }

  /** Cohen's kappa ([[operators.Stats.cohenKappa]]) between the corpus
    * lang labels and a simulated second annotator that mislabels every
    * 7th document as 'en' — observed vs chance-corrected agreement.
    */
  def q171Kappa(s: SparkSession, dir: String): DataFrame =
    operators.Stats.cohenKappa(
        t(s, dir, "documents").withColumn("lang2",
          when(col("doc_id") % 7 === 0, "en").otherwise(col("lang"))),
        "lang", "lang2")
      .select(col("n"), round(col("po"), 6).as("po"),
        round(col("pe"), 6).as("pe"), round(col("kappa"), 6).as("kappa"))

  /** Chi-squared independence + Cramér's V
    * ([[operators.Stats.chiSquareIndependence]]): event_type against a
    * derived user cohort (user_id mod 3) — the "is the mix uniform across
    * cohorts" screen. Zero-observed margin cells contribute expected mass.
    */
  def q172Chisq(s: SparkSession, dir: String): DataFrame =
    operators.Stats.chiSquareIndependence(
        t(s, dir, "events").withColumn("cohort", col("user_id") % 3),
        "event_type", "cohort")
      .select(col("n"), col("dof"), round(col("chi2"), 4).as("chi2"),
        round(col("cramers_v"), 6).as("cramers_v"))

  /** Mann-Whitney U ([[operators.Stats.mannWhitney]]): does l_quantity
    * stochastically differ between linestatus 'O' and 'F'? Integer value
    * domain (1..50) — exactly the bounded-domain shape the rank collapse
    * assumes; U is exact in both engines (all terms are halves), z at 6dp.
    */
  def q173MannWhitney(s: SparkSession, dir: String): DataFrame =
    operators.Stats.mannWhitney(t(s, dir, "lineitem"),
        "l_quantity", "l_linestatus", groupA = "O", groupB = "F")
      .select(col("n_a"), col("n_b"), round(col("u"), 2).as("u"),
        round(col("z"), 6).as("z"))

  /** Sample autocorrelation ([[operators.Timeseries.autocorrelation]]):
    * hourly-mean event values, lags 1..5, shared full-series
    * denominator — the seasonality probe. DuckDB replays the bin grid,
    * the lag self-joins and the Σx²−nμ² denominator exactly.
    */
  def q174Acf(s: SparkSession, dir: String): DataFrame =
    Timeseries.autocorrelation(t(s, dir, "events"), "ts", "value",
        stepSeconds = 3600, maxLag = 5)
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        round(col("acf"), 6).as("acf"))
      .orderBy("lag")

  /** k-anonymity release audit ([[operators.Stats.kAnonymity]]) over the
    * (nation, market segment) quasi-identifier pair at k = 5 — class
    * counts, the minimum class size and the at-risk row share.
    */
  def q175KAnonymity(s: SparkSession, dir: String): DataFrame =
    operators.Stats.kAnonymity(t(s, dir, "customer"),
        Seq("c_nationkey", "c_mktsegment"), k = 5)
      .select(col("n_rows"), col("n_classes"), col("min_class_size"),
        col("classes_below_k"), col("rows_below_k"),
        round(col("at_risk_share"), 6).as("at_risk_share"))

  /** Multinomial Naive Bayes ([[operators.Classify.trainNaiveBayes]] /
    * [[operators.Classify.scoreNaiveBayes]]): train a language router on
    * the full corpus (class = lang, Laplace α = 1), score every 10th
    * document. DuckDB replays training counts, smoothing, OOV mass and
    * the arg-max (posteriors to 4dp — sums of hundreds of ln terms agree
    * far below that).
    */
  def q176NaiveBayes(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val (model, priors) = Classify.trainNaiveBayes(docs, "text", "lang")
    Classify.scoreNaiveBayes(docs.where(col("doc_id") % 10 === 0),
        "doc_id", "text", model, priors)
      .select(col("doc_id"), col("predicted_class"),
        round(col("log_posterior"), 4).as("log_posterior"))
      .orderBy("doc_id")
  }

  /** Fixed-iteration k-means ([[operators.Classify.kMeansFixed]]) on
    * customer (acctbal, nationkey) at k = 3, two Lloyd rounds, seeded
    * from the three smallest custkeys — final centroid table. DuckDB
    * unrolls both rounds (arg-min by (d2, cid), per-cluster means).
    */
  def q177KMeans(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"),
        col("c_nationkey").cast("double").as("c_nat"))
    val (_, cents) = Classify.kMeansFixed(cust, "c_custkey",
      Seq("c_acctbal", "c_nat"), k = 3, iterations = 2)
    cents
      .select(col("cluster"), col("n_points").cast("long").as("n_points"),
        round(col("c_acctbal"), 4).as("mean_acctbal"),
        round(col("c_nat"), 6).as("mean_nation"))
      .orderBy("cluster")
  }

  /** Closed-form OLS ([[operators.Classify.olsFit]]): extended price on
    * (quantity, discount) — one moment-aggregate pass, driver-side 2×2
    * normal-equation solve. DuckDB mirrors with var_pop/covar_pop and the
    * two-predictor closed form; the well-conditioned design (independent
    * uniform regressors) keeps both solves far inside the rounding.
    */
  def q178Ols(s: SparkSession, dir: String): DataFrame = {
    val (n, icpt, beta, r2) = Classify.olsFit(t(s, dir, "lineitem"),
      "l_extendedprice", Seq("l_quantity", "l_discount"))
    import s.implicits._
    Seq((n, icpt, beta(0), beta(1), r2))
      .toDF("n", "intercept", "beta_quantity", "beta_discount", "r2")
      .select(col("n"), round(col("intercept"), 2).as("intercept"),
        round(col("beta_quantity"), 3).as("beta_quantity"),
        round(col("beta_discount"), 2).as("beta_discount"),
        round(col("r2"), 6).as("r2"))
  }

  /** Leave-one-out target encoding ([[operators.Classify.targetEncodeLoo]]):
    * order priority encoded by the smoothed out-of-row mean of total
    * price (m = 10) — the leakage-controlled categorical encoder. DuckDB
    * replays category sums, the global-mean prior and the per-row
    * exclusion exactly.
    */
  def q179TargetEncode(s: SparkSession, dir: String): DataFrame =
    Classify.targetEncodeLoo(t(s, dir, "orders"),
        "o_orderpriority", "o_totalprice", m = 10.0)
      .select(col("o_orderkey"), round(col("te"), 4).as("te"))
      .orderBy("o_orderkey")

  /** Benford first-digit audit ([[operators.Quality.benford]]) of
    * extended price: observed vs log10(1+1/d) shares and chi-squared
    * terms per digit. The clamped digit derivation is libm-stable; both
    * engines compute the identical formula.
    */
  def q180Benford(s: SparkSession, dir: String): DataFrame =
    operators.Quality.benford(t(s, dir, "lineitem"), "l_extendedprice")
      .select(col("digit"), col("n"),
        round(col("obs_share"), 6).as("obs_share"),
        round(col("exp_share"), 6).as("exp_share"),
        round(col("chi2_term"), 4).as("chi2_term"))
      .orderBy("digit")

  /** Multi-source BFS ([[operators.Graphs.bfsDistances]]) over the q160
    * ring-plus-planted-core graph from seeds {0, 1, 2}, horizon 4 — hop
    * distance to the nearest seed; unreached nodes are absent. DuckDB
    * unrolls the four synchronous relaxation rounds.
    */
  def q181Bfs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id")
    val nDf = docs.agg(count(lit(1)).as("n"))
    val base = docs.crossJoin(broadcast(nDf))
    val ring = base.select(col("doc_id").as("src"),
      ((col("doc_id") + 1) % col("n")).as("dst"))
    val core = base.where(col("doc_id") < 40)
      .select(col("doc_id").as("src"),
        explode(array(lit(2), lit(3), lit(4))).as("j"))
      .select(col("src"), ((col("src") + col("j")) % 40).as("dst"))
    operators.Graphs.bfsDistances(ring.unionByName(core),
        docs.where(col("doc_id") < 3).select(col("doc_id").as("node")),
        maxHops = 4)
      .orderBy("node")
  }

  /** Finite-window EWMA ([[operators.Timeseries.ewmaSmooth]]): per-user
    * event values smoothed with α = 0.3 over the trailing 10 rows,
    * (ts, event_id)-ordered. DuckDB replays via the offset self-join
    * formulation — same weights, same normalization, 4dp.
    */
  def q182Ewma(s: SparkSession, dir: String): DataFrame =
    Timeseries.ewmaSmooth(t(s, dir, "events"), "user_id",
        Seq("ts", "event_id"), "value", alpha = 0.3, lookback = 10)
      .select(col("event_id"), round(col("ewma"), 4).as("ewma"))
      .orderBy("event_id")

  /** Gini vocabulary concentration ([[operators.Quality.giniConcentration]]):
    * inequality of the top-1000 token frequencies — the corpus-diversity
    * scalar next to q167's Zipf slope. DuckDB replays the head ranking
    * (shared (n, tok) order) and the Σ(2i−n−1)xᵢ arithmetic.
    */
  def q183Gini(s: SparkSession, dir: String): DataFrame =
    operators.Quality.giniConcentration(t(s, dir, "documents"), "text",
        topN = 1000)
      .select(col("n_tokens"), col("total_count"),
        round(col("gini"), 6).as("gini"))

  /** Mahalanobis outlier scores ([[operators.Stats.mahalanobis]]) over
    * customer (acctbal, nationkey): covariance-aware distance per row,
    * inverse baked scan-side. DuckDB mirrors with the 2×2 closed-form
    * inverse from the same population moments.
    */
  def q184Mahalanobis(s: SparkSession, dir: String): DataFrame =
    operators.Stats.mahalanobis(
        t(s, dir, "customer").select(col("c_custkey"),
          col("c_acctbal"), col("c_nationkey").cast("double").as("c_nat")),
        Seq("c_acctbal", "c_nat"))
      .select(col("c_custkey"), round(col("md2"), 5).as("md2"))
      .orderBy("c_custkey")

  /** Incremental join maintenance ([[operators.Incremental.deltaJoin]]):
    * orders and customer each split into a snapshot and an insert delta;
    * the materialized snapshot join UNION the three delta-join terms must
    * equal the full refreshed join — the oracle IS the plain full join,
    * so the hash match proves the maintenance identity end to end.
    */
  def q185DeltaJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val (snapO, deltaO) = (o.where(col("o_orderkey") % 10 < 9),
      o.where(col("o_orderkey") % 10 === 9))
    val (snapC, deltaC) = (c.where(col("c_custkey") % 7 < 6),
      c.where(col("c_custkey") % 7 === 6))
    val renamedO = (d: DataFrame) => d.select(col("o_custkey").as("custkey"),
      col("o_orderstatus"), col("o_totalprice"))
    val renamedC = (d: DataFrame) => d.select(col("c_custkey").as("custkey"),
      col("c_mktsegment"))
    val materialized = renamedO(snapO).join(renamedC(snapC), Seq("custkey"))
    val delta = operators.Incremental.deltaJoin(
      renamedO(snapO), renamedO(deltaO),
      renamedC(snapC), renamedC(deltaC), Seq("custkey"))
    materialized.unionByName(delta)
      .groupBy("o_orderstatus", "c_mktsegment")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus", "c_mktsegment")
  }

  /** Int8 embedding quantization ([[operators.EmbeddingStats.quantizeInt8]]):
    * per-dimension min-max codes for the whole embeddings table. DuckDB
    * replays the per-dim extents and the floor(+½) code rule digit for
    * digit. Codes are EXPLODED to scalar `(vec_id, dim, code)` rows (the
    * q143 embed-cov pattern) so the driver comparator — which sorts
    * columns in pandas and cannot hash array cells — can triple-check
    * every code.
    */
  def q186QuantizeInt8(s: SparkSession, dir: String): DataFrame = {
    val (codes, _) = operators.EmbeddingStats.quantizeInt8(
      Tables.loadEmbeddings(s, dir), "vec_id", "embedding")
    codes
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("dim", "code")))
      .orderBy("vec_id", "dim")
  }

  /** Perceptual near-duplicate images
    * ([[operators.Multimodal.nearDupImages]]): a real-PNG corpus (docs
    * < 60 rasterized) unioned with one-character-edited re-rasters at
    * id+10000 — dHash banding + Hamming verify finds the planted
    * pairs. Rows-only (ImageIO has no DuckDB mirror), so the output
    * CARRIES its own measured number (the q148/q157/q191 convention):
    * every pair row is flagged `is_planted`, and the constant
    * `planted_recall` column reports found-planted / planted — the
    * ground truth is known by construction (one edited twin per base
    * doc), so the gate artifact itself proves the dHash family's recall
    * instead of leaving it spec-only in MultimodalSpec.
    */
  def q187ImageNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") < 60)
    val base = operators.Multimodal.textToPng(docs, "doc_id", "text")
    val edited = operators.Multimodal.textToPng(
      docs.select((col("doc_id") + 10000).as("doc_id"),
        overlay(col("text"), lit("X"), lit(1)).as("text")),
      "doc_id", "text")
    val pairs = operators.Multimodal.nearDupImages(
        base.unionByName(edited).toDF(), maxHamming = 3)
      .withColumn("is_planted", col("id_b") === col("id_a") + 10000L)
      .localCheckpoint() // feeds both the recall aggregate and the rows
    val nPlanted = docs.agg(count(lit(1)).as("n_planted"))
    val recall = pairs.agg(
        sum(when(col("is_planted"), 1L).otherwise(0L)).as("n_planted_found"))
      .crossJoin(broadcast(nPlanted))
      .select(col("n_planted"), col("n_planted_found"),
        round(col("n_planted_found") / col("n_planted"), 4)
          .as("planted_recall"))
    pairs.crossJoin(broadcast(recall))
      .orderBy("id_a", "id_b")
  }

  /** OOV rate ([[operators.Quality.oovRate]]): vocabulary = the top-500
    * tokens of the EVEN documents, scored over the odd documents — the
    * tokenizer-migration coverage check. DuckDB replays the shared
    * (count desc, token) head cut and the per-doc rollup.
    */
  def q188OovRate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val vocab = docs.where(col("doc_id") % 2 === 0)
      .select(explode(filter(split(col("text"), " "),
        tk => length(tk) > 0)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("token")).limit(500)
      .select("token")
    operators.Quality.oovRate(docs.where(col("doc_id") % 2 === 1),
        "doc_id", "text", vocab)
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(col("oov_rate"), 6).as("oov_rate"))
      .orderBy("doc_id")
  }

  /** Trimmed mean ([[operators.Analytics.trimmedMean]]): extended price
    * per return flag inside the [5%, 95%] band — the robust mean.
    * quantile_cont ≡ Spark percentile (the q158 identity), so cuts and
    * band membership replay exactly.
    */
  def q189TrimmedMean(s: SparkSession, dir: String): DataFrame =
    Analytics.trimmedMean(t(s, dir, "lineitem"), "l_returnflag",
        "l_extendedprice", lo = 0.05, hi = 0.95)
      .select(col("l_returnflag"), col("n"), col("n_kept"),
        round(col("lo_cut"), 4).as("lo_cut"),
        round(col("hi_cut"), 4).as("hi_cut"),
        round(col("trimmed_mean"), 4).as("trimmed_mean"))
      .orderBy("l_returnflag")

  /** Blocked linear MMD² ([[operators.EmbeddingStats.mmdLinear]]): even
    * vec_ids as the reference sample, odd as current, RBF γ = 0.02,
    * 8-id blocks — same-distribution samples score ≈ 0. DuckDB replays
    * blocks, the 2+2 member pick and the kernel arithmetic exactly.
    */
  def q190MmdDrift(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.loadEmbeddings(s, dir)
    operators.EmbeddingStats.mmdLinear(
        e.where(col("vec_id") % 2 === 0), e.where(col("vec_id") % 2 === 1),
        "vec_id", "embedding", gamma = 0.02, blockWidth = 8)
      .select(col("n_blocks"), round(col("mmd2"), 8).as("mmd2"))
  }

  /** CMS join-size estimate ([[operators.Sketches.cmsJoinSizeEstimate]]):
    * |orders ⋈ lineitem| on the order key from two constant-size
    * sketches, zero join work. Rows-only (the estimate is sketch-level;
    * SketchSpec pins the one-sided true ≤ est ≤ true + ε·|A|·|B| bound
    * against the exact join count) — and the gate artifact carries the
    * MEASURED error itself: the row joins the exact join count and
    * reports `rel_err`, so a reader of CORRECTNESS_r{N} sees the observed
    * overestimate without trusting the spec.
    */
  def q191CmsJoinSize(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val lineitem = t(s, dir, "lineitem")
    val (est, na, nb) = operators.Sketches.cmsJoinSizeEstimate(
      orders, "o_orderkey", lineitem, "l_orderkey")
    val exact = orders.select(col("o_orderkey"))
      .join(lineitem.select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"))
      .count()
    import s.implicits._
    Seq((est, exact, na, nb))
      .toDF("join_size_estimate", "join_size_exact", "n_orders", "n_lineitem")
      .withColumn("rel_err", round(
        abs(col("join_size_estimate") - col("join_size_exact")) /
          col("join_size_exact"), 6))
      // the sketch's one-sided guarantee: true <= est <= true + eps*|A|*|B|
      // (the eps term dominates at small SF — a fixed-width CMS's join
      // error is quadratic in rows while the true join is linear, so the
      // artifact reports the bound next to the observed error)
      .withColumn("error_bound",
        (lit(0.0005) * col("n_orders") * col("n_lineitem")).cast("long"))
      .withColumn("within_bound",
        col("join_size_estimate") >= col("join_size_exact") &&
        col("join_size_estimate") <= col("join_size_exact") + col("error_bound"))
  }

  /** Bootstrap mean CI ([[operators.Stats.bootstrapMeanCI]]): the error
    * bar on mean event value from 100 deterministic Poissonized
    * resamples. Rows-only (xxhash64 has no DuckDB mirror); StatsSpec
    * pins determinism, the σ/√n width law and coverage of the true mean.
    */
  def q192BootstrapCi(s: SparkSession, dir: String): DataFrame =
    operators.Stats.bootstrapMeanCI(t(s, dir, "events"), "event_id",
        "value", replicates = 100)
      .select(round(col("mean"), 6).as("mean"),
        round(col("ci_lo"), 6).as("ci_lo"),
        round(col("ci_hi"), 6).as("ci_hi"), col("replicates"))

  /** Oracle-anchored Poisson bootstrap
    * ([[operators.Stats.bootstrapMeanCIExact]]): md5-hex-digit uniforms
    * make the whole resample — weights, replicate means, interpolated
    * percentile bounds — replay digit-for-digit in DuckDB. The xxhash64
    * production variant (q192) keeps its rows-only check; this anchors
    * the machinery.
    */
  def q192bBootstrapExact(s: SparkSession, dir: String): DataFrame =
    operators.Stats.bootstrapMeanCIExact(t(s, dir, "events"), "event_id",
        "value", replicates = 100)
      .select(round(col("mean"), 6).as("mean"),
        round(col("ci_lo"), 6).as("ci_lo"),
        round(col("ci_hi"), 6).as("ci_hi"), col("replicates"))

  /** One-pass column profile ([[operators.Quality.profile]]) of customer:
    * row/null/distinct counts and native-type extremes per column —
    * the catalog profiling report. DuckDB replays per column (string
    * rendering pinned to int/string columns, where both engines agree).
    */
  def q193Profile(s: SparkSession, dir: String): DataFrame =
    operators.Quality.profile(t(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
      .orderBy("column")

  /** Observed-metrics telemetry ([[operators.Observe]]): the standard
    * write-side bundle (row count, null count, measure total) captured
    * from a CollectMetrics node riding a foreachPartition action — then
    * surfaced as a one-row frame the DuckDB oracle recomputes with plain
    * aggregates. Proves the side-channel reports exactly what a real
    * aggregate would.
    */
  def q194Observe(s: SparkSession, dir: String): DataFrame = {
    val df = operators.Observe.instrumentStandard(t(s, dir, "orders"),
      "m", nullCols = Seq("o_orderpriority"),
      measureCol = Some("o_totalprice"))
    // collect() runs the frame's OWN QueryExecution, which is where the
    // CollectMetrics accumulators live (foreachPartition uses a separate
    // RDD execution and reports nothing here) — harness-scale only; a
    // production pipeline reads metrics off its write action instead
    df.collect()
    val m = operators.Observe.metricsOf(df)("m")
    import s.implicits._
    Seq((m.getAs[Long]("n_rows"), m.getAs[Long]("n_null_o_orderpriority"),
        BigDecimal(m.getAs[Double]("sum_o_totalprice"))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_rows", "n_null_priority", "sum_totalprice")
  }

  /** Materialized-view rewrite ([[plans.MvRewriteRule]]): a
    * (returnflag, linestatus) rollup of lineitem is materialized once per
    * gate dir; the query aggregates the BASE table by returnflag and the
    * optimizer navigates it onto the summary — asserted here by plan
    * inspection (the scan must read the MV files), then hash-matched
    * against DuckDB running the plain base-table SQL. The rewrite flag is
    * scoped to this query: the result materializes inside the builder and
    * returns as a local relation, so no other gate query re-plans.
    */
  def q195MvRewrite(s: SparkSession, dir: String): DataFrame = {
    val mvRoot = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_mv_q195_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
    // (re)materialize + register unconditionally: the rollup is 6 rows,
    // the write is deterministic, and a fresh session's registry must
    // re-learn the mapping either way
    this.synchronized {
      plans.MaterializedViews.create(s, t(s, dir, "lineitem"), mvRoot,
        groupCols = Seq("l_returnflag", "l_linestatus"),
        measures = Seq("l_quantity", "l_extendedprice"))
    }
    s.conf.set(plans.MvRewriteRule.EnabledKey, "true")
    try {
      val q = t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(min("l_extendedprice"), 2).as("min_price"),
          round(max("l_extendedprice"), 2).as("max_price"))
        .orderBy("l_returnflag")
      val plan = q.queryExecution.executedPlan.toString
      require(plan.contains(new java.io.File(mvRoot).getName),
        "MV rewrite did not fire: scan still reads the base table")
      val rows = q.collect()
      s.createDataFrame(
        java.util.Arrays.asList(rows: _*), q.schema)
    } finally s.conf.set(plans.MvRewriteRule.EnabledKey, "false")
  }

  /** Geo proximity join ([[graft.functions.Geo.neighborPairs]]): synthetic
    * station coordinates from customer keys — points march north in
    * ~1.1 km steps (lat = (key mod 1000)·0.01°) along columns 0.5° of
    * longitude apart, so every scale factor has real 5 km neighborhoods
    * and no cross-column pair. All pairs within 5 km via the 3×3
    * grid-cell candidate join + exact haversine verify; the oracle is
    * the PLAIN all-pairs cross join with the same formula — the hash
    * match proves the blocking loses nothing.
    */
  def q196GeoPairs(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "customer").select(col("c_custkey").as("id"),
      (col("c_custkey") % 1000 * 0.01).as("lat"),
      (floor(col("c_custkey") / 1000.0) * 0.5).as("lon"))
    graft.functions.Geo.neighborPairs(pts, "id", "lat", "lon", maxKm = 5.0)
      .select(col("id_a"), col("id_b"), round(col("km"), 4).as("km"))
      .orderBy("id_a", "id_b")
  }

  /** Spearman rank correlation ([[operators.Stats.spearman]]) between
    * quantity and discount — monotone association over two bounded value
    * domains (50 × 11 distinct values). DuckDB replays the tied-rank
    * collapse and Pearson-of-ranks exactly.
    */
  def q197Spearman(s: SparkSession, dir: String): DataFrame =
    operators.Stats.spearman(t(s, dir, "lineitem"),
        "l_quantity", "l_discount")
      .select(col("n"), round(col("rho"), 6).as("rho"))

  /** Kaplan-Meier survival ([[operators.Stats.kaplanMeier]]) of
    * inter-event waiting times: each event's gap to the user's next
    * event is a subject (10-minute grain); a user's final gap runs to
    * the stream horizon and is right-censored. DuckDB replays the
    * truncated-epoch lead gaps, the risk-set running sums and the
    * survival product.
    */
  def q198KaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val w = Window.partitionBy("user_id").orderBy("__t", "event_id")
    val horizon = ev.agg(max(col("ts").cast("long")).as("__hmax"))
    val subjects = ev
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("__t"))
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .crossJoin(broadcast(horizon))
      .select(
        floor((coalesce(col("__next"), col("__hmax")) - col("__t")) / 600)
          .as("d"),
        col("__next").isNotNull.cast("int").as("ev"))
    operators.Stats.kaplanMeier(subjects, "d", "ev")
      .select(col("t").cast("long").as("t"), col("n_at_risk"),
        col("n_events"), col("n_censored"),
        round(col("survival"), 6).as("survival"))
      .orderBy("t")
  }

  /** ROC-AUC ([[operators.Stats.auc]]) of the q170 pseudo-score against
    * the quantity label — the rank-sum identity, no curve materialized.
    * DuckDB replays the tied-rank U and the n⁺·n⁻ normalization.
    */
  def q199Auc(s: SparkSession, dir: String): DataFrame =
    operators.Stats.auc(
        t(s, dir, "lineitem").select(
          (((col("l_orderkey") * 7 + col("l_linenumber")) % 100) /
            lit(100.0)).as("score"),
          (col("l_quantity") > 25).cast("int").as("label")),
        "score", "label")
      .select(col("n_pos"), col("n_neg"), round(col("auc"), 6).as("auc"))

  /** Precision/recall curve ([[operators.Stats.prCurve]]) over the same
    * scored frame: one row per threshold with cumulative TP/FP,
    * precision, recall, F1. DuckDB replays the descending running sums.
    */
  def q200PrCurve(s: SparkSession, dir: String): DataFrame =
    operators.Stats.prCurve(
        t(s, dir, "lineitem").select(
          (((col("l_orderkey") * 7 + col("l_linenumber")) % 100) /
            lit(100.0)).as("score"),
          (col("l_quantity") > 25).cast("int").as("label")),
        "score", "label")
      .select(round(col("threshold"), 2).as("threshold"), col("tp"),
        col("fp"), round(col("precision"), 6).as("precision"),
        round(col("recall"), 6).as("recall"),
        round(col("f1"), 6).as("f1"))
      .orderBy("threshold")

  /** Jaro + Jaro-Winkler scores over all distinct part-name pairs — the
    * cross-engine anchor for the native [[operators.Linkage]] similarity
    * expressions (fuzz-locked against DuckDB's rapidfuzz-derived
    * semantics: integer transposition halving, boost only above 0.7).
    * The all-pairs join is bounded by the DISTINCT name vocabulary
    * (dozens), never the part table — the q87-style exact-anchor budget.
    */
  def q201JaroWinkler(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "part").select(col("p_name").as("name")).distinct()
    val l = names.select(col("name").as("name_a"))
    val r = names.select(col("name").as("name_b"))
    l.crossJoin(r).where(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"),
        round(operators.Linkage.jaro(col("name_a"), col("name_b")), 6).as("jaro"),
        round(operators.Linkage.jaroWinkler(col("name_a"), col("name_b")), 6).as("jw"))
      .where(col("jw") >= 0.5)
      .orderBy("name_a", "name_b")
  }

  /** Record-linkage corpus for q202/q203: document "titles" (first six
    * words) plus a deterministically dirtied copy — one character deleted
    * at position doc_id mod len. Single-deletion noise is exactly what
    * prefix/suffix blocking provably catches (keys are ≥ 21 chars ≥ 2k);
    * the accidental high-JW pairs between DIFFERENT titles exercise the
    * mid-token pass.
    */
  private def linkageRecords(s: SparkSession, dir: String): DataFrame = {
    // pinned: the key derivation splits EVERY document's full text; both
    // the dirty branch below and the union consumer re-scan this frame, so
    // without the pin the corpus-wide split runs twice per invocation. The
    // pinned frame is (id, ≤6-word key) — corpus-key-sized, never the texts.
    val clean = t(s, dir, "documents").select(
      col("doc_id").as("id"),
      array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 6), " ").as("key"))
      .localCheckpoint(eager = false)
    val dirty = clean
      .withColumn("__p", (col("id") % length(col("key"))).cast("int"))
      .select(
        (col("id") + 1000000L).as("id"),
        concat(
          col("key").substr(lit(1), col("__p")),
          col("key").substr(col("__p") + 2, length(col("key")))).as("key"))
    clean.unionAll(dirty)
  }

  /** Record linkage ([[operators.Linkage.linkPairs]]): multi-pass blocked
    * candidates (prefix-4 ∪ suffix-4 ∪ middle-tokens) verified at
    * JW ≥ 0.9. The oracle replays the SAME blocking in SQL (the q162
    * equivalence trick), so the hash match proves the blocking join + the
    * native JW expression + the threshold pipeline; RECALL vs brute force
    * is measured separately in LinkageSpec (100% on the planted
    * single-deletion links, ≥99% overall on this corpus).
    */
  def q202EntityMatch(s: SparkSession, dir: String): DataFrame =
    operators.Linkage.linkPairs(linkageRecords(s, dir), "id", "key", 0.9)
      .orderBy("id_a", "id_b")

  /** Entity resolution ([[operators.Linkage.resolveEntities]]): linked
    * pairs at JW ≥ 0.94 → connected components → per-record entity label
    * + golden record (min id's key). Oracle: recursive-CTE closure over
    * the identically-blocked pair set (the q77 pattern).
    */
  def q203EntityResolve(s: SparkSession, dir: String): DataFrame =
    operators.Linkage.resolveEntities(linkageRecords(s, dir), "id", "key", 0.94)
      .orderBy("id")

  /** Aho-Corasick termlist tagging ([[operators.Linkage.tagTerms]]): the
    * 20 most frequent 3-token shingles (deterministic count-desc,
    * term-asc order) matched against every document in ONE automaton
    * pass. The oracle is the k-way `contains` join — the hash match
    * proves the single-pass automaton ≡ k substring scans.
    */
  def q204PhraseMatch(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val terms = docs
      .select(explode(Text.shingles(col("text"), 3)).as("s"))
      .groupBy("s").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("s")).limit(20)
      .select("s").collect().map(_.getString(0)).toSeq // bounded: top-20
    val termArr = typedLit(terms)
    operators.Linkage.tagTerms(
        docs.select(col("doc_id"), lower(col("text")).as("__lt")), "__lt", terms)
      .select(col("doc_id"),
        size(col("matched_terms")).cast("long").as("n_matched"),
        array_join(
          sort_array(transform(col("matched_terms"),
            i => element_at(termArr, i + 1))), "|").as("matched"))
      .orderBy("doc_id")
  }

  /** Additive seasonal decomposition ([[operators.Timeseries.seasonalDecompose]]):
    * hourly bins against a 24-bin (daily) period over event values —
    * observed = seasonal + residual per bin. DuckDB replays the grid
    * aggregate and the period-partitioned window mean.
    */
  def q205Seasonal(s: SparkSession, dir: String): DataFrame =
    // residual is re-derived from the ROUNDED parents (not rounded from the
    // raw residual): DuckDB's parallel avg drifts ~1 ulp run-to-run, and the
    // raw observed−seasonal happened to sit on a 6dp rounding boundary, so
    // round(residual, 6) flapped by exactly 1e-6 across oracle runs. The
    // 6dp parents are boundary-stable; their difference is then exact.
    operators.Timeseries.seasonalDecompose(t(s, dir, "events"), "ts", "value",
        binSeconds = 3600L, periodBins = 24)
      .select(col("bin"), col("pos"), round(col("observed"), 6).as("observed"),
        round(col("seasonal"), 6).as("seasonal"))
      .withColumn("residual",
        round(col("observed") - col("seasonal"), 6))
      .orderBy("bin")

  /** Seasonally-adjusted anomalies ([[operators.Timeseries.seasonalAnomalies]]):
    * bins whose value deviates ≥ 1.5σ from their hour-of-day baseline —
    * the deseasonalized screen (a nightly lull is not an anomaly; a
    * nightly spike is).
    */
  def q206SeasonalAnomaly(s: SparkSession, dir: String): DataFrame =
    operators.Timeseries.seasonalAnomalies(t(s, dir, "events"), "ts", "value",
        binSeconds = 3600L, periodBins = 24, zThreshold = 1.5)
      .select(col("bin"), col("pos"), round(col("observed"), 6).as("observed"),
        col("z"))
      .orderBy("bin")

  /** Two-sided CUSUM ([[operators.Timeseries.cusum]]) over per-type daily
    * value means (slack 0.5σ, decision interval 4σ). The oracle replays
    * the closed form — prefix sum minus running min — proving the
    * recursion identity cross-engine.
    */
  def q207Cusum(s: SparkSession, dir: String): DataFrame =
    operators.Timeseries.cusum(t(s, dir, "events"), "event_type", "ts",
        "value", binSeconds = 86400L, kSigma = 0.5, hSigma = 4.0)
      .select(col("key"), col("bin"), round(col("x"), 6).as("x"),
        col("s_pos"), col("s_neg"), col("change"))
      .orderBy("key", "bin")

  /** Two-sample Kolmogorov–Smirnov ([[operators.Stats.ksTest]]): did the
    * purchase-event value DISTRIBUTION differ from the view-event one —
    * values quantized to integers (the rank family's bounded-domain
    * contract). DuckDB replays the per-value counts, the ECDF running
    * sums, the sup-gap and the 50-term Kolmogorov p-value series exactly.
    */
  def q208KsTest(s: SparkSession, dir: String): DataFrame =
    operators.Stats.ksTest(
        t(s, dir, "events").withColumn("v", floor(col("value"))),
        "v", "event_type", groupA = "purchase", groupB = "view")
      .select(col("n_a"), col("n_b"), round(col("d_stat"), 6).as("d_stat"),
        round(col("p_value"), 4).as("p_value"))

  /** Kendall τ-b ([[operators.Stats.kendallTau]]) between l_quantity
    * (50-value domain) and l_discount (11-value domain) — the
    * contingency-table formulation, so DuckDB's oracle is the same
    * cell-pair double-sum join, never an O(N²) row self-join.
    */
  def q209KendallTau(s: SparkSession, dir: String): DataFrame =
    operators.Stats.kendallTau(t(s, dir, "lineitem"),
        "l_quantity", "l_discount")
      .select(col("n"), round(col("tau_b"), 6).as("tau_b"))

  /** Decile lift/gain ([[operators.Stats.liftGain]]) on the same
    * deterministic score/label pair the calibration and ROC queries use
    * (score = hash-ish of the order key, label = quantity > 25), so the
    * whole classifier-eval family reads off one corpus.
    */
  def q210LiftGain(s: SparkSession, dir: String): DataFrame =
    operators.Stats.liftGain(
        t(s, dir, "lineitem")
          .withColumn("score",
            ((col("l_orderkey") * 7 + col("l_linenumber")) % 100) / 100.0)
          .withColumn("label", (col("l_quantity") > 25).cast("int")),
        "score", "label")
      .select(col("decile"), col("cum_rows"), col("cum_pos"),
        round(col("gain"), 6).as("gain"), round(col("lift"), 6).as("lift"))

  /** URL curation ([[functions.Urls]]): messy crawl URLs are synthesized
    * DETERMINISTICALLY from document fields (mixed-case scheme/host,
    * default ports, `www.`, tracking params, fragments, trailing slashes,
    * three TLD shapes incl. a two-level public suffix), canonicalized,
    * grouped to registered domains, and capped per domain with the same
    * md5-order recipe as q100. Per-ROW hash compare: the oracle replays
    * every regexp of the canonicalizer, so a match is an equivalence
    * proof of the whole chain, not just of an aggregate.
    */
  def q211UrlCuration(s: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val messy = concat(
      lit("HTTPS://WWW."), col("source"),
      when(d % 3 === 0, lit(".Example.COM:443"))
        .when(d % 3 === 1, lit(".sample.CO.UK:443"))
        .otherwise(lit(".test.ORG")),
      lit("/Docs/"), d.cast("string"),
      when(d % 4 === 0,
        concat(lit("/?utm_source=feed&utm_campaign=c"),
          (d % 5).cast("string")))
        .when(d % 4 === 1,
          concat(lit("?id="), (d % 7).cast("string"),
            lit("&utm_medium=email")))
        .when(d % 4 === 2, lit("/"))
        .otherwise(lit("?a=1&b=2")),
      when(d % 3 === 0, lit("#sec")).otherwise(lit("")))
    val canon = t(s, dir, "documents")
      .withColumn("url", functions.Urls.canonicalize(messy))
      .withColumn("domain",
        functions.Urls.registeredDomain(functions.Urls.host(messy)))
    operators.Splits.balancedDownsample(canon, Seq("domain"), 60L, "doc_id")
      .select(col("doc_id"), col("url"), col("domain"))
      .orderBy("doc_id")
  }

  /** Top consecutive 3-step event paths
    * ([[operators.EventAnalytics.topPaths]]): one user-keyed window feeds
    * both leads; DuckDB replays the window, the path concat and the
    * support ordering (total order: support desc, then path).
    */
  def q212TopPaths(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.topPaths(t(s, dir, "events"),
      "user_id", "ts", "event_id", "event_type", steps = 3, topK = 20)

  /** Signed random projection 64→16
    * ([[operators.EmbeddingStats.signedRandomProjection]]): the
    * quadratic-congruential sign matrix lets DuckDB rebuild the exact
    * projection with integer mod arithmetic and a list_transform dot
    * product — a per-(vector, output-dim) hash-equivalence proof of the
    * whole JL reducer.
    */
  def q213RandomProjection(s: SparkSession, dir: String): DataFrame =
    operators.EmbeddingStats.signedRandomProjection(
        t(s, dir, "embeddings"), "embedding", inDim = 64, outDim = 16)
      .select(col("vec_id"), posexplode(col("rp")))
      .select(col("vec_id"), col("pos").as("dim"),
        round(col("col"), 6).as("proj"))
      .orderBy("vec_id", "dim")

  /** Interpolated Kneser–Ney scoring
    * ([[operators.Quality.kneserNeyLogProb]]) against the same trusted
    * src0–src4 reference corpus as q110 — the oracle extends q110's
    * n-gram CTEs with both fertility tables and replays the discounted
    * interpolation exactly.
    */
  def q214KneserNey(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val ref = docs.where(col("source")
      .isin("src0", "src1", "src2", "src3", "src4"))
    operators.Quality.kneserNeyLogProb(docs, ref, "doc_id", "text")
      .select(col("doc_id"), round(col("nll_kn"), 4).as("nll_kn"),
        col("n_bigrams").cast("long").as("n_bigrams"))
      .orderBy("doc_id")
  }

  /** Cross-source quantile normalization
    * ([[operators.Analytics.quantileNormalize]]): event values quantized
    * to integers, each event type's distribution mapped onto the global
    * one — DuckDB replays the per-group midpoint ECDF, the global ECDF
    * and the inverse-CDF inequality join.
    */
  def q215QuantileNorm(s: SparkSession, dir: String): DataFrame =
    operators.Analytics.quantileNormalize(
        t(s, dir, "events").withColumn("v", floor(col("value"))),
        "event_type", "v")
      .select(col("event_type"), col("v"), round(col("p"), 6).as("p"),
        col("mapped"))
      .orderBy("event_type", "v")

  /** Mutual kNN ([[operators.Similarity.mutualKnn]]) over a brute-force
    * top-5 on a scale-coupled corpus tenth — the all-pairs anchor shape
    * of the ANN family; DuckDB replays the cosine ranking and the
    * reciprocity join exactly.
    */
  def q216MutualKnn(s: SparkSession, dir: String): DataFrame = {
    val sub = t(s, dir, "embeddings").where(col("vec_id") % 10 === 0)
    operators.Similarity.mutualKnn(
        operators.Similarity.bruteForceTopK(sub, sub, "vec_id",
          "embedding", k = 5))
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"),
        col("rank_ab").cast("long").as("rank_ab"),
        col("rank_ba").cast("long").as("rank_ba"))
      .orderBy("id_a", "id_b")
  }

  /** Welch's t ([[operators.Stats.welchT]]) between purchase and view
    * event values — same two groups as the KS and Mann-Whitney gates, so
    * the three test families read off one comparison.
    */
  def q217WelchT(s: SparkSession, dir: String): DataFrame =
    operators.Stats.welchT(t(s, dir, "events"), "value", "event_type",
        groupA = "purchase", groupB = "view")
      .select(col("n_a"), col("n_b"),
        round(col("mean_a"), 6).as("mean_a"),
        round(col("mean_b"), 6).as("mean_b"),
        round(col("t"), 6).as("t"),
        round(col("df_welch"), 4).as("df_welch"),
        round(col("cohen_d"), 6).as("cohen_d"))

  /** DP noisy counts ([[operators.Stats.dpNoisyCounts]]): the md5-seeded
    * Laplace draw is parsed hex-digit-by-digit in BOTH engines, so the
    * noise itself — not just the true counts — hash-matches.
    */
  def q218DpCounts(s: SparkSession, dir: String): DataFrame =
    operators.Stats.dpNoisyCounts(t(s, dir, "events"), Seq("event_type"),
        epsilon = 1.0, salt = "r0")
      .select(col("event_type"), col("n_true"),
        round(col("n_noisy"), 4).as("n_noisy"))
      .orderBy("event_type")

  /** CUPED ([[operators.EventAnalytics.cuped]]): per-user pre/post value
    * sums split at the corpus's midpoint timestamp (a scalar aggregate —
    * the A5 pattern), variant = user parity; DuckDB replays the moment
    * sums and the θ-adjustment algebra.
    */
  def q219Cuped(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"),
      unix_timestamp(col("ts")).as("ep"), col("value"))
    val mid = e.agg(
      floor((min("ep") + max("ep")) / 2.0).cast("long").as("__mid"))
    val perUser = e.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(sum(when(col("ep") <= col("__mid"), col("value"))
          .otherwise(0.0)).as("x"),
        sum(when(col("ep") > col("__mid"), col("value"))
          .otherwise(0.0)).as("y"))
    operators.EventAnalytics.cuped(perUser, col("user_id") % 2, "x", "y")
      .select(col("n_a"), col("n_b"),
        round(col("theta"), 4).as("theta"),
        round(col("mean_a"), 4).as("mean_a"),
        round(col("mean_b"), 4).as("mean_b"),
        round(col("diff"), 4).as("diff"),
        round(col("adj_diff"), 4).as("adj_diff"),
        round(col("var_reduction"), 4).as("var_reduction"))
  }

  /** Theil–Sen trend ([[operators.Timeseries.theilSenTrend]]) over daily
    * event-value bins per type — bounded bin-pair slopes, interpolated
    * medians; DuckDB replays with quantile_cont.
    */
  def q220TheilSen(s: SparkSession, dir: String): DataFrame =
    operators.Timeseries.theilSenTrend(t(s, dir, "events"), "event_type",
        "ts", "value", binSeconds = 86400L)
      .select(col("event_type"), col("n_bins"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"))
      .orderBy("event_type")

  /** Sparse TF-IDF cosine join
    * ([[operators.Retrieval.tfidfCosineJoin]]): term-partitioned partial
    * products, stopword cap at 30 % df; the oracle rebuilds tf, idf,
    * norms and the pair dots from the same tokenization CTE.
    */
  def q221TfidfCosine(s: SparkSession, dir: String): DataFrame =
    operators.Retrieval.tfidfCosineJoin(t(s, dir, "documents"), "doc_id",
        "text", threshold = 0.3, maxDfRatio = 0.3)
      .select(col("doc_a"), col("doc_b"), col("n_shared_terms"),
        round(col("cos"), 6).as("cos"))
      .orderBy("doc_a", "doc_b")

  /** Split-conformal interval ([[operators.Stats.conformalInterval]]):
    * the "model" is the per-type mean event value (a deterministic
    * group-mean join), calibration = even event ids; DuckDB replays the
    * residual quantization, the order-statistic rank k and the eval
    * coverage.
    */
  def q222Conformal(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    // midrange predictor: min/max are exact selections, so the residuals
    // are bit-identical across engines (an avg-based predictor would put
    // order-dependent ulps under the round-6 quantization boundary)
    val means = ev.groupBy("event_type")
      .agg(((min("value") + max("value")) / 2).as("pred"))
    operators.Stats.conformalInterval(
        ev.join(broadcast(means), "event_type"), "pred", "value",
        calibFlag = col("event_id") % 2 === 0, alpha = 0.1)
      .select(col("n_calib"), col("k"), round(col("q_hat"), 6).as("q_hat"),
        col("n_eval"), round(col("coverage"), 6).as("coverage"))
  }

  /** Seasonal-naive backtest
    * ([[operators.Timeseries.backtestSeasonalNaive]]): hourly bins,
    * 24-bin season, 3 expanding folds per event type; the bin-keyed
    * season join (not a positional lag) and the arithmetic fold edges
    * replay exactly.
    */
  def q223Backtest(s: SparkSession, dir: String): DataFrame =
    operators.Timeseries.backtestSeasonalNaive(t(s, dir, "events"),
        "event_type", "ts", "value", binSeconds = 3600L,
        periodBins = 24, folds = 3)
      .select(col("event_type"), col("fold"), col("n_scored"),
        round(col("smape"), 6).as("smape"))
      .orderBy("event_type", "fold")

  /** Brier decomposition ([[operators.Stats.brierDecomposition]]) on the
    * classifier-eval family's standard score/label pair — reliability,
    * resolution, uncertainty and the explicit within-bin gap.
    */
  def q224Brier(s: SparkSession, dir: String): DataFrame =
    operators.Stats.brierDecomposition(
        t(s, dir, "lineitem")
          .withColumn("score",
            ((col("l_orderkey") * 7 + col("l_linenumber")) % 100) / 100.0)
          .withColumn("label", (col("l_quantity") > 25).cast("int")),
        "score", "label")
      .select(col("n"), round(col("brier"), 6).as("brier"),
        round(col("reliability"), 6).as("reliability"),
        round(col("resolution"), 6).as("resolution"),
        round(col("uncertainty"), 6).as("uncertainty"),
        round(col("decomposition_gap"), 6).as("decomposition_gap"))

  /** Interval-overlap self-join ([[operators.Joins.intervalOverlapJoin]]):
    * events become [start, start + 60 + 10·value) activity intervals;
    * pairs of overlapping intervals for the SAME user, emitted once via
    * the grid's later-start cell. DuckDB replays with the plain
    * inequality join (exact at sf0.01; the grid is the scale path).
    */
  def q225IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    val iv = sources.Tables.loadEvents(s, dir)
      .withColumn("__s", unix_timestamp(col("ts")))
      .withColumn("__e",
        col("__s") + 60L + floor(col("value") * 10).cast("long"))
    val left = iv.select(col("user_id"), col("event_id").as("a_id"),
      col("__s").as("a_s"), col("__e").as("a_e"))
    val right = iv.select(col("user_id"), col("event_id").as("b_id"),
      col("__s").as("b_s"), col("__e").as("b_e"))
    operators.Joins.intervalOverlapJoin(left, right, "a_s", "a_e",
        "b_s", "b_e", binWidth = 3600.0, keys = Seq("user_id"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e")) -
          greatest(col("a_s"), col("b_s"))).as("overlap_sec"))
      .orderBy("a_id", "b_id")
  }

  /** MAD robust outliers ([[operators.Stats.madOutliers]]) on event
    * values per type; DuckDB replays the lower-median running-sum
    * convention for both medians.
    */
  def q226MadOutliers(s: SparkSession, dir: String): DataFrame =
    operators.Stats.madOutliers(
        sources.Tables.loadEvents(s, dir)
          .select("event_id", "event_type", "value"),
        "event_type", "value", k = 2.5)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 6).as("value"), round(col("med"), 6).as("med"),
        round(col("mad"), 6).as("mad"),
        round(col("robust_z"), 6).as("robust_z"), col("is_outlier"))
      .orderBy("event_id")

  /** Padding-waste profile ([[operators.Splits.paddingWaste]]) over
    * whitespace token counts at bucket width 32 — the batching-config
    * review table.
    */
  def q227PaddingWaste(s: SparkSession, dir: String): DataFrame =
    operators.Splits.paddingWaste(
        t(s, dir, "documents")
          .withColumn("n_tokens", size(split(col("text"), " "))),
        "n_tokens", bucketWidth = 32L)
      .select(col("bucket"), col("bucket_lo"), col("n_seqs"),
        col("sum_tokens"), col("max_tokens"), col("padded_tokens"),
        round(col("waste_ratio"), 6).as("waste_ratio"))
      .orderBy("bucket")

  /** Linear multi-touch attribution
    * ([[operators.EventAnalytics.linearAttribution]]): purchases split
    * credit equally across the user's view/click/signup touches in the
    * trailing 7 days; the fractional-credit join replays as the same
    * inequality pairing in SQL.
    */
  def q228LinearAttribution(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.linearAttribution(
        sources.Tables.loadEvents(s, dir), "user_id", "ts", "event_type",
        "value", conversionType = "purchase",
        touchTypes = Seq("view", "click", "signup"),
        lookbackSeconds = 7L * 86400L)
      .select(col("touch_type"),
        round(col("credited_conversions"), 6).as("credited_conversions"),
        round(col("credited_value"), 6).as("credited_value"))
      .orderBy("touch_type")

  /** Shared-prefix grouping ([[operators.Dedup.commonPrefixGroups]]): a
    * per-source boilerplate header is stamped onto every doc (the
    * template-generation shape the operator exists to catch); levels 32
    * and 64 land inside the header (grouping by source), 128 reaches
    * into each doc's own text (splitting to near-singletons), 256 only
    * exists for long docs. DuckDB replays every md5 fingerprint.
    */
  def q229PrefixGroups(s: SparkSession, dir: String): DataFrame =
    operators.Dedup.commonPrefixGroups(
        t(s, dir, "documents").withColumn("stamped",
          concat(lit("["), col("source"),
            lit("] corpus preamble: license cc-by-4.0, schema v2, " +
              "generator graft, shard 0; "), col("text"))),
        "doc_id", "stamped", minPrefix = 32, maxPrefix = 256)
      .orderBy("doc_id")

  /** Event-time disorder audit ([[operators.EventAnalytics
    * .outOfOrderStats]]): arrival order is the ingest-monotone event_id;
    * event time is deterministically jittered ±(event_id % 5 − 2)·90 s
    * so real inversions exist to measure (the raw feed is perfectly
    * ordered — nothing to audit).
    */
  def q230OutOfOrder(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.outOfOrderStats(
        sources.Tables.loadEvents(s, dir)
          .withColumn("ts_jit",
            (unix_timestamp(col("ts")) +
              (col("event_id") % 5 - 2) * 90L).cast("timestamp")),
        "user_id", "event_id", "ts_jit")
      .select(col("user_id"), col("n_events"), col("n_inversions"),
        round(col("inversion_rate"), 6).as("inversion_rate"),
        col("max_backstep_sec"), col("max_watermark_lag_sec"))
      .orderBy("user_id")

  /** Per-type winsorization ([[operators.Stats.winsorize]]) of event
    * values at the 5th/95th percentile cut points; the lower-value-at-
    * rank convention replays exactly.
    */
  def q231Winsorize(s: SparkSession, dir: String): DataFrame =
    operators.Stats.winsorize(
        sources.Tables.loadEvents(s, dir)
          .select("event_id", "event_type", "value"),
        "event_type", "value", loPct = 0.05, hiPct = 0.95)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 6).as("value"),
        round(col("lo_cut"), 6).as("lo_cut"),
        round(col("hi_cut"), 6).as("hi_cut"),
        round(col("winsorized"), 6).as("winsorized"))
      .orderBy("event_id")

  /** Daily p50/p90/p99 latency-style bands
    * ([[operators.Timeseries.percentileBands]]) of event values per
    * type — exact lower-value-at-rank percentiles over the bin's value
    * domain.
    */
  def q232PercentileBands(s: SparkSession, dir: String): DataFrame =
    operators.Timeseries.percentileBands(
        sources.Tables.loadEvents(s, dir), "event_type", "ts", "value",
        binSeconds = 86400L, percentiles = Seq(50, 90, 99))
      .select(col("event_type"), col("bin"), col("n"),
        round(col("p50"), 6).as("p50"), round(col("p90"), 6).as("p90"),
        round(col("p99"), 6).as("p99"))
      .orderBy("event_type", "bin")

  /** Per-type daily OLS trend ([[operators.Timeseries.olsTrend]]) with
    * R² — five sums over the quantized bin set per key; the moment
    * algebra replays division-for-division.
    */
  def q233OlsTrend(s: SparkSession, dir: String): DataFrame =
    operators.Timeseries.olsTrend(sources.Tables.loadEvents(s, dir),
        "event_type", "ts", "value", binSeconds = 86400L)
      .select(col("event_type"), col("n_bins"), col("bin0"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"),
        round(col("r2"), 6).as("r2"))
      .orderBy("event_type")

  /** Binned mutual information ([[operators.Stats.binnedMI]]) between
    * lineitem quantity and extended price — joint/marginal histograms
    * and entropies replayed cell-for-cell.
    */
  def q234BinnedMi(s: SparkSession, dir: String): DataFrame =
    operators.Stats.binnedMI(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice")
      .select(col("n"), round(col("mi"), 6).as("mi"),
        round(col("h_x"), 6).as("h_x"), round(col("h_y"), 6).as("h_y"),
        round(col("nmi"), 6).as("nmi"))

  /** Isotonic (PAV) calibration ([[operators.Stats.isotonicCalibration]])
    * over the q170 scored fixture — the minimax over bounded bin segments
    * replays join-for-join in SQL.
    */
  def q235Isotonic(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "lineitem").select(
      (((col("l_orderkey") * 7 + col("l_linenumber")) % 100) / lit(100.0))
        .as("score"),
      (col("l_quantity") > 25).cast("int").as("label"))
    operators.Stats.isotonicCalibration(scored, "score", "label", bins = 10)
      .select(col("bin"), col("n"),
        round(col("score_mean"), 6).as("score_mean"),
        round(col("label_mean"), 6).as("label_mean"),
        round(col("fit"), 6).as("fit"))
      .orderBy("bin")
  }

  /** Weight-of-evidence / information value ([[operators.Classify.woeIv]])
    * of `source` against a median-length quality label — exact counts,
    * the same smoothing algebra division-for-division.
    */
  def q236WoeIv(s: SparkSession, dir: String): DataFrame =
    operators.Classify.woeIv(
      t(s, dir, "documents")
        .select(col("source"), (col("n_chars") > 306).cast("int").as("y")),
      "source", "y")
      .select(col("source"), col("n"), col("events"), col("nonevents"),
        round(col("woe"), 6).as("woe"),
        round(col("iv_term"), 6).as("iv_term"))
      .orderBy("source")

  /** Markov removal-effect attribution
    * ([[operators.EventAnalytics.markovAttribution]]) over the events
    * journey chain — the oracle unrolls the identical 40 power steps as
    * blocked-state-keyed CTE rounds.
    */
  def q237MarkovAttribution(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.markovAttribution(
        sources.Tables.loadEvents(s, dir), "user_id", "ts", "event_type",
        "event_id", conversionType = "purchase",
        touchTypes = Seq("click", "signup", "view"), iters = 40)
      .select(col("touch_type"), round(col("base_p"), 6).as("base_p"),
        round(col("removal_effect"), 6).as("removal_effect"),
        round(col("share"), 6).as("share"),
        round(col("credited_conversions"), 6).as("credited_conversions"))
      .orderBy("touch_type")

  /** Confident-learning joint ([[operators.Classify.confidentJoint]]) over
    * returnflag classes with deterministic pseudo-scores — thresholds,
    * argmax tie-breaks and the unconfident bucket replayed cell-for-cell.
    */
  def q238ConfidentJoint(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "lineitem").select(
      when(col("l_returnflag") === "A", 0)
        .when(col("l_returnflag") === "N", 1).otherwise(2).as("lab"),
      (((col("l_orderkey") * 7 + col("l_linenumber")) % 100) / lit(100.0))
        .as("s0"),
      (((col("l_orderkey") * 13 + col("l_linenumber")) % 100) / lit(100.0))
        .as("s1"),
      (((col("l_orderkey") * 29 + col("l_linenumber")) % 100) / lit(100.0))
        .as("s2"))
    operators.Classify.confidentJoint(scored, "lab", Seq("s0", "s1", "s2"))
      .select(col("given_label"), col("latent_label"), col("n"),
        col("n_given"), round(col("frac_of_given"), 6).as("frac_of_given"),
        col("n_unconfident"))
      .orderBy("given_label", "latent_label")
  }

  /** Duplication spectrum ([[operators.Dedup.duplicationSpectrum]]) over
    * doc text with a manufactured clone layer (docs with doc_id % 10 == 0
    * re-appear twice more) so every bucket populates — cluster sizes,
    * shares and excess replayed bucket-for-bucket.
    */
  def q239DupSpectrum(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    val clones = d.where(col("doc_id") % 10 === 0)
    operators.Dedup.duplicationSpectrum(
        d.unionByName(clones).unionByName(clones), Seq("text"))
      .select(col("bucket"), col("n_clusters"), col("n_docs"),
        round(col("docs_share"), 6).as("docs_share"), col("n_excess"))
      .orderBy("bucket")
  }

  /** Trend/seasonal strength ([[operators.Timeseries.componentStrengths]])
    * of the hourly event-value series under a daily (24-bin) lens — OLS
    * detrend, subseries seasonal means and the variance-ratio strengths
    * replayed division-for-division.
    */
  def q240ComponentStrengths(s: SparkSession, dir: String): DataFrame =
    operators.Timeseries.componentStrengths(
        sources.Tables.loadEvents(s, dir), "ts", "value",
        binSeconds = 3600L, periodBins = 24)
      .select(col("n_bins"), round(col("var_obs"), 6).as("var_obs"),
        round(col("var_detrended"), 6).as("var_detrended"),
        round(col("var_remainder"), 6).as("var_remainder"),
        round(col("trend_strength"), 6).as("trend_strength"),
        round(col("seasonal_strength"), 6).as("seasonal_strength"))

  /** Exact Shapley attribution ([[operators.EventAnalytics.markovShapley]])
    * over the q237 chain — all 8 blocked-subset absorptions replayed in
    * one bitmask-keyed recursive CTE.
    */
  def q241MarkovShapley(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.markovShapley(
        sources.Tables.loadEvents(s, dir), "user_id", "ts", "event_type",
        "event_id", conversionType = "purchase",
        touchTypes = Seq("click", "signup", "view"), iters = 40)
      .select(col("touch_type"), round(col("shapley"), 6).as("shapley"),
        round(col("share"), 6).as("share"),
        round(col("credited_conversions"), 6).as("credited_conversions"),
        round(col("v_all"), 6).as("v_all"),
        round(col("v_none"), 6).as("v_none"))
      .orderBy("touch_type")

  /** Mixed-language screen ([[operators.Quality.langConsistency]]):
    * 40-token-window language votes per doc — window slicing, the q35
    * stopword scorer and the majority tie-break replayed per window.
    */
  def q242LangConsistency(s: SparkSession, dir: String): DataFrame =
    operators.Quality.langConsistency(t(s, dir, "documents"),
        "doc_id", "text", windowTokens = 40)
      .select(col("doc_id"), col("n_windows"), col("top_lang"),
        round(col("top_share"), 6).as("top_share"), col("n_langs"))
      .orderBy("doc_id")

  /** ChiMerge binning ([[operators.Classify.chiMergeBins]]) of extended
    * price against a quantity label — the oracle replays the exact merge
    * SEQUENCE as a recursive CTE (one argmin merge per generation).
    */
  def q243ChiMerge(s: SparkSession, dir: String): DataFrame =
    operators.Classify.chiMergeBins(
        t(s, dir, "lineitem").select(col("l_extendedprice"),
          (col("l_quantity") > 25).cast("int").as("y")),
        "l_extendedprice", "y", initialBins = 12, targetBins = 5)
      .select(col("bin"), col("lo_prebin"), col("hi_prebin"), col("n"),
        col("events"), round(col("event_rate"), 6).as("event_rate"))
      .orderBy("bin")

  /** ChiMerge on the GK-sketch prebin path
    * ([[operators.Classify.chiMergeBins]] with `approxAccuracy`) — the
    * corpus-scale configuration the q243 exact path trades against.
    * Rows-only (GK thresholds carry a rank-error the SQL oracle can't
    * replay); ClassifySpec bounds the per-bin drift vs the exact path.
    */
  def q243bChiMergeApprox(s: SparkSession, dir: String): DataFrame =
    operators.Classify.chiMergeBins(
        t(s, dir, "lineitem").select(col("l_extendedprice"),
          (col("l_quantity") > 25).cast("int").as("y")),
        "l_extendedprice", "y", initialBins = 12, targetBins = 5,
        approxAccuracy = Some(10000))
      .select(col("bin"), col("lo_prebin"), col("hi_prebin"), col("n"),
        col("events"), round(col("event_rate"), 6).as("event_rate"))
      .orderBy("bin")

  /** 1-D Wasserstein drift ([[operators.Stats.wasserstein1]]) between
    * purchase and view event values on the floored domain — ECDF running
    * sums and per-step |ΔF|·Δv replayed exactly.
    */
  def q244Wasserstein(s: SparkSession, dir: String): DataFrame =
    operators.Stats.wasserstein1(
        t(s, dir, "events").withColumn("v", floor(col("value"))),
        "v", "event_type", groupA = "purchase", groupB = "view")
      .select(col("n_a"), col("n_b"), round(col("w1"), 6).as("w1"),
        round(col("w1_normalized"), 6).as("w1_normalized"))

  /** SRM check ([[operators.Stats.sampleRatioMismatch]]) of the q138
    * user-mod split against its declared 50/50 allocation — counts,
    * deviations and the chi² total replayed arm-for-arm.
    */
  def q245Srm(s: SparkSession, dir: String): DataFrame =
    operators.Stats.sampleRatioMismatch(
        sources.Tables.loadEvents(s, dir)
          .select((col("user_id") % 2).cast("string").as("variant")),
        "variant", Seq("0" -> 0.5, "1" -> 0.5))
      .select(col("variant"), col("n_obs"),
        round(col("expected_share"), 6).as("expected_share"),
        round(col("n_expected"), 6).as("n_expected"),
        round(col("dev_z"), 6).as("dev_z"),
        round(col("chi2"), 6).as("chi2"),
        col("dof").cast("long").as("dof"), col("n_unexpected"))
      .orderBy("variant")

  /** Quantile treatment effects
    * ([[operators.Stats.quantileTreatmentEffects]]) between the q138
    * user-mod arms over floored event values — per-arm
    * lower-value-at-rank deciles and their gaps replayed exactly.
    */
  def q246Qte(s: SparkSession, dir: String): DataFrame =
    operators.Stats.quantileTreatmentEffects(
        sources.Tables.loadEvents(s, dir).select(
          floor(col("value")).as("v"),
          (col("user_id") % 2).cast("string").as("g")),
        "v", "g", groupA = "0", groupB = "1")
      .select(col("pct"), round(col("q_a"), 6).as("q_a"),
        round(col("q_b"), 6).as("q_b"), round(col("qte"), 6).as("qte"))
      .orderBy("pct")

  /** Funnel latency ([[operators.EventAnalytics.funnelLatency]]) over the
    * q134 stages at hourly buckets — gap quantization and the rank
    * percentiles replayed per transition.
    */
  def q247FunnelLatency(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.funnelLatency(
        sources.Tables.loadEvents(s, dir), "user_id", "ts", "event_type",
        stages = Seq("view", "click", "purchase"),
        quantizeSeconds = 3600L)
      .orderBy("stage_from")

  /** Benjamini–Hochberg adjustment ([[operators.Stats.bhAdjust]]) over a
    * deterministic per-doc p-value table — ranks, the reverse running
    * min and the clamp replayed row-for-row.
    */
  def q248BhAdjust(s: SparkSession, dir: String): DataFrame =
    operators.Stats.bhAdjust(
        t(s, dir, "documents").select(col("doc_id"),
          (((col("doc_id") * 7919) % 1000) / lit(1000.0)).as("p")),
        "doc_id", "p")
      .select(col("doc_id"), round(col("p"), 6).as("p_value"), col("rank"),
        round(col("q_value"), 6).as("q_value"), col("significant"))
      .orderBy("doc_id")

  /** CMH stratified test ([[operators.Stats.cmhTest]]) of the user-mod
    * arms on a value outcome, stratified by event type — per-stratum 2×2
    * cells and the pooled algebra replayed exactly.
    */
  def q249Cmh(s: SparkSession, dir: String): DataFrame =
    operators.Stats.cmhTest(
        sources.Tables.loadEvents(s, dir).select(
          col("event_type").as("stratum"),
          (col("user_id") % 2).cast("string").as("arm"),
          (col("value") > 50).cast("int").as("y")),
        "stratum", "arm", groupA = "0", groupB = "1", outcomeCol = "y")
      .select(col("n_strata"), col("n_strata_skipped"), col("n"),
        col("sum_a"), round(col("sum_e"), 6).as("sum_e"),
        round(col("cmh_chi2"), 6).as("cmh_chi2"),
        round(col("or_crude"), 6).as("or_crude"),
        round(col("or_mh"), 6).as("or_mh"))

  /** Overdispersion ([[operators.Stats.dispersionIndex]]) of each event
    * type's hourly arrival counts — span-with-zeros moments replayed
    * division-for-division.
    */
  def q250Dispersion(s: SparkSession, dir: String): DataFrame =
    operators.Stats.dispersionIndex(
        sources.Tables.loadEvents(s, dir), "event_type", "ts", 3600L)
      .select(col("key"), col("n_bins"), col("n_events"),
        round(col("mean_count"), 6).as("mean_count"),
        round(col("var_count"), 6).as("var_count"),
        round(col("vmr"), 6).as("vmr"),
        round(col("d_stat"), 6).as("d_stat"))
      .orderBy("key")

  /** Leakage-free split ([[operators.Splits.leakFreeSplit]]): verified
    * near-dup clusters (the q77 pair set) are the split unit — the oracle
    * replays the recursive closure, labels each doc by min reachable id
    * and buckets the LABEL, so a cluster cannot straddle.
    */
  def q251LeakFreeSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.jaccardVerify(docs,
        Dedup.minhashCandidatePairs(docs, "doc_id", "text"),
        "doc_id", "text", n = 3, threshold = 0.5)
      .select("id_a", "id_b")
    operators.Splits.leakFreeSplit(docs, "doc_id", pairs,
        Seq("train" -> 80, "val" -> 90, "test" -> 100),
        bucket = k => pmod(k.cast("long"), lit(100)))
      .groupBy("split")
      .agg(countDistinct("group_id").as("n_groups"),
        count(lit(1)).as("n_docs"))
      .orderBy("split")
  }

  /** Cluster quality ([[operators.Classify.silhouetteSimplified]]) of the
    * q177 k-means run — per-point centroid silhouettes and the cluster
    * roll-up replayed on the same unrolled assignment chain.
    */
  def q252Silhouette(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"),
        col("c_nationkey").cast("double").as("c_nat"))
    val (assigned, cents) = Classify.kMeansFixed(cust, "c_custkey",
      Seq("c_acctbal", "c_nat"), k = 3, iterations = 2)
    Classify.silhouetteSimplified(assigned, cents, Seq("c_acctbal", "c_nat"))
      .select(col("cluster"), col("n_points").cast("long").as("n_points"),
        round(col("mean_silhouette"), 6).as("mean_silhouette"),
        round(col("min_silhouette"), 6).as("min_silhouette"))
      .orderBy("cluster")
  }

  /** FK integrity audit ([[operators.Quality.fkAudit]]): lineitem →
    * orders with every 7th order REMOVED from the parent, so orphans
    * exist — key/row counts and the rate replayed exactly.
    */
  def q253FkAudit(s: SparkSession, dir: String): DataFrame =
    operators.Quality.fkAudit(
        t(s, dir, "lineitem"), "l_orderkey",
        t(s, dir, "orders").where(col("o_orderkey") % 7 =!= 0),
        "o_orderkey")
      .select(col("n_child_rows"), col("n_child_keys"),
        col("n_orphan_rows"), col("n_orphan_keys"), col("n_null_rows"),
        round(col("orphan_row_rate"), 6).as("orphan_row_rate"))

  /** SCD2 validity audit ([[operators.Scd.validityAudit]]): the q58 dim
    * with every 10th user's intervals zero-widthed — the poisoned cohort
    * shows gaps and lost currents, the clean cohort audits to zeros.
    */
  def q254ScdAudit(s: SparkSession, dir: String): DataFrame = {
    val dim = operators.Scd.scd2(
      sources.Tables.loadEvents(s, dir)
        .select("user_id", "ts", "event_id", "event_type"),
      key = "user_id", ts = "ts", attrs = Seq("event_type"),
      tiebreaker = Some("event_id"))
    val poisoned = dim.withColumn("valid_to",
      when(col("user_id") % 10 === 0, col("valid_from"))
        .otherwise(col("valid_to")))
    operators.Scd.validityAudit(poisoned, "user_id", "valid_from",
        "valid_to")
      .groupBy((col("user_id") % 10 === 0).as("poisoned"))
      .agg(count(lit(1)).as("n_keys"),
        sum("n_overlaps").as("n_overlaps"), sum("n_gaps").as("n_gaps"),
        sum(when(col("n_current") =!= 1, 1L).otherwise(0L))
          .as("n_bad_current"))
      .orderBy("poisoned")
  }

  /** Mix-shift decomposition
    * ([[operators.Analytics.mixShiftDecomposition]]) of the event-value
    * topline between the two event-id parities, segmented by type — the
    * within/mix identity replayed term-for-term.
    */
  def q255MixShift(s: SparkSession, dir: String): DataFrame =
    operators.Analytics.mixShiftDecomposition(
        sources.Tables.loadEvents(s, dir).select(
          col("event_type").as("seg"),
          (col("event_id") % 2).cast("string").as("period"),
          col("value")),
        "seg", "period", periodA = "0", periodB = "1", valueCol = "value")
      .select(col("segment"), round(col("w_a"), 6).as("w_a"),
        round(col("w_b"), 6).as("w_b"), round(col("r_a"), 6).as("r_a"),
        round(col("r_b"), 6).as("r_b"),
        round(col("within_effect"), 6).as("within_effect"),
        round(col("mix_effect"), 6).as("mix_effect"))
      .orderBy("segment")

  /** N-gram novelty ([[operators.Dedup.ngramNovelty]]) of docs 100+
    * against the doc<100 reference slice — per-doc distinct-shingle
    * totals and the unseen fraction replayed exactly.
    */
  def q256NgramNovelty(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.ngramNovelty(docs.where(col("doc_id") >= 100),
        docs.where(col("doc_id") < 100), "doc_id", "text", n = 3)
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("novelty"), 6).as("novelty"))
      .orderBy("doc_id")
  }

  /** Source affinity matrix
    * ([[operators.EmbeddingStats.groupCentroidSimilarity]]): cosine
    * between per-source embedding centroids — per-dimension means, dots
    * and norms replayed from the q143 unnest.
    */
  def q257SourceAffinity(s: SparkSession, dir: String): DataFrame = {
    val emb = sources.Tables.loadEmbeddings(s, dir)
    val src = t(s, dir, "documents")
      .select(col("doc_id").as("vec_id"), col("source"))
    operators.EmbeddingStats.groupCentroidSimilarity(
        emb.join(src, "vec_id"), "source", "embedding")
      .select(col("group_a"), col("group_b"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy("group_a", "group_b")
  }

  /** ANN recall telemetry AT the gate: measured recall@k of each
    * approximate index configuration against the exact brute-force
    * top-k, one row per method — so the round artifact itself carries
    * the tolerance evidence the SimilaritySpec recall floors assert
    * (q39c/q95b's rows-only status otherwise hides the number). Same
    * configurations as the production gate queries: the q39c
    * recall-solved LSH, q95b's refine-8 PQ, and IVF probing 2 of 8
    * cells. Rows-only by nature — the recall VALUE is the evidence.
    *
    * The brute-force truth is recomputed IN EVERY invocation from the
    * parquet inputs and only localCheckpoint'd for the three method joins
    * (~4–5 s of honest per-run cost at sf0.1). It was briefly disk-cached
    * under `target/` keyed on a content fingerprint of the embeddings —
    * that is exactly the "persisted intermediates keyed on the test data"
    * pattern the bench rules ban, and it was removed in round 17; do not
    * reintroduce it.
    */
  def q258AnnRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    val queries = emb.where(col("vec_id") <= 20)
    // brute-force truth computed IN this invocation and pinned for the
    // three method joins — recall telemetry must always be measured
    // against a truth derived from the same parquet inputs it reads,
    // never a disk artifact carried across runs
    val truth = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", k = 3)
      .select(col("query_id"), col("nbr_id"))
      .localCheckpoint() // joined by every method row
    val nTruth = broadcast(truth.agg(count(lit(1)).as("n_truth")))
    def recallOf(name: String, approx: DataFrame): DataFrame =
      approx.select(col("query_id"), col("nbr_id"))
        .join(truth, Seq("query_id", "nbr_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(nTruth)
        .select(lit(name).as("method"), col("n_truth"), col("n_hits"),
          round(col("n_hits") / col("n_truth"), 4).as("recall"))
    val lsh = Similarity.lshTopKForRecall(emb, queries, "vec_id",
      "embedding", dim = 64, k = 3, targetRecall = 0.85,
      cosineThreshold = 0.2)
    val pq = Similarity.pqSearch(emb, queries, "vec_id", "embedding",
      dim = 64, k = 3,
      codebooks = annModel[DataFrame](s, dir, "pq:16:16:i3")(
        Similarity.pqCodebooks(emb, "vec_id", "embedding", dim = 64,
          numSub = 16, ksub = 16)),
      refine = 8)
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 3, numCells = 8, nprobe = 2)
    recallOf("lsh_recall_solved", lsh)
      .unionByName(recallOf("pq_refine8", pq))
      .unionByName(recallOf("ivf_nprobe2of8", ivf))
      .orderBy("method")
  }

  /** Sketch-error telemetry AT the gate: the per-source MinHash union
    * sketch's estimated Jaccard (q49) joined against the EXACT
    * shingle-set Jaccard, reporting per-pair absolute error plus the
    * corpus max/mean — the artifact-side companion of DedupSpec's
    * sketch-tolerance assertions. One row per source pair.
    */
  def q259SketchError(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val est = Dedup.groupMinhashSimilarity(docs, "source", "text")
    val exact = Dedup.groupJaccardExact(docs, "source", "text")
    est.join(exact, Seq("group_a", "group_b"), "full")
      .select(col("group_a"), col("group_b"),
        round(coalesce(col("est_jaccard"), lit(0.0)), 4).as("est_jaccard"),
        round(coalesce(col("jaccard"), lit(0.0)), 4).as("exact_jaccard"),
        round(abs(coalesce(col("est_jaccard"), lit(0.0)) -
          coalesce(col("jaccard"), lit(0.0))), 4).as("abs_err"))
      .orderBy("group_a", "group_b")
  }

  /** The q260/q261 corpus: documents plus, for every doc_id % 7 == 0, a
    * clone (doc_id + 10000) whose text is a 3-token unique marker
    * followed by the original's first 40 tokens — planted ≥20-token
    * duplicated spans with the original as the global first occurrence.
    */
  private def spanCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val toks = filter(split(col("text"), " "), tk => length(tk) > 0)
    val clones = docs.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 10000).as("doc_id"),
        concat(lit("inj"), col("doc_id").cast("string"),
          lit(" marker0 marker1 "),
          array_join(slice(toks, 1, 40), " ")).as("text"))
    docs.unionByName(clones)
  }

  /** Exact-substring span dedup ([[operators.Dedup.repeatedSpans]], the
    * Lee et al. 2022 ExactSubstr pass): every maximal ≥20-token span
    * that appears verbatim elsewhere, keep-first semantics. DuckDB
    * replays window hashing (grouping by window CONTENT — also the
    * collision cross-check on the engine's xxhash64 buckets),
    * first-occurrence ranking, and the gaps-and-islands span merge.
    */
  def q260RepeatedSpans(s: SparkSession, dir: String): DataFrame =
    operators.Dedup.repeatedSpans(spanCorpus(s, dir), "doc_id", "text",
        windowTokens = 20)
      .orderBy("doc_id", "span_start")

  /** Span scrubbing ([[operators.Dedup.scrubRepeatedSpans]]): the q260
    * spans removed from the text, docs reassembled in token order —
    * clean_text hash-compares character-for-character.
    */
  def q261ScrubSpans(s: SparkSession, dir: String): DataFrame =
    operators.Dedup.scrubRepeatedSpans(spanCorpus(s, dir), "doc_id",
        "text", windowTokens = 20)
      .orderBy("doc_id")

  /** Span-level eval decontamination
    * ([[operators.Dedup.contaminatedSpans]]): the q260 planted clones as
    * the training corpus, the original documents as the eval reference —
    * each clone's copied 40-token slice surfaces as a contaminated span.
    * DuckDB replays the cross-corpus window semi-join and the island
    * merge.
    */
  def q267ContaminatedSpans(s: SparkSession, dir: String): DataFrame = {
    val corpus = spanCorpus(s, dir).where(col("doc_id") >= 10000)
    val reference = t(s, dir, "documents").select("doc_id", "text")
    operators.Dedup.contaminatedSpans(corpus, reference, "doc_id", "text",
        "doc_id", "text", windowTokens = 20)
      .orderBy("doc_id", "span_start")
  }

  /** The q271/q272 privacy frame: quasi-identifiers (event_type, user
    * bucket), sensitive attribute = floor(value) mod 7.
    */
  private def privacyFrame(s: SparkSession, dir: String): DataFrame =
    Tables.loadEvents(s, dir).select(col("event_type"),
      (col("user_id") % 20).as("ubucket"),
      (floor(col("value")) % 7).cast("int").as("sv"))

  /** l-diversity audit ([[operators.Stats.lDiversity]]): distinct
    * sensitive values per quasi-identifier class, corpus rollup —
    * replayed class-for-class by DuckDB.
    */
  def q271LDiversity(s: SparkSession, dir: String): DataFrame =
    operators.Stats.lDiversity(privacyFrame(s, dir),
        Seq("event_type", "ubucket"), "sv", l = 3)
      .select(col("n_rows"), col("n_classes"), col("min_diversity"),
        col("classes_below_l"), col("rows_below_l"),
        round(col("at_risk_share"), 6).as("at_risk_share"))

  /** t-closeness audit ([[operators.Stats.tCloseness]]): per-class total
    * variation against the corpus sensitive-value distribution, absent
    * values handled closed-form — replayed term-for-term.
    */
  def q272TCloseness(s: SparkSession, dir: String): DataFrame =
    operators.Stats.tCloseness(privacyFrame(s, dir),
        Seq("event_type", "ubucket"), "sv")
      .select(col("event_type"), col("ubucket"), col("n"),
        round(col("t"), 6).as("t"))
      .orderBy("event_type", "ubucket")

  /** Dataset card ([[operators.Quality.corpusCard]]) over documents plus
    * a planted exact-dup layer (every doc_id % 9 == 0 text re-appears
    * once) — every metric row replayed closed-form.
    */
  def q275CorpusCard(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val layered = docs.unionByName(
      docs.where(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 20000).as("doc_id"), col("text")))
    operators.Quality.corpusCard(layered, "doc_id", "text")
      .select(col("metric"), round(col("value"), 6).as("value"))
      .orderBy("metric")
  }

  /** Hot-key diagnostic ([[operators.Quality.keySkew]]): the 10 heaviest
    * user buckets of the event stream with shares and skew factors —
    * counts, ranks and the mean-normalized factor replayed exactly.
    */
  /** Temperature mixture sampling ([[operators.Splits.temperatureSample]]):
    * tau = 0.5 tempered per-lang shares over token mass, budget 30 % of
    * corpus tokens, md5-ordered exact quotas — DuckDB replays the pow
    * shares, the caps, and the per-lang running-sum cut exactly.
    */
  def q277TemperatureSample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
    operators.Splits.temperatureSample(docs, "lang", col("n_tokens"),
        "doc_id", tau = 0.5, budgetFraction = 0.3)
      .select("doc_id", "lang", "n_tokens")
      .orderBy("doc_id")
  }

  /** Near-dup ingest screen ([[operators.Incremental.minhashNewDocs]]):
    * even docs are the standing corpus, odd docs the arriving batch;
    * md5-exact signatures (the q36b trick) so DuckDB replays
    * signature → banding → batch×corpus band join → anti-join exactly.
    * Docs too short to shingle pass through as new; the saturation cap is
    * raised out of range here (IncrementalSpec covers that branch with a
    * planted flood). Runs on the q36b-style deterministic 1/3 slice —
    * the md5 signature cost is per-doc and slice-invariant in semantics,
    * and the production xxhash path is held to linear by the
    * `ingest_newdocs` SCALING anchor.
    */
  def q278IngestNewdocs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").where(col("doc_id") % 3 === 0)
    operators.Incremental.minhashNewDocs(
        docs.where(col("doc_id") % 2 === 1),
        docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", exact = true, maxCorpusBucket = 1000000)
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  /** Bounded as-of join ([[operators.Joins.asOfJoin]] with `toleranceSec`):
    * q46's click→latest-view match, but a view more than an hour stale
    * does not count — DuckDB replays with its native ASOF JOIN plus a
    * µs-exact INTERVAL bound (matching the operator's microsecond rule).
    */
  def q281AsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("event_id").as("view_id"))
      .withColumnRenamed("ts", "vts")
    operators.Joins.asOfJoin(clicks, views, "user_id", "ts", "vts",
        Seq("view_id", "vts"), asOfPrefix = "", toleranceSec = Some(3600L))
      .select(col("click_id"), col("user_id"), col("view_id"),
        (col("ts").cast("long") - col("vts").cast("long")).as("lag_sec"))
      .orderBy("click_id")
  }

  /** Snapshot reconciliation ([[operators.Analytics.snapshotDiff]]):
    * two deterministic variants of orders — before drops key % 11 = 3 and
    * perturbs price where key % 13 = 0; after drops key % 11 = 5 — so
    * every status (added / removed / changed / unchanged) appears. DuckDB
    * replays the null-safe full-outer diff and the changed-column list.
    */
  def q279SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val before = o.where(col("o_orderkey") % 11 =!= 3)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    val after = o.where(col("o_orderkey") % 11 =!= 5)
    operators.Analytics.snapshotDiff(before, after, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"))
      .where(col("status") =!= "unchanged") // the audit reads the deltas
      .orderBy("o_orderkey")
  }

  /** Per-slice Wilson interval ([[operators.Stats.proportionCI]]): the
    * rate of high-value events per event_type with z = 1.96 bounds —
    * closed-form arithmetic, hash-matched against DuckDB's replay.
    */
  def q280ProportionCi(s: SparkSession, dir: String): DataFrame =
    operators.Stats.proportionCI(Tables.loadEvents(s, dir),
        Seq("event_type"), col("value") > 100, z = 1.96)
      .select(col("event_type"), col("n"), col("successes"),
        round(col("p_hat"), 6).as("p_hat"),
        round(col("ci_lo"), 6).as("ci_lo"),
        round(col("ci_hi"), 6).as("ci_hi"))
      .orderBy("event_type")

  /** Adjusted Rand Index ([[operators.Stats.adjustedRand]]) between the
    * language and source labelings of the corpus — does language track
    * crawl source, chance-corrected? DuckDB replays the contingency
    * pair-counting (cells + marginals + expected index) exactly.
    */
  def q282AdjustedRand(s: SparkSession, dir: String): DataFrame =
    operators.Stats.adjustedRand(t(s, dir, "documents"), "lang", "source")
      .select(col("n"), round(col("ari"), 6).as("ari"))

  /** Hamilton apportionment ([[operators.Splits.apportionBudget]]): a
    * 1 M-token budget split across (lang, source) cells ∝ character
    * mass — floors + largest-remainder top-up, allocations summing to the
    * budget EXACTLY. DuckDB replays quota arithmetic, remainder ranking
    * (desc, key-tiebroken) and the top-up cut digit-for-digit.
    */
  def q283ApportionBudget(s: SparkSession, dir: String): DataFrame =
    operators.Splits.apportionBudget(t(s, dir, "documents"),
        Seq("lang", "source"), col("n_chars"), budget = 1000000L)
      .select(col("lang"), col("source"), col("mass").cast("long").as("mass"),
        round(col("quota"), 6).as("quota"), col("allocation"))
      .orderBy("lang", "source")

  /** Rank-biased overlap ([[operators.Retrieval.rankBiasedOverlap]]):
    * per-source agreement between two top-20 document rankings — by
    * character count vs by whitespace token count (deterministically
    * doc_id-tiebroken). The ranker-swap audit: RBO is top-weighted and
    * survives non-identical item sets, where Kendall/Spearman don't.
    * DuckDB replays both rankings, the max-rank entry depths, and the
    * ascending-depth weighted sum.
    */
  def q284Rbo(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val byChars = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val byToks = Window.partitionBy("source")
      .orderBy(size(split(trim(col("text")), "\\s+")).desc, col("doc_id"))
    val a = docs.select(col("source"), col("doc_id"),
      row_number().over(byChars).as("rank"))
    val b = docs.select(col("source"), col("doc_id"),
      row_number().over(byToks).as("rank"))
    operators.Retrieval.rankBiasedOverlap(a, b, "doc_id", "rank",
        depth = 20, p = 0.9, groupCols = Seq("source"))
      .select(col("source"), col("overlap_at_k"),
        round(col("rbo"), 6).as("rbo"))
      .orderBy("source")
  }

  /** DoReMi-style domain reweighting ([[operators.Quality.domainReweight]]):
    * one multiplicative-weights step over per-source mean "losses"
    * (n_chars/100 as the deterministic stand-in), token-share reference,
    * η = 1, ε = 0.1 smoothing — hard domains gain mass, every domain
    * keeps ≥ ε/G. DuckDB replays the per-domain aggregate, the
    * log-sum-exp-stabilized exponentials and the smoothed normalization.
    */
  def q285DomainReweight(s: SparkSession, dir: String): DataFrame =
    operators.Quality.domainReweight(t(s, dir, "documents"), "source",
        col("n_chars") / 100.0, col("n_chars"), eta = 1.0, epsilon = 0.1)
      .select(col("source"), col("n_rows"), col("mass").cast("long").as("mass"),
        round(col("ref_share"), 6).as("ref_share"),
        round(col("avg_loss"), 6).as("avg_loss"),
        round(col("weight"), 6).as("weight"))
      .orderBy("source")

  /** Log-rank test ([[operators.Stats.logRank]]) comparing inter-event
    * gap survival between even- and odd-id users — q198's Kaplan–Meier
    * subjects (10-minute-grain gaps, horizon-censored last events) split
    * into two cohorts. DuckDB replays the per-duration counts, both
    * running risk sets and the χ² rollup with the same (n − 1) ≥ 1
    * variance guard.
    */
  def q286LogRank(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val w = Window.partitionBy("user_id").orderBy("__t", "event_id")
    val horizon = ev.agg(max(col("ts").cast("long")).as("__hmax"))
    val subjects = ev
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("__t"))
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .crossJoin(broadcast(horizon))
      .select(
        floor((coalesce(col("__next"), col("__hmax")) - col("__t")) / 600)
          .as("d"),
        col("__next").isNotNull.cast("int").as("ev"),
        when(col("user_id") % 2 === 0, "even").otherwise("odd").as("grp"))
    operators.Stats.logRank(subjects, "d", "ev", "grp", "even", "odd")
      .select(col("n_a"), col("n_b"), col("observed_a"), col("observed_b"),
        round(col("expected_a"), 6).as("expected_a"),
        round(col("expected_b"), 6).as("expected_b"),
        round(col("var_sum"), 6).as("var_sum"),
        round(col("chi2"), 6).as("chi2"))
  }

  /** Adamic–Adar link prediction ([[operators.Graphs.adamicAdar]]) over
    * the synthetic doc graph (q141/q145's edge construction): top-50
    * non-adjacent pairs by Σ 1/ln(deg) over common neighbors. DuckDB
    * replays the canonicalized edges, the broker self-join with the same
    * degree cap, the existing-edge anti-join and the (score desc, u, v)
    * cut.
    */
  def q287AdamicAdar(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id")
    val nDf = docs.agg(count(lit(1)).as("n"))
    val base = docs.crossJoin(broadcast(nDf))
    val edges = base
      .select(col("doc_id").as("src"),
        ((col("doc_id") + 1) % col("n")).as("dst"))
      .union(base.where(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 7) % col("n")).as("dst")))
      .union(base.where(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 13) % col("n")).as("dst")))
    operators.Graphs.adamicAdar(edges, maxBrokerDegree = 1000, topK = 50)
      .select(col("u"), col("v"), col("n_common"),
        round(col("score"), 6).as("score"))
  }

  /** Vocabulary-coverage estimators ([[operators.Quality.vocabCoverage]])
    * per source: Good–Turing unseen mass, coverage, and the Chao1
    * richness floor from each source's frequency-of-frequencies. DuckDB
    * replays tokenization, hapax/dis counts and the closed forms.
    */
  def q288VocabCoverage(s: SparkSession, dir: String): DataFrame =
    operators.Quality.vocabCoverage(t(s, dir, "documents"), "text",
        Seq("source"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        col("n_hapax"), col("n_dis"),
        round(col("unseen_mass"), 6).as("unseen_mass"),
        round(col("coverage"), 6).as("coverage"),
        round(col("chao1"), 6).as("chao1"))
      .orderBy("source")

  /** Propensity caliper matching ([[operators.Stats.propensityMatch]]):
    * per-user outcome = event-value mass, deterministic multiplicative-
    * modulo propensity score and treatment bit (cross-engine replayable —
    * no platform hash), strata = activity-count mod 4, caliper 0.05.
    * DuckDB replays the per-(stratum, score) control collapse, the
    * µ-exact nearest-within-caliper pick (|Δ|, then lower score) and the
    * ATT rollup.
    */
  def q289PropensityMatch(s: SparkSession, dir: String): DataFrame = {
    val perUser = t(s, dir, "events")
      .groupBy("user_id")
      .agg(sum("value").as("y"), count(lit(1)).as("n_ev"))
      .select(col("y"),
        (pmod(col("user_id") * 48271, lit(999983)).cast("double") /
          999983.0).as("score"),
        (pmod(col("user_id") * 16807, lit(97)) < 30).as("is_treated"),
        pmod(col("n_ev"), lit(4)).as("stratum"))
    operators.Stats.propensityMatch(perUser, col("is_treated"),
        "score", "y", "stratum", caliper = 0.05)
      .select(col("n_treated"), col("n_control"), col("n_matched"),
        round(col("match_rate"), 6).as("match_rate"),
        round(col("mean_y_treated"), 4).as("mean_y_treated"),
        round(col("mean_y_control"), 4).as("mean_y_control"),
        round(col("att"), 4).as("att"),
        round(col("se_att"), 4).as("se_att"))
  }

  /** Difference-in-differences ([[operators.EventAnalytics.diffInDiff]]):
    * per-(user, half) event-value mass, treated = even user id, post =
    * second half of the observation window (q219's midpoint). DuckDB
    * replays the four conditional cells and the Welch-style SE.
    */
  def q290DiffInDiff(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("user_id"),
      unix_timestamp(col("ts")).as("ep"), col("value"))
    val mid = e.agg(
      floor((min("ep") + max("ep")) / 2.0).cast("long").as("__mid"))
    val perUserPeriod = e.crossJoin(broadcast(mid))
      .groupBy(col("user_id"), (col("ep") > col("__mid")).as("is_post"))
      .agg(sum("value").as("y"))
    operators.EventAnalytics.diffInDiff(perUserPeriod,
        col("user_id") % 2 === 0, col("is_post"), "y")
      .select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"),
        col("n_c_post"),
        round(col("mean_t_pre"), 4).as("mean_t_pre"),
        round(col("mean_t_post"), 4).as("mean_t_post"),
        round(col("mean_c_pre"), 4).as("mean_c_pre"),
        round(col("mean_c_post"), 4).as("mean_c_post"),
        round(col("trend_treated"), 4).as("trend_treated"),
        round(col("trend_control"), 4).as("trend_control"),
        round(col("did"), 4).as("did"),
        round(col("se_did"), 4).as("se_did"))
  }

  /** HITS hubs/authorities ([[operators.Graphs.hits]]): 5 synchronous
    * L1-normalized rounds over q141's doc graph. DuckDB replays every
    * round as unrolled CTEs (authority from hubs, hub from authorities,
    * each with its normalizer), 9dp like PageRank.
    */
  def q291Hits(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id")
    val nDf = docs.agg(count(lit(1)).as("n"))
    val base = docs.crossJoin(broadcast(nDf))
    val edges = base
      .select(col("doc_id").as("src"),
        ((col("doc_id") + 1) % col("n")).as("dst"))
      .union(base.where(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 7) % col("n")).as("dst")))
      .union(base.where(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 101) % col("n")).as("dst")))
    operators.Graphs.hits(edges, iterations = 5)
      .select(col("node"), round(col("hub"), 9).as("hub"),
        round(col("authority"), 9).as("authority"))
      .orderBy("node")
  }

  /** Nelson–Aalen cumulative hazard ([[operators.Stats.nelsonAalen]])
    * over q198's inter-event subjects — the hazard-sum dual of the
    * Kaplan–Meier gate. DuckDB replays both running sums and the
    * variance closed form.
    */
  def q292NelsonAalen(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val w = Window.partitionBy("user_id").orderBy("__t", "event_id")
    val horizon = ev.agg(max(col("ts").cast("long")).as("__hmax"))
    val subjects = ev
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("__t"))
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .crossJoin(broadcast(horizon))
      .select(
        floor((coalesce(col("__next"), col("__hmax")) - col("__t")) / 600)
          .as("d"),
        col("__next").isNotNull.cast("int").as("ev"))
    operators.Stats.nelsonAalen(subjects, "d", "ev")
      .select(col("t").cast("long").as("t"), col("n_at_risk"),
        col("n_events"), col("n_censored"),
        round(col("cumhaz"), 6).as("cumhaz"),
        round(col("se_cumhaz"), 6).as("se_cumhaz"))
      .orderBy("t")
  }

  /** Weekly cohort LTV ([[operators.EventAnalytics.cohortLtv]]): value
    * accumulation by (first-event cohort week, week offset) with
    * per-user LTV. DuckDB replays the cohorting, the cells and the
    * per-cohort running sum.
    */
  def q293CohortLtv(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.cohortLtv(t(s, dir, "events"), "user_id",
        "ts", "value")
      .select(col("cohort_week"), col("week_offset"), col("cohort_size"),
        col("n_active"), round(col("value"), 4).as("value"),
        round(col("cum_value"), 4).as("cum_value"),
        round(col("ltv_per_user"), 6).as("ltv_per_user"))
      .orderBy("cohort_week", "week_offset")

  /** RFM segmentation ([[operators.EventAnalytics.rfm]]): per-user
    * recency/frequency/monetary quintile scores and the "545" segment
    * code, tiering via the scale-safe percentile-broadcast bucketer.
    * DuckDB replays the per-user rollup, all three quantile_cont
    * threshold lists and the strictly-below bucket counts.
    */
  def q294Rfm(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.rfm(t(s, dir, "events"), "user_id", "ts",
        "value", numBuckets = 5)
      .select(col("user").as("user_id"), col("recency_days"),
        col("frequency"), round(col("monetary"), 4).as("monetary"),
        col("r_score"), col("f_score"), col("m_score"), col("segment"))
      .orderBy("user_id")

  /** Bradley–Terry strengths ([[operators.Preferences.bradleyTerry]]):
    * 16 synthetic "models" play preference matches derived from events
    * (deterministic winner rule), 5 MM rounds. DuckDB replays the game/
    * win tables and every round (MATERIALIZED CTEs — θ is referenced
    * twice per round, the q291 inliner lesson), 9dp.
    */
  def q295BradleyTerry(s: SparkSession, dir: String): DataFrame = {
    val prefs = t(s, dir, "events")
      .select((col("user_id") % 16).as("a"),
        pmod(col("user_id") * 31, lit(16)).as("b"), col("event_id"))
      .where(col("a") =!= col("b"))
      .select(
        when(col("event_id") % 3 === 0, least(col("a"), col("b")))
          .otherwise(greatest(col("a"), col("b"))).as("winner"),
        when(col("event_id") % 3 === 0, greatest(col("a"), col("b")))
          .otherwise(least(col("a"), col("b"))).as("loser"))
    operators.Preferences.bradleyTerry(prefs, "winner", "loser",
        iterations = 5)
      .select(col("item"), col("wins"), col("games"),
        round(col("strength"), 9).as("strength"))
      .orderBy("item")
  }

  /** Krippendorff's alpha ([[operators.Stats.krippendorffAlpha]]) over
    * three synthetic labeling passes of the corpus (two with
    * deterministic disagreement slices) — the many-rater reliability
    * number. DuckDB replays the per-item disagreement and marginal
    * closed forms.
    */
  def q296Krippendorff(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "lang")
    val ratings = d.select(col("doc_id"), col("lang").as("label"))
      .union(d.select(col("doc_id"),
        when(col("doc_id") % 7 === 0, lit("zz"))
          .otherwise(col("lang")).as("label")))
      .union(d.select(col("doc_id"),
        when(col("doc_id") % 13 === 0, lit("yy"))
          .otherwise(col("lang")).as("label")))
    operators.Stats.krippendorffAlpha(ratings, "doc_id", "label")
      .select(col("n_items"), col("n_ratings"),
        round(col("d_o"), 6).as("d_o"), round(col("d_e"), 6).as("d_e"),
        round(col("alpha"), 6).as("alpha"))
  }

  /** Dawid–Skene label aggregation ([[operators.Stats.dawidSkene]]):
    * q296's three synthetic raters, 2 EM rounds — per-item posteriors
    * and MAP labels with per-rater confusion estimation. DuckDB replays
    * init shares, both M-step tables, the smoothed log-space E-step and
    * the item-window normalization (MATERIALIZED posterior CTEs — each
    * round reads the previous posterior three times).
    */
  def q297DawidSkene(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "lang")
    val ratings = d.select(col("doc_id"), lit(1).as("rater"),
        col("lang").as("label"))
      .union(d.select(col("doc_id"), lit(2).as("rater"),
        when(col("doc_id") % 7 === 0, lit("zz"))
          .otherwise(col("lang")).as("label")))
      .union(d.select(col("doc_id"), lit(3).as("rater"),
        when(col("doc_id") % 13 === 0, lit("yy"))
          .otherwise(col("lang")).as("label")))
    operators.Stats.dawidSkene(ratings, "doc_id", "rater", "label",
        iterations = 2)
      .select(col("item"), col("label"),
        round(col("posterior"), 6).as("posterior"), col("is_map"))
      .orderBy("item", "label")
  }

  /** Always-valid A/B monitor
    * ([[operators.EventAnalytics.alwaysValidMonitor]]): daily cumulative
    * arm counts and the log mixture-SPRT e-value over the even/odd-user
    * purchase split — the peeking-safe companion to q71's fixed-horizon
    * z. DuckDB replays the running sums and the closed form exactly.
    */
  def q298AlwaysValid(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.alwaysValidMonitor(t(s, dir, "events"),
        col("user_id") % 2 === 0, "ts", col("event_type") === "purchase",
        binSeconds = 86400L, tau = 1e-4, alpha = 0.05)
      .select(col("bin"), col("n_a"), col("n_b"), col("conv_a"),
        col("conv_b"), round(col("p_a"), 6).as("p_a"),
        round(col("p_b"), 6).as("p_b"), round(col("diff"), 6).as("diff"),
        round(col("log_e_value"), 6).as("log_e_value"), col("can_stop"))
      .orderBy("bin")

  /** Empirical-Bayes mean shrinkage ([[operators.Stats.ebShrinkMeans]]):
    * per-(doc_id mod 251) mean n_chars pulled toward the cross-group
    * center by noise — the leaderboard de-noiser. DuckDB replays the
    * moment estimates and the precision-weighted blend.
    */
  def q299EbShrink(s: SparkSession, dir: String): DataFrame =
    operators.Stats.ebShrinkMeans(
        t(s, dir, "documents").select(pmod(col("doc_id"), lit(251)).as("g"),
          col("n_chars")),
        Seq("g"), "n_chars")
      .select(col("g"), col("n"), round(col("mean"), 6).as("mean"),
        round(col("se2"), 6).as("se2"),
        round(col("shrunk_mean"), 6).as("shrunk_mean"),
        round(col("shrink_weight"), 6).as("shrink_weight"))
      .orderBy("g")

  /** McNemar's paired test ([[operators.Stats.mcnemar]]): two synthetic
    * "model" correctness columns over the same documents — the
    * discordant-cell χ². DuckDB replays the four cells and the closed
    * form.
    */
  def q300Mcnemar(s: SparkSession, dir: String): DataFrame =
    operators.Stats.mcnemar(t(s, dir, "documents"),
        pmod(col("doc_id"), lit(7)) =!= 0, pmod(col("doc_id"), lit(5)) =!= 0)
      .select(col("n"), col("both_correct"), col("a_only_correct"),
        col("b_only_correct"), col("neither_correct"),
        round(col("chi2"), 6).as("chi2"))

  /** Uplift deciles + Qini ([[operators.Stats.upliftDeciles]]) over
    * q289's per-user outcome/score/treatment construction — the
    * targeting-model evaluation grid. DuckDB replays the quantile_cont
    * tiering, per-tier rates and the cumulative Qini from the top tier
    * down.
    */
  def q301UpliftDeciles(s: SparkSession, dir: String): DataFrame = {
    val perUser = t(s, dir, "events")
      .groupBy("user_id")
      .agg(sum("value").as("y"))
      .select(col("y"),
        (pmod(col("user_id") * 48271, lit(999983)).cast("double") /
          999983.0).as("score"),
        (pmod(col("user_id") * 16807, lit(97)) < 30).as("is_treated"))
    operators.Stats.upliftDeciles(perUser, col("is_treated"), "score",
        "y", numBuckets = 10)
      .select(col("bucket"), col("n_t"), col("n_c"),
        round(col("mean_y_t"), 4).as("mean_y_t"),
        round(col("mean_y_c"), 4).as("mean_y_c"),
        round(col("uplift"), 4).as("uplift"),
        round(col("qini"), 4).as("qini"))
  }

  /** Hash-permutation test ([[operators.Stats.permutationTest]]):
    * per-user event counts (INTEGER outcomes — every double both engines
    * derive is exact, so the extreme count replays bit-for-bit), even-
    * vs odd-id split, 64 md5-parity pseudo-permutations. DuckDB replays
    * every pseudo-arm's conditional sums and the add-one p-value.
    */
  def q302PermutationTest(s: SparkSession, dir: String): DataFrame = {
    val perUser = t(s, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("y"))
    operators.Stats.permutationTest(perUser, "user_id", "y",
        col("user_id") % 2 === 0, k = 64)
      .select(col("n"), round(col("mean_t"), 4).as("mean_t"),
        round(col("mean_c"), 4).as("mean_c"),
        round(col("observed_diff"), 4).as("observed_diff"),
        col("k"), col("n_extreme"), round(col("p_value"), 6).as("p_value"))
  }

  /** Heaps-law fit ([[operators.Quality.heapsLawFit]]): exact cumulative
    * (tokens, vocabulary) over 32 doc-id-ordered prefix slices, ln-ln
    * regression → V = K·N^β — [[q167ZipfFit]]'s growth-curve companion.
    * DuckDB replays the quantile slicing, first-appearance counts,
    * prefix sums and the closed-form regression.
    */
  def q303HeapsLaw(s: SparkSession, dir: String): DataFrame =
    operators.Quality.heapsLawFit(t(s, dir, "documents"), "text",
        "doc_id", numBuckets = 32)
      .select(col("n_buckets"), col("n_tokens"), col("vocab"),
        round(col("beta"), 6).as("beta"),
        round(col("k_coef"), 6).as("k_coef"), round(col("r2"), 6).as("r2"))

  /** Temperature scaling ([[operators.Stats.temperatureScaling]]): a
    * deterministic miscalibrated scorer over documents, NLL grid search
    * for the best temperature. DuckDB replays the clip/logit, every
    * grid NLL and the (nll, then smaller T) argmin.
    */
  def q304TemperatureScaling(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents").select(
      (pmod(col("doc_id"), lit(3)) === 0).cast("int").as("y"),
      (when(pmod(col("doc_id"), lit(3)) === 0, 0.9).otherwise(0.1) +
        (pmod(col("doc_id") * 17, lit(100)).cast("double") - 50.0) /
          1000.0).as("score"))
    operators.Stats.temperatureScaling(scored, "score", "y")
      .select(col("n"), col("best_t"),
        round(col("nll_uncalibrated"), 6).as("nll_uncalibrated"),
        round(col("nll_calibrated"), 6).as("nll_calibrated"),
        round(col("nll_reduction"), 6).as("nll_reduction"))
  }

  /** Intra-doc paragraph dedup ([[operators.Quality.dedupeParagraphs]]):
    * every document gets a planted duplicated body (text, footer, text,
    * footer) and the transform must keep exactly the first occurrences —
    * the rewrite itself is gated via an md5 fingerprint of the deduped
    * text. DuckDB replays the split, the first-occurrence index filter
    * and the re-join.
    */
  def q305DedupeParagraphs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"),
      concat_ws("\n", coalesce(col("text"), lit("")),
        lit("-- footer --"), coalesce(col("text"), lit("")),
        lit("-- footer --")).as("body"))
    operators.Quality.dedupeParagraphs(docs, "body")
      .select(col("doc_id"), col("n_units"), col("n_dropped"),
        md5(col("deduped_text")).as("fp"))
      .orderBy("doc_id")
  }

  /** Cost-sensitive threshold pick ([[operators.Stats.bestThreshold]]):
    * a deterministic score/label construction with FN priced 5× FP —
    * the curation-filter cut. Counts are exact longs, so the cost
    * argmin replays bit-for-bit in DuckDB.
    */
  def q306BestThreshold(s: SparkSession, dir: String): DataFrame = {
    val scored = t(s, dir, "documents").select(
      ((pmod(col("doc_id") * 13, lit(1000)).cast("double") / 1000.0 +
        when(pmod(col("doc_id"), lit(4)) === 0, 0.5).otherwise(0.0)) /
        1.5).as("score"),
      (pmod(col("doc_id"), lit(4)) === 0).cast("int").as("y"))
    operators.Stats.bestThreshold(scored, "score", "y",
        costFp = 1.0, costFn = 5.0)
      .select(round(col("threshold"), 6).as("threshold"), col("tp"),
        col("fp"), col("fn"), col("tn"), round(col("cost"), 4).as("cost"),
        round(col("precision"), 6).as("precision"),
        round(col("recall"), 6).as("recall"), round(col("f1"), 6).as("f1"))
  }

  /** DP noisy means ([[operators.Stats.dpNoisyMean]]): per-event-type
    * value means released with clip [0, 100] and ε = 1 split across the
    * sum and count mechanisms — q218's md5-digit noise replayed by
    * DuckDB digit-for-digit, twice.
    */
  def q307DpNoisyMean(s: SparkSession, dir: String): DataFrame =
    operators.Stats.dpNoisyMean(t(s, dir, "events"), Seq("event_type"),
        "value", lo = 0.0, hi = 100.0, epsilon = 1.0)
      .select(col("event_type"), col("n_true"),
        round(col("mean_true"), 6).as("mean_true"),
        round(col("n_noisy"), 4).as("n_noisy"),
        round(col("sum_noisy"), 4).as("sum_noisy"),
        round(col("mean_noisy"), 4).as("mean_noisy"))
      .orderBy("event_type")

  /** Capture–recapture dedup coverage
    * ([[operators.Stats.captureRecapture]]): two synthetic detector
    * passes over documents (independent mod rules) → Chapman estimate of
    * the total flaggable population and each pass's implied recall.
    * Counts are exact longs, so the closed forms replay bit-for-bit.
    */
  def q308CaptureRecapture(s: SparkSession, dir: String): DataFrame =
    operators.Stats.captureRecapture(t(s, dir, "documents"),
        pmod(col("doc_id"), lit(3)) === 0,
        pmod(col("doc_id") * 7 + 1, lit(5)) < 2)
      .select(col("n"), col("n_a"), col("n_b"), col("n_both"),
        round(col("n_est"), 4).as("n_est"),
        round(col("se_est"), 4).as("se_est"),
        round(col("recall_a"), 6).as("recall_a"),
        round(col("recall_b"), 6).as("recall_b"))

  /** Variance-reduced always-valid monitoring
    * ([[operators.EventAnalytics.alwaysValidCuped]]): per-user odd-event
    * count (metric) adjusted by the even-event count (covariate), binned
    * by each user's entry hour, q289's treatment hash. Counts are exact
    * longs, so every cumulative moment, θ_t, and the e-process replay
    * bit-for-bit (the q302 integer-outcome discipline — can_stop is a
    * comparison that must not drift).
    */
  def q309AlwaysvalidCuped(s: SparkSession, dir: String): DataFrame = {
    val perUser = t(s, dir, "events")
      .groupBy("user_id")
      .agg(sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L)).as("x"),
        sum(when(col("event_id") % 2 =!= 0, 1L).otherwise(0L)).as("y"),
        floor(min(col("ts").cast("long")) / 3600).as("bin"))
      .withColumn("is_a", pmod(col("user_id") * 16807, lit(97)) < 30)
    operators.EventAnalytics.alwaysValidCuped(perUser, col("is_a"),
        col("bin"), "y", "x")
      .select(col("bin").cast("long").as("bin"), col("n_a"), col("n_b"),
        round(col("theta"), 6).as("theta"),
        round(col("diff_raw"), 6).as("diff_raw"),
        round(col("diff_adj"), 6).as("diff_adj"),
        round(col("var_y"), 4).as("var_y"),
        round(col("var_adj"), 4).as("var_adj"),
        round(col("log_e_raw"), 6).as("log_e_raw"),
        round(col("log_e_adj"), 6).as("log_e_adj"),
        col("can_stop"))
      .orderBy("bin")
  }

  /** Stratified CMH McNemar ([[operators.Stats.mcnemarStratified]]):
    * q300's two synthetic model-correctness columns, stratified by
    * language — per-stratum discordant cells + the pooled CMH and
    * homogeneity χ²s. All cells exact longs → bit-exact oracle replay.
    */
  def q310McnemarStrat(s: SparkSession, dir: String): DataFrame =
    operators.Stats.mcnemarStratified(t(s, dir, "documents"),
        pmod(col("doc_id"), lit(7)) =!= 0, pmod(col("doc_id"), lit(5)) =!= 0,
        Seq("lang"))
      .select(col("lang"), col("n"), col("a_only_correct"),
        col("b_only_correct"), round(col("chi2"), 6).as("chi2"),
        col("n_strata"), col("n_informative"),
        round(col("cmh_chi2"), 6).as("cmh_chi2"),
        round(col("hom_chi2"), 6).as("hom_chi2"))
      .orderBy("lang")

  /** Personalized weighted PageRank
    * ([[operators.Graphs.pageRankPersonalized]]): the q141 derived ring
    * graph with weighted edges and a 32-doc restart seed set — random
    * walk with restart, 3 unrolled oracle rounds (seed-relative mass,
    * zeros off the reachable frontier). The embodiment is DYADIC-EXACT
    * by design, because rounding cannot rescue this operator: RWR
    * masses are rationals that land EXACTLY on decimal half-boundaries
    * at any precision (measured: 4 boundary flips at 9 dp with general
    * integer weights, boundary hits at 6 dp too), so the two engines
    * must compute bit-identical doubles. Ring weights are
    * 8 − 2·[even] − 3·[div3] so every source's out-weight sum is
    * exactly 8 (normalized weights k/8), the seed set is exactly 32
    * docs (r = 1/32), and damping is 0.875 = 7/8 — every product and
    * sum stays a dyadic rational far below 2⁵³, so fp addition is EXACT
    * and therefore order-independent in both engines.
    */
  def q311PersonalizedPagerank(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id")
    val nDf = docs.agg(count(lit(1)).as("n"))
    val base = docs.crossJoin(broadcast(nDf))
    val ringW = (lit(8) -
      when(col("doc_id") % 2 === 0, 2).otherwise(0) -
      when(col("doc_id") % 3 === 0, 3).otherwise(0)).cast("double")
    val edges = base
      .select(col("doc_id").as("src"),
        ((col("doc_id") + 1) % col("n")).as("dst"), ringW.as("w"))
      .union(base.where(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 7) % col("n")).as("dst"),
          lit(2.0).as("w")))
      .union(base.where(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 101) % col("n")).as("dst"),
          lit(3.0).as("w")))
    val seeds = docs.where(col("doc_id") < 32)
      .select(col("doc_id").as("node"))
    operators.Graphs.pageRankPersonalized(edges, iterations = 3,
        damping = 0.875, weightCol = Some("w"), restart = Some(seeds))
      .select(col("node"), round(col("pr"), 9).as("pr"))
      .orderBy("node")
  }

  /** Delta-method ratio metric ([[operators.Stats.ratioMetricDelta]]):
    * purchases per event with user-level clustering — per-user integer
    * counts make every moment exact, so ratios, SE and z replay
    * bit-for-bit in DuckDB.
    */
  def q312RatioMetric(s: SparkSession, dir: String): DataFrame = {
    val perUser = t(s, dir, "events")
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"),
        count(lit(1)).as("x"))
      .withColumn("is_a", pmod(col("user_id") * 16807, lit(97)) < 30)
    operators.Stats.ratioMetricDelta(perUser, col("is_a"), "y", "x")
      .select(col("n_a"), col("n_b"),
        round(col("ratio_a"), 6).as("ratio_a"),
        round(col("ratio_b"), 6).as("ratio_b"),
        round(col("diff"), 6).as("diff"),
        round(col("se"), 6).as("se"),
        round(col("z"), 4).as("z"))
  }

  /** MDE sizing curve ([[operators.Stats.mdeCurve]]): per-user event
    * counts + entry-day accrual → the "how many days until we can
    * detect X%" table over 5 horizons. Integer moments, literal z
    * quantiles — deterministic in both engines.
    */
  def q313MdeCurve(s: SparkSession, dir: String): DataFrame = {
    val perUser = t(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("y"),
        floor(min(col("ts").cast("long")) / 86400).as("bin"))
    operators.Stats.mdeCurve(perUser, col("bin"), "y",
        horizons = Seq(1, 2, 4, 8, 16))
      .select(col("horizon"), round(col("n_per_arm"), 4).as("n_per_arm"),
        round(col("mean"), 6).as("mean"), round(col("sd"), 6).as("sd"),
        round(col("mde_abs"), 6).as("mde_abs"),
        round(col("mde_rel"), 6).as("mde_rel"))
      .orderBy("horizon")
  }

  /** Modularity ([[operators.Graphs.modularity]]): the q141 ring graph
    * scored against a 64-doc block partition — ring edges are mostly
    * intra-block, the +101 hops are inter, so Q is meaningfully
    * positive. Exact-long cells → deterministic per-community terms.
    */
  def q314Modularity(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id")
    val nDf = docs.agg(count(lit(1)).as("n"))
    val base = docs.crossJoin(broadcast(nDf))
    val edges = base
      .select(col("doc_id").as("src"),
        ((col("doc_id") + 1) % col("n")).as("dst"))
      .union(base.where(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 7) % col("n")).as("dst")))
      .union(base.where(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 101) % col("n")).as("dst")))
    val labels = docs.select(col("doc_id").as("node"),
      floor(col("doc_id") / 64).as("community"))
    operators.Graphs.modularity(edges, labels)
      .select(col("n_nodes"), col("n_edges"), col("n_communities"),
        round(col("modularity"), 6).as("modularity"))
  }

  /** Degree assortativity ([[operators.Graphs.degreeAssortativity]])
    * over the q141 graph — integer degree moments replay bit-for-bit.
    */
  def q315Assortativity(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id")
    val nDf = docs.agg(count(lit(1)).as("n"))
    val base = docs.crossJoin(broadcast(nDf))
    val edges = base
      .select(col("doc_id").as("src"),
        ((col("doc_id") + 1) % col("n")).as("dst"))
      .union(base.where(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 7) % col("n")).as("dst")))
      .union(base.where(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("src"),
          ((col("doc_id") + 101) % col("n")).as("dst")))
    operators.Graphs.degreeAssortativity(edges)
      .select(col("n_nodes"), col("n_edges"),
        round(col("assortativity"), 6).as("assortativity"))
  }

  /** Reciprocity ([[operators.Graphs.reciprocity]]): directed ring with
    * the reverse edge planted on even sources — reciprocity exactly 2/3
    * by construction, the closed form the oracle replays.
    */
  def q316Reciprocity(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id")
    val nDf = docs.agg(count(lit(1)).as("n"))
    val base = docs.crossJoin(broadcast(nDf))
    val edges = base
      .select(col("doc_id").as("src"),
        ((col("doc_id") + 1) % col("n")).as("dst"))
      .union(base.where(col("doc_id") % 2 === 0)
        .select(((col("doc_id") + 1) % col("n")).as("src"),
          col("doc_id").as("dst")))
    operators.Graphs.reciprocity(edges)
      .select(col("n_edges"), col("n_reciprocal"),
        round(col("reciprocity"), 6).as("reciprocity"))
  }

  /** Scaling-law fit ([[operators.Quality.scalingLawFit]]): a planted
    * loss curve L = 2 + 10·N^(−0.3) over the cumulative per-hour user
    * counts — the "what does 10× data buy" fit. The c-grid search and
    * closed-form OLS replay in DuckDB; the cumulative window runs over
    * ≤ |hour bins| aggregate rows.
    */
  def q317ScalingLaw(s: SparkSession, dir: String): DataFrame = {
    val perBin = t(s, dir, "events")
      .groupBy("user_id")
      .agg(floor(min(col("ts").cast("long")) / 3600).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("nu"))
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = perBin.withColumn("n_scale", sum("nu").over(w))
      .select(col("n_scale"),
        (lit(2.0) + lit(10.0) *
          pow(col("n_scale").cast("double"), lit(-0.3))).as("loss"))
    operators.Quality.scalingLawFit(pts, "n_scale", "loss")
      .select(col("n_points"), round(col("c"), 4).as("c"),
        round(col("a"), 4).as("a"), round(col("b"), 4).as("b"),
        round(col("r2"), 6).as("r2"))
  }

  /** LSH planner ([[operators.Dedup.lshPlan]]): the 16-hash S-curve
    * table — collision probability and s₅₀ per (bands, rows) split.
    * Pure closed-form arithmetic; DuckDB replays the grid exactly.
    */
  def q318LshPlan(s: SparkSession, dir: String): DataFrame =
    operators.Dedup.lshPlan(s, numHashes = 16)
      .select(col("bands"), col("rows_per_band"),
        round(col("s50"), 6).as("s50"), col("sim"),
        round(col("p_collision"), 6).as("p_collision"))
      .orderBy("bands", "sim")

  /** IPW treatment effect ([[operators.Stats.ipwEstimate]]): q289's
    * score/treatment construction with integer-count outcomes — the
    * weighting-not-matching estimator plus its ESS diagnostics; every
    * weight is a deterministic rational, so sums replay to 4–6 dp.
    */
  def q319Ipw(s: SparkSession, dir: String): DataFrame = {
    val perUser = t(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("y"))
      .select(col("y"),
        (pmod(col("user_id") * 48271, lit(999983)).cast("double") /
          999983.0).as("score"),
        (pmod(col("user_id") * 16807, lit(97)) < 30).as("is_treated"))
    operators.Stats.ipwEstimate(perUser, col("is_treated"), "y", "score")
      .select(col("n_t"), col("n_c"),
        round(col("ess_t"), 4).as("ess_t"),
        round(col("ess_c"), 4).as("ess_c"),
        round(col("mean_t_ipw"), 6).as("mean_t_ipw"),
        round(col("mean_c_ipw"), 6).as("mean_c_ipw"),
        round(col("ate_ipw"), 6).as("ate_ipw"),
        round(col("ate_naive"), 6).as("ate_naive"))
  }

  /** Pseudo-relevance expansion
    * ([[operators.Retrieval.pseudoRelevanceExpansion]]): q139's query
    * over documents, top-5 feedback docs → top-10 expansion terms.
    * DuckDB replays the bm25 pass (q139's oracle machinery) and the
    * relevance-model term weighting.
    */
  def q320Prf(s: SparkSession, dir: String): DataFrame =
    operators.Retrieval.pseudoRelevanceExpansion(
        t(s, dir, "documents"), "doc_id", "text",
        queryTerms = Seq("spark", "join", "window"),
        fbDocs = 5, fbTerms = 10)
      .select(col("term"), col("n_fb_docs"),
        round(col("weight"), 6).as("weight"))

  /** MMR diversification ([[operators.Similarity.mmrRerank]]): 4 query
    * pools of 20 real embeddings each, deterministic relevance scores,
    * k=3 at λ=0.7 — the retrieval→context-window rerank. DuckDB
    * replays the 3 unrolled greedy rounds with the q39 cosine recipe.
    */
  def q321Mmr(s: SparkSession, dir: String): DataFrame = {
    val cands = Tables.loadEmbeddings(s, dir)
      .where(col("vec_id") < 80)
      .select(pmod(col("vec_id"), lit(4)).as("q"),
        col("vec_id").as("id"),
        (pmod(col("vec_id") * 31, lit(97)).cast("double") / 97.0)
          .as("score"),
        col("embedding"))
    operators.Similarity.mmrRerank(cands, "q", "id", "score",
        "embedding", k = 3, lambda = 0.7)
      .select(col("q"), col("id"), col("rank"),
        round(col("mmr"), 6).as("mmr"))
      .orderBy("q", "rank")
  }

  /** BM25F field-weighted retrieval ([[operators.Retrieval.bm25f]]):
    * title = the first 4 tokens (weight 2), body = the rest (weight 1),
    * derived deterministically so DuckDB replays the same fields — a
    * title hit must outrank the same hit buried in the body. Rounding
    * follows the q139 BM25 convention (6dp per term, 4dp total).
    */
  def q322Bm25f(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val docs = t(s, dir, "documents").select(col("doc_id"),
      array_join(slice(toks, 1, 4), " ").as("title"),
      array_join(slice(toks, lit(5),
        greatest(size(toks) - 4, lit(0))), " ").as("body"))
    operators.Retrieval.bm25f(docs, "doc_id",
        Seq("title" -> 2.0, "body" -> 1.0),
        Seq("spark", "join", "window"), topK = 10)
      .select(col("doc_id"), col("score"), col("n_terms_matched"))
  }

  /** Sequential SRM guard ([[operators.EventAnalytics.alwaysValidSrm]]):
    * q289's treatment hash (expected share exactly 30/97) monitored per
    * entry-hour bin — the always-valid version of q245's fixed-horizon
    * χ². Counts are exact longs and the e-process is closed-form, so
    * every bin replays bit-for-bit.
    */
  def q323AlwaysvalidSrm(s: SparkSession, dir: String): DataFrame =
    operators.EventAnalytics.alwaysValidSrm(
        t(s, dir, "events")
          .withColumn("bin", floor(col("ts").cast("long") / 3600)),
        pmod(col("user_id") * 16807, lit(97)) < 30, col("bin"),
        expectedShareA = 30.0 / 97)
      .select(col("bin").cast("long").as("bin"), col("n_a"), col("n_b"),
        round(col("share_a"), 6).as("share_a"),
        round(col("expected_share_a"), 6).as("expected_share_a"),
        round(col("diff"), 6).as("diff"),
        round(col("log_e_value"), 6).as("log_e_value"),
        col("srm_detected"))
      .orderBy("bin")

  /** Shared pairing for the generation-eval gates: candidate = the raw
    * document text, reference = the same document minus its last two
    * tokens — deterministic partial overlap (clipping and the length
    * ratio both bind), derivable identically in DuckDB.
    */
  private def evalPairs(s: SparkSession, dir: String): DataFrame = {
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    t(s, dir, "documents").select(col("doc_id"),
      col("text").as("cand"),
      array_join(slice(toks, lit(1),
        greatest(size(toks) - 2, lit(0))), " ").as("ref"))
  }

  /** Segment BLEU ([[operators.Quality.bleu]]): candidate vs its
    * 2-token-truncated self — clipped modified precisions, BP = 1 (the
    * candidate is the longer side), all closed-form rationals before the
    * final exp/ln, so 6dp rounding hash-matches.
    */
  def q324Bleu(s: SparkSession, dir: String): DataFrame =
    operators.Quality.bleu(evalPairs(s, dir), "doc_id", "cand", "ref")
      .select(col("doc_id"), col("cand_len"), col("ref_len"),
        round(col("p1"), 6).as("p1"), round(col("p2"), 6).as("p2"),
        round(col("p3"), 6).as("p3"), round(col("p4"), 6).as("p4"),
        round(col("bp"), 6).as("bp"), round(col("bleu"), 6).as("bleu"))
      .orderBy("doc_id")

  /** ROUGE-2 recall ([[operators.Quality.rougeN]]): the recall side of
    * q324's pairing — every reference bigram is in the candidate by
    * construction, so recall is exactly 1 wherever the reference has
    * bigrams (and null where it does not) — the invariant the oracle
    * replays cell for cell.
    */
  def q325Rouge(s: SparkSession, dir: String): DataFrame =
    operators.Quality.rougeN(evalPairs(s, dir), "doc_id", "cand", "ref",
        n = 2)
      .select(col("doc_id"), col("n_overlap"), col("n_ref"),
        round(col("recall"), 6).as("recall"))
      .orderBy("doc_id")

  /** Benjamini–Hochberg FDR ([[operators.Stats.bhFdr]]): one synthetic
    * p-value per 8-doc test bucket (min of a modular hash — skewed low,
    * so the step-up cut is non-trivial at q=0.2). Exact-rational
    * p-values replay bit-for-bit.
    */
  def q326BhFdr(s: SparkSession, dir: String): DataFrame =
    operators.Stats.bhFdr(
        t(s, dir, "documents")
          .groupBy(floor(col("doc_id") / 8).as("test"))
          .agg((min(pmod(col("doc_id") * 37, lit(997))).cast("double") /
            996.0).as("p")),
        "test", "p", q = 0.2)
      .select(col("test").cast("long").as("test"),
        round(col("p"), 6).as("p"), col("rank"), col("m"),
        round(col("p_adj"), 6).as("p_adj"), col("rejected"))
      .orderBy("test")

  /** chrF ([[operators.Quality.chrF]]): q324's pairing at the character
    * level — whitespace-stripped char n-grams survive the tokenizer, so
    * the 2-token truncation costs recall but keeps precision 1 wherever
    * the candidate's grams all appear in the reference's suffix-free
    * prefix; the F_2 curve the oracle replays per pair.
    */
  def q327Chrf(s: SparkSession, dir: String): DataFrame =
    operators.Quality.chrF(evalPairs(s, dir), "doc_id", "cand", "ref")
      .select(col("doc_id"), round(col("chr_p"), 6).as("chr_p"),
        round(col("chr_r"), 6).as("chr_r"),
        round(col("chrf"), 6).as("chrf"))
      .orderBy("doc_id")

  /** Dirichlet query likelihood ([[operators.Retrieval.queryLikelihood]]):
    * the q139 query under the language-modeling scorer, μ=300 for the
    * short synthetic docs — shuffle-free by construction (scan-side
    * per-term tf + one-row cf broadcast), exact rationals into ln.
    */
  def q328QueryLikelihood(s: SparkSession, dir: String): DataFrame =
    operators.Retrieval.queryLikelihood(t(s, dir, "documents"),
        "doc_id", "text", Seq("spark", "join", "window"),
        mu = 300.0, topK = 10)
      .select(col("doc_id"), round(col("score"), 6).as("score"),
        col("n_terms_matched"))

  /** k-center coreset ([[operators.Similarity.kCenterCoreset]]): 4
    * farthest-first picks over a 100-vector pool — the labeling-budget
    * selection pass; DuckDB replays the unrolled greedy rounds with the
    * q39 cosine recipe and the running-min carry.
    */
  def q329KcenterCoreset(s: SparkSession, dir: String): DataFrame =
    operators.Similarity.kCenterCoreset(
        Tables.loadEmbeddings(s, dir).where(col("vec_id") < 100)
          .select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", k = 4)
      .select(col("vec_id"), col("rank"),
        round(col("radius"), 6).as("radius"))
      .orderBy("rank")

  /** Trained-BPE compression audit
    * ([[operators.Analytics.bpeCompressionAudit]]): bytes-per-token and
    * per-doc p50/p95 per source under the q103b fixed merge table (chained
    * multi-char merges exercised; a TRAINED table is spec-covered in
    * AnalyticsSpec with [[functions.Text.bpeMerges]]). The oracle replays
    * segmentation with the q103b chained-replace recipe and quantile_cont
    * (≡ Spark's exact percentile).
    */
  /** Facility-location greedy selection
    * ([[operators.Similarity.facilityLocationSelect]]): 4 coverage-
    * maximizing picks over q329's 100-vector pool — the representative
    * counterpart to k-center's outlier-chasing max-min, same pool so the
    * two selection objectives are directly comparable. DuckDB replays
    * the unrolled greedy rounds: pairwise cosines once, per-round
    * marginal-gain sums over the running best-coverage carry, argmax by
    * (gain desc, id).
    */
  def q331FacilityLocation(s: SparkSession, dir: String): DataFrame =
    operators.Similarity.facilityLocationSelect(
        Tables.loadEmbeddings(s, dir).where(col("vec_id") < 100)
          .select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", k = 4)
      .select(col("vec_id"), col("rank"),
        round(col("gain"), 6).as("gain"))
      .orderBy("rank")

  /** TextRank sentence salience ([[operators.Quality.textRank]]):
    * sentences manufactured as in q123 (" the " → ". The "), 5 fixed
    * weighted-PageRank rounds — the unsupervised extractive-
    * summarization scorer. Damping is 7/8 (q311's dyadic-exact trick),
    * NOT the 0.85 default: symmetric subgraphs cancel the ln weights to
    * exact rationals (wn = 1/2, 1/3), so scores there are polynomials
    * in {damping, 1−damping, 1/2} — with 0.85 those land EXACTLY on
    * decimal rounding half-boundaries (measured: 1.6633240625 flipped
    * 11 rows at 9dp between engines), while dyadic values can never
    * decimal-tie. The gate emits ALL sentences ordered by
    * (doc_id, sent_idx) — a top-k cut on float scores would let
    * cross-engine ulps flip ties; the rank column's determinism is
    * QualitySpec-covered.
    */
  def q332Textrank(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        regexp_replace(col("text"), " the ", ". The ").as("text"))
    operators.Quality.textRank(docs, "doc_id", "text",
        iterations = 5, damping = 0.875)
      .select(col("doc_id"), col("sent_idx"), col("n_tokens"),
        round(col("score"), 6).as("score"))
      .orderBy("doc_id", "sent_idx")
  }

  /** DBSCAN density clustering ([[operators.Similarity.dbscan]]) over the
    * q84 embedding slice: exact eps-neighbor pairs at cosine ≥ 0.30
    * (q84's threshold family — at 0.30 the slice splits into ~10 dense
    * clusters with singleton cores, borders AND noise at every sf),
    * minPts 3. Output is all-integer/boolean/string, so the oracle —
    * degrees, core flags, a recursive-CTE closure over core–core edges
    * (q84's pattern), min-label border attachment — hash-matches with no
    * float rounding at all.
    */
  def q333Dbscan(s: SparkSession, dir: String): DataFrame = {
    val pts = Tables.loadEmbeddings(s, dir).where(col("vec_id") < 150)
      .select(col("vec_id"), col("embedding"))
    val pairs = operators.Dedup.embeddingNearDupExact(
      pts, "vec_id", "embedding", threshold = 0.30)
    operators.Similarity.dbscan(pts, "vec_id", pairs, minPts = 3)
      .orderBy("vec_id")
  }

  def q330BpeCompression(s: SparkSession, dir: String): DataFrame =
    operators.Analytics.bpeCompressionAudit(
        t(s, dir, "documents"), "source", "text",
        Seq("e" -> "r", "i" -> "n", "t" -> "h", "th" -> "e",
          "o" -> "n", "a" -> "n", "an" -> "d", "er" -> "s"))
      .orderBy("source")

  def q276KeySkew(s: SparkSession, dir: String): DataFrame =
    operators.Quality.keySkew(
        Tables.loadEvents(s, dir)
          .select((col("user_id") % 137).as("ubucket")),
        Seq("ubucket"), topN = 10)
      .select(col("ubucket"), col("n"), round(col("share"), 6).as("share"),
        col("rank"), col("n_keys"),
        round(col("skew_factor"), 6).as("skew_factor"))
      .orderBy("rank")

  /** Matryoshka truncation audit
    * ([[operators.Similarity.truncationRecall]]): top-3 recall of 48/32/
    * 16-dim prefix truncations vs the full 64-dim truth — every top-k on
    * both sides replayed exactly by DuckDB (sliced-list cosine + the q39
    * tie order), so the recall numbers hash-match.
    */
  def q273TruncationRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.loadEmbeddings(s, dir)
    operators.Similarity.truncationRecall(emb,
        emb.where(col("vec_id") <= 20), "vec_id", "embedding",
        dims = Seq(48, 32, 16), k = 3)
      .select(col("dim"), col("n_truth"), col("n_hits"),
        round(col("recall"), 6).as("recall"))
      .orderBy("dim")
  }

  /** Per-group weighted sampling
    * ([[operators.Splits.weightedSamplePerGroup]]): per-SOURCE top-5
    * documents by A-Res priority `u^(1/n_chars)` — the per-source
    * quality-weighted quota, ranked through the distributed
    * [[operators.Ranks.groupedRunningSum]]. Same multiplicative-modulo
    * uniform as q144 so DuckDB replays priority and the per-group rank
    * digit-for-digit.
    */
  def q274GroupWeightedSample(s: SparkSession, dir: String): DataFrame =
    operators.Splits.weightedSamplePerGroup(
        t(s, dir, "documents").select("doc_id", "source", "n_chars"),
        Seq("source"), "doc_id", "n_chars", k = 5,
        uniform = c => ((c * 2654435761L) % 1000003L).cast("double")
          / 1000003.0)
      .select(col("source"), col("doc_id"), col("n_chars"),
        round(col("__priority"), 9).as("priority"))
      .orderBy(col("source"), col("priority").desc, col("doc_id"))

  /** Nearest join ([[operators.Joins.nearestJoin]]): each purchase
    * matched to the user's temporally CLOSEST view within ±2 h — ties to
    * the earlier view, equal-timestamp views reduced to min event_id.
    * DuckDB replays as the inequality-join argmin (same tie order).
    */
  def q270NearestJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEvents(s, dir)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"))
    operators.Joins.nearestJoin(purchases, views, "user_id", "ts", "ts",
        Seq("view_id"), toleranceSec = Some(7200L))
      .select(col("event_id"), col("user_id"), col("nearest_view_id"),
        round(col("nearest_dt_sec"), 6).as("nearest_dt_sec"))
      .orderBy("event_id")
  }

  /** PII census ([[operators.Quality.piiScan]]) over documents with
    * planted PII — a Luhn-VALID card (doc_id % 4 == 0), a Luhn-invalid
    * 16-digit run (% 4 == 1), emails (% 3 == 0), SSNs (% 5 == 0), phones
    * (% 7 == 0). DuckDB replays the regex families and the mod-10
    * checksum digit-for-digit, so n_cards_valid < n_card_candidates is
    * hash-proven, not asserted.
    */
  def q268PiiScan(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val planted = docs.select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 4 === 0,
          lit(" contact 4111 1111 1111 1111 now")).otherwise(lit("")),
        when(col("doc_id") % 4 === 1,
          lit(" ref 4111-1111-1111-1112 x")).otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          concat(lit(" mail bob"), col("doc_id").cast("string"),
            lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          lit(" ssn 123-45-6789")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          lit(" call (555) 867-5309 now")).otherwise(lit("")))
        .as("text"))
    operators.Quality.piiScan(planted, "doc_id", "text").orderBy("doc_id")
  }

  /** The q262-q264 transcript corpus: each document's tokens become a
    * chat JSON — 4 alternating user/assistant turns of 8 tokens each, or
    * (doc_id % 5 == 0) a BROKEN 3-turn transcript with two consecutive
    * user turns. Built with to_json so the gate exercises the full
    * build → from_json round trip; the oracle replays the token slices
    * closed-form.
    */
  private def chatCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val toks = filter(split(col("text"), " "), tk => length(tk) > 0)
    def seg(a: Int) = array_join(slice(toks, a, 8), " ")
    def turn(r: String, c: org.apache.spark.sql.Column) =
      struct(lit(r).as("role"), c.as("content"))
    val normal = to_json(array(turn("user", seg(1)),
      turn("assistant", seg(9)), turn("user", seg(17)),
      turn("assistant", seg(25))))
    val broken = to_json(array(turn("user", seg(1)),
      turn("user", seg(9)), turn("assistant", seg(17))))
    docs.select(col("doc_id"),
      when(col("doc_id") % 5 === 0, broken).otherwise(normal).as("conv"))
  }

  /** Chat transcript stats ([[operators.Chats.conversationStats]]):
    * role counts, alternation, empty-content and token tallies per
    * transcript — every column replayed closed-form from the token
    * slices by DuckDB.
    */
  def q262ChatStats(s: SparkSession, dir: String): DataFrame =
    operators.Chats.conversationStats(chatCorpus(s, dir), "doc_id", "conv")
      .orderBy("doc_id")

  /** Transcript flattening ([[operators.Chats.flatten]]): role-sentinel
    * training text, hash-compared character-for-character.
    */
  def q263ChatFlatten(s: SparkSession, dir: String): DataFrame =
    operators.Chats.flatten(chatCorpus(s, dir), "doc_id", "conv")
      .orderBy("doc_id")

  /** Transcript validation ([[operators.Chats.validChats]]): the
    * surviving doc_ids equal the closed-form rule (non-broken AND ≥ 25
    * tokens so every turn is non-empty).
    */
  def q264ValidChats(s: SparkSession, dir: String): DataFrame =
    operators.Chats.validChats(chatCorpus(s, dir), "doc_id", "conv")
      .select("doc_id").orderBy("doc_id")

  /** The q265/q266 preference corpus: per doc, chosen = the first
    * 16 + (doc_id % 5)·4 tokens, rejected = tokens 9..28 — overlapping
    * slices with doc-dependent length skew; doc_id % 11 == 0 pairs are
    * IDENTICAL (planted no-signal pairs).
    */
  private def prefCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    val toks = filter(split(col("text"), " "), tk => length(tk) > 0)
    val chosen = array_join(
      slice(toks, lit(1), (lit(16) + (col("doc_id") % 5) * 4).cast("int")),
      " ")
    docs.select(col("doc_id"), chosen.as("chosen"),
      when(col("doc_id") % 11 === 0, chosen)
        .otherwise(array_join(slice(toks, lit(9), lit(20)), " "))
        .as("rejected"))
  }

  /** SFT loss-mask spans ([[operators.Chats.assistantMaskSpans]]): the
    * assistant-turn token ranges of each q262 transcript — offsets
    * replayed closed-form from the per-turn token counts.
    */
  def q269MaskSpans(s: SparkSession, dir: String): DataFrame =
    operators.Chats.assistantMaskSpans(chatCorpus(s, dir), "doc_id", "conv")
      .orderBy("doc_id", "seg_idx")

  /** Preference-pair structure ([[operators.Preferences.pairStats]]):
    * per-pair token lengths, length flag/ratio, distinct-token Jaccard
    * and exact-duplicate flag — DuckDB replays the slices and the set
    * algebra.
    */
  def q265PrefStats(s: SparkSession, dir: String): DataFrame =
    operators.Preferences.pairStats(prefCorpus(s, dir), "doc_id",
        "chosen", "rejected")
      .select(col("doc_id"), col("len_chosen"), col("len_rejected"),
        col("chosen_longer"), round(col("len_ratio"), 6).as("len_ratio"),
        round(col("jaccard"), 6).as("jaccard"), col("identical"))
      .orderBy("doc_id")

  /** Length-bias audit ([[operators.Preferences.lengthBiasAudit]]): the
    * one-row reward-data health readout (chosen-longer fraction,
    * identical and high-overlap mass) replayed aggregate-for-aggregate.
    */
  def q266PrefAudit(s: SparkSession, dir: String): DataFrame =
    operators.Preferences.lengthBiasAudit(prefCorpus(s, dir), "doc_id",
        "chosen", "rejected")
      .select(col("n_pairs"),
        round(col("frac_chosen_longer"), 6).as("frac_chosen_longer"),
        round(col("mean_len_ratio"), 6).as("mean_len_ratio"),
        round(col("frac_identical"), 6).as("frac_identical"),
        round(col("frac_high_overlap"), 6).as("frac_high_overlap"),
        round(col("mean_jaccard"), 6).as("mean_jaccard"))

  // ---- registry ------------------------------------------------------------

  val all: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q01_scan_project" -> (q01ScanProject _),
    "q02_conform_rename_cast" -> (q02ConformRenameCast _),
    "q03_filter_predicates" -> (q03FilterPredicates _),
    "q04_case_bucket_tod" -> (q04CaseBucketTod _),
    "q05_agg_returnflag" -> (q05AggReturnflag _),
    "q06_agg_multikey" -> (q06AggMultikey _),
    "q07_global_minmax" -> (q07GlobalMinmax _),
    "q08_join_orders_customer" -> (q08JoinOrdersCustomer _),
    "q09_join_filtered_dim" -> (q09JoinFilteredDim _),
    "q10_join_fanout" -> (q10JoinFanout _),
    "q11_star_join" -> (q11StarJoin _),
    "q12_topk_suppliers" -> (q12TopkSuppliers _),
    "q13_sort_limit" -> (q13SortLimit _),
    "q14_date_spine" -> (q14DateSpine _),
    "q15_dow_hour" -> (q15DowHour _),
    "q16_datediff_monthly" -> (q16DatediffMonthly _),
    "q17_year_quarter" -> (q17YearQuarter _),
    "q18_rollup" -> (q18Rollup _),
    "q19_distinct" -> (q19Distinct _),
    "q20_union" -> (q20Union _),
    "q21_semi_join" -> (q21SemiJoin _),
    "q22_anti_join" -> (q22AntiJoin _),
    "q23_window_rank" -> (q23WindowRank _),
    "q24_window_running_sum" -> (q24WindowRunningSum _),
    "q25_having" -> (q25Having _),
    "q26_conditional_agg" -> (q26ConditionalAgg _),
    "q27_sql_entry" -> (q27SqlEntry _),
    "q28_count_distinct" -> (q28CountDistinct _),
    "q28b_approx_distinct" -> (q28bApproxDistinct _),
    "q29_cube" -> (q29Cube _),
    "q30_dedup_exact" -> (q30DedupExact _),
    "q31_dedup_normalized" -> (q31DedupNormalized _),
    "q32_text_quality" -> (q32TextQuality _),
    "q33_token_counts" -> (q33TokenCounts _),
    "q34_fingerprint_md5" -> (q34FingerprintMd5 _),
    "q35_lang_id" -> (q35LangId _),
    "q36_minhash_pairs" -> (q36MinhashPairs _),
    "q37_simhash_pairs" -> (q37SimhashPairs _),
    "q36b_minhash_exact" -> (q36bMinhashExact _),
    "q37b_simhash_exact" -> (q37bSimhashExact _),
    "q38_jaccard_dups" -> (q38JaccardDups _),
    "q39_embedding_topk" -> (q39EmbeddingTopk _),
    "q39b_embedding_norms" -> (q39bEmbeddingNorms _),
    "q39c_lsh_topk" -> (q39cLshTopk _),
    "q39d_ivf_topk" -> (q39dIvfTopk _),
    "q95_pq_topk" -> (q95PqTopk _),
    "q95b_pq_topk_prod" -> (q95bPqTopkProd _),
    "q96_ivfpq_topk" -> (q96IvfPqTopk _),
    "q97_resample_ffill" -> (q97ResampleFfill _),
    "q98_semantic_clusters" -> (q98SemanticClusters _),
    "q99_vocab_topn" -> (q99VocabTopn _),
    "q99b_cms_counts" -> (q99bCmsCounts _),
    "q100_balance_sources" -> (q100BalanceSources _),
    "q101_snapshot_diff" -> (q101SnapshotDiff _),
    "q102_bpe_merges" -> (q102BpeMerges _),
    "q103_bpe_segment" -> (q103BpeSegment _),
    "q102b_bpe_train_exact" -> (q102bBpeTrainExact _),
    "q103b_bpe_segment_exact" -> (q103bBpeSegmentExact _),
    "q104_negative_pairs" -> (q104NegativePairs _),
    "q105_hard_negatives" -> (q105HardNegatives _),
    "q106_unigram_kl" -> (q106UnigramKl _),
    "q107_diverse_sample" -> (q107DiverseSample _),
    "q108_dsir_weights" -> (q108DsirWeights _),
    "q109_unicode_norm" -> (q109UnicodeNorm _),
    "q110_bigram_nll" -> (q110BigramNll _),
    "q111_char_entropy" -> (q111CharEntropy _),
    "q112_pack_concat" -> (q112PackConcat _),
    "q113_curriculum" -> (q113Curriculum _),
    "q114_source_keywords" -> (q114SourceKeywords _),
    "q115_dedup_survivors" -> (q115DedupSurvivors _),
    "q116_containment" -> (q116Containment _),
    "q117_mixture_sample" -> (q117MixtureSample _),
    "q118_semdedup" -> (q118SemDedup _),
    "q119_prototypicality" -> (q119Prototypicality _),
    "q120_padding_waste" -> (q120PaddingWaste _),
    "q121_temperature_mix" -> (q121TemperatureMix _),
    "q122_gopher_rules" -> (q122GopherRules _),
    "q123_sentence_chunks" -> (q123SentenceChunks _),
    "q124_boilerplate" -> (q124Boilerplate _),
    "q125_c4_clean" -> (q125C4Clean _),
    "q126_perplexity_tiers" -> (q126PerplexityTiers _),
    "q127_tokenizer_fertility" -> (q127TokenizerFertility _),
    "q128_repeat_allocation" -> (q128RepeatAllocation _),
    "q129_bikeshare_scale" -> (q129BikeshareScale _),
    "q130_delta_read" -> (q130DeltaRead _),
    "q131_chunk_dedup_verified" -> (q131ChunkDedupVerified _),
    "q132_knn_labels" -> (q132KnnLabels _),
    "q133_centroid_margin" -> (q133CentroidMargin _),
    "q134_funnel" -> (q134Funnel _),
    "q135_retention" -> (q135Retention _),
    "q136_transitions" -> (q136Transitions _),
    "q137_attribution" -> (q137Attribution _),
    "q138_ab_lift" -> (q138AbLift _),
    "q139_bm25" -> (q139Bm25 _),
    "q140_source_report" -> (q140SourceReport _),
    "q141_pagerank" -> (q141PageRank _),
    "q142_logreg" -> (q142LogReg _),
    "q143_embed_cov" -> (q143EmbedCov _),
    "q144_weighted_sample" -> (q144WeightedSample _),
    "q145_triangles" -> (q145Triangles _),
    "q146_local_clustering" -> (q146LocalClustering _),
    "q147_jaccard_join" -> (q147JaccardJoin _),
    "q148_hll_sketches" -> (q148HllSketches _),
    "q149_edit_distance" -> (q149EditDistance _),
    "q150_anomaly" -> (q150Anomaly _),
    "q151_token_mi" -> (q151TokenMi _),
    "q152_robust_scale" -> (q152RobustScale _),
    "q153_communities" -> (q153Communities _),
    "q154_rrf_fusion" -> (q154RrfFusion _),
    "q155_collocations" -> (q155Collocations _),
    "q156_column_deps" -> (q156ColumnDeps _),
    "q157_quantile_sketch" -> (q157QuantileSketch _),
    "q158_psi_drift" -> (q158PsiDrift _),
    "q159_association_rules" -> (q159AssociationRules _),
    "q160_kcore" -> (q160KCore _),
    "q161_topk_per_group" -> (q161TopkPerGroup _),
    "q162_index_search" -> (q162IndexSearch _),
    "q163_categorical_drift" -> (q163CategoricalDrift _),
    "q164_neyman_allocation" -> (q164NeymanAllocation _),
    "q165_margin_mining" -> (q165MarginMining _),
    "q166_readability" -> (q166Readability _),
    "q167_zipf_fit" -> (q167ZipfFit _),
    "q168_compress_ratio" -> (q168CompressRatio _),
    "q169_ranking_metrics" -> (q169RankingMetrics _),
    "q170_calibration" -> (q170Calibration _),
    "q171_kappa" -> (q171Kappa _),
    "q172_chisq" -> (q172Chisq _),
    "q173_mannwhitney" -> (q173MannWhitney _),
    "q174_acf" -> (q174Acf _),
    "q175_kanonymity" -> (q175KAnonymity _),
    "q176_naive_bayes" -> (q176NaiveBayes _),
    "q177_kmeans" -> (q177KMeans _),
    "q178_ols" -> (q178Ols _),
    "q179_target_encode" -> (q179TargetEncode _),
    "q180_benford" -> (q180Benford _),
    "q181_bfs" -> (q181Bfs _),
    "q182_ewma" -> (q182Ewma _),
    "q183_gini" -> (q183Gini _),
    "q184_mahalanobis" -> (q184Mahalanobis _),
    "q185_delta_join" -> (q185DeltaJoin _),
    "q186_quantize_int8" -> (q186QuantizeInt8 _),
    "q187_image_near_dup" -> (q187ImageNearDup _),
    "q188_oov_rate" -> (q188OovRate _),
    "q189_trimmed_mean" -> (q189TrimmedMean _),
    "q190_mmd_drift" -> (q190MmdDrift _),
    "q191_cms_join_size" -> (q191CmsJoinSize _),
    "q192_bootstrap_ci" -> (q192BootstrapCi _),
    "q192b_bootstrap_exact" -> (q192bBootstrapExact _),
    "q193_profile" -> (q193Profile _),
    "q194_observe" -> (q194Observe _),
    "q195_mv_rewrite" -> (q195MvRewrite _),
    "q196_geo_pairs" -> (q196GeoPairs _),
    "q197_spearman" -> (q197Spearman _),
    "q198_kaplan_meier" -> (q198KaplanMeier _),
    "q199_auc" -> (q199Auc _),
    "q200_pr_curve" -> (q200PrCurve _),
    "q201_jaro_winkler" -> (q201JaroWinkler _),
    "q202_entity_match" -> (q202EntityMatch _),
    "q203_entity_resolve" -> (q203EntityResolve _),
    "q204_phrase_match" -> (q204PhraseMatch _),
    "q205_seasonal" -> (q205Seasonal _),
    "q206_seasonal_anomaly" -> (q206SeasonalAnomaly _),
    "q207_cusum" -> (q207Cusum _),
    "q208_ks_test" -> (q208KsTest _),
    "q209_kendall_tau" -> (q209KendallTau _),
    "q210_lift_gain" -> (q210LiftGain _),
    "q211_url_curation" -> (q211UrlCuration _),
    "q212_top_paths" -> (q212TopPaths _),
    "q213_random_projection" -> (q213RandomProjection _),
    "q214_kneser_ney" -> (q214KneserNey _),
    "q215_quantile_norm" -> (q215QuantileNorm _),
    "q216_mutual_knn" -> (q216MutualKnn _),
    "q217_welch_t" -> (q217WelchT _),
    "q218_dp_counts" -> (q218DpCounts _),
    "q219_cuped" -> (q219Cuped _),
    "q220_theil_sen" -> (q220TheilSen _),
    "q221_tfidf_cosine" -> (q221TfidfCosine _),
    "q222_conformal" -> (q222Conformal _),
    "q223_backtest" -> (q223Backtest _),
    "q224_brier" -> (q224Brier _),
    "q225_interval_overlap" -> (q225IntervalOverlap _),
    "q226_mad_outliers" -> (q226MadOutliers _),
    "q227_padding_waste" -> (q227PaddingWaste _),
    "q228_linear_attribution" -> (q228LinearAttribution _),
    "q229_prefix_groups" -> (q229PrefixGroups _),
    "q230_out_of_order" -> (q230OutOfOrder _),
    "q231_winsorize" -> (q231Winsorize _),
    "q232_percentile_bands" -> (q232PercentileBands _),
    "q233_ols_trend" -> (q233OlsTrend _),
    "q234_binned_mi" -> (q234BinnedMi _),
    "q235_isotonic" -> (q235Isotonic _),
    "q236_woe_iv" -> (q236WoeIv _),
    "q237_markov_attribution" -> (q237MarkovAttribution _),
    "q238_confident_joint" -> (q238ConfidentJoint _),
    "q239_dup_spectrum" -> (q239DupSpectrum _),
    "q240_component_strengths" -> (q240ComponentStrengths _),
    "q241_markov_shapley" -> (q241MarkovShapley _),
    "q242_lang_consistency" -> (q242LangConsistency _),
    "q243_chi_merge" -> (q243ChiMerge _),
    "q243b_chi_merge_approx" -> (q243bChiMergeApprox _),
    "q244_wasserstein" -> (q244Wasserstein _),
    "q245_srm" -> (q245Srm _),
    "q246_qte" -> (q246Qte _),
    "q247_funnel_latency" -> (q247FunnelLatency _),
    "q248_bh_adjust" -> (q248BhAdjust _),
    "q249_cmh" -> (q249Cmh _),
    "q250_dispersion" -> (q250Dispersion _),
    "q251_leak_free_split" -> (q251LeakFreeSplit _),
    "q252_silhouette" -> (q252Silhouette _),
    "q253_fk_audit" -> (q253FkAudit _),
    "q254_scd_audit" -> (q254ScdAudit _),
    "q255_mix_shift" -> (q255MixShift _),
    "q256_ngram_novelty" -> (q256NgramNovelty _),
    "q257_source_affinity" -> (q257SourceAffinity _),
    "q258_ann_recall" -> (q258AnnRecall _),
    "q259_sketch_error" -> (q259SketchError _),
    "q260_repeated_spans" -> (q260RepeatedSpans _),
    "q261_scrub_spans" -> (q261ScrubSpans _),
    "q262_chat_stats" -> (q262ChatStats _),
    "q263_chat_flatten" -> (q263ChatFlatten _),
    "q264_valid_chats" -> (q264ValidChats _),
    "q265_pref_stats" -> (q265PrefStats _),
    "q266_pref_audit" -> (q266PrefAudit _),
    "q267_contaminated_spans" -> (q267ContaminatedSpans _),
    "q268_pii_scan" -> (q268PiiScan _),
    "q269_mask_spans" -> (q269MaskSpans _),
    "q270_nearest_join" -> (q270NearestJoin _),
    "q271_l_diversity" -> (q271LDiversity _),
    "q272_t_closeness" -> (q272TCloseness _),
    "q273_truncation_recall" -> (q273TruncationRecall _),
    "q274_group_weighted_sample" -> (q274GroupWeightedSample _),
    "q276_key_skew" -> (q276KeySkew _),
    "q275_corpus_card" -> (q275CorpusCard _),
    "q277_temperature_sample" -> (q277TemperatureSample _),
    "q278_ingest_newdocs" -> (q278IngestNewdocs _),
    "q279_snapshot_diff" -> (q279SnapshotDiff _),
    "q280_proportion_ci" -> (q280ProportionCi _),
    "q281_asof_tolerance" -> (q281AsofTolerance _),
    "q282_adjusted_rand" -> (q282AdjustedRand _),
    "q283_apportion_budget" -> (q283ApportionBudget _),
    "q284_rbo" -> (q284Rbo _),
    "q285_domain_reweight" -> (q285DomainReweight _),
    "q286_log_rank" -> (q286LogRank _),
    "q287_adamic_adar" -> (q287AdamicAdar _),
    "q288_vocab_coverage" -> (q288VocabCoverage _),
    "q289_propensity_match" -> (q289PropensityMatch _),
    "q290_diff_in_diff" -> (q290DiffInDiff _),
    "q291_hits" -> (q291Hits _),
    "q292_nelson_aalen" -> (q292NelsonAalen _),
    "q293_cohort_ltv" -> (q293CohortLtv _),
    "q294_rfm" -> (q294Rfm _),
    "q295_bradley_terry" -> (q295BradleyTerry _),
    "q296_krippendorff" -> (q296Krippendorff _),
    "q297_dawid_skene" -> (q297DawidSkene _),
    "q298_always_valid" -> (q298AlwaysValid _),
    "q299_eb_shrink" -> (q299EbShrink _),
    "q300_mcnemar" -> (q300Mcnemar _),
    "q301_uplift_deciles" -> (q301UpliftDeciles _),
    "q302_permutation_test" -> (q302PermutationTest _),
    "q303_heaps_law" -> (q303HeapsLaw _),
    "q304_temperature_scaling" -> (q304TemperatureScaling _),
    "q305_dedupe_paragraphs" -> (q305DedupeParagraphs _),
    "q306_best_threshold" -> (q306BestThreshold _),
    "q307_dp_noisy_mean" -> (q307DpNoisyMean _),
    "q308_capture_recapture" -> (q308CaptureRecapture _),
    "q309_alwaysvalid_cuped" -> (q309AlwaysvalidCuped _),
    "q310_mcnemar_strat" -> (q310McnemarStrat _),
    "q311_personalized_pagerank" -> (q311PersonalizedPagerank _),
    "q312_ratio_metric" -> (q312RatioMetric _),
    "q313_mde_curve" -> (q313MdeCurve _),
    "q314_modularity" -> (q314Modularity _),
    "q315_assortativity" -> (q315Assortativity _),
    "q316_reciprocity" -> (q316Reciprocity _),
    "q317_scaling_law" -> (q317ScalingLaw _),
    "q318_lsh_plan" -> (q318LshPlan _),
    "q319_ipw" -> (q319Ipw _),
    "q320_prf" -> (q320Prf _),
    "q321_mmr" -> (q321Mmr _),
    "q322_bm25f" -> (q322Bm25f _),
    "q323_alwaysvalid_srm" -> (q323AlwaysvalidSrm _),
    "q324_bleu" -> (q324Bleu _),
    "q325_rouge" -> (q325Rouge _),
    "q326_bh_fdr" -> (q326BhFdr _),
    "q327_chrf" -> (q327Chrf _),
    "q328_query_likelihood" -> (q328QueryLikelihood _),
    "q329_kcenter_coreset" -> (q329KcenterCoreset _),
    "q330_bpe_compression" -> (q330BpeCompression _),
    "q331_facility_location" -> (q331FacilityLocation _),
    "q332_textrank" -> (q332Textrank _),
    "q333_dbscan" -> (q333Dbscan _),
    "q40_events_hourly" -> (q40EventsHourly _),
    "q41_sessionize" -> (q41Sessionize _),
    "q42_binary_meta" -> (q42BinaryMeta _),
    "q44_conform_agg" -> (q44ConformAgg _),
    "q45_corpus_pipeline" -> (q45CorpusPipeline _),
    "q45b_corpus_pipeline_exact" -> (q45bCorpusPipelineExact _),
    "q46_asof_join" -> (q46AsofJoin _),
    "q47_salted_join" -> (q47SaltedJoin _),
    "q48_json_extract" -> (q48JsonExtract _),
    "q49_source_similarity" -> (q49SourceSimilarity _),
    "q50_chunk_dedup" -> (q50ChunkDedup _),
    "q50b_chunk_dedup_exact" -> (q50bChunkDedupExact _),
    "q51_percentiles" -> (q51Percentiles _),
    "q51b_approx_percentiles" -> (q51bApproxPercentiles _),
    "q52_string_funcs" -> (q52StringFuncs _),
    "q53_null_handling" -> (q53NullHandling _),
    "q54_window_lag_ntile" -> (q54WindowLagNtile _),
    "q55_pivot" -> (q55Pivot _),
    "q56_posexplode" -> (q56Posexplode _),
    "q57_range_join" -> (q57RangeJoin _),
    "q58_scd2" -> (q58Scd2 _),
    "q59_grouping_sets" -> (q59GroupingSets _),
    "q60_array_funcs" -> (q60ArrayFuncs _),
    "q61_date_arith" -> (q61DateArith _),
    "q62_unixtime" -> (q62Unixtime _),
    "q63_tfidf" -> (q63Tfidf _),
    "q64_hash_split" -> (q64HashSplit _),
    "q65_normalize" -> (q65Normalize _),
    "q66_zorder_stats" -> (q66ZorderStats _),
    "q67_data_quality" -> (q67DataQuality _),
    "q68_hash_sample" -> (q68HashSample _),
    "q69_auto_range_join" -> (q69AutoRangeJoin _),
    "q70_histogram" -> (q70Histogram _),
    "q71_corr" -> (q71Corr _),
    "q72_pii_redact" -> (q72PiiRedact _),
    "q73_skew_report" -> (q73SkewReport _),
    "q74_kfold" -> (q74KFold _),
    "q75_jaccard_exact" -> (q75JaccardExact _),
    "q76_media_ann" -> (q76MediaAnn _),
    "q77_transitive_dedup" -> (q77TransitiveDedup _),
    "q78_contamination" -> (q78Contamination _),
    "q79_pack_budget" -> (q79PackBudget _),
    "q80_collect_agg" -> (q80CollectAgg _),
    "q81_range_frame" -> (q81RangeFrame _),
    "q82_rank_family" -> (q82RankFamily _),
    "q83_bloom_increment" -> (q83BloomIncrement _),
    "q84_embedding_dedup" -> (q84EmbeddingDedup _),
    "q85_stratified_sample" -> (q85StratifiedSample _),
    "q86_source_jaccard_exact" -> (q86SourceJaccardExact _),
    "q87_cosine_pairs" -> (q87CosinePairs _),
    "q88_repetition" -> (q88Repetition _),
    "q89_unigram_nll" -> (q89UnigramNll _),
    "q90_mixture_weights" -> (q90MixtureWeights _),
    "q91_asof_forward" -> (q91AsofForward _),
    "q92_html_strip" -> (q92HtmlStrip _),
    "q93_expanding_cv" -> (q93ExpandingCv _),
    "q94_token_chunks" -> (q94TokenChunks _),
  )
}

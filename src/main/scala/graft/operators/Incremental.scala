package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.BinaryType

/** Incremental (batch-vs-corpus) deduplication — the ingest-time shape of
  * the dedup problem: a new crawl batch arrives and must be reduced to the
  * rows whose key (content fingerprint) is NOT already in the standing
  * corpus, without rescanning the corpus per batch.
  *
  * The tool is a reusable Bloom sketch over the corpus keys, built with
  * Spark's own codegen'd bloom expressions (the same `BloomFilterAggregate`
  * / `BloomFilterMightContain` pair the runtime row-level filter uses, fed
  * `xxhash64` of the key on both sides):
  *
  *  1. BUILD once per corpus version: one scan of the corpus keys folds into
  *     a sketch of a few MB (constant-size partial per task, merged on the
  *     driver like any aggregate). Persist it next to the table and reuse it
  *     for every incoming batch until the corpus changes.
  *  2. PREFILTER each batch scan-side: `might_contain` is a pure projection
  *     — rows that miss the bloom are DEFINITELY new and never shuffle.
  *     With fpp p, only ~(true dups + p·|batch|) rows survive to the join.
  *  3. VERIFY the survivors with an exact anti-join against the corpus
  *     keys, so the result is EXACT — bloom false positives only cost a
  *     little extra join traffic, never a wrongly-dropped row.
  *
  * At 100 TB the corpus side of step 3 is itself prunable (the candidate
  * keys are small → semi-join/DPP prune corpus files), and the sketch stays
  * broadcastable: 4M keys at the default sizing is ~4 MB; for billions of
  * keys, shard the corpus (per date/source) and build one bloom per shard.
  */
object Incremental {

  /** Fold the corpus keys into a serialized Bloom sketch (driver-side bytes,
    * aggregate-sized — the A5-scalar pattern, not a data collect). Returns
    * null when `corpus` is empty.
    */
  def buildBloom(corpus: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    require(expectedItems > 0, "expectedItems must be positive")
    val agg = ColumnShim.column(
      new BloomFilterAggregate(ColumnShim.expression(xxhash64(key)), expectedItems)
        .toAggregateExpression())
    corpus.select(agg.as("bf")).head.getAs[Array[Byte]](0)
  }

  /** Membership probe against a built sketch — a codegen'd scan-side
    * predicate (no shuffle, no UDF). False positives possible at the
    * sketch's fpp; false negatives never.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType), ColumnShim.expression(xxhash64(key))))

  /** The batch rows whose `keyCol` does not occur in `corpus` — exact
    * (bloom prefilter + anti-join verify of the bloom-positive survivors).
    * `expectedItems` sizes the sketch; oversizing costs bytes, undersizing
    * costs fpp (extra verify traffic), never correctness.
    *
    * A NULL key is treated as a value: the verify join is null-safe, so a
    * null-key batch row is "new" only while the corpus holds no null key
    * (a plain equi-anti-join would re-admit it forever).
    *
    * `batch` must be a DETERMINISTIC plan — the prefilter and verify
    * branches each evaluate it (the union is what lets definitely-new rows
    * skip the join entirely). Pin a non-deterministic input (sample/rand)
    * with `localCheckpoint` first.
    */
  def newRows(batch: DataFrame, corpus: DataFrame, keyCol: String,
              expectedItems: Long = 1L << 22): DataFrame = {
    val bloom = buildBloom(corpus.select(keyCol), col(keyCol), expectedItems)
    if (bloom == null) batch // empty corpus: every batch row is new
    else {
      val definitelyNew = batch.where(!mightContain(bloom, col(keyCol)))
      val corpusKeys = corpus.select(col(keyCol).as("__ck")).distinct()
      val survivors = batch.where(mightContain(bloom, col(keyCol)))
        .join(corpusKeys, col(keyCol) <=> col("__ck"), "left_anti")
      definitelyNew.unionByName(survivors)
    }
  }

  /** Banded MinHash band keys per doc: (id, band, bk) — the NEAR-dup
    * sibling of the exact-key bloom path above, and the persistable
    * corpus-side artifact of [[minhashNewDocs]]: at 100 TB compute this
    * ONCE per corpus version, store it partitioned by (band, bk-prefix),
    * and every ingest batch joins its own (tiny) band keys against it —
    * the corpus never re-shingles and NEVER self-pairs.
    *
    * `exact = false` (production): xxhash64 signatures via the native
    * [[Dedup.minhashSignature]] expression, band key = xxhash64 of the
    * band's slice. `exact = true`: the md5 formulation every engine can
    * replay (the q36b oracle trick) — band key = comma-joined md5 minima.
    * Docs with fewer than `shingleSize` tokens have no shingles and emit
    * no keys (they can never near-dup; [[minhashNewDocs]] passes them
    * through as new).
    */
  def bandedKeys(df: DataFrame, idCol: String, textCol: String,
                 shingleSize: Int = 3, numHashes: Int = 16, bands: Int = 4,
                 exact: Boolean = false): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / bands
    val sig =
      // exact path only: 16 md5 calls per shingle dominate, and the local
      // corpus is one unsplittable file (guide §2.5) — spread is a no-op
      // on real multi-split scans; the xxhash path is scan-speed and the
      // added exchange measurably costs more than it buys (q36/q37 A/B)
      if (exact) Pinning
        .spread(df.select(col(idCol), col(textCol)), col(idCol))
        .where(graft.functions.Text.tokenCount(col(textCol)) >= shingleSize)
        .select(col(idCol).as("id"),
          array_distinct(graft.functions.Text.shingles(col(textCol),
            shingleSize)).as("__sh"))
        .select(col("id"), array((0 until numHashes).map { i =>
          array_min(transform(col("__sh"),
            x => md5(concat_ws(":", lit(i.toString), x))))
        }: _*).as("sig"))
      else df
        .where(graft.functions.Text.tokenCount(col(textCol)) >= shingleSize)
        .select(col(idCol).as("id"),
          Dedup.minhashSignature(col(textCol), shingleSize, numHashes)
            .as("sig"))
    sig.select(col("id"), explode(array((0 until bands).map { b =>
        val slc = slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)
        struct(lit(b).as("band"),
          (if (exact) concat_ws(",", slc)
           else xxhash64(concat_ws(",", slc), lit(b)).cast("string")).as("bk"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bk").as("bk"))
  }

  /** Banded-MinHash ingest matches: for each batch doc, the corpus docs
    * sharing at least one band bucket — (id_batch, id_corpus) distinct
    * pairs, NO corpus self-pairing, plus `saturated_hits` semantics for
    * flood buckets: a corpus bucket holding more than `maxCorpusBucket`
    * members is not paired member-by-member (that fan-out is what melts
    * a duplicate flood); a batch doc landing in one is returned with
    * id_corpus = NULL, meaning "collides with ≥cap corpus docs — dup by
    * saturation". Callers that must know WHICH corpus doc matched should
    * treat NULL as "more than cap of them".
    *
    * Scale shape: one aggregate for corpus bucket counts (bucket-count-
    * sized), batch keys join saturation + member lists on (band, bk) —
    * per-bucket fan-out is ≤ maxCorpusBucket by construction, and the
    * corpus side is [[bandedKeys]] (persistable — pass a precomputed
    * frame with the same columns via `corpusKeys` to skip re-shingling).
    */
  def minhashIngestMatches(batch: DataFrame, corpus: DataFrame,
                           idCol: String, textCol: String,
                           shingleSize: Int = 3, numHashes: Int = 16,
                           bands: Int = 4, maxCorpusBucket: Int = 4096,
                           exact: Boolean = false,
                           corpusKeys: Option[DataFrame] = None): DataFrame = {
    val ck = corpusKeys.getOrElse(
      bandedKeys(corpus, idCol, textCol, shingleSize, numHashes, bands, exact))
    val qk = bandedKeys(batch, idCol, textCol, shingleSize, numHashes, bands,
        exact)
      .withColumnRenamed("id", "__qid")
    // pinned: counts + saturated split + member join all read the corpus
    // keys; without the pin the corpus re-shingles three times
    val pinned = ck.localCheckpoint(eager = false)
    val counts = pinned.groupBy("band", "bk").agg(count(lit(1)).as("__c"))
    val sat = counts.where(col("__c") > maxCorpusBucket)
      .select("band", "bk")
    val satHits = qk.join(sat, Seq("band", "bk"), "left_semi")
      .select(col("__qid").as("id_batch"),
        lit(null).cast(pinned.schema("id").dataType).as("id_corpus"))
      .distinct()
    val normal = pinned.join(sat, Seq("band", "bk"), "left_anti")
    val pairHits = qk.join(normal, Seq("band", "bk"))
      .select(col("__qid").as("id_batch"), col("id").as("id_corpus"))
      .distinct()
    pairHits.unionByName(satHits)
  }

  /** The NEAR-dup ingest screen: batch rows with NO banded-MinHash
    * collision against the corpus — [[newRows]]' exact-fingerprint
    * semantics relaxed to near-duplicate (same shingle/LSH family as
    * [[Dedup.minhashCandidatePairs]], but batch×corpus only: the corpus
    * never self-pairs, so a 100 TB corpus costs one persisted
    * [[bandedKeys]] pass amortized over every batch).
    *
    * `verifyJaccard`: when set, a band collision alone doesn't drop a
    * batch doc — the exact n-gram Jaccard against its collided corpus
    * docs must reach the threshold (banding's false positives survive the
    * screen). Saturated-bucket hits (see [[minhashIngestMatches]]) are
    * dropped WITHOUT verification either way: a doc colliding with ≥cap
    * corpus docs is boilerplate-class, and verifying a flood is the
    * quadratic blow-up the cap exists to prevent.
    *
    * Docs too short to shingle (< `shingleSize` tokens) pass through as
    * new — run [[newRows]] on a content fingerprint first if exact short
    * dups matter.
    */
  def minhashNewDocs(batch: DataFrame, corpus: DataFrame,
                     idCol: String, textCol: String,
                     shingleSize: Int = 3, numHashes: Int = 16,
                     bands: Int = 4, maxCorpusBucket: Int = 4096,
                     exact: Boolean = false,
                     verifyJaccard: Option[Double] = None,
                     corpusKeys: Option[DataFrame] = None): DataFrame = {
    val matches = minhashIngestMatches(batch, corpus, idCol, textCol,
      shingleSize, numHashes, bands, maxCorpusBucket, exact, corpusKeys)
    val dupIds = verifyJaccard match {
      case None =>
        matches.select(col("id_batch").as("__did")).distinct()
      case Some(t) =>
        require(t > 0 && t <= 1, s"verifyJaccard must be in (0,1]: $t")
        val satIds = matches.where(col("id_corpus").isNull)
          .select(col("id_batch").as("__did"))
        val cand = matches.where(col("id_corpus").isNotNull)
        def sh(df: DataFrame, ids: DataFrame, out: String) = df
          // candidate-id set scales with the collision list — no
          // broadcast hint, AQE decides (the round-13 hint rule)
          .join(ids, col(idCol) === col("__cid"), "left_semi")
          .select(col(idCol).as(out),
            array_distinct(graft.functions.Text.shingles(col(textCol),
              shingleSize)).as(s"${out}_sh"))
        val shB = sh(batch,
          cand.select(col("id_batch").as("__cid")).distinct(), "id_batch")
        val shC = sh(corpus,
          cand.select(col("id_corpus").as("__cid")).distinct(), "id_corpus")
        val verified = cand.join(shB, Seq("id_batch")).join(shC, Seq("id_corpus"))
          .withColumn("__i",
            size(array_intersect(col("id_batch_sh"), col("id_corpus_sh")))
              .cast("double"))
          .withColumn("__u",
            size(array_union(col("id_batch_sh"), col("id_corpus_sh")))
              .cast("double"))
          .where(col("__u") > 0 && col("__i") / col("__u") >= t)
          .select(col("id_batch").as("__did"))
        satIds.unionByName(verified).distinct()
    }
    batch.join(dupIds, col(idCol) === col("__did"), "left_anti")
  }

  /** [[minhashNewDocs]] against a STORED key artifact only — the steady-
    * state ingest entry point when the corpus texts are not at hand (or
    * deliberately not re-read): `keys` is a [[bandedKeys]] frame read back
    * from wherever it was persisted. Jaccard verification needs corpus
    * TEXTS, so it is not available on this path — screen by banding alone
    * (use the full [[minhashNewDocs]] if verified drops are required).
    */
  def minhashNewDocsAgainstKeys(batch: DataFrame, keys: DataFrame,
                                idCol: String, textCol: String,
                                shingleSize: Int = 3, numHashes: Int = 16,
                                bands: Int = 4,
                                maxCorpusBucket: Int = 4096,
                                exact: Boolean = false): DataFrame =
    minhashNewDocs(batch, batch.sparkSession.emptyDataFrame, idCol, textCol,
      shingleSize, numHashes, bands, maxCorpusBucket, exact,
      verifyJaccard = None, corpusKeys = Some(keys))

  /** Incremental join maintenance (the delta-join identity): the NEW rows
    * of `(A ∪ ΔA) ⋈ (B ∪ ΔB)` beyond the already-materialized `A ⋈ B` are
    * exactly
    *
    *   ΔA ⋈ B  ∪all  A ⋈ ΔB  ∪all  ΔA ⋈ ΔB
    *
    * — the algebra every materialized join view maintains by. Appending
    * this delta to the stored view IS the refreshed view, so a 100 TB
    * join view updates at the cost of the (small) deltas: each term
    * shuffles ΔA/ΔB fully but the big snapshots only on the join key
    * (and AQE broadcasts the delta side when it fits, leaving the
    * snapshots entirely unshuffled). Insert-only deltas; deletes are the
    * lake layer's tombstone problem, not the view algebra's.
    *
    * `keys` are USING-style join keys (coalesced once in the output).
    */
  def deltaJoin(snapA: DataFrame, deltaA: DataFrame,
                snapB: DataFrame, deltaB: DataFrame,
                keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    deltaA.join(snapB, keys)
      .unionByName(snapA.join(deltaB, keys))
      .unionByName(deltaA.join(deltaB, keys))
  }
}

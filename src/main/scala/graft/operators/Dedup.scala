package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}

/** Corpus deduplication at training-data scale.
  *
  * All strategies follow the same scale discipline: compute signatures
  * scan-side (pure expressions, no UDF), shuffle ONLY on compact keys
  * (hashes / band signatures — never full text), and keep pairwise work
  * confined to within-bucket candidates. `keep` semantics everywhere:
  * min(doc_id) of a duplicate group survives.
  */
object Dedup {

  /** Exact dedup on one or more columns — a single hash-aggregate shuffle
    * keyed on the dedup column(s). Returns the surviving rows' ids.
    */
  def exactKeepIds(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .select(idCol, "n_dups")

  /** Corpus duplication spectrum — the one-table corpus-health readout the
    * curation papers lead with (how much of the corpus is unique, doubled,
    * lightly cloned, flood-duplicated): exact-duplicate clusters over
    * `keyCols`, bucketed by cluster size into 1 / 2 / 3-5 / 6-10 / 11+.
    * Per bucket: cluster count, doc count, share of the corpus, and
    * `n_excess` — the docs an exact-dedup pass would delete. Feed it
    * normalized text (or a fingerprint) to measure near-exact pressure.
    *
    * Two bounded-key aggregates: (key → size) shuffles the digest, then
    * (bucket) reduces the cluster table; nothing row-scale ever joins.
    *
    * Nulls are first-class key values: each column is coalesced to a
    * `\u0000NULL` sentinel BEFORE hashing (md5(null) = null, and one null
    * link would otherwise collapse every null-keyed row into a single
    * phantom flood-duplicate cluster — groupBy-per-column semantics,
    * matching [[exactKeepIds]]).
    */
  def duplicationSpectrum(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val sizes = df.groupBy(keyCols
        .map(c => md5(coalesce(col(c).cast("string"), lit("\u0000NULL"))))
        .reduce((a, b) => md5(concat(a, b))).as("__k"))
      .agg(count(lit(1)).as("__n"))
    val bucket = when(col("__n") === 1, "1").when(col("__n") === 2, "2")
      .when(col("__n") <= 5, "3-5").when(col("__n") <= 10, "6-10")
      .otherwise("11+")
    val per = sizes.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n_clusters"), sum("__n").as("n_docs"))
    per.crossJoin(broadcast(per.agg(sum("n_docs").as("__tot"))))
      .select(col("bucket"), col("n_clusters"), col("n_docs"),
        (col("n_docs") / col("__tot")).as("docs_share"),
        (col("n_docs") - col("n_clusters")).as("n_excess"))
  }

  /** Exact dedup returning the surviving rows (dropDuplicates semantics but
    * with deterministic min-id victim selection, unlike `dropDuplicates`
    * which keeps an arbitrary row per key).
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.join(exactKeepIds(df, idCol, keyCols).select(idCol), Seq(idCol), "left_semi")

  /** Whitespace/case-insensitive near-exact dedup via 64-bit fingerprint
    * ([[Text.fingerprint]]) — shuffles 8-byte keys instead of full text.
    */
  def fingerprintKeepIds(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), Text.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp").agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .select(idCol, "n_dups")

  // ---- MinHash + LSH -------------------------------------------------------

  /** One MinHash value per (doc, hash function): min over shingles of
    * xxhash64(shingle, seed). Native Catalyst expression
    * ([[graft.functions.expressions.MinHashSig]]) — the HOF formulation
    * measured ~1000× slower (interpreted lambdas per shingle×seed).
    */
  def minhashSignature(text: Column, shingleSize: Int, numHashes: Int): Column =
    graft.functions.expressions.TextHashExpressions
      .minhashSig(text, shingleSize, numHashes)

  /** Sorted unordered pairs from each bucket's element array: for element i,
    * pair it with every later element. Arrays are per-bucket candidate sets,
    * which LSH keeps small, so the HOF quadratic step is bounded.
    */
  private def pairCombos(xs: Column): Column =
    flatten(transform(xs, (x, i) =>
      transform(slice(xs, i + 2, size(xs)), y => struct(x.as("a"), y.as("b")))))

  /** All unordered pairs within each bucket, with the semDedup skew cap:
    * a bucket larger than `maxBucket` splits into ⌈n/cap⌉ hash
    * sub-buckets (pair work N·cap instead of N² — and the collect_list
    * per bucket stays cap-bounded instead of flood-sized), with
    * consecutive sub-bucket min-id representatives chained in as extra
    * candidates so downstream verify→closure still unifies a genuine
    * near-duplicate flood — the #1 real corpus shape LSH dedup meets.
    * Only split buckets join the count table back (≤ N/cap rows);
    * buckets ≤ cap are byte-identical to the uncapped formulation, which
    * keeps the q36b/q37b oracle hashes intact at gate scale.
    *
    * `keyed` must carry `bucketCols` plus `x`, a struct whose FIRST field
    * is the id; returns (a, b) struct pairs with a.id < b.id.
    */
  private def cappedBucketPairs(keyed0: DataFrame, bucketCols: Seq[String],
                                maxBucket: Int): DataFrame = {
    require(maxBucket > 1, s"maxBucket must exceed 1: $maxBucket")
    // Pin the bucketed frame once: the hot-bucket count pass and the
    // pairing pass both read it, and without the pin the upstream
    // signature work (16 md5 calls per shingle on the md5 path; xxhash
    // banding on the production path) executes TWICE — measured 2x on
    // q36/q36b/q38 when this helper first landed unpinned. Same budget
    // discipline as blockedPairs' (id, key) pin: bucket keys + id (+ the
    // simhash long / embedding vector), never raw text.
    val keyed = keyed0.localCheckpoint(eager = false)
    val bcols = bucketCols.map(col)
    val hot = keyed.groupBy(bcols: _*)
      .agg(ceil(count(lit(1)) / maxBucket.toDouble).cast("int").as("__m"))
      .where(col("__m") > 1)
    val sub = keyed.join(hot, bucketCols, "left")
      .withColumn("__m", coalesce(col("__m"), lit(1)))
      .withColumn("__sub",
        pmod(xxhash64(col("x.id")), col("__m").cast("long")).cast("int"))
    val subCols = bcols :+ col("__sub")
    val within = sub.groupBy(subCols: _*)
      .agg(sort_array(collect_list(col("x"))).as("xs"))
      .where(size(col("xs")) > 1)
      .select(explode(pairCombos(col("xs"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val reps = sub.where(col("__m") > 1)
      .groupBy(subCols: _*)
      .agg(min_by(col("x"), col("x.id")).as("r"))
    val lt = col("l.r.id") <= col("r2.r.id")
    val chain = reps.alias("l").join(reps.alias("r2"),
        bucketCols.map(c => col(s"l.$c") === col(s"r2.$c")).reduce(_ && _)
          && col("l.__sub") + 1 === col("r2.__sub"))
      .select(when(lt, col("l.r")).otherwise(col("r2.r")).as("a"),
        when(lt, col("r2.r")).otherwise(col("l.r")).as("b"))
    within.unionAll(chain)
  }

  /** MinHash-LSH candidate pairs: band the signature (bands × rowsPerBand =
    * numHashes), hash each band, bucket docs by (band, band-hash), emit
    * within-bucket pairs via collect_list + combinations — bucket sizes
    * bounded by [[cappedBucketPairs]]. Signatures are
    * computed ONCE and the only shuffle carries (band, hash, id) — a
    * self-join formulation would recompute every signature on both sides
    * and shuffle twice (measured 12 s → <2 s at sf0.1). Pairs are
    * distinct-ed because near-dups co-occur in many bands.
    */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            shingleSize: Int = 3, numHashes: Int = 16,
                            bands: Int = 4,
                            maxBucket: Int = 4096): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / bands
    // Docs with < shingleSize tokens have NO shingles → identical degenerate
    // signatures; without this filter every short doc would pair with every
    // other short doc and dedup would silently delete unrelated rows.
    val sig = df
      .where(Text.tokenCount(col(textCol)) >= shingleSize)
      .select(col(idCol).as("id"),
        minhashSignature(col(textCol), shingleSize, numHashes).as("sig"))
    val banded = sig.select(col("id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(concat_ws(",",
              slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)), lit(b)).as("bh"))
        }: _*)).as("bb"))
      .select(col("bb.band").as("band"), col("bb.bh").as("bh"),
        struct(col("id")).as("x"))
    cappedBucketPairs(banded, Seq("band", "bh"), maxBucket)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Full MinHash dedup: candidate pairs → connected-ish grouping (each doc
    * assimilated to the min id it pairs with) → survivors. One-hop union
    * (sufficient for near-dup clusters found by LSH; iterate for full
    * transitive closure if needed).
    */
  def minhashKeepIds(df: DataFrame, idCol: String, textCol: String,
                     shingleSize: Int = 3, numHashes: Int = 16,
                     bands: Int = 4): DataFrame = {
    val pairs = minhashCandidatePairs(df, idCol, textCol, shingleSize, numHashes, bands)
    val victims = pairs.select(col("id_b").as("victim")).distinct()
    df.select(col(idCol))
      .join(victims, col(idCol) === col("victim"), "left_anti")
  }

  /** Oracle-anchored MinHash variant (what [[simhashCandidatePairsMd5]] is
    * to SimHash): the same band-bucketed candidate generation over an
    * MD5-derived signature DuckDB recomputes bit-for-bit — coordinate i is
    * the lexicographic MIN of `md5(i || ':' || shingle)` hex strings over
    * the doc's shingle set (fixed-length lowercase hex, so string min ==
    * numeric min of the 128-bit value, identically in both engines), and
    * buckets key on the band's joined hex strings, not an xxhash of them.
    * A pair is emitted iff ≥ 1 band agrees EXACTLY — the same predicate an
    * all-pairs SQL can state — so hash-equality against the oracle proves
    * tokenize→shingle→min-hash→band→bucket→pair end to end (gate q36b).
    * Production stays [[minhashCandidatePairs]] (xxhash signatures, 8-byte
    * band keys) — this path shuffles 32-char hex strings instead, the
    * price of cross-engine reproducibility.
    */
  def minhashCandidatePairsMd5(df: DataFrame, idCol: String, textCol: String,
                               shingleSize: Int = 3, numHashes: Int = 16,
                               bands: Int = 4,
                               maxBucket: Int = 4096): DataFrame = {
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val rowsPerBand = numHashes / bands
    // spread before the signature: 16 md5 calls per shingle make this the
    // heaviest per-row stage in the repo, and the local corpus is one
    // unsplittable file (guide §2.5) — measured 1.7 s → 1.4 s at sf0.1;
    // no-op on real multi-split scans
    val sig = Pinning.spread(df.select(col(idCol), col(textCol)), col(idCol))
      .where(Text.tokenCount(col(textCol)) >= shingleSize)
      .select(col(idCol).as("id"),
        array_distinct(Text.shingles(col(textCol), shingleSize)).as("__sh"))
      .select(col("id"), array((0 until numHashes).map { i =>
        array_min(transform(col("__sh"),
          x => md5(concat_ws(":", lit(i.toString), x))))
      }: _*).as("sig"))
    val banded = sig.select(
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            concat_ws(",",
              slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bk"))
        }: _*)).as("bb"), col("id"))
      .select(col("bb.band").as("band"), col("bb.bk").as("bk"),
        struct(col("id")).as("x"))
    cappedBucketPairs(banded, Seq("band", "bk"), maxBucket)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  // ---- SimHash -------------------------------------------------------------

  /** 64-bit SimHash over word shingles: per bit, sum ±1 weighted by shingle
    * hash bit, take sign. Native Catalyst expression
    * ([[graft.functions.expressions.SimHash]]).
    */
  def simhash(text: Column, shingleSize: Int = 2, bits: Int = 64): Column =
    graft.functions.expressions.TextHashExpressions.simhash(text, shingleSize, bits)

  /** SimHash near-dup candidates: docs whose 64-bit simhash agrees on any of
    * the 4 16-bit blocks (standard block-permutation trick ≈ Hamming
    * distance ≤ 3 candidates) — shuffle key is (block_id, block_value);
    * pair generation is per-bucket, same shape as
    * [[minhashCandidatePairs]].
    */
  def simhashCandidatePairs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashPairsWithSig(df, idCol, textCol, simhash(col(textCol)))

  /** Oracle-anchored SimHash variant: the same block-permutation bucketing
    * over [[graft.functions.expressions.SimHashMd5]] — a signature DuckDB
    * recomputes bit-for-bit from `md5()` hex — so post-filtering to
    * Hamming ≤ 3 must equal exact all-pairs SQL truth (gate q37b; the
    * 4-block pigeonhole guarantees 100% recall at distance ≤ 3, the filter
    * enforces precision). Production path stays xxhash ([[simhashCandidatePairs]]).
    */
  def simhashCandidatePairsMd5(df: DataFrame, idCol: String,
                               textCol: String): DataFrame =
    simhashPairsWithSig(df, idCol, textCol,
      graft.functions.expressions.TextHashExpressions.simhashMd5(col(textCol), 2))

  private def simhashPairsWithSig(df: DataFrame, idCol: String,
                                  textCol: String, sig: Column,
                                  maxBucket: Int = 4096): DataFrame = {
    // Same degenerate-signature guard as minhashCandidatePairs (2-shingles).
    val sigs = df
      .where(Text.tokenCount(col(textCol)) >= 2)
      .select(col(idCol).as("id"), sig.as("sh"))
    val blocked = sigs.select(col("id"), col("sh"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("blk"),
            shiftright(col("sh"), b * 16).bitwiseAND(0xFFFF).as("bv"))
        }: _*)).as("x"))
      .select(col("id"), col("sh"), col("x.blk").as("blk"), col("x.bv").as("bv"))
    cappedBucketPairs(
        blocked.select(col("blk"), col("bv"),
          struct(col("id"), col("sh")).as("x")),
        Seq("blk", "bv"), maxBucket)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
  }

  // ---- n-gram Jaccard ------------------------------------------------------

  /** Exact Jaccard over word n-gram sets for candidate pairs (use after an
    * LSH pass at scale; standalone it's quadratic). `pairs` carries
    * (id_a, id_b); texts are joined back in — the only full-text shuffle,
    * bounded by the candidate count.
    */
  def jaccardVerify(df: DataFrame, pairs: DataFrame, idCol: String,
                    textCol: String, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    // Shingle only the docs that appear in a candidate pair — at corpus
    // scale the candidate set is orders of magnitude smaller than the corpus.
    val candIds = pairs.select(col("id_a").as("cid"))
      .union(pairs.select(col("id_b").as("cid"))).distinct()
    // no broadcast hint: the candidate-id set scales with the LSH output
    // (billions of pairs at 100 TB); AQE broadcasts it when small
    val sh = df.join(candIds, col(idCol) === col("cid"), "left_semi")
      .select(col(idCol),
        array_distinct(Text.shingles(col(textCol), n)).as("sh"))
    pairs
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("sh", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("sh", "sh_b"), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jaccard", when(col("uni") === 0, 0.0).otherwise(col("inter") / col("uni")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- Transitive closure over candidate pairs -----------------------------

  /** Connected components over an undirected pair list via min-label
    * propagation WITH pointer jumping (label-of-label compression): each
    * round a node takes `c = min(own label, neighbors' labels)` and then
    * jumps through `c`'s previous label — so the frontier DOUBLES per round
    * and convergence is O(log diameter), not O(diameter) (a 200-node chain
    * converges in ~9 rounds; plain propagation needs 200).
    *
    * Each round is ONE materialization job: the changed-flag is computed
    * inside the same plan as the new labels (the old label is already on the
    * row), a checkpoint pins the result, and the convergence probe is a
    * max() over the pinned blocks — no separate join-and-count job
    * re-executing the round (the previous formulation ran a second full
    * join per round just to count changes).
    *
    * `checkpointDir`: None (default) pins rounds with `localCheckpoint` —
    * fastest, but executor-local blocks, so an executor loss forfeits the
    * run (fine for local mode and short jobs). On a cluster, pass a
    * reliable directory (HDFS/object store): rounds pin with
    * `checkpoint()`, lineage truncates identically, and the job survives
    * executor loss at the cost of writing each round's labels out.
    *
    * Iteration bound: after `t` rounds every label has reached the minimum
    * over its ~2^t-hop neighborhood, so `maxIter = 20` covers component
    * diameters up to ~10^6. If the bound is hit before the fixed point the
    * current (partially-converged) labels are returned — raise `maxIter`
    * for adversarially deep graphs.
    *
    * `driverEdgeCap`: edge sets at or under this size (counted on the
    * pinned blocks, so no recomputation) run a driver union-find instead
    * of the loop — identical labels, none of the per-round fixed cost.
    * The collect is bounded by the cap (≈32 MB of boxed longs at the
    * 1M default); bigger graphs stay fully distributed.
    *
    * Returns (id, cluster) where cluster = min id of the component.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          checkpointDir: Option[String] = None,
                          driverEdgeCap: Long = 1000000L): DataFrame = {
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    // Pin the DIRECTED pair set once; the doubled edge view below mirrors
    // the pinned blocks with a narrow projection. Referencing the raw
    // `pairs` lineage on both sides of the union (the previous shape)
    // materialized the whole candidate DAG — LSH banding, similarity
    // verification — TWICE before the first round.
    val p0 = pin(pairs.select(col("id_a"), col("id_b")))
    // Small-graph fast path: when the edge set fits the driver cap, a
    // union-find replaces ~log(diameter) checkpointed rounds whose
    // per-round fixed cost (two joins + a materialization + a probe job)
    // dwarfs the actual work at that size — the dominant case after
    // LSH/verify pruning. The collect is BOUNDED by driverEdgeCap (the
    // count reads already-pinned blocks); above the cap the distributed
    // loop below runs unchanged, so corpus-scale edge sets never reach
    // the driver. Semantics identical: cluster = min id of the component.
    // Guarded to id types whose EXTERNAL values are java Comparable — the
    // min-of-component comparison casts to Comparable, which array/struct/
    // binary ids don't satisfy; those (and any other orderable-but-not-
    // Comparable Spark type) take the distributed loop, whose least()/min()
    // handle every orderable type.
    val idType = pairs.schema("id_a").dataType
    val atomicIds = {
      import org.apache.spark.sql.types._
      idType match {
        case _: NumericType | StringType | BooleanType | DateType |
             TimestampType | TimestampNTZType => true
        case _ => false
      }
    }
    if (atomicIds && p0.count() * 2 <= driverEdgeCap) {
      val rows = p0.collect()
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.getOrDefault(c, c) != c) {
          val next = parent.get(c); parent.put(c, r); c = next
        }
        r
      }
      rows.foreach { r =>
        // a null-sided edge never joins in the distributed loop (equi-join
        // on null matches nothing), so it must not union here either —
        // each endpoint stays a singleton, null included
        if (r.get(0) != null && r.get(1) != null) {
          val (ra, rb) = (find(r.get(0)), find(r.get(1)))
          if (ra != rb) parent.put(ra, rb)
        }
      }
      def lt(a: Any, b: Any): Boolean =
        a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
      val minOf = new java.util.HashMap[Any, Any]()
      val ids = rows.iterator.flatMap(r => Iterator(r.get(0), r.get(1)))
        .toArray.distinct
      ids.foreach { id =>
        val r = find(id)
        val m = minOf.get(r)
        if (m == null || lt(id, m)) minOf.put(r, id)
      }
      Pinning.unpin(p0)
      val outT = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("cluster", idType)))
      val spark = pairs.sparkSession
      return spark.createDataFrame(
        spark.sparkContext.parallelize(
          ids.toSeq.map(id =>
            org.apache.spark.sql.Row(id, minOf.get(find(id)))),
          math.max(1, math.min(32, ids.length / 4096 + 1))),
        outT)
    }
    val edges = p0.union(
      p0.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    var labels = pin(edges.select(col("id_a").as("id")).distinct()
      .withColumn("cluster", col("id")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "nid"), col("id_b") === col("nid"))
        .groupBy("id_a").agg(min("cluster").as("ncluster"))
      // candidate = min over closed neighborhood; jump = candidate's own
      // previous label (labels is checkpointed, so referencing it twice in
      // this plan re-reads pinned blocks, not recomputed lineage)
      val next = pin(labels
        .join(neighborMin.withColumnRenamed("id_a", "nid"),
          col("id") === col("nid"), "left")
        .select(col("id"), col("cluster").as("__old"),
          least(col("cluster"), coalesce(col("ncluster"), col("cluster"))).as("__cand"))
        .join(labels.select(col("id").as("__cid"), col("cluster").as("__cc")),
          col("__cand") === col("__cid"), "left")
        .select(col("id"), col("__old"),
          least(col("__cand"), coalesce(col("__cc"), col("__cand"))).as("cluster"))
        .withColumn("__changed", (col("cluster") =!= col("__old")).cast("int"))
        .select("id", "cluster", "__changed"))
      // coalesce: max over an empty label set (no pairs at all) is null
      converged = next.agg(coalesce(max(col("__changed")), lit(0)).as("c"))
        .head.getAs[Int]("c") == 0
      // the old round's pinned blocks are dead once `next` is materialized
      // — release them so a 20-round run holds O(1) rounds resident, not 20
      // (the r10 bench's late-run q77 blowup was exactly this pressure)
      Pinning.unpin(labels)
      labels = next.select("id", "cluster")
      i += 1
    }
    Pinning.unpin(edges)
    labels
  }

  /** Fully-transitive MinHash dedup: candidate pairs → connected
    * components → keep each cluster's min id (plus all unpaired docs).
    */
  def minhashKeepIdsTransitive(df: DataFrame, idCol: String, textCol: String,
                               shingleSize: Int = 3, numHashes: Int = 16,
                               bands: Int = 4): DataFrame = {
    val pairs = minhashCandidatePairs(df, idCol, textCol, shingleSize, numHashes, bands)
    val victims = connectedComponents(pairs)
      .where(col("id") =!= col("cluster"))
      .select(col("id").as("victim"))
    df.select(col(idCol))
      .join(victims, col(idCol) === col("victim"), "left_anti")
  }

  /** Verified transitive dedup: LSH candidates → exact-Jaccard
    * verification at `threshold` → connected components over the VERIFIED
    * pairs → survivors (each component's min id, plus unpaired docs).
    * Unlike [[minhashKeepIdsTransitive]] this never deletes on an LSH false
    * positive: every edge in the closure has exact Jaccard ≥ threshold, so
    * the result equals exact connected components whenever LSH recall is
    * 100% — the oracle-checked configuration (gate q77's DuckDB oracle is a
    * recursive-CTE closure over exact-Jaccard pairs).
    */
  def minhashKeepIdsTransitiveVerified(df: DataFrame, idCol: String,
                                       textCol: String, shingleSize: Int = 3,
                                       numHashes: Int = 16, bands: Int = 4,
                                       n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val cands = minhashCandidatePairs(df, idCol, textCol, shingleSize, numHashes, bands)
    val verified = jaccardVerify(df, cands, idCol, textCol, n, threshold)
      .select("id_a", "id_b")
    val victims = connectedComponents(verified)
      .where(col("id") =!= col("cluster"))
      .select(col("id").as("victim"))
    df.select(col(idCol))
      .join(victims, col(idCol) === col("victim"), "left_anti")
  }

  /** Survivor SELECTION, not just elimination: like
    * [[minhashKeepIdsTransitiveVerified]], but within each duplicate
    * cluster the doc with the highest `scoreCol` survives (ties → lowest
    * id) instead of the arbitrary min-id — keep the longest / highest
    * -quality variant of every near-dup family, which is what a curation
    * pipeline actually wants. Returns the surviving ROWS with `n_dups`
    * (cluster size; 1 for docs with no duplicate) attached.
    *
    * A singleton's "cluster" is its own id, which cannot collide with a
    * real cluster label: labels are cluster-min ids, and the min doc of a
    * cluster is itself clustered, never a singleton.
    *
    * Shape for scale: CC runs on the verified PAIRS (candidate-sized);
    * the corpus is touched by one left join against the label set and one
    * cluster-keyed window (the rank and the size share the exchange).
    */
  def keepBestTransitiveVerified(df: DataFrame, idCol: String,
                                 textCol: String, scoreCol: String,
                                 shingleSize: Int = 3, numHashes: Int = 16,
                                 bands: Int = 4, n: Int = 3,
                                 threshold: Double = 0.8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cands = minhashCandidatePairs(df, idCol, textCol, shingleSize, numHashes, bands)
    val verified = jaccardVerify(df, cands, idCol, textCol, n, threshold)
      .select("id_a", "id_b")
    // '__'-prefixed label columns: joining the raw (id, cluster) output
    // onto the input would be ambiguous when idCol == "id" (or silently
    // drop a user 'cluster' column) — same hygiene as containmentPairsExact
    val labels = connectedComponents(verified)
      .select(col("id").as("__lid"), col("cluster").as("__lcl"))
    val labeled = df.join(labels, col(idCol) === col("__lid"), "left")
      .withColumn("__cl", coalesce(col("__lcl"), col(idCol)))
    val w = Window.partitionBy("__cl")
    val ranked = labeled
      .withColumn("__rn", row_number().over(
        w.orderBy(col(scoreCol).desc, col(idCol))))
      .withColumn("n_dups", count(lit(1)).over(w))
    ranked.where(col("__rn") === 1)
      .drop("__lid", "__lcl", "__cl", "__rn")
  }

  /** Exact CONTAINMENT pairs: directed `(id_a, id_b, |A∩B| / |A|)` over
    * distinct n-gram shingle sets, thresholded. Asymmetric by design — a
    * short doc quoted wholesale inside a long one has containment ≈ 1 but
    * Jaccard ≈ |A|/|B| ≈ 0, so MinHash/Jaccard dedup never sees it; this
    * is the quote/subset detector (RETRO-style passage dedup).
    *
    * EXACT anchor, not the scale path: the shared-shingle self-join is
    * quadratic in per-shingle frequency (boilerplate shingles explode it).
    * Run it on bounded slices (the q116 gate) or behind a hot-shingle cap;
    * at corpus scale use [[chunkCandidatePairs]] — rolling-hash chunks
    * catch shared passages with bucket-confined pairing — and treat this
    * as its verifier on candidate pairs.
    */
  def containmentPairsExact(df: DataFrame, idCol: String, textCol: String,
                            n: Int = 3, threshold: Double = 0.5,
                            maxRows: Int = 100000): DataFrame = {
    require(threshold > 0 && threshold <= 1)
    guardAllPairs(df, maxRows, "containmentPairsExact", "chunkCandidatePairs")
    val sh = df.select(col(idCol).as("__id"),
        array_distinct(Text.shingles(col(textCol), n)).as("__sh"))
      .where(size(col("__sh")) >= 1)
      .localCheckpoint() // feeds both the explode and the size table
    val ex = sh.select(col("__id"), explode(col("__sh")).as("__s"))
    val sizes = sh.select(col("__id").as("id_a"), size(col("__sh")).as("__na"))
    val shared = ex.as("a")
      .join(ex.as("b"),
        col("a.__s") === col("b.__s") && col("a.__id") =!= col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count(lit(1)).as("__i"))
    shared.join(sizes, Seq("id_a"))
      .where(col("__i").cast("double") / col("__na") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("__i").cast("double") / col("__na"), 4).as("containment"))
  }

  // ---- Rolling-hash chunk dedup --------------------------------------------

  /** Partial-overlap candidates via content-defined chunking
    * ([[graft.functions.expressions.RollingChunkHashes]]): docs sharing any
    * chunk fingerprint pair up. Catches long shared passages that MinHash
    * misses when the rest of the document differs. Shuffle key is the
    * 8-byte chunk hash.
    *
    * `maxDocsPerChunk` (stop-chunk cap): a chunk shared by more than this
    * many docs is boilerplate (headers, license text, navigation chrome) —
    * pairing inside it is quadratic and the pairs carry no dedup signal.
    * ScaleCheck measured exponent 2.11 (10× data → 114× pairs, 288 s)
    * without the cap; with it the operator is linear. The cap is enforced
    * with a count-aggregate + semi-join BEFORE any `collect_list`, so a
    * pathologically hot chunk never materializes its full doc array in one
    * task (count partials combine map-side; the collect only ever sees
    * buckets ≤ the cap). The chunk stream is recomputed once for the count
    * pass — scan-side work, cheaper at scale than pinning it.
    */
  def chunkCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                          window: Int = 16, maskBits: Int = 6,
                          maxDocsPerChunk: Int = 64): DataFrame =
    chunkPairsFrom(df, idCol,
      graft.functions.expressions.TextHashExpressions
        .rollingChunkHashes(col(textCol), window, maskBits), maxDocsPerChunk)

  /** Oracle-anchored content-defined chunking: TOKEN-windowed MD5 cut
    * decisions DuckDB recomputes digit-for-digit. Position j (1-based) is
    * a cut iff the first hex nibble of `md5` of the space-joined window of
    * the last `window` tokens ending at j has its low `maskBits` bits zero
    * (or j is the last token); chunks span between cuts and fingerprint as
    * `md5` of their joined tokens. The same boundary rule as production
    * CDC — a shared passage re-synchronizes to identical cuts regardless
    * of its offset in the doc — stated entirely in md5/list arithmetic an
    * all-pairs SQL can replay, so the gate (q50b) hash-checks
    * chunking→fingerprint→bucket→pair-count end to end. Production stays
    * [[chunkCandidatePairs]] (byte-rolling polynomial hash, scan-speed);
    * `maskBits` ≤ 4 here because the decision reads one nibble.
    */
  def chunkCandidatePairsMd5(df: DataFrame, idCol: String, textCol: String,
                             window: Int = 4, maskBits: Int = 2,
                             maxDocsPerChunk: Int = 64): DataFrame = {
    require(maskBits >= 1 && maskBits <= 4,
      s"maskBits $maskBits must be in [1,4]: the cut reads one hex nibble")
    // Materialize the token array and the cut positions as PROJECTED columns
    // before any lambda references them: interpreted HOF lambdas do no
    // common-subexpression elimination, so an unbound `split`/`filter`
    // expression inside `transform` re-evaluates per element — O(tokens²)
    // character work and one md5 per (chunk, position) pair. Bound attribute
    // references make each stage one pass: split once, one small-window md5
    // per position, one md5 per chunk (measured 670 s → seconds at sf0.1).
    val toks = col("__toks")
    def winStart(j: Column) = greatest(j - (window - 1), lit(1))
    def winHash(j: Column) =
      md5(concat_ws(" ", slice(toks, winStart(j), j - winStart(j) + 1)))
    val nib = (j: Column) =>
      conv(substring(winHash(j), 1, 1), 16, 10).cast("int")
    val mask = (1 << maskBits) - 1
    val cuts = col("__cuts")
    val chunkHashes = transform(sequence(lit(1), size(cuts)), k => {
      val start = when(k === 1, lit(1))
        .otherwise(element_at(cuts, (k - 1).cast("int")) + 1)
      val end = element_at(cuts, k.cast("int"))
      md5(concat_ws(" ", slice(toks, start, end - start + 1)))
    })
    // spread: one md5 per token position + one per chunk is the md5
    // path's dominant cost and the local corpus is one unsplittable file
    // (guide §2.5); no-op on real multi-split scans
    val staged = Pinning.spread(df.select(col(idCol), col(textCol)), col(idCol))
      .where(length(trim(col(textCol))) > 0)
      .withColumn("__toks", split(lower(trim(col(textCol))), "\\s+"))
      .withColumn("__cuts", filter(sequence(lit(1), size(toks)),
        j => (nib(j).bitwiseAND(lit(mask)) === 0) || (j === size(toks))))
    chunkPairsFrom(staged, idCol, chunkHashes, maxDocsPerChunk, pin = true)
  }

  /** Shared bucket→pair→count tail of both chunking paths: `chunksCol`
    * evaluates to the doc's array of chunk fingerprints.
    *
    * `pin`: the chunk stream feeds BOTH the bounding count pass and the
    * pair join. For the production rolling-hash path recomputing it is
    * scan-speed work, cheaper at 100 TB than materializing the stream; the
    * md5 oracle path's chunking is ~all of its cost, so it pins the stream
    * once with localCheckpoint instead of paying it twice.
    */
  private def chunkPairsFrom(df: DataFrame, idCol: String,
                             chunksCol: Column,
                             maxDocsPerChunk: Int,
                             pin: Boolean = false): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
        explode(array_distinct(chunksCol)).as("chunk"))
    val chunked = if (pin) exploded.localCheckpoint() else exploded
    val sharedBounded = chunked.groupBy("chunk")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1 && col("cnt") <= maxDocsPerChunk)
      .select("chunk")
    chunked.join(sharedBounded, Seq("chunk"), "left_semi")
      .groupBy("chunk")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(explode(pairCombos(col("ids"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared_chunks"))
  }

  /** Candidate-scoped CONTAINMENT verification (the chunk path's analogue
    * of [[jaccardVerify]]): for each candidate pair, exact overlap
    * coefficient |A∩B| / min(|A|,|B|) over distinct n-gram shingle sets,
    * thresholded. Symmetric on purpose — a chunk-level hit means a shared
    * passage, and the passage is "most of" whichever doc is SMALLER, so
    * min-normalization flags quote-in-long-doc in either direction (plain
    * Jaccard dilutes it by the long doc's size; that miss is why the chunk
    * path exists). Only docs appearing in a candidate pair are shingled —
    * at corpus scale the candidate set is orders of magnitude smaller than
    * the corpus, so this never re-scans everything.
    */
  def containmentVerify(df: DataFrame, pairs: DataFrame, idCol: String,
                        textCol: String, n: Int = 3,
                        threshold: Double = 0.5): DataFrame = {
    require(threshold > 0 && threshold <= 1)
    val candIds = pairs.select(col("id_a").as("cid"))
      .union(pairs.select(col("id_b").as("cid"))).distinct()
    // candidate-id set scales with the pair list — no hint, AQE decides
    val sh = df.join(candIds, col(idCol) === col("cid"), "left_semi")
      .select(col(idCol),
        array_distinct(Text.shingles(col(textCol), n)).as("sh"))
    pairs.select("id_a", "id_b")
      .join(sh.withColumnRenamed(idCol, "id_a").withColumnRenamed("sh", "sh_a"),
        Seq("id_a"))
      .join(sh.withColumnRenamed(idCol, "id_b").withColumnRenamed("sh", "sh_b"),
        Seq("id_b"))
      .withColumn("__i", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("__mn", least(size(col("sh_a")), size(col("sh_b"))).cast("double"))
      .withColumn("containment",
        when(col("__mn") === 0, 0.0).otherwise(col("__i") / col("__mn")))
      .where(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("containment"), 4).as("containment"))
  }

  /** Verified transitive CHUNK dedup — the passage-level sibling of
    * [[minhashKeepIdsTransitiveVerified]] (q77): rolling-hash chunk
    * candidates → exact containment verification → connected components
    * over the VERIFIED pairs → survivors (component min id + unpaired
    * docs). An LSH-style chunk collision alone never deletes a doc; every
    * edge in the closure carries overlap ≥ threshold.
    */
  def chunkKeepIdsVerified(df: DataFrame, idCol: String, textCol: String,
                           window: Int = 16, maskBits: Int = 6,
                           maxDocsPerChunk: Int = 64, n: Int = 3,
                           threshold: Double = 0.5): DataFrame =
    keepFromVerified(df, idCol,
      containmentVerify(df,
        chunkCandidatePairs(df, idCol, textCol, window, maskBits,
          maxDocsPerChunk), idCol, textCol, n, threshold))

  /** [[chunkKeepIdsVerified]] over the MD5 cut rule
    * ([[chunkCandidatePairsMd5]]) so DuckDB can replay candidates,
    * verification and closure digit-for-digit — the oracle anchor (q131);
    * production stays on the rolling-hash path.
    */
  def chunkKeepIdsVerifiedMd5(df: DataFrame, idCol: String, textCol: String,
                              window: Int = 4, maskBits: Int = 2,
                              maxDocsPerChunk: Int = 64, n: Int = 3,
                              threshold: Double = 0.5): DataFrame =
    keepFromVerified(df, idCol,
      containmentVerify(df,
        chunkCandidatePairsMd5(df, idCol, textCol, window, maskBits,
          maxDocsPerChunk), idCol, textCol, n, threshold))

  private def keepFromVerified(df: DataFrame, idCol: String,
                               verified: DataFrame): DataFrame = {
    val victims = connectedComponents(verified.select("id_a", "id_b"))
      .where(col("id") =!= col("cluster"))
      .select(col("id").as("victim"))
    df.select(col(idCol))
      .join(victims, col(idCol) === col("victim"), "left_anti")
  }

  // ---- Eval-set contamination ----------------------------------------------

  /** Train/eval contamination detection — the pre-training hygiene check:
    * training docs sharing at least `minShared` distinct word n-gram
    * shingles with ANY eval document are flagged (their eval n-gram overlap
    * would leak benchmark answers into the corpus).
    *
    * Shape for scale: both sides explode to distinct shingles scan-side;
    * the eval side (benchmarks are small — thousands of docs) aggregates to
    * a distinct-shingle set and is BROADCAST, so the train corpus never
    * shuffles; the per-train-doc count is a partial-aggregable groupBy on
    * the train id. Joining on shingle strings keeps the operator
    * SQL-oracle-able; at petabyte scale swap the join key for
    * `xxhash64(shingle)` (8 bytes) — same plan shape.
    *
    * Returns (train id, n_shared) for flagged docs.
    */
  def contamination(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 3, minShared: Int = 1): DataFrame = {
    def shingled(df: DataFrame) = df.select(col(idCol).as("id"),
      explode(array_distinct(Text.shingles(col(textCol), n))).as("sh"))
    val evalShingles = shingled(eval).select("sh").distinct()
    shingled(train)
      // eval-shingle set = |eval| × doc length — data-scale for a big
      // eval suite, so no hint; AQE broadcasts it when small
      .join(evalShingles, Seq("sh"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select(col("id").as(idCol), col("n_shared"))
  }

  /** N-gram novelty scoring — [[contamination]]'s inverse: instead of
    * flagging overlap with an eval set, SCORE every corpus doc by the
    * fraction of its distinct n-grams absent from a reference corpus
    * (yesterday's crawl, the already-trained data, a competitor snapshot).
    * Novelty-weighted sampling upranks genuinely new content; a near-zero
    * tail is re-crawl/duplication pressure the dedup stage should absorb.
    * Returns every corpus doc: (idCol, n_shingles, n_novel, novelty) —
    * docs too short to shingle report 0 shingles and null novelty.
    *
    * Shape for scale: unlike contamination's broadcast-eval shape, the
    * reference here can be corpus-sized, so the distinct reference
    * shingle set joins as a plain LEFT SEMI on the shingle key (AQE picks
    * broadcast only when it fits); the per-doc roll-up is one id-keyed
    * partial aggregate. Swap the join key for `xxhash64(shingle)` at
    * petabyte scale — same plan.
    */
  def ngramNovelty(corpus: DataFrame, reference: DataFrame, idCol: String,
                   textCol: String, n: Int = 3): DataFrame = {
    def shingled(df: DataFrame) = df.select(col(idCol).as("id"),
      explode(array_distinct(Text.shingles(col(textCol), n))).as("sh"))
    val refShingles = shingled(reference).select("sh").distinct()
    val seen = shingled(corpus)
      .join(refShingles, Seq("sh"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("__seen"))
    val totals = shingled(corpus).groupBy("id")
      .agg(count(lit(1)).as("n_shingles"))
    corpus.select(col(idCol))
      .join(totals.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .join(seen.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("n_shingles", coalesce(col("n_shingles"), lit(0L)))
      .withColumn("n_novel",
        col("n_shingles") - coalesce(col("__seen"), lit(0L)))
      .withColumn("novelty", when(col("n_shingles") > 0,
        col("n_novel") / col("n_shingles")))
      .select(idCol, "n_shingles", "n_novel", "novelty")
  }

  // ---- Group-level sketches ------------------------------------------------

  /** Per-group MinHash union sketch ([[graft.functions.expressions.MinHashUnionAgg]]):
    * constant-size state per group, partial-aggregated map-side.
    */
  def groupSignatures(df: DataFrame, groupCol: String, textCol: String,
                      shingleSize: Int = 3, numHashes: Int = 64): DataFrame =
    df.select(col(groupCol),
        minhashSignature(col(textCol), shingleSize, numHashes).as("sig"))
      .groupBy(groupCol)
      .agg(graft.functions.expressions.MinHashUnionAgg
        .minhashUnion(col("sig"), numHashes).as("gsig"))

  /** Estimated Jaccard similarity between every pair of groups = fraction
    * of agreeing sketch coordinates. The pairwise step is over GROUPS
    * (small), not documents — corpus-scale content-overlap comparison
    * without touching raw text twice.
    */
  def groupMinhashSimilarity(df: DataFrame, groupCol: String, textCol: String,
                             shingleSize: Int = 3, numHashes: Int = 64): DataFrame = {
    val sigs = groupSignatures(df, groupCol, textCol, shingleSize, numHashes)
    val a = sigs.select(col(groupCol).as("group_a"), col("gsig").as("sig_a"))
    val b = sigs.select(col(groupCol).as("group_b"), col("gsig").as("sig_b"))
    a.join(b, col("group_a") < col("group_b"))
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes)
      .select("group_a", "group_b", "est_jaccard")
  }

  /** Cross-engine-reproducible variant of [[groupMinhashSimilarity]]:
    * coordinate i of a group's union sketch is the LEXICOGRAPHIC min of
    * `md5(i ++ ":" ++ shingle)` hex over the union of the group's doc
    * shingle sets (fixed-width lowercase hex, so string min == numeric min
    * of the 128-bit value in any engine — the [[minhashCandidatePairsMd5]]
    * hash family lifted to the group level). Union-of-mins = min-of-mins,
    * so each doc computes its signature scan-side and ONE group-keyed
    * aggregate takes per-coordinate mins — the shuffle carries a
    * numHashes-string array per doc, never shingles. The q49 gate
    * hash-checks this against a DuckDB replay; production corpus scans
    * stay on [[groupMinhashSimilarity]] (xxhash, 8-byte coords), whose
    * error telemetry rides q259.
    */
  def groupMinhashSimilarityMd5(df: DataFrame, groupCol: String,
                                textCol: String, shingleSize: Int = 3,
                                numHashes: Int = 16): DataFrame = {
    // bind the shingle array BEFORE the lambda references it: interpreted
    // HOF lambdas do no CSE, so an unbound shingles() would re-split the
    // text once per (coordinate, element)
    val sig = df
      .where(Text.tokenCount(col(textCol)) >= shingleSize)
      .select(col(groupCol),
        array_distinct(Text.shingles(col(textCol), shingleSize)).as("__sh"))
      .select(col(groupCol), array((0 until numHashes).map { i =>
        array_min(transform(col("__sh"),
          x => md5(concat_ws(":", lit(i.toString), x))))
      }: _*).as("__sig"))
    val gsig = sig.groupBy(groupCol)
      .agg(array((0 until numHashes).map(i =>
        min(element_at(col("__sig"), i + 1))): _*).as("gsig"))
    val a = gsig.select(col(groupCol).as("group_a"), col("gsig").as("sig_a"))
    val b = gsig.select(col(groupCol).as("group_b"), col("gsig").as("sig_b"))
    a.join(b, col("group_a") < col("group_b"))
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes)
      .select("group_a", "group_b", "est_jaccard")
  }

  /** EXACT per-group-pair Jaccard over distinct word n-gram shingle sets —
    * the deterministic anchor for [[groupMinhashSimilarity]]'s sketch
    * estimates (the gate hash-checks this; the sketch's error is
    * spec-bounded against it).
    *
    * Inverted-index formulation: distinct (group, shingle) rows self-join
    * on the shingle, so cost is linear in shared-shingle occurrences, and
    * the quadratic term is over GROUPS sharing a shingle — bounded by the
    * group count (sources/snapshots number in the dozens), never by corpus
    * size. J = i/(na+nb−i) needs only intersection + set sizes, so full
    * shingle sets are never materialized per pair. Only pairs sharing ≥ 1
    * shingle appear (disjoint groups have J = 0).
    */
  def groupJaccardExact(df: DataFrame, groupCol: String, textCol: String,
                        n: Int = 3, maxGroups: Int = 1000): DataFrame = {
    // the quadratic term here is over GROUPS, so that's what the guard
    // bounds (a column-pruned distinct-count pass, cheap vs the operator)
    guardAllPairs(df.select(col(groupCol)).distinct(), maxGroups,
      "groupJaccardExact", "groupMinhashSimilarity")
    val sh = df.where(Text.tokenCount(col(textCol)) >= n)
      .select(col(groupCol).as("g"),
        explode(array_distinct(Text.shingles(col(textCol), n))).as("s"))
      .distinct()
    val sizes = sh.groupBy("g").agg(count(lit(1)).as("n"))
    sh.select(col("g").as("group_a"), col("s"))
      .join(sh.select(col("g").as("group_b"), col("s")), Seq("s"))
      .where(col("group_a") < col("group_b"))
      .groupBy("group_a", "group_b").agg(count(lit(1)).as("i"))
      .join(broadcast(sizes.select(col("g").as("group_a"), col("n").as("na"))), Seq("group_a"))
      .join(broadcast(sizes.select(col("g").as("group_b"), col("n").as("nb"))), Seq("group_b"))
      .select(col("group_a"), col("group_b"),
        (col("i").cast("double") / (col("na") + col("nb") - col("i")))
          .as("jaccard"))
  }

  /** Fail-fast input bound for the exact all-pairs anchors. They are
    * quadratic by definition — correct as oracle anchors and verifiers on
    * bounded slices, a cluster-killer on an unbounded corpus — so rather
    * than silently running O(n²), the API refuses and names the LSH/sketch
    * sibling that scales. The check is one `limit(max+1).count()` job
    * (bounded work, stops at the first max+1 rows), never a full count.
    */
  private def guardAllPairs(df: DataFrame, maxRows: Int, op: String,
                            scalePath: String): Unit = {
    require(maxRows > 0 && maxRows < Int.MaxValue, s"$op: bad maxRows $maxRows")
    val n = df.limit(maxRows + 1).count()
    require(n <= maxRows,
      s"$op is an exact all-pairs anchor bounded at maxRows=$maxRows, but " +
        s"the input has > $maxRows rows. Slice/sample the input, raise " +
        s"maxRows explicitly, or use the scale path: $scalePath.")
  }

  // ---- Embedding near-dup --------------------------------------------------

  /** Embedding-cosine near-dup pairs above `threshold`, LSH-bucketed: only
    * vectors sharing a random-hyperplane signature are compared. Planes are
    * seeded literals → deterministic across runs/engines.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            dim: Int, threshold: Double = 0.95,
                            numPlanes: Int = 8, seed: Long = 42L,
                            maxBucket: Int = 4096): DataFrame = {
    val planes = Similarity.randomPlanes(numPlanes, dim, seed)
    val keyed = df.select(
      Vectors.lshSignature(col(vecCol), planes).as("sig"),
      struct(col(idCol).as("id"), col(vecCol).as("v")).as("x"))
    cappedBucketPairs(keyed, Seq("sig"), maxBucket)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Vectors.cosine(col("a.v"), col("b.v")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** EXACT all-pairs cosine near-dup pairs — the deterministic anchor for
    * [[embeddingNearDupPairs]] (whose hyperplane bucketing is probabilistic):
    * the gate hash-checks this against DuckDB's list arithmetic, and the LSH
    * path's recall is spec-measured against it. All-pairs is quadratic by
    * definition — bound the input (a partition, a sampled slice, or one LSH
    * bucket) at scale; the production path stays [[embeddingNearDupPairs]].
    * Cosine accumulates in double, array order, on both engines
    * ([[graft.functions.Vectors.cosine]]) so the threshold cut is
    * bit-reproducible.
    */
  def embeddingNearDupExact(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double,
                            maxRows: Int = 20000): DataFrame = {
    guardAllPairs(df, maxRows, "embeddingNearDupExact", "embeddingNearDupPairs")
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Vectors.cosine(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Semantic (embedding-space) transitive dedup: exact cosine pairs at
    * `threshold` → connected components → each component's min id survives
    * (plus all unpaired vectors). The embedding-side mirror of
    * [[minhashKeepIdsTransitiveVerified]]: every edge is an exact
    * similarity, so the closure is oracle-checkable (recursive CTE over the
    * same exact pairs). For corpus-scale inputs swap the pair source for
    * [[embeddingNearDupPairs]] — same closure, LSH-bounded candidate set.
    */
  def embeddingDedupExact(df: DataFrame, idCol: String, vecCol: String,
                          threshold: Double): DataFrame = {
    val pairs = embeddingNearDupExact(df, idCol, vecCol, threshold)
      .select("id_a", "id_b")
    val victims = connectedComponents(pairs)
      .where(col("id") =!= col("cluster"))
      .select(col("id").as("victim"))
    df.select(col(idCol))
      .join(victims, col(idCol) === col("victim"), "left_anti")
  }

  /** EXACT set-similarity join — every pair with token-set Jaccard ≥
    * `threshold`, no LSH recall caveat — via prefix filtering (the
    * PPJoin family): order each document's distinct tokens globally by
    * (frequency asc, token), keep only the first `|d| − ⌈t·|d|⌉ + 1` as
    * its PREFIX, and generate candidates from prefix-token collisions.
    * Complete by the standard argument: J(a,b) ≥ t forces overlap
    * o ≥ t·|a| (and t·|b|), so the globally-smallest shared token sits at
    * rank ≤ |a| − o + 1 ≤ prefix length in BOTH prefixes.
    *
    * Shape for scale: the candidate join runs on PREFIX tokens only,
    * which the (freq asc) order makes the RAREST tokens in the corpus —
    * bucket sizes are small by construction, the exact inverse of the
    * hot-token blow-up a naive inverted-index join hits. Verification
    * counts intersections only over candidate pairs (semi-join-scoped,
    * like `containmentVerify`), never re-joining the full corpus.
    * Returns (id_a, id_b, jaccard), id_a < id_b.
    */
  def jaccardJoinExact(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double,
                       tokens: Column => Column = c =>
                         filter(split(c, " "), t => length(t) > 0))
      : DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1]: $threshold")
    // `tokens` picks the set element: whitespace words by default, but on
    // a SMALL-vocabulary corpus pass shingles (`Text.shingles(_, n)`) —
    // prefix filtering prunes by rare tokens, and when every token is
    // common (31-word synthetic vocab, df ≈ 0.8·N) no unigram is rare and
    // the candidate join degenerates to all-pairs; shingle vocabularies
    // are combinatorial, so their frequencies stay low (the q147 lesson:
    // 80 s → sub-second at sf0.1 for the identical join code)
    val toks = df
      .select(col(idCol).as("id"),
        explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .localCheckpoint() // feeds frequency, prefix and verification
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("sz"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    val prefix = toks.join(freq, "tok")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(col("tf"), col("tok"))))
      .join(sizes, "id")
      .where(col("rn") <= col("sz") - ceil(col("sz") * threshold) + 1)
      .select("id", "tok")
    val cands = prefix.select(col("id").as("id_a"), col("tok"))
      .join(prefix.select(col("id").as("id_b"), col("tok")), "tok")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val inter = cands
      .join(toks.select(col("id").as("id_a"), col("tok")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("tok")),
        Seq("id_b", "tok"), "left_semi")
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("i") / (col("sz_a") + col("sz_b") - col("i")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** All deletion variants of `s` at exactly `d` characters removed
    * (d = 0 is `s` itself), as a distinct array column. Built from pure
    * codegen'd collection functions — no UDF. */
  private def deletionVariants(s: Column, d: Int): Column = {
    // empty input has no deletions (sequence(0,-1) would count DOWN)
    def delOne(str: Column): Column =
      when(length(str) <= 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), length(str) - 1), i =>
          concat(str.substr(lit(1), i), str.substr(i + 2, length(str)))))
    d match {
      case 0 => array(s)
      case 1 => array_distinct(delOne(s))
      case 2 => array_distinct(flatten(transform(delOne(s), v => delOne(v))))
      case _ => throw new IllegalArgumentException(
        s"maxDist must be 0, 1 or 2: $d")
    }
  }

  /** Exact small-edit-distance self-join — record linkage / fuzzy entity
    * dedup (user handles, author names, near-identical titles) WITHOUT a
    * quadratic compare: the SymSpell deletion-neighborhood block. Every
    * string generates its deletion variants at up to `maxDist` removed
    * characters; two strings within Levenshtein distance `maxDist` (≤ 2)
    * are guaranteed to share at least one variant (each edit is covered
    * by deleting the edited position from one or both sides), so the
    * variant-equality join is a COMPLETE candidate generator. Candidates
    * are then verified with the real `levenshtein` — the variant join
    * over-generates (e.g. transposes at distance 2), never misses.
    *
    * Shape for scale: a string of length L yields O(L^maxDist) variant
    * keys, and a variant bucket only holds strings that agree on every
    * OTHER character — bucket sizes track true near-duplicate density,
    * not corpus size (the same inversion `jaccardJoinExact` gets from
    * rare-token prefixes). The verify join carries ids only, rejoining
    * each side's string by id. No driver collection anywhere.
    *
    * Returns (id_a, id_b, dist), id_a < id_b, dist ≤ maxDist — including
    * dist 0 (exact duplicates under the key).
    */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
                       maxDist: Int = 1): DataFrame = {
    require(maxDist >= 0 && maxDist <= 2,
      s"maxDist must be in [0, 2]: $maxDist")
    // spread: the deletion-variant explosion (O(L^maxDist) substring
    // builds per row) dominates this operator and the local corpus is one
    // unsplittable file (guide §2.5) — measured 2.3 s → 0.9 s at sf0.1;
    // no-op on real multi-split scans
    val strs = Pinning.spread(df.select(col(idCol).as("id"), col(strCol).as("s")), col("id"))
      .where(col("s").isNotNull)
    val keys = strs
      .select(col("id"), explode(array_distinct(concat(
        (0 to maxDist).map(d => deletionVariants(col("s"), d)): _*))).as("k"))
    val cands = keys.select(col("id").as("id_a"), col("k"))
      .join(keys.select(col("id").as("id_b"), col("k")), "k")
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cands
      .join(strs.select(col("id").as("id_a"), col("s").as("s_a")), "id_a")
      .join(strs.select(col("id").as("id_b"), col("s").as("s_b")), "id_b")
      // threshold form runs the banded DP — O(len·maxDist) per pair
      // instead of O(len²) — and returns the exact distance for every
      // pair within the bound (-1 beyond it, which the filter drops)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Shared-prefix grouping — the template/boilerplate-generation
    * detector: documents produced by stamping a template share a LONG
    * COMMON PREFIX (same header, same preamble) even when their tails
    * diverge enough to defeat whole-document fingerprints. Each doc is
    * fingerprinted at geometric prefix lengths (`minPrefix`, 2×, 4×, …
    * ≤ `maxPrefix` — ~log₂ levels, so the fan-out is a constant ≤ 6, not
    * a per-character explode), docs sharing an md5 at a level form a
    * group, and each doc reports its LONGEST shared level. Returns
    * (id, prefix_len, group_id, group_size) for docs in a group of ≥ 2;
    * unique-prefix docs drop out.
    *
    * Scale: one bounded explode, one (len, md5)-keyed aggregate for
    * group sizes, one max_by per doc — compact 16-byte-ish keys
    * throughout, no pair join at all (group identity replaces pairwise
    * comparison, the same move as exact dedup).
    */
  def commonPrefixGroups(df: DataFrame, idCol: String, textCol: String,
                         minPrefix: Int = 64,
                         maxPrefix: Int = 1024): DataFrame = {
    require(minPrefix > 0 && maxPrefix >= minPrefix,
      s"need 0 < minPrefix <= maxPrefix: $minPrefix/$maxPrefix")
    val levels = Iterator.iterate(minPrefix)(_ * 2)
      .takeWhile(_ <= maxPrefix).toSeq
    val fps = df
      .select(col(idCol).as("__id"), col(textCol).as("__text"))
      .withColumn("__len", explode(array(levels.map(lit): _*)))
      // a doc shorter than the level has no such prefix — no fingerprint
      // (padding instead would alias "short doc" with "prefix of a long
      // doc", a false group)
      .where(length(col("__text")) >= col("__len"))
      .select(col("__id"), col("__len"),
        md5(col("__text").substr(lit(1), col("__len"))).as("__fp"))
    val groups = fps.groupBy("__len", "__fp")
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") >= 2)
    fps.join(groups, Seq("__len", "__fp"))
      .groupBy(col("__id").as(idCol))
      .agg(max_by(
        struct(col("__len"), col("__fp"), col("__n")), col("__len"))
        .as("__best"))
      .select(col(idCol), col("__best.__len").as("prefix_len"),
        col("__best.__fp").as("group_id"),
        col("__best.__n").as("group_size"))
  }

  // ---- exact-substring span dedup (ExactSubstr) ----------------------------

  /** Duplicated-SPAN detection — the sub-document half of dedup (Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models
    * Better", the ExactSubstr pass): find every maximal token span that
    * also appears verbatim elsewhere in the corpus, so the span (not the
    * whole document) can be scrubbed. Whole-doc MinHash misses a license
    * block pasted into 10k otherwise-distinct files; this is the operator
    * that catches it.
    *
    * Algorithm, Spark-shaped (the paper uses a suffix array — a global
    * sorted structure that doesn't distribute; sliding-window hashing
    * finds the same ≥`windowTokens` duplications): every `windowTokens`-
    * token window hashes scan-side (ONE xxhash64 per window over a
    * pre-split token array — no UDF); windows bucket by hash (the only
    * row-scale shuffle carries (hash, doc, start) — 24 bytes/window,
    * never text); a window occurrence is DUPLICATED iff its hash bucket
    * holds > 1 occurrence and it is not the bucket's (doc, start)-least
    * occurrence (the global FIRST copy stays, so scrubbing never deletes
    * the last copy of anything — the paper's keep-one convention);
    * duplicated windows explode to their ≤`windowTokens` covered
    * positions and gaps-and-islands (per-DOC window, partitioned) merges
    * them into maximal spans. A span of J duplicated tokens costs
    * J·windowTokens position rows before the distinct — bounded by the
    * corpus's duplication mass, the thing this operator exists to be
    * proportional to.
    *
    * Returns one row per maximal duplicated span:
    * (idCol, span_start, span_end, n_tokens) — token positions, end
    * exclusive. Windows group by 64-bit hash; at 2⁶⁴ a same-hash
    * distinct-content collision is negligible and the gate's oracle
    * (which groups by the window CONTENT) would catch one.
    */
  /** (__id, __start, __wh) for every `windowTokens`-token window — the
    * shared scan front of [[repeatedSpans]] / [[contaminatedSpans]].
    */
  private def windowHashes(df: DataFrame, idCol: String, textCol: String,
                           windowTokens: Int): DataFrame = {
    val L = windowTokens
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    // spread: one slice+concat+xxhash64 per token position is O(|doc|·L)
    // per row and the local corpus is one unsplittable file (guide §2.5);
    // no-op on real multi-split scans
    // bind the array ONCE (HOF lambdas re-evaluate captured expressions)
    Pinning.spread(df.select(col(idCol), col(textCol)), col(idCol))
      .select(col(idCol).as("__id"), toks.as("__toks"))
      .where(size(col("__toks")) >= L)
      .select(col("__id"),
        posexplode(transform(
          sequence(lit(0), size(col("__toks")) - L),
          // \u0001 separator: tokens never contain it (split on space),
          // so ["ab","c"] and ["a","bc"] can't alias to one window
          i => xxhash64(concat_ws("\u0001",
            slice(col("__toks"), i + 1, lit(L)))))).as(Seq("__start", "__wh")))
  }

  /** Merge flagged window starts into maximal spans — positions explode
    * (∝ flagged mass only), then per-doc gaps-and-islands.
    */
  private def spansFromWindows(flagged: DataFrame, idCol: String,
                               windowTokens: Int): DataFrame = {
    val covered = flagged
      .select(col("__id"),
        explode(sequence(col("__start"),
          col("__start") + (windowTokens - 1))).as("__p"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__id").orderBy("__p")
    covered
      .withColumn("__isl", col("__p") - row_number().over(w))
      .groupBy(col("__id").as(idCol), col("__isl"))
      .agg(min("__p").cast("long").as("span_start"),
        (max("__p") + 1).cast("long").as("span_end"),
        count(lit(1)).as("n_tokens"))
      .drop("__isl")
  }

  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    windowTokens: Int = 20): DataFrame = {
    require(windowTokens >= 2, s"windowTokens must be ≥ 2: $windowTokens")
    val occ = windowHashes(df, idCol, textCol, windowTokens)
      .withColumn("__occ", struct(col("__id"), col("__start")))
    // join formulation, NOT collect_list-per-hash: a boilerplate window
    // repeated in 10⁶ docs would otherwise build one 10⁶-element array
    // on a single hot key. The firsts table is duplicated-hash-sized and
    // min/count aggregate with map-side partials; the equi-join back
    // shares the wh-shuffle with the aggregate (ReusedExchange), so the
    // formulation costs one extra compact-row join, never a giant array.
    val firsts = occ.groupBy("__wh")
      .agg(count(lit(1)).as("__n"), min("__occ").as("__first"))
      .where(col("__n") > 1)
      .select("__wh", "__first")
    val dupWins = occ.join(firsts, "__wh")
      .where(col("__occ") =!= col("__first"))
      .select(col("__id"), col("__start"))
    spansFromWindows(dupWins, idCol, windowTokens)
  }

  /** Span-level eval DECONTAMINATION — [[repeatedSpans]]' cross-corpus
    * sibling: every maximal ≥`windowTokens`-token span of `df` that
    * appears verbatim ANYWHERE in `reference` (the eval/benchmark set).
    * n-gram contamination scoring says "this doc overlaps the eval set";
    * this says WHERE, so the span can be scrubbed instead of dropping
    * the whole document. Same scan/shuffle shape: windows hash on both
    * sides, the reference side reduces to DISTINCT hashes (compact —
    * eval sets are small next to the corpus), and the flag join is a
    * left-semi on the 8-byte hash.
    *
    * Returns (idCol, span_start, span_end, n_tokens) over `df`.
    */
  def contaminatedSpans(df: DataFrame, reference: DataFrame,
                        idCol: String, textCol: String,
                        refIdCol: String, refTextCol: String,
                        windowTokens: Int = 20): DataFrame = {
    require(windowTokens >= 2, s"windowTokens must be ≥ 2: $windowTokens")
    val refHashes = windowHashes(reference, refIdCol, refTextCol,
      windowTokens).select("__wh").distinct()
    val flagged = windowHashes(df, idCol, textCol, windowTokens)
      .join(refHashes, Seq("__wh"), "left_semi")
    spansFromWindows(flagged, idCol, windowTokens)
  }

  /** Scrub duplicated spans out of the text ([[repeatedSpans]]'s writer
    * half): tokens covered by a duplicated span are dropped, the global
    * first occurrence survives, and the document is reassembled in token
    * order. Returns every input row:
    * (idCol, n_tokens, n_removed, clean_text) — docs shorter than one
    * window pass through untouched (they can't contain a window).
    */
  def scrubRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                         windowTokens: Int = 20): DataFrame = {
    val spans = repeatedSpans(df, idCol, textCol, windowTokens)
      .select(col(idCol).as("__sid"), col("span_start"), col("span_end"))
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    val positions = df
      .select(col(idCol).as("__id"),
        posexplode(toks).as(Seq("__p", "__tok")))
    // covered positions re-explode from the MERGED spans (span count ≪
    // window count), anti-joined per (doc, pos)
    val cov = spans.select(col("__sid").as("__id"),
      explode(sequence(col("span_start"), col("span_end") - 1)).as("__p"))
    positions.join(cov, Seq("__id", "__p"), "left_anti")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__p"), col("__tok")))),
          x => x.getField("__tok")), " ").as("clean_text"))
      .join(df.select(col(idCol).as("__id"),
        size(toks).cast("long").as("n_tokens")), Seq("__id"), "right")
      .select(col("__id").as(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** LSH configuration planner — the S-curve table behind every
    * `bands`/`numHashes` choice in this module: for each (b, r) split of
    * `numHashes` signature slots, the banded-MinHash collision
    * probability at Jaccard s is P(s) = 1 − (1 − s^r)^b, and the curve's
    * midpoint (the effective dedup threshold) is
    * s₅₀ = (1 − 0.5^(1/b))^(1/r). A config whose s₅₀ sits far from the
    * intended near-dup bar either floods the verify stage (too low) or
    * silently under-recalls (too high) — this table is how that gets
    * checked BEFORE a 100 TB pass, the [[graft.operators.Stats.mdeCurve]]
    * discipline applied to dedup. Returns one row per (config, grid
    * point): (bands, rows_per_band, s50, sim, p_collision).
    *
    * Pure closed-form arithmetic over a |divisors|×|grid| literal frame —
    * reads nothing; the engine (not the driver) evaluates the curve so
    * an external SQL replay is exact.
    */
  def lshPlan(spark: org.apache.spark.sql.SparkSession,
              numHashes: Int = 16,
              simGrid: Seq[Double] = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6,
                0.7, 0.8, 0.9, 0.95)): DataFrame = {
    require(numHashes >= 1, s"numHashes must be positive: $numHashes")
    require(simGrid.nonEmpty && simGrid.forall(s => s > 0 && s < 1),
      s"simGrid must lie in (0, 1): $simGrid")
    import spark.implicits._
    val configs = (1 to numHashes)
      .filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b))
    val grid = for ((b, r) <- configs; s <- simGrid) yield (b, r, s)
    grid.toDF("bands", "rows_per_band", "sim")
      .withColumn("s50",
        pow(lit(1.0) - pow(lit(0.5), lit(1.0) / col("bands")),
          lit(1.0) / col("rows_per_band")))
      .withColumn("p_collision",
        lit(1.0) - pow(lit(1.0) -
          pow(col("sim"), col("rows_per_band")), col("bands")))
      .select("bands", "rows_per_band", "s50", "sim", "p_collision")
  }
}

package graft.tools

import graft.Engine
import graft.operators.{Dedup, Joins, Scd, Sessionize, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling measurement: replicate the sf0.1 tables `rep`× (≈ sf1 at the
  * default 10) and compare operator runtimes at 1× vs rep×, reporting the
  * per-operator scaling exponent `log_rep(t_rep / t_1)` — 1.0 is perfectly
  * linear, anything ≳ 1.3 is flagged as a super-linear outlier (hidden
  * quadratic step, driver bottleneck, or broadcast threshold crossed).
  * Writes the table to SCALING.md.
  *
  * Replication is content-aware, not just key-shifted: document TEXT goes
  * through a per-replica character BIJECTION (vowel permutation + consonant
  * rotation via `translate`) so replicas are genuinely different corpora —
  * naive copies make every doc a near-dup of its 9 clones, and the dedup
  * operators would then (correctly!) emit ~100× the candidate pairs,
  * measuring data pathology instead of operator scaling. Vowels alone are
  * NOT enough: the first permutations fix 'a'/'e', and the synthetic vocab
  * is a/e-heavy, so vowel-only replicas shared half their tokens and
  * tf-idf cosine still saw every doc's clones as ≥0.8-similar (15M
  * cross-replica pairs at ×10 — the r10 lesson). Rotating the consonants
  * as well makes replica token sets fully disjoint while preserving
  * within-replica duplicate structure (dups transform alike).
  *
  * Usage: runMain graft.tools.ScaleCheck [replication] [op1,op2,...]
  * With an op filter only those anchors run and SCALING.md is NOT
  * rewritten (iteration mode); the full sweep regenerates the file.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(10)
    val opFilter = args.drop(1).headOption.map(_.split(",").toSet)
    // text replicas are distinguished by vowel permutation; 5! bounds rep
    require(rep >= 2 && rep <= 120, s"replication must be in [2, 120], got $rep")
    val base = "/root/testdata/sf0.1"
    val out = s"/tmp/graft_scale_x$rep"
    val spark = Engine.localSession(Engine.defaultCores, "scalecheck")
    spark.sparkContext.setLogLevel("WARN")

    val vowelPerms = "aeiou".permutations.take(rep).toIndexedSeq
    val cons = "bcdfghjklmnpqrstvwxz"
    // replica 0 is the identity (vowelPerms(0) = "aeiou", rotation 0);
    // the (perm, rotation) pair is distinct for every i < 120
    def consRot(i: Int): String = {
      val r = i % cons.length; cons.drop(r) + cons.take(r)
    }

    def replicate(name: String, keyCols: Seq[String],
                  textCols: Seq[String] = Nil): Unit = {
      val src = spark.read.parquet(s"$base/$name.parquet")
      val shifted = (0 until rep).map { i =>
        val keyed = keyCols.foldLeft(src)((d, k) =>
          d.withColumn(k, col(k) + lit(i.toLong * 100000000L)))
        textCols.foldLeft(keyed)((d, t) =>
          d.withColumn(t, translate(col(t), "aeiou" + cons,
            vowelPerms(i) + consRot(i))))
      }.reduce(_ union _)
      shifted.write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    replicate("lineitem", Seq("l_orderkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    // c_name is vowel-permuted so replicas carry DISTINCT names: plain
    // copies would make every name a 10-way exact dup and the edit-
    // distance shape would measure clone pathology, not operator scaling
    replicate("customer", Seq("c_custkey"), textCols = Seq("c_name"))
    replicate("documents", Seq("doc_id"), textCols = Seq("text"))
    replicate("embeddings", Seq("vec_id"))
    replicate("events", Seq("event_id", "user_id"))

    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
    def emb(dir: String) = graft.sources.Tables.loadEmbeddings(spark, dir)

    val ops: Seq[(String, String => Long)] = Seq(
      "star_join" -> { dir =>
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
        val o = spark.read.parquet(s"$dir/orders.parquet")
        val c = spark.read.parquet(s"$dir/customer.parquet")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
          .count()
      },
      "exact_dedup" -> { dir =>
        Dedup.exactKeepIds(docs(dir), "doc_id", Seq("text")).count()
      },
      "minhash_pairs" -> { dir =>
        Dedup.minhashCandidatePairs(docs(dir), "doc_id", "text").count()
      },
      "simhash_pairs" -> { dir =>
        Dedup.simhashCandidatePairs(docs(dir), "doc_id", "text").count()
      },
      "chunk_pairs" -> { dir =>
        Dedup.chunkCandidatePairs(docs(dir), "doc_id", "text").count()
      },
      "transitive_dedup" -> { dir =>
        Dedup.minhashKeepIdsTransitiveVerified(docs(dir), "doc_id", "text",
          threshold = 0.5).count()
      },
      "ann_brute" -> { dir =>
        val e = emb(dir)
        Similarity.bruteForceTopK(e, e.where(col("vec_id") <= 20),
          "vec_id", "embedding", 3).count()
      },
      "ann_lsh" -> { dir =>
        val e = emb(dir)
        Similarity.lshTopK(e, e.where(col("vec_id") <= 20),
          "vec_id", "embedding", dim = 64, k = 3).count()
      },
      "ann_pq" -> { dir =>
        // production PQ config: 16 subspaces × 16 cells, constant refine
        val e = emb(dir)
        Similarity.pqTopK(e, e.where(col("vec_id") <= 20),
          "vec_id", "embedding", dim = 64, k = 3,
          numSub = 16, ksub = 16, refine = 8).count()
      },
      "range_join" -> { dir =>
        val bands = spark.range(0, 40).select(col("id").as("band_id"),
          (col("id") * lit(2500.0)).as("lo"), ((col("id") + 1) * lit(2500.0)).as("hi"))
        Joins.rangeJoinBinned(spark.read.parquet(s"$dir/lineitem.parquet"),
            "l_extendedprice", bands, "lo", "hi", 2500.0)
          .groupBy("band_id").count().count()
      },
      "tfidf" -> { dir =>
        val d = docs(dir)
        val terms = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
          .localCheckpoint()
        // df is vocab-scale (heaps law) — no hint, AQE decides
        val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        tf.join(dfq, "term").count()
      },
      "sessionize" -> { dir =>
        Sessionize.perUserStats(graft.sources.Tables.loadEvents(spark, dir),
          "user_id", "ts", "event_id", 1800).count()
      },
      "scd2" -> { dir =>
        Scd.scd2(docs(dir).select(col("source"), col("doc_id"), col("lang")),
          key = "source", ts = "doc_id", attrs = Seq("lang")).count()
      },
      "bloom_increment" -> { dir =>
        // corpus (even ids) and re-crawl batch (ids % 3 == 0: half dups,
        // half new) both grow with sf; sketch sized for the 10x corpus
        val d = docs(dir)
        graft.operators.Incremental.newRows(
          d.where(col("doc_id") % 3 === 0).select(col("doc_id"), md5(col("text")).as("fp")),
          d.where(col("doc_id") % 2 === 0).select(md5(col("text")).as("fp")),
          "fp", expectedItems = 1L << 18).count()
      },
      "group_jaccard" -> { dir =>
        Dedup.groupJaccardExact(docs(dir), "source", "text").count()
      },
      "stratified_sample" -> { dir =>
        graft.operators.Splits.stratifiedSample(docs(dir), Seq("lang"), 0.2,
          "doc_id").count()
      },
      "repetition" -> { dir =>
        graft.operators.Quality.repetitionProfile(docs(dir), "doc_id", "text").count()
      },
      "vocab_topn" -> { dir =>
        docs(dir).select(explode(split(col("text"), " ")).as("token"))
          .where(length(col("token")) > 0)
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token")).limit(100).count()
      },
      "balanced_downsample" -> { dir =>
        graft.operators.Splits.balancedDownsample(docs(dir), Seq("source"),
          80L, "doc_id").count()
      },
      "semantic_clusters" -> { dir =>
        val e = emb(dir)
        val seeds = e.where(col("vec_id") <= 8)
          .select(col("vec_id"), col("embedding")).collect()
          .map(r => r.getLong(0).toInt -> r.getSeq[Float](1).map(_.toDouble).toSeq)
          .sortBy(_._1)
        Similarity.assignToCentroids(e, "vec_id", "embedding",
            seeds.map(_._1).toSeq, seeds.map(_._2).toSeq)
          .groupBy("cell").count().count()
      },
      "cms_counts" -> { dir =>
        val toks = docs(dir)
          .select(explode(split(col("text"), " ")).as("token"))
          .where(length(col("token")) > 0)
        graft.operators.Sketches.cmsTokenCounts(toks, "token",
          Seq("the")).head._2
      },
      "bpe_train_segment" -> { dir =>
        val d = docs(dir)
        val merges = graft.functions.Text.bpeMerges(d, "text", numMerges = 30)
        d.select(sum(size(graft.functions.Text.bpeSegment(col("text"),
          merges))).as("n")).head().getLong(0)
      },
      "negative_pairs" -> { dir =>
        // embeddings replicate with SHIFTED ids (not dense) — run the
        // arithmetic over a dense 0..n synthetic id of the same cardinality
        val n = emb(dir).count()
        val ids = emb(dir).sparkSession.range(0, n).toDF("id")
        graft.operators.Splits.negativePairs(ids, "id", k = 5, n = n).count()
      },
      "unigram_kl" -> { dir =>
        val toks = docs(dir).select(col("source"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
          .where(length(col("tok")) > 0)
        val bySource = toks.groupBy("source", "tok").agg(count(lit(1)).as("c"))
        // corpus frame is vocab-scale (heaps law) — no hint, AQE decides
        val corpus = toks.groupBy("tok").agg(count(lit(1)).as("cc"))
        bySource.join(corpus, Seq("tok"))
          .groupBy("source").agg(count(lit(1)).as("n")).count()
      },
      "resample_ffill" -> { dir =>
        graft.operators.Timeseries.resampleFfill(
          graft.sources.Tables.loadEvents(spark, dir),
          "user_id", "ts", "value", stepSeconds = 300L).count()
      },
      "ingest_newdocs" -> { dir =>
        // batch = 1/10 of docs vs corpus = 9/10: the ingest shape — the
        // corpus side must stay one bandedKeys pass (no self-pairing),
        // so the whole screen tracks corpus size linearly
        val d = docs(dir)
        graft.operators.Incremental.minhashNewDocs(
          d.where(col("doc_id") % 10 === 0), d.where(col("doc_id") % 10 =!= 0),
          "doc_id", "text").count()
      },
      "temperature_sample" -> { dir =>
        graft.operators.Splits.temperatureSample(docs(dir), "source",
          graft.functions.Text.tokenCount(col("text")).cast("long"),
          "doc_id", tau = 0.5, budgetFraction = 0.3).count()
      },
      "resample_ffill_manykey" -> { dir =>
        // keys ≈ rows (event_id is unique): the per-key stats and
        // per-(key, chunk) carry tables are DATA-sized here — the r12
        // perf_weak was an unconditional broadcast of exactly these; this
        // anchor holds the operator to linear with the planner choosing
        graft.operators.Timeseries.resampleFfill(
          graft.sources.Tables.loadEvents(spark, dir),
          "event_id", "ts", "value", stepSeconds = 3600L).count()
      },
      "dsir_weights" -> { dir =>
        // target histogram is a ≤B-row constant; the candidate side is the
        // data-sized stream — both must scale with corpus tokens, linearly
        val d = docs(dir)
        graft.operators.Quality.importanceWeights(
          d.where(col("source") =!= "src0"), d.where(col("source") === "src0"),
          "doc_id", "text").count()
      },
      "bigram_nll" -> { dir =>
        // scoring joins are per-DISTINCT-bigram; occurrence stream joins
        // the scored table once — must track corpus tokens linearly
        val d = docs(dir)
        graft.operators.Quality.bigramLogProb(d,
          d.where(col("source").isin("src0", "src1", "src2", "src3", "src4")),
          "doc_id", "text").count()
      },
      "char_entropy" -> { dir =>
        graft.operators.Quality.charEntropy(docs(dir), "doc_id", "text").count()
      },
      "pack_concat" -> { dir =>
        // window partitioned by source — the production shape (a global
        // pack order would single-partition the window sort)
        graft.operators.Splits.materializePacks(
          docs(dir).select(col("doc_id"), col("source"), col("text"),
            graft.functions.Text.tokenCount(col("text")).cast("long")
              .as("n_tok")),
          "doc_id", "n_tok", "text", budget = 2048L,
          partitionCols = Seq("source")).count()
      },
      "dedup_keep_best" -> { dir =>
        // transitive_dedup's pipeline + the survivor window: label join +
        // cluster-keyed window must stay corpus-linear
        graft.operators.Dedup.keepBestTransitiveVerified(
          docs(dir).select(col("doc_id"), col("text"), col("n_chars")),
          "doc_id", "text", "n_chars", n = 3, threshold = 0.5).count()
      },
      "sem_dedup" -> { dir =>
        // cluster-confined pair step: quadratic within cells, which grow
        // with N/k — watch the exponent as cells fatten at 10×
        val e = emb(dir)
        val seeds = e.where(col("vec_id") <= 8)
          .select(col("vec_id"), col("embedding")).collect()
          .map(r => r.getLong(0).toInt ->
            r.getSeq[Float](1).map(_.toDouble).toSeq).sortBy(_._1)
        graft.operators.Similarity.semDedup(e, "vec_id", "embedding",
          seeds.map(_._1).toSeq, seeds.map(_._2).toSeq, 0.3).count()
      },
      "sentence_chunks" -> { dir =>
        // scan-side split + slice per row — must track corpus chars
        graft.operators.Splits.sentenceChunks(
          docs(dir).select(col("doc_id"),
            regexp_replace(col("text"), " the ", ". The ").as("text")),
          "doc_id", "text", window = 3, stride = 2).count()
      },
      "boilerplate" -> { dir =>
        // md5-digest frequency shuffle + broadcast marker + one doc-keyed
        // reassembly shuffle — corpus-linear, no pairwise step
        graft.operators.Quality.boilerplateFilter(
          docs(dir).select(col("doc_id"),
            regexp_replace(concat(col("text"), lit(" Shared footer line.")),
              " the ", ". The ").as("text")),
          "doc_id", "text", minDocs = 3).count()
      },
      "c4_clean" -> { dir =>
        // pure projection — any super-linearity here is a harness bug
        graft.operators.Quality.c4Clean(
          docs(dir).select(col("doc_id"),
            regexp_replace(col("text"), " the ", ".\nThe ").as("text")),
          "doc_id", "text").count()
      },
      "perplexity_tiers" -> { dir =>
        // bigram_nll's joins + ONE broadcast threshold aggregate; the
        // sketch path (approxAccuracy) is what a real cluster would use
        val d = docs(dir)
        graft.operators.Quality.perplexityTiers(d,
          d.where(col("source").isin("src0", "src1", "src2", "src3", "src4")),
          "doc_id", "text", approxAccuracy = Some(1000)).count()
      },
      "repeat_allocation" -> { dir =>
        // one fact aggregate for masses (+ one for the budget, as a user
        // would) — every window/join after that is over ≤ #sources rows,
        // so the timing must track the SCAN, never a sort of the fact
        val d = docs(dir)
        val utot = d.agg(sum(graft.functions.Text.tokenCount(col("text")))
          .cast("long")).head.getLong(0)
        graft.operators.Analytics.repeatAllocation(d, "source",
          graft.functions.Text.tokenCount(col("text")),
          (utot * 1.2).floor.toLong,
          Map("src0" -> 4.0, "src1" -> 4.0, "src2" -> 2.0, "src3" -> 2.0))
          .count()
      },
      "minhash_pairs_md5" -> { dir =>
        // the q36b oracle anchor: md5-signature banding — EXPENSIVE hash
        // per (doc, band, row) but must stay corpus-linear (r7/r8 verdict:
        // the anchors that blew up were the ones never swept)
        Dedup.minhashCandidatePairsMd5(docs(dir), "doc_id", "text").count()
      },
      "chunk_pairs_md5" -> { dir =>
        // the q50b oracle anchor: token-windowed md5 cuts. With the token/
        // cut arrays bound as projected columns this is one md5 per token
        // position — the unbound form was O(tokens²) (670 s at sf0.1)
        Dedup.chunkCandidatePairsMd5(docs(dir), "doc_id", "text").count()
      },
      "chunk_dedup_verified" -> { dir =>
        // the q131 gate: chunk candidates → containment verify → CC; the
        // verify stage shingles only candidate docs, CC is candidate-sized
        Dedup.chunkKeepIdsVerifiedMd5(docs(dir), "doc_id", "text").count()
      },
      "sem_dedup_skewed" -> { dir =>
        // the 90%-one-cell shape (r6-r8 verdict): one far-away seed grabs
        // ~every vector; maxCellSize hash-splits the flood so the pair step
        // stays N·cap. Without the cap this exponent reads ~2.
        val e = emb(dir)
        val dim = e.select(size(col("embedding"))).head.getInt(0)
        val far = Seq.fill(dim)(100.0)
        val near = e.where(col("vec_id") === 1)
          .select(col("embedding")).head.getSeq[Float](0)
          .map(_.toDouble).toSeq
        graft.operators.Similarity.semDedup(e, "vec_id", "embedding",
          Seq(0, 1), Seq(near, far), threshold = 0.3,
          maxCellSize = 512).count()
      },
      "bikeshare_e2e" -> { dir =>
        // the q129 anchor: the full 5-stage reference pipeline + 22 queries
        // over a GENERATED corpus — scale rides the dir (0.04 → 0.4 at
        // ×10), exercising the same plans the sf-dir queries never touch
        val scale = if (dir == base) 0.04 else math.min(1.0, 0.04 * rep)
        graft.pipeline.BikeshareGen.runAll(spark.newSession(), scale).count()
      },
      "funnel" -> { dir =>
        // per-stage user-keyed conditional minima — events-linear
        graft.operators.EventAnalytics.funnel(
          graft.sources.Tables.loadEvents(spark, dir),
          "user_id", "ts", "event_type",
          Seq("view", "click", "purchase")).count()
      },
      "retention" -> { dir =>
        // first-event + distinct-activity aggregates — events-linear
        graft.operators.EventAnalytics.weeklyRetention(
          graft.sources.Tables.loadEvents(spark, dir),
          "user_id", "ts", maxWeeks = 4).count()
      },
      "knn_labels" -> { dir =>
        // the documented shape: the labeled SEED set is fixed-size (always
        // the base dir's seeds) while the unlabeled pool scales with the
        // corpus — pool×seeds work grows linearly in the pool
        val seeds = emb(base).where(col("vec_id") % 5 =!= 0)
        graft.operators.Similarity.knnLabelPropagation(
          seeds, emb(dir).where(col("vec_id") % 5 === 0),
          "vec_id", "embedding", "label", k = 5).count()
      },
      "centroid_margin" -> { dir =>
        // posexplode agg (fact-sized, partial map-side) + 10-centroid
        // broadcast cross join — strictly corpus-linear
        graft.operators.Similarity.centroidMargins(emb(dir),
          "vec_id", "embedding", "label").count()
      },
      "transitions" -> { dir =>
        // one user-keyed window + a |types|²-key aggregate — events-linear
        graft.operators.EventAnalytics.transitionCounts(
          graft.sources.Tables.loadEvents(spark, dir),
          "user_id", "ts", "event_type", "event_id").count()
      },
      "attribution" -> { dir =>
        // as-of union + one sorted user-keyed pass — events-linear
        graft.operators.EventAnalytics.lastTouchAttribution(
          graft.sources.Tables.loadEvents(spark, dir),
          "user_id", "ts", "event_type", "event_id", "value",
          "purchase", Seq("view", "click")).count()
      },
      "ab_lift" -> { dir =>
        // user-keyed partial agg → one-row report — events-linear
        graft.operators.EventAnalytics.abLift(
          graft.sources.Tables.loadEvents(spark, dir),
          "user_id", "event_type", "purchase", col("user_id") % 2).count()
      },
      "bm25" -> { dir =>
        // scan-side explode filtered to query terms; replicas vowel-permute
        // text so the match side thins — the measured cost is the
        // corpus-linear scan + doc-length pass, the worst case for the scan
        graft.operators.Retrieval.bm25(docs(dir), "doc_id", "text",
          Seq("spark", "join", "window"), topK = 10).count()
      },
      "source_report" -> { dir =>
        // two md5-keyed compact shuffles + per-source rollup — corpus-linear
        graft.operators.CorpusPipeline.sourceReport(docs(dir)).count()
      },
      "embed_cov" -> { dir =>
        // one mapPartitions accumulation (d+d² doubles/partition) — the
        // PCA/whitening prep pass, corpus-linear by construction
        graft.operators.EmbeddingStats.moments(emb(dir), "embedding")._1
      },
      "logreg" -> { dir =>
        // 5 GD rounds, each one gradient aggregate over pinned features —
        // corpus-linear with a fixed round count
        val f = graft.operators.Classify.textFeatures(docs(dir), "doc_id", "text")
          .withColumn("y", when(col("lang") === "en", 1.0).otherwise(0.0))
        val w = graft.operators.Classify.trainLogistic(
          f, Seq("f0", "f1", "f2", "f3"), "y", iterations = 5)
        graft.operators.Classify.scoreLogistic(
          f, Seq("f0", "f1", "f2", "f3"), w).count()
      },
      "pagerank" -> { dir =>
        // 10 fixed rounds over the q141-derived graph; replica ids collapse
        // onto the base modulo range, so in-degree skews rep× on the low
        // nodes — absorbed by map-side combine, rounds stay edges-linear
        val d = docs(dir).select("doc_id")
        val nDf = d.agg(count(lit(1)).as("n"))
        val b = d.crossJoin(broadcast(nDf))
        val edges = b.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % col("n")).as("dst"))
          .union(b.where(col("doc_id") % 2 === 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") + 7) % col("n")).as("dst")))
          .union(b.where(col("doc_id") % 3 === 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") + 101) % col("n")).as("dst")))
        graft.operators.Graphs.pageRank(edges, iterations = 10).count()
      },
      "jaccard_join" -> { dir =>
        // prefix-filtered exact set-similarity join over 3-shingles (the
        // q147 population — on the 31-word vocab no unigram is rare and
        // word-level prefixes degenerate to all-pairs); vowel-permuted
        // replicas keep shingle vocabularies disjoint-ish, so candidate
        // buckets stay per-replica — corpus-linear
        Dedup.jaccardJoinExact(docs(dir), "doc_id", "text", 0.9,
          tokens = c => graft.functions.Text.shingles(c, 3)).count()
      },
      "triangles" -> { dir =>
        // degree-oriented closure; replica ids collapse onto the base
        // modulo range (hub degrees grow rep×) — orientation must keep the
        // wedge join bounded anyway
        val d = docs(dir).select("doc_id")
        val nDf = d.agg(count(lit(1)).as("n"))
        val b = d.crossJoin(broadcast(nDf))
        val edges = b.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % col("n")).as("dst"))
          .union(b.where(col("doc_id") % 2 === 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") + 2) % col("n")).as("dst")))
          .union(b.where(col("doc_id") % 3 === 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") + 3) % col("n")).as("dst")))
        graft.operators.Graphs.triangleStats(edges)
          .head.getLong(2)
      },
      "expanding_folds_unique_ts" -> { dir =>
        // the adversarial shape for time-fold cutting: every row carries a
        // UNIQUE microsecond timestamp, so distinct-ts ≈ N and a naive
        // `ntile() OVER (ORDER BY ts)` would global-sort the corpus in one
        // task; the distributed-rank tiling must stay events-linear
        // offset by the FULL (replica-shifted) event_id so replicas don't
        // collapse onto the base run's distinct-ts set
        val ev = graft.sources.Tables.loadEvents(spark, dir)
          .withColumn("ts", expr("timestampadd(MICROSECOND, event_id, ts)"))
        graft.operators.Splits.expandingTimeFolds(ev, "ts", k = 4).count()
      },
      "media_features" -> { dir =>
        // real-codec batch path end to end: synthesize PNG images + MJPEG-
        // AVI clips from text, then decode-extract features per partition.
        // Codec work per row is constant, so the path must scale linearly.
        val d = docs(dir).where(col("doc_id") % 4 === 0)
        val media = graft.operators.Multimodal.textToPng(
            d.where(col("doc_id") % 8 === 0), "doc_id", "text").toDF()
          .unionByName(graft.operators.Multimodal.textToAvi(
            d.where(col("doc_id") % 8 =!= 0), "doc_id", "text").toDF())
        graft.operators.Multimodal.extractFeatures(media, dim = 16).count()
      },
      "local_clustering" -> { dir =>
        // per-vertex coefficients over the triangles graph — same oriented
        // wedge join plus a per-vertex rollup, must stay edges-linear
        val d = docs(dir).select("doc_id")
        val nDf = d.agg(count(lit(1)).as("n"))
        val b = d.crossJoin(broadcast(nDf))
        val edges = b.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % col("n")).as("dst"))
          .union(b.where(col("doc_id") % 2 === 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") + 2) % col("n")).as("dst")))
          .union(b.where(col("doc_id") % 3 === 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") + 3) % col("n")).as("dst")))
        graft.operators.Graphs.localClustering(edges).count()
      },
      "label_prop" -> { dir =>
        // 5 sync LPA rounds over the q153 ring+chords graph; replica ids
        // collapse modulo N like pagerank's — per-round work is one edge
        // join + count agg + per-node argmax, rounds stay edges-linear
        val d = docs(dir).select("doc_id")
        val nDf = d.agg(count(lit(1)).as("n"))
        val b = d.crossJoin(broadcast(nDf))
        val edges = b.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % col("n")).as("dst"))
          .union(b.where(col("doc_id") % 2 === 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") + 7) % col("n")).as("dst")))
          .union(b.where(col("doc_id") % 3 === 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") + 101) % col("n")).as("dst")))
        graft.operators.Graphs.labelPropagation(edges, iterations = 5).count()
      },
      "weighted_sample" -> { dir =>
        // A-Res top-k: one priority projection + TakeOrderedAndProject —
        // corpus-linear scan, constant result
        graft.operators.Splits.weightedSample(docs(dir),
          "doc_id", "n_chars", k = 20,
          uniform = c => ((c * 2654435761L) % 1000003L).cast("double")
            / 1000003.0).count()
      },
      "hll_distinct" -> { dir =>
        // mergeable HLL registers per source + one sketch-union row —
        // fixed sketch width, token-linear build, constant-size merge
        val toks = docs(dir)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .where(length(col("tok")) > 0)
        val per = graft.operators.Sketches.distinctSketches(
          toks, Seq("source"), "tok")
        graft.operators.Sketches.estimate(per).count() +
          graft.operators.Sketches.unionSketches(per).count()
      },
      "edit_distance" -> { dir =>
        // SymSpell deletion-neighborhood join on customer names; replicas
        // carry vowel-permuted (distinct) names, so candidate buckets stay
        // per-replica and pair volume scales with true near-dup density
        val c = spark.read.parquet(s"$dir/customer.parquet")
        Dedup.editDistanceJoin(c, "c_custkey", "c_name", maxDist = 1).count()
      },
      "rolling_anomalies" -> { dir =>
        // keyed trailing window — one shuffle on user_id, per-key sort;
        // replicated users are new keys, so events-linear
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.Timeseries.rollingAnomalies(ev, "user_id",
          Seq("ts", "event_id"), "value").count()
      },
      "token_mi" -> { dir =>
        // joint/marginal aggregates off one tokenize pass + broadcast
        // class marginals — token-linear, constant top-N head
        graft.operators.Quality.tokenClassMI(docs(dir), "text", "source",
          minCount = 50, topN = 50).count()
      },
      "robust_scale" -> { dir =>
        // one exact-percentile agg per source broadcast back on the rows —
        // corpus-linear, no window over the fact
        graft.operators.Analytics.robustScale(docs(dir), "source", "n_chars")
          .count()
      },
      "collocations" -> { dir =>
        // scan-side bigram build + two count aggregates — token-linear;
        // vowel permutation grows the vocab, counts stay per-replica
        graft.operators.Quality.collocations(docs(dir), "text",
          minCount = 25, topN = 50).count()
      },
      "column_deps" -> { dir =>
        // one joint-count agg per pair over the fact, entropies from the
        // compact joint — fact-linear per pair
        graft.operators.Quality.columnDependencies(
          spark.read.parquet(s"$dir/orders.parquet"),
          Seq(("o_orderstatus", "o_orderpriority"),
            ("o_orderstatus", "o_custkey"))).count()
      },
      "quantile_sketch" -> { dir =>
        // GK sketch build is one partial-aggregable pass (KB-sized
        // buffers); the merge row touches only the 20 group sketches
        val per = graft.operators.Sketches.quantileSketches(
          docs(dir), Seq("source"), "n_chars")
        graft.operators.Sketches.quantileEstimates(per, Seq(0.5, 0.95))
          .count() +
          graft.operators.Sketches.mergeQuantileSketches(per).count()
      },
      "psi_drift" -> { dir =>
        // one reference percentile agg + two scan-side bucket counts —
        // corpus-linear, only bucket counts shuffle
        val d = docs(dir)
        graft.operators.Quality.populationStability(
          d.where(col("doc_id") % 2 === 0),
          d.where(col("doc_id") % 2 === 1), "n_chars").count()
      },
      "association_rules" -> { dir =>
        // distinct (basket, item) + within-basket pair join (bounded by
        // per-basket vocab²) — events-linear
        val ev = graft.sources.Tables.loadEvents(spark, dir)
          .withColumn("day", to_date(col("ts")))
        graft.operators.EventAnalytics.associationRules(
          ev, Seq("user_id", "day"), "event_type", minBasketCount = 5)
          .count()
      },
      "kcore" -> { dir =>
        // planted-core peel: ring strips in one sync round at any sf, so
        // round count is constant and each round is edges-linear
        val d = docs(dir).select("doc_id")
        val nDf = d.agg(count(lit(1)).as("n"))
        val b = d.crossJoin(broadcast(nDf))
        val ring = b.select(col("doc_id").as("src"),
          ((col("doc_id") + 1) % col("n")).as("dst"))
        val coreE = b.where(col("doc_id") % 100000000L < 40)
          .select(col("doc_id").as("src"),
            explode(array(lit(2), lit(3), lit(4))).as("j"))
          .select(col("src"), ((col("src") + col("j")) % 40).as("dst"))
        graft.operators.Graphs.kCore(ring.unionByName(coreE), k = 5).count()
      },
      "topk_per_group" -> { dir =>
        // k-bounded partial aggregate: ≤ k entries per group per map task
        // cross the wire — corpus-linear scan, constant exchange
        graft.operators.Analytics.topKPerGroup(docs(dir), Seq("source"),
          "n_chars", "doc_id", k = 3).count()
      },
      "index_search" -> { dir =>
        // index build (two compact shuffles) + query-term-only search
        val d = docs(dir)
        val idx = graft.operators.Retrieval.invertedIndex(
          d, "doc_id", "text", bandSize = 1024)
        graft.operators.Retrieval.searchIndex(idx,
          graft.operators.Retrieval.docLengths(d, "doc_id", "text"),
          Seq("spark", "join", "window"), topK = 10).count()
      },
      "categorical_drift" -> { dir =>
        // two category-count aggregates + an outer join on categories —
        // corpus-linear scans, category-sized everything else
        val d = docs(dir)
        graft.operators.Quality.categoricalDrift(
          d.where(col("doc_id") % 2 === 0),
          d.where(col("doc_id") % 2 === 1), "lang").count()
      },
      "neyman_allocation" -> { dir =>
        // one (count, stddev) partial-agg pass per stratum
        graft.operators.Splits.neymanAllocation(docs(dir), Seq("source"),
          "n_chars", totalBudget = 1000).count()
      },
      "margin_mining" -> { dir =>
        // src pinned to the BASE replica (the anchor is all-pairs by
        // design — growing both sides would measure its intended
        // quadratic, not operator health); tgt grows with the data, so
        // this sweeps the fixed-queries-growing-corpus shape
        val e = emb(dir)
        graft.operators.Similarity.marginMining(
          e.where(col("vec_id") % 2 === 0 && col("vec_id") < 100000000L),
          e.where(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4, threshold = 1.0,
          maxRows = 40000).count()
      },
      "readability" -> { dir =>
        // pure scan-side string expressions — no shuffle
        graft.operators.Quality.readability(docs(dir), "doc_id", "text")
          .count()
      },
      "zipf_fit" -> { dir =>
        // one token-count agg + a topN-bounded rank window + one
        // regression aggregate over ≤ topN rows
        graft.operators.Quality.zipfFit(docs(dir), "text", topN = 1000)
          .count()
      },
      "compress_ratio" -> { dir =>
        // native deflate per row, scan-side — linear in corpus bytes
        docs(dir).select(graft.functions.expressions
          .CompressionExpressions.compressionRatio(col("text")).as("r"))
          .where(col("r").isNotNull).count()
      },
      "ranking_metrics" -> { dir =>
        // per-query (source-partitioned) rank window + ONE groupBy —
        // group count fixed, per-group sort grows linearly
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
        graft.operators.Stats.rankingMetrics(
          docs(dir).select(col("source"), col("doc_id"), col("n_chars"))
            .withColumn("rank", row_number().over(w))
            .withColumn("rel", (col("doc_id") % 7 === 0).cast("int")),
          "source", "rank", "rel", k = 10).count()
      },
      "calibration" -> { dir =>
        // scan-side binning + a 10-group aggregate + broadcast total
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
        graft.operators.Stats.calibrationBins(
          li.select((((col("l_orderkey") * 7 + col("l_linenumber")) % 100)
            / lit(100.0)).as("score"),
            (col("l_quantity") > 25).cast("int").as("label")),
          "score", "label", bins = 10).count()
      },
      "mann_whitney" -> { dir =>
        // distinct-value collapse (50 quantities) then a 50-row window
        graft.operators.Stats.mannWhitney(
          spark.read.parquet(s"$dir/lineitem.parquet"),
          "l_quantity", "l_linestatus", "O", "F").count()
      },
      "nearest_join" -> { dir =>
        // union + one key shuffle + one sorted window pass (both carries)
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        val l = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val r = ev.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("vid"))
        graft.operators.Joins.nearestJoin(l, r, "user_id", "ts", "ts",
          Seq("vid"), toleranceSec = Some(7200L)).count()
      },
      "asof_join" -> { dir =>
        // union + ONE range shuffle + sorted carry; user_id is replica-
        // shifted so the key count scales with rows — the per-key
        // boundary-summary table must scale with it, linearly
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        val l = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val r = ev.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("vid"))
        Joins.asOfJoin(l, r, "user_id", "ts", "ts", Seq("vid")).count()
      },
      "asof_forward" -> { dir =>
        // the FOLLOWING-frame carry direction of the same single-shuffle
        // shape — rewritten twice in r12/r13, anchored here
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        val l = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val r = ev.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("vid"))
        Joins.asOfJoinForward(l, r, "user_id", "ts", "ts", Seq("vid"))
          .count()
      },
      "asof_tolerance" -> { dir =>
        // the µs-exact tolerance is a post-carry FILTER on the same plan;
        // it must not change the exponent
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        val l = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val r = ev.where(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id").as("vid"))
        Joins.asOfJoin(l, r, "user_id", "ts", "ts", Seq("vid"),
          toleranceSec = Some(3600L)).count()
      },
      "asof_manykey" -> { dir =>
        // keys ≈ rows (event_id is unique): the per-(partition, key)
        // boundary summary is DATA-sized — the resample_ffill_manykey
        // pattern applied to the as-of carry; right rows sit 60 s before
        // their left twin so every key matches
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        val l = ev.select(col("event_id"),
          unix_timestamp(col("ts")).as("lts"))
        val r = ev.select(col("event_id"),
          (unix_timestamp(col("ts")) - 60L).as("rts"), col("value"))
        Joins.asOfJoin(l, r, "event_id", "lts", "rts", Seq("value"))
          .count()
      },
      "snapshot_diff" -> { dir =>
        // ONE null-safe full-outer shuffle on a row-scale key (doc_id);
        // scan-side compare projections, no window, no second pass
        val d = docs(dir)
        val before = d.where(col("doc_id") % 10 =!= 0)
        val after = d.where(col("doc_id") % 7 =!= 0)
          .withColumn("lang", when(col("doc_id") % 5 === 0, lit("xx"))
            .otherwise(col("lang")))
        graft.operators.Analytics.snapshotDiff(before, after,
          Seq("doc_id"), Seq("lang", "n_chars")).count()
      },
      "proportion_ci" -> { dir =>
        // one partial-aggregable aggregate; the group key is doc_id/32 so
        // group COUNT scales with rows (never a bounded-domain freebie)
        graft.operators.Stats.proportionCI(
          docs(dir).withColumn("g", floor(col("doc_id") / 32)),
          Seq("g"), col("n_chars") > 200).count()
      },
      "log_rank" -> { dir =>
        // kaplanMeier's shape with per-group columns: per-duration
        // aggregate + ONE Ranks.running pass + a scalar rollup; duration
        // grain is row-derived so the distinct-duration table scales
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.Stats.logRank(
          ev.select((col("event_id") % 100000).cast("double").as("d"),
            (col("event_id") % 7 =!= 0).cast("int").as("ev"),
            when(col("user_id") % 2 === 0, "even").otherwise("odd")
              .as("grp")),
          "d", "ev", "grp", "even", "odd").count()
      },
      "propensity_match" -> { dir =>
        // nearestJoin on the score axis: union + one stratum shuffle +
        // one sorted carry — NO treated×control pair join; strata ≈ 16
        // so each holds a data-scale slice (the adversarial direction)
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        val units = ev.select(col("value").as("y"),
          (pmod(col("event_id") * 48271, lit(999983)).cast("double") /
            999983.0).as("score"),
          (pmod(col("event_id") * 16807, lit(97)) < 30).as("tr"),
          pmod(col("event_id"), lit(16)).as("stratum"))
        graft.operators.Stats.propensityMatch(units, col("tr"), "score",
          "y", "stratum", caliper = 0.01).count()
      },
      "vocab_coverage" -> { dir =>
        // two partial-aggregable passes over a heaps-law token table —
        // the frequency-of-frequencies rollup runs over (group, token)
        // counts, never re-reading rows
        graft.operators.Quality.vocabCoverage(docs(dir), "text",
          Seq("source")).count()
      },
      "adamic_adar" -> { dir =>
        // broker self-join is deg(w)²-bounded by the cap; the synthetic
        // ring graph has constant degree so candidate volume scales with
        // edges — the anti-join and TakeOrdered stay linear
        val d = docs(dir).select("doc_id")
        val nDf = d.agg(count(lit(1)).as("n"))
        val base = d.crossJoin(broadcast(nDf))
        val edges = base.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % col("n")).as("dst"))
          .union(base.where(col("doc_id") % 2 === 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") + 7) % col("n")).as("dst")))
        graft.operators.Graphs.adamicAdar(edges, maxBrokerDegree = 1000,
          topK = 100).count()
      },
      "diff_in_diff" -> { dir =>
        // ONE conditional-moment aggregate — the cuped shape
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.EventAnalytics.diffInDiff(ev,
          col("user_id") % 2 === 0, col("event_id") % 2 === 0, "value")
          .count()
      },
      "hits" -> { dir =>
        // per round: one edge⋈score join + partial-agg sums + a one-row
        // normalizer broadcast; constant-degree ring graph so edge count
        // scales with docs
        val d = docs(dir).select("doc_id")
        val nDf = d.agg(count(lit(1)).as("n"))
        val base = d.crossJoin(broadcast(nDf))
        val edges = base.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % col("n")).as("dst"))
          .union(base.where(col("doc_id") % 2 === 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") + 7) % col("n")).as("dst")))
        graft.operators.Graphs.hits(edges, iterations = 5).count()
      },
      "personalized_pagerank" -> { dir =>
        // pageRank's per-round shape + a weight normalizer; restart set
        // scales with docs (every 16th), so the seed frame is never a
        // collected constant
        val d = docs(dir).select("doc_id")
        val nDf = d.agg(count(lit(1)).as("n"))
        val base = d.crossJoin(broadcast(nDf))
        val edges = base.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % col("n")).as("dst"),
            (pmod(col("doc_id"), lit(5)) + 1).cast("double").as("w"))
          .union(base.where(col("doc_id") % 2 === 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") + 7) % col("n")).as("dst"),
              lit(2.0).as("w")))
        graft.operators.Graphs.pageRankPersonalized(edges,
          iterations = 5, weightCol = Some("w"),
          restart = Some(d.where(col("doc_id") % 16 === 0)
            .select(col("doc_id").as("node")))).count()
      },
      "mmr" -> { dir =>
        // query count scales with vectors (pools of 20); k lockstep
        // rounds of one join + pool-bounded windows
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val cands = emb.select(
          floor(col("vec_id") / 20).as("q"), col("vec_id").as("id"),
          (pmod(col("vec_id") * 31, lit(97)).cast("double") / 97.0)
            .as("score"),
          col("embedding"))
        graft.operators.Similarity.mmrRerank(cands, "q", "id", "score",
          "embedding", k = 3).count()
      },
      "ipw" -> { dir =>
        // one conditional-weighted-moment scan over per-user rows
        val pu = graft.sources.Tables.loadEvents(spark, dir)
          .groupBy("user_id").agg(count(lit(1)).as("y"))
          .select(col("y"),
            (pmod(col("user_id") * 48271, lit(999983)).cast("double") /
              999983.0).as("score"),
            (pmod(col("user_id") * 16807, lit(97)) < 30).as("tr"))
        graft.operators.Stats.ipwEstimate(pu, col("tr"), "y", "score")
          .count()
      },
      "prf" -> { dir =>
        // bm25 pass + a feedback-doc-bounded explode/aggregate
        graft.operators.Retrieval.pseudoRelevanceExpansion(docs(dir),
          "doc_id", "text", Seq("spark", "join", "window"),
          fbDocs = 5, fbTerms = 10).count()
      },
      "bleu" -> { dir =>
        // maxN token-scale explode/count/join passes over the pair table
        val toks = filter(split(col("text"), " "), t => length(t) > 0)
        val pairs = docs(dir).select(col("doc_id"),
          col("text").as("cand"),
          array_join(slice(toks, lit(1),
            greatest(size(toks) - 2, lit(0))), " ").as("ref"))
        graft.operators.Quality.bleu(pairs, "doc_id", "cand", "ref")
          .count()
      },
      "rouge" -> { dir =>
        // one clipped-overlap pass (explode both sides, one full join)
        val toks = filter(split(col("text"), " "), t => length(t) > 0)
        val pairs = docs(dir).select(col("doc_id"),
          col("text").as("cand"),
          array_join(slice(toks, lit(1),
            greatest(size(toks) - 2, lit(0))), " ").as("ref"))
        graft.operators.Quality.rougeN(pairs, "doc_id", "cand", "ref")
          .count()
      },
      "chrf" -> { dir =>
        // maxN char-scale explode/count/join passes; cleaned strings
        // project before the gram HOF
        val toks = filter(split(col("text"), " "), t => length(t) > 0)
        val pairs = docs(dir).select(col("doc_id"),
          col("text").as("cand"),
          array_join(slice(toks, lit(1),
            greatest(size(toks) - 2, lit(0))), " ").as("ref"))
        graft.operators.Quality.chrF(pairs, "doc_id", "cand", "ref")
          .count()
      },
      "bh_fdr" -> { dir =>
        // two Ranks.running passes over the test-count table
        graft.operators.Stats.bhFdr(
          docs(dir).groupBy(floor(col("doc_id") / 8).as("test"))
            .agg((min(pmod(col("doc_id") * 37, lit(997))).cast("double") /
              996.0).as("p")),
          "test", "p").count()
      },
      "kcenter" -> { dir =>
        // k rounds, each ONE newest-center broadcast folded into a
        // per-row running min — O(n·k) distance evaluations
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        graft.operators.Similarity.kCenterCoreset(
          emb.select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", k = 4).count()
      },
      "facility_location" -> { dir =>
        // pool pinned to the BASE replica (margin_mining's discipline):
        // the pool is caller-bounded by contract and the n² pair frame
        // is its documented cost — growing the pool with the corpus
        // would measure the intended quadratic, not operator health.
        // What this anchors is the fixed-pool round loop staying flat
        // while the surrounding tables (and executor pressure) grow.
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        graft.operators.Similarity.facilityLocationSelect(
          emb.where(col("vec_id") < 100000000L)
            .select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", k = 4).count()
      },
      "dbscan" -> { dir =>
        // neighborhood discovery rides the LSH-bucketed pair path (the
        // corpus-scale contract); the clustering after it is edge-bound
        val pts = emb(dir).select(col("vec_id"), col("embedding"))
        val pairs = graft.operators.Dedup.embeddingNearDupPairs(
          pts, "vec_id", "embedding", dim = 64, threshold = 0.30)
        graft.operators.Similarity.dbscan(pts, "vec_id", pairs,
          minPts = 3).count()
      },
      "textrank" -> { dir =>
        // doc-keyed shuffles only; the sentence self-join is per-doc
        // quadratic bounded by maxSentences, so corpus cost is linear
        // in docs — the exponent guards exactly that
        graft.operators.Quality.textRank(
          docs(dir).select(col("doc_id"),
            regexp_replace(col("text"), " the ", ". The ").as("text")),
          "doc_id", "text", iterations = 5).count()
      },
      "query_likelihood" -> { dir =>
        // one scan (per-term tf from the token array) + one-row cf
        // broadcast + TakeOrdered — shuffle-free by construction
        graft.operators.Retrieval.queryLikelihood(docs(dir), "doc_id",
          "text", Seq("spark", "join", "window"), mu = 300.0,
          topK = 10).count()
      },
      "bpe_compression" -> { dir =>
        // one scan (the merge table rides scan-side in BpeSegment) +
        // one source-sized aggregate with an exact percentile pair
        graft.operators.Analytics.bpeCompressionAudit(docs(dir),
          "source", "text",
          Seq("e" -> "r", "i" -> "n", "t" -> "h", "th" -> "e",
            "o" -> "n", "a" -> "n", "an" -> "d", "er" -> "s")).count()
      },
      "bm25f" -> { dir =>
        // one scan per field, query-term filtered scan-side; (doc,term)
        // combine rows are |query|·matches, never corpus-sized
        val toks = filter(split(col("text"), " "), t => length(t) > 0)
        val flds = docs(dir).select(col("doc_id"),
          array_join(slice(toks, 1, 4), " ").as("title"),
          array_join(slice(toks, lit(5),
            greatest(size(toks) - 4, lit(0))), " ").as("body"))
        graft.operators.Retrieval.bm25f(flds, "doc_id",
          Seq("title" -> 2.0, "body" -> 1.0),
          Seq("spark", "join", "window"), topK = 10).count()
      },
      "alwaysvalid_srm" -> { dir =>
        // one per-bin aggregate + the running pass over hour bins
        graft.operators.EventAnalytics.alwaysValidSrm(
          graft.sources.Tables.loadEvents(spark, dir)
            .withColumn("bin", floor(col("ts").cast("long") / 3600)),
          pmod(col("user_id") * 16807, lit(97)) < 30, col("bin"),
          expectedShareA = 30.0 / 97).count()
      },
      "scaling_law" -> { dir =>
        // point count scales with rows (one per 8-doc bucket); the
        // |grid|-conditional moment scan is the cost
        val pts = docs(dir)
          .groupBy(floor(col("doc_id") / 8).as("g"))
          .agg(count(lit(1)).as("k"))
          .select((col("g") + 1).as("n"),
            (lit(2.0) + lit(10.0) *
              pow((col("g") + 1).cast("double"), lit(-0.3))).as("loss"))
        graft.operators.Quality.scalingLawFit(pts, "n", "loss").count()
      },
      "modularity" -> { dir =>
        // two label joins + community aggregates over a constant-degree
        // ring graph; communities scale with nodes (64-doc blocks)
        val d = docs(dir).select("doc_id")
        val nDf = d.agg(count(lit(1)).as("n"))
        val base = d.crossJoin(broadcast(nDf))
        val edges = base.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % col("n")).as("dst"))
          .union(base.where(col("doc_id") % 2 === 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") + 7) % col("n")).as("dst")))
        graft.operators.Graphs.modularity(edges,
          d.select(col("doc_id").as("node"),
            floor(col("doc_id") / 64).as("community"))).count()
      },
      "assortativity" -> { dir =>
        // degree table + two edge joins + one moment scan
        val d = docs(dir).select("doc_id")
        val nDf = d.agg(count(lit(1)).as("n"))
        val base = d.crossJoin(broadcast(nDf))
        val edges = base.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % col("n")).as("dst"))
          .union(base.where(col("doc_id") % 2 === 0)
            .select(col("doc_id").as("src"),
              ((col("doc_id") + 7) % col("n")).as("dst")))
        graft.operators.Graphs.degreeAssortativity(edges).count()
      },
      "reciprocity" -> { dir =>
        // one distinct + one semi-join on the flipped key over |E|
        val d = docs(dir).select("doc_id")
        val nDf = d.agg(count(lit(1)).as("n"))
        val base = d.crossJoin(broadcast(nDf))
        val edges = base.select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % col("n")).as("dst"))
          .union(base.where(col("doc_id") % 2 === 0)
            .select(((col("doc_id") + 1) % col("n")).as("src"),
              col("doc_id").as("dst")))
        graft.operators.Graphs.reciprocity(edges).count()
      },
      "ratio_metric" -> { dir =>
        // one per-user aggregate + the one-row conditional-moment scan
        val pu = graft.sources.Tables.loadEvents(spark, dir)
          .groupBy("user_id")
          .agg(sum(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)).as("y"),
            count(lit(1)).as("x"))
        graft.operators.Stats.ratioMetricDelta(pu,
          pmod(col("user_id") * 16807, lit(97)) < 30, "y", "x").count()
      },
      "mde_curve" -> { dir =>
        // one moment scan joined onto a literal horizons frame
        val pu = graft.sources.Tables.loadEvents(spark, dir)
          .groupBy("user_id")
          .agg(count(lit(1)).as("y"),
            floor(min(col("ts").cast("long")) / 86400).as("bin"))
        graft.operators.Stats.mdeCurve(pu, col("bin"), "y",
          Seq(1, 2, 4, 8, 16)).count()
      },
      "alwaysvalid_cuped" -> { dir =>
        // one per-user aggregate → bin-count moments → running pass
        val pu = graft.sources.Tables.loadEvents(spark, dir)
          .groupBy("user_id")
          .agg(sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L))
              .as("x"),
            sum(when(col("event_id") % 2 =!= 0, 1L).otherwise(0L))
              .as("y"),
            floor(min(col("ts").cast("long")) / 86400).as("bin"))
        graft.operators.EventAnalytics.alwaysValidCuped(pu,
          pmod(col("user_id") * 16807, lit(97)) < 30, col("bin"),
          "y", "x").count()
      },
      "mcnemar_strat" -> { dir =>
        // stratum count scales with rows (≈ rows/32 strata): per-stratum
        // cells + the one-row rollup broadcast
        graft.operators.Stats.mcnemarStratified(
          docs(dir).withColumn("g", floor(col("doc_id") / 32)),
          col("doc_id") % 7 =!= 0, col("doc_id") % 5 =!= 0,
          Seq("g")).count()
      },
      "nelson_aalen" -> { dir =>
        // kaplanMeier's two Ranks.running passes with the hazard sums;
        // row-derived durations so the distinct-duration table scales
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.Stats.nelsonAalen(
          ev.select((col("event_id") % 100000).cast("double").as("d"),
            (col("event_id") % 7 =!= 0).cast("int").as("ev")),
          "d", "ev").count()
      },
      "cohort_ltv" -> { dir =>
        // per-user first-event aggregate + per-(cohort, offset) cells;
        // the running-sum window holds at most the timeline's week count
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.EventAnalytics.cohortLtv(
          ev.withColumn("ep", unix_timestamp(col("ts"))),
          "user_id", "ep", "value").count()
      },
      "rfm" -> { dir =>
        // one per-user rollup + three percentile-broadcast bucketers —
        // never an ntile global-sort window; users scale with rows
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.EventAnalytics.rfm(
          ev.withColumn("ep", unix_timestamp(col("ts"))),
          "event_id", "ep", "value").count()
      },
      "bradley_terry" -> { dir =>
        // items ≈ rows/10: the game table and every MM round's join must
        // scale with the comparison log, never quadratically in items
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        val prefs = ev.select((col("event_id") % 100000).as("a"),
            pmod(col("event_id") * 31 + 7, lit(100000)).as("b"),
            col("event_id"))
          .where(col("a") =!= col("b"))
          .select(when(col("event_id") % 3 === 0,
              least(col("a"), col("b")))
              .otherwise(greatest(col("a"), col("b"))).as("w"),
            when(col("event_id") % 3 === 0, greatest(col("a"), col("b")))
              .otherwise(least(col("a"), col("b"))).as("l"))
        graft.operators.Preferences.bradleyTerry(prefs, "w", "l",
          iterations = 5).count()
      },
      "krippendorff" -> { dir =>
        // items ≈ rows, 3 ratings each: both rollups run over the
        // (item, label) count table — the Σm² coincidence matrix never
        // materializes
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        val base = ev.select(col("event_id").as("item"),
          col("event_type").as("label"))
        val ratings = base
          .union(base.select(col("item"),
            when(col("item") % 7 === 0, lit("zz"))
              .otherwise(col("label")).as("label")))
          .union(base.select(col("item"),
            when(col("item") % 13 === 0, lit("yy"))
              .otherwise(col("label")).as("label")))
        graft.operators.Stats.krippendorffAlpha(ratings, "item", "label")
          .count()
      },
      "dawid_skene" -> { dir =>
        // items ≈ rows/3, C bounded: E-step expands ratings × C through
        // one broadcast spine; M-step tables are rater × C² — never
        // item-scale joins beyond (item)-keyed aggregates
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        val base = ev.select(col("event_id").as("item"),
          col("event_type").as("label"))
        val ratings = base.withColumn("rater", lit(1))
          .union(base.select(col("item"),
            when(col("item") % 7 === 0, lit("zz"))
              .otherwise(col("label")).as("label")).withColumn("rater", lit(2)))
          .union(base.select(col("item"),
            when(col("item") % 13 === 0, lit("yy"))
              .otherwise(col("label")).as("label")).withColumn("rater", lit(3)))
        graft.operators.Stats.dawidSkene(ratings, "item", "rater",
          "label", iterations = 2).count()
      },
      "always_valid" -> { dir =>
        // bins ≈ rows/30 (minute grain): per-bin aggregate + one
        // Ranks.running pass + closed-form projections
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.EventAnalytics.alwaysValidMonitor(ev,
          col("user_id") % 2 === 0, "ts",
          col("event_type") === "purchase", binSeconds = 60L).count()
      },
      "eb_shrink" -> { dir =>
        // groups ≈ rows/10: one per-group aggregate + a G-row rollup
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.Stats.ebShrinkMeans(
          ev.select(pmod(col("event_id"), lit(100000)).as("g"),
            col("value")),
          Seq("g"), "value").count()
      },
      "mcnemar" -> { dir =>
        // one conditional-cell aggregate
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.Stats.mcnemar(ev,
          col("event_id") % 7 =!= 0, col("event_id") % 5 =!= 0).count()
      },
      "uplift_deciles" -> { dir =>
        // percentile broadcast + per-bucket aggregate + a ≤10-row window
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        val units = ev.select(col("value").as("y"),
          (pmod(col("event_id") * 48271, lit(999983)).cast("double") /
            999983.0).as("score"),
          (pmod(col("event_id") * 16807, lit(97)) < 30).as("tr"))
        graft.operators.Stats.upliftDeciles(units, col("tr"), "score",
          "y").count()
      },
      "permutation_test" -> { dir =>
        // one scan carrying 2k conditional sums — no explode; cost is
        // k md5 calls per row, linear in rows by construction
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.Stats.permutationTest(ev, "event_id", "value",
          col("user_id") % 2 === 0, k = 64).count()
      },
      "dedupe_paragraphs" -> { dir =>
        // pure scan-side HOF transform — no shuffle at any scale
        graft.operators.Quality.dedupeParagraphs(
          docs(dir).withColumn("body",
            concat_ws("\n", col("text"), lit("f"), col("text"))),
          "body").agg(sum("n_dropped")).count()
      },
      "capture_recapture" -> { dir =>
        // one conditional-cell aggregate, scalar closed forms after
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.Stats.captureRecapture(ev,
          col("event_id") % 3 === 0,
          (col("event_id") * 7 + 1) % 5 < 2).count()
      },
      "best_threshold" -> { dir =>
        // prCurve's collapse + running pass + TakeOrdered argmin
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.Stats.bestThreshold(
          ev.select((pmod(col("event_id") * 13, lit(100000))
              .cast("double") / 100000.0).as("s"),
            (col("event_id") % 4 === 0).cast("int").as("y")),
          "s", "y", costFp = 1.0, costFn = 5.0).count()
      },
      "dp_noisy_mean" -> { dir =>
        // one clipped group aggregate + per-group scalar noise
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.Stats.dpNoisyMean(
          ev.select(pmod(col("event_id"), lit(100000)).as("g"),
            col("value")),
          Seq("g"), "value", lo = 0.0, hi = 100.0, epsilon = 1.0)
          .count()
      },
      "heaps_law" -> { dir =>
        // heaps-law token table shuffles once (per-token min bucket);
        // windows and the regression span ≤ numBuckets rows
        graft.operators.Quality.heapsLawFit(docs(dir), "text", "doc_id")
          .count()
      },
      "temperature_scaling" -> { dir =>
        // one scan with |grid| conditional NLL sums
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.Stats.temperatureScaling(
          ev.select((col("event_id") % 3 === 0).cast("int").as("y"),
            (pmod(col("event_id") * 17, lit(1000)).cast("double") /
              1000.0).as("p")),
          "p", "y").count()
      },
      "apportion_budget" -> { dir =>
        // groups ≈ rows/32: mass rollup + the Ranks.running remainder
        // rank must both scale with group count — the million-cell
        // mixture shape, no single-task sort of the group frame
        graft.operators.Splits.apportionBudget(
          docs(dir).withColumn("g", floor(col("doc_id") / 32)),
          Seq("g"), col("n_chars"), budget = 1000000000L).count()
      },
      "domain_reweight" -> { dir =>
        // per-domain aggregate with domain count scaling with rows
        graft.operators.Quality.domainReweight(
          docs(dir).withColumn("g", floor(col("doc_id") / 32)),
          "g", col("n_chars") / 100.0, col("n_chars")).count()
      },
      "adjusted_rand" -> { dir =>
        // the GUARD-relevant knob: contingency cells grow with rows
        // (≈ rows/32 clusterings × 7 classes — ~130k cells at ×10,
        // inside maxCells), so this times the guarded cell-table path,
        // not a fixed-size grid
        graft.operators.Stats.adjustedRand(
          docs(dir).select(
            floor(col("doc_id") / 32).cast("string").as("a"),
            pmod(col("doc_id"), lit(7)).cast("string").as("b")),
          "a", "b").count()
      },
      "rbo" -> { dir =>
        // group count scales with rows; depth bounds each group's
        // overlap frame (the operator's per-group scale contract)
        val ranked = docs(dir)
          .withColumn("g", floor(col("doc_id") / 256))
          .withColumn("r", (pmod(col("doc_id"), lit(256)) + 1).cast("int"))
        graft.operators.Retrieval.rankBiasedOverlap(
          ranked.select(col("g"), col("doc_id").as("id"), col("r")),
          ranked.select(col("g"), col("doc_id").as("id"),
            (lit(257) - col("r")).cast("int").as("r")),
          "id", "r", depth = 50, groupCols = Seq("g")).count()
      },
      "pii_scan" -> { dir =>
        // regexp families + Luhn HOF, all scan-side
        graft.operators.Quality.piiScan(docs(dir), "doc_id", "text")
          .count()
      },
      "chat_stats" -> { dir =>
        // pure scan-side HOF work over a from_json parse — linearity is
        // the absence of any shuffle at all
        val d = docs(dir)
        val toks = filter(split(col("text"), " "), tk => length(tk) > 0)
        def seg(a: Int) = array_join(slice(toks, a, 8), " ")
        def turn(r: String, c: org.apache.spark.sql.Column) =
          struct(lit(r).as("role"), c.as("content"))
        val conv = d.select(col("doc_id"), to_json(array(
          turn("user", seg(1)), turn("assistant", seg(9)),
          turn("user", seg(17)), turn("assistant", seg(25)))).as("conv"))
        graft.operators.Chats.conversationStats(conv, "doc_id", "conv")
          .count()
      },
      "repeated_spans" -> { dir =>
        // window hashes scan-side, ONE compact-key shuffle on (hash,
        // doc, start), positions explode ∝ duplication mass only
        graft.operators.Dedup.repeatedSpans(docs(dir), "doc_id", "text",
          windowTokens = 20).count()
      },
      "rank_tests_unique_values" -> { dir =>
        // the old bounded-domain contract's forbidden shape: a value
        // column UNIQUE per row (distinct ≈ N), where the pre-r11
        // unpartitioned windows would single-task-sort the corpus.
        // Ranks.running must keep this linear: mannWhitney (2 sums) +
        // liftGain (desc sums + closed-form decile emit) back to back.
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
          .select((col("l_orderkey") * 100 + col("l_linenumber") +
            col("l_extendedprice") / lit(1e9)).as("v"),
            col("l_linestatus"),
            (col("l_quantity") > 25).cast("int").as("label"))
        graft.operators.Stats.mannWhitney(
          li, "v", "l_linestatus", "O", "F").count()
        graft.operators.Stats.liftGain(li, "v", "label").count()
      },
      "chi_square" -> { dir =>
        // contingency counts + category-sized margins
        graft.operators.Stats.chiSquareIndependence(
          spark.read.parquet(s"$dir/events.parquet")
            .withColumn("cohort", col("user_id") % 3),
          "event_type", "cohort").count()
      },
      "acf" -> { dir =>
        // bin-grid collapse (span-bounded) + 5 bin-table self-joins
        graft.operators.Timeseries.autocorrelation(
          graft.sources.Tables.loadEvents(spark, dir), "ts", "value",
          stepSeconds = 3600, maxLag = 5).count()
      },
      "naive_bayes" -> { dir =>
        // three aggregate passes to train + token-keyed scoring join
        val d = docs(dir)
        val (model, priors) = graft.operators.Classify
          .trainNaiveBayes(d, "text", "lang")
        graft.operators.Classify.scoreNaiveBayes(
          d.where(col("doc_id") % 10 === 0), "doc_id", "text",
          model, priors).count()
      },
      "kmeans" -> { dir =>
        // 2 Lloyd rounds: each ONE aggregate over points vs k broadcast
        // centroids; only k rows reach the driver per round
        graft.operators.Classify.kMeansFixed(
          spark.read.parquet(s"$dir/customer.parquet")
            .select(col("c_custkey"), col("c_acctbal"),
              col("c_nationkey").cast("double").as("c_nat")),
          "c_custkey", Seq("c_acctbal", "c_nat"), k = 3,
          iterations = 2)._1.count()
      },
      "ols_fit" -> { dir =>
        // one moment-aggregate pass; the solve is a driver-side 2×2
        val (n, _, _, _) = graft.operators.Classify.olsFit(
          spark.read.parquet(s"$dir/lineitem.parquet"),
          "l_extendedprice", Seq("l_quantity", "l_discount"))
        n
      },
      "target_encode" -> { dir =>
        // category aggregate + join back on the category key
        graft.operators.Classify.targetEncodeLoo(
          spark.read.parquet(s"$dir/orders.parquet"),
          "o_orderpriority", "o_totalprice", m = 10.0).count()
      },
      "benford" -> { dir =>
        // scan-side digit projection + a 9-group aggregate
        graft.operators.Quality.benford(
          spark.read.parquet(s"$dir/lineitem.parquet"),
          "l_extendedprice").count()
      },
      "bfs" -> { dir =>
        // 4 rounds × one edge-vs-frontier join — linear in |E| per round
        val d = docs(dir).select("doc_id")
        val nDf = d.agg(count(lit(1)).as("n"))
        val ring = d.crossJoin(broadcast(nDf))
          .select(col("doc_id").as("src"),
            ((col("doc_id") + 1) % col("n")).as("dst"))
        graft.operators.Graphs.bfsDistances(ring,
          d.where(col("doc_id") < 3).select(col("doc_id").as("node")),
          maxHops = 4).count()
      },
      "ewma" -> { dir =>
        // keyed window, ≤11-element frame array per row — O(L) scan-side
        graft.operators.Timeseries.ewmaSmooth(
          graft.sources.Tables.loadEvents(spark, dir), "user_id",
          Seq("ts", "event_id"), "value", alpha = 0.3,
          lookback = 10).count()
      },
      "kappa_kanon" -> { dir =>
        // two marginal aggregates + a class-count rollup, both bounded
        val d = docs(dir)
        graft.operators.Stats.cohenKappa(
          d.withColumn("lang2", when(col("doc_id") % 7 === 0, "en")
            .otherwise(col("lang"))), "lang", "lang2").count() +
          graft.operators.Stats.kAnonymity(
            spark.read.parquet(s"$dir/customer.parquet"),
            Seq("c_nationkey", "c_mktsegment"), k = 5).count()
      },
      "gini_mahalanobis" -> { dir =>
        // head-bounded rank window + one moment pass / scan-side quad form
        graft.operators.Quality.giniConcentration(docs(dir), "text",
          topN = 1000).count() +
          graft.operators.Stats.mahalanobis(
            spark.read.parquet(s"$dir/customer.parquet")
              .select(col("c_custkey"), col("c_acctbal"),
                col("c_nationkey").cast("double").as("c_nat")),
            Seq("c_acctbal", "c_nat")).count()
      },
      "delta_join" -> { dir =>
        // three delta-term joins; deltas broadcast when small
        val o = spark.read.parquet(s"$dir/orders.parquet")
        val c = spark.read.parquet(s"$dir/customer.parquet")
        graft.operators.Incremental.deltaJoin(
          o.where(col("o_orderkey") % 10 < 9)
            .select(col("o_custkey").as("k")),
          o.where(col("o_orderkey") % 10 === 9)
            .select(col("o_custkey").as("k")),
          c.where(col("c_custkey") % 7 < 6)
            .select(col("c_custkey").as("k"), col("c_mktsegment")),
          c.where(col("c_custkey") % 7 === 6)
            .select(col("c_custkey").as("k"), col("c_mktsegment")),
          Seq("k")).count()
      },
      "quantize_int8" -> { dir =>
        // posexplode extents (d groups) + scan-side literal transform
        graft.operators.EmbeddingStats.quantizeInt8(
          emb(dir), "vec_id", "embedding")._1.count()
      },
      "image_near_dup" -> { dir =>
        // real PNG decode + dHash per row, 4-block banded pair join
        val d = docs(dir).where(col("doc_id") % 50 === 0)
        graft.operators.Multimodal.nearDupImages(
          graft.operators.Multimodal.textToPng(d, "doc_id", "text").toDF(),
          maxHamming = 3).count()
      },
      "oov_trimmed_mmd" -> { dir =>
        // vocab join + percentile-cut conditional mean + blocked MMD
        val d = docs(dir)
        val vocab = d.where(col("doc_id") % 2 === 0)
          .select(explode(filter(split(col("text"), " "),
            tk => length(tk) > 0)).as("token"))
          .groupBy("token").agg(count(lit(1)).as("__n"))
          .orderBy(col("__n").desc, col("token")).limit(500).select("token")
        graft.operators.Quality.oovRate(d.where(col("doc_id") % 2 === 1),
          "doc_id", "text", vocab).count() +
          graft.operators.Analytics.trimmedMean(
            spark.read.parquet(s"$dir/lineitem.parquet"),
            "l_returnflag", "l_extendedprice").count() +
          graft.operators.EmbeddingStats.mmdLinear(
            emb(dir).where(col("vec_id") % 2 === 0),
            emb(dir).where(col("vec_id") % 2 === 1),
            "vec_id", "embedding", gamma = 0.02, blockWidth = 8).count()
      },
      "geo_pairs" -> { dir =>
        // grid-cell candidate join: pairs scale with local density ×
        // points, never points²
        // lon wraps at 720k keys so the replica key shift (+1e8 per
        // replica) still yields valid longitudes; identical to the gate
        // derivation for every real sf key range
        val pts = spark.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey").as("id"),
            (col("c_custkey") % 1000 * 0.01).as("lat"),
            (floor((col("c_custkey") % 720000) / 1000.0) * 0.5).as("lon"))
        graft.functions.Geo.neighborPairs(pts, "id", "lat", "lon",
          maxKm = 5.0).count()
      },
      "cms_bootstrap_profile" -> { dir =>
        // two sketch aggregates + B·N bootstrap partials + one profile agg
        val (est, _, _) = graft.operators.Sketches.cmsJoinSizeEstimate(
          spark.read.parquet(s"$dir/orders.parquet"), "o_orderkey",
          spark.read.parquet(s"$dir/lineitem.parquet"), "l_orderkey")
        graft.operators.Stats.bootstrapMeanCI(
          graft.sources.Tables.loadEvents(spark, dir), "event_id",
          "value", replicates = 100).count() +
          graft.operators.Quality.profile(
            spark.read.parquet(s"$dir/customer.parquet"),
            Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
            .count() + (est & 0L)
      },
      "rank_tests" -> { dir =>
        // KS + Welch + lift/gain: value-domain collapses, bounded-domain
        // windows, one-row outputs — the whole two-sample family
        val ev = graft.sources.Tables.loadEvents(spark, dir)
          .withColumn("v", floor(col("value")))
        graft.operators.Stats.ksTest(ev, "v", "event_type",
          "purchase", "view").count() +
          graft.operators.Stats.welchT(ev, "value", "event_type",
            "purchase", "view").count() +
          graft.operators.Stats.liftGain(
            spark.read.parquet(s"$dir/lineitem.parquet")
              .withColumn("score",
                ((col("l_orderkey") * 7 + col("l_linenumber")) % 100) / 100.0)
              .withColumn("label", (col("l_quantity") > 25).cast("int")),
            "score", "label").count()
      },
      "kendall_tau" -> { dir =>
        // contingency self-join: domain² cell pairs regardless of rows
        graft.operators.Stats.kendallTau(
          spark.read.parquet(s"$dir/lineitem.parquet"),
          "l_quantity", "l_discount").count()
      },
      "url_curation" -> { dir =>
        // codegen regexp chain + domain grouping + md5 cap windows
        val d = col("doc_id")
        val messy = concat(lit("HTTPS://WWW."), col("source"),
          when(d % 3 === 0, lit(".Example.COM:443"))
            .when(d % 3 === 1, lit(".sample.CO.UK:443"))
            .otherwise(lit(".test.ORG")),
          lit("/Docs/"), d.cast("string"),
          when(d % 4 === 0, lit("/?utm_source=feed"))
            .when(d % 4 === 1, lit("?id=1&utm_campaign=x"))
            .when(d % 4 === 2, lit("/")).otherwise(lit("?a=1&b=2")))
        val canon = docs(dir)
          .withColumn("url", graft.functions.Urls.canonicalize(messy))
          .withColumn("domain", graft.functions.Urls.registeredDomain(
            graft.functions.Urls.host(messy)))
        graft.operators.Splits.balancedDownsample(
          canon, Seq("domain"), 60L, "doc_id").count() +
          canon.where(length(col("url")) > 0).count()
      },
      "top_paths" -> { dir =>
        // one user-keyed window + two-level path aggregate
        graft.operators.EventAnalytics.topPaths(
          graft.sources.Tables.loadEvents(spark, dir),
          "user_id", "ts", "event_id", "event_type",
          steps = 3, topK = 20).count()
      },
      "random_projection" -> { dir =>
        // pure scan-side HOF dot products — no shuffle at all
        graft.operators.EmbeddingStats.signedRandomProjection(
          emb(dir), "embedding", inDim = 64, outDim = 16).count()
      },
      "kneser_ney" -> { dir =>
        // vocabulary-sized n-gram + fertility joins, distinct-bigram scoring
        val d = docs(dir)
        graft.operators.Quality.kneserNeyLogProb(d,
          d.where(col("source")
            .isin("src0", "src1", "src2", "src3", "src4")),
          "doc_id", "text").count()
      },
      "quantile_norm" -> { dir =>
        // per-group + global value-domain ECDFs, inverse-CDF join
        graft.operators.Analytics.quantileNormalize(
          graft.sources.Tables.loadEvents(spark, dir)
            .withColumn("v", floor(col("value"))), "event_type", "v")
          .count()
      },
      "mutual_knn_filter" -> { dir =>
        // the operator is a POST-filter: cost is the neighbor-table join,
        // linear in N·k — build a synthetic N·k neighbor table scan-side
        // (the search itself is swept under ann_* / bounded gate anchors)
        val nb = emb(dir).select(col("vec_id").as("query_id"))
          .select(col("query_id"),
            explode(sequence(lit(1), lit(5))).as("rank"))
          .withColumn("nbr_id",
            col("query_id") + when(col("query_id") % 2 === 0,
              col("rank")).otherwise(-col("rank")))
          .withColumn("cos", lit(0.9) - col("rank") * 0.01)
        graft.operators.Similarity.mutualKnn(nb).count()
      },
      "dp_cuped" -> { dir =>
        // two cheap aggregate shapes: noisy group counts + raw moments
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        graft.operators.Stats.dpNoisyCounts(ev, Seq("event_type"),
          epsilon = 1.0).count() +
          graft.operators.EventAnalytics.cuped(
            ev.groupBy("user_id").agg(
              sum(when(col("event_id") % 2 === 0, col("value"))
                .otherwise(0.0)).as("x"),
              sum(when(col("event_id") % 2 === 1, col("value"))
                .otherwise(0.0)).as("y")),
            col("user_id") % 2, "x", "y").count()
      },
      "theil_sen" -> { dir =>
        // bounded daily bins per key → bin-pair slopes → exact medians
        graft.operators.Timeseries.theilSenTrend(
          graft.sources.Tables.loadEvents(spark, dir),
          "event_type", "ts", "value", binSeconds = 86400L).count()
      },
      "conformal_brier" -> { dir =>
        // value-domain rank quantile + one binned aggregate
        val ev = graft.sources.Tables.loadEvents(spark, dir)
        val means = ev.groupBy("event_type")
          .agg(((min("value") + max("value")) / 2).as("pred"))
        graft.operators.Stats.conformalInterval(
          ev.join(broadcast(means), "event_type"), "pred", "value",
          col("event_id") % 2 === 0, alpha = 0.1).count() +
          graft.operators.Stats.brierDecomposition(
            spark.read.parquet(s"$dir/lineitem.parquet")
              .withColumn("score",
                ((col("l_orderkey") * 7 + col("l_linenumber")) % 100) /
                  100.0)
              .withColumn("label", (col("l_quantity") > 25).cast("int")),
            "score", "label").count()
      },
      "seasonal_backtest" -> { dir =>
        // bounded bin grid: bin agg + bin-keyed season join + fold agg
        graft.operators.Timeseries.backtestSeasonalNaive(
          graft.sources.Tables.loadEvents(spark, dir),
          "event_type", "ts", "value", 3600L, 24, 3).count()
      },
      "interval_overlap" -> { dir =>
        // grid-binned equi-join, user-scoped cells
        val iv = graft.sources.Tables.loadEvents(spark, dir)
          .withColumn("__s", unix_timestamp(col("ts")))
          .withColumn("__e",
            col("__s") + 60L + floor(col("value") * 10).cast("long"))
        graft.operators.Joins.intervalOverlapJoin(
          iv.select(col("user_id"), col("event_id").as("a_id"),
            col("__s").as("a_s"), col("__e").as("a_e")),
          iv.select(col("user_id"), col("event_id").as("b_id"),
            col("__s").as("b_s"), col("__e").as("b_e")),
          "a_s", "a_e", "b_s", "b_e", 3600.0, Seq("user_id"))
          .where(col("a_id") < col("b_id")).count()
      },
      "mad_winsorize" -> { dir =>
        // two distributed-rank value-domain passes + row-join-back each.
        // value is made row-UNIQUE (event_id jitter survives roundTo=6) so
        // each group's distinct-value domain is N/groups — the worst case
        // the groupedCumCounts range-partitioning must spread; a windowed
        // per-group cumsum would funnel each event_type through one task
        // here and show a super-linear exponent.
        val ev = graft.sources.Tables.loadEvents(spark, dir)
          .select(col("event_id"), col("event_type"),
            (col("value") + col("event_id").cast("double") / 1e4)
              .as("value"))
        graft.operators.Stats.madOutliers(ev, "event_type", "value",
          k = 2.5).count() +
          graft.operators.Stats.winsorize(ev, "event_type", "value",
            0.05, 0.95).count()
      },
      "padding_waste" -> { dir =>
        // one bucket-domain hash aggregate
        graft.operators.Splits.paddingWaste(
          docs(dir).withColumn("n", size(split(col("text"), " "))),
          "n", 32L).count()
      },
      "linear_attribution" -> { dir =>
        // user-keyed lookback pairing + per-conversion share
        graft.operators.EventAnalytics.linearAttribution(
          graft.sources.Tables.loadEvents(spark, dir), "user_id", "ts",
          "event_type", "value", "purchase",
          Seq("view", "click", "signup"), 7L * 86400L).count()
      },
      "prefix_groups" -> { dir =>
        // bounded level explode + (len, md5)-keyed group sizes
        graft.operators.Dedup.commonPrefixGroups(
          docs(dir).withColumn("stamped",
            concat(lit("["), col("source"), lit("] preamble; "),
              col("text"))),
          "doc_id", "stamped", 32, 256).count()
      },
      "out_of_order" -> { dir =>
        // one key-partitioned window pass + per-key fold
        graft.operators.EventAnalytics.outOfOrderStats(
          graft.sources.Tables.loadEvents(spark, dir)
            .withColumn("ts_jit",
              (unix_timestamp(col("ts")) +
                (col("event_id") % 5 - 2) * 90L).cast("timestamp")),
          "user_id", "event_id", "ts_jit").count()
      },
      "percentile_bands" -> { dir =>
        // per-(key, bin) bounded value-domain windows
        graft.operators.Timeseries.percentileBands(
          graft.sources.Tables.loadEvents(spark, dir),
          "event_type", "ts", "value", 86400L).count()
      },
      "ols_trend" -> { dir =>
        // one moment aggregate per key over the bounded bin domain
        graft.operators.Timeseries.olsTrend(
          graft.sources.Tables.loadEvents(spark, dir),
          "event_type", "ts", "value", 86400L).count()
      },
      "binned_mi" -> { dir =>
        // scalar range broadcast + one bounded-grid aggregate
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
        graft.operators.Stats.binnedMI(
          li, "l_quantity", "l_extendedprice").count()
      },
      "source_affinity" -> { dir =>
        // corpus collapses to (group, dim) means; pairs join the bounded
        // centroid table only
        val e = emb(dir)
        val src = docs(dir).select(col("doc_id").as("vec_id"),
          col("source"))
        graft.operators.EmbeddingStats.groupCentroidSimilarity(
          e.join(src, "vec_id"), "source", "embedding").count()
      },
      "ngram_novelty" -> { dir =>
        // shingle semi-join (strategy to AQE) + id-keyed roll-ups
        val d = docs(dir)
        graft.operators.Dedup.ngramNovelty(
          d.where(col("doc_id") % 2 === 0),
          d.where(col("doc_id") % 2 === 1), "doc_id", "text").count()
      },
      "mix_shift" -> { dir =>
        // one (segment, period) aggregate + scalar totals broadcast
        graft.operators.Analytics.mixShiftDecomposition(
          graft.sources.Tables.loadEvents(spark, dir).select(
            col("event_type").as("seg"),
            (col("event_id") % 2).cast("string").as("period"),
            col("value")),
          "seg", "period", "0", "1", "value").count()
      },
      "scd_audit" -> { dir =>
        // the scd2 build + one more key-partitioned window pass
        val dim = Scd.scd2(
          graft.sources.Tables.loadEvents(spark, dir)
            .select("user_id", "ts", "event_id", "event_type"),
          "user_id", "ts", Seq("event_type"), Some("event_id"))
        graft.operators.Scd.validityAudit(dim, "user_id",
          "valid_from", "valid_to").count()
      },
      "fk_audit" -> { dir =>
        // one child partial-agg pass + a key-level anti-join
        graft.operators.Quality.fkAudit(
          spark.read.parquet(s"$dir/lineitem.parquet"), "l_orderkey",
          spark.read.parquet(s"$dir/orders.parquet")
            .where(col("o_orderkey") % 7 =!= 0), "o_orderkey").count()
      },
      "silhouette" -> { dir =>
        // scan-side distances to k broadcast centroids + one keyed agg
        val cust = spark.read.parquet(s"$dir/customer.parquet")
          .select(col("c_custkey"), col("c_acctbal"),
            col("c_nationkey").cast("double").as("c_nat"))
        val (assigned, cents) = graft.operators.Classify.kMeansFixed(
          cust, "c_custkey", Seq("c_acctbal", "c_nat"), 3, 2)
        graft.operators.Classify.silhouetteSimplified(
          assigned, cents, Seq("c_acctbal", "c_nat")).count()
      },
      "leak_free_split" -> { dir =>
        // CC on candidate-sized pairs + one corpus left join
        val d = docs(dir)
        val pairs = graft.operators.Dedup.jaccardVerify(d,
          graft.operators.Dedup.minhashCandidatePairs(d, "doc_id", "text"),
          "doc_id", "text", 3, 0.5).select("id_a", "id_b")
        graft.operators.Splits.leakFreeSplit(d, "doc_id", pairs,
          Seq("train" -> 80, "val" -> 90, "test" -> 100)).count()
      },
      "dispersion" -> { dir =>
        // two keyed aggregates; zeros are algebra, not rows
        graft.operators.Stats.dispersionIndex(
          graft.sources.Tables.loadEvents(spark, dir),
          "event_type", "ts", 3600L).count()
      },
      "cmh" -> { dir =>
        // one stratum-keyed conditional-count aggregate + scalar algebra
        graft.operators.Stats.cmhTest(
          graft.sources.Tables.loadEvents(spark, dir).select(
            col("event_type").as("stratum"),
            (col("user_id") % 2).cast("string").as("arm"),
            (col("value") > 50).cast("int").as("y")),
          "stratum", "arm", "0", "1", "y").count()
      },
      "bh_adjust" -> { dir =>
        // test-table contract: windows are test-count-sized by design
        graft.operators.Stats.bhAdjust(
          docs(dir).select(col("doc_id"),
            (((col("doc_id") * 7919) % 1000) / lit(1000.0)).as("p")),
          "doc_id", "p").count()
      },
      "funnel_latency" -> { dir =>
        // funnel's user-keyed aggregates + bounded gap-domain percentiles
        graft.operators.EventAnalytics.funnelLatency(
          graft.sources.Tables.loadEvents(spark, dir),
          "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), 3600L).count()
      },
      "qte" -> { dir =>
        // percentileBands budget + a 2-arm pivot
        graft.operators.Stats.quantileTreatmentEffects(
          graft.sources.Tables.loadEvents(spark, dir).select(
            floor(col("value")).as("v"),
            (col("user_id") % 2).cast("string").as("g")),
          "v", "g", "0", "1").count()
      },
      "srm" -> { dir =>
        // one variant-keyed aggregate + broadcast allocation literal
        graft.operators.Stats.sampleRatioMismatch(
          graft.sources.Tables.loadEvents(spark, dir)
            .select((col("user_id") % 2).cast("string").as("variant")),
          "variant", Seq("0" -> 0.5, "1" -> 0.5)).count()
      },
      "wasserstein" -> { dir =>
        // value-domain running sums (the ksTest shape)
        graft.operators.Stats.wasserstein1(
          graft.sources.Tables.loadEvents(spark, dir)
            .withColumn("v", floor(col("value"))),
          "v", "event_type", "purchase", "view").count()
      },
      "chi_merge" -> { dir =>
        // one percentile pass + one prebin aggregate; merges are driver-side
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
        graft.operators.Classify.chiMergeBins(
          li.select(col("l_extendedprice"),
            (col("l_quantity") > 25).cast("int").as("y")),
          "l_extendedprice", "y", initialBins = 12, targetBins = 5).count()
      },
      "lang_consistency" -> { dir =>
        // scan-side window slices + two doc-keyed aggregates
        graft.operators.Quality.langConsistency(
          docs(dir), "doc_id", "text", windowTokens = 40).count()
      },
      "markov_shapley" -> { dir =>
        // same journey pass as markov_attribution + 2^K driver chains
        graft.operators.EventAnalytics.markovShapley(
          graft.sources.Tables.loadEvents(spark, dir),
          "user_id", "ts", "event_type", "event_id",
          conversionType = "purchase",
          touchTypes = Seq("click", "signup", "view")).count()
      },
      "component_strengths" -> { dir =>
        // one grid shuffle; everything after is grid-sized
        graft.operators.Timeseries.componentStrengths(
          graft.sources.Tables.loadEvents(spark, dir),
          "ts", "value", 3600L, 24).count()
      },
      "lsh_dup_flood" -> { dir =>
        // LSH dedup under a duplicate FLOOD: one text cloned onto 10% of
        // the corpus — every clone agrees on every band, so the whole
        // flood lands in ONE bucket per band. The cappedBucketPairs
        // sub-bucketing (cap 256 here so both scales split) keeps pair
        // work at N*cap; uncapped this anchor is exponent ~2.
        val base = docs(dir).select(col("doc_id"), col("text"))
        val one = broadcast(base.orderBy("doc_id").limit(1)
          .select(col("text").as("__t")))
        val n = base.count()
        val clones = spark.range(n / 10).crossJoin(one)
          .select((col("id") + 2000000000L).as("doc_id"),
            col("__t").as("text"))
        val pairs = graft.operators.Dedup.minhashCandidatePairs(
          base.unionByName(clones), "doc_id", "text", maxBucket = 256)
        graft.operators.Dedup.connectedComponents(pairs).count()
      },
      "entity_resolve" -> { dir =>
        // q203's shape: blocked pairs → JW verify → CC → golden records
        val clean = docs(dir).select(col("doc_id").as("id"),
          array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 6),
            " ").as("key"))
        val dirty = clean
          .withColumn("__p", (col("id") % length(col("key"))).cast("int"))
          .select((col("id") + 1000000000L).as("id"),
            concat(col("key").substr(lit(1), col("__p")),
              col("key").substr(col("__p") + 2, length(col("key"))))
              .as("key"))
        graft.operators.Linkage.resolveEntities(
          clean.unionAll(dirty), "id", "key", 0.94).count()
      },
      "dup_spectrum" -> { dir =>
        // digest-keyed cluster sizes; the second aggregate is 5 buckets
        graft.operators.Dedup.duplicationSpectrum(
          docs(dir).select("text"), Seq("text")).count()
      },
      "confident_joint" -> { dir =>
        // one threshold broadcast + one K²-bounded-key aggregate
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
        graft.operators.Classify.confidentJoint(
          li.select(
            when(col("l_returnflag") === "A", 0)
              .when(col("l_returnflag") === "N", 1).otherwise(2).as("lab"),
            (((col("l_orderkey") * 7 + col("l_linenumber")) % 100) / lit(100.0)).as("s0"),
            (((col("l_orderkey") * 13 + col("l_linenumber")) % 100) / lit(100.0)).as("s1"),
            (((col("l_orderkey") * 29 + col("l_linenumber")) % 100) / lit(100.0)).as("s2")),
          "lab", Seq("s0", "s1", "s2")).count()
      },
      "markov_attribution" -> { dir =>
        // journey extraction is user-keyed; the chain itself is bounded
        graft.operators.EventAnalytics.markovAttribution(
          graft.sources.Tables.loadEvents(spark, dir),
          "user_id", "ts", "event_type", "event_id",
          conversionType = "purchase",
          touchTypes = Seq("click", "signup", "view")).count()
      },
      "isotonic_woe" -> { dir =>
        // row-scale work is two aggregates; minimax runs on bin-bounded rows
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
        val iso = graft.operators.Stats.isotonicCalibration(
          li.select(
            (((col("l_orderkey") * 7 + col("l_linenumber")) % 100) / lit(100.0))
              .as("score"),
            (col("l_quantity") > 25).cast("int").as("label")),
          "score", "label").count()
        val woe = graft.operators.Classify.woeIv(
          docs(dir).select(col("source"),
            (col("n_chars") > 306).cast("int").as("y")),
          "source", "y").count()
        iso + woe
      },
      "tfidf_cosine_join" -> { dir =>
        // prefix-filtered candidates + candidate-scoped verify, at the
        // near-dup threshold the operator exists for. The df cap is the
        // ABSOLUTE one (1500 = what the 0.3 ratio means at 1×): a ratio
        // cap readmits the corpus's common template terms at ×10
        // (0.3·50k ≫ their df), re-weighting the similarity space and
        // quadratically inflating qualifying pairs — a semantics change,
        // not operator scaling. θ=0.3 has quadratic OUTPUT on this
        // self-similar corpus for the same reason (measured: 128M pairs).
        graft.operators.Retrieval.tfidfCosineJoin(docs(dir), "doc_id",
          "text", threshold = 0.8, maxDfRatio = 0.3,
          maxDf = 1500L).count()
      })

    // best-of-2 per point: a single-shot timing is at the mercy of GC /
    // host noise, and a noisy t1 flips the exponent sign — the MIN of two
    // runs is the steady-state signal (same policy as Bench)
    def timeOf(f: => Long): (Double, Long) = {
      def once: (Double, Long) = {
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (ta, na) = once
      val (tb, nb) = once
      require(na == nb, s"non-deterministic op: $na vs $nb rows")
      (math.min(ta, tb), na)
    }

    val picked = opFilter.fold(ops)(fs => ops.filter(o => fs(o._1)))
    require(picked.nonEmpty, s"no anchors match filter $opFilter")
    // warm every op once at 1× (janino + scan infra), then measure both
    picked.foreach { case (_, f) => f(base) }
    val results = picked.map { case (name, f) =>
      val (t1, n1) = timeOf(f(base))
      val (tN, nN) = timeOf(f(out))
      val exp = math.log(tN / t1) / math.log(rep.toDouble)
      println(f"SCALE $name%-18s t1=$t1%6.2fs t${rep}x=$tN%6.2fs rows $n1%d -> $nN%d exp=$exp%.2f")
      (name, t1, tN, n1, nN, exp)
    }

    val md = new StringBuilder
    md ++= s"# Scaling: sf0.1 → ${rep}× (≈ sf${"%.1f".format(0.1 * rep)})\n\n"
    md ++= "Per-operator wall-clock at 1× vs ${REP}× replicated data and the\n"
      .replace("${REP}", rep.toString)
    md ++= s"scaling exponent `log_$rep(t_$rep/t_1)` — 1.0 = linear; > 1.3 flagged.\n"
    md ++= "Replication is content-aware (document text vowel-permuted per\n" +
      "replica) so dedup operators see genuinely new corpora, not clone\n" +
      "pathology. Measured on local[" + Engine.defaultCores + "] after warm-up.\n\n"
    md ++= s"| operator | t(sf0.1) s | t(×$rep) s | rows 1× | rows ${rep}× | exponent | verdict |\n"
    md ++= "|---|---|---|---|---|---|---|\n"
    results.foreach { case (name, t1, tN, n1, nN, exp) =>
      val verdict =
        if (exp <= 1.1) "linear"
        else if (exp <= 1.3) "near-linear"
        else "FLAG super-linear"
      md ++= f"| $name | $t1%.2f | $tN%.2f | $n1 | $nN | $exp%.2f | $verdict |\n"
    }
    md ++= "\nSub-linear exponents mean the 1× run is dominated by fixed\n" +
      "per-job overhead (task launch, planning) rather than data volume —\n" +
      "the signal that matters is the absence of super-linear outliers.\n"
    if (opFilter.isEmpty) {
      java.nio.file.Files.write(java.nio.file.Paths.get("SCALING.md"),
        md.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println("wrote SCALING.md")
    } else println("op filter active: SCALING.md not rewritten")
    spark.stop()
  }
}

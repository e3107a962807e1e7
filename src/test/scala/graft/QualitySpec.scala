package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Quality

class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1L), Some(10.0), "O"),
    (Some(2L), Some(-5.0), "F"),   // range fail
    (None, Some(3.0), "X"),        // null fail + set fail
    (Some(2L), None, "P")          // dup key + null range input (fail)
  ).toDF("id", "amt", "status")

  test("audit counts failures per check in one result") {
    val got = Quality.audit(df, Seq(
        Quality.notNull("id"),
        Quality.inRange("amt", 0.0, 100.0),
        Quality.inSet("status", Seq("O", "F", "P")),
        Quality.unique("id")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("id_not_null") === ((4L, 1L)))
    // NULL predicate outcome counts as a failure, not a pass
    assert(got("amt_in_range") === ((4L, 2L)))
    assert(got("status_in_set") === ((4L, 1L)))
    // two rows share id=2; the NULL id row is its own group of 1
    assert(got("id_unique") === ((4L, 2L)))
  }

  test("audit reports 0 failures (not NULL) on an empty table") {
    val got = Quality.audit(df.where(lit(false)), Seq(
        Quality.notNull("id"), Quality.inRange("amt", 0, 1)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("id_not_null") === ((0L, 0L)))
    assert(got("amt_in_range") === ((0L, 0L)))
  }

  test("approx_percentile tracks exact percentile within the GK rank-error bound") {
    // q51b's gate is rows-only (sketch output is engine-specific); the
    // accuracy contract lives here as a VALUE tolerance: on this data the
    // extendedprice distribution is dense, so the GK sketch's rank error
    // (<= n/accuracy = a handful of rows at accuracy=10000) translates to
    // well under 1% relative value error. (A literal rank-bound check
    // would need the full sorted column; the value bound is what
    // downstream consumers of the percentile actually rely on.)
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val got = li.groupBy("l_returnflag").agg(
        org.apache.spark.sql.functions.expr(
          "approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"),
        org.apache.spark.sql.functions.expr(
          "percentile(l_extendedprice, 0.5)").as("p50"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val ap = r.getDouble(1); val ex = r.getDouble(2)
      assert(math.abs(ap - ex) / math.max(ex, 1.0) < 0.01,
        s"${r.getString(0)}: approx $ap vs exact $ex")
    }
  }

  test("repetitionProfile: dup and top n-gram fractions from first principles") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),            // 2-grams: ab ba ab ba ab → 5 occ, 2 distinct
      (2L, "all distinct words here"), // 3 occ, 3 distinct → dup 0
      (3L, "single")                   // < 2 tokens → omitted
    ).toDF("doc_id", "text")
    val got = graft.operators.Quality.repetitionProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(math.abs(got(1L)._1 - (1.0 - 2.0 / 5.0)) < 1e-12)
    assert(math.abs(got(1L)._2 - 3.0 / 5.0) < 1e-12) // "a b" occurs 3 of 5
    assert(got(2L) === ((0.0, 1.0 / 3.0)))
  }

  test("unigramLogProb: NLL from first principles on a tiny corpus") {
    import spark.implicits._
    // corpus unigrams: a:2 b:2 c:1 (total 5)
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = graft.operators.Quality.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(math.abs(got(1L)._1 - (-math.log(0.4))) < 1e-12 && got(1L)._2 === 3L)
    assert(math.abs(got(2L)._1 -
      (-math.log(0.4) - math.log(0.2)) / 2.0) < 1e-12 && got(2L)._2 === 2L)
  }

  test("mixtureWeights: shares sum to 1; weight = target/actual; unlisted group drops") {
    import spark.implicits._
    val rows = Seq(("a", 60L), ("a", 20L), ("b", 15L), ("c", 5L))
      .toDF("src", "toks")
    val got = graft.operators.Analytics.mixtureWeights(rows, "src",
        col("toks"), Map("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got("a") === ((80L, 0.8, 0.5, 0.625)))
    assert(got("b") === ((15L, 0.15, 0.5, 0.5 / 0.15)))
    assert(got("c")._3 === 0.0 && got("c")._4 === 0.0) // target 0 → weight 0
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-12)
  }

  test("charEntropy: hand-computed values; padding low, varied text high") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"),     // one symbol → H = 0
      (2L, "ab"),       // two equiprobable → H = ln 2
      (3L, "aab"),      // H = ln 3 − (2 ln 2)/3
      (4L, "")          // empty → omitted
    ).toDF("doc_id", "text")
    val got = Quality.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(math.abs(got(1L)._1 - 0.0) < 1e-12 && got(1L)._2 === 4L)
    assert(math.abs(got(2L)._1 - math.log(2)) < 1e-12)
    assert(math.abs(got(3L)._1 - (math.log(3) - 2 * math.log(2) / 3)) < 1e-12)
    // the detector's point: padding ≪ prose < base64-ish noise
    val band = Seq((10L, "xxxxxxxxxxxxxxxxxxxx"),
      (11L, "the cat sat on the mat"),
      (12L, "aG9wZWxlc3NseSByYW5kb20gYmxvYg=="))
      .toDF("doc_id", "text")
    val h = Quality.charEntropy(band, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(h(10L) < h(11L) && h(11L) < h(12L))
  }

  test("bigramLogProb: seen-bigram and backoff paths from first principles") {
    import spark.implicits._
    // reference "a b a c": c1 = {a:2, b:1, c:1}, N=4, V=3;
    // bigrams c2 = {"a b":1, "b a":1, "a c":1}
    val ref = Seq((100L, "a b a c")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b a"),  // both bigrams seen: s = 1/2, 1/1
      (2L, "a d"),    // unseen bigram, OOV w2: s = 0.4·(0+1)/(4+3)
      (3L, "c b"),    // unseen bigram, known w2: s = 0.4·(1+1)/(4+3)
      (4L, "x")       // < 2 tokens → omitted
    ).toDF("doc_id", "text")
    val got = Quality.bigramLogProb(docs, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(math.abs(got(1L)._1 - (math.log(2.0) + 0.0) / 2) < 1e-12)
    assert(got(1L)._2 === 2L)
    assert(math.abs(got(2L)._1 - -math.log(0.4 / 7)) < 1e-12)
    assert(math.abs(got(3L)._1 - -math.log(0.8 / 7)) < 1e-12)
  }

  test("importanceWeights: LLR from first principles with a transparent bucket") {
    import spark.implicits._
    // bucket = token length → hand-computable histograms, B = 8, α = 1:
    // target "a a bb":  b1:2 b2:1  (Nt=3); candidates: b1:1 b2:1 b3:2 (Nr=4)
    val target = Seq((10L, "a a bb")).toDF("doc_id", "text")
    val cands = Seq((1L, "a bb"), (2L, "ccc ccc")).toDF("doc_id", "text")
    val got = Quality.importanceWeights(cands, target, "doc_id", "text",
        buckets = 8, alpha = 1.0, bucket = Some(c => length(c)))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    def llr(ct: Int, cr: Int) =
      math.log((ct + 1.0) / (3 + 8.0)) - math.log((cr + 1.0) / (4 + 8.0))
    assert(math.abs(got(1L)._1 - (llr(2, 1) + llr(1, 1))) < 1e-12)
    assert(got(1L)._2 === 2L)
    assert(math.abs(got(2L)._1 - 2 * llr(0, 2)) < 1e-12)
    assert(got(2L)._2 === 2L)
  }

  test("importanceWeights ranks target-like candidates above off-domain ones") {
    import spark.implicits._
    val target = (1 to 5).map(i => (100L + i, "apple banana cherry date"))
      .toDF("doc_id", "text")
    val cands = Seq((1L, "apple banana cherry"), (2L, "zebra xylophone quartz"))
      .toDF("doc_id", "text")
    val w = Quality.importanceWeights(cands, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(1L) > w(2L))
  }

  test("importanceResample: hard top-k honors weights; gumbel draw is seed-deterministic") {
    import spark.implicits._
    val target = Seq((10L, "a a bb")).toDF("doc_id", "text")
    val cands = Seq((1L, "a bb"), (2L, "ccc ccc"), (3L, "a a")).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val hard = Quality.importanceResample(cands, target, "doc_id", "text",
      k = 2, gumbel = false, buckets = 8, bucket = Some(c => length(c)))
    // weights: doc3 (all b1-like target mass) and doc1 beat the off-domain doc2
    assert(ids(hard) === Set(1L, 3L))
    val g1 = ids(Quality.importanceResample(cands, target, "doc_id", "text",
      k = 2, seed = 7L, buckets = 8, bucket = Some(c => length(c))))
    val g2 = ids(Quality.importanceResample(cands, target, "doc_id", "text",
      k = 2, seed = 7L, buckets = 8, bucket = Some(c => length(c))))
    assert(g1 === g2 && g1.size === 2 && g1.subsetOf(Set(1L, 2L, 3L)))
  }

  test("importanceResample plans as TakeOrderedAndProject with a broadcast LLR join") {
    import spark.implicits._
    val target = Seq((10L, "a a bb")).toDF("doc_id", "text")
    val cands = Seq((1L, "a bb"), (2L, "ccc ccc")).toDF("doc_id", "text")
    val plan = Quality.importanceResample(cands, target, "doc_id", "text", k = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    // the candidate token stream joins the ≤B-row LLR table without a shuffle
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("repeatAllocation waterfills: caps bind as a cap-sorted prefix") {
    import graft.operators.Analytics
    val docs = Seq(("a", 4L), ("a", 6L), ("b", 10L), ("c", 10L))
      .toDF("source", "n")
    val caps = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0)
    def run(budget: Long) =
      Analytics.repeatAllocation(docs, "source", col("n"), budget, caps)
        .collect().map(r => r.getString(0) ->
          ((r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    // budget 45: λ0 = 45/30 = 1.5 > cap(a) → a caps at 1 epoch (10 tok);
    // λ = (45−10)/20 = 1.75 ≤ cap(b) → b and c both run 1.75 epochs
    val mid = run(45L)
    assert(mid("a") === ((1.0, 10.0, true)))
    assert(mid("b") === ((1.75, 17.5, true)))
    assert(mid("c") === ((1.75, 17.5, true)))
    // allocations exhaust the budget exactly when met
    assert(mid.values.map(_._2).sum === 45.0)
    // budget 24 < unique mass × min cap: λ = 0.8, nobody caps
    val low = run(24L)
    assert(low("a") === ((0.8, 8.0, true)))
    assert(low("c") === ((0.8, 8.0, true)))
    // budget 100 > capacity 70: every source caps, budget unmet
    val over = run(100L)
    assert(over("a") === ((1.0, 10.0, false)))
    assert(over("b") === ((2.0, 20.0, false)))
    assert(over("c") === ((4.0, 40.0, false)))
  }

  test("perplexityTiers: reference-like docs head, gibberish tail") {
    val ref = Seq((100L, "the cat sat on the mat"),
      (101L, "the dog sat on the rug")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the cat sat on the mat"),   // pure reference bigrams
      (2L, "the dog sat on the mat"),
      (3L, "the cat sat on the rug"),
      (4L, "the cat zz qq the mat"),    // half OOV
      (5L, "the dog zz qq the rug"),
      (6L, "the mat qq zz the cat"),
      (7L, "zz qq xx yy ww vv"),        // pure OOV gibberish
      (8L, "qq zz yy xx vv ww"),
      (9L, "xx ww zz vv qq yy")
    ).toDF("doc_id", "text")
    val got = Quality.perplexityTiers(docs, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(Seq(1L, 2L, 3L).map(got) === Seq("head", "head", "head"))
    assert(Seq(4L, 5L, 6L).map(got) === Seq("middle", "middle", "middle"))
    assert(Seq(7L, 8L, 9L).map(got) === Seq("tail", "tail", "tail"))
    // tier populations are balanced (9 docs, 3 tiers)
    val sizes = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes === Map("head" -> 3, "middle" -> 3, "tail" -> 3))
  }

  test("c4Clean applies the published line and doc rules") {
    val docs = Seq(
      (1L, "This line has five good words.\nshort line.\nNo terminal punctuation here at all\nEnable javascript to view this page.\nAnother perfectly fine prose line!\nA third keeper sentence ends here?"),
      (2L, "Lorem ipsum dolor sit amet friend.\nSecond acceptable line is right here.\nThird acceptable line is right here.\nFourth acceptable line is right here."),
      (3L, "function f() { return 1; }\nOne good line that would survive fine.\nTwo good line that would survive fine.\nSix good line that would survive fine."),
      (4L, "Only one surviving line sits here.")
    ).toDF("doc_id", "text")
    val got = Quality.c4Clean(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
    // doc 1: 6 lines — short (<5 words), unterminated, and javascript
    // lines drop; 3 survive in order → passes
    assert(got(1L) === (("This line has five good words.\n" +
      "Another perfectly fine prose line!\nA third keeper sentence ends here?",
      3L, 6L, false, false, true)))
    // doc 2: every line fine in isolation, but the doc mentions lorem ipsum
    assert(got(2L)._4 === true)
    assert(got(2L)._6 === false)
    assert(got(2L)._2 === 4L)
    // doc 3: brace flag fires (the code line also fails the line rules)
    assert(got(3L)._5 === true)
    assert(got(3L)._6 === false)
    assert(got(3L)._2 === 3L)
    // doc 4: clean but below minLines=3 survivors
    assert(got(4L) === (("Only one surviving line sits here.",
      1L, 1L, false, false, false)))
  }

  test("c4Clean is shuffle-free — one projection, no exchange") {
    val docs = Seq((1L, "A b c d e.\nf")).toDF("doc_id", "text")
    val plan = Quality.c4Clean(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("boilerplateFilter drops recurring units, keeps order, counts both") {
    val docs = Seq(
      (1L, "Alpha beta. Cookie banner. Gamma delta. Footer text."),
      (2L, "Cookie banner. Unique two. Footer text."),
      (3L, "Footer text. Cookie banner. Unique three."),
      (4L, "Cookie banner. Footer text.")
    ).toDF("doc_id", "text")
    // minDocs=3: "Cookie banner" (mid-doc, 4 docs) and the doc-final
    // "Footer text." (docs 1/2/4 — the final unit keeps its terminator, so
    // doc 3's mid-doc "Footer text" is a DIFFERENT unit, seen once, kept)
    val got = Quality.boilerplateFilter(docs, "doc_id", "text", minDocs = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === (("Alpha beta. Gamma delta", 2L, 2L)))
    assert(got(2L) === (("Unique two", 1L, 2L)))
    assert(got(3L) === (("Footer text. Unique three.", 2L, 1L)))
    // a fully-boilerplate doc survives as an empty row, not a lost row
    assert(got(4L) === (("", 0L, 2L)))
    // raising the threshold above the recurrence keeps everything
    val loose = Quality.boilerplateFilter(docs, "doc_id", "text", minDocs = 5)
      .agg(sum("n_dropped")).collect()(0).getLong(0)
    assert(loose === 0L)
  }

  test("boilerplateFilter broadcasts the frequent set") {
    val docs = Seq((1L, "A b. C d."), (2L, "A b. E f.")).toDF("doc_id", "text")
    val plan = Quality.boilerplateFilter(docs, "doc_id", "text", minDocs = 2)
      .queryExecution.executedPlan.toString
    // the frequent-hash marker joins broadcast — unit text never shuffles
    // for the membership test (only the doc-keyed reassembly shuffles)
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("audit is a single scan for plain predicates") {
    val plan = Quality.audit(df, Seq(
        Quality.notNull("id"), Quality.inRange("amt", 0, 1)))
      .queryExecution.executedPlan.toString
    // no union of repeated scans — one aggregate over one source
    assert(!plan.contains("Union"))
  }

  test("tokenClassMI: class-exclusive tokens score high, uniform ones ~0") {
    import spark.implicits._
    // 'alpha' only in class A, 'beta' only in B, 'the' uniform everywhere
    val docs = Seq(
      ("A", "the alpha alpha the"), ("A", "alpha the alpha the"),
      ("B", "the beta beta the"), ("B", "beta the beta the"))
      .toDF("cls", "text")
    val got = graft.operators.Quality
      .tokenClassMI(docs, "text", "cls", minCount = 1, topN = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got.keySet === Set("alpha", "beta", "the"))
    assert(got("the")._1 === 8L && math.abs(got("the")._2) < 1e-12)
    // p(alpha,A)=1/4·ln((1/4)/(1/4·1/2)) = 1/4·ln 2, one term
    assert(math.abs(got("alpha")._2 - math.log(2) / 4) < 1e-12)
    assert(got("alpha")._2 === got("beta")._2) // symmetric by construction
  }

  test("tokenClassMI: minCount prunes and topN ranks by MI") {
    import spark.implicits._
    val docs = Seq(
      ("A", "aa aa aa aa rare"), ("B", "bb bb bb bb"), ("B", "mid aa"))
      .toDF("cls", "text")
    val all = graft.operators.Quality
      .tokenClassMI(docs, "text", "cls", minCount = 2, topN = 10)
      .collect().map(_.getString(0)).toSet
    assert(all === Set("aa", "bb")) // rare/mid dropped below minCount
    val top1 = graft.operators.Quality
      .tokenClassMI(docs, "text", "cls", minCount = 2, topN = 1)
      .collect().map(_.getString(0)).toSeq
    assert(top1 === Seq("bb")) // class-pure bb beats the split aa
  }

  test("collocations: co-occurring pairs score high PMI; minCount prunes") {
    import spark.implicits._
    val docs = Seq("new york a", "new york b", "a b a b").toDF("text")
    val got = graft.operators.Quality.collocations(docs, "text",
        minCount = 2, topN = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // unigrams: new 2, york 2, a 3, b 3 (nu 10); bigrams total 7
    assert(got.keySet === Set(("new", "york"), ("a", "b")))
    assert(got(("new", "york"))._1 === 2L)
    assert(math.abs(got(("new", "york"))._2 - math.log(200.0 / 28)) < 1e-12)
    assert(math.abs(got(("a", "b"))._2 - math.log(200.0 / 63)) < 1e-12)
    // topN=1 keeps the highest-PMI pair
    val top1 = graft.operators.Quality.collocations(docs, "text",
        minCount = 2, topN = 1).collect().map(r => (r.getString(0), r.getString(1)))
    assert(top1.toSeq === Seq(("new", "york")))
    // minCount above every bigram count → empty
    assert(graft.operators.Quality.collocations(docs, "text",
      minCount = 3, topN = 10).count() === 0)
  }

  test("columnDependencies: FD gives U=1, independence gives U=0") {
    import spark.implicits._
    val fd = Seq(("x", 1), ("x", 1), ("y", 2)).toDF("a", "b")
    val r1 = graft.operators.Quality.columnDependencies(fd, Seq(("a", "b")))
      .collect().head
    assert(math.abs(r1.getDouble(4)) < 1e-15)       // H(A|B) = 0
    assert(math.abs(r1.getDouble(5) - 1.0) < 1e-12) // U = 1
    val ind = Seq(("x", 1), ("x", 2), ("y", 1), ("y", 2)).toDF("a", "b")
    val r2 = graft.operators.Quality.columnDependencies(ind, Seq(("a", "b")))
      .collect().head
    assert(math.abs(r2.getDouble(2) - math.log(2)) < 1e-12) // H(A) = ln 2
    assert(math.abs(r2.getDouble(4) - math.log(2)) < 1e-12) // H(A|B) = ln 2
    assert(math.abs(r2.getDouble(5)) < 1e-12)               // U = 0
  }

  test("populationStability: identical vintages ≈ 0, shifted vintages large") {
    import spark.implicits._
    val ref = Seq.tabulate(1000)(i => i.toDouble).toDF("v")
    // same distribution → every bucket's shares match → PSI ~ 0
    val same = graft.operators.Quality
      .populationStability(ref, ref, "v", buckets = 10)
      .agg(sum("psi_term")).head.getDouble(0)
    assert(math.abs(same) < 1e-12)
    // hard right shift (+2000: everything lands in the last bucket)
    val shifted = Seq.tabulate(1000)(i => i.toDouble + 2000).toDF("v")
    val drift = graft.operators.Quality
      .populationStability(ref, shifted, "v", buckets = 10)
    val terms = drift.collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(terms.size === 10)
    assert(terms.values.sum > 1.0) // far beyond the 0.25 alarm line
    // empty buckets are defined (smoothing), never NaN/null
    assert(terms.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("categoricalDrift: identical mixes are exactly 0; disjoint bounded by ln 2") {
    import spark.implicits._
    val a = Seq("en", "en", "de", "fr").toDF("lang")
    val same = graft.operators.Quality.categoricalDrift(a, a, "lang")
      .collect()
    // equal counts and totals → expected == observed and p == q exactly
    assert(same.forall(r => r.getDouble(3) === 0.0 && r.getDouble(4) === 0.0))
    // big disjoint samples so the +0.5 smoothing is negligible and the
    // JS sum approaches its ln 2 ceiling
    val aBig = (Seq.fill(200)("en") ++ Seq.fill(100)("de") ++
      Seq.fill(100)("fr")).toDF("lang")
    val bBig = (Seq.fill(200)("zh") ++ Seq.fill(100)("ja") ++
      Seq.fill(100)("ko")).toDF("lang")
    val disj = graft.operators.Quality.categoricalDrift(aBig, bBig, "lang")
      .agg(sum("js_term"), sum("chi2_term")).head
    assert(disj.getDouble(0) > 0.6 && disj.getDouble(0) <= math.log(2) + 1e-12)
    assert(disj.getDouble(1) > 10.0 && !disj.getDouble(1).isInfinite)
    // vanished + new categories all present and finite
    val rows = graft.operators.Quality.categoricalDrift(aBig, bBig, "lang")
      .collect()
    assert(rows.map(_.getString(0)).toSet ===
      Set("en", "de", "fr", "zh", "ja", "ko"))
    assert(rows.forall(r => !r.getDouble(3).isNaN && !r.getDouble(4).isNaN))
  }

  test("readability: hand-counted words/sentences/syllables and score") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"), // 6 words, 2 sentences
      (2L, ""),                          // excluded: no words
      (3L, "no terminator here")         // 3 words, 1 sentence run
    ).toDF("doc_id", "text")
    val got = graft.operators.Quality.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet === Set(1L, 3L))
    // syllable groups: the=1 cat=1 sat=1 the=1 dog=1 ran=1 → 6
    assert(got(1L)._1 === 6L && got(1L)._2 === 2L && got(1L)._3 === 6L)
    val expected = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert(math.abs(got(1L)._4 - expected) < 1e-9)
    // "no terminator here": no=1, terminator: e,a,o → 4? e-a-o → 'e','a','o'
    // → t-e-rm-i-n-a-t-o-r: vowel groups e,i,a,o = 4; here: e,e = 2; no=1
    assert(got(3L)._3 === 7L)
  }

  test("zipfFit: a planted power law recovers its slope") {
    import spark.implicits._
    // token k repeated ⌊1000/k⌋ times, k = 1..20 → ln f ≈ ln 1000 − ln k
    val text = (1 to 20).flatMap(k =>
      Seq.fill(1000 / k)(f"tok$k%02d")).mkString(" ")
    val got = graft.operators.Quality.zipfFit(
      Seq(text).toDF("text"), "text", topN = 20).head
    assert(got.getLong(0) === 20L)
    assert(math.abs(got.getDouble(1) - (-1.0)) < 0.02) // slope ≈ −1
    assert(got.getDouble(3) > 0.999)                   // near-perfect fit
  }

  test("compressionRatio: repetitive ≪ prose < noise; deterministic; empty → NULL") {
    import spark.implicits._
    import graft.functions.expressions.CompressionExpressions.compressionRatio
    val rnd = new scala.util.Random(3)
    val noise = Seq.fill(2000)(rnd.nextPrintableChar()).mkString
    val prose = Seq.fill(40)("the quick brown fox jumps over a lazy dog " +
      "while considering compression").mkString(" ")
    val docs = Seq(
      (1L, "ab" * 1000), (2L, prose), (3L, noise), (4L, ""))
      .toDF("id", "t")
    val got = docs.select(col("id"), compressionRatio(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val rep = got(1L).get.asInstanceOf[Double]
    val pr = got(2L).get.asInstanceOf[Double]
    val nz = got(3L).get.asInstanceOf[Double]
    assert(rep < 0.05 && rep < pr && pr < nz)
    assert(got(4L) === None)
    // determinism: same input → bit-identical ratio
    val again = docs.select(compressionRatio(col("t")).as("r"))
      .where(col("r").isNotNull).collect().map(_.getDouble(0)).sorted.toSeq
    assert(again === Seq(rep, pr, nz).sorted)
  }

  test("robustScale: median/IQR z with clipping; degenerate IQR scales to 0") {
    import spark.implicits._
    val rows = Seq(("g", 1), ("g", 2), ("g", 3), ("g", 4), ("g", 103),
      ("flat", 7), ("flat", 7), ("flat", 7))
      .toDF("src", "v")
    val got = graft.operators.Analytics.robustScale(rows, "src", "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    // g: q25=2, med=3, q75=4 (interpolated exact) → IQR 2
    assert(got(("g", 1)) === -1.0 && got(("g", 2)) === -0.5)
    assert(got(("g", 3)) === 0.0 && got(("g", 4)) === 0.5)
    assert(got(("g", 103)) === 3.0)  // (103−3)/2 = 50 → clipped
    assert(got(("flat", 7)) === 0.0) // IQR 0 → typical
  }

  test("benford: first-digit extraction across magnitudes, zero/neg dropped") {
    val vals = Seq(1.0, 10.0, 999.99, 0.5, 0.0042, 123456.0,
      -5.0, 0.0) // -5 and 0 are not auditable and must be dropped
    val b = Quality.benford(vals.toDF("v"), "v").collect()
      .map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n")).toMap
    assert(b(1) === 3L) // 1.0, 10.0, 123456.0
    assert(b(9) === 1L) // 999.99
    assert(b(5) === 1L) // 0.5
    assert(b(4) === 1L) // 0.0042
    assert(b(2) === 0L) // spine digit with no observations stays present
  }

  test("profile: counts, nulls, distincts, native-type extremes") {
    val rows = Seq((Some(1L), Some("b")), (Some(2L), None),
      (Some(10L), Some("a")), (None, Some("a")))
      .toDF("i", "s")
    val got = Quality.profile(rows, Seq("i", "s")).orderBy("column")
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n"),
        r.getAs[Long]("n_null"), r.getAs[Long]("n_distinct"),
        r.getAs[String]("min_value"), r.getAs[String]("max_value"))))
      .toMap
    // native numeric ordering: max is 10, not the lexicographic "2"
    assert(got("i") === ((4L, 1L, 3L, "1", "10")))
    assert(got("s") === ((4L, 1L, 2L, "a", "b")))
  }

  test("oovRate: per-doc coverage, empty docs rate 0, dup vocab harmless") {
    val docs = Seq((1L, "a b c d"), (2L, "a a"), (3L, ""))
      .toDF("doc_id", "text")
    val vocab = Seq("a", "b", "a").toDF("token") // dup must not fan out
    val got = Quality.oovRate(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
        r.getAs[Double]("oov_rate")))
    assert(got(0) === ((4L, 2L, 0.5)))
    assert(got(1) === ((2L, 0L, 0.0)))
    assert(got(2) === ((0L, 0L, 0.0))) // token-less doc kept at rate 0
  }

  test("giniConcentration: closed form, uniform → 0") {
    val docs = Seq("a a a b b c").toDF("text")
    val r = Quality.giniConcentration(docs, "text", topN = 10).head()
    assert(r.getAs[Long]("n_tokens") === 3L)
    assert(r.getAs[Long]("total_count") === 6L)
    // ascending counts (1,2,3): Σ(2i−n−1)xᵢ = −2+0+6 = 4 → 4/(3·6)
    assert(math.abs(r.getAs[Double]("gini") - 4.0 / 18) < 1e-12)
    val uniform = Quality.giniConcentration(
      Seq("a b c").toDF("text"), "text", topN = 10).head()
    assert(math.abs(uniform.getAs[Double]("gini")) < 1e-12)
  }

  test("benford: shares and expectations each total 1; chi2 ≥ 0") {
    val vals = (1 to 300).map(i => (i * 37 % 997 + 1).toDouble)
    val rows = Quality.benford(vals.toDF("v"), "v").collect()
    val obs = rows.map(_.getAs[Double]("obs_share")).sum
    val exp = rows.map(_.getAs[Double]("exp_share")).sum
    assert(math.abs(obs - 1.0) < 1e-9)
    assert(math.abs(exp - 1.0) < 1e-9)
    assert(rows.forall(_.getAs[Double]("chi2_term") >= 0.0))
  }

  test("kneserNeyLogProb: hand-computed discount/fertility/continuation") {
    // reference: "a b a c", "a b" → c1(a)=3 c1(b)=2 c1(c)=1, V=3;
    // bigrams "a b":2 "b a":1 "a c":1, B=3; fert(a)=2 fert(b)=1;
    // cont(a)=cont(b)=cont(c)=1 → pc(w) = 2/6 seen, 1/6 unseen
    val ref = Seq((10L, "a b a c"), (11L, "a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b"),  // seen bigram:     1.25/3 + 0.75·(2/3)·(1/3)
      (2L, "z b"),  // unseen context:  pc(b) = 1/3
      (3L, "b c")   // unseen bigram:   0 + 0.75·(1/2)·(1/3)
    ).toDF("doc_id", "text")
    val got = Quality.kneserNeyLogProb(docs, ref, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[Long]("n_bigrams")).toSeq === Seq(1L, 1L, 1L))
    val want = Seq(
      -math.log(1.25 / 3 + 0.75 * (2.0 / 3) * (1.0 / 3)),
      -math.log(1.0 / 3),
      -math.log(0.375 * (1.0 / 3)))
    got.map(_.getAs[Double]("nll_kn")).zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-9, s"$g vs $w")
    }
  }

  test("kneserNeyLogProb: lower NLL than stupid backoff on in-domain text") {
    // both models score the reference's own text; KN's discounted mass
    // still leaves seen bigrams near their MLE, so in-domain NLL stays
    // finite and the doc count plumbing matches bigramLogProb's
    val ref = Seq((1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug")).toDF("doc_id", "text")
    val kn = Quality.kneserNeyLogProb(ref, ref, "doc_id", "text")
      .orderBy("doc_id").collect()
    val bo = Quality.bigramLogProb(ref, ref, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(kn.map(_.getAs[Long]("n_bigrams")).toSeq ===
      bo.map(_.getAs[Long]("n_bigrams")).toSeq)
    kn.foreach(r => assert(r.getAs[Double]("nll_kn") > 0 &&
      !r.getAs[Double]("nll_kn").isInfinite))
  }

  test("fkAudit: orphan rows/keys counted, null FKs reported separately") {
    val child = Seq(
      (1L, "a"), (1L, "b"),         // valid, 2 rows on key 1
      (2L, "c"),                    // valid
      (9L, "d"), (9L, "e"), (9L, "f"), // orphan key, 3 rows
      (7L, "g"))                    // orphan key, 1 row
      .toDF("fk", "payload")
      .unionByName(Seq((Option.empty[Long], "h")).toDF("fk", "payload"))
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Quality.fkAudit(child, "fk", parent, "pk").head()
    assert(r.getAs[Long]("n_child_rows") === 7L)
    assert(r.getAs[Long]("n_child_keys") === 4L)
    assert(r.getAs[Long]("n_orphan_rows") === 4L)
    assert(r.getAs[Long]("n_orphan_keys") === 2L)
    assert(r.getAs[Long]("n_null_rows") === 1L)
    assert(math.abs(r.getAs[Double]("orphan_row_rate") - 4.0 / 7) < 1e-12)
  }

  test("fkAudit: clean FK reports zeros, not nulls") {
    val child = Seq((1L, "a"), (2L, "b")).toDF("fk", "payload")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Quality.fkAudit(child, "fk", parent, "pk").head()
    assert(r.getAs[Long]("n_orphan_rows") === 0L)
    assert(r.getAs[Long]("n_orphan_keys") === 0L)
    assert(r.getAs[Double]("orphan_row_rate") === 0.0)
  }

  test("langConsistency: window majority, tie to lang asc, und windows") {
    val docs = Seq(
      (1L, "the and of le la et"),   // en window + fr window → tie → 'en'
      (2L, "the and of to in is"),   // two en windows
      (3L, "xxx yyy zzz"))           // no stopwords → 'und'
      .toDF("doc_id", "text")
    val got = Quality.langConsistency(docs, "doc_id", "text",
        windowTokens = 3)
      .orderBy("doc_id").collect()
    val d1 = got(0)
    assert(d1.getAs[Long]("n_windows") === 2L)
    assert(d1.getAs[String]("top_lang") === "en")
    assert(d1.getAs[Double]("top_share") === 0.5)
    assert(d1.getAs[Long]("n_langs") === 2L)
    val d2 = got(1)
    assert(d2.getAs[String]("top_lang") === "en" &&
      d2.getAs[Double]("top_share") === 1.0 &&
      d2.getAs[Long]("n_langs") === 1L)
    assert(got(2).getAs[String]("top_lang") === "und")
  }

  test("keySkew: top-N cut, shares, rank ties by key, skew factor") {
    import spark.implicits._
    // key a: 6 rows, b: 2, c: 2, d: 1 (11 rows, 4 keys, mean 2.75)
    val rows = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") :+
      "d").zipWithIndex.toDF("k", "i")
    val got = Quality.keySkew(rows, Seq("k"), topN = 3)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[String]("k")).toSeq === Seq("a", "b", "c"))
    assert(got(0).getAs[Long]("n") === 6L)
    assert(math.abs(got(0).getAs[Double]("share") - 6.0 / 11) < 1e-12)
    assert(got(0).getAs[Long]("n_keys") === 4L)
    assert(math.abs(got(0).getAs[Double]("skew_factor") - 6.0 / 2.75) < 1e-12)
    // tie between b and c resolves by key order
    assert(got(1).getAs[Int]("rank") === 2 && got(2).getAs[Int]("rank") === 3)
  }

  test("corpusCard: hand-computed header metrics incl. dup pressure") {
    import spark.implicits._
    val rows = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x"), (4L, ""),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Quality.corpusCard(rows, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("n_docs") === 5.0)
    assert(got("n_empty") === 2.0)          // "" and null
    assert(got("total_tokens") === 7.0)
    assert(got("p50_tokens") === 1.0)       // sorted 0,0,1,3,3
    assert(got("total_chars") === 11.0)
    assert(got("exact_dup_excess") === 2.0) // dup "a b c" + ""≡null digest
    assert(math.abs(got("exact_dup_share") - 0.4) < 1e-12)
  }

  test("domainReweight: equal losses reduce to reference shares; weights sum to 1") {
    // same avg loss everywhere → exp terms cancel → w == mass share (ε = 0)
    val rows = Seq(("a", 10L, 2.0), ("a", 20L, 2.0),
      ("b", 70L, 2.0)).toDF("g", "toks", "loss")
    val got = Quality.domainReweight(rows, "g", col("loss"), col("toks"),
        eta = 1.0, epsilon = 0.0)
      .collect().map(r => r.getAs[String]("g") ->
        r.getAs[Double]("weight")).toMap
    assert(math.abs(got("a") - 0.3) < 1e-12)
    assert(math.abs(got("b") - 0.7) < 1e-12)
  }

  test("domainReweight: hard domains gain mass; ε floors every domain") {
    // equal reference mass, b's loss one nat higher → w_b/w_a = e
    val rows = Seq(("a", 50L, 1.0), ("b", 50L, 2.0)).toDF("g", "toks", "loss")
    val raw = Quality.domainReweight(rows, "g", col("loss"), col("toks"),
        eta = 1.0, epsilon = 0.0)
      .collect().map(r => r.getAs[String]("g") ->
        r.getAs[Double]("weight")).toMap
    assert(math.abs(raw("b") / raw("a") - math.E) < 1e-9)
    assert(math.abs(raw("a") + raw("b") - 1.0) < 1e-12)
    // ε = 0.2 over 2 domains: every weight ≥ ε/G = 0.1
    val smoothed = Quality.domainReweight(rows, "g", col("loss"),
        col("toks"), eta = 5.0, epsilon = 0.2)
      .collect().map(r => r.getAs[Double]("weight"))
    assert(smoothed.forall(_ >= 0.1 - 1e-12))
    assert(math.abs(smoothed.sum - 1.0) < 1e-12)
  }

  test("dedupeParagraphs: keeps first occurrences in order") {
    val docs = Seq((1L, "a\nb\na\nc\nb"), (2L, "x")).toDF("id", "text")
    val got = Quality.dedupeParagraphs(docs, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[String]("deduped_text"), r.getAs[Long]("n_units"),
          r.getAs[Long]("n_dropped")))).toMap
    assert(got(1L) === (("a\nb\nc", 5L, 2L)))
    assert(got(2L) === (("x", 1L, 0L)))
  }

  test("dedupeParagraphs: idempotent, null-safe, custom separator") {
    val docs = Seq((1L, Some("p. q. p. r")), (2L, None))
      .toDF("id", "text")
    val once = Quality.dedupeParagraphs(docs, "text", sep = ". ")
    val r1 = once.where(col("id") === 1).head()
    assert(r1.getAs[String]("deduped_text") === "p. q. r")
    val twice = Quality.dedupeParagraphs(
      once.select(col("id"), col("deduped_text").as("text")),
      "text", sep = ". ").where(col("id") === 1).head()
    assert(twice.getAs[Long]("n_dropped") === 0L)
    val r2 = once.where(col("id") === 2).head()
    assert(r2.getAs[String]("deduped_text") === "")
  }

  test("heapsLawFit: all-unique tokens fit beta = 1, K = 1 exactly") {
    // every token globally unique → V_k = N_k at every prefix
    val docs = (1 to 8).map(i => (i.toLong, s"u${i}a u${i}b u${i}c"))
      .toDF("ord", "text")
    val r = Quality.heapsLawFit(docs, "text", "ord", numBuckets = 4)
      .head()
    assert(r.getAs[Long]("n_tokens") === 24L)
    assert(r.getAs[Long]("vocab") === 24L)
    assert(math.abs(r.getAs[Double]("beta") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("k_coef") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
  }

  test("heapsLawFit: a closed vocabulary fits beta = 0") {
    val docs = (1 to 8).map(i => (i.toLong, "tok tok tok"))
      .toDF("ord", "text")
    val r = Quality.heapsLawFit(docs, "text", "ord", numBuckets = 4)
      .head()
    assert(r.getAs[Long]("vocab") === 1L)
    assert(math.abs(r.getAs[Double]("beta")) < 1e-9)
    // the flat-curve guard: SST is fp dust here, so without the integer
    // min==max guard r2 would be a noise-dominated 0/0 that differs by
    // engine and run; the contract is the exact degenerate fit
    assert(r.getAs[Double]("r2") === 1.0)
    assert(r.getAs[Double]("k_coef") === 1.0)
  }

  test("scalingLawFit: a pure power law recovers (c=0, a, b) exactly") {
    // L = 10·N^(−1/2): the frac-0 candidate is an exact log-log line
    val pts = Seq(4L, 16L, 64L, 256L)
      .map(n => (n, 10.0 * math.pow(n.toDouble, -0.5))).toDF("n", "loss")
    val r = Quality.scalingLawFit(pts, "n", "loss").head()
    assert(r.getAs[Long]("n_points") === 4L)
    assert(r.getAs[Double]("c") === 0.0)
    assert(math.abs(r.getAs[Double]("a") - 10.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
  }

  test("scalingLawFit: an irreducible-loss curve picks the matching " +
    "c candidate") {
    // L = 1/8 + 1/N over N = 1,2,4,8: L_min = 1/4, and the frac-0.5
    // candidate c = 1/8 is EXACT — the shifted fit is a perfect line
    val pts = Seq(1L, 2L, 4L, 8L)
      .map(n => (n, 0.125 + 1.0 / n)).toDF("n", "loss")
    val r = Quality.scalingLawFit(pts, "n", "loss").head()
    assert(math.abs(r.getAs[Double]("c") - 0.125) < 1e-12)
    assert(math.abs(r.getAs[Double]("a") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("b") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-9)
  }

  test("vocabCoverage: hand-counted Good–Turing and Chao1") {
    // one source, tokens a:2 b:1 c:1 -> N=4 V=3 N1=2 N2=1
    // unseen = 2/4; chao1 = 3 + 2·1/(2·(1+1)) = 3.5
    val docs = Seq(("s1", "a a b"), ("s1", "c")).toDF("source", "text")
    val r = Quality.vocabCoverage(docs, "text", Seq("source")).head()
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("vocab") === 3L)
    assert(r.getAs[Long]("n_hapax") === 2L)
    assert(r.getAs[Long]("n_dis") === 1L)
    assert(math.abs(r.getAs[Double]("unseen_mass") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("coverage") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("chao1") - 3.5) < 1e-12)
  }

  test("vocabCoverage: no hapaxes means full coverage and chao1 = vocab") {
    val docs = Seq(("s1", "a a b b")).toDF("source", "text")
    val r = Quality.vocabCoverage(docs, "text", Seq("source")).head()
    assert(r.getAs[Long]("n_hapax") === 0L)
    assert(math.abs(r.getAs[Double]("coverage") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("chao1") - 2.0) < 1e-12)
  }

  test("vocabCoverage: groups are independent") {
    val docs = Seq(("s1", "a a"), ("s2", "a b")).toDF("source", "text")
    val got = Quality.vocabCoverage(docs, "text", Seq("source"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_hapax")).toMap
    assert(got("s1") === 0L && got("s2") === 2L)
  }
  test("bleu: clipped precisions, brevity penalty, identity pair = 1") {
    val pairs = Seq(
      (1L, "a b c d", "a b c d"),        // identity: every pn=1, bleu=1
      (2L, "the the the", "the cat"),    // clipping: p1 = min(3,1)/3
      (3L, "a b", "a b c d e f"))        // short candidate: BP binds
      .toDF("id", "cand", "ref")
    val got = Quality.bleu(pairs, "id", "cand", "ref")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Double]("p1") === 1.0 && r1.getAs[Double]("p4") === 1.0)
    assert(r1.getAs[Double]("bp") === 1.0)
    assert(math.abs(r1.getAs[Double]("bleu") - 1.0) < 1e-12)
    val r2 = got(2L)
    assert(math.abs(r2.getAs[Double]("p1") - 1.0 / 3) < 1e-12)
    // bigrams "the the" x2 never match "the cat" -> p2 = 0 -> bleu 0
    assert(r2.getAs[Double]("p2") === 0.0)
    assert(r2.getAs[Double]("bleu") === 0.0)
    val r3 = got(3L)
    // cand 2 tokens < maxN=4: no 3/4-grams -> p3/p4 null -> bleu 0;
    // BP = exp(1 - 6/2) still reported
    assert(r3.isNullAt(r3.fieldIndex("p3")))
    assert(math.abs(r3.getAs[Double]("bp") - math.exp(1.0 - 3.0)) < 1e-12)
    assert(r3.getAs[Double]("bleu") === 0.0)
  }

  test("bleu: repeated matched grams credit only up to the reference " +
    "count; geometric mean in log space") {
    // cand "a a b": unigrams clip = min(2,1)+min(1,1) = 2 of 3; bigrams
    // "a a","a b" vs ref "a b" -> clip 1 of 2
    val pairs = Seq((1L, "a a b", "a b")).toDF("id", "cand", "ref")
    val r = Quality.bleu(pairs, "id", "cand", "ref", maxN = 2).head()
    assert(math.abs(r.getAs[Double]("p1") - 2.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("p2") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("bleu") -
      math.exp((math.log(2.0 / 3) + math.log(0.5)) / 2)) < 1e-12)
  }

  test("rougeN: recall over the reference total; short reference is null") {
    val pairs = Seq(
      (1L, "a b c d", "a b x"),   // ref bigrams: "a b","b x" -> 1 of 2
      (2L, "a b", "z"))           // 1-token ref has no bigrams
      .toDF("id", "cand", "ref")
    val got = Quality.rougeN(pairs, "id", "cand", "ref", n = 2)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(got(1L).getAs[Long]("n_overlap") === 1L)
    assert(got(1L).getAs[Long]("n_ref") === 2L)
    assert(math.abs(got(1L).getAs[Double]("recall") - 0.5) < 1e-12)
    assert(got(2L).getAs[Long]("n_ref") === 0L)
    assert(got(2L).isNullAt(got(2L).fieldIndex("recall")))
  }
  test("chrF: whitespace/case-stripped identity = 1; orders without " +
    "grams drop out of the respective macro average") {
    val pairs = Seq(
      (1L, "A B cd", "ab cd"),  // cleaned both "abcd": identity
      (2L, "abcd", "ab"))       // asymmetric: precision pays, recall 1
      .toDF("id", "cand", "ref")
    val got = Quality.chrF(pairs, "id", "cand", "ref")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(math.abs(got(1L).getAs[Double]("chrf") - 1.0) < 1e-12)
    val r2 = got(2L)
    // P over cand orders 1..4: (2/4 + 1/3 + 0 + 0)/4; R over ref orders
    // 1..2: (1 + 1)/2 = 1; F2 = 5PR/(4P + R)
    val p = (0.5 + 1.0 / 3) / 4
    assert(math.abs(r2.getAs[Double]("chr_p") - p) < 1e-12)
    assert(math.abs(r2.getAs[Double]("chr_r") - 1.0) < 1e-12)
    assert(math.abs(r2.getAs[Double]("chrf") -
      5.0 * p / (4.0 * p + 1.0)) < 1e-12)
  }

  test("chrF: disjoint pair scores 0; empty side is a guarded 0") {
    val pairs = Seq((1L, "abc", "xyz"), (2L, "abc", " "))
      .toDF("id", "cand", "ref")
    val got = Quality.chrF(pairs, "id", "cand", "ref")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(got(1L).getAs[Double]("chrf") === 0.0)
    assert(got(2L).getAs[Double]("chr_r") === 0.0)
    assert(got(2L).getAs[Double]("chrf") === 0.0)
  }

  test("textRank: paraphrase pair holds the 1.0 fixpoint, the isolated " +
    "sentence drops to (1-d), ranks tie-break by sent_idx") {
    // s1 and s2 share 2 tokens (one edge each, wn = 1 both ways), s3 is
    // disconnected: WS(s1) = .15 + .85*WS(s2) keeps 1.0 exactly from
    // init 1.0; s3 gets no contribution -> (1-d) after any round >= 1.
    val docs = Seq((7L, "spark joins data. spark data flows! fish swim"))
      .toDF("doc_id", "text")
    val got = Quality.textRank(docs, "doc_id", "text", iterations = 10)
      .orderBy("sent_idx").collect()
    assert(got.map(_.getAs[Long]("sent_idx")).toSeq === Seq(1L, 2L, 3L))
    assert(got.map(_.getAs[String]("sentence")).toSeq ===
      Seq("spark joins data", "spark data flows", "fish swim"))
    assert(got.map(_.getAs[Long]("n_tokens")).toSeq === Seq(3L, 3L, 2L))
    assert(math.abs(got(0).getAs[Double]("score") - 1.0) < 1e-12)
    assert(math.abs(got(1).getAs[Double]("score") - 1.0) < 1e-12)
    assert(math.abs(got(2).getAs[Double]("score") - 0.15) < 1e-12)
    assert(got.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2, 3))
  }

  test("textRank: one hand-iterated round on an asymmetric triangle") {
    // s1{x,y} s2{x,z} s3{p,q,x}: w12 = 1/(2 ln 2), w13 = w23 =
    // 1/(ln 2 + ln 3); every node out-normalizes its two edges.
    val docs = Seq((1L, "x y. x z. p q x")).toDF("doc_id", "text")
    val w12 = 1.0 / (2 * math.log(2))
    val w13 = 1.0 / (math.log(2) + math.log(3))
    val os1 = w12 + w13 // = os2; os3 = 2 * w13
    def ws(in: Seq[Double]) = (1.0 - 0.85) + 0.85 * in.sum
    val exp = Seq(
      ws(Seq(w12 / os1, w13 / (2 * w13))), // into s1: from s2, s3
      ws(Seq(w12 / os1, w13 / (2 * w13))),
      ws(Seq(w13 / os1, w13 / os1)))
    val got = Quality.textRank(docs, "doc_id", "text", iterations = 1)
      .orderBy("sent_idx").collect().map(_.getAs[Double]("score"))
    got.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  test("textRank: score mass is conserved when every sentence has an " +
    "edge; iterations = 0 returns the 1.0 init; maxSentences truncates; " +
    "single-token pairs carry no edge") {
    val docs = Seq((1L, "red cat runs. red dog walks. cat dog sits"))
      .toDF("doc_id", "text")
    val sum = Quality.textRank(docs, "doc_id", "text", iterations = 10)
      .agg(org.apache.spark.sql.functions.sum("score")).head.getDouble(0)
    assert(math.abs(sum - 3.0) < 1e-9)
    val init = Quality.textRank(docs, "doc_id", "text", iterations = 0)
      .collect().map(_.getAs[Double]("score"))
    assert(init.forall(_ === 1.0))
    val cut = Quality.textRank(docs, "doc_id", "text", maxSentences = 2)
      .collect()
    assert(cut.map(_.getAs[Long]("sent_idx")).sorted.toSeq === Seq(1L, 2L))
    // "a. a": both sentences have 1 distinct token -> ln denominator 0,
    // no edge, both score (1-d); and an empty doc emits no rows
    val degen = Seq((1L, "a. a"), (2L, "   ")).toDF("doc_id", "text")
    val dg = Quality.textRank(degen, "doc_id", "text").collect()
    assert(dg.length === 2)
    assert(dg.forall(_.getAs[Long]("doc_id") === 1L))
    assert(dg.forall(r => math.abs(r.getAs[Double]("score") - 0.15) < 1e-12))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Joins, Splits}

/** Property checks of the compositional operators against brute-force
  * reference implementations on randomized (seed-deterministic) inputs \u2014
  * the window/bin/running-sum formulations must match the quadratic or
  * sequential semantics they re-express, not just hand-picked fixtures.
  */
class OperatorPropertySpec extends AnyFunSuite {

  /** Deterministic property sampling without the scalatestplus bridge. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asOfJoin == quadratic reference on random key/ts data") {
    val rnd = new scala.util.Random(7)
    val left = (1L to 120L).map(i =>
      (i, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))      // (id, key, ts)
    val right = (1L to 80L).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i * 10.0)) // (key, ts, px)
    // duplicate (key, ts) right rows stay IN the input: since the
    // struct-min pre-collapse, the operator guarantees the MINIMUM
    // payload among exact ties — the reference asserts it
    val expected = left.flatMap { case (id, k, ts) =>
      val eligible = right.filter(r => r._1 == k && r._2 <= ts)
      if (eligible.isEmpty) None
      else {
        val tsMax = eligible.map(_._2).max
        Some(id -> eligible.filter(_._2 == tsMax).map(_._3).min)
      }
    }.toMap
    val got = Joins.asOfJoin(
        left.toDF("id", "k", "ts"), right.toDF("k", "rts", "px"),
        "k", "ts", "rts", Seq("px"))
      .select("id", "asof_px").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === expected)
  }

  test("asOfJoinForward == quadratic reference, with and without tolerance") {
    val rnd = new scala.util.Random(11)
    val left = (1L to 120L).map(i =>
      (i, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val right = (1L to 80L).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i * 10.0))
    def expected(tol: Option[Long]) = left.flatMap { case (id, k, ts) =>
      val eligible = right.filter(r => r._1 == k && r._2 >= ts &&
        tol.forall(t => r._2 - ts <= t))
      // earliest eligible rts; exact-tie duplicates resolve to the
      // struct-MINIMUM payload (the pre-collapse guarantee)
      if (eligible.isEmpty) None
      else {
        val tsMin = eligible.map(_._2).min
        Some(id -> eligible.filter(_._2 == tsMin).map(_._3).min)
      }
    }.toMap
    for (tol <- Seq(None, Some(50L), Some(0L))) {
      val got = Joins.asOfJoinForward(
          left.toDF("id", "k", "ts"), right.toDF("k", "rts", "px"),
          "k", "ts", "rts", Seq("px"), toleranceSec = tol)
        .select("id", "asof_px").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === expected(tol), s"tolerance=$tol")
    }
  }

  test("asOfJoin with tolerance == bounded quadratic reference") {
    val rnd = new scala.util.Random(13)
    val left = (1L to 120L).map(i =>
      (i, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val right = (1L to 80L).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i * 10.0))
    for (tol <- Seq(0L, 50L, 500L)) {
      val expected = left.flatMap { case (id, k, ts) =>
        val eligible = right.filter(r => r._1 == k && r._2 <= ts)
        if (eligible.isEmpty) None
        else {
          val tsMax = eligible.map(_._2).max
          // the as-of pick itself is unbounded; the bound then gates it;
          // exact-tie duplicates resolve to the struct-minimum payload
          if (ts - tsMax <= tol)
            Some(id -> eligible.filter(_._2 == tsMax).map(_._3).min)
          else None
        }
      }.toMap
      val got = Joins.asOfJoin(
          left.toDF("id", "k", "ts"), right.toDF("k", "rts", "px"),
          "k", "ts", "rts", Seq("px"), toleranceSec = Some(tol))
        .select("id", "asof_px").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === expected, s"tol=$tol")
    }
  }

  test("snapshotDiff properties: statuses partition the key union; self-diff is all-unchanged; swap flips added/removed") {
    def snap(seed: Int): Seq[(Long, String, Double)] = {
      val r = new scala.util.Random(seed)
      (1L to 60L).filter(_ => r.nextDouble() > 0.2)
        .map(k => (k, s"s${r.nextInt(3)}", r.nextInt(5).toDouble))
    }
    val a = snap(1); val b = snap(2)
    val aDf = a.toDF("k", "s", "v"); val bDf = b.toDF("k", "s", "v")
    val diff = operators.Analytics.snapshotDiff(aDf, bDf, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // exactly one row per key in the union, statuses consistent with sets
    val (ka, kb) = (a.map(_._1).toSet, b.map(_._1).toSet)
    assert(diff.keySet === (ka ++ kb))
    assert(diff.filter(_._2 == "added").keySet === (kb -- ka))
    assert(diff.filter(_._2 == "removed").keySet === (ka -- kb))
    // self-diff: everything unchanged
    val self = operators.Analytics.snapshotDiff(aDf, aDf, Seq("k"), Seq("s", "v"))
      .collect().map(_.getString(1)).toSet
    assert(self === Set("unchanged"))
    // swapping sides flips added <-> removed and keeps changed/unchanged
    val rev = operators.Analytics.snapshotDiff(bDf, aDf, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    diff.foreach { case (k, st) =>
      val want = st match {
        case "added" => "removed"; case "removed" => "added"; case x => x
      }
      assert(rev(k) === want, s"k=$k")
    }
  }

  test("temperatureSample properties: subset, one-sided caps, monotone low-resource share in tau") {
    val rnd = new scala.util.Random(19)
    val rows = (1 to 500).map(i =>
      (i.toLong, s"g${if (i % 20 == 0) 3 else i % 3}", 1L + rnd.nextInt(30)))
    val df = rows.toDF("id", "g", "tok")
    val massIn = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum.toDouble).toMap
    val totIn = massIn.values.sum
    def shares(tau: Double): (Map[String, Double], Double) = {
      val kept = Splits.temperatureSample(df, "g", col("tok"), "id", tau, 0.4)
        .select("id", "g", "tok").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(kept.map(_._1).toSet.subsetOf(rows.map(_._1).toSet)) // subset
      assert(kept.length === kept.map(_._1).distinct.length)      // no dup
      val m = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum.toDouble).toMap
      // per-group kept mass never exceeds the tempered cap (one-sided)
      val w = massIn.view.mapValues(math.pow(_, tau)).toMap
      val tw = w.values.sum
      m.foreach { case (g, kg) =>
        assert(kg <= w(g) / tw * 0.4 * totIn + 1e-9, s"$g over cap at tau=$tau")
      }
      (m.view.mapValues(_ / m.values.sum).toMap, m.values.sum)
    }
    // the rare group's kept share grows monotonically as tau drops
    val rare = "g3"
    val s10 = shares(1.0)._1.getOrElse(rare, 0.0)
    val s05 = shares(0.5)._1.getOrElse(rare, 0.0)
    val s02 = shares(0.2)._1.getOrElse(rare, 0.0)
    assert(s05 >= s10 && s02 >= s05, s"not monotone: $s10 / $s05 / $s02")
  }

  test("rangeJoinBinned == inequality join on random values and ranges, many bin widths") {
    val vals = samples(Gen.choose(0.0, 400.0), 120).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val ranges = samples(Gen.zip(Gen.choose(0.0, 350.0), Gen.choose(1.0, 120.0)), 25)
      .zipWithIndex.map { case ((lo, w), i) => (i.toLong, lo, lo + w) }
    val valDf = vals.toDF("id", "v")
    val rangeDf = ranges.toDF("range_id", "lo", "hi")
    val expected = (for {
      (id, v) <- vals; (rid, lo, hi) <- ranges if v >= lo && v < hi
    } yield (id, rid)).toSet
    for (binWidth <- Seq(3.0, 50.0, 500.0)) {
      val got = Joins.rangeJoinBinned(valDf, "v", rangeDf, "lo", "hi", binWidth)
        .select("id", "range_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet === expected, s"binWidth=$binWidth")
      assert(got.length === expected.size, s"duplicates at binWidth=$binWidth")
    }
  }

  test("packByBudget invariants on random token counts") {
    val toks = samples(Gen.choose(1, 900), 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val budget = 1000L
    val packs = Splits.packByBudget(toks.toDF("id", "n_tok"), "id", "n_tok", budget)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy(_._1)
    // pack ids are non-decreasing in doc order and start at 0
    assert(packs.head._3 === 0L)
    assert(packs.sliding(2).forall(p => p(1)._3 >= p(0)._3))
    // a doc starts a new pack iff the tokens before it cross the boundary:
    // cumulative-before div budget IS the pack id
    var cum = 0L
    packs.foreach { case (_, t, pid) =>
      assert(pid === cum / budget)
      cum += t
    }
    // every pack's PRE-straddle content is under budget: the tokens before
    // the pack's last doc fit, by construction of the floor rule
    val byPack = packs.groupBy(_._3).toSeq.sortBy(_._1)
    byPack.foreach { case (_, ds) =>
      assert(ds.init.map(_._2.toLong).sum < budget)
    }
  }

  test("balancedDownsample invariants on random group sizes") {
    val rows = samples(Gen.choose(0, 6), 400).zipWithIndex
      .map { case (g, i) => (i.toLong, s"g$g") }
    val df = rows.toDF("id", "grp")
    val inSizes = rows.groupBy(_._2).map { case (g, rs) => g -> rs.size.toLong }
    for (cap <- Seq(1L, 17L, 60L, 1000L)) {
      val kept = Splits.balancedDownsample(df, Seq("grp"), cap, "id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val keptBy = kept.groupBy(_._2).map { case (g, rs) => g -> rs.size.toLong }
      // every group is capped at min(cap, its input size), exactly
      inSizes.foreach { case (g, n) =>
        assert(keptBy.getOrElse(g, 0L) === math.min(cap, n),
          s"group $g at cap $cap")
      }
      // output is a SUBSET of the input (no synthesis, no duplication)
      assert(kept.toSet.subsetOf(rows.toSet))
      assert(kept.length === kept.toSet.size)
    }
    // monotone membership: raising the cap only ADDS rows (prefix property
    // of the md5 ordering) \u2014 a cache of the small sample stays valid
    val at10 = Splits.balancedDownsample(df, Seq("grp"), 10L, "id")
      .collect().map(_.getLong(0)).toSet
    val at20 = Splits.balancedDownsample(df, Seq("grp"), 20L, "id")
      .collect().map(_.getLong(0)).toSet
    assert(at10.subsetOf(at20))
  }

  test("BPE on random corpora: segmentation always partitions, merges always help") {
    import graft.functions.Text
    val rnd = new scala.util.Random(23)
    val alphabet = "abcdef"
    val words = (1 to 300).map { i =>
      (i.toLong, (0 until (2 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val df = words.toDF("id", "text")
    val merges = Text.bpeMerges(df, "text", numMerges = 12)
    assert(merges.nonEmpty && merges.length <= 12)
    // every learned merge pair is two non-empty symbols
    merges.foreach { case (l, r) => assert(l.nonEmpty && r.nonEmpty) }
    val seg = df.select(col("text"), Text.bpeSegment(col("text"), merges).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1))
    seg.foreach { case (w, ts) =>
      assert(ts.mkString("") === w, s"'$w' must re-concatenate")
      assert(ts.forall(_.nonEmpty))
    }
    // token counts never increase as the merge list grows, prefix by prefix
    val counts = (0 to merges.length).map { k =>
      df.select(sum(size(Text.bpeSegment(col("text"), merges.take(k).toSeq))))
        .head().getLong(0)
    }
    assert(counts.sliding(2).forall(p => p(1) <= p(0)),
      s"token counts must be monotone non-increasing: $counts")
  }

  test("assignToCentroids == argmin over explicit distances on random vectors") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(11)
    val dim = 6
    val vecs = (1L to 150L).map(i =>
      (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val cents = (0 until 5).map(c =>
      Seq.fill(dim)(rnd.nextGaussian()))
    val got = Similarity.assignToCentroids(vecs.toDF("id", "v"), "id", "v",
        cents.indices, cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, v) =>
      val dists = cents.map(c =>
        v.zip(c).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum)
      val best = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      assert(got(id) === best, s"vector $id")
    }
  }

  test("unicode normalize/fold == java.text.Normalizer reference on random text") {
    import graft.functions.Text
    // mix ASCII, precomposed Latin, and combining marks \u2014 the crawl soup
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('\u00e0', '\u00e9', '\u00ee', '\u00f6', '\u00fc', '\u00f1', '\u00e7', '\u00c5'),
      1 -> Gen.oneOf('\u0300', '\u0301', '\u0302', '\u0308'),
      1 -> Gen.const(' '))
    val texts = samples(Gen.listOf(charGen).map(_.mkString), 150)
    def refNfc(s: String) =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    def refFold(s: String) = {
      val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder
      nfd.codePoints().forEach { cp =>
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          sb.appendCodePoint(cp)
      }
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC)
    }
    val got = texts.toDF("t")
      .select(Text.normalizeUnicode(col("t")).as("nfc"),
        Text.foldAccents(col("t")).as("f"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    texts.zip(got).foreach { case (t, (nfc, f)) =>
      assert(nfc === refNfc(t), s"NFC diverged on ${t.map(c => f"${c.toInt}%04x").mkString(" ")}")
      assert(f === refFold(t), s"fold diverged on ${t.map(c => f"${c.toInt}%04x").mkString(" ")}")
      // idempotence \u2014 the canonical forms are fixed points
      assert(refNfc(nfc) === nfc)
      assert(refFold(f) === f)
    }
  }

  test("knnLabelPropagation == quadratic majority-vote reference on random vectors") {
    val rnd = new scala.util.Random(11)
    def vec() = Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)
    val labeled = (1L to 60L).map(i => (i, vec(), rnd.nextInt(4)))
    val pool = (100L to 120L).map(i => (i, vec()))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val k = 5
    val expected = pool.map { case (qid, qv) =>
      val top = labeled.map { case (nid, lv, lab) => (cos(qv, lv), nid, lab) }
        .sortBy { case (c, nid, _) => (-c, nid) }.take(k)
      val votes = top.groupBy(_._3).view.mapValues(_.size).toMap
      val (lab, n) = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head
      qid -> ((lab, n.toLong))
    }.toMap
    val got = operators.Similarity.knnLabelPropagation(
        labeled.toDF("vec_id", "embedding", "label"),
        pool.toDF("vec_id", "embedding"),
        "vec_id", "embedding", "label", k)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(got === expected)
  }

  test("semDedup: capping can only ADD survivors, never merge spuriously") {
    // every capped component is a subset of an uncapped component, and the
    // min of the bigger set stays the min of the piece containing it \u2014 so
    // survivors(uncapped) \u2286 survivors(capped), at ANY cap
    val rnd = new scala.util.Random(13)
    def vec() = Seq.fill(4)((rnd.nextDouble() * 2 - 1).toFloat)
    val vecs = (1L to 80L).map(i => (i, vec())).toDF("vec_id", "embedding")
    val cells = Seq(0, 1)
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val uncapped = operators.Similarity.semDedup(vecs, "vec_id", "embedding",
        cells, cents, threshold = 0.6, maxCellSize = 1000000)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    for (cap <- Seq(5, 16, 40)) {
      val capped = operators.Similarity.semDedup(vecs, "vec_id", "embedding",
          cells, cents, threshold = 0.6, maxCellSize = cap)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(uncapped.subsetOf(capped),
        s"cap $cap lost survivors ${uncapped -- capped}")
    }
  }

  test("chunkKeepIdsVerified: raising the threshold only ADDS survivors") {
    // fewer verified edges \u21d2 components only split \u21d2 old minima remain
    val rnd = new scala.util.Random(17)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def sentence(n: Int) = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val shared = sentence(40)
    val docs = (1L to 30L).map { i =>
      val own = sentence(10 + rnd.nextInt(30))
      (i, if (i % 3 == 0) s"$own $shared" else s"$own ${sentence(20)}")
    }.toDF("doc_id", "text")
    val loose = operators.Dedup.chunkKeepIdsVerified(docs, "doc_id", "text",
        window = 4, maskBits = 2, threshold = 0.2)
      .collect().map(_.getLong(0)).toSet
    val strict = operators.Dedup.chunkKeepIdsVerified(docs, "doc_id", "text",
        window = 4, maskBits = 2, threshold = 0.8)
      .collect().map(_.getLong(0)).toSet
    assert(loose.subsetOf(strict), s"lost ${loose -- strict}")
    // and every doc is accounted for exactly once: survivors \u222a victims = all
    assert(strict.subsetOf((1L to 30L).toSet))
  }

  test("bleu == quadratic clipped-count reference on random token pairs") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("a", "b", "c")
    def sentence(n: Int) =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val pairs = (1L to 40L).map(i =>
      (i, sentence(rnd.nextInt(9)), sentence(rnd.nextInt(9))))
    def toks(s: String) =
      s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    def grams(t: Seq[String], n: Int) =
      if (t.length < n) Seq.empty[String]
      else t.sliding(n).map(_.mkString(" ")).toSeq
    def counts(g: Seq[String]) =
      g.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val expected = pairs.map { case (id, cand, ref) =>
      val (ct, rt) = (toks(cand), toks(ref))
      val pn = (1 to 4).map { n =>
        val cc = counts(grams(ct, n)); val rc = counts(grams(rt, n))
        val tot = cc.values.sum
        if (tot == 0) None
        else Some(cc.map { case (g, c) =>
          math.min(c, rc.getOrElse(g, 0L)) }.sum.toDouble / tot)
      }
      val bp =
        if (ct.length >= rt.length) 1.0
        else if (ct.nonEmpty) math.exp(1.0 - rt.length.toDouble / ct.length)
        else 0.0
      val bleu =
        if (pn.forall(p => p.exists(_ > 0)))
          bp * math.exp(pn.map(p => math.log(p.get)).sum / 4)
        else 0.0
      id -> (pn, bp, bleu)
    }.toMap
    val got = operators.Quality.bleu(
        pairs.toDF("id", "cand", "ref"), "id", "cand", "ref")
      .collect()
    assert(got.length === 40)
    got.foreach { r =>
      val id = r.getAs[Long]("id")
      val (pn, bp, bleu) = expected(id)
      (1 to 4).foreach { n =>
        val gp = if (r.isNullAt(r.fieldIndex(s"p$n"))) None
          else Some(r.getAs[Double](s"p$n"))
        (gp, pn(n - 1)) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12,
            s"id $id p$n: $a vs $b")
          case (a, b) => assert(a === b, s"id $id p$n nullness")
        }
      }
      assert(math.abs(r.getAs[Double]("bp") - bp) < 1e-12, s"id $id bp")
      assert(math.abs(r.getAs[Double]("bleu") - bleu) < 1e-12, s"id $id")
    }
  }

  test("bhFdr: p_adj matches the sequential suffix-min reference and the " +
    "rejection set equals the classic step-up cut") {
    val rnd = new scala.util.Random(29)
    val q = 0.15
    val tests = (1 to 60).map(i => (f"t$i%03d", rnd.nextInt(1000) / 999.0))
    val m = tests.size
    val sorted = tests.sortBy { case (t, p) => (p, t) }
    val raw = sorted.zipWithIndex.map { case ((_, p), i) =>
      m.toDouble * p / (i + 1) }
    val sfx = raw.scanRight(Double.MaxValue)(math.min).init
    val expAdj = sorted.zip(sfx).map { case ((t, _), s) =>
      t -> math.min(s, 1.0) }.toMap
    // classic step-up: reject ranks 1..k*, k* = max{k : p_(k) <= k q/m}
    val kStar = (1 to m).filter(k =>
      sorted(k - 1)._2 <= k.toDouble * q / m).lastOption.getOrElse(0)
    val expReject = sorted.take(kStar).map(_._1).toSet
    val got = operators.Stats.bhFdr(tests.toDF("test", "p"), "test", "p", q)
      .collect()
    assert(got.length === m)
    got.foreach { r =>
      val t = r.getAs[String]("test")
      assert(math.abs(r.getAs[Double]("p_adj") - expAdj(t)) < 1e-12, t)
      assert(r.getAs[Boolean]("rejected") === expReject.contains(t), t)
    }
  }

  test("queryLikelihood == sequential Dirichlet reference, every doc " +
    "ranked") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("a", "b", "c", "d")
    val docs = (1L to 30L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    val query = Seq("a", "c")
    val mu = 10.0
    val all = docs.map(_._2.split(" ").toSeq)
    val ctot = all.map(_.size).sum.toDouble
    val cf = query.map(t => t -> all.map(_.count(_ == t)).sum.toDouble).toMap
    val expected = docs.map { case (id, s) =>
      val t = s.split(" ").toSeq
      id -> query.map { term =>
        math.log((t.count(_ == term) + mu * (cf(term) / ctot)) /
          (t.size + mu))
      }.sum
    }.toMap
    val got = operators.Retrieval.queryLikelihood(
        docs.toDF("doc_id", "text"), "doc_id", "text", query,
        mu = mu, topK = 100)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(got.size === 30)
    got.foreach { case (id, s) =>
      assert(math.abs(s - expected(id)) < 1e-12, s"doc $id") }
  }

  test("alwaysValidSrm == sequential cumulative reference on random " +
    "bin data") {
    val rnd = new scala.util.Random(37)
    val rows = (1 to 400).map(_ => (rnd.nextInt(100) < 37, rnd.nextInt(12)))
    val p0 = 0.3
    val byBin = rows.groupBy(_._2).toSeq.sortBy(_._1)
    var (na, nb) = (0L, 0L)
    val tau = 1e-4
    val expected = byBin.map { case (bin, rs) =>
      na += rs.count(_._1); nb += rs.count(!_._1)
      val n = (na + nb).toDouble
      val share = na / n
      val diff = share - p0
      val v = p0 * (1.0 - p0) / n
      val le = 0.5 * math.log(v / (v + tau)) +
        diff * diff * tau / (2.0 * v * (v + tau))
      bin -> (na, nb, share, diff, le)
    }.toMap
    val got = operators.EventAnalytics.alwaysValidSrm(
        rows.toDF("isa", "bin"), col("isa"), col("bin"), p0)
      .collect()
    assert(got.length === byBin.size)
    got.foreach { r =>
      val (ena, enb, eshare, ediff, ele) = expected(r.getAs[Int]("bin"))
      assert(r.getAs[Long]("n_a") === ena && r.getAs[Long]("n_b") === enb)
      assert(math.abs(r.getAs[Double]("share_a") - eshare) < 1e-12)
      assert(math.abs(r.getAs[Double]("diff") - ediff) < 1e-12)
      assert(math.abs(r.getAs[Double]("log_e_value") - ele) < 1e-9)
    }
  }

  test("facilityLocationSelect == sequential greedy reference on random " +
    "vectors, stable under repartition") {
    val rnd = new scala.util.Random(17)
    val pool = (1L to 40L).map(i =>
      (i, Seq.fill(5)((rnd.nextDouble() * 2 - 1).toFloat)))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val s = (for ((ci, cv) <- pool; (pi, pv) <- pool)
      yield (ci, pi) -> cos(cv, pv)).toMap
    val ids = pool.map(_._1)
    // the operator's semantics: round 1 always keeps its argmax, later
    // rounds stop BEFORE adding a gain <= 0 pick
    var cover = ids.map(_ -> 0.0).toMap
    var expected = Vector.empty[(Long, Int, Double)]
    var stop = false
    for (r <- 1 to 6 if !stop) {
      val cands = ids.filterNot(c => expected.exists(_._1 == c))
      val (bc, bg) = cands
        .map(c => c -> ids.map(v => math.max(0.0, s((c, v)) - cover(v))).sum)
        .minBy { case (c, g) => (-g, c) }
      if (r > 1 && bg <= 0) stop = true
      else {
        expected :+= ((bc, r, bg))
        cover = ids.map(v => v -> math.max(cover(v), s((bc, v)))).toMap
      }
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      operators.Similarity.facilityLocationSelect(df, "id", "vec", k = 6)
        .orderBy("rank").collect()
        .map(r => (r.getLong(0), r.getAs[Int]("rank"),
          r.getAs[Double]("gain")))
    val base = pool.toDF("id", "vec")
    for (got <- Seq(run(base), run(base.repartition(7)))) {
      assert(got.map(t => (t._1, t._2)).toSeq ===
        expected.map(t => (t._1, t._2)))
      got.zip(expected).foreach { case (g, e) =>
        assert(math.abs(g._3 - e._3) < 1e-9, s"gain drift at rank ${e._2}")
      }
    }
  }

  test("textRank == sequential weighted-PageRank reference on random " +
    "multi-sentence docs, stable under repartition") {
    val rnd = new scala.util.Random(23)
    val vocab = Seq("ash", "birch", "cedar", "dune", "elm", "fern",
      "gale", "heron", "iris", "jade", "kelp", "loch")
    def sentence() =
      Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    val docs = (1L to 30L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(8))(sentence()).mkString(". ")))
    val d = 0.85
    def ref(text: String): Seq[Double] = {
      val sents = text.trim.split("[.!?]+\\s+").filter(_.nonEmpty).take(64)
      val toks = sents.map(_.toLowerCase.split("[^a-z0-9]+")
        .filter(_.nonEmpty).toSet)
      val n = sents.length
      val w = Array.tabulate(n, n) { (i, j) =>
        if (i == j) 0.0 else {
          val ov = toks(i).intersect(toks(j)).size.toDouble
          val den = math.log(toks(i).size.toDouble) +
            math.log(toks(j).size.toDouble)
          if (ov > 0 && den > 0) ov / den else 0.0
        }
      }
      val os = Array.tabulate(n)(i => w(i).sum)
      var sc = Array.fill(n)(1.0)
      for (_ <- 1 to 10) {
        sc = Array.tabulate(n) { i =>
          (1 - d) + d * (0 until n).map(j =>
            if (w(j)(i) > 0) w(j)(i) / os(j) * sc(j) else 0.0).sum
        }
      }
      sc.toSeq
    }
    val expected = docs.flatMap { case (id, text) =>
      ref(text).zipWithIndex.map { case (v, i) => (id, i + 1L) -> v }
    }.toMap
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Quality.textRank(df, "doc_id", "text",
          iterations = 10, damping = d)
        .collect()
        .map(r => (r.getLong(0), r.getAs[Long]("sent_idx")) ->
          r.getAs[Double]("score")).toMap
    val base = docs.toDF("doc_id", "text")
    for (got <- Seq(run(base), run(base.repartition(7)))) {
      assert(got.keySet === expected.keySet)
      got.foreach { case (k, v) =>
        assert(math.abs(v - expected(k)) < 1e-9, s"score drift at $k")
      }
    }
  }

  test("dbscan == sequential union-find reference on random vectors " +
    "across minPts settings") {
    val rnd = new scala.util.Random(29)
    val pts = (1L to 80L).map(i =>
      (i, Seq.fill(4)((rnd.nextDouble() * 2 - 1).toFloat)))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val th = 0.5
    val edges = for {
      (ia, va) <- pts; (ib, vb) <- pts
      if ia < ib && cos(va, vb) >= th
    } yield (ia, ib)
    val df = pts.toDF("id", "vec")
    val pairsDf = operators.Dedup.embeddingNearDupExact(
      df, "id", "vec", threshold = th, maxRows = 100)
    for (minPts <- Seq(1, 2, 3, 5)) {
      val deg = edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val core = pts.map(_._1).filter(i =>
        deg.getOrElse(i, 0L) + 1 >= minPts).toSet
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        if (core(a) && core(b)) {
          val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
        }
      }
      val label = core.map(c => c -> core.filter(find(_) == find(c)).min)
        .toMap
      val expected = pts.map(_._1).map { i =>
        val nbrs = edges.collect {
          case (a, b) if a == i => b
          case (a, b) if b == i => a
        }
        val coreNbrLabels = nbrs.filter(core).map(label)
        val (role, cl): (String, Option[Long]) =
          if (core(i)) ("core", Some(label(i)))
          else if (coreNbrLabels.nonEmpty) ("border", Some(coreNbrLabels.min))
          else ("noise", None)
        i -> ((deg.getOrElse(i, 0L), core(i), cl, role))
      }.toMap
      val got = operators.Similarity.dbscan(df, "id", pairsDf, minPts)
        .collect().map { r =>
          r.getLong(0) -> ((r.getAs[Long]("n_neighbors"),
            r.getAs[Boolean]("is_core"),
            Option(r.getAs[java.lang.Long]("cluster")).map(_.toLong),
            r.getAs[String]("role")))
        }.toMap
      assert(got === expected, s"minPts=$minPts")
    }
  }
}

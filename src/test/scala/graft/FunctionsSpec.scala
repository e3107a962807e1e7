package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{Derived, Text}

class FunctionsSpec extends AnyFunSuite {

  /** Deterministic property sampling without the scalatestplus bridge
    * (offline resolver has scalatest + scalacheck only).
    */
  private def samples[A](g: Gen[A], n: Int = 40): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("timeOfDay: every hour lands in exactly one bucket (nb:1582-1587)") {
    val got = (0 to 23).map(h => f"2021-01-01 $h%02d:00:00")
      .toDF("s").select(Derived.timeOfDay(col("s").cast("timestamp")).as("tod"))
      .as[String].collect()
    assert(got.slice(5, 12).forall(_ == "morning"))
    assert(got.slice(12, 17).forall(_ == "afternoon"))
    assert(got.slice(17, 22).forall(_ == "evening"))
    assert((got.take(5) ++ got.drop(22)).forall(_ == "night"))
  }

  test("durationSeconds matches wall-clock subtraction for arbitrary offsets") {
    val base = java.sql.Timestamp.valueOf("2021-06-15 12:00:00")
    val offsets = samples(Gen.choose(-86400L, 86400L), 50)
    val rows = offsets.map(o => (base, new java.sql.Timestamp(base.getTime + o * 1000)))
    val got = rows.toDF("s", "e")
      .select(Derived.durationSeconds(col("e"), col("s"))).as[Long].collect()
    assert(got.toSeq === offsets)
  }

  test("tokenCount: whitespace runs, blank handling") {
    val df = Seq("a b  c", "  ", "", "one", "a\tb\nc d").toDF("text")
      .select(Text.tokenCount(col("text")).as("n")).as[Int].collect()
    assert(df.toSeq === Seq(3, 0, 0, 1, 4))
  }

  test("languageId picks dominant stopword language, und on no signal") {
    val rows = Seq(
      "the cat sat on the mat and the dog",   // en
      "der hund und die katze ist nicht da",  // de
      "le chat et les chiens est pour que",   // fr
      "el perro que los gatos es por con",    // es
      "zzz qqq xxx").toDF("text")
      .select(Text.languageId(col("text"))).as[String].collect()
    assert(rows.toSeq === Seq("en", "de", "fr", "es", "und"))
  }

  test("qualityScore stays in [0,1]") {
    val texts = samples(Gen.asciiPrintableStr, 60) ++
      Seq("", "    ", "ALL CAPS!!!!", "1234567890", "a" * 2000)
    val vals = texts.toDF("text")
      .select(Text.qualityScore(col("text"))).as[Double].collect()
    vals.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("shingles: n-gram windows over tokens") {
    val got = Seq("The quick brown fox").toDF("t")
      .select(Text.shingles(col("t"), 2)).head().getSeq[String](0)
    assert(got === Seq("the quick", "quick brown", "brown fox"))
    val short = Seq("one").toDF("t")
      .select(Text.shingles(col("t"), 2)).head().getSeq[String](0)
    assert(short.isEmpty)
  }

  test("native shingles equal the SQL split(lower(trim(...))) formulation, incl. tab/newline edges") {
    // trim must strip SPACES only (SQL semantics): a tab/newline-edged text
    // keeps its leading separator, so \s+ split yields a leading empty
    // token — Java String.trim would silently drop it and shingle sets
    // would diverge from the DuckDB oracles (q75/q86/q88/q89)
    val texts = Seq("The quick brown fox", "\ttab edge lead", "nl trail\n",
      "  spaces  only  ", "mid\t\ntab", "")
    val df = texts.toDF("text")
    val got = df.select(Text.shingles(col("text"), 2)).as[Seq[String]].collect()
    val toks = "split(lower(trim(text)), '\\\\s+')"
    val ref = df.select(expr(
        s"CASE WHEN size($toks) >= 2 THEN transform(sequence(1, size($toks) - 1), " +
        s"i -> concat_ws(' ', slice($toks, i, 2))) ELSE slice($toks, 1, 0) END"))
      .as[Seq[String]].collect()
    got.zip(ref).zip(texts).foreach { case ((g, r), t) =>
      assert(g === r, s"diverged on ${t.replace("\t", "\\t").replace("\n", "\\n")}")
    }
  }

  test("native fingerprint equals the SQL xxhash64(regexp_replace(...)) formulation") {
    val texts = Seq("Hello  World", "  padded  ", "tab\tsep", "line\nbreak",
      "\t edge tab", "", "MiXeD Case   runs")
    val df = texts.toDF("text")
    val got = df.select(Text.fingerprint(col("text"))).as[Long].collect()
    val ref = df.select(
      xxhash64(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .as[Long].collect()
    assert(got.toSeq === ref.toSeq)
  }

  test("custom expressions callable from SQL (GraftExtensions)") {
    Seq((1L, "the quick brown fox"), (2L, "the  QUICK brown fox"))
      .toDF("id", "text").createOrReplaceTempView("ext_docs")
    val fp = spark.sql(
      "SELECT id, graft_norm_fingerprint(text) AS fp, " +
        "graft_simhash(text, 2, 64) AS sh, " +
        "size(graft_shingles(text, 2)) AS n_sh FROM ext_docs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(fp(0)._2 === fp(1)._2) // normalized fingerprints collapse ws/case
    assert(fp(0)._3 === fp(1)._3)
    assert(fp(0)._4 === 3)
    val cos = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    // the round-6 registrations: scalar, array, and AGGREGATE expressions
    val more = spark.sql(
      "SELECT graft_lang_id(text) AS lang, " +
        "graft_simhash_md5(text, 2) AS shm, " +
        "size(graft_chunk_hashes(text, 4, 2)) AS n_ch FROM ext_docs")
      .collect()
    assert(more.forall(_.getString(0) == "en"))
    assert(more.map(_.getLong(1)).distinct.length === 1) // normalization collapses
    assert(more.forall(_.getInt(2) >= 1))
    val sk = spark.sql(
      "SELECT size(graft_minhash_union(graft_minhash_sig(text, 2, 16), 16)) " +
        "FROM ext_docs").head().getInt(0)
    assert(sk === 16) // constant-size union sketch regardless of group size
    val bpe = spark.sql(
      "SELECT graft_bpe_segment('newest', array('e s', 'es t')) AS t")
      .head().getSeq[String](0)
    assert(bpe === Seq("n", "e", "w", "est"))
    val uni = spark.sql(
      "SELECT graft_nfc('cafe\u0301') AS n, graft_fold_accents('cafe\u0301') AS f")
      .head()
    assert(uni.getString(0) === "caf\u00e9" && uni.getString(1) === "cafe")
  }

  test("bpeMerges learns the classic merge sequence; segmentation partitions words") {
    import graft.functions.Text
    // the BPE-paper corpus shape: low x5, lower x2, newest x6, widest x3
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    val merges = Text.bpeMerges(docs, "text", numMerges = 4)
    // hand-derived: (e,s)=9 beats (s,t)=9 lexicographically; then (es,t)=9;
    // then (l,o)=7 beats (o,w); then (lo,w)=7
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    val toks = docs
      .select(col("text"), Text.bpeSegment(col("text"), merges).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1))
    toks.foreach { case (w, ts) =>
      assert(ts.mkString("") === w, s"'$w' must re-concatenate from subwords")
    }
    assert(toks.find(_._1 == "low").get._2 === Seq("low"))
    assert(toks.find(_._1 == "newest").get._2 === Seq("n", "e", "w", "est"))
    // more merges never increase the subword count
    val more = Text.bpeMerges(docs, "text", numMerges = 8)
    def total(ms: Seq[(String, String)]) = docs
      .select(size(Text.bpeSegment(col("text"), ms))).as[Int].collect().sum
    assert(total(more) <= total(merges))
    // the loop exhausts gracefully once every word is a single symbol
    assert(Text.bpeMerges(docs, "text", numMerges = 1000).length < 1000)
    // multi-word text segments per word; whitespace never becomes a token
    val multi = Seq((1L, "newest low")).toDF("id", "text")
      .select(Text.bpeSegment(col("text"), merges)).head().getSeq[String](0)
    assert(multi === Seq("n", "e", "w", "est", "low"))
  }

  test("conform: identity rename+cast preserves data (P1/P2 property)") {
    import graft.sources.Tables
    val df = Seq((1, "a"), (2, "b")).toDF("x", "y")
    val out = Tables.conform(df, Map.empty, Map.empty)
    assert(out.schema === df.schema)
    assert(out.collect().toSeq === df.collect().toSeq)
  }

  test("redactPii masks emails, SSNs, phones, and card numbers") {
    import graft.functions.Text
    val dirty = Seq(
      "mail me at jane.doe+x@corp.example.org today",
      "ssn 123-45-6789 leaked",
      "call (312) 555-0199 or +1 312.555.0199",
      "card 4111 1111 1111 1111 on file",
      "clean text stays untouched"
    ).toDF("t")
    val got = dirty.select(Text.redactPii(col("t")).as("r"))
      .collect().map(_.getString(0))
    assert(got(0) === "mail me at <EMAIL> today")
    assert(got(1) === "ssn <SSN> leaked")
    assert(got(2).contains("<PHONE>") && !got(2).exists(_.isDigit))
    assert(got(3) === "card <CARD> on file") // separator NOT eaten by the match
    assert(got(4) === "clean text stays untouched")
  }

  test("luhnValid: known-good cards pass, off-by-one digits and bad lengths fail") {
    import graft.functions.Text
    val cases = Seq(
      ("4111111111111111", true),   // classic Visa test number
      ("4111111111111112", false),  // checksum off by one
      ("378282246310005", true),    // 15-digit Amex test number
      ("6011111111111117", true),   // Discover test number
      ("123456789012", false),      // 12 digits: below card length
      ("12345678901234567890", false)) // 20 digits: above
    val got = cases.map(_._1).toDF("d")
      .select(col("d"), Text.luhnValid(col("d")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (d, want) => assert(got(d) === want, d) }
  }

  test("piiScan: per-family counts with Luhn-gated card validity") {
    import graft.operators.Quality
    val rows = Seq(
      (1L, "mail a@b.co and c@d.org, card 4111 1111 1111 1111 ok"),
      (2L, "fake card 4111 1111 1111 1112 fails luhn"),
      (3L, "ssn 123-45-6789 call (312) 555-0199"),
      (4L, "nothing here")).toDF("id", "text")
    val got = Quality.piiScan(rows, "id", "text").orderBy("id").collect()
    assert(got(0).getAs[Long]("n_emails") === 2L)
    assert(got(0).getAs[Long]("n_card_candidates") === 1L)
    assert(got(0).getAs[Long]("n_cards_valid") === 1L)
    assert(got(1).getAs[Long]("n_card_candidates") === 1L)
    assert(got(1).getAs[Long]("n_cards_valid") === 0L)
    assert(got(2).getAs[Long]("n_ssns") === 1L)
    assert(got(2).getAs[Long]("n_phones") === 1L)
    assert(got(3).toSeq.drop(1).forall(_ == 0L))
  }

  test("stripHtml drops script/style content, flattens tags, unescapes once") {
    import graft.functions.Text
    val pages = Seq(
      // script CONTENT (with < > operators inside) vanishes wholesale
      "<p>keep</p><script type=\"x\">if (1 < 2 && 3 > 0) { bad(); }</script><b>this</b>",
      "<style>p { color: red; }</style>text",
      // entities unescape exactly once: &amp;lt; is a LITERAL "&lt;"
      "a &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp; more &amp;lt;",
      // multiline tag + whitespace collapse + trim
      "  <div\n class='x'>\n  spaced   out\n</div>  ",
      "no markup at all"
    ).toDF("t")
    val got = pages.select(Text.stripHtml(col("t")).as("r"))
      .collect().map(_.getString(0))
    assert(got(0) === "keep this")
    assert(got(1) === "text")
    assert(got(2) === "a <tag> \"q\" 's' & more &lt;")
    assert(got(3) === "spaced out")
    assert(got(4) === "no markup at all")
  }

  test("normalizeUnicode: NFC composes; foldAccents strips marks either way") {
    import spark.implicits._
    import graft.functions.Text
    val composed = "caf\u00e9"            // é as one codepoint
    val decomposed = "cafe\u0301"         // e + combining acute
    val df = Seq(composed, decomposed, "plain ascii", "\u00dcber na\u00efve")
      .toDF("t")
      .select(Text.normalizeUnicode(col("t")).as("nfc"),
        Text.normalizeUnicode(col("t"), "NFD").as("nfd"),
        Text.foldAccents(col("t")).as("folded"))
    val got = df.collect()
    // both spellings canonicalize to the SAME bytes under NFC…
    assert(got(0).getString(0) === composed)
    assert(got(1).getString(0) === composed)
    // …and to the same decomposed bytes under NFD
    assert(got(0).getString(1) === decomposed)
    assert(got(1).getString(1) === decomposed)
    // folding reaches plain ASCII from either spelling
    assert(got(0).getString(2) === "cafe" && got(1).getString(2) === "cafe")
    // ASCII fast path: identity
    assert(got(2).getString(0) === "plain ascii" &&
      got(2).getString(2) === "plain ascii")
    assert(got(3).getString(2) === "Uber naive")
  }

  test("unicode normalization fixes the dedup miss it exists for") {
    import spark.implicits._
    import graft.functions.Text
    // one document, two crawl encodings: exact dedup misses them raw,
    // catches them after NFC
    val docs = Seq((1L, "r\u00e9sum\u00e9 text"), (2L, "re\u0301sume\u0301 text"))
      .toDF("id", "text")
    assert(docs.select(md5(col("text"))).distinct().count() === 2)
    assert(docs.select(md5(Text.normalizeUnicode(col("text"))))
      .distinct().count() === 1)
  }

  test("preTokenize splits like GPT-2's pre-tokenizer (RE2 subset)") {
    import graft.functions.Text
    val got = Seq("don't stop, it's 42 now!")
      .toDF("t").select(Text.preTokenize(col("t"))).collect()(0)
      .getSeq[String](0)
    assert(got === Seq("don", "'t", " stop", ",", " it", "'s", " 42",
      " now", "!"))
    // every character lands in exactly one pre-token (spaces before words
    // attach; the split is a partition of the non-discarded chars)
    assert(got.mkString === "don't stop, it's 42 now!")
  }

  test("tokenizerFertility: per-group token/word/char arithmetic") {
    import graft.operators.Analytics
    val docs = Seq(
      ("en", "don't stop"),          // 3 pre-tokens, 2 words, 10 chars
      ("en", "go now"),              // 2 pre-tokens, 2 words, 7... chars=6
      ("zh", "\u4f60\u597d\u4e16\u754c")  // one non-Latin-run pre-token
    ).toDF("lang", "text")
    val got = Analytics.tokenizerFertility(docs, "lang", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got("en") === ((2L, 4L, 5L, 1.25, 3.2)))
    // CJK: the whole run is ONE pre-token under a Latin-centric split —
    // fertility 1 per "word", but 4 chars compress into 1 token
    assert(got("zh") === ((1L, 1L, 1L, 1.0, 4.0)))
  }

  test("bpeCompressionAudit: byte/token arithmetic, UTF-8 bytes, " +
    "empty docs and per-doc quantiles") {
    import graft.operators.Analytics
    val docs = Seq(
      ("web", "ab ab"),  // 5 bytes; both words merge to 1 token -> 2
      ("web", "abc"),    // 3 bytes; [ab, c] -> 2 tokens
      ("wiki", "xyz"),   // 3 bytes; no merges apply -> 3 tokens
      ("wiki", ""),      // 0 bytes, 0 tokens -> null ratio, skipped
      ("utf", "éé") // 4 UTF-8 bytes, 2 chars -> 2 tokens
    ).toDF("source", "text")
    val got = Analytics.bpeCompressionAudit(docs, "source", "text",
        Seq("a" -> "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val web = got("web")
    assert((web.getLong(1), web.getLong(2), web.getLong(3)) === ((2L, 8L, 4L)))
    assert(web.getDouble(4) === 2.0) // 8 bytes / 4 tokens
    assert(web.getDouble(5) === 2.0) // median of {2.5, 1.5}
    assert(math.abs(web.getDouble(6) - 2.45) < 1e-9) // 1.5 + 0.95*(2.5-1.5)
    val wiki = got("wiki")
    // the empty doc counts, contributes no bytes/tokens, and its null
    // ratio is skipped by both engines' percentiles
    assert((wiki.getLong(1), wiki.getLong(2), wiki.getLong(3)) === ((2L, 3L, 3L)))
    assert(wiki.getDouble(4) === 1.0)
    assert(wiki.getDouble(5) === 1.0 && wiki.getDouble(6) === 1.0)
    val utf = got("utf")
    assert((utf.getLong(2), utf.getLong(3)) === ((4L, 2L))) // bytes, not chars
    assert(utf.getDouble(4) === 2.0)
    // a TRAINED merge table composes: the audit's token total equals the
    // segmentation's, and bytes_per_token is their exact quotient
    val corpus = Seq(("w", "low lower lowest low low"),
      ("w", "new newer newest new")).toDF("source", "text")
    val merges = Text.bpeMerges(corpus, "text", numMerges = 6)
    val audit = Analytics.bpeCompressionAudit(corpus, "source", "text", merges)
      .collect().head
    val toks = corpus.select(
        org.apache.spark.sql.functions.sum(
          size(Text.bpeSegment(col("text"), merges)).cast("long")))
      .collect().head.getLong(0)
    assert(audit.getLong(3) === toks)
    assert(audit.getDouble(4) ===
      BigDecimal(audit.getLong(2).toDouble / toks)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("normalizeUnicode/foldAccents are null-safe and idempotent") {
    import spark.implicits._
    import graft.functions.Text
    val df = Seq(Some("tri\u0301ky"), None).toDF("t")
    val got = df.select(
        Text.normalizeUnicode(col("t")).as("n"),
        Text.foldAccents(Text.foldAccents(col("t"))).as("ff"),
        Text.foldAccents(col("t")).as("f"))
      .collect()
    assert(got(0).getString(1) === got(0).getString(2)) // fold∘fold = fold
    assert(got(1).isNullAt(0) && got(1).isNullAt(1))
  }

  test("topKPerGroup == the window formulation on random multi-partition data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    // few groups, many rows, deliberate score ties → the tiebreak matters;
    // 8 partitions force the merge (partial-aggregation) path
    val df = Seq.tabulate(5000)(i =>
      (s"g${rnd.nextInt(7)}", rnd.nextInt(40).toDouble, i.toLong))
      .toDF("g", "score", "id").repartition(8)
    val got = graft.operators.Analytics
      .topKPerGroup(df, Seq("g"), "score", "id", k = 5)
      .select("g", "rank", "ord", "tie")
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getDouble(2), r.getLong(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select("g", "rank", "score", "id")
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getDouble(2), r.getLong(3))).toSet
    assert(got === want)
  }

  test("topKPerGroup: groups smaller than k return all rows; nulls skipped") {
    import spark.implicits._
    val df = Seq(("g", Some(2.0), 1L), ("g", Some(1.0), 2L),
      ("g", None: Option[Double], 3L)).toDF("g", "score", "id")
    val got = graft.operators.Analytics
      .topKPerGroup(df, Seq("g"), "score", "id", k = 10)
      .select("rank", "tie").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toSeq.sorted
    assert(got === Seq(1 -> 1L, 2 -> 2L)) // null ord never ranks
  }
}

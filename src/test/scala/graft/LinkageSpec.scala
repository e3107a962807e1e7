package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Linkage

/** [[Linkage]] — DuckDB-exact Jaro-Winkler reference values, blocking
  * recall against brute force, entity resolution, and Aho-Corasick ≡
  * naive-contains equivalence.
  */
class LinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jwOf(a: String, b: String): (Double, Double) = {
    val r = Seq((a, b)).toDF("a", "b")
      .select(Linkage.jaro($"a", $"b"), Linkage.jaroWinkler($"a", $"b"))
      .head
    (r.getDouble(0), r.getDouble(1))
  }

  test("jaroWinkler: DuckDB-exact reference values") {
    // exact doubles sampled from duckdb 1.0 jaro_winkler_similarity
    assert(jwOf("martha", "marhta")._2 === 0.9611111111111111)
    assert(jwOf("dwayne", "duane")._2 === 0.8400000000000001)
    assert(jwOf("abcdefgh", "abcdefg")._2 === 0.975)
    assert(jwOf("aaaaaaaaaa", "aaaaa")._2 === 0.9) // prefix boost caps at 4
    // integer transposition halving (textbook t/2.0 would give 0.6797…)
    assert(jwOf("dg dccbd", "dcfg ec")._2 === 0.7417857142857143)
    // boost fires only above 0.7 — this pair stays at raw jaro
    assert(jwOf("aXXXXX", "aYYYYY")._2 === 0.4444444444444444)
    assert(jwOf("aXXXXX", "aYYYYY")._1 === 0.4444444444444444)
    // empties are 0 (DuckDB convention, incl. both-empty), disjoint is 0
    assert(jwOf("", "")._2 === 0.0)
    assert(jwOf("a", "")._2 === 0.0)
    assert(jwOf("abc", "xyz")._2 === 0.0)
    assert(jwOf("ab", "ba")._2 === 0.0) // window 0: no cross-position match
    assert(jwOf("ab", "a")._2 === 0.8500000000000001)
    assert(jwOf("same", "same")._2 === 1.0)
  }

  test("jaroWinkler: symmetric and null-safe") {
    val pairs = Seq(("small ring", "small rng"), ("red widget", "blue bolt"))
      .toDF("a", "b")
    val fwd = pairs.select(Linkage.jaroWinkler($"a", $"b")).collect().map(_.getDouble(0))
    val rev = pairs.select(Linkage.jaroWinkler($"b", $"a")).collect().map(_.getDouble(0))
    assert(fwd.toSeq === rev.toSeq)
    val n = Seq(("x", null: String)).toDF("a", "b")
      .select(Linkage.jaroWinkler($"a", $"b")).head
    assert(n.isNullAt(0))
  }

  test("jaroWinklerGte: gate is sound and survivors are bit-equal (fuzz)") {
    // the threshold-gated verification path must (a) never report >= minSim
    // for a pair whose true jw is below it, and (b) return the EXACT
    // ungated double for any pair at-or-above it — including minSim
    // slightly below the true value (the rounding-margin call shape).
    import graft.functions.expressions.JaroUtil
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefgh " // small alphabet: plenty of near-misses
    def randStr(): String =
      (0 until (1 + rnd.nextInt(40))).map(i => alpha(rnd.nextInt(alpha.length))).mkString
    var checked = 0
    (0 until 20000).foreach { _ =>
      val a = randStr(); val b = if (rnd.nextBoolean()) randStr()
        else a.patch(rnd.nextInt(a.length), "", 1) // near-duplicate
      val ca = JaroUtil.codePoints(org.apache.spark.unsafe.types.UTF8String.fromString(a))
      val cb = JaroUtil.codePoints(org.apache.spark.unsafe.types.UTF8String.fromString(b))
      val exact = JaroUtil.jaroWinkler(ca, cb)
      Seq(0.5, 0.7, 0.9 - 1e-6, 0.94 - 1e-6, exact - 1e-9).foreach { t =>
        val gated = JaroUtil.jaroWinklerGte(ca, cb, t)
        if (exact >= t) { assert(gated === exact, s"'$a' vs '$b' at $t"); checked += 1 }
        else assert(gated < t, s"'$a' vs '$b' at $t: gated=$gated exact=$exact")
      }
    }
    assert(checked > 1000) // the exact-path branch was actually exercised
  }

  test("blocking: 100% recall on planted single-deletion links, >=99% overall") {
    // the q202 corpus at sf0.001: titles + one-char-deleted copies
    val docs = sources.Tables.loadDocuments(spark, "/root/testdata/sf0.001")
    val clean = docs.select(col("doc_id").as("id"),
      array_join(slice(split(lower(trim(col("text"))), "\\s+"), 1, 6), " ").as("key"))
    val dirty = clean.withColumn("__p", (col("id") % length(col("key"))).cast("int"))
      .select((col("id") + 1000000L).as("id"),
        concat(col("key").substr(lit(1), col("__p")),
          col("key").substr(col("__p") + 2, length(col("key")))).as("key"))
    val all = clean.unionAll(dirty).cache()

    val brute = all.select(col("id").as("id_a"), col("key").as("key_a"))
      .crossJoin(all.select(col("id").as("id_b"), col("key").as("key_b")))
      .where(col("id_a") < col("id_b"))
      .withColumn("jw", round(Linkage.jaroWinkler(col("key_a"), col("key_b")), 6))
      .where(col("jw") >= 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Linkage.linkPairs(all, "id", "key", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(blocked.subsetOf(brute), "blocking must never invent pairs")
    // planted links: every (id, id+1e6) pair that brute force admits
    val planted = brute.filter { case (a, b) => b == a + 1000000L }
    assert(planted.forall(blocked.contains),
      s"missed planted links: ${planted.diff(blocked).take(5)}")
    val recall = blocked.size.toDouble / brute.size
    assert(recall >= 0.99, s"overall recall $recall (${brute.size - blocked.size} missed)")
    all.unpersist()
  }

  test("skew cap: a hot block sub-buckets, pair count collapses, a " +
    "near-identical flood still resolves to one entity") {
    // 600 near-identical keys (one trailing char varies among 3 letters —
    // every pair JW >= 0.9) + 20 distinct controls. With the default
    // passes the flood shares every block key; uncapped that is
    // 600·599/2 ≈ 180k candidates per pass.
    val flood = (0 until 600).map(i =>
      (i.toLong, s"acme global holdings ltd ${('x' + i % 3).toChar}"))
    val ctrl = (0 until 20).map(i =>
      (1000L + i, s"unique entity number $i variant ${i * 37}"))
    val recs = (flood ++ ctrl).toDF("id", "key")
    val capped = Linkage.blockedPairs(recs, "id", "key",
      maxBlockSize = 50)
    val nCapped = capped.count()
    // per pass: ~12 subs × C(50,2) ≈ 15k within + 11 chain; 3 passes,
    // deduped — must land far under the ~180k uncapped flood
    assert(nCapped < 60000L, s"cap ineffective: $nCapped candidate pairs")
    // the flood must still resolve into ONE entity through the rep chain
    val ents = Linkage.resolveEntities(recs, "id", "key", 0.9,
        maxBlockSize = 50)
      .where(col("id") < 1000L)
      .select("entity").distinct().collect()
    assert(ents.length === 1, s"flood split into ${ents.length} entities")
    // and blocks <= cap are byte-identical to the uncapped operator
    val small = recs.where(col("id") >= 1000L)
    val a = Linkage.blockedPairs(small, "id", "key")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Linkage.blockedPairs(small, "id", "key", maxBlockSize = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("resolveEntities: transitive chain closes, singleton survives") {
    // b is 1 edit from a, c is 1 edit from b but 2 from a: one entity
    val recs = Seq(
      (1L, "spark merge batch window"),
      (2L, "spark merge batch windo"),
      (3L, "spark merge atch windo"),
      (10L, "completely different title")).toDF("id", "key")
    val got = Linkage.resolveEntities(recs, "id", "key", 0.9)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.map(_._2).toSeq === Seq(1L, 1L, 1L, 10L))
    assert(got.head._3 === 3L) // cluster size
    assert(got.head._4 === "spark merge batch window") // min-id golden record
    assert(got.last._3 === 1L)
  }

  test("resolveEntities: completeness survivorship — richer record wins") {
    // same chain as above, but the LONGEST (most complete) key is id 3,
    // which the min-id rule would never pick
    val recs = Seq(
      (1L, "spark merge batch windo", 23.0),
      (2L, "spark merge batch window", 24.0),
      (3L, "spark merge batch window x", 26.0),
      (10L, "completely different title", 26.0)).toDF("id", "key", "score")
    val got = Linkage.resolveEntities(recs, "id", "key", 0.9,
        completeness = Some(length(col("key")).cast("double")))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(4)))
    assert(got.map(_._2).toSeq === Seq(1L, 1L, 1L, 10L))
    // the richest record's key survives for the whole entity
    assert(got.take(3).map(_._3).distinct.toSeq ===
      Seq("spark merge batch window x"))
    // equal scores fall back to min id: deterministic either way
    val tied = Linkage.resolveEntities(recs, "id", "key", 0.9,
        completeness = Some(lit(1.0)))
      .orderBy("id").collect().map(_.getString(4))
    assert(tied.head === "spark merge batch windo")
  }

  test("tagTerms: automaton equals naive contains, overlaps and repeats once") {
    val terms = Seq("ab", "abc", "bc", "zzz", "hello world")
    val docs = Seq(
      (1L, "xxabcxx"),        // ab, abc, bc all present (overlapping)
      (2L, "ab ab ab"),       // repeats count once
      (3L, "hello world!"),   // phrase with space
      (4L, "nothing here"),   // no match
      (5L, "bc")              // term == whole text
    ).toDF("id", "text")
    val got = Linkage.tagTerms(docs, "text", terms)
      .select(col("id"), col("matched_terms"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val naive = docs.collect().map { r =>
      r.getLong(0) -> terms.zipWithIndex.filter(t => r.getString(1).contains(t._1)).map(_._2).toList
    }.toMap
    assert(got === naive)
    assert(got(1L) === List(0, 1, 2))
    assert(got(2L) === List(0))
    assert(got(4L) === Nil)
  }

  test("tagTerms: large termlist single pass stays correct") {
    // 500 synthetic terms, a handful present — automaton vs naive
    val terms = (0 until 500).map(i => s"tok$i phrase")
    val docs = Seq((1L, "xx tok7 phrase yy tok499 phrase zz tok12 phrasX"))
      .toDF("id", "text")
    val got = Linkage.tagTerms(docs, "text", terms)
      .select("matched_terms").head.getSeq[Int](0).toList
    assert(got === List(7, 499))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Preferences

/** [[Preferences]] — preference-pair structural audits against
  * hand-computed fixtures.
  */
class PreferencesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val pairs = Seq(
    (1L, "a b c d", "a b"),          // chosen longer, jaccard 2/4
    (2L, "x y", "x y z w"),          // rejected longer, jaccard 2/4
    (3L, "same same", "same same"),  // identical (1 distinct token)
    (4L, "p q", ""),                 // empty rejected: ratio null
    (5L, "", ""))                    // both empty: jaccard null too
    .toDF("id", "chosen", "rejected")

  test("pairStats: lengths, ratio, jaccard, identical — hand values") {
    val s = Preferences.pairStats(pairs, "id", "chosen", "rejected")
      .orderBy("id").collect()
    assert(s(0).getAs[Long]("len_chosen") === 4L)
    assert(s(0).getAs[Boolean]("chosen_longer"))
    assert(math.abs(s(0).getAs[Double]("len_ratio") - 2.0) < 1e-12)
    assert(math.abs(s(0).getAs[Double]("jaccard") - 0.5) < 1e-12)
    assert(!s(0).getAs[Boolean]("identical"))
    assert(!s(1).getAs[Boolean]("chosen_longer"))
    assert(s(2).getAs[Boolean]("identical"))
    assert(math.abs(s(2).getAs[Double]("jaccard") - 1.0) < 1e-12)
    assert(s(3).isNullAt(s(3).fieldIndex("len_ratio")))
    assert(math.abs(s(3).getAs[Double]("jaccard")) < 1e-12) // 0/2
    assert(s(4).isNullAt(s(4).fieldIndex("jaccard")))       // union 0
    assert(s(4).getAs[Boolean]("identical"))
  }

  test("lengthBiasAudit: fractions over the fixture") {
    val a = Preferences.lengthBiasAudit(pairs, "id", "chosen", "rejected")
      .head()
    assert(a.getAs[Long]("n_pairs") === 5L)
    // chosen longer in exactly pairs 1 and 4 (2 > 0)
    assert(math.abs(a.getAs[Double]("frac_chosen_longer") - 0.4) < 1e-12)
    // identical: pairs 3 and 5
    assert(math.abs(a.getAs[Double]("frac_identical") - 0.4) < 1e-12)
    // jaccard defined for 4 pairs: 0.5, 0.5, 1.0, 0.0 → ≥0.8 in 1 of 4
    assert(math.abs(a.getAs[Double]("frac_high_overlap") - 0.25) < 1e-12)
    assert(math.abs(a.getAs[Double]("mean_jaccard") - 0.5) < 1e-12)
  }

  private def bt(games: Seq[(String, String)],
                 iters: Int): Map[String, (Long, Long, Double)] =
    Preferences.bradleyTerry(games.toDF("w", "l"), "w", "l",
        iterations = iters)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("wins"), r.getAs[Long]("games"),
          r.getAs[Double]("strength")))).toMap

  test("bradleyTerry: two players converge to the win share") {
    // BT MLE for two players IS the win rate; MM reaches it in one round
    val r = bt(Seq(("A", "B"), ("A", "B"), ("B", "A")), iters = 5)
    assert(r("A") === ((2L, 3L, r("A")._3)))
    assert(math.abs(r("A")._3 - 2.0 / 3) < 1e-12)
    assert(math.abs(r("B")._3 - 1.0 / 3) < 1e-12)
  }

  test("bradleyTerry: a zero-win item pins to strength 0") {
    val r = bt(Seq(("A", "B")), iters = 3)
    assert(r("A")._3 === 1.0 && r("B")._3 === 0.0)
    assert(r("B")._1 === 0L && r("B")._2 === 1L)
  }

  test("bradleyTerry: transitive wins order the strengths") {
    val r = bt(Seq(("A", "B"), ("B", "C"), ("A", "C"),
      ("B", "A"), ("C", "B"), ("A", "B")), iters = 20)
    assert(r("A")._3 > r("B")._3 && r("B")._3 > r("C")._3)
    assert(math.abs(r.values.map(_._3).sum - 1.0) < 1e-12)
  }
}

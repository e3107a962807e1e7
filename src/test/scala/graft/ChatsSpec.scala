package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Chats

/** [[Chats]] — conversation transcript parse/validate/measure/flatten
  * against hand-built JSON fixtures.
  */
class ChatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val good =
    """[{"role":"user","content":"hi there"},
       {"role":"assistant","content":"hello friend"},
       {"role":"user","content":"bye"},
       {"role":"assistant","content":"see you"}]""".replaceAll("\n\\s*", "")
  private val sysFirst =
    """[{"role":"system","content":"be kind"},
       {"role":"user","content":"q"},
       {"role":"assistant","content":"a"}]""".replaceAll("\n\\s*", "")
  private val doubleUser =
    """[{"role":"user","content":"one"},
       {"role":"user","content":"two"},
       {"role":"assistant","content":"a"}]""".replaceAll("\n\\s*", "")
  private val trailingUser =
    """[{"role":"user","content":"q"},
       {"role":"assistant","content":"a"},
       {"role":"user","content":"unanswered"}]""".replaceAll("\n\\s*", "")
  private val emptyContent =
    """[{"role":"user","content":"q"},
       {"role":"assistant","content":"  "}]""".replaceAll("\n\\s*", "")
  private val weirdRole =
    """[{"role":"user","content":"q"},
       {"role":"tool","content":"{}"},
       {"role":"assistant","content":"a"}]""".replaceAll("\n\\s*", "")
  private val broken = """[{"role":"user","""

  private lazy val rows = Seq(
    (1L, good), (2L, sysFirst), (3L, doubleUser), (4L, trailingUser),
    (5L, emptyContent), (6L, weirdRole), (7L, broken))
    .toDF("conv_id", "conv")

  test("conversationStats: counts, alternation, parse failure surfaced") {
    val s = Chats.conversationStats(rows, "conv_id", "conv")
      .orderBy("conv_id").collect()
    val g = s(0)
    assert(g.getAs[Boolean]("parse_ok"))
    assert(g.getAs[Long]("n_turns") === 4L)
    assert(g.getAs[Long]("n_user") === 2L)
    assert(g.getAs[Long]("n_assistant") === 2L)
    assert(g.getAs[Boolean]("starts_user"))
    assert(g.getAs[Boolean]("alternates"))
    assert(!g.getAs[Boolean]("has_empty_content"))
    assert(g.getAs[Long]("n_tokens") === 7L)       // 2+2+1+2
    assert(g.getAs[Long]("assistant_tokens") === 4L)
    assert(!s(1).getAs[Boolean]("starts_user"))    // system first
    assert(s(1).getAs[Boolean]("alternates"))
    assert(!s(2).getAs[Boolean]("alternates"))     // user,user
    assert(s(4).getAs[Boolean]("has_empty_content"))
    assert(s(5).getAs[Long]("n_other") === 1L)     // tool role
    val b = s(6)                                   // unparseable
    assert(!b.getAs[Boolean]("parse_ok"))
    assert(b.getAs[Long]("n_turns") === -1L)
    assert(b.getAs[Long]("n_tokens") === 0L)
    // role counts must be 0 on parse failure, not legacy size(null) = -1
    // artifacts (and n_other must not invent phantom turns)
    assert(b.getAs[Long]("n_user") === 0L)
    assert(b.getAs[Long]("n_assistant") === 0L)
    assert(b.getAs[Long]("n_other") === 0L)
  }

  test("validChats: only the well-formed transcripts survive") {
    val kept = Chats.validChats(rows, "conv_id", "conv")
      .select("conv_id").collect().map(_.getLong(0)).sorted.toSeq
    // 1 = clean; 2 = leading system then alternating, ends assistant.
    // 3 double-user, 4 trailing user, 5 empty content, 6 unknown role,
    // 7 unparseable — all rejected.
    assert(kept === Seq(1L, 2L))
  }

  test("flatten: role sentinels, order, separator") {
    val f = Chats.flatten(rows.where($"conv_id" === 2L), "conv_id", "conv")
      .head().getString(1)
    assert(f === "<|system|>be kind\n<|user|>q\n<|assistant|>a")
  }

  test("parseTurns: long table with turn indexes") {
    val t = Chats.parseTurns(rows.where($"conv_id" === 1L), "conv_id", "conv")
      .orderBy("turn_idx").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(3))).toSeq
    assert(t === Seq((0, "user", "hi there"), (1, "assistant", "hello friend"),
      (2, "user", "bye"), (3, "assistant", "see you")))
  }

  test("assistantMaskSpans: offsets follow flatten's token accounting") {
    // good = [user "hi there"(2), assistant "hello friend"(2),
    //         user "bye"(1), assistant "see you"(2)]
    // offsets: 0,2,4,5 -> assistant segments [2,4) and [5,7)
    val m = Chats.assistantMaskSpans(rows.where($"conv_id" === 1L),
        "conv_id", "conv")
      .orderBy("seg_idx").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(m === Seq((0, 2L, 4L), (1, 5L, 7L)))
    // empty assistant content still occupies its sentinel token
    val one = Seq((9L,
      """[{"role":"user","content":"a b c"},""" +
        """{"role":"assistant","content":""}]"""))
      .toDF("conv_id", "conv")
    val m2 = Chats.assistantMaskSpans(one, "conv_id", "conv")
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(m2 === Seq((3L, 4L)))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conversation (chat/SFT) transcript operators — the instruction-tuning
  * half of a training-data pipeline: transcripts arrive as JSON arrays of
  * `{role, content}` turns (the de-facto interchange shape), and the
  * pipeline must parse them, VALIDATE structure (role whitelist,
  * alternation, non-empty content — a malformed transcript silently
  * teaches the model the wrong turn boundaries), measure them, and
  * flatten them into trainable text with explicit role sentinels.
  *
  * Scale shape: everything here is scan-side expression work on the
  * parsed turn array — `from_json` once, then HOFs (`filter`, `exists`,
  * `zip_with`, `aggregate`, `transform`) over it. ZERO shuffles, zero
  * UDFs, no explode unless the caller asks for the turn-level table —
  * a 100 TB transcript dump streams through at parquet-scan speed.
  */
object Chats {

  /** The interchange schema: `[{"role": "...", "content": "..."}]`. */
  val turnSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("role", StringType),
    StructField("content", StringType))))

  /** Parsed turn array (null for unparseable JSON — surfaced, not
    * swallowed, by [[conversationStats]]' `parse_ok`).
    */
  def turns(jsonCol: Column): Column = from_json(jsonCol, turnSchema)

  /** Turn-level long table: one row per (conversation, turn). Explodes —
    * use for per-turn analytics; the per-conversation operators below
    * stay un-exploded on purpose.
    */
  def parseTurns(df: DataFrame, idCol: String, jsonCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(turns(col(jsonCol))).as(Seq("turn_idx", "__t")))
      .select(col(idCol), col("turn_idx"),
        col("__t.role").as("role"), col("__t.content").as("content"))

  private def tokCount(c: Column): Column =
    size(filter(split(coalesce(c, lit("")), " "), w => length(w) > 0))

  /** Per-conversation structural stats — the validation dashboard row:
    * (idCol, parse_ok, n_turns, n_user, n_assistant, n_system, n_other,
    * starts_user, alternates, has_empty_content, n_tokens,
    * assistant_tokens). `alternates` = no two CONSECUTIVE turns share a
    * role (system prompts excluded from the check would be a policy —
    * this measures the raw transcript; filter with [[validChats]]).
    * All HOF scan work, one row in → one row out.
    */
  def conversationStats(df: DataFrame, idCol: String,
                        jsonCol: String): DataFrame = {
    val bound = df.select(col(idCol), turns(col(jsonCol)).as("__turns"))
    val ts = col("__turns")
    // legacy size(null) = -1 (ANSI off), so every null-array derivation
    // must be guarded EXPLICITLY — unguarded roleN would report -1 users
    // and the n_other algebra would invent 2 phantom other-role turns on
    // every unparseable transcript
    val roleN = (r: String) =>
      when(ts.isNull, 0L)
        .otherwise(size(filter(ts, t => t.getField("role") === r))
          .cast("long"))
    bound.select(
      col(idCol),
      ts.isNotNull.as("parse_ok"),
      // -1 is the DOCUMENTED unparseable sentinel (vs 0 = empty array)
      when(ts.isNull, -1L).otherwise(size(ts).cast("long")).as("n_turns"),
      roleN("user").as("n_user"),
      roleN("assistant").as("n_assistant"),
      roleN("system").as("n_system"),
      (when(ts.isNull, 0L).otherwise(size(ts).cast("long")) -
        roleN("user") - roleN("assistant") -
        roleN("system")).cast("long").as("n_other"),
      coalesce(element_at(ts, 1).getField("role") === "user", lit(false))
        .as("starts_user"),
      // adjacent-pair scan: zip turn i with turn i+1, no same-role pair
      coalesce(size(filter(
        zip_with(slice(ts, lit(1), greatest(size(ts) - 1, lit(0))),
          slice(ts, lit(2), greatest(size(ts) - 1, lit(0))),
          (a, b) => a.getField("role") === b.getField("role")),
        x => x)) === 0, lit(false)).as("alternates"),
      coalesce(exists(ts, t =>
        t.getField("content").isNull ||
          length(trim(t.getField("content"))) === 0), lit(false))
        .as("has_empty_content"),
      coalesce(aggregate(ts, lit(0L),
        (acc, t) => acc + tokCount(t.getField("content"))), lit(0L))
        .as("n_tokens"),
      coalesce(aggregate(ts, lit(0L), (acc, t) =>
        acc + when(t.getField("role") === "assistant",
          tokCount(t.getField("content"))).otherwise(0L)), lit(0L))
        .as("assistant_tokens"))
  }

  /** Keep only trainable transcripts: parseable, ≥ `minTurns`, every
    * role in `allowedRoles`, strict alternation after an optional
    * leading system turn, non-empty content, and ending on an assistant
    * turn (a trailing user turn has no training signal). Returns the
    * input rows that pass.
    */
  def validChats(df: DataFrame, idCol: String, jsonCol: String,
                 allowedRoles: Seq[String] =
                   Seq("system", "user", "assistant"),
                 minTurns: Int = 2): DataFrame = {
    require(minTurns >= 1, s"minTurns must be ≥ 1: $minTurns")
    // Bind the parse via a LAMBDA, not a projected column: the predicate
    // references the turn array ~8 times; a projected binding gets
    // collapsed back under the filter by CollapseProject/pushdown and a
    // conjunctive filter's short-circuit codegen re-evaluates each
    // conjunct's from_json (measured ~6× scan cost). HOF semantics
    // guarantee the argument array — and so the parse — evaluates ONCE
    // per row; every reference below is to the lambda variable.
    def checks(ts: Column): Column = {
      // the alternation body: drop one leading system turn, then
      // adjacent roles must differ and the first body turn is the user's
      val body = when(
        coalesce(element_at(ts, 1).getField("role"), lit("")) === "system",
        slice(ts, lit(2), greatest(size(ts) - 1, lit(0)))).otherwise(ts)
      size(ts) >= minTurns &&
        !exists(ts, t => !t.getField("role").isin(allowedRoles: _*)) &&
        !exists(ts, t => t.getField("content").isNull ||
          length(trim(t.getField("content"))) === 0) &&
        coalesce(element_at(body, 1).getField("role") === "user",
          lit(false)) &&
        size(filter(
          zip_with(slice(body, lit(1), greatest(size(body) - 1, lit(0))),
            slice(body, lit(2), greatest(size(body) - 1, lit(0))),
            (a, b) => a.getField("role") === b.getField("role")),
          x => x)) === 0 &&
        element_at(ts, size(ts)).getField("role") === "assistant"
    }
    df.where(exists(array(turns(col(jsonCol))),
      ts => ts.isNotNull && checks(ts)))
  }

  /** Token-level LOSS-MASK spans for SFT: which whitespace-token ranges
    * of the [[flatten]]ed text are assistant turns (the only tokens the
    * loss should see — training on user text teaches the model to
    * imitate users). Token accounting matches [[flatten]] with a
    * single-space separator: each turn contributes max(1, |content
    * tokens|) tokens (the `<|role|>` sentinel glues to the first content
    * token; an empty turn is the bare sentinel).
    *
    * The cumulative offsets come from ONE `aggregate` HOF carrying a
    * (offset, spans) struct accumulator across the turn array — a
    * per-row state machine, still zero shuffles. Returns one row per
    * assistant segment: (idCol, seg_idx, tok_start, tok_end), end
    * exclusive.
    */
  def assistantMaskSpans(df: DataFrame, idCol: String,
                         jsonCol: String): DataFrame = {
    val ts = turns(col(jsonCol))
    val nToks = (t: Column) =>
      greatest(tokCount(t.getField("content")).cast("long"), lit(1L))
    val acc0 = struct(lit(0L).as("off"),
      array().cast("array<struct<s:bigint,e:bigint>>").as("spans"))
    val folded = aggregate(ts, acc0,
      (acc, t) => struct(
        (acc.getField("off") + nToks(t)).as("off"),
        when(t.getField("role") === "assistant",
          concat(acc.getField("spans"),
            array(struct(acc.getField("off").as("s"),
              (acc.getField("off") + nToks(t)).as("e")))))
          .otherwise(acc.getField("spans")).as("spans")))
    df.select(col(idCol), folded.getField("spans").as("__spans"))
      .select(col(idCol),
        posexplode(col("__spans")).as(Seq("seg_idx", "__sp")))
      .select(col(idCol), col("seg_idx"),
        col("__sp.s").as("tok_start"), col("__sp.e").as("tok_end"))
  }

  /** Flatten a transcript into one training string with explicit role
    * sentinels — `<|role|>content` turns joined by `sep` (default
    * newline). One transform + array_join per row; the content never
    * leaves the scan.
    */
  def flatten(df: DataFrame, idCol: String, jsonCol: String,
              sep: String = "\n",
              outCol: String = "training_text"): DataFrame =
    df.select(col(idCol),
      array_join(transform(turns(col(jsonCol)),
        t => concat(lit("<|"), t.getField("role"), lit("|>"),
          coalesce(t.getField("content"), lit("")))), sep).as(outCol))
}

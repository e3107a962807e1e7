package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen glue shared by the text-hash expressions: emit a call to the
  * expression instance's public `compute` method via a reference object.
  * Unlike `CodegenFallback`, this keeps the host operator inside
  * whole-stage codegen (`CollapseCodegenStages` ejects any plan node
  * containing a fallback expression into interpreted glue); the interior
  * hash loop still runs as plain JVM code either way.
  */
private[expressions] trait ComputeCallCodegen { self: UnaryExpression =>
  /** Public entry the generated code calls; impls delegate nullSafeEval here. */
  def compute(input: UTF8String): Any

  /** How to coerce the `Object` returned by `compute` to `ev.value`'s java
    * type — a plain reference cast for objects, an explicit unbox for
    * primitives (janino has no Object→primitive cast).
    */
  protected def castCall(call: String): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this, classOf[ComputeCallCodegen].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${castCall(s"$ref.compute($c)")};")
  }
}

private[expressions] trait ArrayDataResult extends ComputeCallCodegen { self: UnaryExpression =>
  override protected def castCall(call: String): String =
    s"(org.apache.spark.sql.catalyst.util.ArrayData) $call"
}

private[expressions] trait LongResult extends ComputeCallCodegen { self: UnaryExpression =>
  override protected def castCall(call: String): String =
    s"((java.lang.Long) $call).longValue()"
}

private[expressions] trait UTF8StringResult extends ComputeCallCodegen { self: UnaryExpression =>
  override protected def castCall(call: String): String =
    s"(org.apache.spark.unsafe.types.UTF8String) $call"
}

/** Native Catalyst expressions for hash-heavy text signatures.
  *
  * The pure-HOF versions (`transform`/`aggregate` lambdas) are interpreted
  * per element — profiling at sf0.01 showed 11-22 s for 500 docs, ~1000×
  * native cost, plus tens of seconds of janino compile for the giant
  * expression trees. These expressions do the shingle+hash loops in plain
  * JVM code, called from generated code via [[ComputeCallCodegen]] so the
  * host projection stays inside whole-stage codegen, reusing Spark's
  * XxHash64 so signatures stay deterministic and engine-version-stable.
  */
private[graft] object ShingleUtil {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def normalizeWs(s: String): String = WS.matcher(s).replaceAll(" ")

  /** limit -1: Java's default split DROPS trailing empty tokens, but Spark
    * SQL `split` and DuckDB `string_split_regex` both KEEP them — a
    * trailing newline/tab must yield the same trailing "" token here as in
    * the oracle formulations.
    */
  def splitWs(s: String): Array[String] = WS.split(s, -1)

  /** SQL-`trim` semantics: strip ASCII SPACES only. Java `String.trim`
    * also strips control chars (tab, newline), which would make shingle
    * sets diverge from the Spark-SQL/DuckDB formulation on
    * tab/newline-edged text (same rule as [[NormFingerprint]]).
    */
  def trimSpaces(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  /** Lowercased whitespace tokens → n-token shingles joined by a space.
    * Mirrors `split(lower(trim(text)), "\\s+")` + sliding windows.
    */
  def shingles(text: UTF8String, n: Int): Array[UTF8String] = {
    val toks = splitWs(trimSpaces(text.toString).toLowerCase)
    if (toks.length < n) Array.empty
    else {
      val out = new Array[UTF8String](toks.length - n + 1)
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      out
    }
  }
}

/** MinHash signature: per seed s ∈ [0, numHashes), min over shingles of
  * xxhash64(shingle, seed=s); Long.MaxValue when no shingles.
  */
case class MinHashSig(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes with ArrayDataResult {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override def compute(input: UTF8String): Any = {
    val sh = ShingleUtil.shingles(input, shingleSize)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      var s = 0
      while (s < numHashes) {
        val h = XxHash64Function.hash(sh(i), StringType, s.toLong)
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** SimHash: per bit i ∈ [0, bits), sign of Σ±1 votes from shingle-hash bit
  * i; vote > 0 sets bit i of the result.
  */
case class SimHash(child: Expression, shingleSize: Int, bits: Int)
    extends UnaryExpression with ImplicitCastInputTypes with LongResult {
  override def inputTypes = Seq(StringType)
  require(bits > 0 && bits <= 64)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override def compute(input: UTF8String): Any = {
    val sh = ShingleUtil.shingles(input, shingleSize)
    val votes = new Array[Int](bits)
    var i = 0
    while (i < sh.length) {
      val h = XxHash64Function.hash(sh(i), StringType, 42L)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): SimHash = copy(child = c)
}

/** SimHash with MD5 shingle hashes instead of xxhash: identical
  * sign-aggregation loop, but the per-shingle 64-bit hash is the first 8
  * bytes of `md5(shingle)` (big-endian) — a hash DuckDB can recompute
  * nibble-for-nibble from `md5()` hex output, which makes the WHOLE
  * signature oracle-checkable in SQL (gate q37b). The production
  * [[SimHash]] keeps xxhash (one long op per shingle vs a full MD5); this
  * variant exists so the algorithm — tokenize → shingle → per-bit majority
  * vote → sign — has an exact cross-engine anchor, like q38's exact-Jaccard
  * anchor for MinHash.
  */
case class SimHashMd5(child: Expression, shingleSize: Int)
    extends UnaryExpression with ImplicitCastInputTypes with LongResult {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override def compute(input: UTF8String): Any = {
    val sh = ShingleUtil.shingles(input, shingleSize)
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    var i = 0
    while (i < sh.length) {
      md.reset()
      val d = md.digest(sh(i).getBytes)
      // first 8 digest bytes, big-endian == first 16 hex chars as u64
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): SimHashMd5 = copy(child = c)
}

/** 64-bit fingerprint of whitespace-normalized, lowercased text — native
  * equivalent of `xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))`
  * (same bytes hashed, same seed 42, so identical values). Trim strips only
  * ASCII spaces to match Spark/DuckDB `trim`, NOT Java's `String.trim`
  * (which also strips control chars and would group differently from the
  * SQL oracle on tab/newline-edged strings).
  */
case class NormFingerprint(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with LongResult {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override def compute(input: UTF8String): Any = {
    val raw = input.toString
    var i = 0
    var j = raw.length
    while (i < j && raw.charAt(i) == ' ') i += 1
    while (j > i && raw.charAt(j - 1) == ' ') j -= 1
    val norm = ShingleUtil.normalizeWs(raw.substring(i, j).toLowerCase)
    java.lang.Long.valueOf(
      XxHash64Function.hash(UTF8String.fromString(norm), StringType, 42L))
  }
  override protected def withNewChildInternal(c: Expression): NormFingerprint =
    copy(child = c)
}

/** Word n-gram shingles (lowercased, space-joined) as a native expression —
  * same output as the HOF `transform(sequence(...), slice...)` formulation
  * but without per-window interpreted lambdas or its janino-compile cost.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes with ArrayDataResult {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override def compute(input: UTF8String): Any =
    new GenericArrayData(ShingleUtil.shingles(input, n).asInstanceOf[Array[Any]])
  override protected def withNewChildInternal(c: Expression): Shingles = copy(child = c)
}

/** Stopword-count language ID. Tokenizes once and counts set hits per
  * language in a single pass — the `Column`-level fold formulation
  * duplicated its accumulator exponentially (2^langs copies of the
  * tokenizer in the tree: measured 35 s of janino+eval for a 5k-doc
  * projection; this is <0.5 s). Tie-break: first language in declaration
  * order with the maximal score; `und` when no stopword hits.
  */
case class LangId(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression with ImplicitCastInputTypes with UTF8StringResult {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType

  @transient private lazy val sets: Array[(UTF8String, java.util.HashSet[String])] =
    langs.map { case (l, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(s.add)
      (UTF8String.fromString(l), s)
    }.toArray
  @transient private lazy val und = UTF8String.fromString("und")

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override def compute(input: UTF8String): Any = {
    val raw = input.toString
    var i = 0
    var j = raw.length
    while (i < j && raw.charAt(i) == ' ') i += 1
    while (j > i && raw.charAt(j - 1) == ' ') j -= 1
    val toks = ShingleUtil.splitWs(raw.substring(i, j).toLowerCase)
    var bestScore = 0
    var bestLang: UTF8String = und
    var l = 0
    while (l < sets.length) {
      val set = sets(l)._2
      var score = 0
      var t = 0
      while (t < toks.length) {
        if (set.contains(toks(t))) score += 1
        t += 1
      }
      if (score > bestScore) { bestScore = score; bestLang = sets(l)._1 }
      l += 1
    }
    bestLang
  }
  override protected def withNewChildInternal(c: Expression): LangId = copy(child = c)
}

/** Content-defined chunk fingerprints via a polynomial rolling hash
  * (Rabin-Karp style): slide a `window`-char hash over the text; positions
  * where the low `maskBits` bits are zero end a chunk; each chunk's
  * fingerprint is xxhash64 of its characters. Shared runs of text produce
  * identical chunk fingerprints regardless of surrounding edits — the
  * standard primitive for partial-overlap dedup of long documents (and,
  * over bytes, for CDC storage dedup).
  */
case class RollingChunkHashes(child: Expression, window: Int, maskBits: Int)
    extends UnaryExpression with ImplicitCastInputTypes with ArrayDataResult {
  override def inputTypes = Seq(StringType)
  require(window > 0 && maskBits > 0 && maskBits < 32)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val Base = 1000003L
  private val mask = (1L << maskBits) - 1
  @transient private lazy val basePow = {
    var p = 1L
    var i = 0
    while (i < window - 1) { p *= Base; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])
  override def compute(input: UTF8String): Any = {
    val s = input.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var h = 0L
    var chunkStart = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toLong
      h = if (i < window) h * Base + c
          else (h - s.charAt(i - window).toLong * basePow) * Base + c
      if (i >= window - 1 && (h & mask) == 0 && i + 1 > chunkStart) {
        out += XxHash64Function.hash(
          UTF8String.fromString(s.substring(chunkStart, i + 1)), StringType, 42L)
        chunkStart = i + 1
      }
      i += 1
    }
    if (chunkStart < s.length || s.isEmpty)
      out += XxHash64Function.hash(
        UTF8String.fromString(s.substring(chunkStart)), StringType, 42L)
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): RollingChunkHashes =
    copy(child = c)
}

object TextHashExpressions {
  import org.apache.spark.sql.graftshim.ColumnShim

  def minhashSig(text: Column, shingleSize: Int, numHashes: Int): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(text), shingleSize, numHashes))

  def simhash(text: Column, shingleSize: Int, bits: Int): Column =
    ColumnShim.column(SimHash(ColumnShim.expression(text), shingleSize, bits))

  def simhashMd5(text: Column, shingleSize: Int): Column =
    ColumnShim.column(SimHashMd5(ColumnShim.expression(text), shingleSize))

  def shingles(text: Column, n: Int): Column =
    ColumnShim.column(Shingles(ColumnShim.expression(text), n))

  def normFingerprint(text: Column): Column =
    ColumnShim.column(NormFingerprint(ColumnShim.expression(text)))

  def langId(text: Column, langs: Seq[(String, Seq[String])]): Column =
    ColumnShim.column(LangId(ColumnShim.expression(text), langs))

  def rollingChunkHashes(text: Column, window: Int = 16, maskBits: Int = 6): Column =
    ColumnShim.column(RollingChunkHashes(ColumnShim.expression(text), window, maskBits))
}

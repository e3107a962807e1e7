package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode hygiene for web-scale text pipelines. Crawled corpora mix
  * composed (U+00E1) and decomposed (`a` + U+0301) encodings of the same
  * visible text, which silently defeats exact dedup, fingerprinting, and
  * token matching — two byte-distinct spellings of one document. Spark has
  * no built-in normalizer (SPARK-23927 area), so these wrap
  * `java.text.Normalizer` (ICU-free, in the JDK) as native expressions.
  *
  * Both fast-path pure-ASCII input (one byte scan, no allocation) — at
  * corpus scale most documents are ASCII and normalization must cost a
  * scan, not a copy. Non-fast-path work is per-row bounded; the expressions
  * stay inside whole-stage codegen via [[ComputeCallCodegen]].
  */
object UnicodeExpressions {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Canonical Unicode normalization. `form` ∈ NFC | NFD | NFKC | NFKD.
    * NFC is the storage/dedup canonical form (what DuckDB's
    * `nfc_normalize` and most crawlers emit).
    */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    ColumnShim.column(NormalizeUnicode(ColumnShim.expression(text), form))

  /** Latin-diacritic folding: NFD-decompose, drop combining marks (Mn),
    * re-compose to NFC. `café` → `cafe`, composed or decomposed input
    * alike. Equivalent to DuckDB `strip_accents` on Latin text (utf8proc
    * leaves the stripped result decomposed; after mark removal the two
    * agree wherever nothing is left to compose — all of Latin).
    */
  def foldAccents(text: Column): Column =
    ColumnShim.column(FoldAccents(ColumnShim.expression(text)))
}

private[expressions] trait AsciiFastPath {
  /** True iff every byte is < 0x80 — already in every normal form. */
  final def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
}

case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression with ImplicitCastInputTypes
    with UTF8StringResult with AsciiFastPath {
  private val normForm = java.text.Normalizer.Form.valueOf(form)
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])
  override def compute(input: UTF8String): Any =
    if (isAscii(input)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(input.toString, normForm))
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "normalize_unicode"
}

case class FoldAccents(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with UTF8StringResult with AsciiFastPath {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])
  override def compute(input: UTF8String): Any =
    if (isAscii(input)) input
    else {
      val nfd = java.text.Normalizer.normalize(input.toString,
        java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(nfd.length)
      var i = 0
      while (i < nfd.length) {
        val cp = nfd.codePointAt(i)
        if (Character.getType(cp) != Character.NON_SPACING_MARK)
          sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      UTF8String.fromString(java.text.Normalizer.normalize(sb.toString,
        java.text.Normalizer.Form.NFC))
    }
  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "fold_accents"
}

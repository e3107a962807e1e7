package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scan-side byte-pair-encoding segmentation with a TRAINED merge table.
  *
  * The merge list (learned by `Text.bpeMerges` — one vocabulary-sized
  * aggregate + a driver loop over the word-frequency table) rides into the
  * plan as an expression literal, the same bounded-constant class as the
  * LSH plane matrix: tokenizing 100 TB is then a pure scan-side pass — no
  * shuffle, no UDF, no broadcast join — and the host projection stays
  * inside whole-stage codegen via [[ComputeCallCodegen]].
  *
  * Application is the standard rank-order replay: each merge, in training
  * order, collapses every adjacent occurrence of its pair left-to-right.
  * Words are whitespace tokens of `lower(trim(text))`, matching the
  * training normalization; each word's subwords concatenate back to the
  * word exactly (segmentation is a partition — FunctionsSpec property).
  */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ImplicitCastInputTypes with ArrayDataResult {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(input: UTF8String): Any = {
    val words = input.toString.trim.toLowerCase.split("\\s+")
    val out = new scala.collection.mutable.ArrayBuffer[AnyRef]()
    var w = 0
    while (w < words.length) {
      if (words(w).nonEmpty) segment(words(w), out)
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def segment(word: String,
                      out: scala.collection.mutable.ArrayBuffer[AnyRef]): Unit = {
    // initial symbols = code points (surrogate-pair safe)
    var syms = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms += word.substring(i, i + n)
      i += n
    }
    var m = 0
    while (m < mergeArr.length && syms.length > 1) {
      val (l, r) = mergeArr(m)
      var j = 0
      while (j < syms.length - 1) {
        if (syms(j) == l && syms(j + 1) == r) {
          syms(j) = l + r
          syms.remove(j + 1)
          // stay at j: the merged symbol may chain with the next pair
        } else j += 1
      }
      m += 1
    }
    syms.foreach(s => out += UTF8String.fromString(s))
  }

  override protected def withNewChildInternal(c: Expression): BpeSegment =
    copy(child = c)
}

object BpeExpressions {
  def bpeSegment(text: Column, merges: Seq[(String, String)]): Column =
    ColumnShim.column(BpeSegment(ColumnShim.expression(text), merges))
}

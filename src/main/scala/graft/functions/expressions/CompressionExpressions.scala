package graft.functions.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: `deflate(text).length / text.bytes`
  * — the MassiveText-style repetitiveness detector that catches what
  * token statistics miss (long-range template repetition, boilerplate
  * scaffolding, base64 blobs). Natural prose deflates to ~0.4–0.7;
  * heavily repetitive text approaches 0; incompressible noise exceeds 1
  * (deflate framing overhead). Filter BOTH tails.
  *
  * A native expression (CodegenFallback around `java.util.zip.Deflater`,
  * one deflater per eval — scan-side, no shuffle, no UDF). Empty or null
  * text yields NULL (the ratio is undefined).
  */
case class DeflateRatio(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {

  require(level >= 1 && level <= 9, s"deflate level must be in [1, 9]: $level")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // empty text → NULL even if child isn't nullable

  override protected def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].getBytes
    if (raw.isEmpty) null
    else {
      val d = new Deflater(level, true)
      try {
        d.setInput(raw)
        d.finish()
        val buf = new Array[Byte](8192)
        var compressed = 0L
        while (!d.finished()) compressed += d.deflate(buf)
        compressed.toDouble / raw.length
      } finally d.end()
    }
  }

  override protected def withNewChildInternal(c: Expression): DeflateRatio =
    copy(child = c)
}

object CompressionExpressions {
  /** Deflate ratio of a string column (see [[DeflateRatio]]). */
  def compressionRatio(text: Column, level: Int = 6): Column =
    ColumnShim.column(DeflateRatio(ColumnShim.expression(text), level))
}

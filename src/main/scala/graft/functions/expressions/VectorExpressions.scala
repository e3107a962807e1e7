package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Native cosine similarity over `array<float>`.
  *
  * Arithmetic is bit-identical to the HOF formulation in
  * [[graft.functions.Vectors.cosine]] (and to the DuckDB oracle): each float
  * is widened to double, products/squares accumulate left-to-right in
  * array order, cosine = dot / (sqrt(na)·sqrt(nb)) with a 0.0 guard for
  * zero-norm inputs. The HOF version pays interpreted-lambda dispatch per
  * element; this is a tight JVM loop (~50× at 64 dims).
  *
  * Mismatched lengths yield null (HOF zip_with would null-poison the sum).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  // Declared float-array inputs: SQL callers passing array<double> get an
  // implicit cast at analysis instead of a runtime ClassCastException (or
  // silent garbage from UnsafeArrayData.getFloat misreads).
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // a null element yields null overall (ArrayData.getFloat on a null
      // slot returns undefined garbage — same contract as zip_with's
      // null-poisoning, but explicit instead of silent)
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = xs.getFloat(i).toDouble
      val y = ys.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    java.lang.Double.valueOf(if (d == 0.0) 0.0 else dot / d)
  }

  /** Whole-stage-codegen body: same loop as the interpreted path (keeping
    * the surrounding operators in one codegen span — a CodegenFallback here
    * would fence the ANN scoring pipeline into interpreted glue).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = (double) $a.getFloat($i);
         |    final double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y;
         |    $na += $x * $x;
         |    $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $d = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    ${ev.value} = ($d == 0.0) ? 0.0 : ($dot / $d);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object VectorExpressions {
  def cosineF(a: Column, b: Column): Column =
    ColumnShim.column(CosineSim(ColumnShim.expression(a), ColumnShim.expression(b)))
}

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

/** Cells ranked by squared-L2 distance from the input vector to each
  * centroid: returns `array<struct<cell:int, dist:double>>` sorted by
  * (distance asc, cell asc) — `[0]` is the IVF assignment, `slice(1..p)`
  * the multi-probe set.
  *
  * The centroid matrix is an expression LITERAL (numCells × dim doubles —
  * bounded by the quantizer's design, independent of corpus size, same
  * class of driver-side constant as the LSH plane matrix), so cell
  * assignment is pure scan-side compute: no broadcast join, no explode, no
  * per-row window — the formulation it replaces shuffled corpus×numCells
  * rows through a sort window per Lloyd round. Ties keep the lower cell id
  * (stable insertion sort over ascending ids), matching the old
  * `orderBy(dist, cell)` ranking.
  */
case class NearestCells(child: Expression, centroids: Seq[Seq[Double]],
                        cellIds: Seq[Int])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  require(centroids.nonEmpty && centroids.length == cellIds.length)
  require(centroids.forall(_.length == centroids.head.length),
    "centroids must share one dimension")
  override def inputTypes = Seq(ArrayType(FloatType))
  override def nullable: Boolean = true // null on dim mismatch / null element
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("cell", IntegerType, nullable = false),
      StructField("dist", DoubleType, nullable = false))),
    containsNull = false)

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val ids: Array[Int] = cellIds.toArray

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  def compute(a: ArrayData): Any = {
    val n = a.numElements()
    val k = cents.length
    // dimension mismatch or null elements → null result, never a distance
    // over a silently-truncated prefix or garbage bits from a null slot
    // (same contract as CosineSim)
    if (n != cents(0).length) return null
    var chk = 0
    while (chk < n) {
      if (a.isNullAt(chk)) return null
      chk += 1
    }
    val d2 = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      var s = 0.0
      var i = 0
      while (i < n) {
        val diff = a.getFloat(i).toDouble - cent(i)
        s += diff * diff
        i += 1
      }
      d2(c) = s
      c += 1
    }
    // stable insertion argsort by distance; k <= 64 by design
    val order = Array.tabulate(k)(identity)
    var x = 1
    while (x < k) {
      val v = order(x)
      var y = x - 1
      while (y >= 0 && d2(v) < d2(order(y))) { order(y + 1) = order(y); y -= 1 }
      order(y + 1) = v
      x += 1
    }
    val out = new Array[Any](k)
    var r = 0
    while (r < k) {
      out(r) = org.apache.spark.sql.catalyst.InternalRow(
        ids(order(r)), math.sqrt(d2(order(r))))
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Reference-object call keeps the host operator inside whole-stage
    * codegen (same pattern as the text-hash expressions).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("ranked")
      s"""
         |Object $r = $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

/** Asymmetric-distance (ADC) score for PQ search: given a candidate's
  * product codes and a query's densified lookup table,
  * Σ_s lut[s·stride + codes[s]] with the sum accumulating in subspace
  * order — bit-identical to the higher-order `aggregate(sequence(...))`
  * formulation it replaces, which paid interpreted-lambda dispatch per
  * subspace per candidate (the dominant job of the PQ top-k queries at
  * sf0.1: ~1.2 s of a 2.0 s query). Null codes array, a null code slot,
  * or a slot index beyond the lut (the HOF's out-of-bound `element_at`
  * under non-ANSI) all yield null, matching the HOF's null-poisoning.
  */
case class AdcScore(left: Expression, right: Expression, stride: Int)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(c: Any, l: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    val lut = l.asInstanceOf[ArrayData]
    val n = codes.numElements()
    val ln = lut.numElements()
    var acc = 0.0
    var s = 0
    while (s < n) {
      if (codes.isNullAt(s)) return null
      val idx = s * stride + codes.getInt(s)
      if (idx < 0 || idx >= ln || lut.isNullAt(idx)) return null
      acc += lut.getDouble(idx)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val n = ctx.freshName("n")
      val ln = ctx.freshName("ln")
      val s = ctx.freshName("s")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $c.numElements();
         |final int $ln = $l.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $n; $s++) {
         |  if ($c.isNullAt($s)) { ${ev.isNull} = true; break; }
         |  final int $idx = $s * $stride + $c.getInt($s);
         |  if ($idx < 0 || $idx >= $ln || $l.isNullAt($idx)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $acc += $l.getDouble($idx);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScore =
    copy(left = l, right = r)
}

object VectorExpressions {
  def cosineF(a: Column, b: Column): Column =
    ColumnShim.column(CosineSim(ColumnShim.expression(a), ColumnShim.expression(b)))

  def adcScore(codes: Column, lut: Column, stride: Int): Column =
    ColumnShim.column(AdcScore(ColumnShim.expression(codes),
      ColumnShim.expression(lut), stride))

  def nearestCells(v: Column, centroids: Seq[Seq[Double]],
                   cellIds: Seq[Int]): Column =
    ColumnShim.column(NearestCells(ColumnShim.expression(v), centroids, cellIds))
}

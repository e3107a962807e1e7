package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as pure higher-order
  * expressions (`zip_with` / `aggregate`) — codegen-friendly, no UDFs, no
  * driver involvement. Accumulation is in DOUBLE and strictly left-to-right
  * over the array, which makes results bit-reproducible across engines
  * (the DuckDB oracle accumulates in the same order).
  */
object Vectors {

  /** Σ aᵢ·bᵢ accumulated in double, array order. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ² in double. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity over `array<float>`; 0.0 when either vector is
    * all-zero. Native expression ([[graft.functions.expressions.CosineSim]])
    * with arithmetic bit-identical to the HOF formulation
    * `dot/(sqrt(normSq a)·sqrt(normSq b))` — interpreted lambdas measured
    * ~50× slower at 64 dims.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.expressions.VectorExpressions.cosineF(a, b)

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, x) => acc + x))

  /** Sign pattern of a deterministic random projection — the building block
    * for cosine-LSH bucketing ([[graft.operators.Similarity]]). `planes` is
    * a literal matrix (numPlanes × dim) generated from a seed on the driver;
    * at 100 TB the matrix is a broadcast-sized literal, the signatures are
    * computed scan-side.
    */
  def lshSignature(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.map { plane =>
      val planeCol = array(plane.map(lit): _*)
      when(dot(v, planeCol) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }
}

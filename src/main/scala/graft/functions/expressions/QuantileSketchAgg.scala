package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.catalyst.util.QuantileSummaries.Stats
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Mergeable Greenwald–Khanna quantile SKETCHES as first-class columns —
  * the quantile member of the sketch family (CMS frequencies, HLL
  * distincts, Bloom membership, GK quantiles). Spark's own
  * `approx_percentile` computes estimates but never exposes the summary;
  * these aggregates emit the sketch BYTES, so the 100 TB pattern applies:
  * sketch each source/day/partition once at ingest, persist a few KB per
  * group, and answer any later quantile — per group, rolled up across
  * groups, across vintages — by merging sketches, never rescanning.
  *
  * The buffer is Spark's `QuantileSummaries` (the engine `approx_
  * percentile` itself uses), so estimates carry its guarantee: the value
  * returned for probability p has rank within ±relativeError·count of
  * ⌈p·count⌉. Serialization is a flat (relativeError, compressThreshold,
  * count, n, n×(value, g, delta)) buffer.
  */
private object QuantileSketchCodec {
  def toBytes(q: QuantileSummaries): Array[Byte] = {
    val c = if (q.compressed) q else q.compress()
    val s = c.sampled
    val bb = ByteBuffer.allocate(8 + 4 + 8 + 4 + 24 * s.length)
    bb.putDouble(c.relativeError)
    bb.putInt(c.compressThreshold)
    bb.putLong(c.count)
    bb.putInt(s.length)
    s.foreach { st =>
      bb.putDouble(st.value); bb.putLong(st.g); bb.putLong(st.delta)
    }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): QuantileSummaries = {
    val bb = ByteBuffer.wrap(bytes)
    val relErr = bb.getDouble
    val thresh = bb.getInt
    val count = bb.getLong
    val n = bb.getInt
    val stats = Array.fill(n)(Stats(bb.getDouble, bb.getLong, bb.getLong))
    new QuantileSummaries(thresh, relErr, stats, count, true)
  }

  def compressed(q: QuantileSummaries): QuantileSummaries =
    if (q.compressed) q else q.compress()
}

/** Aggregate a numeric column into GK sketch bytes. Partial-aggregable:
  * map-side buffers compress to O(1/relativeError · log(err·N)) entries
  * and the shuffle carries one small buffer per group.
  */
case class QuantileSketchAgg(child: Expression, relativeError: Double,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def inputTypes = Seq(DoubleType)

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      relativeError, Array.empty[Stats], 0L, true)

  override def update(buf: QuantileSummaries,
                      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double]) else buf
  }

  override def merge(b1: QuantileSummaries,
                     b2: QuantileSummaries): QuantileSummaries = {
    val c1 = QuantileSketchCodec.compressed(b1)
    val c2 = QuantileSketchCodec.compressed(b2)
    if (c2.count == 0) c1 else if (c1.count == 0) c2 else c1.merge(c2)
  }

  override def eval(buf: QuantileSummaries): Any =
    QuantileSketchCodec.toBytes(buf)

  override def serialize(buf: QuantileSummaries): Array[Byte] =
    QuantileSketchCodec.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketchCodec.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantileSketchAgg = copy(child = c.head)
}

/** Merge already-built sketch byte columns (the rollup aggregate — the
  * no-rescan path over persisted sketches).
  */
case class QuantileSketchMergeAgg(child: Expression,
                                  mutableAggBufferOffset: Int = 0,
                                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSummaries] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
      QuantileSummaries.defaultRelativeError, Array.empty[Stats], 0L, true)

  override def update(buf: QuantileSummaries,
                      input: InternalRow): QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val other = QuantileSketchCodec.fromBytes(v.asInstanceOf[Array[Byte]])
      if (other.count == 0) buf
      else if (buf.count == 0) other
      else QuantileSketchCodec.compressed(buf).merge(other)
    }
  }

  override def merge(b1: QuantileSummaries,
                     b2: QuantileSummaries): QuantileSummaries =
    if (b2.count == 0) b1
    else if (b1.count == 0) b2
    else QuantileSketchCodec.compressed(b1)
      .merge(QuantileSketchCodec.compressed(b2))

  override def eval(buf: QuantileSummaries): Any =
    QuantileSketchCodec.toBytes(buf)

  override def serialize(buf: QuantileSummaries): Array[Byte] =
    QuantileSketchCodec.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileSketchCodec.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): QuantileSketchMergeAgg =
    copy(child = c.head)
}

/** Probe a sketch column for quantiles at fixed probabilities — runs
  * executor-side on each sketch row (no driver round trip), returning
  * `array<double>` aligned with `probs`. Empty sketches yield NULL.
  */
case class QuantileSketchQuery(child: Expression, probs: Seq[Double])
    extends UnaryExpression with CodegenFallback {

  require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
    s"probs must be in [0, 1]: $probs")

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val q = QuantileSketchCodec.fromBytes(input.asInstanceOf[Array[Byte]])
    if (q.count == 0) null
    else new GenericArrayData(probs.map(p => q.query(p).get).toArray)
  }

  override protected def withNewChildInternal(
      c: Expression): QuantileSketchQuery = copy(child = c)
}

object QuantileSketchAgg {
  /** Sketch a numeric column: `quantile_sketch(value, relativeError)`. */
  def quantileSketch(value: Column, relativeError: Double): Column =
    ColumnShim.column(QuantileSketchAgg(
      ColumnShim.expression(value), relativeError).toAggregateExpression())

  /** Merge sketch byte columns: `quantile_sketch_merge(sketch)`. */
  def quantileSketchMerge(sketch: Column): Column =
    ColumnShim.column(QuantileSketchMergeAgg(
      ColumnShim.expression(sketch)).toAggregateExpression())

  /** Probe quantiles: `quantile_sketch_query(sketch, probs)`. */
  def quantileSketchQuery(sketch: Column, probs: Seq[Double]): Column =
    ColumnShim.column(QuantileSketchQuery(
      ColumnShim.expression(sketch), probs))
}

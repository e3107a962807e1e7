package graft.functions.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Group-level MinHash sketch: elementwise min of per-document MinHash
  * signatures. By the MinHash property, the union-sketch of a group is
  * the signature of the union of its shingle sets, so two group sketches
  * estimate cross-group Jaccard as the fraction of agreeing coordinates.
  *
  * A `TypedImperativeAggregate` with a fixed-width long[] buffer: partial
  * aggregation works map-side (buffers merge by elementwise min), the
  * shuffle carries numHashes longs per group — constant-size state no
  * matter how many documents fold in. This is the sketch pattern
  * (HLL/quantile/minhash) for corpus-level analytics at 100 TB.
  */
case class MinHashUnionAgg(child: Expression, numHashes: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes = Seq(ArrayType(LongType))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(numHashes, arr.numElements())
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashUnionAgg =
    copy(child = c.head)
}

object MinHashUnionAgg {
  /** Aggregate a signature column (from [[MinHashSig]]) into the group
    * union sketch.
    */
  def minhashUnion(sig: Column, numHashes: Int): Column =
    ColumnShim.column(
      MinHashUnionAgg(ColumnShim.expression(sig), numHashes)
        .toAggregateExpression())
}

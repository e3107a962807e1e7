package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Bounded top-k per group as a PARTIAL-AGGREGABLE aggregate — the scale
  * alternative to `row_number() OVER (PARTITION BY g ORDER BY ...) <= k`:
  * a window sorts every group's FULL row set after shuffling all of it;
  * this aggregate keeps a k-bounded buffer per group map-side, so the
  * shuffle carries at most k entries per group per map task and nothing
  * is ever globally sorted. For k ≪ group size (the "top 3 docs per
  * source over 100 TB" shape) the exchanged volume drops by orders of
  * magnitude.
  *
  * Ordering is (ord DESC, tie ASC) — the usual "largest score, smallest
  * id wins ties" convention, fully deterministic. The result is the
  * group's top-k `(ord, tie)` pairs in rank order as an array of structs.
  *
  * The buffer is a size-bounded array maintained with insertion into a
  * sorted window (k is small by contract); merge concatenates and
  * re-bounds. Both paths are O(k) per input.
  */
case class TopKAgg(ord: Expression, tie: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.ArrayList[(Double, Long)]] {

  require(k >= 1 && k <= 1024, s"k must be in [1, 1024]: $k")

  override def children: Seq[Expression] = Seq(ord, tie)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType, nullable = false),
      StructField("tie", LongType, nullable = false))),
    containsNull = false)

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: java.util.ArrayList[(Double, Long)],
                     e: (Double, Long)): java.util.ArrayList[(Double, Long)] = {
    // sorted insert into a ≤k window: find position, shift, drop tail
    var i = 0
    while (i < buf.size() && better(buf.get(i), e)) i += 1
    if (i < k) {
      buf.add(i, e)
      if (buf.size() > k) buf.remove(k)
    }
    buf
  }

  override def createAggregationBuffer(): java.util.ArrayList[(Double, Long)] =
    new java.util.ArrayList[(Double, Long)](k + 1)

  override def update(buf: java.util.ArrayList[(Double, Long)],
                      input: InternalRow): java.util.ArrayList[(Double, Long)] = {
    val o = ord.eval(input)
    val t = tie.eval(input)
    if (o == null || t == null) buf
    else insert(buf, (o.asInstanceOf[Double], t.asInstanceOf[Long]))
  }

  override def merge(b1: java.util.ArrayList[(Double, Long)],
                     b2: java.util.ArrayList[(Double, Long)]): java.util.ArrayList[(Double, Long)] = {
    var i = 0
    while (i < b2.size()) { insert(b1, b2.get(i)); i += 1 }
    b1
  }

  override def eval(buf: java.util.ArrayList[(Double, Long)]): Any = {
    val rows = new Array[Any](buf.size())
    var i = 0
    while (i < buf.size()) {
      rows(i) = InternalRow(buf.get(i)._1, buf.get(i)._2)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.ArrayList[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    var i = 0
    while (i < buf.size()) {
      bb.putDouble(buf.get(i)._1); bb.putLong(buf.get(i)._2); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.ArrayList[(Double, Long)](k + 1)
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKAgg =
    copy(ord = c(0), tie = c(1))
}

object TopKAgg {
  /** `top_k(ord desc, tie asc, k)` → array<struct<ord, tie>> in rank
    * order.
    */
  def topK(ord: Column, tie: Column, k: Int): Column =
    ColumnShim.column(TopKAgg(ColumnShim.expression(ord.cast("double")),
      ColumnShim.expression(tie.cast("long")), k).toAggregateExpression())
}

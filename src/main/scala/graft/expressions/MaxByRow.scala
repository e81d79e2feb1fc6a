package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Last-write-wins selection: keeps the single payload struct with the
  * greatest `seq` per group — the kernel of CDC merge / snapshot
  * compaction.
  *
  * Why not `max(struct(seq, payload...))` / `max_by`: their aggregation
  * buffer contains a struct, which Spark's HashAggregate cannot hold in
  * its mutable buffer, so the whole aggregation degrades to
  * SortAggregate — every map partition SORTS by group key before any
  * partial collapse. This TypedImperativeAggregate runs under
  * ObjectHashAggregate instead: hash-probed partial aggregation, O(1)
  * state per live key (8-byte seq + one serialized row), no sort at any
  * stage, and shuffle bytes bounded by distinct keys per map task.
  *
  * Ties on `seq` resolve by lexicographic unsigned comparison of the
  * payload's UnsafeRow bytes — not a semantic order, but DETERMINISTIC:
  * the winner is identical under any partitioning, merge order, or
  * cluster size. Rows with NULL seq are ignored; an empty group yields
  * NULL.
  */
case class MaxByRowAgg(
    seq: Expression, payload: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MaxByRowAgg.Holder] {

  private lazy val payloadType = payload.dataType.asInstanceOf[StructType]
  @transient private lazy val proj =
    UnsafeProjection.create(Array[DataType](payload.dataType))
  @transient private lazy val oneField = new Array[Any](1)

  override def checkInputDataTypes(): TypeCheckResult =
    if (seq.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"seq must be BIGINT, got ${seq.dataType.sql}")
    else if (!payload.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(
        s"payload must be a struct, got ${payload.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): MaxByRowAgg.Holder =
    new MaxByRowAgg.Holder(Long.MinValue, null)

  private def offer(buf: MaxByRowAgg.Holder, s: Long, bytes: Array[Byte]): Unit =
    if (buf.bytes == null || s > buf.seq ||
        (s == buf.seq && MaxByRowAgg.byteGt(bytes, buf.bytes))) {
      buf.seq = s
      buf.bytes = bytes
    }

  override def update(buf: MaxByRowAgg.Holder, input: InternalRow): MaxByRowAgg.Holder = {
    val s = seq.eval(input)
    if (s != null) {
      oneField(0) = payload.eval(input)
      val ur = proj(InternalRow.fromSeq(oneField.toIndexedSeq))
      offer(buf, s.asInstanceOf[Long], ur.getBytes.clone())
    }
    buf
  }

  override def merge(a: MaxByRowAgg.Holder, b: MaxByRowAgg.Holder): MaxByRowAgg.Holder = {
    if (b.bytes != null) offer(a, b.seq, b.bytes)
    a
  }

  override def eval(buf: MaxByRowAgg.Holder): Any =
    if (buf.bytes == null) null
    else {
      val ur = new UnsafeRow(1)
      ur.pointTo(buf.bytes, buf.bytes.length)
      ur.getStruct(0, payloadType.length).copy()
    }

  override def serialize(buf: MaxByRowAgg.Holder): Array[Byte] =
    if (buf.bytes == null) Array.emptyByteArray
    else {
      val bb = java.nio.ByteBuffer.allocate(8 + buf.bytes.length)
      bb.putLong(buf.seq).put(buf.bytes)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): MaxByRowAgg.Holder =
    if (bytes.isEmpty) createAggregationBuffer()
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val s = bb.getLong
      val payload = new Array[Byte](bytes.length - 8)
      bb.get(payload)
      new MaxByRowAgg.Holder(s, payload)
    }

  override def dataType: DataType = payload.dataType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(seq, payload)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(seq = c(0), payload = c(1))
  override def withNewMutableAggBufferOffset(o: Int): MaxByRowAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MaxByRowAgg =
    copy(inputAggBufferOffset = o)
}

object MaxByRowAgg {
  final class Holder(var seq: Long, var bytes: Array[Byte])

  private[expressions] def byteGt(a: Array[Byte], b: Array[Byte]): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c > 0
      i += 1
    }
    a.length > b.length
  }

  /** Column API: the payload struct of the row with the greatest seq. */
  def maxByRow(seq: Column, payload: Column): Column =
    Bridge.column(MaxByRowAgg(Bridge.expression(seq), Bridge.expression(payload))
      .toAggregateExpression(isDistinct = false))
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** `collect_list` over longs with a hard element cap: once a group holds
  * `cap + 1` elements it stops growing (the +1 lets callers distinguish
  * "exactly cap" from "over cap" and drop the group).
  *
  * Why it exists: the LSH hot-bucket guard wants "member list, unless the
  * bucket is oversized". Plain `collect_list` must buffer the WHOLE
  * bucket before `size()` can reject it — a degenerate band hash with
  * 10⁷ ids in one bucket OOMs the aggregation buffer. This aggregate
  * bounds every buffer at cap+1 longs while keeping the single-shuffle
  * groupBy shape (partial buffers are capped too, and merges re-cap).
  */
case class CollectLongsCapped(
    child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.ArrayList[Long]] {

  private val limit = cap + 1

  override def createAggregationBuffer(): java.util.ArrayList[Long] =
    new java.util.ArrayList[Long](8)

  override def update(buf: java.util.ArrayList[Long], input: InternalRow)
      : java.util.ArrayList[Long] = {
    if (buf.size() < limit) {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: java.util.ArrayList[Long], b: java.util.ArrayList[Long])
      : java.util.ArrayList[Long] = {
    var i = 0
    while (a.size() < limit && i < b.size()) { a.add(b.get(i)); i += 1 }
    a
  }

  override def eval(buf: java.util.ArrayList[Long]): Any = {
    val out = new Array[Long](buf.size())
    var i = 0
    while (i < out.length) { out(i) = buf.get(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.ArrayList[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    var i = 0
    while (i < buf.size()) { bb.putLong(buf.get(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.ArrayList[Long](math.max(8, n))
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): CollectLongsCapped =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CollectLongsCapped =
    copy(inputAggBufferOffset = o)
}

/** [[CollectLongsCapped]] for (long, long) pairs — the same bounded
  * buffer discipline carrying a per-member payload (e.g. an LSH member
  * id WITH its packed signature), so bucket verification can run
  * map-side at pair-explosion time instead of joining signatures back
  * over the full candidate stream. */
case class CollectLongPairsCapped(
    a: Expression, b: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.ArrayList[Long]] {

  private val limit = 2 * (cap + 1)

  override def createAggregationBuffer(): java.util.ArrayList[Long] =
    new java.util.ArrayList[Long](8)

  override def update(buf: java.util.ArrayList[Long], input: InternalRow)
      : java.util.ArrayList[Long] = {
    if (buf.size() < limit) {
      val va = a.eval(input); val vb = b.eval(input)
      if (va != null && vb != null) {
        buf.add(va.asInstanceOf[Long]); buf.add(vb.asInstanceOf[Long])
      }
    }
    buf
  }

  override def merge(x: java.util.ArrayList[Long], y: java.util.ArrayList[Long])
      : java.util.ArrayList[Long] = {
    var i = 0
    while (x.size() < limit && i < y.size()) {
      x.add(y.get(i)); x.add(y.get(i + 1)); i += 2
    }
    x
  }

  override def eval(buf: java.util.ArrayList[Long]): Any = {
    val n = buf.size() / 2
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      out(i) = InternalRow(buf.get(2 * i), buf.get(2 * i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.ArrayList[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    var i = 0
    while (i < buf.size()) { bb.putLong(buf.get(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.ArrayList[Long](math.max(8, n))
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(a, b)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(a = c(0), b = c(1))
  override def withNewMutableAggBufferOffset(o: Int): CollectLongPairsCapped =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CollectLongPairsCapped =
    copy(inputAggBufferOffset = o)
}

/** `collect_set` over longs with a hard cap on DISTINCT elements: a group
  * stops growing at `cap + 1` distinct values (the +1 lets callers tell
  * "exactly cap" from "over cap" and drop the group).
  *
  * Unlike [[CollectLongsCapped]], the cap interacts with dedup so the
  * OUTCOME is arrival-order-independent: a group with ≤ cap distinct
  * values always collects ALL of them (duplicates never consume cap
  * budget — the set only grows on a NEW value), and a group with > cap
  * distinct values always reaches cap+1 and can be filtered. That makes
  * "per-key neighbor list, unless the key is a hub" a deterministic
  * SINGLE-shuffle groupBy even on duplicated input — e.g. co-occurrence
  * edge generation straight from the fact table, skipping the separate
  * pre-distinct shuffle AND the window-count sort. */
case class CollectLongsDistinctCapped(
    child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.LinkedHashSet[Long]] {

  private val limit = cap + 1

  override def createAggregationBuffer(): java.util.LinkedHashSet[Long] =
    new java.util.LinkedHashSet[Long](8)

  override def update(buf: java.util.LinkedHashSet[Long], input: InternalRow)
      : java.util.LinkedHashSet[Long] = {
    if (buf.size() < limit) {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: java.util.LinkedHashSet[Long],
      b: java.util.LinkedHashSet[Long]): java.util.LinkedHashSet[Long] = {
    val it = b.iterator()
    while (a.size() < limit && it.hasNext) a.add(it.next())
    a
  }

  override def eval(buf: java.util.LinkedHashSet[Long]): Any = {
    val out = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.LinkedHashSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.LinkedHashSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.LinkedHashSet[Long](math.max(8, n))
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): CollectLongsDistinctCapped =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CollectLongsDistinctCapped =
    copy(inputAggBufferOffset = o)
}

object CollectCapped {
  /** Column API: capped long collect (order within the list is partition-
    * dependent, as with collect_list — callers must not rely on it). */
  def collectLongsCapped(c: Column, cap: Int): Column =
    Bridge.column(CollectLongsCapped(Bridge.expression(c), cap)
      .toAggregateExpression(isDistinct = false))

  /** Column API: distinct-capped long collect. MEMBERSHIP is
    * deterministic (see class doc); element order is not — callers must
    * sort or consume order-insensitively. */
  def collectLongsDistinctCapped(c: Column, cap: Int): Column =
    Bridge.column(CollectLongsDistinctCapped(Bridge.expression(c), cap)
      .toAggregateExpression(isDistinct = false))

  /** Column API: capped (id, payload) collect → array<struct<a,b>>. */
  def collectLongPairsCapped(a: Column, b: Column, cap: Int): Column =
    Bridge.column(CollectLongPairsCapped(Bridge.expression(a),
      Bridge.expression(b), cap)
      .toAggregateExpression(isDistinct = false))
}

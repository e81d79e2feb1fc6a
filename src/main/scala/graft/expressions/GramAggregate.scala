package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Upper-triangle Gram matrix accumulator over integer vectors: one
  * aggregation buffer of d·(d+1)/2 longs that every input vector folds
  * into with a tight multiply-add loop — G[i][j] += q[i]·q[j], i ≤ j.
  *
  * Why it exists (round-4 verdict task #6): the explode formulation
  * materializes d·(d+1)/2 = 2,080 structs PER ROW (41.6M exploded rows
  * at sf0.1) just to hash-aggregate them back down to 2,080 cells. The
  * accumulator keeps the same exact 64-bit arithmetic but does zero
  * per-cell row materialization: per input row it touches a flat long
  * array, partial buffers are one 16.6 KB array per partition, and the
  * final merge is elementwise adds of P arrays. |q|≤127 ⇒ p ≤ 16129 per
  * cell per row → ~5.7e14 rows of 64-bit headroom.
  *
  * The buffer's slot 0 stores d (0 = not yet seen a row); slots 1.. hold
  * the upper triangle row-major: cell(i,j) at 1 + i·d − i·(i−1)/2 + (j−i)
  * for 0-based i ≤ j. eval emits array<struct<i,j,g>> with 1-BASED i, j
  * (matching the SQL oracle's sequence(1, d) convention); empty input
  * evals to an empty array. Vectors of inconsistent length fail loudly.
  */
case class GramUpperTriangleAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  // ArrayData storage is physical: getLong on array<int>/array<double>
  // would silently read garbage, so anything but array<long> must fail
  // at analysis time, not mis-accumulate at run time (return type
  // inferred — AbstractDataType itself is private[sql]).
  override def inputTypes = Seq(ArrayType(LongType))

  override def createAggregationBuffer(): Array[Long] = Array(0L)

  private def cellCount(d: Int): Int = d * (d + 1) / 2

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    if (d == 0) return buf
    val b = if (buf(0) == 0L) new Array[Long](1 + cellCount(d)) else buf
    if (b(0) == 0L) b(0) = d
    require(b(0) == d,
      s"gramUpperTriangle: vector length $d != first seen ${b(0)}")
    val q = new Array[Long](d)
    var i = 0
    while (i < d) {
      // fail loudly, never mis-accumulate: a null element has no sound
      // 0-substitution (SQL semantics would null the product out of the
      // sum, not zero it)
      require(!arr.isNullAt(i),
        s"gramUpperTriangle: null element at index $i — clean or filter " +
        "nullable vectors before aggregating")
      q(i) = arr.getLong(i); i += 1
    }
    var k = 1
    i = 0
    while (i < d) {
      val qi = q(i)
      var j = i
      while (j < d) { b(k) += qi * q(j); k += 1; j += 1 }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b(0) == 0L) return a
    if (a(0) == 0L) return b
    require(a(0) == b(0),
      s"gramUpperTriangle: merging buffers of different d ${a(0)} vs ${b(0)}")
    var i = 1
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val d = buf(0).toInt
    val out = new Array[AnyRef](cellCount(d))
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(k) = InternalRow((i + 1).toLong, (j + 1).toLong, buf(1 + k))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", LongType, nullable = false),
      StructField("j", LongType, nullable = false),
      StructField("g", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): GramUpperTriangleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramUpperTriangleAgg =
    copy(inputAggBufferOffset = o)
}

object GramAggregate {
  /** Column API: fold array<long> vectors into the upper-triangle Gram
    * cells array<struct<i,j,g>> (1-based i ≤ j). */
  def gramUpperTriangle(c: Column): Column =
    Bridge.column(GramUpperTriangleAgg(Bridge.expression(c))
      .toAggregateExpression(isDistinct = false))
}

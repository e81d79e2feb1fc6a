package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Per-group top-k as a bounded-heap aggregate: the per-group analogue
  * of Spark's global `TakeOrderedAndProject`, which has no per-group
  * form. Keeps the k largest (score, id) pairs per group in a size-k
  * binary min-heap; emits them score-desc (ties id-desc, so the result
  * is a deterministic total order).
  *
  * Why it exists at scale: the window spelling (`row_number() ≤ k`)
  * shuffles and SORTS every row of every group — O(rows) exchange
  * bytes, O(group·log group) sort time; `slice(sort_array(collect_list))`
  * buffers whole groups (OOM on a hot key). This aggregate is
  * partial-aggregable: map-side buffers never exceed k entries, merges
  * are O(k), shuffle bytes are O(groups·k). The same hot-key-bounded
  * discipline as [[CollectLongsCapped]], applied to ranked selection.
  *
  * Rows with NULL score or id are ignored (SQL aggregates skip nulls).
  */
case class TopKPairsAgg(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  // analysis-time coercion/rejection instead of an executor-side
  // ClassCastException on wrong-typed SQL inputs (return type inferred —
  // AbstractDataType itself is private[sql])
  override def inputTypes = Seq(DoubleType, LongType)

  private def cmp = TopKPairsAgg.cmp

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k, cmp)

  private def offer(buf: java.util.PriorityQueue[(Double, Long)],
      p: (Double, Long)): Unit = {
    if (buf.size() < k) buf.offer(p)
    else if (cmp.compare(p, buf.peek()) > 0) { buf.poll(); buf.offer(p) }
  }

  override def update(buf: java.util.PriorityQueue[(Double, Long)],
      input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(a: java.util.PriorityQueue[(Double, Long)],
      b: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  // NON-destructive: running window frames re-eval the same buffer after
  // each row (as Spark's own TypedImperativeAggregates document), so the
  // heap must survive eval — copy out and sort instead of polling.
  override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
    val arr = buf.toArray(new Array[(Double, Long)](buf.size()))
    java.util.Arrays.sort(arr, TopKPairsAgg.cmp.reversed())
    new GenericArrayData(arr.map { case (s, id) =>
      InternalRow(s, id): Any
    })
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(score = c(0), id = c(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = o)
}

object TopKPairsAgg {
  // min-heap on (score, id): root = weakest kept pair, evicted first
  val cmp: java.util.Comparator[(Double, Long)] =
    new java.util.Comparator[(Double, Long)] with Serializable {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
}

object TopKHeap {
  /** Column API: array of the k largest (score, id) structs, score-desc
    * then id-desc — a deterministic total order. */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKPairsAgg(Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression(isDistinct = false))
}

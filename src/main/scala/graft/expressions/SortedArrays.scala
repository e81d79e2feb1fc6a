package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Merge-scan set operations over SORTED long arrays — the allocation-free
  * analog of `array_intersect` (which builds a per-row hash set). Used by
  * the triangle-counting broadcast regime, where the same broadcast
  * adjacency arrays are intersected once per edge: a merge scan is
  * O(|a|+|b|) comparisons with zero hashing and zero per-row scratch
  * allocation beyond the output. Inputs MUST be ascending-sorted and
  * duplicate-free (e.g. `sort_array(collect_list(...))` over distinct
  * values); violating that silently under-counts. */
object SortedArrays {

  /** Elements present in BOTH sorted ascending duplicate-free arrays,
    * ascending. */
  def intersectSorted(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0
    var j = 0
    var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { out(k) = x; k += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, k))
  }

  /** Column wrapper for [[IntersectSortedLongs]]. */
  def intersectSorted(a: Column, b: Column): Column =
    Bridge.column(IntersectSortedLongs(
      Bridge.expression(a), Bridge.expression(b)))
}

/** array<long> ∩ array<long> for sorted duplicate-free inputs, by merge
  * scan (see [[SortedArrays.intersectSorted]]). Codegen'd: the generated
  * code calls the static merge directly, staying inside whole-stage
  * codegen like the TextHash sorted-merge family. */
case class IntersectSortedLongs(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  // getLong on non-long ArrayData storage mis-reads silently; require
  // array<long> at analysis time (return type inferred —
  // AbstractDataType itself is private[sql])
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    SortedArrays.intersectSorted(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SortedArrays$$.MODULE$$.intersectSorted($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a string set in one fused pass.
  *
  * For each element only two base xxhash64 values are computed; the k
  * hash functions are the standard affine family hᵢ = h1 + i·h2
  * (Kirsch-Mitzenmacher), so cost is O(|set| · bytes + |set| · k) adds
  * instead of k full hashes — and the whole signature is one codegen'd
  * expression rather than k nested higher-order functions.
  */
object MinHashSig {
  def minhash(shingles: Column, k: Int): Column =
    column(MinHashSigExpr(expression(shingles), k))

  /** Fraction of agreeing components of two signatures — the unbiased
    * MinHash estimate of Jaccard similarity. */
  def overlap(a: Column, b: Column): Column =
    column(SigOverlapExpr(expression(a), expression(b)))

  /** Used by codegen; kept as a tiny static-shaped helper. */
  def sig(arr: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28cL)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x41c64e6dL) | 1L
        var j = 0
        var h = h1
        while (j < k) {
          if (h < mins(j)) mins(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class SigOverlapExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  // getLong on non-long ArrayData storage mis-reads silently
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var eq = 0; var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val eq = ctx.freshName("eq")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $eq = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $eq++;
         |}
         |${ev.value} = $n == 0 ? 0.0 : (double) $eq / $n;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  // consumes STRING shingles (getUTF8String), unlike the array<long>
  // signature family
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    MinHashSig.sig(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = "graft.expressions.MinHashSig$.MODULE$"
      s"${ev.value} = $cls.sig($a, $k);"
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

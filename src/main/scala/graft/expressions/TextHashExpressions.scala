package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text-shingling expressions.
  *
  * The HOF formulation (sequence → transform → slice → array_join →
  * array_distinct) is interpreted and allocates per shingle; these fuse
  * tokenize → shingle → hash → distinct → sort into one pass per row and
  * represent shingle sets as sorted long arrays. Downstream set ops
  * (Jaccard, MinHash) then run on primitive longs with merge scans — the
  * difference between an interpreted ~5s/5k-docs stage and a negligible
  * one, and at 100 TB the difference between shuffling strings and longs.
  */
object TextHash {

  /** Sorted distinct xxhash64 values of lowercase word n-gram shingles. */
  def shingleHashes(text: Column, n: Int): Column =
    column(ShingleHashes(expression(text), n))

  /** Jaccard similarity of two sorted long arrays (merge scan). */
  def jaccardSorted(a: Column, b: Column): Column =
    column(JaccardSorted(expression(a), expression(b)))

  /** MinHash signature from pre-hashed shingles: hᵢ = h1 + i·h2 with
    * h1 = shingle hash, h2 = splitmix(h1) | 1. */
  def minhashFromHashes(hashes: Column, k: Int): Column =
    column(MinHashFromHashesExpr(expression(hashes), k))

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def shingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString.trim
    if (s.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val toks = s.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val set = new java.util.TreeSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      set.add(XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length, 42L))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  def minhashFrom(hashes: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < hashes.numElements()) {
      val h1 = hashes.getLong(i)
      val h2 = mix(h1) | 1L
      var h = h1; var j = 0
      while (j < k) {
        if (h < mins(j)) mins(j) = h
        h += h2; j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    TextHash.shingles(a.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.TextHash$$.MODULE$$.shingles($a, $n);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHash.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.TextHash$$.MODULE$$.jaccard($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class MinHashFromHashesExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    TextHash.minhashFrom(a.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.TextHash$$.MODULE$$.minhashFrom($a, $k);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDFs,
  * no MLlib dependency in the hot path. All accumulation is in double,
  * left-to-right (deterministic per row).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v))

  /** Random-hyperplane sign bits (SimHash for dense vectors / LSH
    * bucketing primitive): sign of dot(v, hᵢ) for deterministic
    * pseudo-random hyperplanes derived from (seed, i, dim-index). The
    * hyperplane component is a cheap integer-hash-to-[-1,1] map computed
    * inline — shuffle-free and identical across executors. */
  def hyperplaneBits(v: Column, nBits: Int, seed: Int): Column =
    transform(sequence(lit(0), lit(nBits - 1)), bit => {
      val s = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => {
          val h = pmod(hash(i, bit, lit(seed)).cast("long"), lit(2000003L))
          x.cast("double") * (h.cast("double") / lit(1000001.0) - lit(1.0))
        }),
        lit(0.0), (acc, x) => acc + x)
      when(s >= 0, lit(1)).otherwise(lit(0))
    })

  /** Pack a bit array into a long (for ≤63-bit LSH bucket keys). */
  def packBits(bits: Column): Column =
    aggregate(bits, lit(0L), (acc, b) => shiftleft(acc, 1) + b.cast("long"))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: build a bitset from the (small) dimension
  * side's join keys, broadcast it, and pre-filter the fact side at the
  * scan stage — the rows that survive are a superset of the true join
  * matches (no false negatives; false-positive rate set by `mBits`).
  *
  * Why it matters at 100 TB: a selective dim-side predicate normally
  * only prunes the fact table AFTER the join shuffle. The Bloom filter
  * moves that pruning into the fact scan — a pure, codegen'd, pushdown-
  * friendly Column predicate — so the shuffle carries only rows that
  * might match (Spark's own runtime `bloom_filter_agg` rewrite does the
  * same for equi-joins; this operator makes the step explicit,
  * composable with non-join consumers, and cross-engine checkable).
  *
  * Scale shape: the build is a distinct-agg of bit POSITIONS, O(min(2kn,
  * m)) ints shuffled, and the driver-side collect is bounded by `mBits`
  * values (m/8 bytes of bitset, independent of build cardinality — a
  * 2²⁰-bit filter is 128 KiB however many build rows exist). The probe
  * is zero-shuffle.
  *
  * Portability: bit positions come from 32-bit words of the md5 digest
  * (the engine's portable hash family — CLAUDE.md invariants), so the
  * exact surviving-row set (false positives included) is reproducible in
  * any engine: position i = `('0x'||substr(md5(key),8i+1,8))::BIGINT %
  * m` in DuckDB. Membership = every one of the k positions set.
  *
  * Reference analog: the reference prunes fact scans with dim-key
  * IN-lists built by a prior query (`clickhouse/v1/operator.py` query
  * templating); a Bloom bitset is the same idea with O(1) probe cost
  * and bounded size at any key cardinality.
  */
object Bloom {

  /** The k portable bit positions of `key` in an `mBits`-bit filter:
    * consecutive 32-bit words of md5(cast(key as string)), mod m.
    * `mBits` must be a power of two ≤ 2³² (unbiased modulo) and k ≤ 4
    * (a 128-bit digest holds four 32-bit words). */
  def positions(key: Column, mBits: Int, k: Int): Seq[Column] = {
    require(k >= 1 && k <= 4, s"k must be in [1,4] (md5 has 4 words), got $k")
    require(mBits > 0 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two, got $mBits")
    val digest = md5(key.cast("string").cast("binary"))
    (0 until k).map { i =>
      conv(substring(digest, i * 8 + 1, 8), 16, 10).cast("bigint") % mBits
    }
  }

  /** Build the bitset driver-side: distinct positions (≤ mBits rows — the
    * collect is bitset-bounded no matter how large `build` is) packed
    * into little-endian 64-bit words. */
  def buildBits(build: DataFrame, keyCol: String, mBits: Int, k: Int = 2): Array[Long] = {
    val words = new Array[Long]((mBits + 63) / 64)
    // null keys never equal anything in SQL join semantics — skip them
    // (a null would also turn every position null and NPE the pack loop)
    build.filter(col(keyCol).isNotNull)
      .select(explode(array(positions(col(keyCol), mBits, k): _*)).as("pos"))
      .distinct().collect()
      .foreach { r =>
        val p = r.getLong(0).toInt
        words(p >> 6) |= 1L << (p & 63)
      }
    words
  }

  /** Membership probe: all k positions set in `bits`. Pure Column
    * arithmetic over an array literal — codegen'd, zero-shuffle, and
    * eligible for scan-stage evaluation. */
  def mightContain(bits: Array[Long], key: Column, mBits: Int, k: Int = 2): Column = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.ShiftRightUnsigned
    val arr = typedlit(bits.toSeq)
    def ushr(word: Column, n: Column): Column =
      Bridge.column(ShiftRightUnsigned(Bridge.expression(word), Bridge.expression(n)))
    positions(key, mBits, k)
      .map { p =>
        ushr(element_at(arr, (p / 64).cast("int") + 1),
          (p % 64).cast("int")).bitwiseAND(1L) === 1L
      }
      .reduce(_ && _)
  }

  /** Fact-side pre-filter: rows of `fact` whose `factKey` might appear in
    * `dim.dimKey` — a scan-stage superset of the semi-join, to be
    * followed by the exact join (or used alone where false positives are
    * acceptable, e.g. cache admission / candidate routing). */
  def pruneJoin(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      mBits: Int = 1 << 20, k: Int = 2): DataFrame =
    fact.filter(mightContain(buildBits(dim, dimKey, mBits, k), col(factKey), mBits, k))
}

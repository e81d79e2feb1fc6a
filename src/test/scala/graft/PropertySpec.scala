package graft

import graft.expressions.TopKPairsAgg
import graft.plans.BroadcastAsOfJoinExec.search
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks (ScalaCheck) for the pure kernels inside the
  * custom operators — the pieces whose correctness the Spark-level specs
  * exercise only at fixed points. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: $r")
  }

  test("as-of binary search matches the linear-scan definition") {
    val gen = for {
      ts <- Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.sorted.toArray)
      probe <- Gen.chooseNum(-1100L, 1100L)
      fwd <- Gen.oneOf(true, false)
    } yield (ts, probe, fwd)
    check(Prop.forAll(gen) { case (ts, t, fwd) =>
      val expect =
        if (fwd) ts.indexWhere(_ >= t) match { case -1 => -1; case i =>
          // first index with ts >= t
          i }
        else ts.lastIndexWhere(_ <= t)
      search(ts, t, fwd) == expect
    }, "search")
  }

  test("heap top-k equals sort-based top-k under arbitrary partitioning and merge order") {
    val gen = for {
      k <- Gen.chooseNum(1, 8)
      rows <- Gen.listOf(Gen.zip(Gen.chooseNum(-50.0, 50.0), Gen.chooseNum(0L, 30L)))
      nParts <- Gen.chooseNum(1, 5)
      seed <- Gen.chooseNum(0, 1000)
    } yield (k, rows, nParts, seed)
    check(Prop.forAll(gen) { case (k, rows, nParts, seed) =>
      val agg = TopKPairsAgg(null, null, k)
      val rnd = new scala.util.Random(seed)
      // scatter rows into partitions, build per-partition buffers via
      // offer-order, serialize/deserialize each (the shuffle path), then
      // merge in shuffled order
      val parts = Array.fill(nParts)(agg.createAggregationBuffer())
      rows.foreach { case (s, id) =>
        val buf = parts(rnd.nextInt(nParts))
        // mimic update() without an InternalRow: use merge of a 1-elem buffer
        val one = agg.createAggregationBuffer(); one.offer((s, id))
        agg.merge(buf, one)
      }
      val roundTripped = parts.map(b => agg.deserialize(agg.serialize(b)))
      val merged = rnd.shuffle(roundTripped.toList)
        .foldLeft(agg.createAggregationBuffer())(agg.merge)
      val got = {
        val arr = merged.toArray(new Array[(Double, Long)](merged.size()))
        java.util.Arrays.sort(arr, TopKPairsAgg.cmp.reversed()); arr.toSeq
      }
      val expect = rows.sorted(Ordering.by[(Double, Long), (Double, Long)] {
        case (s, id) => (-s, -id) }).take(k)
      got == expect
    }, "topk")
  }
}

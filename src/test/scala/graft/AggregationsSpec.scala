package graft

import graft.operators.Aggregations
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class AggregationsSpec extends SparkSpec {
  import spark.implicits._

  private def txnFrame = Seq(
    // (transaction_id, type, coin_value, coin_value_usd, fee, fee_usd, block_date_time, sender, receiver)
    ("t1", 0, 10.0, 20.0, 1.0, 2.0, "2024-01-02", "a", "x"),
    ("t1", 1, 5.0, 10.0, 0.5, 1.0, "2024-01-03", "a", "y"),
    ("t1", 2, 3.0, 6.0, 0.25, 0.5, "2024-01-01", "b", "x"),
    ("t2", 0, 7.0, 14.0, 0.0, 0.0, "2024-01-05", "c", "z"))
    .toDF("transaction_id", "type", "coin_value", "coin_value_usd",
      "fee", "fee_usd", "block_date_time", "sender_address", "receiver_address")

  test("transactionsAgg reproduces the reference's filtered sums (A3)") {
    val out = Aggregations.transactionsAgg(txnFrame)
      .orderBy("transaction_id").collect()
    val t1 = out(0)
    assert(t1.getAs[String]("transaction_id") == "t1")
    assert(t1.getAs[Double]("external_value") == 10.0)      // type=0 only
    assert(t1.getAs[Double]("internal_value") == 5.0)       // type=1 only
    assert(t1.getAs[Double]("token_transfer_usd") == 6.0)   // type=2 only
    assert(t1.getAs[Double]("txn_fee") == 1.75)             // unfiltered
    assert(t1.getAs[String]("block_date") == "2024-01-03")  // max
    val t2 = out(1)
    assert(t2.getAs[Double]("external_value") == 7.0)
    assert(t2.getAs[Any]("internal_value") == null)         // no type=1 rows
  }

  test("linkInputsAgg: filtered value, unfiltered usd (A4 asymmetry)") {
    val out = Aggregations.linkInputsAgg(txnFrame)
      .orderBy("transaction_id", "sender_address").collect()
    // t1/a: types 0,1 → value = (10+1)+(5+0.5) = 16.5; usd over ALL a-rows = (20+2)+(10+1)=33
    val t1a = out(0)
    assert(t1a.getAs[Double]("value") == 16.5)
    assert(t1a.getAs[Double]("value_usd") == 33.0)
    // t1/b: type 2 → value null, usd = 6.5
    val t1b = out(1)
    assert(t1b.getAs[Any]("value") == null)
    assert(t1b.getAs[Double]("value_usd") == 6.5)
  }

  test("linkOutputsAgg: both sums filtered to types 0/1 (A5)") {
    val out = Aggregations.linkOutputsAgg(txnFrame)
      .orderBy("transaction_id", "receiver_address").collect()
    // t1/x: rows type0(10) + type2(3, excluded) → 10
    assert(out(0).getAs[Double]("value") == 10.0)
    assert(out(0).getAs[Double]("value_usd") == 20.0)
  }

  test("chainState = groupBy max over requested columns (A6)") {
    val out = Aggregations.chainState(
      txnFrame.withColumnRenamed("transaction_id", "chain"),
      "chain", Seq("coin_value", "block_date_time"))
      .orderBy("chain").collect()
    assert(out(0).getAs[Double]("coin_value") == 10.0)
    assert(out(0).getAs[String]("block_date_time") == "2024-01-03")
  }

  test("latestBlock is a one-pass max/max_by (A1 two-query fix)") {
    val df = Seq((1L, "d1"), (5L, "d5"), (3L, "d3")).toDF("block", "d")
    val row = Aggregations.latestBlock(df, "block", "d").head()
    assert(row.getAs[Long]("latest_block") == 5L)
    assert(row.getAs[String]("latest_block_date") == "d5")
  }

  test("exactSum is independent of partitioning") {
    val vals = (1 to 1000).map(i => i * 0.01)
    val a = Aggregations.exactSum(col("v"))
    val one = vals.toDF("v").coalesce(1).agg(a).head().getDouble(0)
    val many = vals.toDF("v").repartition(13).agg(a).head().getDouble(0)
    assert(one == many)
    assert(one == 5005.0)
  }

  test("weightedMedian: hand case, duplicate values collapse, partitioning") {
    // g1: values 1(w1), 2(w1), 3(w10) → total 12, crossing at 3
    // g2: value 5 twice (w2+w3=5), 7(w4) → total 9, cum(5)=5 ⇒ 2·5 ≥ 9
    val df = Seq(("g1", 1L, 1L), ("g1", 2L, 1L), ("g1", 3L, 10L),
      ("g2", 5L, 2L), ("g2", 5L, 3L), ("g2", 7L, 4L))
      .toDF("g", "v", "w")
    val got = Aggregations.weightedMedian(df, Seq("g"), "v", "w")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("g1", 3L, 12L), ("g2", 5L, 9L)))
    val rep = Aggregations.weightedMedian(df.repartition(7), Seq("g"), "v", "w")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rep == got)
  }

  test("quantilesDisc: hand cases — unweighted ranks, weighted crossing, partitioning") {
    // a: 1..10 each w=1 → p50=5 (cum 5 ≥ 0.5·10), p90=9, p99=10
    // b: 1(w9), 2(w1) → p50=1, p90=1 (cum 9 ≥ 0.9·10), p99=2 (needs 9.9)
    val df = ((1L to 10L).map(v => ("a", v, 1L)) ++
      Seq(("b", 1L, 9L), ("b", 2L, 1L))).toDF("g", "v", "w")
    val got = Aggregations.quantilesDisc(df, Seq("g"), "v", "w",
      Seq(500000L, 900000L, 990000L))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 5L, 9L, 10L, 10L), ("b", 1L, 1L, 2L, 10L)))
    // median quantile agrees with weightedMedian on its own fixture
    val med = Aggregations.quantilesDisc(
      Seq(("g1", 1L, 1L), ("g1", 2L, 1L), ("g1", 3L, 10L)).toDF("g", "v", "w"),
      Seq("g"), "v", "w", Seq(500000L))
      .as[(String, Long, Long)].collect().toSeq
    assert(med == Seq(("g1", 3L, 12L)))
    val rep = Aggregations.quantilesDisc(df.repartition(7), Seq("g"), "v", "w",
      Seq(500000L, 900000L, 990000L))
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rep == got)
  }

  test("signedLogBucket: monotone over zero, negatives, and msb boundaries") {
    // boundary sweep: powers of two ±1 both signs, zero, sub-bit edges
    val vs = (Seq(0L, 1L, 2L, 3L, 4L, 5L, 7L, 8L, 9L, 15L, 16L, 17L) ++
      (1 to 62).flatMap(k => Seq((1L << k) - 1, 1L << k, (1L << k) + 1)) ++
      Seq(Long.MaxValue)).distinct.sorted
    val all = (vs.map(-_) ++ vs).distinct.sorted
    val got = all.toDF("v")
      .select(col("v"),
        expr(Aggregations.signedLogBucketSql("v")).as("b"))
      .orderBy("v").as[(Long, Long)].collect()
    got.sliding(2).foreach { case Array((v1, b1), (v2, b2)) =>
      assert(b1 <= b2, s"bucket order violated: $v1->$b1 vs $v2->$b2")
    }
    assert(got.forall { case (_, b) => b >= -256 && b <= 256 })
    assert(got.find(_._1 == 0L).get._2 == 0L)
  }

  test("quantilesDisc: zero/negative values, high-cardinality brute-force parity") {
    // mixed-sign domain exercises all three bucket branches; weights > 1
    // exercise weighted crossing inside a bracket
    val rows = (-500L to 500L).map(v => ("m", v, 1L + (v.abs % 3))) ++
      (1L to 4096L).map(v => ("hc", v * v, 1L)) // high-cardinality, sparse
    val df = rows.toDF("g", "v", "w")
    val ppms = Seq(10000L, 250000L, 500000L, 750000L, 990000L)
    val got = Aggregations.quantilesDisc(df, Seq("g"), "v", "w", ppms)
      .orderBy("g").collect()
    // brute-force oracle: min value whose cumulative weight reaches q·tw
    def brute(g: String): (Seq[Long], Long) = {
      val vs = rows.filter(_._1 == g).sortBy(_._2)
      val tw = vs.map(_._3).sum
      val cum = vs.scanLeft(0L)(_ + _._3).tail
      (ppms.map(q => vs(cum.indexWhere(c => c * 1000000L >= q * tw))._2), tw)
    }
    // both physical regimes must agree with each other and the oracle
    // (public quantilesDisc routes; small fixtures take one-window)
    val forced = Aggregations.quantilesDiscBracket(df, Seq("g"), "v", "w",
      ppms).orderBy("g").collect()
    assert(forced.map(_.toSeq).toSeq == got.map(_.toSeq).toSeq)
    for ((r, g) <- got.zip(Seq("hc", "m"))) {
      val (exp, tw) = brute(g)
      val actual = ppms.map(q => r.getAs[Long](s"p$q"))
      assert(actual == exp, s"group $g: got $actual expected $exp")
      assert(r.getAs[Long]("total_w") == tw)
    }
  }

  test("winsorizedSums: exact cutoffs, clip count, raw vs clipped sums") {
    // group g: values 1..10 → p200000 = 2, p800000 = 8 (discrete ranks);
    // clipped: 1→2 and 9,10→8 ⇒ n_clipped = 3,
    // sum_raw = 55, sum_wins = 2+2..8+8+8 = 55 +1 -1 -2 = 53
    val df = (1L to 10L).map(v => ("g", v)).toDF("k", "v")
    val got = Aggregations.winsorizedSums(df, Seq("k"), "v", 200000L, 800000L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == (("g", 10L, 3L, 2L, 8L, 55L, 53L)))
    val rep = Aggregations.winsorizedSums(df.repartition(7), Seq("k"), "v",
      200000L, 800000L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(rep == got)
  }

  test("winsorizedSums invariants on a skewed multi-group input") {
    // heavy-tailed values across 3 groups: for every group the clipped
    // sum must sit in [n·lo, n·hi], raw >= clipped iff the tail is
    // high-sided, and cutoffs must be actual group values
    val rows = for { g <- Seq("a", "b", "c"); i <- 1 to 40 } yield
      (g, if (i % 13 == 0) i * 1000L else i.toLong) // planted outliers
    val df = rows.toDF("k", "v")
    val got = Aggregations.winsorizedSums(df, Seq("k"), "v", 100000L, 900000L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 3)
    val values = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    got.foreach { case (k, n, nClip, lo, hi, raw, wins) =>
      assert(n == 40 && lo < hi)
      assert(values(k).contains(lo) && values(k).contains(hi),
        s"cutoffs must be observed values: $k $lo $hi")
      assert(wins >= n * lo && wins <= n * hi, s"$k clipped sum out of range")
      assert(raw >= wins, s"$k high-sided tail must clip downward")
      assert(nClip > 0 && nClip < n)
    }
  }

  test("chiSquareIndependence: exact hand case incl. zero cells, independence reads 0") {
    // perfectly independent 2x2: every cell o = rt*ct/n exactly → X² = 0
    val indep = Seq.tabulate(8)(i =>
      (if (i % 2 == 0) "r0" else "r1", if (i % 4 < 2) "c0" else "c1"))
      .toDF("r", "c")
    val gi = Aggregations.chiSquareIndependence(indep, "r", "c")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(gi == ((8L, 2L, 2L, 1L, 0L)))
    // fully dependent 2x2 (diagonal): o*n - rt*ct = ±4 per cell, incl.
    // the two ZERO cells; each term (16*1e6)/(4*2*2) = 1e6 → X² = 4e6 ppm
    val dep = Seq(("r0", "c0"), ("r0", "c0"), ("r1", "c1"), ("r1", "c1"))
      .toDF("r", "c")
    val gd = Aggregations.chiSquareIndependence(dep, "r", "c")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(gd == ((4L, 2L, 2L, 1L, 4000000L)))
    // partitioning cannot move the statistic (pure integer arithmetic)
    val gp = Aggregations.chiSquareIndependence(dep.repartition(5), "r", "c")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(gp == gd)
  }

  test("groupedPearson: exact ±1 hand cases, zero-variance group dropped") {
    val df = Seq(
      ("p", 1L, 2L), ("p", 2L, 4L), ("p", 3L, 6L),   // y = 2x  -> r = 1
      ("n", 1L, 3L), ("n", 2L, 2L), ("n", 3L, 1L),   // y = 4-x -> r = -1
      ("z", 1L, 5L), ("z", 2L, 5L))                  // var(y)=0 -> dropped
      .toDF("g", "x", "y")
    val got = Aggregations.groupedPearson(df, Seq("g"), "x", "y")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    // sqrt(vx)·sqrt(vy) carries ±1 ulp vs the exact ±1 — the operator's
    // determinism claim is CROSS-ENGINE bit-equality (the oracle mirrors
    // the same op order), not infinite precision
    assert(got.map(t => (t._1, t._2)) == Seq(("n", 3L), ("p", 3L)))
    assert(math.abs(got(0)._3 + 1.0) < 1e-12 &&
      math.abs(got(1)._3 - 1.0) < 1e-12, s"r values: $got")
    val rep = Aggregations.groupedPearson(df.repartition(5), Seq("g"), "x", "y")
      .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(rep == got) // bit-identical across partitionings
  }

  test("equiDepthHistogram: equal-population buckets, zero cells emitted, tie collapse") {
    // 1..8 into 4 buckets: cuts at p250000=2, p500000=4, p750000=6 —
    // every bucket holds exactly 2 values
    val df = (1L to 8L).map(v => ("g", v)).toDF("g", "v")
    val got = Aggregations.equiDepthHistogram(df, Seq("g"), "v", 4)
      .orderBy("bucket")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 0L, 2L, 3L), ("g", 1L, 2L, 7L),
      ("g", 2L, 2L, 11L), ("g", 3L, 2L, 15L)))
    // all-ties: every value lands in bucket 0, the other cells emit 0
    val ties = Seq(("g", 5L), ("g", 5L), ("g", 5L)).toDF("g", "v")
    val tied = Aggregations.equiDepthHistogram(ties, Seq("g"), "v", 4)
      .orderBy("bucket")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(tied == Seq(("g", 0L, 3L, 15L), ("g", 1L, 0L, 0L),
      ("g", 2L, 0L, 0L), ("g", 3L, 0L, 0L)))
    // partitioning invariance
    val rep = Aggregations.equiDepthHistogram(df.repartition(5),
      Seq("g"), "v", 4).orderBy("bucket")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rep == got)
  }
  test("madOutliers: exact discrete median/MAD, single fat-finger flagged") {
    // values 1..7 + 100: med=4 (rank semantics), devs sorted
    // {0,1,1,2,2,3,3,96} -> MAD=2; only 96 > 3*2
    val df = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 100L)).map(("g", _))
      .toDF("g", "v")
    val got = Aggregations.madOutliers(df, Seq("g"), "v", k = 3L)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got == (("g", 8L, 4L, 2L, 1L)), s"got $got")
    // robustness: the same screen on mean/stddev would move with the
    // outlier; med/mad must not change when the outlier triples
    val worse = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 300L)).map(("g", _))
      .toDF("g", "v")
    val w = Aggregations.madOutliers(worse, Seq("g"), "v", k = 3L)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(w._3 == 4L && w._4 == 2L && w._5 == 1L)
  }

  test("madFlag: emits exactly the rows madOutliers counts, stats attached") {
    val df = (Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 300L)).map(("g", _))
      .toDF("g", "v")
    val flagged = Aggregations.madFlag(df, Seq("g"), "v", k = 3L)
    val out = flagged.filter(col("is_outlier"))
      .select("v", "med", "mad").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((300L, 4L, 2L))) // med 4, mad 2, only 300 spikes
    // parity with the count-only screen: same n, same outlier count
    val summary = Aggregations.madOutliers(df, Seq("g"), "v", k = 3L)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(flagged.count() == summary._2)
    assert(flagged.filter(col("is_outlier")).count() == summary._5)
    // pass-through: every input column survives with its value
    assert(flagged.select("g", "v").as[(String, Long)].collect().sorted
      .toSeq == df.as[(String, Long)].collect().sorted.toSeq)
  }

  test("percentileRanksPpm: hand case, brute parity, quantile consistency") {
    // a: 1..10 w=1 → rank(v) = v·100000; b: 1(w9),2(w1) → 900000, 1000000
    val df = ((1L to 10L).map(v => ("a", v, 1L)) ++
      Seq(("b", 1L, 9L), ("b", 2L, 1L))).toDF("g", "v", "w")
    val got = Aggregations.percentileRanksPpm(df, Seq("g"), "v", "w")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val expA = (1L to 10L).map(v => ("a", v, 1L, v * 100000L))
    assert(got.toSeq == expA ++ Seq(("b", 1L, 9L, 900000L),
      ("b", 2L, 1L, 1000000L)))
    // brute parity on a mixed-sign high-cardinality column (all three
    // signed-bucket branches + multi-value buckets)
    val rows = (-500L to 500L).map(v => ("m", v * v * (if (v < 0) -1L else 1L),
      1L + (v.abs % 3)))
    val hc = rows.toDF("g", "v", "w")
    val r2 = Aggregations.percentileRanksPpm(hc, Seq("g"), "v", "w")
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    val sorted = rows.sortBy(_._2)
    val tw = sorted.map(_._3).sum
    val cum = sorted.scanLeft(0L)(_ + _._3).tail
    val brute = sorted.zip(cum).map { case ((_, v, w), c) =>
      (v, w, c * 1000000L / tw) }
    assert(r2.map(r => (r._2, r._3, r._4)).toSeq == brute)
    // consistency with quantilesDisc: rank_ppm(v) >= q exactly when
    // v >= p<q> (the two operators share rank semantics)
    val qs = Seq(250000L, 500000L, 900000L)
    val cuts = Aggregations.quantilesDisc(hc, Seq("g"), "v", "w", qs)
      .collect().head
    for (q <- qs) {
      val pq = cuts.getAs[Long](s"p$q")
      r2.foreach { case (_, v, _, rp) =>
        assert((rp >= q) == (v >= pq),
          s"rank/quantile disagree at q=$q v=$v rank=$rp cut=$pq")
      }
    }
    // partitioning invariance
    val rep = Aggregations.percentileRanksPpm(hc.repartition(7),
      Seq("g"), "v", "w")
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    assert(rep.toSeq == r2.toSeq)
    // both physical regimes agree (routing is purely physical)
    val forcedB = Aggregations.percentileRanksBracket(hc, Seq("g"), "v", "w")
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    val forcedW = Aggregations.percentileRanksOneWindow(hc, Seq("g"), "v", "w")
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    assert(forcedB.toSeq == r2.toSeq && forcedW.toSeq == r2.toSeq)
  }

}

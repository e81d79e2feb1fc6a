package graft

import graft.operators.{Dedup, Graph, GraphTuning}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Regime-resolver contract: conf override, cost model, logged
  * provenance, and the job-free plan-stats fast path (round-8 tasks —
  * the `broadcastNodeLimit = 2000000L` literal sweep). */
class GraphTuningSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val saved = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def countJobs(body: => Unit): Int = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // the listener bus is async: wait until the count stops moving
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 5000000000L
      while (stable < 3 && System.nanoTime() < deadline) {
        val c = jobs.get()
        if (c == last) stable += 1 else { stable = 0; last = c }
        Thread.sleep(100)
      }
    } finally spark.sparkContext.removeSparkListener(l)
    jobs.get()
  }

  test("resolveNodeLimit: explicit beats conf beats default, with provenance") {
    assert(GraphTuning.resolveNodeLimit(spark, 7L) == ((7L, "explicit")))
    assert(GraphTuning.resolveNodeLimit(spark, GraphTuning.Auto) ==
      ((GraphTuning.DefaultNodeLimit, "default")))
    withConf(GraphTuning.NodeLimitKey, "12345") {
      assert(GraphTuning.resolveNodeLimit(spark, GraphTuning.Auto) ==
        ((12345L, s"conf:${GraphTuning.NodeLimitKey}")))
      // explicit still wins over conf
      assert(GraphTuning.resolveNodeLimit(spark, 0L) == ((0L, "explicit")))
    }
  }

  test("conf override reroutes a default-arg graph call (and is logged)") {
    // symmetric 4-cycle; with the conf limit forced to 0 the default-arg
    // call must leave the broadcast regime and route co-bucketed —
    // identical labels either way (bit-exact loop), different regime.
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (3L, 4L), (4L, 3L), (4L, 1L), (1L, 4L)).toDF("src", "dst")
    val want = Graph.labelPropagation(e, 2)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(GraphTuning.lastDecision.exists(d =>
      d.broadcast && d.limitSource == "default"))
    val got = withConf(GraphTuning.NodeLimitKey, "0") {
      Graph.labelPropagation(e, 2)
        .orderBy("id").as[(Long, Long)].collect().toSeq
    }
    assert(got == want)
    val d = GraphTuning.lastDecision.get
    assert(!d.broadcast && d.limit == 0L &&
      d.limitSource == s"conf:${GraphTuning.NodeLimitKey}")
    assert(d.describe.contains("regime=shuffle/co-bucketed") &&
      d.describe.contains(s"conf:${GraphTuning.NodeLimitKey}"))
  }

  test("cost model: replication cost demotes a fitting broadcast above the floor") {
    // 10M-node state fits an explicit huge limit, but 320 MB/round of
    // broadcast against a 1k-edge shuffle is a clear veto (the floor
    // only protects sub-64MB traffic).
    val d = GraphTuning.decide(spark, "spec", nodeEstimate = 10000000L,
      nodeEstimateSource = "spec", edgeEstimate = 1000L,
      requestedLimit = Long.MaxValue)
    assert(d.fits && !d.broadcast)
    // unknown edge volume: the fit test alone decides
    val d2 = GraphTuning.decide(spark, "spec", nodeEstimate = 10000000L,
      nodeEstimateSource = "spec", edgeEstimate = -1L,
      requestedLimit = Long.MaxValue)
    assert(d2.broadcast)
    // under the floor the veto never fires (local default behavior)
    val d3 = GraphTuning.decide(spark, "spec", nodeEstimate = 1000L,
      nodeEstimateSource = "spec", edgeEstimate = 10L)
    assert(d3.broadcast)
  }

  test("rowUpperBound over-counts, never under-counts, a local plan") {
    val df = Seq.tabulate(100)(i => (i.toLong, (i * 3).toLong))
      .toDF("src", "dst")
    val Some((u, src)) = GraphTuning.rowUpperBound(df)
    assert(u >= 100L)
    assert(src == "plan-rowcount" || src == "plan-size-upper-bound")
  }

  test("tiny symmetric pagerank skips the pre-loop stats job (plan-stats fast path)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L))
    val e = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    def run(coBucketThreshold: Long): (Seq[(Long, Long)], Int) = {
      var out: Seq[(Long, Long)] = null
      val jobs = countJobs {
        out = Graph.pageRankFixedPoint(e, iterations = 2, symmetric = true,
          coBucketEdgeThreshold = coBucketThreshold)
          .orderBy("id").as[(Long, Long)].collect().toSeq
      }
      (out, jobs)
    }
    // default thresholds: the LocalRelation plan bound proves the graph
    // tiny — no stats job, decision provenance is the plan bound
    val (fast, fastJobs) = run(40000000L)
    assert(GraphTuning.lastDecision.exists(d =>
      d.broadcast && d.nodeEstimateSource.startsWith("plan-")),
      s"unexpected decision: ${GraphTuning.lastDecision}")
    // coBucketEdgeThreshold=1 defeats the fast path (the bound can no
    // longer rule the co-bucket route out), forcing the one-job stats
    // agg — byte-identical result, exactly one extra job
    val (slow, slowJobs) = run(1L)
    assert(GraphTuning.lastDecision.exists(d =>
      d.broadcast && d.nodeEstimateSource == "stats-agg-hll"))
    assert(slow == fast)
    // the stats agg shows up as extra jobs (2 under AQE: partial + final
    // stage); the fast path must not pay them
    assert(slowJobs > fastJobs,
      s"expected extra stats job(s), got $fastJobs vs $slowJobs")
  }

  test("duplicateClusters logs its regime with edge-count provenance") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val jobsUsed = countJobs {
      val out = Dedup.duplicateClusters(ids, "doc_id", pairs)
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
      assert(out == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
    }
    val msg = GraphTuning.lastRouting.get
    assert(msg.contains("regime=driver-union-find"))
    assert(msg.contains("plan-size-upper-bound") ||
      msg.contains("plan-rowcount"))
    assert(jobsUsed > 0) // sanity: the listener actually observed the run
  }
}

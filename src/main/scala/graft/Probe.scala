package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-query fixed-cost probe (round-15 optimization instrument): runs
  * ONE query with the Bench methodology (sf0.001 warm-up, noop sink,
  * min over reps) and reports the per-rep JOB / STAGE / TASK counts and
  * task-time totals next to the wall — the breakdown that separates
  * "this query is CPU-dense" (optimize per-task work) from "this query
  * is a ladder of tiny driver actions" (optimize job/pass count, the
  * iterative-loop fixed cost). Bench itself can't carry per-rep stage
  * counts — the always-on listener is deliberately one atomic add —
  * so this harness hosts the heavier instrumentation.
  *
  * Usage: runMain graft.Probe q65_pagerank[,q131_hits...] [sfDir] [reps]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Probe <query[,query...]> [sfDir] [reps]")
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local("probe", 32)
    // SPARK_GRAFT_CONF="k=v;k=v" — runtime-settable confs for A/B probes
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k, v)
        case _ => throw new IllegalArgumentException(
          s"SPARK_GRAFT_CONF: malformed segment '$kv' (expected key=value)")
      }
    })
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    // per-stage run-time attribution: one record per completed stage
    // (id, numTasks, run ms, cpu ms, rdd-scope summary)
    val stageAgg = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          // rdd scopes, innermost-first, deduped — names the operators
          // the stage actually ran (AQE stages all share one callsite)
          val scopes = s.stageInfo.rddInfos.sortBy(_.id)
            .flatMap(r => r.scope.map(_.name).orElse(Option(r.name)))
            .distinct.mkString(" | ").take(200)
          stageAgg.add((s.stageInfo.stageId, s.stageInfo.numTasks,
            m.executorRunTime, m.executorCpuTime / 1000000L, scopes))
        }
        ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(); taskMs.addAndGet(t.taskInfo.duration); ()
      }
    })
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // SPARK_GRAFT_PLANDIR=plans/r15 additionally writes each query's
    // explain("formatted") at the probe SF to <dir>/<query>.txt — the
    // before/after plan evidence files.
    val planDir = sys.env.get("SPARK_GRAFT_PLANDIR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      planDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/$name.txt"),
          fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      }
      try exec(fn(spark, "/root/testdata/sf0.001")) catch {
        case e: Throwable =>
          System.err.println(s"[probe] warmup $name failed: ${e.getMessage}")
      }
      (0 until reps).foreach { rep =>
        Thread.sleep(400) // let the async listener bus drain
        if (rep == reps - 1) stageAgg.clear() // last rep's stage profile
        val (j0, s0, t0, m0) = (jobs.get, stages.get, tasks.get, taskMs.get)
        val w0 = System.nanoTime()
        exec(fn(spark, sfDir))
        val sec = (System.nanoTime() - w0) / 1e9
        Thread.sleep(400)
        println(f"[probe] $name rep=$rep sec=$sec%.3f " +
          f"jobs=${jobs.get - j0} stages=${stages.get - s0} " +
          f"tasks=${tasks.get - t0} taskTotalSec=${(taskMs.get - m0) / 1e3}%.2f")
      }
      import scala.jdk.CollectionConverters._
      stageAgg.asScala.toSeq.sortBy(-_._3).take(16).foreach {
        case (id, nt, run, cpu, scopes) =>
          println(f"[probe-stage] $name id=$id%d tasks=$nt%d " +
            f"runSec=${run / 1e3}%.2f cpuSec=${cpu / 1e3}%.2f  $scopes")
      }
    }
    spark.stop()
  }
}

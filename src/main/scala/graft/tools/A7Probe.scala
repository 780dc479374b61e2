package graft.tools

import scala.jdk.CollectionConverters._

/** Ordered per-iteration probe for the a7_enwiden_pivot single-outlier
  * anomaly (one ~3× sample per run, position hidden by Bench's sorted
  * samples): prints iteration times IN ORDER with GC time and JIT
  * compilation time deltas, so the outlier's cause is attributable.
  *
  *   sbt "runMain graft.tools.A7Probe [iters]"   (SPARK_GRAFT_SF_DIR)
  */
object A7Probe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = graft.GraftSession.local(cpus.toInt, "graft-a7-probe",
      Map("spark.sql.adaptive.enabled" -> "true"))
    val run = graft.SparkEntry.queries("a7_enwiden_pivot")

    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def jitMs: Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    // hypervisor steal ticks (field 8 of /proc/stat cpu line): the host is
    // a VM with noisy neighbors — steal during an iteration is external
    // contention, attributable per-iteration unlike the 1-min load average
    def stealTicks: Long = {
      val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
      line.trim.split("\\s+").drop(1).lift(7).map(_.toLong).getOrElse(0L)
    }

    // Executor-side task-time accounting per iteration: if an outlier
    // iteration's summed task run time is inflated, the CPUs ran slower
    // (external contention); if task time is normal while wall time spikes,
    // the stall is driver-side (scheduling gap, lock, fsync, ...).
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val taskCnt = new java.util.concurrent.atomic.AtomicLong()
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val ms = Option(te.taskMetrics).fold(0L)(_.executorRunTime)
          taskMs.addAndGet(ms)
          taskCnt.incrementAndGet()
          maxTaskMs.updateAndGet(m => math.max(m, ms))
          ()
        }
      })

    run(spark, sfDir).write.format("noop").mode("overwrite").save() // warm-up
    spark.catalog.clearCache(); System.gc()
    (1 to iters).foreach { i =>
      Thread.sleep(300) // let the async listener bus drain the previous iter
      val (g0, j0, s0, tk0, tc0) = (gcMs, jitMs, stealTicks, taskMs.get, taskCnt.get)
      maxTaskMs.set(0)
      val t0 = System.nanoTime()
      run(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[a7] iter $i%2d  ${sec}%6.3f s   gc+${gcMs - g0}%5d ms   " +
        f"jit+${jitMs - j0}%5d ms   steal+${(stealTicks - s0) * 10}%5d ms   " +
        f"task+${taskMs.get - tk0}%6d ms/${taskCnt.get - tc0}%3d tasks   " +
        f"maxTask=${maxTaskMs.get}%5d ms")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/**
 * Dev/measurement tool (guide §1): for each named query, write
 * `.explain("formatted")` to <outDir>/<name>.txt and print a
 * one-line breakdown — construction seconds (plan-time jobs included),
 * timed noop-sink execution seconds, and the JOB / STAGE / TASK counts
 * observed in each phase. Multi-job queries (driver-side loops, eager
 * statement routing) show up immediately as high job counts.
 *
 *   sbt "runMain graft.PlanDump <sfDir> <outDir> <name> [<name>...]"
 *
 * Same session config as Bench so the plans match what the driver
 * benches.
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <query>...")
    val sfDir = args(0); val outDir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Sessions.initCheckpoints(spark)
    new java.io.File(outDir).mkdirs()

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskMetrics != null)
          taskMs.addAndGet(e.taskMetrics.executorRunTime)
      }
    })
    def snap(): (Int, Int, Int, Long) =
      (jobs.get(), stages.get(), tasks.get(), taskMs.get())

    val qs = SparkEntry.queries
    for (name <- args.drop(2)) {
      // warmup (codegen/JIT) — also flushes one full construction
      try {
        qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name warmup failed: ${e.getMessage}")
      }
      val (j0, s0, t0c, m0) = snap()
      val tc0 = System.nanoTime()
      val df = qs(name)(spark, sfDir)
      val tc1 = System.nanoTime()
      // listener events are async — give the bus a beat before snapping
      Thread.sleep(300)
      val (j1, s1, t1c, m1) = snap()
      val planText = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/$name.txt"), planText)
      val te0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val te1 = System.nanoTime()
      Thread.sleep(300)
      val (j2, s2, t2c, m2) = snap()
      println(f"PLANDUMP $name construct=${(tc1 - tc0) / 1e9}%.3fs " +
        f"(jobs=${j1 - j0} stages=${s1 - s0} tasks=${t1c - t0c} taskMs=${m1 - m0}) " +
        f"exec=${(te1 - te0) / 1e9}%.3fs " +
        f"(jobs=${j2 - j1} stages=${s2 - s1} tasks=${t2c - t1c} taskMs=${m2 - m1})")
    }
    spark.stop()
  }
}

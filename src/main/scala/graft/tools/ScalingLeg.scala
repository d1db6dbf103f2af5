package graft.tools

import org.apache.spark.sql.SparkSession

/** One scaling leg in isolation (dev tool, not part of the driver
  * contract): scan a STORED bench corpus -> fused extraction -> count, at
  * a given core count, N times. Exists so the 4v16 gap can be profiled
  * (attach JFR via SPARK_GRAFT_JVM_OPTS) and individual hypotheses
  * iterated in ~30 s instead of an 8-minute full bench pass.
  *
  * Usage: runMain graft.tools.ScalingLeg <corpusDir> <cpus> [reps]
  */
object ScalingLeg {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScalingLeg <corpusDir> <cpus> [reps]")
    val corpus = args(0)
    val cpus = args(1).toInt
    val reps = if (args.length > 2) args(2).toInt else 3

    def session(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("graft-scaling-leg")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        // same split sizing as Bench.session so leg shapes match
        // (overridable here to iterate on split-count hypotheses)
        .config("spark.sql.files.maxPartitionBytes",
          sys.env.getOrElse("LEG_MAX_PART", "2m"))
        .config("spark.sql.files.openCostInBytes",
          sys.env.getOrElse("LEG_OPEN_COST", "1m"))
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    (1 to reps).foreach { i =>
      val s = session()
      val gc = new java.util.concurrent.atomic.AtomicLong(0L)
      val run = new java.util.concurrent.atomic.AtomicLong(0L)
      val cpu = new java.util.concurrent.atomic.AtomicLong(0L)
      val tasks = new java.util.concurrent.atomic.AtomicLong(0L)
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (t.taskMetrics != null) {
              gc.addAndGet(t.taskMetrics.jvmGCTime)
              run.addAndGet(t.taskMetrics.executorRunTime)
              cpu.addAndGet(t.taskMetrics.executorCpuTime)
              tasks.incrementAndGet()
            }
        })
      val t0 = System.nanoTime()
      val n = graft.extract.Triples
        .fromPassagesFused(s, s.read.parquet(corpus)).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // runSum/wall = average busy threads; cpuSum vs runSum = stall
      // fraction inside tasks (memory/GC waits); cpuSum inflation across
      // core counts = hardware contention
      println(f"[leg] cpus=$cpus rep=$i wall=$wall%.3f s " +
        f"gcSum=${gc.get() / 1000.0}%.2f s " +
        f"runSum=${run.get() / 1000.0}%.1f s " +
        f"cpuSum=${cpu.get() / 1e9}%.1f s tasks=${tasks.get()} triples=$n")
      s.stop()
    }
  }
}

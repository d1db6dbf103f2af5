package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Prints ONE JSON line:
  * {"metric":"triples_per_sec","value":N,"unit":"triples/sec",
  *  "queries":{...per-query sec...},"sf":dir,
  *  "pipeline_sec":..., "triples":...,
  *  "scaling":{"cpus_low":8,"t_low":...,"cpus_high":32,"t_high":...,
  *             "efficiency":...}}
  *
  * The scaling block is the sandbox proxy for the north rule's N vs 4N
  * executor requirement (BASELINE.md §B): the same end-to-end triple
  * pipeline on the same input at local[8] vs local[CPUS], efficiency =
  * (t_low / t_high) / (cpus_high / cpus_low). Disable with
  * SPARK_GRAFT_SCALING=0.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** End-to-end KG throughput unit: docs -> passages -> mentions ->
    * linking -> triples, counted.
    */
  private def pipelineTriples(spark: SparkSession, sfDir: String): Long =
    Pipeline.triples(spark, sfDir).count()

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") != "0"
    val warmDir = "/root/testdata/sf0.001"
    val cpusLow = math.max(2, cpus / 4)

    // --- low-parallelism leg (fresh session so executor threads differ)
    val tLow = if (doScaling) {
      val s = session(cpusLow)
      if (new java.io.File(warmDir).isDirectory) pipelineTriples(s, warmDir)
      val (_, t) = timed(pipelineTriples(s, sfDir))
      s.stop()
      t
    } else 0.0

    // --- high-parallelism leg: headline throughput + query timings
    val spark = session(cpus)
    if (new java.io.File(warmDir).isDirectory) pipelineTriples(spark, warmDir)
    val (triples, tHigh) = timed(pipelineTriples(spark, sfDir))
    val tps = triples / tHigh

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, t) = timed {
        try fn(spark, sfDir).count()
        catch { case _: Throwable => -1L }
      }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")

    val scaling =
      if (doScaling && tHigh > 0) {
        val eff = (tLow / tHigh) / (cpus.toDouble / cpusLow)
        f""","scaling":{"cpus_low":$cpusLow,"t_low":$tLow%.3f,"cpus_high":$cpus,"t_high":$tHigh%.3f,"efficiency":$eff%.3f}"""
      } else ""

    println(
      f"""{"metric":"triples_per_sec","value":$tps%.1f,"unit":"triples/sec","queries":$qs,"sf":"$sfDir","pipeline_sec":$tHigh%.3f,"triples":$triples$scaling}""")
    spark.stop()
  }
}

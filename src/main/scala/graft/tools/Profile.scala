package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Pipeline

/** Stage-by-stage wall-time profiler (dev tool, not part of the driver
  * contract). Usage: runMain graft.tools.Profile <sfDir> <cpus>.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    // warm against the profiled layout itself (a fixed warm-up path would
    // crash on hosts without the driver's testdata tree)
    Pipeline.triples(spark, sfDir).count()

    t("spanRows")(graft.ingest.DocsSynth.spanRows(spark, sfDir).count())
    t("docs")(Pipeline.docs(spark, sfDir).count())
    t("passages")(Pipeline.passages(spark, sfDir).count())
    t("mentions")(Pipeline.mentions(spark, sfDir).count())
    t("linked")(Pipeline.linked(spark, sfDir).count())
    t("triples")(Pipeline.triples(spark, sfDir).count())
    t("edges")(Pipeline.edges(spark, sfDir).count())
    spark.stop()
  }
}

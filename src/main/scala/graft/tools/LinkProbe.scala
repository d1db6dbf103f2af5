package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Pipeline

/** Piece-by-piece probe of the linked-stage build (dev tool): isolates
  * the cleanKey evaluation, the distinct-key shuffle, the cascade build
  * and the eager checkpoint — the round-6 evidence that the cleanKey
  * regex chain (not the joins) dominated the stage, motivating the
  * materialized `mkey` column. Usage: runMain graft.tools.LinkProbe
  * [sfDir] [cpus]
  */
object LinkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[link] $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    val m0 = Pipeline.mentions(spark, sfDir)
    t("mentions (cached stage)")(m0.count())
    t("distinct keys")(m0.select("mkey").distinct().count())
    val linked = graft.extract.Linker.link(spark, m0)
    t("link build (no ckpt)")(linked.count())
    t("link localCheckpoint")(linked.localCheckpoint(true).count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Pipeline

/** Diagnostic main: stage-by-stage wall times of the canonicalization
  * path (the most expensive query family), each stage forced with a
  * count. Usage: runMain graft.tools.ProfileCanon [sfDir].
  */
object ProfileCanon {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }
    import org.apache.spark.sql.functions._
    import graft.extract.{Canonicalize, Linker}
    timed("textual")(Pipeline.textual(spark, sfDir).count())
    timed("mentions")(Pipeline.mentions(spark, sfDir).count())
    val txt = Pipeline.textual(spark, sfDir)
    val m = Pipeline.mentions(spark, sfDir)
      .select("doc_id", "pos", "text").localCheckpoint(true)
    val nodes = m.select(Linker.cleanKey(col("text")).as("node")).distinct()
    timed("nodes")(nodes.count())
    timed("aliasPairs")(Canonicalize.aliasPairs(spark, txt).count())
    timed("cooccurrence")(Canonicalize.cooccurrence(m).count())
    timed("edges (all families)")(Canonicalize.edges(spark, txt, m).count())
    timed("clusters (full CC)")(
      Canonicalize.clusters(spark, txt, Pipeline.mentions(spark, sfDir))
        ._1.count())
    spark.stop()
  }
}

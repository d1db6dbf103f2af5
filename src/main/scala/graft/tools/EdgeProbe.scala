package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Time the four cluster-edge families in isolation over a stored bench
  * corpus (dev tool): the cc_edges stage is the super-linear cost at
  * rep-64 (10.6 s at rep-16 -> 64.7 s at rep-64) and this isolates which
  * family carries it.
  *
  * Usage: runMain graft.tools.EdgeProbe <corpusDir> [cpus]
  */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EdgeProbe <corpusDir> [cpus]")
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    val passages = spark.read.parquet(args(0))
    timed("passages_count")(passages.count())
    val mentions = graft.extract.Mentions.fromPassages(spark, passages)
      .toDF().select("doc_id", "pos", "text").localCheckpoint(true)
    timed("mentions_count")(mentions.count())
    val nodes = mentions
      .select(graft.extract.Linker.cleanKey(col("text")).as("node"))
      .distinct().localCheckpoint(true)
    timed("nodes_count")(nodes.count())

    timed("aliasPairs")(
      graft.extract.Canonicalize.aliasPairs(spark, passages).count())
    timed("cooccurrence")(
      graft.extract.Canonicalize.cooccurrence(mentions).count())
    timed("coocMergeEdges")(
      graft.extract.Canonicalize.coocMergeEdges(mentions).count())
    timed("articleEdges")(
      graft.extract.Canonicalize.articleEdges(nodes).count())
    val ratioUdf = udf((a: String, b: String) =>
      graft.extract.Linker.indelRatio(a, b))
    timed("fuzzyEdges")(
      graft.extract.Canonicalize.fuzzyEdges(nodes, 0.90, ratioUdf).count())

    // the other regex-heavy passage scans (events / temporal families)
    timed("events")(
      graft.lore.Events.fromPassages(spark, passages).toDF().count())
    timed("temporal_facts")(
      graft.lore.Temporal.facts(spark, passages).count())
    timed("temporal_relations")(
      graft.lore.Temporal.relations(spark, passages).count())
    spark.stop()
  }
}

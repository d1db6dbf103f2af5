package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Pipeline

/** Piece-by-piece wall-time probe of the q37/q51 CrossBook.resolveAll
  * internals (dev tool): mention pinning, node distinct, each edge
  * family, CC, and the final entity aggregate — so the round-6 record can
  * attribute the two slowest queries' cost to specific operators instead
  * of guessing. Usage: runMain graft.tools.CrossProbe <sfDir> [cpus]
  */
object CrossProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.extract.{Canonicalize, Linker}

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[cross] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }

    // warm
    Pipeline.textual(spark, sfDir).count()

    Seq("q37", "q51").foreach { q =>
      println(s"--- $q ---")
      val txt = Pipeline.textual(spark, sfDir)
      val ments =
        if (q == "q37")
          Pipeline.linked(spark, sfDir)
            .withColumn("book",
              pmod(substring(col("doc_id"), 5, 18).cast("long"), lit(4L)))
        else {
          val names = graft.SparkEntry.q51Names
          val nameCol = element_at(typedlit(names),
            pmod(col("l_orderkey"), lit(20)).cast("int") + 1)
          spark.read.parquet(s"$sfDir/lineitem.parquet")
            .repartition(spark.sparkContext.defaultParallelism)
            .select(
              concat(lit("c"), col("l_orderkey")).as("doc_id"),
              col("l_linenumber").cast("int").as("pos"),
              pmod(col("l_orderkey"), lit(4)).as("book"),
              nameCol.as("nm"))
            .select(col("doc_id"), col("pos"), col("book"),
              explode(array(
                struct(col("nm").as("text"), lit("character").as("entity_type")),
                struct(concat(col("nm"), lit(" Took")).as("text"),
                  lit("character").as("entity_type")),
                struct(concat(col("nm"), lit(" Field")).as("text"),
                  lit("place").as("entity_type")))).as("mn"))
            .select(col("doc_id"), col("pos"), col("book"),
              col("mn.text").as("text"), col("mn.entity_type").as("entity_type"))
        }

      var m: org.apache.spark.sql.DataFrame = null
      t("pin mentions") {
        m = ments.withColumn("node", Linker.cleanKey(col("text")))
          .localCheckpoint(true)
        m.count()
      }
      var nodes: org.apache.spark.sql.DataFrame = null
      t("nodes distinct") {
        nodes = m.select("node").distinct().localCheckpoint(true)
        nodes.count()
      }
      val ratioUdf = udf((a: String, b: String) => Linker.indelRatio(a, b))
      t("fuzzyEdges 0.85")(
        Canonicalize.fuzzyEdges(nodes, 0.85, ratioUdf).count())
      t("aliasPairs cached")(Pipeline.aliasPairs(spark, sfDir).count())
      t("articleEdges")(Canonicalize.articleEdges(nodes).count())
      t("coocMergeEdges")(Canonicalize.coocMergeEdges(m).count())
      val nodeTypes = m
        .filter(col("entity_type") =!= "unknown")
        .groupBy("node", "entity_type").agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(min_by(col("entity_type"),
          struct((col("cnt") * -1).as("nc"), col("entity_type"))).as("ntype"))
      t("nodeTypes")(nodeTypes.count())
      val edges = Canonicalize.fuzzyEdges(nodes, 0.85, ratioUdf)
        .union(Canonicalize.articleEdges(nodes))
        .union(Canonicalize.coocMergeEdges(m)).distinct()
      var assignment: org.apache.spark.sql.DataFrame = null
      t("CC run") {
        val (a, steps) = graft.cc.ConnectedComponents.run(spark, nodes, edges)
        assignment = a
        println(s"[cross]   supersteps=${steps.map(_.changed).mkString(",")}")
        a.count()
      }
      t("entity aggregate") {
        m.join(assignment, Seq("node"))
          .groupBy(col("cluster").as("entity"))
          .agg(countDistinct(col("book")).as("books_appeared"),
            count(lit(1)).as("total_mentions"))
          .count()
      }
      t("full resolveAll") {
        graft.corpus.CrossBook.resolveAll(spark, txt, ments, col("book"),
          pinnedAliasPairs = Some(Pipeline.aliasPairs(spark, sfDir)))._1.count()
      }
    }
    spark.stop()
  }
}

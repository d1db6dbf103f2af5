package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.{Canonicalize, Linker}
import graft.cc.ConnectedComponents

/** Cross-book entity resolution (X1-X6, corpus/resolver.py): per-book
  * mention clusters merged corpus-wide via exact-name / alias / fuzzy>=0.85
  * edges — the same connected-components machinery as the within-book
  * canonicalization (SURVEY.md §2.12), at the corpus level. Exact-name
  * merges are free (nodes are mention keys); alias-statement and
  * fuzzy-ratio (0.85, X3 corpus/resolver.py:236-244) edges feed the CC.
  */
object CrossBook {

  /** Global entity table across books:
    * (entity, canonical_name, books_appeared, total_mentions, member_count).
    * `bookCol` assigns each mention to a book.
    */
  def resolveAll(
      spark: SparkSession,
      textualPassages: DataFrame,
      mentions: DataFrame,
      bookExpr: org.apache.spark.sql.Column): (DataFrame, DataFrame) = {
    val ratioUdf = udf((a: String, b: String) => Linker.indelRatio(a, b))
    val m = mentions
      .withColumn("book", bookExpr)
      .withColumn("node", Linker.cleanKey(col("text")))
      .localCheckpoint(true)
    val nodes = m.select("node").distinct()

    // fuzzy edges at the cross-book 0.85 threshold (X3); blocked
    // equi-join on (first char, length) — see Canonicalize.fuzzyEdges
    val eFuzzy = Canonicalize.fuzzyEdges(nodes, 0.85, ratioUdf)
    val eAlias = Canonicalize.aliasPairs(spark, textualPassages)
      .join(nodes.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .join(nodes.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")

    val (assignment, _) =
      ConnectedComponents.run(spark, nodes, eFuzzy.union(eAlias).distinct())

    val entities = m.join(assignment, Seq("node"))
      .groupBy(col("cluster").as("entity"))
      .agg(
        countDistinct(col("book")).as("books_appeared"),
        count(lit(1)).as("total_mentions"),
        countDistinct(col("node")).as("member_count"))
    (entities, assignment)
  }

  /** X6: entities appearing in more than one book. */
  def multiBookEntities(entities: DataFrame): DataFrame =
    entities.filter(col("books_appeared") > 1)
}

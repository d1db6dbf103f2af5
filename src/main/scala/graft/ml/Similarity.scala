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

  /** Cosine near-duplicate pairs above a threshold — EXACT all-pairs,
    * fully distributed (no driver collect): the block-grid self-join.
    * Each vector is assigned block g = vec_id % G; a pair of blocks (i, j),
    * i <= j, is one join key, so the quadratic compare is spread over
    * G(G+1)/2 independent tasks. The left side replicates each vector to
    * the (g, j >= g) keys, the right side to the (i <= g, g) keys —
    * communication O(N*G), compute O(N^2/2) with no single hot task and
    * nothing on the driver. At a genuinely high threshold use
    * [[nearDupPairsLsh]] instead — exact all-pairs is inherent when the
    * threshold is this permissive (cos 0.4 keeps ~63% random-bit agreement,
    * below any useful LSH gap).
    */
  def nearDupPairs(
      embeddings: DataFrame,
      threshold: Double,
      numBlocks: Int = 8): DataFrame = {
    val e = embeddings.select(col("vec_id").cast("long").as("vid"),
      col("embedding").as("emb"),
      pmod(col("vec_id"), lit(numBlocks)).cast("int").as("g"))
    val left = e
      .withColumn("bj", explode(sequence(col("g"), lit(numBlocks - 1))))
      .select(col("g").as("bi"), col("bj"),
        col("vid").as("a"), col("emb").as("emb_a"))
    val right = e
      .withColumn("bi", explode(sequence(lit(0), col("g"))))
      .select(col("bi"), col("g").as("bj"),
        col("vid").as("b"), col("emb").as("emb_b"))
    // a cross-block pair meets exactly once (in task (min g, max g)) but
    // its id order may disagree with its block order — normalize with
    // least/greatest; the diagonal task needs the a<b filter to halve
    left.join(right, Seq("bi", "bj"))
      .filter(col("bi") =!= col("bj") || col("a") < col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"),
        round(cosine(col("emb_a"), col("emb_b")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Approximate near-duplicate pairs via multi-band SRP-LSH with exact
    * in-bucket rerank — the 100 TB path for realistic (high) thresholds.
    * Candidates = pairs sharing at least one of `bands` b-bit sign-random-
    * projection buckets; survivors are exact-cosine reranked, so there are
    * no false positives — only (quantifiable) missed recall. For a pair at
    * angle theta, P(same bit) = 1 - theta/pi and
    * P(missed) = (1 - p^bits)^bands: at cos 0.9 (p=0.857), 16 bands x 8
    * bits miss 2% of pairs; at cos 0.99, 4e-7. Shuffle volume is
    * O(N * bands); compute is sum of per-bucket quadratic work, which the
    * band hashing keeps small for non-degenerate data.
    */
  def nearDupPairsLsh(
      embeddings: DataFrame,
      threshold: Double,
      dim: Int,
      bands: Int = 16,
      bits: Int = 8): DataFrame = {
    val e = embeddings.select(col("vec_id").cast("long").as("vid"),
      col("embedding").as("emb"))
    val banded = e.select(col("vid"), col("emb"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          srpBucket(col("emb"), dim, bits, planeOffset = b * bits)
            .as("bucket"))): _*)).as("bb"))
      .select(col("vid"), col("emb"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val l = banded.select(col("band"), col("bucket"),
      col("vid").as("a"), col("emb").as("emb_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("vid").as("b"), col("emb").as("emb_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b", "emb_a", "emb_b")
      .dropDuplicates("a", "b") // a pair may collide in several bands
      .select(col("a"), col("b"),
        round(cosine(col("emb_a"), col("emb_b")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Sign-random-projection LSH bucket id: the sign bits of `bits` fixed
    * pseudo-random hyperplanes (deterministic: plane p component j =
    * hash-derived in [-0.5, 0.5)). `planeOffset` selects an independent
    * plane family per band for OR-amplification.
    */
  def srpBucket(emb: Column, dim: Int, bits: Int, planeOffset: Int = 0): Column = {
    val planes: Seq[Seq[Double]] = (0 until bits).map { p0 =>
      val p = p0 + planeOffset
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

  /** LSH-bucketed approximate top-k with multi-band OR-amplification:
    * candidates = union over `bands` independent 1-band buckets of the
    * query (single-band recall cliffs are amplified away:
    * P(candidate) = 1 - (1 - p^bits)^bands), deduped, exact-cosine
    * reranked. The scale path: at 10^12 vectors the banded bucket join
    * replaces the full scan.
    */
  def lshTopK(
      embeddings: DataFrame,
      dim: Int,
      numQueries: Int = 20,
      k: Int = 5,
      bits: Int = 8,
      bands: Int = 8): DataFrame = {
    val banded = embeddings.select(col("vec_id"), col("embedding"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          srpBucket(col("embedding"), dim, bits, planeOffset = b * bits)
            .as("bucket"))): _*)).as("bb"))
      .select(col("vec_id"), col("embedding"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val queries = broadcast(
      banded.filter(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          col("band"), col("bucket")))
    val scored = banded.join(queries, Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("q_emb"), col("embedding"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }
}

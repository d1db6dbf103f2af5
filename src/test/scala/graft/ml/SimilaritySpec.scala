package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("cosine: orthogonal 0, identical 1, opposite -1") {
    import spark.implicits._
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 2f), Seq(1f, 2f), 1.0),
      (Seq(1f, 0f), Seq(-1f, 0f), -1.0)).toDF("a", "b", "want")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"), col("want"))
      .collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("brute-force top-k: exact nearest first, self excluded") {
    val e = emb(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f), // nearest to 0
      2L -> Seq(0f, 1f, 0f),
      3L -> Seq(0.5f, 0.5f, 0f))
    val top = Similarity.bruteForceTopK(e, numQueries = 1, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(top.head == ((1, 1L)))
    assert(!top.map(_._2).contains(0L)) // no self
    assert(top.map(_._1).toSeq == Seq(1, 2, 3))
  }

  test("LSH top-k: same-bucket neighbors are exact-reranked") {
    // near-identical vectors land in the same SRP bucket
    val e = emb(
      0L -> Seq(1f, 0.01f, 0f, 0.02f),
      1L -> Seq(1f, 0.011f, 0f, 0.02f),
      2L -> Seq(0.99f, 0.012f, 0.001f, 0.019f))
    val top = Similarity.lshTopK(e, dim = 4, numQueries = 1, k = 2, bits = 4)
      .collect().map(r => r.getLong(2)).toSet
    assert(top == Set(1L, 2L))
  }

  test("near-dup pairs at threshold") {
    val e = emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(1f, 0.01f), // cos ~ 0.99995 with 0
      2L -> Seq(0f, 1f))
    val pairs = Similarity.nearDupPairs(e, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("LSH near-dup pairs: planted duplicates found, exact rerank, no FPs") {
    // 3 tight duplicate pairs + noise vectors; multi-band SRP must recover
    // every pair at cos >= 0.99 with zero false positives (exact rerank)
    val base = (0 until 16).map(i => math.sin(i * 1.7 + 1).toFloat)
    def jitter(d: Float) = base.zipWithIndex.map { case (x, i) =>
      x + (if (i == 0) d else 0f) }
    val noise = (0 until 6).map(k =>
      (10L + k) -> (0 until 16).map(i => math.cos(i * 2.3 + k * 5).toFloat))
    val e = emb(Seq(
      0L -> base, 1L -> jitter(0.001f),
      2L -> base.map(-_), 3L -> jitter(-0.001f)) ++ noise: _*)
    val exact = Similarity.nearDupPairs(e, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.nearDupPairsLsh(e, 0.99, dim = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Set((0L, 1L), (0L, 3L), (1L, 3L)).subsetOf(exact))
    assert(lsh == exact)
  }

  test("exact near-dup block grid covers every pair exactly once") {
    // all-pairs at threshold -1: every unordered pair must appear once
    val e = emb((0L until 9L).map(i =>
      i -> Seq(math.sin(i + 1.0).toFloat, math.cos(i * 2.0).toFloat)): _*)
    val pairs = Similarity.nearDupPairs(e, -1.0, numBlocks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == 36 && pairs.distinct.length == 36)
    assert(pairs.forall { case (a, b) => a < b })
  }
}

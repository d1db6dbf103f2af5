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

  test("zero-norm rows cannot hijack rank 1 of the top-k (round-5 review)") {
    // a NaN cosine would sort ABOVE every real value in the ranking
    // window; with the zero-norm guard the garbage rows score 0 and the
    // true neighbor keeps rank 1
    val e = emb(
      0L -> Seq(1f, 0f, 0f),
      1L -> Seq(0.9f, 0.1f, 0f), // true nearest to 0
      2L -> Seq(0f, 0f, 0f), // all-zero
      3L -> Seq.empty[Float], // empty
      4L -> Seq(0.5f, 0.5f, 0f))
    val top = Similarity.bruteForceTopK(e, numQueries = 1, k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2)))
    assert(top.head == ((1, 1L)), top.mkString(","))
    assert(top(1) == ((2, 4L)), top.mkString(","))
    // IVF with nprobe = nlist must stay byte-identical on the same input
    val ivf = Similarity.ivfTopK(e, numQueries = 1, k = 2,
      nlist = 2, nprobe = 2)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(ivf.toSeq == top.toSeq)
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

  test("IVF top-k: nprobe = nlist is byte-identical to brute force") {
    // 40 deterministic pseudo-random vectors; probing every cell must
    // degenerate to the exact full scan regardless of centroid placement
    val rnd = new scala.util.Random(11)
    val e = emb((0L until 40L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() - 0.5f)): _*)
    val exact = Similarity.bruteForceTopK(e, numQueries = 4, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    val ivf = Similarity.ivfTopK(e, numQueries = 4, k = 3,
      nlist = 4, nprobe = 4, iterations = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(ivf == exact)
  }

  test("IVF top-k: nprobe < nlist keeps clustered neighbors (recall)") {
    // two tight clusters far apart: each query's true neighbors share its
    // cell, so probing 1 of 2 cells must still find them
    val a = Seq(1f, 0f, 0f, 0f)
    val b = Seq(0f, 0f, 1f, 0f)
    def jitter(v: Seq[Float], eps: Float) =
      v.zipWithIndex.map { case (x, i) => x + (if (i == 1 || i == 3) eps else 0f) }
    val e = emb(
      0L -> jitter(a, 0.01f), 1L -> jitter(b, 0.01f),
      2L -> jitter(a, 0.02f), 3L -> jitter(a, 0.03f),
      4L -> jitter(b, 0.02f), 5L -> jitter(b, 0.03f),
      6L -> jitter(a, 0.04f), 7L -> jitter(b, 0.04f))
    val got = Similarity.ivfTopK(e, numQueries = 2, k = 2,
      nlist = 2, nprobe = 1, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // query 0 (cluster a) finds a-members, query 1 (cluster b) b-members
    assert(got == Set((0L, 2L), (0L, 3L), (1L, 4L), (1L, 5L)))
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

  test("LSH candidate dedup shuffles ids only (no embedding columns)") {
    // the cross-band dropDuplicates is the one unavoidable wide exchange
    // in the LSH paths; embeddings must re-join AFTER it (VERDICT r03 #3 —
    // carrying two dim-d float arrays per candidate multiplied exchange
    // bytes ~50x). Locks the optimized plan's dedup Aggregate to id-only
    // input columns for both LSH surfaces.
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val e = emb((0L until 8L).map(i =>
      i -> (0 until 8).map(j => math.sin(i * 3.1 + j).toFloat)): _*)
    for (df <- Seq(
        Similarity.nearDupPairsLsh(e, 0.9, dim = 8),
        Similarity.lshTopK(e, dim = 8, numQueries = 2, k = 2))) {
      val dedups = df.queryExecution.optimizedPlan.collect {
        case a: Aggregate if a.aggregateExpressions.size == 2 => a
      }
      assert(dedups.nonEmpty, "expected an id-pair dedup Aggregate")
      dedups.foreach { a =>
        val cols = a.child.output.map(_.name)
        assert(!cols.exists(_.toLowerCase.contains("emb")),
          s"embedding column rides the dedup exchange: $cols")
      }
    }
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

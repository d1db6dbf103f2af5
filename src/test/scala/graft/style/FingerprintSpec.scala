package graft.style

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Y9 z-scores, Y10 Burrows' delta, Y11 similarity blend
  * (style/fingerprint.py:139-246).
  */
class FingerprintSpec extends SparkSpec {

  test("z-scores are self-normalized per corpus: mean 0, all 100 words present") {
    import spark.implicits._
    val sents = Seq(
      (0L, "the cat and the dog of the house"),
      (1L, "a completely different text with other words entirely"))
      .toDF("corpus", "text")
    val z = Fingerprint.functionWordZScores(sents, "corpus", "text")
    val rows = z.collect()
    assert(rows.length == 2 * Fingerprint.FunctionWords.size)
    val mean0 = z.filter(col("corpus") === 0).agg(avg("z")).head.getDouble(0)
    assert(math.abs(mean0) < 1e-9)
  }

  test("Burrows' delta: identical corpora -> 0; differing corpora -> > 0") {
    import spark.implicits._
    val sents = Seq(
      (0L, "the old man and the sea of the deep"),
      (1L, "the old man and the sea of the deep"),
      (2L, "she would not have said that to them now"))
      .toDF("corpus", "text")
    val z = Fingerprint.functionWordZScores(sents, "corpus", "text")
    val d = Fingerprint.burrowsDelta(z).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(d((0L, 1L)) < 1e-9)
    assert(d((0L, 2L)) > 0.1)
    assert(math.abs(d((0L, 2L)) - d((1L, 2L))) < 1e-9)
  }

  test("similarity blend: identical fingerprints score ~1, weights 2/1/1") {
    val same = Fingerprint.similarityScore(0.0, 15.0, 15.0, 8.0, 8.0)
    assert(math.abs(same - 1.0) < 1e-9)
    // delta dominates with double weight
    val d1 = Fingerprint.similarityScore(1.0, 15.0, 15.0, 8.0, 8.0)
    assert(math.abs(d1 - (0.5 * 2 + 1 + 1) / 4.0) < 1e-9)
    // FK difference normalized by 12 grades
    val fk = Fingerprint.similarityScore(0.0, 15.0, 15.0, 8.0, 14.0)
    assert(math.abs(fk - (2.0 + 1.0 + 0.5) / 4.0) < 1e-9)
  }
}

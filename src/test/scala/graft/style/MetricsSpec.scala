package graft.style

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {

  test("syllable heuristic (metrics.py:363-387)") {
    assert(Metrics.syllables("cat") == 1)
    assert(Metrics.syllables("hobbit") == 2)
    assert(Metrics.syllables("adventure") == 3)
    assert(Metrics.syllables("fire") == 1) // silent e
    assert(Metrics.syllables("little") == 2) // -le keeps its syllable
    assert(Metrics.syllables("a") == 1) // min 1
  }

  test("Flesch formula is exact on a closed-form fixture (FIXTURES.md §6)") {
    import spark.implicits._
    // 2 sentences, known words/syllables
    val df = Seq(("d", "The cat sat."), ("d", "The dog ran far."))
      .toDF("doc_id", "text")
    val r = Metrics.readability(spark, df, Seq("doc_id")).collect()(0)
    val words = r.getAs[Long]("words")
    val syll = r.getAs[Long]("syllables")
    assert(words == 7 && syll == 7)
    val asl = 7.0 / 2
    val asw = 1.0
    val flesch = BigDecimal(206.835 - 1.015 * asl - 84.6 * asw)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("flesch") == flesch)
  }

  test("sentence metrics: counts, punctuation, passive, dialogue flags") {
    import spark.implicits._
    val df = Seq(
      ("a", "Gandalf was defeated by the Balrog."),
      ("b", "\"Run,\" said Frodo!")).toDF("id", "text")
    val m = Metrics.sentenceMetrics(df, col("text"))
      .collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(m("a").getAs[Int]("word_count") == 6)
    assert(m("a").getAs[Boolean]("is_passive"))
    assert(!m("a").getAs[Boolean]("has_dialogue"))
    assert(m("b").getAs[Boolean]("has_dialogue"))
    assert(m("b").getAs[Boolean]("is_exclamation"))
    assert(m("b").getAs[Int]("comma_count") == 1)
  }

  test("vocabulary profile: TTR and hapax") {
    import spark.implicits._
    val df = Seq("the cat and the hat", "the cat ran").toDF("text")
    val v = Metrics.vocabularyProfile(df, col("text")).collect()(0)
    // words: the(3) cat(2) and hat ran -> total 8, unique 5, hapax 3
    assert(v.getAs[Long]("total_words") == 8)
    assert(v.getAs[Long]("unique_words") == 5)
    assert(v.getAs[Long]("hapax_count") == 3)
  }
}

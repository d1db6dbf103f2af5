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

  test("single-tokenize subordinator count == ten per-word rlike hits " +
    "(round-6 optimization equivalence)") {
    import spark.implicits._
    val subs = Seq("that", "which", "who", "because", "when", "while",
      "although", "if", "since", "unless")
    val cases = Seq(
      "He said that it was so, because the ring which he bore was heavy.",
      "Whoever knows whichever path, if and when, since... unless!",
      "that that that (repeated words count once)",
      "THAT and WHICH uppercase fold under lower()",
      "that's a boundary: apostrophe is a non-word char",
      "ifwhich whothat stuck-together words must NOT count",
      "if1 that2 digit-adjacent must NOT count (\\w includes digits)",
      "under_scored_if also must NOT count",
      "caféthat non-ASCII is a word boundary in java regex? no — " +
        "é is non-word, so 'that' stands alone",
      "", "   ", "no subordinating words at all here")
    val df = cases.toDF("text")
    val newCol = Metrics.sentenceMetrics(df, col("text"))
      .select("text", "subordinators")
    val oldCol = df
      .withColumn("subordinators_old",
        subs.map(w => when(lower(col("text")).rlike(s"\\b$w\\b"), 1)
          .otherwise(0)).reduce(_ + _))
    val joined = newCol.join(oldCol, Seq("text")).collect()
    joined.foreach { r =>
      assert(r.getAs[Int]("subordinators") ==
        r.getAs[Int]("subordinators_old"), s"text: '${r.getAs[String]("text")}'")
    }
  }

  test("fused syllable/complex-word UDF == the two-UDF form " +
    "(round-6 optimization equivalence)") {
    import spark.implicits._
    val texts = Seq(
      "The cat sat.", "The dog ran far.",
      "Adventure beautiful extraordinary readability", // 3+ syllable words
      "  leading  and   trailing   whitespace  ",
      "fire little apple people", "", "a",
      "Mixed CASE Words And punctuation, really!?")
    val df = texts.toDF("text").withColumn("g", lit("x"))
    val out = Metrics.readability(spark, df, Seq("g")).collect()(0)
    // naive recomputation with the pre-optimization per-word double pass
    val syll = texts.map(_.split("\\s+").filter(_.nonEmpty)
      .map(Metrics.syllables).sum).sum
    val cplx = texts.map(_.split("\\s+").filter(_.nonEmpty)
      .count(w => Metrics.syllables(w) >= 3)).sum
    assert(out.getAs[Long]("syllables") == syll)
    assert(out.getAs[Long]("complex_words") == cplx)
  }
}

package graft.style

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Style metrics (reference style/metrics.py, SURVEY.md §2.10) as pure
  * column expressions — whole-stage-codegen friendly, no UDFs in the
  * per-sentence path except the syllable counter used by readability.
  */
object Metrics {

  /** Tokens of a sentence (whitespace split of trimmed text). */
  def wordCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** Per-sentence metric columns (Y1, metrics.py:124-230).
    * Clause depth is approximated by subordinator count and passive voice
    * by the be+participle regex — deterministic stand-ins for the spaCy
    * dependency walk (SURVEY.md Y1 note).
    */
  def sentenceMetrics(df: DataFrame, text: Column): DataFrame = df
    .withColumn("word_count", wordCount(text))
    .withColumn("char_count", length(text))
    .withColumn("avg_word_len",
      when(col("word_count") > 0,
        (length(regexp_replace(trim(text), "\\s+", "")).cast("double")
          / col("word_count"))).otherwise(lit(0.0)))
    .withColumn("comma_count", size(split(text, ",")) - 1)
    .withColumn("punct_count",
      length(text) - length(regexp_replace(text, """[\.,;:!\?\"'\-]""", "")))
    .withColumn("is_question", text.endsWith("?"))
    .withColumn("is_exclamation", text.endsWith("!"))
    .withColumn("has_dialogue",
      text.contains("\"") || text.contains("“"))
    .withColumn("is_passive",
      text.rlike("""\b(was|were|been|is|are|be)\s+\w+(ed|en)\b"""))
    // subordinator count == number of DISTINCT subordinators present as
    // \b-delimited words. One tokenize + array_intersect replaces TEN
    // rlike regex scans per row: after lower(), regex word chars are
    // [a-z0-9_], so splitting on their complement yields exactly the
    // \b-delimited word tokens, and |distinct(tokens) ∩ lexicon| equals
    // the sum of per-word 0/1 rlike hits (MetricsSpec pins equivalence).
    .withColumn("subordinators",
      size(array_intersect(
        split(lower(text), "[^a-z0-9_]+"),
        typedlit(Seq("that", "which", "who", "because", "when", "while",
          "although", "if", "since", "unless")))))

  /** Distribution aggregate columns over a numeric column (Y3,
    * metrics.py:56-74).
    */
  def distribution(c: Column): Seq[Column] = Seq(
    avg(c).as("mean"),
    stddev_samp(c).as("std"),
    min(c).as("min"),
    max(c).as("max"),
    percentile_approx(c, array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
      .as("quartiles"),
    count(c).as("count"))

  /** Syllable heuristic (Y6, metrics.py:363-387): vowel groups with
    * silent-e and -le adjustments, min 1.
    */
  def syllables(word: String): Int = {
    val w = word.toLowerCase(java.util.Locale.ROOT).filter(_.isLetter)
    if (w.isEmpty) return 0
    var groups = 0
    var prevVowel = false
    for (ch <- w) {
      val v = "aeiouy".contains(ch)
      if (v && !prevVowel) groups += 1
      prevVowel = v
    }
    if (w.endsWith("e") && !w.endsWith("le") && groups > 1) groups -= 1
    math.max(1, groups)
  }

  /** floor(x * 10^4 + 0.5) / 10^4 — engine-agnostic 4dp rounding. */
  def floor4(c: Column): Column = floor(c * 10000 + lit(0.5)) / 10000.0

  /** Readability aggregates (Y5, metrics.py:311-360): Flesch Reading
    * Ease, Flesch-Kincaid grade, Gunning Fog. Input: one row per sentence
    * with `text`; output: one row per group.
    */
  private val ReadabilityWs = java.util.regex.Pattern.compile("\\s+")

  /** Per-row (syll, complex_words) columns — ONE fused UDF returning
    * (syllable sum, complex-word count): two separate UDFs each re-split
    * the text and re-ran the syllable counter over every word — the whole
    * pass is halved, values are byte-identical (same tokenizer, same
    * counter; MetricsSpec pins it). Exposed so [[graft.style.Fingerprint]]
    * can compute the readability sums inside its per-corpus metric
    * aggregate instead of a second full scan.
    */
  private[style] def withSyllables(df: DataFrame): DataFrame = {
    val syllUdf = udf((t: String) => {
      var syll = 0
      var cplx = 0
      ReadabilityWs.split(t).foreach { w =>
        if (w.nonEmpty) {
          val s = syllables(w)
          syll += s
          if (s >= 3) cplx += 1
        }
      }
      (syll, cplx)
    })
    df.withColumn("sy", syllUdf(col("text")))
      .withColumn("syll", col("sy._1"))
      .withColumn("complex_words", col("sy._2"))
      .drop("sy")
  }

  /** Readability formulas over an aggregated row set carrying
    * (sentences, words, syllables, complex_words). */
  private[style] def readabilityFinish(agged: DataFrame): DataFrame =
    agged
      .withColumn("asl", col("words").cast("double") / col("sentences"))
      .withColumn("asw", col("syllables").cast("double") / col("words"))
      // floor-based 4dp rounding: Spark's round() goes through
      // Double.toString (shortest round-trip repr), which disagrees with
      // multiply+floor engines on near-tie doubles like 4.42625 — the
      // explicit floor form is bit-deterministic on both sides
      .withColumn("flesch", floor4(
        lit(206.835) - lit(1.015) * col("asl") - lit(84.6) * col("asw")))
      .withColumn("fk_grade", floor4(
        lit(0.39) * col("asl") + lit(11.8) * col("asw") - lit(15.59)))
      .withColumn("gunning_fog", floor4(
        lit(0.4) * (col("asl") +
          lit(100.0) * col("complex_words") / col("words"))))

  def readability(spark: org.apache.spark.sql.SparkSession,
      sentences: DataFrame, groupCols: Seq[String]): DataFrame = {
    val s = withSyllables(sentences.withColumn("wc", wordCount(col("text"))))
    readabilityFinish(
      s.groupBy(groupCols.map(col): _*)
        .agg(
          count(lit(1)).as("sentences"),
          sum(col("wc")).as("words"),
          sum(col("syll")).as("syllables"),
          sum(col("complex_words")).as("complex_words")))
  }

  /** Vocabulary profile over a corpus of sentences (Y4, metrics.py:233-308):
    * word frequencies, TTR, hapax, word-length distribution.
    */
  def vocabularyProfile(sentences: DataFrame, text: Column): DataFrame = {
    val words = sentences
      .select(explode(split(lower(text), "[^a-z']+")).as("word"))
      .filter(length(col("word")) > 0)
    val counts = words.groupBy("word").agg(count(lit(1)).as("cnt"))
    counts.agg(
      sum(col("cnt")).as("total_words"),
      count(lit(1)).as("unique_words"),
      // explicit floor form, not Spark round(): same cross-engine
      // near-tie policy as readability/floor4 above, kept at this
      // function's 6-decimal precision
      (floor(count(lit(1)).cast("double") / sum(col("cnt")) * 1000000
        + lit(0.5)) / 1000000.0).as("ttr"),
      sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax_count"))
  }
}

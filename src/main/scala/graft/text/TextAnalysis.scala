package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: language ID, quality scoring, token counting,
  * document fingerprinting. All pure column expressions (whole-stage
  * codegen), no UDFs.
  */
object TextAnalysis {

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Presence-scored; CJK characters short-circuit to zh.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of", "to"),
    "de" -> Seq("der", "und", "ist", "das", "nicht"),
    "fr" -> Seq("le", "et", "est", "les", "une"),
    "es" -> Seq("el", "y", "es", "los", "una"))

  private def markerScore(text: Column, words: Seq[String]): Column =
    words.map(w => when(text.rlike(s"\\b$w\\b"), 1).otherwise(0))
      .reduce(_ + _)

  /** Language ID: argmax of marker-word scores; CJK presence wins for zh;
    * 'und' (undetermined) when no marker hits.
    */
  def langId(df: DataFrame, text: Column): DataFrame = {
    val lowered = lower(text)
    val scored = LangMarkers.foldLeft(df) { case (d, (lang, words)) =>
      d.withColumn(s"score_$lang", markerScore(lowered, words))
    }
    val best = LangMarkers.map(_._1).foldLeft(
      (lit("und"), lit(0))) { case ((bl, bs), lang) =>
      val s = col(s"score_$lang")
      (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
    scored
      .withColumn("predicted_lang",
        when(text.rlike("[\\x{4E00}-\\x{9FFF}]"), "zh").otherwise(best._1))
      .withColumn("lang_score", best._2)
  }

  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "this", "was", "for", "on", "with", "as", "at", "by")

  /** Quality scoring: length, punctuation density, stopword ratio —
    * the reference-free heuristics a pretraining filter uses.
    */
  def quality(df: DataFrame, text: Column): DataFrame = {
    val words = when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))
    val alpha = length(regexp_replace(text, "[^A-Za-z]", ""))
    val punct = length(regexp_replace(text, "[^\\.,;:!\\?]", ""))
    val stopHits = Stopwords
      .map(w => size(split(lower(text), s"\\b$w\\b")) - 1)
      .reduce(_ + _)
    // ratios stay raw doubles (IEEE-identical across engines: int/int);
    // the composite score is computed in exact integer space (scaled 1e5)
    // via integer division so the final double is bit-identical too —
    // decimal rounding of float sums diverges between engines.
    df.withColumn("words", words)
      .withColumn("punct_cnt_", punct.cast("long"))
      .withColumn("stop_hits_", stopHits.cast("long"))
      .withColumn("chars_", length(text).cast("long"))
      .withColumn("avg_word_len",
        alpha.cast("double") / greatest(words, lit(1)))
      .withColumn("punct_ratio",
        punct.cast("double") / greatest(length(text), lit(1)))
      .withColumn("stopword_ratio",
        stopHits.cast("double") / greatest(words, lit(1)))
      .withColumn("quality_score",
        ((lit(400L) * least(words, lit(100)).cast("long")) +
          (lit(30000L) - least(
            expr("punct_cnt_ * 300000 DIV greatest(chars_, 1)"),
            lit(30000L))) +
          least(expr("stop_hits_ * 150000 DIV greatest(words, 1)"),
            lit(30000L))).cast("double") / 100000.0)
      .drop("punct_cnt_", "stop_hits_", "chars_")
  }

  /** Token counting: whitespace tokens and a BPE-ish regex tokenization
    * (alnum runs + single punctuation marks).
    */
  def tokenCounts(df: DataFrame, text: Column): DataFrame =
    df.withColumn("ws_tokens",
      when(length(trim(text)) === 0, 0)
        .otherwise(size(split(trim(text), "\\s+"))))
      .withColumn("regex_tokens",
        size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))))

  /** Position-weighted rolling fingerprint: sum over words of
    * position * first-8-hex-digits(md5(word)). Order-sensitive, exact,
    * engine-portable (md5 is bit-identical across engines).
    */
  def fingerprint(df: DataFrame, idCol: Column, text: Column): DataFrame =
    df.select(idCol.as("doc_id"),
      posexplode(split(text, " ")).as(Seq("p", "word")))
      .withColumn("h",
        conv(substring(md5(col("word")), 1, 8), 16, 10).cast("long"))
      .groupBy("doc_id")
      .agg(sum((col("p") + 1) * col("h")).as("fingerprint"))
}

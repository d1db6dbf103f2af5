package graft.style

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Author style fingerprint (Y8-Y11, style/fingerprint.py):
  * function-word frequencies with self-normalized z-scores, Burrows'
  * delta between two fingerprints, and a blended similarity score.
  */
object Fingerprint {

  /** The reference's FUNCTION_WORDS list (metrics.py:19-31, first 100). */
  val FunctionWords: Seq[String] = Seq(
    "the", "of", "and", "a", "to", "in", "is", "was", "that", "it",
    "he", "she", "for", "on", "with", "as", "his", "her", "they", "at",
    "be", "this", "have", "from", "or", "had", "by", "not", "word", "but",
    "what", "some", "we", "can", "out", "other", "were", "all", "there", "when",
    "up", "use", "your", "how", "said", "an", "each", "which", "do", "their",
    "time", "if", "will", "way", "about", "many", "then", "them", "would", "so",
    "these", "no", "him", "could", "has", "more", "two", "like", "who", "did",
    "now", "get", "come", "made", "may", "part", "over", "new", "sound", "take",
    "only", "little", "work", "know", "place", "year", "live", "me", "back", "give",
    "most", "very", "after", "thing", "our", "just", "name", "good", "sentence", "man")

  /** Per-corpus function-word frequency table with z-scores normalized
    * against the author's own 100 frequencies (Y9, fingerprint.py:139-153).
    * Input: sentences with a text column and a corpus-id column.
    */
  def functionWordZScores(
      sentences: DataFrame, corpusCol: String, textCol: String): DataFrame = {
    val words = sentences.select(col(corpusCol).as("corpus"),
      explode(split(lower(col(textCol)), "[^a-z']+")).as("word"))
      .filter(length(col("word")) > 0)
    val totals = words.groupBy("corpus").agg(count(lit(1)).as("total"))
    val fwDf = words.sparkSession.createDataFrame(
      FunctionWords.map(Tuple1(_))).toDF("word")
    // count per (corpus, function word), zero-filled via cross of corpora x words
    val counts = words.join(broadcast(fwDf), Seq("word"), "left_semi")
      .groupBy("corpus", "word").agg(count(lit(1)).as("cnt"))
    val grid = totals.select("corpus", "total").crossJoin(broadcast(fwDf))
    val freqs = grid.join(counts, Seq("corpus", "word"), "left")
      .withColumn("freq",
        coalesce(col("cnt"), lit(0L)).cast("double") / col("total"))
    val w = Window.partitionBy("corpus")
    freqs
      .withColumn("mu", avg(col("freq")).over(w))
      .withColumn("sigma", stddev_samp(col("freq")).over(w))
      .withColumn("z",
        when(col("sigma") > 0, (col("freq") - col("mu")) / col("sigma"))
          .otherwise(lit(0.0)))
      .select("corpus", "word", "freq", "z")
  }

  /** Burrows' delta between every pair of corpora: mean |z1 - z2| over the
    * shared function words (Y10, fingerprint.py:176-203).
    */
  def burrowsDelta(zscores: DataFrame): DataFrame = {
    val a = zscores.select(col("corpus").as("corpus_a"), col("word"),
      col("z").as("z_a"))
    val b = zscores.select(col("corpus").as("corpus_b"), col("word"),
      col("z").as("z_b"))
    a.join(b, Seq("word"))
      .filter(col("corpus_a") < col("corpus_b"))
      .groupBy("corpus_a", "corpus_b")
      .agg(avg(abs(col("z_a") - col("z_b"))).as("delta"))
  }

  /** Y11 similarity blend between two fingerprint rows:
    * delta-sim x2 + sentence-length sim + FK sim (fingerprint.py:205-246,
    * the passage-type dot product is carried by the classifier mix).
    */
  def similarityScore(delta: Double, meanLen1: Double, meanLen2: Double,
      fk1: Double, fk2: Double): Double = {
    val deltaSim = 1.0 / (1.0 + delta)
    val lenSim = 1.0 - math.min(1.0,
      math.abs(meanLen1 - meanLen2) / math.max(math.max(meanLen1, meanLen2), 1.0))
    val fkSim = 1.0 - math.min(1.0, math.abs(fk1 - fk2) / 12.0)
    (deltaSim * 2.0 + lenSim + fkSim) / 4.0
  }
}

package graft.style

import java.util.regex.Pattern

/** Passage-type classifier (Y7), ported from style/classifier.py:44-243:
  * six keyword/regex scorers; primary = argmax, confidence = share of
  * total, UNKNOWN if max < 0.5, secondary if > 0.3. The reference's
  * substring (not word-boundary) keyword checks are preserved.
  */
object Classifier {

  final case class Classification(
      primaryType: String,
      confidence: Double,
      secondaryType: Option[String],
      dialogueScore: Double,
      actionScore: Double,
      descriptionScore: Double,
      travelScore: Double,
      battleScore: Double,
      reflectionScore: Double)

  private val QuotePat = Pattern.compile("[\"“][^\"”]+[\"”]")
  private val DotSplit = Pattern.compile("\\.")
  private val WsSplit = Pattern.compile("\\s+")
  private[graft] val DialogueVerbs = Seq(
    "said", "asked", "replied", "answered", "cried", "shouted",
    "whispered", "muttered", "exclaimed", "declared", "demanded", "begged")
  private val DialogueVerbPats =
    DialogueVerbs.map(v => Pattern.compile(s"\\b$v\\b"))

  private[graft] val ActionVerbs = Seq(
    "ran", "jumped", "grabbed", "threw", "caught", "hit", "struck",
    "pulled", "pushed", "climbed", "fell", "leaped", "rushed", "seized",
    "turned", "moved", "sprang", "dashed", "plunged", "dove", "swung")

  private[graft] val DescriptionPatterns = Seq(
    """\bwas\s+\w+ing\b""", """\bseemed\b""", """\bappeared\b""",
    """\blooked\b""", """\bthe\s+\w+\s+was\b""", """\bthere\s+was\b""",
    """\bthere\s+were\b""")
  private val DescriptionPats = DescriptionPatterns.map(Pattern.compile(_))
  private[graft] val DescAdjectives = Seq(
    "great", "dark", "long", "small", "old", "new", "high", "deep",
    "wide", "narrow", "bright", "dim", "cold", "warm", "vast")

  private[graft] val TravelKeywords = Seq(
    "walked", "went", "traveled", "journeyed", "rode", "marched",
    "path", "road", "trail", "way", "distance", "miles", "leagues",
    "east", "west", "north", "south", "onwards", "forward", "onward",
    "mountain", "forest", "river", "valley", "hill", "plain")
  private[graft] val Directions = Seq("east", "west", "north", "south", "onwards", "forward")

  private[graft] val BattleKeywords = Seq(
    "sword", "blade", "arrow", "spear", "shield", "armor", "helm",
    "fought", "battle", "war", "attack", "defend", "enemy", "foe",
    "slew", "killed", "wounded", "blood", "death", "fell", "charge",
    "army", "soldiers", "warriors", "host", "orcs", "goblins")

  private[graft] val ReflectionVerbs = Seq(
    "thought", "wondered", "remembered", "felt", "realized", "knew",
    "understood", "believed", "hoped", "feared", "dreamed", "imagined")
  private val ReflectionPats =
    ReflectionVerbs.map(v => Pattern.compile(s"\\b$v\\b"))
  private[graft] val FirstPerson = Seq("i", "me", "my", "myself")

  private def scoreDialogue(text: String, lower: String): Double = {
    var score = 0.0
    val m = graft.extract.Hot.of(QuotePat, text)
    var quoted = 0
    while (m.find()) quoted += m.end - m.start
    if (quoted > 0 && text.nonEmpty) score += quoted.toDouble / text.length * 3.0
    // literal gate: every \bverb\b match contains the verb verbatim (the
    // scorers run over the lowercased text), so a passage without the
    // substring cannot match — the gated regex preserves exact semantics
    // (ClassifierSpec pins gated == ungated on generated passages)
    var i = 0
    while (i < DialogueVerbs.length) {
      if (lower.contains(DialogueVerbs(i)) &&
        graft.extract.Hot.of(DialogueVerbPats(i), lower).find()) score += 0.3
      i += 1
    }
    score
  }

  private def scoreAction(lower: String): Double = {
    var score = 0.0
    ActionVerbs.foreach(v => if (lower.contains(v)) score += 0.4)
    // precompiled splits: String.split("\\.")/split("\\s+") compile a
    // fresh Pattern per CALL (twice per passage here); the split results
    // are identical by Pattern.split's contract
    val sentences = DotSplit.split(lower)
    val short = sentences.count { s =>
      val n = WsSplit.split(s).count(_.nonEmpty); n < 10 && n > 3
    }
    if (short > sentences.length / 2.0) score += 0.5
    math.min(score, 3.0)
  }

  /** Literal each description pattern REQUIRES (present verbatim in any
    * match of the lowercased text): was/seemed/appeared/looked/was/there/
    * there, index-aligned with DescriptionPats.
    */
  private val DescGates = IndexedSeq(
    "was", "seemed", "appeared", "looked", "was", "there", "there")

  private def scoreDescription(lower: String): Double = {
    var score = 0.0
    var i = 0
    while (i < DescriptionPats.length) {
      if (lower.contains(DescGates(i))) {
        val m = graft.extract.Hot.of(DescriptionPats(i), lower)
        while (m.find()) score += 0.3
      }
      i += 1
    }
    val words = WsSplit.split(lower)
    score += words.count(DescAdjectives.contains) * 0.2
    if (words.length > 30) score += 0.3
    score
  }

  private def scoreTravel(lower: String): Double = {
    var score = 0.0
    TravelKeywords.foreach(k => if (lower.contains(k)) score += 0.35)
    Directions.foreach(d => if (lower.contains(d)) score += 0.3)
    math.min(score, 3.0)
  }

  private def scoreBattle(lower: String): Double = {
    var score = 0.0
    BattleKeywords.foreach(k => if (lower.contains(k)) score += 0.4)
    math.min(score, 3.5)
  }

  private def scoreReflection(lower: String): Double = {
    var score = 0.0
    var i = 0
    while (i < ReflectionVerbs.length) {
      if (lower.contains(ReflectionVerbs(i)) &&
        graft.extract.Hot.of(ReflectionPats(i), lower).find()) score += 0.35
      i += 1
    }
    val padded = s" $lower "
    FirstPerson.foreach(p => if (padded.contains(s" $p ")) score += 0.2)
    score
  }

  def classify(text: String): Classification = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val scores = Seq(
      "dialogue" -> scoreDialogue(text, lower),
      "action" -> scoreAction(lower),
      "description" -> scoreDescription(lower),
      "travel" -> scoreTravel(lower),
      "battle" -> scoreBattle(lower),
      "reflection" -> scoreReflection(lower))
    val sorted = scores.sortBy(-_._2)
    val (primary, primaryScore) = sorted.head
    val (secondary, secondaryScore) = sorted(1)
    val total = scores.map(_._2).sum
    val confidence = if (total > 0) primaryScore / total else 0.0
    val (ptype, conf) =
      if (primaryScore < 0.5) ("unknown", 0.0)
      else (primary, math.min(1.0, confidence))
    Classification(ptype, conf,
      if (secondaryScore > 0.3) Some(secondary) else None,
      scores(0)._2, scores(1)._2, scores(2)._2, scores(3)._2, scores(4)._2,
      scores(5)._2)
  }

  // explicit floor form, not BigDecimal HALF_UP: the repo-wide
  // cross-engine rounding policy (see Metrics.floor4) — both engines
  // compute the identical IEEE multiply then floor, so they can only
  // diverge if the raw doubles differ (round-5 review)
  private def r4(x: Double): Double =
    math.floor(x * 10000 + 0.5) / 10000.0

  /** Spark stage: per-passage classification rows — ALL six scorer columns
    * (round-1 review: description/reflection were dropped), doubles rounded
    * to 4dp for cross-engine comparability.
    */
  def classifyPassages(
      spark: org.apache.spark.sql.SparkSession,
      passages: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    passages.select("doc_id", "pos", "text").as[(String, Int, String)]
      .mapPartitions(_.map { case (d, p, t) =>
        val c = classify(t)
        (d, p, c.primaryType, r4(c.confidence), c.secondaryType,
          r4(c.dialogueScore), r4(c.actionScore), r4(c.descriptionScore),
          r4(c.travelScore), r4(c.battleScore), r4(c.reflectionScore))
      })
      .toDF("doc_id", "pos", "primary_type", "confidence", "secondary_type",
        "dialogue_score", "action_score", "description_score",
        "travel_score", "battle_score", "reflection_score")
  }
}

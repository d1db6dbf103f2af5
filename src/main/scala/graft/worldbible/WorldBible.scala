package graft.worldbible

import java.util.regex.Pattern
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** World-bible extraction (reference worldbible/patterns.py + extractor.py,
  * SURVEY.md §2.11): multi-label category scoring (W3) and rule-pattern
  * extraction (W2/W7). Constants ported verbatim; runs as a narrow
  * mapPartitions stage with per-partition compiled patterns.
  */
object WorldBible {

  /** CATEGORY_KEYWORDS, patterns.py:35-87 (8 categories). */
  val CategoryKeywords: Seq[(String, Seq[String])] = Seq(
    "magic" -> Seq(
      """\b(magic|spell|enchant|curse|charm|wizard|sorcerer|witch)""",
      """\b(power|ring of power|staff|wand|incantation)""",
      """\b(invisible|vanish|appear|transform|heal)""",
      """\b(foresight|prophecy|vision|dream|foretold)"""),
    "culture" -> Seq(
      """\b(custom|tradition|ritual|ceremony|festival)""",
      """\b(honor|shame|duty|law|forbidden|taboo)""",
      """\b(marriage|death|birth|coming of age)""",
      """\b(greeting|farewell|hospitality|gift)""",
      """\b(elves?|dwarves?|hobbits?|men|orcs?)\s+(always|never|typically)"""),
    "geography" -> Seq(
      """\b(leagues?|miles?|days?' journey|travel)""",
      """\b(mountain|river|forest|sea|lake|valley|pass)""",
      """\b(east|west|north|south)\s+of""",
      """\b(road|path|way|route)\s+to""",
      """\b(border|frontier|realm|kingdom|land)"""),
    "technology" -> Seq(
      """\b(forge|smith|craft|make|build|construct)""",
      """\b(weapon|armor|sword|bow|shield)""",
      """\b(ship|boat|cart|wagon)""",
      """\b(mithril|steel|iron|gold|silver)"""),
    "cosmology" -> Seq(
      """\b(god|valar|maiar|eru|iluvatar)""",
      """\b(creation|beginning|end|world|earth)""",
      """\b(immortal|mortal|death|afterlife|fate)""",
      """\b(light|dark|shadow|void|flame)""",
      """\b(sun|moon|stars?|heaven|sky)"""),
    "history" -> Seq(
      """\b(age|year|era|time|long ago|ancient)""",
      """\b(war|battle|siege|victory|defeat)""",
      """\b(king|queen|lord|steward)\s+\w+\s+(reign|rule|fell)""",
      """\b(first|second|third)\s+age"""),
    "creatures" -> Seq(
      """\b(dragon|spider|wolf|warg|eagle|bear)""",
      """\b(troll|goblin|orc|balrog|nazgul|wraith)""",
      """\b(ent|eagle|raven|thrush)""",
      """\b(creature|beast|monster)"""),
    "language" -> Seq(
      """\b(tongue|language|speech|word|name)""",
      """\b(elvish|sindarin|quenya|dwarvish|khuzdul)""",
      """\b(rune|inscription|written|script)""",
      """\b(meaning|translate|call|named)"""))

  /** RULE_PATTERNS, patterns.py:90-105 (7 definitional shapes). */
  val RulePatterns: Seq[(String, String)] = Seq(
    ("""(\w+(?:\s+\w+)*)\s+(cannot|can|may|must|shall|will)\s+(not\s+)?([\w\s]+)""", "capability"),
    ("""(the\s+)?(\w+(?:\s+\w+)*)\s+(is|are|was|were)\s+(always|never|immortal|mortal|[\w\s]+)""", "definition"),
    ("""only\s+([\w\s]+)\s+(can|may|could)\s+([\w\s]+)""", "exclusivity"),
    ("""no\s+([\w\s]+)\s+(can|may|could)\s+([\w\s]+)""", "prohibition"),
    ("""if\s+([\w\s,]+)\s+then\s+([\w\s,]+)""", "conditional"),
    ("""(\w+(?:\s+\w+)*)\s+(always|never)\s+([\w\s]+)""", "always_never"),
    ("""it\s+(is|was)\s+(said|known|believed|written)\s+that\s+([\w\s,]+)""", "lore"))

  private lazy val categoryPatterns: Seq[(String, Seq[Pattern])] =
    CategoryKeywords.map { case (c, ps) =>
      c -> ps.map(p => Pattern.compile(p, Pattern.CASE_INSENSITIVE))
    }
  private lazy val rulePatterns: Seq[(Pattern, String)] =
    RulePatterns.map { case (p, n) =>
      (Pattern.compile(p, Pattern.CASE_INSENSITIVE), n)
    }

  private def countMatches(p: Pattern, text: String): Int = {
    val m = p.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** Category of a rule from its ±50-char context: keyword-count argmax,
    * 'themes' fallback (patterns.py:162-177).
    */
  private def inferCategory(context: String): String = {
    val scores = categoryPatterns.map { case (c, ps) =>
      c -> ps.map(countMatches(_, context)).sum
    }.filter(_._2 > 0)
    if (scores.isEmpty) "themes" else scores.maxBy(_._2)._1
  }

  /** classify_passage (W3, patterns.py:179-203): keyword hits ×0.2 capped
    * 1.0; +0.3 boost (or 0.5 floor) when a rule pattern is present.
    */
  def classify(text: String): Seq[(String, Double)] = {
    val scores = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    categoryPatterns.foreach { case (c, ps) =>
      var s = 0.0
      ps.foreach(p => s += countMatches(p, text) * 0.2)
      if (s > 0) scores(c) = math.min(s, 1.0)
    }
    rules(text).foreach { case (_, _, cat) =>
      scores(cat) =
        if (scores.contains(cat)) math.min(scores(cat) + 0.3, 1.0) else 0.5
    }
    scores.toSeq
  }

  /** find_rule_matches (W2): (pattern_name, matched text, category). */
  def rules(text: String): Seq[(String, String, String)] = {
    rulePatterns.flatMap { case (p, name) =>
      val m = p.matcher(text)
      val b = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
      while (m.find()) {
        val ctx = text.substring(math.max(0, m.start - 50),
          math.min(text.length, m.end + 50))
        b += ((name, m.group(0), inferCategory(ctx)))
      }
      b.toSeq
    }
  }

  /** Spark stage: per-passage category scores. */
  def categories(spark: SparkSession, passages: DataFrame): DataFrame = {
    import spark.implicits._
    passages.select("doc_id", "pos", "text").as[(String, Int, String)]
      .mapPartitions(_.flatMap { case (d, p, t) =>
        classify(t).map { case (c, s) => (d, p, c, s) }
      }).toDF("doc_id", "pos", "category", "score")
  }

  /** Spark stage: extracted world rules (W7: dedup by lower(rule text)). */
  def worldRules(spark: SparkSession, passages: DataFrame): DataFrame = {
    import spark.implicits._
    passages.select("doc_id", "pos", "text").as[(String, Int, String)]
      .mapPartitions(_.flatMap { case (d, p, t) =>
        rules(t).map { case (name, text, cat) => (d, p, name, text, cat) }
      }).toDF("doc_id", "pos", "pattern_name", "rule_text", "category")
      .dropDuplicates("doc_id", "pos", "pattern_name", "rule_text")
  }
}

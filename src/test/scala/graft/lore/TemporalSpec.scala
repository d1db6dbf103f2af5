package graft.lore

import graft.SparkSpec

/** E12 TemporalExtractor patterns + E13 happened_before
  * (lore/temporal.py:256-346, 187-218).
  */
class TemporalSpec extends SparkSpec {

  test("era parse (temporal.py:27-45)") {
    assert(Temporal.eraFromText("the First Age").contains("FIRST_AGE"))
    assert(Temporal.eraFromText("Elder Days").contains("FIRST_AGE"))
    assert(Temporal.eraFromText("Second Age").contains("SECOND_AGE"))
    assert(Temporal.eraFromText("years of the trees").contains("YEARS_OF_TREES"))
    assert(Temporal.eraFromText("before time began").contains("BEFORE_TIME"))
    assert(Temporal.eraFromText("last Tuesday").isEmpty)
  }

  test("birth/death/lived pattern extraction") {
    val facts = Temporal.extractFacts(
      "Turin was born in the First Age. Turin perished in the First Age. " +
        "Elrond dwelt in the Second Age.")
    assert(facts.contains(("birth", "Turin", "FIRST_AGE")))
    assert(facts.contains(("death", "Turin", "FIRST_AGE")))
    assert(facts.contains(("lived", "Elrond", "SECOND_AGE")))
  }

  test("ORDER patterns -> relations") {
    val rels = Temporal.extractRelations(
      "The Fall came before the War. The Crowning followed the War.")
    assert(rels.contains(("The Fall", "before", "the War")))
    assert(rels.contains(("The Crowning", "after", "the War")))
  }

  test("timeline assembly: birth/death merged, lived only for new names") {
    import spark.implicits._
    val passages = Seq(
      ("d1", 0, "Turin was born in the First Age."),
      ("d1", 1, "Turin perished in the First Age."),
      ("d2", 0, "Elrond dwelt in the Second Age."))
      .toDF("doc_id", "pos", "text")
    val t = Temporal.timeline(spark, passages).collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)), Option(r.getString(2))))
      .toMap
    assert(t("Turin") == (Some("FIRST_AGE"), Some("FIRST_AGE")))
    assert(t("Elrond") == (Some("SECOND_AGE"), Some("SECOND_AGE")))
  }

  test("happened_before: explicit relations beat era compare; era fallback") {
    val tl = Seq(
      ("The Fall", Some("SECOND_AGE"), Some("SECOND_AGE")),
      ("The War", Some("FIRST_AGE"), Some("FIRST_AGE")))
    // explicit relation wins even against the era ordering
    assert(Temporal.happenedBefore(tl,
      Seq(("The Fall", "before", "The War")), "the fall", "the war")
      .contains(true))
    // inverse direction
    assert(Temporal.happenedBefore(tl,
      Seq(("The Fall", "before", "The War")), "the war", "the fall")
      .contains(false))
    // era fallback: FIRST < SECOND
    assert(Temporal.happenedBefore(tl, Seq.empty, "the war", "the fall")
      .contains(true))
    // unknown entity -> None
    assert(Temporal.happenedBefore(tl, Seq.empty, "the war", "nothing").isEmpty)
  }

  test("alive_during tri-state via the checker's era orders") {
    // mirrors TemporalEntity.alive_during (temporal.py:86-110)
    import spark.implicits._
    val timeline = Seq(("Turin", "SECOND_AGE", "THIRD_AGE"))
      .toDF("name", "birth_era", "death_era")
    val claims = Seq(
      "Turin during the Third Age", // within span -> VALID
      "Turin during the First Age", // before birth -> INVALID
      "Nobody during the First Age") // unknown entity
      .map(Checker.parse)
    val out = Checker.checkTemporal(spark, claims, timeline)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out("Turin during the Third Age") == "VALID")
    assert(out("Turin during the First Age") == "INVALID")
    assert(out("Nobody during the First Age") == "UNKNOWN")
  }

  test("subject-less temporal claim still gets an UNKNOWN verdict row") {
    // _check_temporal returns its initialized UNKNOWN result when the
    // deterministic parse carries no subject (checker.py:634-637); the
    // claim must not vanish from the output (round-5 review)
    import spark.implicits._
    val timeline = Seq(("Turin", "SECOND_AGE", "THIRD_AGE"))
      .toDF("name", "birth_era", "death_era")
    val c = Checker.parse("the elves of the Second Age")
    assert(c.claimType == "TEMPORAL" && c.subject.isEmpty)
    val rows = Checker.checkTemporal(spark, Seq(c), timeline).collect()
    assert(rows.length == 1)
    assert(rows(0).getString(2) == "UNKNOWN")
    assert(rows(0).getLong(3) == 0L)
    assert(rows(0).getDouble(5) == 0.0)
  }

  test("age/verb literal gates: gated extractFacts/extractRelations == " +
    "ungated reference scans on adversarial variants (round-5)") {
    import java.util.regex.Pattern
    def compile(ps: Seq[String]) =
      ps.map(p => Pattern.compile(p, Pattern.CASE_INSENSITIVE))
    val birth = compile(Seq(
      """(\w+(?:\s+\w+)?)\s+was\s+born\s+(?:in\s+)?(?:the\s+)?(\w+\s+Age)""",
      """(\w+(?:\s+\w+)?)\s+came\s+into\s+(?:the\s+)?world\s+(?:in\s+)?(?:the\s+)?(\w+\s+Age)"""))
    val death = compile(Seq(
      """(\w+(?:\s+\w+)?)\s+(?:died|fell|perished)\s+(?:in\s+)?(?:the\s+)?(\w+\s+Age)""",
      """(?:death|end)\s+of\s+(\w+(?:\s+\w+)?)\s+(?:in\s+)?(?:the\s+)?(\w+\s+Age)"""))
    val lived = compile(Seq(
      """(\w+(?:\s+\w+)?)\s+(?:lived|dwelt)\s+(?:in\s+)?(?:the\s+)?(\w+\s+Age)""",
      """(\w+(?:\s+\w+)?)\s+(?:of|in)\s+(?:the\s+)?(\w+\s+Age)"""))
    val orders = Seq(
      ("""(\w+(?:\s+\w+)?)\s+(?:came\s+)?before\s+(\w+(?:\s+\w+)?)""", "before"),
      ("""(\w+(?:\s+\w+)?)\s+(?:came\s+)?after\s+(\w+(?:\s+\w+)?)""", "after"),
      ("""(\w+(?:\s+\w+)?)\s+preceded\s+(\w+(?:\s+\w+)?)""", "before"),
      ("""(\w+(?:\s+\w+)?)\s+followed\s+(\w+(?:\s+\w+)?)""", "after")
    ).map { case (p, r) => (Pattern.compile(p, Pattern.CASE_INSENSITIVE), r) }
    def ungatedFacts(text: String): Seq[(String, String, String)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
      def scan(ps: Seq[Pattern], kind: String): Unit = ps.foreach { p =>
        val m = p.matcher(text)
        while (m.find())
          Temporal.eraFromText(m.group(2)).foreach(e => out += ((kind, m.group(1), e)))
      }
      scan(birth, "birth"); scan(death, "death"); scan(lived, "lived")
      out.toSeq
    }
    def ungatedRelations(text: String): Seq[(String, String, String)] =
      orders.flatMap { case (p, rel) =>
        val m = p.matcher(text)
        val b = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
        while (m.find()) b += ((m.group(1), rel, m.group(2)))
        b.toSeq
      }
    val texts = Seq(
      "Feanor was born in the First Age.",
      "FEANOR WAS BORN IN THE FIRST AGE.", // CI fold must gate too
      "Melkor came into the world in the First Age.",
      "Turin died in the First Age. Hurin perished in the First Age.",
      "The death of Feanor in the First Age.",
      "Elrond lived in the Second Age. Cirdan dwelt in the Third Age.",
      "Mithrandir of the Third Age spoke.",
      "He was born in the garbage heap.", // "age" inside a word: gate passes, regex rejects
      "The aged king fell.", // "age"+"fell" but no era phrase
      "Feanor came before Fingolfin.",
      "FINGOLFIN CAME AFTER FEANOR.",
      "The first preceded the second; the third followed the fourth.",
      "Beforehand nothing; thereafter nothing.", // gate words inside words
      "no temporal content", "")
    texts.foreach { t =>
      assert(Temporal.extractFacts(t) === ungatedFacts(t), s"facts: $t")
      assert(Temporal.extractRelations(t) === ungatedRelations(t), s"rels: $t")
    }
  }
}

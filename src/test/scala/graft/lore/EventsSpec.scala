package graft.lore

import graft.SparkSpec

class EventsSpec extends SparkSpec {

  test("pattern extraction: NAME verb (the)? OBJECT (lore/events.py:621-646)") {
    val out = Events.extract("Gandalf killed the Balrog.")
    assert(out.contains(("Gandalf", "killed", "Balrog")))
  }

  test("prepositional patient is kept verbatim, as the reference does") {
    val out = Events.extract("Bilbo traveled to Erebor.")
    assert(out.contains(("Bilbo", "traveled", "to Erebor")))
  }

  test("normalized-key dedup (E3): stem + article strip") {
    val out = Events.extract("Thorin found the Arkenstone. Thorin found Arkenstone.")
    assert(out.count(_._2 == "found") == 1)
  }

  test("year/era extraction: all three reference patterns (E6)") {
    assert(Events.extractYear("in the year 2941 of the Third Age") ==
      ((Some(2941), Some("THIRD_AGE"))))
    assert(Events.extractYear("First Age 466 was dark") ==
      ((Some(466), Some("FIRST_AGE"))))
    assert(Events.extractYear("T.A. 3019") == ((Some(3019), Some("THIRD_AGE"))))
    assert(Events.extractYear("no dates here") == ((None, None)))
  }

  test("year extraction: Int-overflow digit runs are no-year, not a crash") {
    // the reference's Python int is unbounded; an adversarial passage must
    // not throw NumberFormatException inside the extraction mapPartitions
    assert(Events.extractYear("in the year 12345678901 of the Third Age") ==
      ((None, Some("THIRD_AGE"))))
    // 9-digit years still parse (boundary of the guard)
    assert(Events.extractYear("in the year 999999999 of the Third Age") ==
      ((Some(999999999), Some("THIRD_AGE"))))
  }

  test("alive_during tri-state (E11, lore/temporal.py:86-110)") {
    assert(Events.aliveDuring(Some("FIRST_AGE"), Some("THIRD_AGE"), "SECOND_AGE")
      .contains(true))
    assert(Events.aliveDuring(Some("SECOND_AGE"), Some("THIRD_AGE"), "FIRST_AGE")
      .contains(false))
    assert(Events.aliveDuring(Some("SECOND_AGE"), None, "THIRD_AGE").isEmpty)
    assert(Events.aliveDuring(None, None, "THIRD_AGE").isEmpty)
  }

  test("find_events fuzzy filter (E7)") {
    import spark.implicits._
    val events = Seq(
      ("e1", "Gandalf the Grey", "killed", "the Balrog"),
      ("e2", "Bilbo", "found", "Ring"),
      ("e3", "Thorin", "killed", "goblins"))
      .toDF("event_id", "agent", "action", "patient")
    val byAgent = Events.findEvents(events, agent = Some("Gandalf"))
      .select("event_id").collect().map(_.getString(0)).toSeq
    assert(byAgent == Seq("e1")) // substring both ways
    val byAll = Events.findEvents(events, action = Some("kills"),
      patient = Some("balrog")).select("event_id").collect().map(_.getString(0))
    assert(byAll.toSeq == Seq("e1")) // stem + article-stripped containment
  }

  test("get_ordering: direct relation with inverse flip, else era/year (E8)") {
    import spark.implicits._
    val events = Seq(
      ("e1", 2941: Integer, "THIRD_AGE"),
      ("e2", 2950: Integer, "THIRD_AGE"),
      ("e3", null.asInstanceOf[Integer], "FIRST_AGE"))
      .toDF("event_id", "year", "era")
    val rows = events.collect().map(r => r.getAs[String]("event_id") -> r).toMap
    val rels = Seq(("e2", "e1", "BEFORE")).toDF("event1_id", "event2_id", "relation")
    assert(Events.getOrdering(rels, rows("e2"), rows("e1")) == "before")
    assert(Events.getOrdering(rels, rows("e1"), rows("e2")) == "after") // flipped
    val empty = Seq.empty[(String, String, String)]
      .toDF("event1_id", "event2_id", "relation")
    assert(Events.getOrdering(empty, rows("e3"), rows("e1")) == "before") // era
    assert(Events.getOrdering(empty, rows("e1"), rows("e2")) == "before") // year
  }

  test("ordering inference: era then year, tie years skipped (E9)") {
    import spark.implicits._
    val events = Seq(
      ("d1", 0, "e1", 2941, "THIRD_AGE"),
      ("d1", 1, "e2", 2950, "THIRD_AGE"),
      ("d1", 2, "e3", 2950, "THIRD_AGE"), // tie with e2 -> skipped
      ("d1", 3, "e0", 400, "FIRST_AGE"))
      .toDF("doc_id", "pos", "event_id", "year", "era")
    val rels = Events.inferOrdering(events)
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getDouble(4)))
      .toSet
    assert(rels == Set(
      ("e0", "e1", 0.95), // different eras
      ("e1", "e2", 0.9))) // same era, different years; e2~e3 skipped
  }

  test("verb/digit literal gates: gated extract/extractYear == ungated " +
    "reference scans on adversarial variants (round-5)") {
    import java.util.regex.Pattern
    // the pre-gate implementations, verbatim
    val ungatedPatterns = graft.Lexicon.EventVerbs.distinct.map { verb =>
      verb -> Pattern.compile(
        s"""([A-Z][a-z]+(?:\\s+[A-Z][a-z]+)?)\\s+$verb(?:ed|s)?\\s+(?:the\\s+)?([A-Za-z]+(?:\\s+[A-Za-z]+)?)""")
    }
    def ungatedExtract(text: String): Seq[(String, String, String)] = {
      val seen = scala.collection.mutable.LinkedHashMap
        .empty[String, (String, String, String)]
      ungatedPatterns.foreach { case (verb, p) =>
        val m = p.matcher(text)
        while (m.find()) {
          val agent = m.group(1)
          val patient = m.group(2)
          val norm = s"${agent.toLowerCase(java.util.Locale.ROOT)}|${verb.stripSuffix("ed").stripSuffix("s")}|${
            patient.toLowerCase(java.util.Locale.ROOT).replaceFirst("^(the|a|an) ", "")}"
          if (!seen.contains(norm)) seen(norm) = (agent, verb, patient)
        }
      }
      seen.values.toSeq
    }
    val ungatedYear = Seq(
      """(?:in\s+)?(?:the\s+)?(?:year\s+)?(\d+)\s+(?:of\s+the\s+)?(?:(First|Second|Third|Fourth)\s+Age|([TFS])\.?A\.?)""",
      """(?:(First|Second|Third|Fourth)\s+Age)\s+(\d+)""",
      """([TFS])\.?A\.?\s*(\d+)"""
    ).map(p => Pattern.compile(p, Pattern.CASE_INSENSITIVE))
    def ungatedExtractYear(text: String): (Option[Int], Option[String]) = {
      ungatedYear.foreach { p =>
        val m = p.matcher(text)
        if (m.find()) {
          var year: Option[Int] = None
          var era: Option[String] = None
          (1 to m.groupCount).foreach { i =>
            Option(m.group(i)).foreach { g =>
              if (g.forall(_.isDigit)) { if (g.length <= 9) year = Some(g.toInt) }
              else if (era.isEmpty) era = g.toLowerCase(java.util.Locale.ROOT) match {
                case "first" | "f" => Some("FIRST_AGE")
                case "second" | "s" => Some("SECOND_AGE")
                case "third" | "t" => Some("THIRD_AGE")
                case "fourth" => Some("FOURTH_AGE")
                case _ => None
              }
            }
          }
          return (year, era)
        }
      }
      (None, None)
    }
    val texts = Seq(
      "Gandalf killed the Balrog.",
      "Gandalf Killed the Balrog.", // capitalized verb: neither matches
      "He retook the city.", // verb inside a word: gate passes, regex rejects
      "Frodo found it and Sam found it too.",
      "Aragorn married Arwen in 3019 of the Third Age.",
      "It happened in Third Age 1000.",
      "It was T.A. 2941.",
      "It was the Third Age.", // era words, no digits: no year either way
      "He said nothing. She told everyone. They fought and won.",
      "Melkor destroyed the Lamps and fled; Tulkas arrived later.",
      "no events at all here", "")
    texts.foreach { t =>
      assert(Events.extract(t) === ungatedExtract(t), s"extract: $t")
      assert(Events.extractYear(t) === ungatedExtractYear(t), s"year: $t")
    }
  }
}

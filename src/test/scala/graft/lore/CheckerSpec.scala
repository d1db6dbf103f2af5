package graft.lore

import org.scalatest.funsuite.AnyFunSuite

/** Claim-parser cascade fixtures (lore/parser.py:136-250). */
class CheckerSpec extends AnyFunSuite {

  test("relationship claims: verb, subject, object") {
    val c = Checker.parse("Gandalf spoke with Bilbo")
    assert(c.claimType == "RELATIONSHIP")
    assert(c.subject.contains("Gandalf") && c.obj.contains("Bilbo"))
    assert(c.predicate.contains("spoke with"))
  }

  test("negation flag (parser.py:125-128)") {
    assert(Checker.parse("Gandalf never met Saruman").negated)
    assert(!Checker.parse("Gandalf met Saruman").negated)
  }

  test("uncertainty flag") {
    assert(Checker.parse("Frodo might have visited Bree").uncertain)
  }

  test("'is a' -> entity-type claim") {
    val c = Checker.parse("Gandalf is a wizard")
    assert(c.claimType == "ENTITY_EXISTS")
    assert(c.attribute.contains("type") && c.value.contains("wizard"))
  }

  test("'is <adj>' -> attribute claim") {
    val c = Checker.parse("Bilbo is brave")
    assert(c.claimType == "ATTRIBUTE")
    assert(c.value.contains("brave"))
  }

  test("capability claim") {
    val c = Checker.parse("Beorn can transform")
    assert(c.claimType == "CAPABILITY" && c.value.contains("transform"))
  }

  test("Q8 confidence: base x token-set jaccard, clamped [0.5, 0.95]") {
    assert(Checker.computeConfidence("direct", "gandalf", "gandalf") == 0.95)
    val c = Checker.computeConfidence("year", "gandalf the grey", "gandalf")
    assert(c >= 0.5 && c < 0.88)
    assert(Checker.computeConfidence("era", "x", "totally different") == 0.5)
  }

  test("predicate map ported verbatim, incl the reference's quirks") {
    assert(Checker.PredicateToEdgeType("met") == "INTERACTED_WITH")
    assert(Checker.PredicateToEdgeType("visited") == "TRAVELED_TO")
    assert(Checker.PredicateToEdgeType("forged") == "CREATED")
  }

  test("event-order claim parse (parser.py:184-201)") {
    val c = Checker.parse("Gandalf arrived Moria before Balin")
    assert(c.claimType == "EVENT_ORDER")
    assert(c.event1Agent.contains("Gandalf") && c.event1Action.contains("arrived"))
    assert(c.event1Patient.contains("Moria") && c.ordering.contains("before"))
    assert(c.event2Agent.contains("Balin") && c.event2Action.contains("arrived"))
  }

  test("temporal claim parse: time period + leading-name subject") {
    val c = Checker.parse("Gandalf during the Third Age")
    assert(c.claimType == "TEMPORAL")
    assert(c.timePeriod.contains("Third Age") && c.subject.contains("Gandalf"))
  }

  test("location claim parse (is in/at/near)") {
    val c = Checker.parse("Moria is near Rivendell")
    assert(c.claimType == "LOCATION")
    assert(c.subject.contains("Moria") && c.obj.contains("Rivendell"))
    assert(c.predicate.contains("located_in"))
  }

  test("battery parity: Checker.parse matches every hand-authored oracle claim") {
    // the q32 oracle's expected parses are authored literals; the engine's
    // parser must agree with every one of them (anti-circularity check)
    graft.SparkEntry.oracleClaims.foreach { oc =>
      val c = Checker.parse(oc.text)
      assert(c.claimType.toLowerCase == oc.ctype, s"${oc.text}: ${c.claimType}")
      oc.ctype match {
        case "relationship" =>
          assert(c.subject.map(_.toLowerCase).contains(oc.subj), oc.text)
          assert(c.obj.map(_.toLowerCase).contains(oc.obj), oc.text)
          val et = Checker.PredicateToEdgeType.getOrElse(
            c.predicate.get.toLowerCase,
            c.predicate.get.toUpperCase.replace(" ", "_"))
          assert(et == oc.et, s"${oc.text}: $et")
          assert(c.negated == oc.negated, oc.text)
        case "entity_exists" | "attribute" | "capability" =>
          assert(c.subject.map(_.toLowerCase).contains(oc.subj), oc.text)
          assert(c.value.map(_.toLowerCase).contains(oc.value), oc.text)
        case "temporal" if oc.subj == null =>
          // subject-less parse (no leading capitalized run): the oracle
          // branch is a static UNKNOWN row, no era/subject to compare
          assert(c.subject.isEmpty, oc.text)
          assert(c.timePeriod.isDefined, oc.text)
        case "temporal" =>
          assert(c.subject.map(_.toLowerCase).contains(oc.subj), oc.text)
          val ord = Temporal.EraOrder(
            Temporal.eraFromText(c.timePeriod.get).get)
          assert(ord == oc.eraOrd, oc.text)
        case "location" =>
          assert(c.subject.map(_.toLowerCase).contains(oc.subj), oc.text)
          assert(c.obj.map(_.toLowerCase).contains(oc.obj), oc.text)
        case "event_order" =>
          assert(c.event1Agent.map(_.toLowerCase).contains(oc.a1), oc.text)
          assert(c.event2Agent.map(_.toLowerCase).contains(oc.a2), oc.text)
          assert(c.ordering.contains(oc.claimed), oc.text)
        case "unknown" => ()
      }
    }
  }

  test("parse_multiple: sentence split, short fragments dropped") {
    val cs = Checker.parseMultiple(
      "Gandalf traveled to Mirkwood. Yes! Moria is near Rivendell.")
    assert(cs.map(_.claimType) == Seq("RELATIONSHIP", "LOCATION"))
  }
}

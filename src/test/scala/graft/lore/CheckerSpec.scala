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
}

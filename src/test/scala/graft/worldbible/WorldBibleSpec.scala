package graft.worldbible

import org.scalatest.funsuite.AnyFunSuite

class WorldBibleSpec extends AnyFunSuite {

  test("keyword scoring: x0.2 per hit, capped 1.0 (patterns.py:179-193)") {
    val s = WorldBible.classify("The wizard cast a spell of magic.").toMap
    // wizard + spell + magic = 3 hits x 0.2
    assert(math.abs(s("magic") - 0.6) < 1e-9)
    val capped = WorldBible.classify(
      "magic spell curse charm wizard sorcerer witch enchant").toMap
    assert(capped("magic") == 1.0)
  }

  test("rule boost: +0.3 when a rule pattern lands in a scored category") {
    val s = WorldBible.classify(
      "Only a wizard can break the curse of dark magic.").toMap
    // keywords wizard/curse/magic = 0.6, exclusivity + capability rules in
    // a magic-keyword context boost it
    assert(s("magic") > 0.6)
  }

  test("rule without category context -> themes at 0.5 (patterns.py:199-202)") {
    val s = WorldBible.classify("We must ride onward at once.").toMap
    assert(s == Map("themes" -> 0.5))
  }

  test("rule extraction names the pattern (W2)") {
    val r = WorldBible.rules("Only the king can wear it. If night falls then flee.")
    assert(r.exists(_._1 == "exclusivity"))
    assert(r.exists(_._1 == "conditional"))
  }

  test("lexicon tokens are keyword-free (oracle assumption)") {
    import graft.Lexicon
    (Lexicon.Chars ++ Lexicon.CharAliases ++ Lexicon.Places).foreach { t =>
      assert(WorldBible.classify(t).isEmpty, s"token $t hits a category")
    }
  }
}

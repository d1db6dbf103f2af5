package graft.style

import org.scalatest.funsuite.AnyFunSuite

/** Y7 passage classifier fixtures (style/classifier.py:85-243). */
class ClassifierSpec extends AnyFunSuite {

  test("dialogue-heavy passage classifies as dialogue") {
    val c = Classifier.classify("\"Come quickly!\" said Tom. \"We must go.\"")
    assert(c.primaryType == "dialogue")
    assert(c.dialogueScore > c.actionScore)
    assert(c.confidence > 0 && c.confidence <= 1.0)
  }

  test("battle keywords accumulate at 0.4 each, capped at 3.5") {
    val c = Classifier.classify(
      "sword blade arrow spear shield armor helm battle war attack")
    assert(c.battleScore == 3.5) // 10 x 0.4 capped
    assert(c.primaryType == "battle")
  }

  test("unknown below the 0.5 primary threshold") {
    val c = Classifier.classify("Nothing notable here.")
    assert(c.primaryType == "unknown" && c.confidence == 0.0)
  }

  test("secondary type emitted only above 0.3") {
    val c = Classifier.classify(
      "He fought with his sword and thought about the war.")
    // battle (sword/war/fought) primary; reflection (thought) secondary
    assert(c.primaryType == "battle")
    assert(c.secondaryType.contains("reflection"))
  }

  test("description and reflection scores are emitted (round-1 fix)") {
    val c = Classifier.classify(
      "There was a great dark hall. He wondered and remembered.")
    assert(c.descriptionScore > 0)
    assert(c.reflectionScore > 0)
  }

  test("short-sentence bonus: majority of 4-9 word sentences adds 0.5") {
    // two sentences, both 4-9 words, no action verbs -> action = 0.5
    val c = Classifier.classify("He ducked under a beam. She ducked too late there.")
    assert(c.actionScore == 0.5)
  }
}

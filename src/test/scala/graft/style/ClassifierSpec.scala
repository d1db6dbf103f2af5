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

  test("gated/precompiled scorers == the pre-optimization per-call form " +
    "(round-6 optimization equivalence)") {
    import java.util.regex.Pattern
    // the six scorers EXACTLY as they stood before the round-6 kernel
    // pass: fresh matchers, ungated regex scans, String.split per call
    val quotePat = Pattern.compile("[\"“][^\"”]+[\"”]")
    val dialogueVerbPats = Classifier.DialogueVerbs.map(v => Pattern.compile(s"\\b$v\\b"))
    val descriptionPats = Classifier.DescriptionPatterns.map(Pattern.compile(_))
    val reflectionPats = Classifier.ReflectionVerbs.map(v => Pattern.compile(s"\\b$v\\b"))
    def naiveScores(text: String): Seq[Double] = {
      val lower = text.toLowerCase(java.util.Locale.ROOT)
      val dial = {
        var score = 0.0
        val m = quotePat.matcher(text)
        var quoted = 0
        while (m.find()) quoted += m.group(0).length
        if (quoted > 0 && text.nonEmpty) score += quoted.toDouble / text.length * 3.0
        dialogueVerbPats.foreach(p => if (p.matcher(lower).find()) score += 0.3)
        score
      }
      val act = {
        var score = 0.0
        Classifier.ActionVerbs.foreach(v => if (lower.contains(v)) score += 0.4)
        val sentences = lower.split("\\.")
        val short = sentences.count { s =>
          val n = s.split("\\s+").count(_.nonEmpty); n < 10 && n > 3
        }
        if (short > sentences.length / 2.0) score += 0.5
        math.min(score, 3.0)
      }
      val desc = {
        var score = 0.0
        descriptionPats.foreach { p =>
          val m = p.matcher(lower)
          while (m.find()) score += 0.3
        }
        val words = lower.split("\\s+")
        score += words.count(Classifier.DescAdjectives.contains) * 0.2
        if (words.length > 30) score += 0.3
        score
      }
      val trav = {
        var score = 0.0
        Classifier.TravelKeywords.foreach(k => if (lower.contains(k)) score += 0.35)
        Classifier.Directions.foreach(d => if (lower.contains(d)) score += 0.3)
        math.min(score, 3.0)
      }
      val bat = {
        var score = 0.0
        Classifier.BattleKeywords.foreach(k => if (lower.contains(k)) score += 0.4)
        math.min(score, 3.5)
      }
      val refl = {
        var score = 0.0
        reflectionPats.foreach(p => if (p.matcher(lower).find()) score += 0.35)
        val padded = s" $lower "
        Classifier.FirstPerson.foreach(p => if (padded.contains(s" $p ")) score += 0.2)
        score
      }
      Seq(dial, act, desc, trav, bat, refl)
    }
    val cases = Seq(
      "\"Come quickly!\" said Tom. \"We must go.\" He thought about it.",
      "He ran and jumped. She grabbed the rope. They fell.",
      "The forest was growing dark. There was a light. It seemed far.",
      "They walked east of the mountain, down the road to the river.",
      "sword blade arrow spear shield armor helm battle war attack",
      "I wondered if he remembered me. I felt it was known.",
      "was were there the seemed appeared looked that which",
      "Short. Tiny. A four word one. Another small one here. Done now sir.",
      "No keywords whatsoever in this bland sentence about nothing much.",
      "\"Unterminated quote said nobody",
      "  leading spaces. mid..dots.. and !! exclaims ?",
      "")
    cases.foreach { t =>
      val c = Classifier.classify(t)
      val s = naiveScores(t)
      // classify() carries RAW scores (rounding happens in
      // classifyPassages), so the comparison is exact
      assert(Seq(c.dialogueScore, c.actionScore, c.descriptionScore,
        c.travelScore, c.battleScore, c.reflectionScore) == s, s"case: '$t'")
    }
  }
}

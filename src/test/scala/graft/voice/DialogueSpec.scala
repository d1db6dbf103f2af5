package graft.voice

import org.scalatest.funsuite.AnyFunSuite

/** Attribution-cascade fixtures covering all four tiers and their
  * confidences 0.9/0.9/0.7/0.4/0.3 (voice/dialogue.py:239-314,
  * FIXTURES.md §6).
  */
class DialogueSpec extends AnyFunSuite {

  test("tier 1: '\"...,\" said NAME' -> 0.9") {
    val out = Dialogue.extract("\"We must go,\" said Gandalf.")
    assert(out.size == 1)
    val (q, _, sp, v, conf, _, _) = out.head
    assert(q == "We must go,")
    assert(sp.contains("Gandalf") && v.contains("said") && conf == 0.9)
  }

  test("tier 2: 'NAME said, \"...\"' -> 0.9") {
    val out = Dialogue.extract("Bilbo replied, \"I am ready.\"")
    val (_, _, sp, v, conf, _, _) = out.head
    assert(sp.contains("Bilbo") && v.contains("replied") && conf == 0.9)
  }

  test("tier 3: verb + NAME further after the quote -> 0.7") {
    val out = Dialogue.extract("\"Onward.\" And then muttered Thorin darkly.")
    val (_, _, sp, v, conf, _, _) = out.head
    assert(sp.contains("Thorin") && v.contains("muttered") && conf == 0.7)
  }

  test("tier 4: nearest capitalized name, stoplist filtered -> 0.4 / 0.3") {
    val after = Dialogue.extract("\"Run!\" Then Frodo turned away.")
    val (_, _, sp, _, conf, _, isE) = after.head
    assert(sp.contains("Frodo") && conf == 0.4 && isE)

    // name must sit inside the reference's context_before[-30:] window
    val before = Dialogue.extract("Sam waved once more. \"Hello.\"")
    val (_, _, sp2, _, conf2, _, _) = before.head
    assert(sp2.contains("Sam") && conf2 == 0.3)
  }

  test("unattributed quote -> confidence 0.0") {
    val out = Dialogue.extract("\"Nobody knows.\" the wind blew on.")
    val (_, _, sp, _, conf, _, _) = out.head
    assert(sp.isEmpty && conf == 0.0)
  }

  test("question/exclamation classification, curly quotes, position index") {
    val out = Dialogue.extract("“Who goes there?” asked Boromir. “Halt!” he cried.")
    assert(out.size == 2)
    assert(out(0)._6 && !out(0)._7) // question
    assert(out(1)._7) // exclamation
    assert(out(0)._2 == 0 && out(1)._2 == 1)
  }

  test("single-character quotes are skipped (dialogue.py:166)") {
    assert(Dialogue.extract("He pressed \"a\" and waited.").isEmpty)
  }
}

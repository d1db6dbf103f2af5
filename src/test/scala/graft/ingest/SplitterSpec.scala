package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Ported from the reference's tests/test_splitter.py (FIXTURES.md §3). */
class SplitterSpec extends AnyFunSuite {

  test("three simple sentences (test_splitter.py:23)") {
    val s = Splitter.splitIntoSentences(
      "This is sentence one. This is sentence two. And a third!")
    assert(s == Seq("This is sentence one.", "This is sentence two.",
      "And a third!"))
  }

  test("abbreviation protection: Mr./Dr. (test_splitter.py:23-28)") {
    val s = Splitter.splitIntoSentences(
      "Mr. Baggins went to see Dr. Gandalf. They talked for hours.")
    assert(s == Seq("Mr. Baggins went to see Dr. Gandalf.",
      "They talked for hours."))
  }

  test("dialogue quotes split (test_splitter.py:30-33)") {
    val s = Splitter.splitIntoSentences(
      "\"Hello,\" said Frodo. \"Where are you going?\" asked Sam.")
    assert(s.size == 2)
  }

  test("?/! boundaries (test_splitter.py:35-38)") {
    val s = Splitter.splitIntoSentences("Really? Yes! Indeed.")
    assert(s == Seq("Really?", "Yes!", "Indeed."))
  }

  test("paragraph splitting incl extra blank lines (test_splitter.py:44-57)") {
    assert(Splitter.splitIntoParagraphs("First paragraph.\n\nSecond paragraph.")
      == Seq("First paragraph.", "Second paragraph."))
    assert(Splitter.splitIntoParagraphs("A.\n\n\n\nB.") == Seq("A.", "B."))
  }

  test("chapter detection + no-marker fallback (test_splitter.py:73-77)") {
    val text = "Chapter 1: Start\nIt began.\n\nChapter 2: End\nIt ended."
    val ch = Splitter.splitIntoChapters(text)
    assert(ch.size == 2)
    assert(ch.head._1.startsWith("Chapter 1"))
    assert(Splitter.splitIntoChapters("No markers here.") ==
      Seq(("Chapter 1", "No markers here.")))
  }

  test("substantial preamble becomes Prologue (splitter.py:115-121)") {
    val pre = "x" * 150 + "\n"
    val ch = Splitter.splitIntoChapters(pre + "Chapter 1: Go\nBody.")
    assert(ch.head._1 == "Prologue")
  }

  test("passage ids: prefix + monotone ordering (test_splitter.py:83-107)") {
    val ps = Splitter.splitIntoPassages("Test Book",
      "One. Two.\n\nThree is here. Four!")
    assert(ps.forall(_.passage_id.startsWith("p_test_book_")))
    val order = ps.map(p => (p.paragraph_num, p.sentence_num))
    assert(order == order.sorted)
    assert(ps.map(_.text) == Seq("One.", "Two.", "Three is here.", "Four!"))
    // char offsets strictly increase
    val offs = ps.map(_.char_offset)
    assert(offs == offs.sorted && offs.distinct == offs)
  }

  test("gated precompiled abbreviation pass == per-call replaceAll loop " +
    "(round-6 optimization equivalence)") {
    // the NAIVE splitter as it stood before the round-6 optimization:
    // whitespace-normalize, then one freshly-compiled case-insensitive
    // replaceAll per abbreviation, then split + restore
    def naive(text: String): Seq[String] = {
      var t = text.split("\\s+").filter(_.nonEmpty).mkString(" ")
      graft.Lexicon.Abbreviations.foreach { abbr =>
        t = t.replaceAll(
          s"(?i)\\b${java.util.regex.Pattern.quote(abbr)}\\.",
          s"$abbr<<<DOT>>>")
      }
      java.util.regex.Pattern.compile("""(?<=[.!?])\s+(?=[A-Z"])""")
        .split(t).toSeq
        .map(_.replace("<<<DOT>>>", ".").trim)
        .filter(_.nonEmpty)
    }
    val abbrs = graft.Lexicon.Abbreviations
    val cases = Seq(
      "Mr. Baggins met Dr. Gandalf. Then they left.",
      "MRS. Cotton spoke. mr. Smith listened. eTc. and so on.",
      "i.e. the ring, e.g. gold. Nothing else.",
      "St. Mary and Mt. Doom and Ft. Knox. Done.",
      "No abbreviations here at all. Plain text! Really?",
      "Trailing abbreviation Mr.",
      "Smr. is not an abbreviation boundary case.",   // \b before Mr fails
      "  Leading   whitespace\tand\nnewlines Mr. Frodo. End.",
      "Prof. al. cf. vs. Sr. Jr. all at once. Next.",
      "") ++
      // every abbreviation, sandwiched, in both original and upper case
      abbrs.flatMap(a => Seq(s"Ask $a. Smith. Then go.",
        s"Ask ${a.toUpperCase}. Smith. Then go."))
    cases.foreach { c =>
      assert(Splitter.splitIntoSentences(c) == naive(c), s"case: '$c'")
    }
  }
}

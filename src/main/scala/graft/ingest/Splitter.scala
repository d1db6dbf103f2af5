package graft.ingest

import java.util.regex.Pattern
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.Lexicon

/** A passage produced by raw-text splitting.
  * Reference: Passage (ingest/splitter.py:7-31). */
final case class SplitPassage(
    doc_id: String,
    passage_id: String,
    text: String,
    chapter: String,
    chapter_num: Int,
    paragraph_num: Int,
    sentence_num: Int,
    char_offset: Int)

/** Raw-text splitting, ported from ingest/splitter.py:34-178: chapters ->
  * paragraphs -> sentences with abbreviation protection and stable ids.
  * Used when ingesting plain text (the `documents` table); the primary
  * `docs` input arrives pre-split (SURVEY.md §1.4).
  */
object Splitter {

  /** Chapter marker patterns (splitter.py:88-93). */
  private val ChapterPattern: Pattern = Pattern.compile(
    Seq(
      """^(Chapter\s+[IVXLC\d]+[:\.]?\s*.*)$""",
      """^(CHAPTER\s+[IVXLC\d]+[:\.]?\s*.*)$""",
      """^(\d+\.\s+.+)$""",
      """^(Part\s+[IVXLC\d]+[:\.]?\s*.*)$""")
      .map(p => s"($p)").mkString("|"),
    Pattern.MULTILINE | Pattern.CASE_INSENSITIVE)

  private val ParagraphSplit = Pattern.compile("""\n\s*\n+""")
  private val SentenceSplit = Pattern.compile("""(?<=[.!?])\s+(?=[A-Z"])""")
  private val WsRun = Pattern.compile("""\s+""")

  /** Abbreviation-protection patterns, compiled ONCE. Each entry is
    * (lowercase literal gate, pattern, replacement): the per-paragraph
    * `replaceAll(s"(?i)\\b${quote(abbr)}\\.", ...)` loop compiled
    * |Abbreviations| fresh Patterns for EVERY paragraph (~1M compiles in
    * the q29 roundtrip at sf0.1 — the dominant cost of the split). The
    * pattern string is built exactly as before, so semantics are
    * unchanged; the gate is sound because `(?i)` without UNICODE_CASE
    * folds ASCII only, which containsIgnoreCaseAscii reproduces exactly,
    * and every match must contain the abbreviation literal. Equivalence
    * is spec-tested in SplitterSpec.
    */
  private val AbbrevPatterns: Seq[(String, Pattern, String)] =
    Lexicon.Abbreviations.map { abbr =>
      (abbr.toLowerCase(java.util.Locale.ROOT),
        Pattern.compile(s"(?i)\\b${Pattern.quote(abbr)}\\."),
        s"$abbr<<<DOT>>>")
    }

  /** split_into_chapters (splitter.py:81-124): markers, preamble >100
    * chars becomes "Prologue", fallback single "Chapter 1".
    */
  def splitIntoChapters(text: String): Seq[(String, String)] = {
    val m = ChapterPattern.matcher(text)
    val marks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    while (m.find()) marks += ((m.start, m.end, m.group(0).trim))
    if (marks.isEmpty) return Seq(("Chapter 1", text))

    val chapters = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    marks.zipWithIndex.foreach { case ((_, end, title), i) =>
      val stop = if (i + 1 < marks.size) marks(i + 1)._1 else text.length
      val body = text.substring(end, stop).trim
      if (body.nonEmpty) chapters += ((title, body))
    }
    val preamble = text.substring(0, marks.head._1).trim
    if (preamble.length > 100) ((("Prologue", preamble)) +=: chapters)
    if (chapters.isEmpty) Seq(("Chapter 1", text)) else chapters.toSeq
  }

  /** split_into_paragraphs (splitter.py:127-136). */
  def splitIntoParagraphs(text: String): Seq[String] =
    ParagraphSplit.split(text).map(_.trim).filter(_.nonEmpty).toSeq

  /** split_into_sentences (splitter.py:139-170): whitespace-normalize,
    * protect abbreviations with a sentinel, split, restore.
    */
  def splitIntoSentences(text: String): Seq[String] = {
    var t = WsRun.split(text).filter(_.nonEmpty).mkString(" ")
    AbbrevPatterns.foreach { case (gate, p, repl) =>
      // literal gate first: a paragraph without the (case-folded)
      // abbreviation cannot match, so the regex pass is skipped — and the
      // matcher itself is a thread-local reuse, not a per-call allocation
      if (graft.extract.Hot.containsIgnoreCaseAscii(t, gate))
        t = graft.extract.Hot.of(p, t).replaceAll(repl)
    }
    SentenceSplit.split(t).toSeq
      .map(_.replace("<<<DOT>>>", ".").trim)
      .filter(_.nonEmpty)
  }

  /** generate_passage_id (splitter.py:173-178). */
  def passageId(book: String, chapter: Int, para: Int, sent: Int): String = {
    val slug = book.toLowerCase(java.util.Locale.ROOT).replaceAll("[^a-z0-9]+", "_")
      .stripPrefix("_").stripSuffix("_")
    s"p_${slug}_c${chapter}_p${para}_s$sent"
  }

  /** split_into_passages (splitter.py:34-78). */
  def splitIntoPassages(docId: String, text: String): Seq[SplitPassage] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SplitPassage]
    var charOffset = 0
    splitIntoChapters(text).zipWithIndex.foreach {
      case ((chapterTitle, chapterText), ci) =>
        splitIntoParagraphs(chapterText).zipWithIndex.foreach { case (para, pi) =>
          splitIntoSentences(para).zipWithIndex.foreach { case (sent, si) =>
            out += SplitPassage(docId,
              passageId(docId, ci + 1, pi + 1, si + 1),
              sent, chapterTitle, ci + 1, pi + 1, si + 1, charOffset)
            charOffset += sent.length + 1
          }
        }
    }
    out.toSeq
  }

  /** Spark stage over a (doc_id, text) table. */
  def split(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String): Dataset[SplitPassage] = {
    import spark.implicits._
    docs.selectExpr(s"CAST($idCol AS STRING) AS id", s"$textCol AS t")
      .as[(String, String)]
      .mapPartitions(_.flatMap { case (id, t) => splitIntoPassages(id, t) })
  }
}

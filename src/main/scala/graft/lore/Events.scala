package graft.lore

import java.util.regex.Pattern
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Lexicon

/** An extracted event. Reference: Event (lore/events.py:19-60). */
final case class EventRow(
    doc_id: String,
    pos: Int,
    passage_id: String,
    event_id: String,
    agent: String,
    action: String,
    patient: String,
    year: Option[Int],
    era: Option[String],
    confidence: Double)

/** Deterministic event extraction (E5 pattern path, lore/events.py:621-646),
  * year/era parsing (E6, :648-673), chunk dedup (E3, :381-395) and
  * temporal-ordering inference (E9, :433-500 via a lag window).
  */
object Events {

  /** One compiled pattern per event verb: NAME verb(ed|s)? (the)? OBJECT. */
  private lazy val patterns: Seq[(String, Pattern)] =
    Lexicon.EventVerbs.distinct.map { verb =>
      verb -> Pattern.compile(
        s"""([A-Z][a-z]+(?:\\s+[A-Z][a-z]+)?)\\s+$verb(?:ed|s)?\\s+(?:the\\s+)?([A-Za-z]+(?:\\s+[A-Za-z]+)?)""")
    }

  /** Year patterns (lore/events.py:271-275), first match wins. */
  private val YearPatterns: Seq[Pattern] = Seq(
    """(?:in\s+)?(?:the\s+)?(?:year\s+)?(\d+)\s+(?:of\s+the\s+)?(?:(First|Second|Third|Fourth)\s+Age|([TFS])\.?A\.?)""",
    """(?:(First|Second|Third|Fourth)\s+Age)\s+(\d+)""",
    """([TFS])\.?A\.?\s*(\d+)"""
  ).map(p => Pattern.compile(p, Pattern.CASE_INSENSITIVE))

  private def eraOf(g: String): Option[String] = g.toLowerCase(java.util.Locale.ROOT) match {
    case "first" | "f" => Some("FIRST_AGE")
    case "second" | "s" => Some("SECOND_AGE")
    case "third" | "t" => Some("THIRD_AGE")
    case "fourth" => Some("FOURTH_AGE")
    case _ => None
  }

  /** Era ordering — the single source of truth is [[Temporal.EraOrder]]
    * (lore/temporal.py:47-58); only relative order is ever used here
    * (window sort keys and comparisons, never emitted values), so sharing
    * the full map keeps Events and Checker ordering the same era strings
    * identically (round-5 review: the previous local copy omitted
    * YEARS_OF_TREES and would silently disagree if a new era became
    * reachable).
    */
  def EraOrder: Map[String, Int] = Temporal.EraOrder

  /** extract_year (E6): first pattern with a match. Every year pattern
    * requires a `\d+` group (java-regex `\d` = [0-9] exactly without
    * UNICODE_CHARACTER_CLASS), so a digit-free passage — the common case —
    * skips all three scans (round-5 literal-gate pass; equivalence
    * spec-tested in EventsSpec).
    */
  private[lore] def extractYear(text: String): (Option[Int], Option[String]) = {
    var hasDigit = false
    var di = 0
    while (!hasDigit && di < text.length) {
      val c = text.charAt(di)
      if (c >= '0' && c <= '9') hasDigit = true
      di += 1
    }
    if (!hasDigit) return (None, None)
    YearPatterns.foreach { p =>
      val m = graft.extract.Hot.of(p, text)
      if (m.find()) {
        var year: Option[Int] = None
        var era: Option[String] = None
        (1 to m.groupCount).foreach { i =>
          Option(m.group(i)).foreach { g =>
            // Int-range guard: the reference's Python int is unbounded, but
            // the year column is an Int — an adversarial passage like
            // "12345678901 of the Third Age" must not throw
            // NumberFormatException inside the extraction mapPartitions and
            // kill the job (round-5 review). Out-of-range digit runs are
            // treated as no year; domain years are 1-4 digits.
            if (g.forall(_.isDigit)) {
              if (g.length <= 9) year = Some(g.toInt)
            } else if (era.isEmpty) era = eraOf(g)
          }
        }
        return (year, era)
      }
    }
    (None, None)
  }

  /** Pure per-passage extraction with normalized-key dedup (E3):
    * agent|action-stem|patient-article-stripped, first hit wins.
    */
  private[lore] def extract(text: String): Seq[(String, String, String)] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, (String, String, String)]
    patterns.foreach { case (verb, p) =>
      // each per-verb pattern embeds the verb verbatim (case-SENSITIVE),
      // so a passage without the literal cannot match — one cheap
      // `contains` replaces the regex scan for the ~all verbs a passage
      // does not use (31 scans/passage before; round-5 literal-gate pass,
      // equivalence spec-tested in EventsSpec). Skipping absent verbs
      // preserves `seen` insertion order: skipped verbs contribute no
      // matches either way.
      if (text.contains(verb)) {
        val m = graft.extract.Hot.of(p, text)
        while (m.find()) {
          val agent = m.group(1)
          val patient = m.group(2)
          val norm = s"${agent.toLowerCase(java.util.Locale.ROOT)}|${verb.stripSuffix("ed").stripSuffix("s")}|${
            patient.toLowerCase(java.util.Locale.ROOT).replaceFirst("^(the|a|an) ", "")}"
          if (!seen.contains(norm)) seen(norm) = (agent, verb, patient)
        }
      }
    }
    seen.values.toSeq
  }

  /** Spark stage: passages -> events with per-passage year/era context. */
  def fromPassages(spark: SparkSession, passages: DataFrame): Dataset[EventRow] = {
    import spark.implicits._
    passages.select("doc_id", "pos", "passage_id", "text")
      .as[(String, Int, String, String)]
      .mapPartitions { it =>
        it.flatMap { case (docId, pos, pid, text) =>
          val (year, era) = extractYear(text)
          extract(text).map { case (agent, action, patient) =>
            val id = s"${agent.toLowerCase(java.util.Locale.ROOT)}_${action}_${patient.toLowerCase(java.util.Locale.ROOT)}"
              .replace(" ", "_")
            EventRow(docId, pos, pid, id, agent, action, patient,
              year, era, 0.6)
          }
        }
      }
  }

  /** E11 TemporalEntity.alive_during tri-state (lore/temporal.py:86-110):
    * Some(true/false) when knowable from the era range, None when unknown.
    */
  def aliveDuring(firstEra: Option[String], lastEra: Option[String],
      era: String): Option[Boolean] = {
    val e = EraOrder.get(era)
    (e, firstEra.flatMap(EraOrder.get), lastEra.flatMap(EraOrder.get)) match {
      case (Some(x), Some(lo), Some(hi)) => Some(x >= lo && x <= hi)
      case (Some(x), Some(lo), None) => if (x < lo) Some(false) else None
      case (Some(x), None, Some(hi)) => if (x > hi) Some(false) else None
      case _ => None
    }
  }

  /** E7 find_events (lore/events.py:119-162): fuzzy event filter —
    * agent substring both ways, action stem-matched, patient
    * article-stripped containment.
    */
  def findEvents(events: DataFrame, agent: Option[String] = None,
      action: Option[String] = None, patient: Option[String] = None): DataFrame = {
    var df = events
    agent.foreach { a =>
      val al = lit(a.toLowerCase(java.util.Locale.ROOT))
      df = df.filter(lower(col("agent")).contains(al) ||
        al.contains(lower(col("agent"))))
    }
    action.foreach { v =>
      val stem = lit(v.toLowerCase(java.util.Locale.ROOT).stripSuffix("ed").stripSuffix("s"))
      df = df.filter(lower(col("action")).contains(stem))
    }
    patient.foreach { p =>
      val pl = lit(p.toLowerCase(java.util.Locale.ROOT).replaceFirst("^(the|a|an) ", ""))
      val pat = regexp_replace(lower(col("patient")), "^(the|a|an) ", "")
      df = df.filter(pat.contains(pl) || pl.contains(pat))
    }
    df
  }

  /** E8/G15 get_ordering: direct relation lookup (both directions) else
    * (era order, year) comparison — 'before' | 'after' | 'unknown'
    * (lore/events.py:164-207).
    */
  def getOrdering(relations: DataFrame,
      e1: org.apache.spark.sql.Row, e2: org.apache.spark.sql.Row): String = {
    val (id1, id2) = (e1.getAs[String]("event_id"), e2.getAs[String]("event_id"))
    val direct = relations
      .filter((col("event1_id") === id1 && col("event2_id") === id2) ||
        (col("event1_id") === id2 && col("event2_id") === id1))
      .select("event1_id", "relation").collect().headOption
    direct match {
      case Some(r) =>
        val rel = r.getString(1).toLowerCase(java.util.Locale.ROOT)
        if (r.getString(0) == id1) rel
        else if (rel == "before") "after" else if (rel == "after") "before" else rel
      case None =>
        val (y1, y2) = (Option(e1.getAs[Integer]("year")),
          Option(e2.getAs[Integer]("year")))
        val (era1, era2) = (
          EraOrder.getOrElse(Option(e1.getAs[String]("era")).getOrElse(""), -1),
          EraOrder.getOrElse(Option(e2.getAs[String]("era")).getOrElse(""), -1))
        if (era1 >= 0 && era2 >= 0 && era1 != era2)
          if (era1 < era2) "before" else "after"
        else (y1, y2) match {
          case (Some(a), Some(b)) if a != b =>
            if (a < b) "before" else "after"
          case _ => "unknown"
        }
    }
  }

  /** E9 temporal-ordering inference: per doc, order dated events by
    * (era order, year, pos); adjacent pairs -> BEFORE relations —
    * different eras 0.95, same era different years 0.9, ties skipped
    * (lore/events.py:433-500). Window is partitioned by doc so no global
    * single-partition sort exists at scale.
    */
  def inferOrdering(events: DataFrame): DataFrame = {
    val eraOrderCol = Events.EraOrder.foldLeft(lit(-1)) {
      case (acc, (k, v)) => when(col("era") === k, v).otherwise(acc)
    }
    val dated = events
      .filter(col("year").isNotNull && col("era").isNotNull)
      .withColumn("era_order", eraOrderCol)
    val w = Window.partitionBy("doc_id").orderBy("era_order", "year", "pos")
    dated
      .withColumn("prev_id", lag(col("event_id"), 1).over(w))
      .withColumn("prev_year", lag(col("year"), 1).over(w))
      .withColumn("prev_era", lag(col("era_order"), 1).over(w))
      .filter(col("prev_id").isNotNull)
      .withColumn("relation", lit("BEFORE"))
      .withColumn("confidence",
        when(col("prev_era") =!= col("era_order"), 0.95)
          .when(col("prev_year") =!= col("year"), 0.9))
      .filter(col("confidence").isNotNull)
      .select(
        col("doc_id"),
        col("prev_id").as("event1_id"),
        col("event_id").as("event2_id"),
        col("relation"), col("confidence"))
  }
}

package graft.lore

import java.util.regex.Pattern
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal extraction + timeline (E12/E13) — reference TemporalExtractor
  * and Timeline (lore/temporal.py:150-346): BIRTH/DEATH/LIVED/EVENT/ORDER
  * regexes over passages producing a small timeline dimension, plus the
  * `happened_before` query.
  *
  * Batch semantics note: the reference mutates one Timeline while walking a
  * single text, so repeated mentions of a name are last-wins for birth/death
  * and first-wins for LIVED entities (temporal.py:294-346). The Spark
  * re-expression is order-INDEPENDENT: every field is resolved
  * first-seen-by-(doc_id, pos) — deterministic under any partitioning, and
  * identical to the reference whenever a name's planted era is consistent
  * (which the synthetic corpus guarantees for real characters).
  */
object Temporal {

  /** Era.from_text (temporal.py:27-45). */
  def eraFromText(text: String): Option[String] = {
    val t = text.toLowerCase(java.util.Locale.ROOT)
    if (t.contains("first age") || t.contains("elder days")) Some("FIRST_AGE")
    else if (t.contains("second age")) Some("SECOND_AGE")
    else if (t.contains("third age")) Some("THIRD_AGE")
    else if (t.contains("fourth age")) Some("FOURTH_AGE")
    else if (t.contains("years of the trees")) Some("YEARS_OF_TREES")
    else if (t.contains("before") && (t.contains("time") || t.contains("sun")))
      Some("BEFORE_TIME")
    else None
  }

  /** Full era order incl. the tree years (temporal.py:47-58). */
  val EraOrder: Map[String, Int] = Map(
    "BEFORE_TIME" -> 0, "YEARS_OF_TREES" -> 1, "FIRST_AGE" -> 2,
    "SECOND_AGE" -> 3, "THIRD_AGE" -> 4, "FOURTH_AGE" -> 5)

  // BIRTH_PATTERNS (temporal.py:256-259)
  private val BirthPatterns = Seq(
    """(\w+(?:\s+\w+)?)\s+was\s+born\s+(?:in\s+)?(?:the\s+)?(\w+\s+Age)""",
    """(\w+(?:\s+\w+)?)\s+came\s+into\s+(?:the\s+)?world\s+(?:in\s+)?(?:the\s+)?(\w+\s+Age)"""
  ).map(p => Pattern.compile(p, Pattern.CASE_INSENSITIVE))

  // DEATH_PATTERNS (temporal.py:261-264)
  private val DeathPatterns = Seq(
    """(\w+(?:\s+\w+)?)\s+(?:died|fell|perished)\s+(?:in\s+)?(?:the\s+)?(\w+\s+Age)""",
    """(?:death|end)\s+of\s+(\w+(?:\s+\w+)?)\s+(?:in\s+)?(?:the\s+)?(\w+\s+Age)"""
  ).map(p => Pattern.compile(p, Pattern.CASE_INSENSITIVE))

  // LIVED_PATTERNS (temporal.py:266-269)
  private val LivedPatterns = Seq(
    """(\w+(?:\s+\w+)?)\s+(?:lived|dwelt)\s+(?:in\s+)?(?:the\s+)?(\w+\s+Age)""",
    """(\w+(?:\s+\w+)?)\s+(?:of|in)\s+(?:the\s+)?(\w+\s+Age)"""
  ).map(p => Pattern.compile(p, Pattern.CASE_INSENSITIVE))

  // ORDER_PATTERNS (temporal.py:276-281)
  private val OrderPatterns: Seq[(Pattern, String)] = Seq(
    ("""(\w+(?:\s+\w+)?)\s+(?:came\s+)?before\s+(\w+(?:\s+\w+)?)""", "before"),
    ("""(\w+(?:\s+\w+)?)\s+(?:came\s+)?after\s+(\w+(?:\s+\w+)?)""", "after"),
    ("""(\w+(?:\s+\w+)?)\s+preceded\s+(\w+(?:\s+\w+)?)""", "before"),
    ("""(\w+(?:\s+\w+)?)\s+followed\s+(\w+(?:\s+\w+)?)""", "after")
  ).map { case (p, r) => (Pattern.compile(p, Pattern.CASE_INSENSITIVE), r) }

  /** Raw temporal facts from one passage: (kind, name, era).
    * kind ∈ {birth, death, lived}. Pure function.
    */
  private[lore] def extractFacts(text: String): Seq[(String, String, String)] = {
    import graft.extract.Hot
    // literal gates (round-5 pass; equivalence spec-tested in
    // TemporalSpec): every fact pattern ends in `(\w+\s+Age)`, so a
    // passage without a case-folded "age" cannot match any of the six —
    // one cheap CI-ASCII scan replaces six regex scans on the common
    // case. Within the gate, each family requires its own verb literal
    // (CASE_INSENSITIVE without UNICODE_CASE folds ASCII only, which
    // containsIgnoreCaseAscii reproduces exactly). LivedPatterns' second
    // pattern ("X of the Y Age") has no verb literal, so the lived family
    // runs whenever "age" is present.
    if (!Hot.containsIgnoreCaseAscii(text, "age")) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    def scan(ps: Seq[Pattern], kind: String): Unit = ps.foreach { p =>
      val m = Hot.of(p, text)
      while (m.find()) {
        eraFromText(m.group(2)).foreach(e => out += ((kind, m.group(1), e)))
      }
    }
    // death pattern 2 has (era-less) group order quirks avoided by the
    // shared (name, era) group layout of all compiled patterns above
    if (Hot.containsIgnoreCaseAscii(text, "born") ||
      Hot.containsIgnoreCaseAscii(text, "world"))
      scan(BirthPatterns, "birth")
    if (DeathGates.exists(Hot.containsIgnoreCaseAscii(text, _)))
      scan(DeathPatterns, "death")
    scan(LivedPatterns, "lived")
    out.toSeq
  }

  private val DeathGates = Seq("died", "fell", "perished", "death", "end")

  /** Each ORDER pattern requires its relation word verbatim (modulo ASCII
    * case folding): (pattern, relation, gate literal), zipped once.
    */
  private val GatedOrderPatterns: Seq[(Pattern, String, String)] =
    OrderPatterns.zip(Seq("before", "after", "preceded", "followed"))
      .map { case ((p, rel), gate) => (p, rel, gate) }

  /** ORDER-pattern relations from one passage: (subject, relation, object). */
  private[lore] def extractRelations(text: String): Seq[(String, String, String)] =
    GatedOrderPatterns.flatMap { case (p, rel, gate) =>
      if (!graft.extract.Hot.containsIgnoreCaseAscii(text, gate)) Nil
      else {
        val m = graft.extract.Hot.of(p, text)
        val b = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
        while (m.find()) b += ((m.group(1), rel, m.group(2)))
        b.toSeq
      }
    }

  /** Spark stage: passages -> raw facts (doc_id, pos, kind, name, era). */
  def facts(spark: SparkSession, passages: DataFrame): DataFrame = {
    import spark.implicits._
    passages.select("doc_id", "pos", "text").as[(String, Int, String)]
      .mapPartitions(_.flatMap { case (d, pos, t) =>
        extractFacts(t).map { case (k, n, e) => (d, pos, k, n, e) }
      }).toDF("doc_id", "pos", "kind", "name", "era")
  }

  /** The timeline dimension: one row per entity with
    * (name, birth_era, death_era). Birth/death come from their patterns
    * (first-seen era per name); LIVED entities are added only for names not
    * already present, with birth = death = first-seen era
    * (temporal.py:317-327).
    */
  def timeline(spark: SparkSession, passages: DataFrame): DataFrame = {
    val f = facts(spark, passages)
      .withColumn("seen",
        concat(col("doc_id"), lit("#"),
          lpad(col("pos").cast("string"), 19, "0")))
      .withColumn("lname", lower(col("name")))
    val birth = f.filter(col("kind") === "birth")
      .groupBy("lname")
      .agg(min_by(col("name"), col("seen")).as("bname"),
        min_by(col("era"), col("seen")).as("birth_era"))
    val death = f.filter(col("kind") === "death")
      .groupBy("lname")
      .agg(min_by(col("name"), col("seen")).as("dname"),
        min_by(col("era"), col("seen")).as("death_era"))
    val bd = birth.join(death, Seq("lname"), "full_outer")
      .select(coalesce(col("bname"), col("dname")).as("name"),
        col("lname"), col("birth_era"), col("death_era"))
    val lived = f.filter(col("kind") === "lived")
      .join(bd.select("lname"), Seq("lname"), "left_anti")
      .groupBy("lname")
      .agg(min_by(col("name"), col("seen")).as("name"),
        min_by(col("era"), col("seen")).as("era"))
      .select(col("name"), col("lname"),
        col("era").as("birth_era"), col("era").as("death_era"))
    bd.unionByName(lived).drop("lname")
  }

  /** Spark stage: ORDER-pattern temporal relations. */
  def relations(spark: SparkSession, passages: DataFrame): DataFrame = {
    import spark.implicits._
    passages.select("doc_id", "pos", "text").as[(String, Int, String)]
      .mapPartitions(_.flatMap { case (d, pos, t) =>
        extractRelations(t).map { case (s, r, o) => (d, pos, s, r, o) }
      }).toDF("doc_id", "pos", "subject", "relation", "object")
  }

  /** E13 Timeline.happened_before (temporal.py:187-218): explicit relation
    * scan in both directions, else era comparison; None when unknowable.
    * Point-lookup API over small collected dimensions.
    */
  def happenedBefore(
      timeline: Seq[(String, Option[String], Option[String])],
      relations: Seq[(String, String, String)],
      event1: String,
      event2: String): Option[Boolean] = {
    val idx = timeline.map(t => t._1.toLowerCase(java.util.Locale.ROOT) -> t).toMap
    val (e1, e2) = (idx.get(event1.toLowerCase(java.util.Locale.ROOT)), idx.get(event2.toLowerCase(java.util.Locale.ROOT)))
    if (e1.isEmpty || e2.isEmpty) return None
    relations.foreach { case (s, rel, o) =>
      if (s.equalsIgnoreCase(event1) && o.equalsIgnoreCase(event2)) {
        if (rel == "before") return Some(true)
        if (rel == "after") return Some(false)
      }
      if (s.equalsIgnoreCase(event2) && o.equalsIgnoreCase(event1)) {
        if (rel == "before") return Some(false)
        if (rel == "after") return Some(true)
      }
    }
    val o1 = e1.flatMap(_._2).flatMap(EraOrder.get)
    val o2 = e2.flatMap(_._2).flatMap(EraOrder.get)
    (o1, o2) match {
      case (Some(a), Some(b)) if a < b => Some(true)
      case (Some(a), Some(b)) if a > b => Some(false)
      case _ => None
    }
  }

  /** Era-order column for a string era column (null-safe). */
  def eraOrderCol(era: Column): Column =
    EraOrder.foldLeft(lit(null).cast("int")) { case (acc, (k, v)) =>
      when(era === k, v).otherwise(acc)
    }
}

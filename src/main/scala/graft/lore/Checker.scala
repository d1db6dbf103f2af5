package graft.lore

import java.util.regex.Pattern
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A structured claim. Reference: ParsedClaim (lore/parser.py:28-65). */
final case class ParsedClaim(
    original: String,
    claimType: String, // RELATIONSHIP | ENTITY_EXISTS | ATTRIBUTE | TEMPORAL | LOCATION | CAPABILITY | EVENT_ORDER | UNKNOWN
    subject: Option[String] = None,
    predicate: Option[String] = None,
    obj: Option[String] = None,
    attribute: Option[String] = None,
    value: Option[String] = None,
    timePeriod: Option[String] = None,
    event1Agent: Option[String] = None,
    event1Action: Option[String] = None,
    event1Patient: Option[String] = None,
    event2Agent: Option[String] = None,
    event2Action: Option[String] = None,
    event2Patient: Option[String] = None,
    ordering: Option[String] = None,
    negated: Boolean = false,
    uncertain: Boolean = false)

/** Lore-consistency query layer (reference lore/parser.py + checker.py,
  * SURVEY.md §2.13): deterministic regex claim parsing routed (Q3,
  * checker.py:255-296) to parameterized DataFrame queries over the engine's
  * edge / vertex / rules / timeline / event tables.
  *
  * Documented deviations from the reference's deterministic path (both are
  * stand-ins for behavior the reference delegates to its LLM parse,
  * parser.py:303-354):
  *  - the location pattern is tried BEFORE the is/was-attribute pattern
  *    (in the reference the attribute regex shadows "X is in Y" and
  *    LOCATION is only reachable via the LLM);
  *  - a claim whose only signal is a time period gets its subject from the
  *    leading capitalized token run (the reference leaves subject unset and
  *    relies on the LLM, making the deterministic temporal check a no-op).
  * And one extension: a negated relationship claim with positive edge
  * evidence is INVALID (the reference ignores `negated` in
  * _check_relationship; flipping the verdict is strictly more useful and
  * exercised by the oracle battery).
  */
object Checker {

  /** RELATIONSHIP_VERBS, parser.py:89-97. */
  val RelationshipVerbs: Seq[String] = Seq(
    "met", "fought", "killed", "married", "loved", "hated",
    "traveled to", "went to", "visited", "lived in", "ruled",
    "created", "forged", "destroyed", "found", "lost",
    "spoke to", "spoke with", "told", "said to",
    "gave", "received", "took", "stole",
    "is father of", "is mother of", "is son of", "is daughter of",
    "is brother of", "is sister of", "is friend of", "is enemy of")

  /** Predicate -> edge-type map, ported verbatim from checker.py:436-454
    * (including its quirks: met->INTERACTED_WITH, visited->TRAVELED_TO);
    * unmapped predicates fall back to upper-snake of the verb.
    */
  val PredicateToEdgeType: Map[String, String] = Map(
    "met" -> "INTERACTED_WITH",
    "spoke to" -> "SPOKE_TO",
    "spoke with" -> "SPOKE_TO",
    "traveled to" -> "TRAVELED_TO",
    "went to" -> "TRAVELED_TO",
    "visited" -> "TRAVELED_TO",
    "lived in" -> "LIVED_IN",
    "fought" -> "FOUGHT",
    "killed" -> "KILLED",
    "created" -> "CREATED",
    "forged" -> "CREATED",
    "found" -> "FOUND",
    "gave" -> "GAVE",
    "is father of" -> "PARENT_OF",
    "is mother of" -> "PARENT_OF",
    "is son of" -> "CHILD_OF",
    "is daughter of" -> "CHILD_OF")

  /** TIME_PERIODS (parser.py:82-86). */
  val TimePeriods: Seq[String] = Seq(
    "First Age", "Second Age", "Third Age", "Fourth Age",
    "Years of the Trees", "Years of the Sun",
    "Elder Days", "Younger Days")

  private val Negation = Pattern.compile(
    """\b(not|never|didn't|did not|wasn't|was not|isn't|is not|aren't|are not)\b""",
    Pattern.CASE_INSENSITIVE)
  private val Uncertainty = Pattern.compile(
    """\b(might|may|possibly|perhaps|probably|could have|might have)\b""",
    Pattern.CASE_INSENSITIVE)
  private val TimePattern = Pattern.compile(
    s"""(?:in|during|of)\\s+(?:the\\s+)?(${TimePeriods.map(Pattern.quote).mkString("|")})""",
    Pattern.CASE_INSENSITIVE)
  // simple event-order pattern (parser.py:184-201)
  private val EventOrderPattern = Pattern.compile(
    """([A-Z]\w+)\s+(found|lost|took|gave|stole|killed|died|created|forged|destroyed|met|married|arrived|left)\s+(?:the\s+)?(\w+(?:\s+\w+)?)\s+(before|after)\s+([A-Z]\w+)""",
    Pattern.CASE_INSENSITIVE)
  private val LeadingName = Pattern.compile(
    """^([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)""")
  // precompiled once like the patterns above — parse() runs per claim and
  // previously recompiled the whole cascade (32 verb patterns + 4 shape
  // patterns) on every call (round-5 review)
  private val VerbPatterns: Seq[(String, Pattern)] =
    RelationshipVerbs.map { verb =>
      verb -> Pattern.compile(
        s"""(\\w+(?:\\s+\\w+)?)\\s+${Pattern.quote(verb)}\\s+(\\w+(?:\\s+\\w+)?)""",
        Pattern.CASE_INSENSITIVE)
    }
  private val IsAPattern = Pattern.compile(
    """(\w+(?:\s+\w+)?)\s+is\s+(?:a|an)\s+(\w+)""", Pattern.CASE_INSENSITIVE)
  private val LocPattern = Pattern.compile(
    """(\w+(?:\s+\w+)?)\s+is\s+(?:in|at|near)\s+(?:the\s+)?(\w+(?:\s+\w+)?)""",
    Pattern.CASE_INSENSITIVE)
  private val AttrPattern = Pattern.compile(
    """(\w+(?:\s+\w+)?)\s+(?:is|was)\s+(\w+)""", Pattern.CASE_INSENSITIVE)
  private val CapPattern = Pattern.compile(
    """(\w+(?:\s+\w+)?)\s+can\s+(\w+(?:\s+\w+)?)""", Pattern.CASE_INSENSITIVE)

  /** ClaimParser.parse (Q1, parser.py:136-250), deterministic path. */
  def parse(text: String): ParsedClaim = {
    val negated = Negation.matcher(text).find()
    val uncertain = Uncertainty.matcher(text).find()
    val tm = TimePattern.matcher(text)
    val timePeriod = if (tm.find()) Some(tm.group(1)) else None
    val base = ParsedClaim(text, "UNKNOWN", timePeriod = timePeriod,
      negated = negated, uncertain = uncertain)

    // event ordering: "X VERB Y before/after Z" (same action implied for Z)
    val em = EventOrderPattern.matcher(text)
    if (em.find())
      return base.copy(claimType = "EVENT_ORDER",
        event1Agent = Some(em.group(1)),
        event1Action = Some(em.group(2)),
        event1Patient = Some(em.group(3)),
        ordering = Some(em.group(4).toLowerCase(java.util.Locale.ROOT)),
        event2Agent = Some(em.group(5)),
        event2Action = Some(em.group(2)),
        event2Patient = Some(em.group(3)))

    // relationship verbs (first matching verb in list order wins)
    VerbPatterns.foreach { case (verb, p) =>
      val m = p.matcher(text)
      if (m.find())
        return base.copy(claimType = "RELATIONSHIP",
          subject = Some(m.group(1).trim), predicate = Some(verb),
          obj = Some(m.group(2).trim))
    }

    // "is a" -> entity type
    val isA = IsAPattern.matcher(text)
    if (isA.find())
      return base.copy(claimType = "ENTITY_EXISTS",
        subject = Some(isA.group(1).trim), attribute = Some("type"),
        value = Some(isA.group(2).trim))

    // location — tried before the is/was-attribute pattern (see object doc)
    val loc = LocPattern.matcher(text)
    if (loc.find())
      return base.copy(claimType = "LOCATION",
        subject = Some(loc.group(1).trim), predicate = Some("located_in"),
        obj = Some(loc.group(2).trim))

    // "is/was <adjective>"
    val attr = AttrPattern.matcher(text)
    if (attr.find())
      return base.copy(claimType = "ATTRIBUTE",
        subject = Some(attr.group(1).trim), attribute = Some("description"),
        value = Some(attr.group(2).trim))

    // capability
    val cap = CapPattern.matcher(text)
    if (cap.find())
      return base.copy(claimType = "CAPABILITY",
        subject = Some(cap.group(1).trim), attribute = Some("capability"),
        value = Some(cap.group(2).trim))

    // time period with nothing else parsed -> TEMPORAL; subject from the
    // leading capitalized run (see object doc)
    if (timePeriod.isDefined) {
      val lm = LeadingName.matcher(text)
      val subject = if (lm.find()) Some(lm.group(1)) else None
      return base.copy(claimType = "TEMPORAL", subject = subject)
    }

    base
  }

  // -------------------------------------------------------------------
  // Checkers (Q3-Q10). All take broadcast-sized claim batches and produce
  // (claim, claim_type, status, evidence, suggestion) rows.
  // -------------------------------------------------------------------

  private val OutCols = Seq("claim", "claim_type", "status", "evidence",
    "suggestion", "confidence")

  /** Q8 status-driven confidence (checker.py:77-107 ValidationResult always
    * carries one; the deterministic checkers assign fixed bases —
    * relationship 0.95 (checker.py:407), entity-type 0.9 (:327), attribute
    * 0.8 (:378), temporal 0.9 (:647,661), capability 0.6 (:728),
    * rules-fallback 0.4 (:916); UNKNOWN keeps the 0.0 default). Event-order
    * verdicts instead blend match quality via [[computeConfidence]].
    */
  private def fixedConfidence(byStatus: (String, Double)*): Column =
    byStatus.foldLeft(lit(0.0)) { case (acc, (st, c)) =>
      when(col("status") === st, c).otherwise(acc)
    }

  private def stem(v: String): String =
    v.toLowerCase(java.util.Locale.ROOT).stripSuffix("ed").stripSuffix("s")

  /** Rule-cache evidence: for each (claim, terms) count rules whose text
    * contains ANY of the terms — the reference's `_find_relevant_rules`
    * (checker.py:982-993). Result: (claim, rule_evidence).
    */
  private def ruleEvidence(
      spark: SparkSession,
      terms: Seq[(String, Seq[String])], // claim -> search terms
      rules: DataFrame): DataFrame = {
    import spark.implicits._
    val t = terms.toDF("claim", "terms")
    broadcast(t).join(rules,
        exists(col("terms"), x => col("rule_text").contains(x)), "left")
      .groupBy("claim")
      .agg(count(col("rule_text")).as("rule_evidence"))
  }

  /** Q5 relationship check + Q10 rules fallback: VALID on edge evidence
    * (INVALID when negated — see object doc); otherwise the reference's
    * _check_against_rules (PLAUSIBLE on any term-relevant rule, else
    * UNKNOWN).
    */
  def checkRelationships(
      spark: SparkSession,
      claims: Seq[ParsedClaim],
      edges: DataFrame,
      rules: DataFrame): DataFrame = {
    import spark.implicits._
    val rel = claims.filter(_.claimType == "RELATIONSHIP")
    if (rel.isEmpty) return emptyOut(spark)
    val cdf = rel.map { c =>
      val et = PredicateToEdgeType.getOrElse(c.predicate.get.toLowerCase(java.util.Locale.ROOT),
        c.predicate.get.toUpperCase(java.util.Locale.ROOT).replace(" ", "_"))
      (c.original, c.subject.get.toLowerCase(java.util.Locale.ROOT), et, c.obj.get.toLowerCase(java.util.Locale.ROOT),
        c.negated)
    }.toDF("claim", "subj", "edge_type", "obj", "negated")

    val joined = broadcast(cdf).join(edges,
      col("type") === col("edge_type") &&
        col("src").contains(col("subj")) &&
        col("dst").contains(col("obj")),
      "left")
    val direct = joined.groupBy("claim", "negated")
      .agg(sum(when(col("src").isNotNull, col("mention_count"))
        .otherwise(0L)).as("edge_evidence"))
    val fallback = ruleEvidence(spark,
      rel.map(c => c.original ->
        Seq(c.subject, c.obj, c.value).flatten.map(_.toLowerCase(java.util.Locale.ROOT))), rules)
    direct.join(fallback, Seq("claim"), "left")
      .select(col("claim"), lit("relationship").as("claim_type"),
        when(col("edge_evidence") > 0 && !col("negated"), "VALID")
          .when(col("edge_evidence") > 0 && col("negated"), "INVALID")
          .when(coalesce(col("rule_evidence"), lit(0L)) > 0, "PLAUSIBLE")
          .otherwise("UNKNOWN").as("status"),
        when(col("edge_evidence") > 0, col("edge_evidence"))
          .otherwise(coalesce(col("rule_evidence"), lit(0L))).as("evidence"),
        lit(null).cast("string").as("suggestion"))
      .withColumn("confidence", fixedConfidence(
        "VALID" -> 0.95, "INVALID" -> 0.95, "PLAUSIBLE" -> 0.4))
  }

  /** Q4 entity-existence check (checker.py:310-350): VALID when the claimed
    * type is contained in a matching vertex's label; UNKNOWN when the
    * entity exists with an unconfirmed type or is absent.
    */
  def checkEntities(
      spark: SparkSession,
      claims: Seq[ParsedClaim],
      vertices: DataFrame): DataFrame = {
    import spark.implicits._
    val ent = claims.filter(c =>
      c.claimType == "ENTITY_EXISTS" && c.subject.isDefined)
    if (ent.isEmpty) return emptyOut(spark)
    val cdf = ent.map(c => (c.original, c.subject.get.toLowerCase(java.util.Locale.ROOT),
      c.value.getOrElse("").toLowerCase(java.util.Locale.ROOT))).toDF("claim", "subj", "want_type")
    broadcast(cdf).join(vertices,
      col("id").contains(col("subj")), "left")
      .groupBy("claim", "want_type")
      .agg(
        count(col("id")).as("evidence"),
        sum(when(col("label").contains(col("want_type")), 1L).otherwise(0L))
          .as("type_matches"))
      .select(col("claim"), lit("entity_exists").as("claim_type"),
        when(col("type_matches") > 0, "VALID")
          .otherwise("UNKNOWN").as("status"),
        col("evidence"),
        lit(null).cast("string").as("suggestion"))
      .withColumn("confidence", fixedConfidence("VALID" -> 0.9))
  }

  /** Q10/_check_attribute (checker.py:352-389 + 995-1005): a rule supports
    * the claim iff its text contains both subject and value and the claim
    * is not negated; VALID on any support, else UNKNOWN. (The contradiction
    * branch is unreachable in the reference's deterministic path — the
    * supports check fires first on exactly the same condition.)
    */
  def checkAttributes(
      spark: SparkSession,
      claims: Seq[ParsedClaim],
      rules: DataFrame): DataFrame = {
    import spark.implicits._
    val att = claims.filter(c => c.claimType == "ATTRIBUTE" &&
      c.subject.isDefined && c.value.isDefined)
    if (att.isEmpty) return emptyOut(spark)
    val cdf = att.map(c => (c.original, c.subject.get.toLowerCase(java.util.Locale.ROOT),
      c.value.get.toLowerCase(java.util.Locale.ROOT), c.negated))
      .toDF("claim", "subj", "val", "negated")
    broadcast(cdf).join(rules,
        col("rule_text").contains(col("subj")) &&
          col("rule_text").contains(col("val")) && !col("negated"), "left")
      .groupBy("claim")
      .agg(count(col("rule_text")).as("evidence"))
      .select(col("claim"), lit("attribute").as("claim_type"),
        when(col("evidence") > 0, "VALID").otherwise("UNKNOWN").as("status"),
        col("evidence"),
        lit(null).cast("string").as("suggestion"))
      .withColumn("confidence", fixedConfidence("VALID" -> 0.8))
  }

  /** Q6 temporal check (checker.py:634-710) over the E12 timeline:
    * alive_during tri-state -> VALID / INVALID / UNKNOWN.
    */
  def checkTemporal(
      spark: SparkSession,
      claims: Seq[ParsedClaim],
      timeline: DataFrame): DataFrame = {
    import spark.implicits._
    val (tem, unparsed) = claims.filter(_.claimType == "TEMPORAL")
      .partition(c => c.subject.isDefined && c.timePeriod.isDefined)
    // reference _check_temporal (checker.py:634-637) returns the
    // initialized UNKNOWN result when subject/time_period are missing —
    // every claim still gets a verdict row (round-5 review: these claims
    // previously vanished from the output instead)
    val unparsedRows =
      if (unparsed.isEmpty) emptyOut(spark)
      else unparsed.map(c => (c.original, "temporal", "UNKNOWN", 0L,
        null.asInstanceOf[String], 0.0)).toDF(OutCols: _*)
    if (tem.isEmpty) return unparsedRows
    val cdf = tem.map { c =>
      (c.original, c.subject.get.toLowerCase(java.util.Locale.ROOT),
        Temporal.eraFromText(c.timePeriod.get).getOrElse("UNKNOWN"))
    }.toDF("claim", "subj", "era")
    val joined = broadcast(cdf).join(timeline,
      lower(col("name")) === col("subj"), "left")
    val e = Temporal.eraOrderCol(col("era"))
    val lo = Temporal.eraOrderCol(col("birth_era"))
    val hi = Temporal.eraOrderCol(col("death_era"))
    val alive = when(lo.isNotNull && e < lo, lit(false))
      .when(hi.isNotNull && e > hi, lit(false))
      .when(lo.isNotNull && hi.isNotNull && e.between(lo, hi), lit(true))
      .otherwise(lit(null).cast("boolean"))
    joined
      .withColumn("alive", when(col("name").isNotNull, alive))
      .groupBy("claim")
      .agg(count(col("name")).as("evidence"),
        min(col("alive")).as("alive_min"),
        max(col("alive")).as("alive_max"))
      .select(col("claim"), lit("temporal").as("claim_type"),
        when(col("alive_min") === true, "VALID")
          .when(col("alive_max") === false, "INVALID")
          .otherwise("UNKNOWN").as("status"),
        col("evidence"),
        lit(null).cast("string").as("suggestion"))
      .withColumn("confidence", fixedConfidence(
        "VALID" -> 0.9, "INVALID" -> 0.9))
      .unionByName(unparsedRows)
  }

  /** Q9 capability check (checker.py:712-730): PLAUSIBLE on any rule
    * relevant to (subject | value) or (subject | "can"); evidence counts
    * both scans, duplicates retained, exactly as the reference extends its
    * list.
    */
  def checkCapabilities(
      spark: SparkSession,
      claims: Seq[ParsedClaim],
      rules: DataFrame): DataFrame = {
    val cap = claims.filter(c => c.claimType == "CAPABILITY" &&
      c.subject.isDefined && c.value.isDefined)
    if (cap.isEmpty) return emptyOut(spark)
    val scan1 = ruleEvidence(spark, cap.map(c =>
      c.original -> Seq(c.subject.get.toLowerCase(java.util.Locale.ROOT), c.value.get.toLowerCase(java.util.Locale.ROOT))),
      rules)
    val scan2 = ruleEvidence(spark, cap.map(c =>
      c.original -> Seq(c.subject.get.toLowerCase(java.util.Locale.ROOT), "can")), rules)
      .withColumnRenamed("rule_evidence", "rule_evidence2")
    scan1.join(scan2, Seq("claim"))
      .select(col("claim"), lit("capability").as("claim_type"),
        when(col("rule_evidence") + col("rule_evidence2") > 0, "PLAUSIBLE")
          .otherwise("UNKNOWN").as("status"),
        (col("rule_evidence") + col("rule_evidence2")).as("evidence"),
        lit(null).cast("string").as("suggestion"))
      .withColumn("confidence", fixedConfidence("PLAUSIBLE" -> 0.6))
  }

  /** Q9 location + general rules fallback (checker.py:732-734, 894-918):
    * PLAUSIBLE when any rule mentions any of subject/object/value.
    */
  def checkAgainstRules(
      spark: SparkSession,
      claims: Seq[ParsedClaim],
      rules: DataFrame,
      claimType: String): DataFrame = {
    val sel = claims.filter(c =>
      (if (claimType == "LOCATION") c.claimType == "LOCATION"
       else c.claimType == "UNKNOWN"))
    if (sel.isEmpty) return emptyOut(spark)
    val ev = ruleEvidence(spark, sel.map(c => c.original ->
      Seq(c.subject, c.obj, c.value).flatten.map(_.toLowerCase(java.util.Locale.ROOT))), rules)
    ev.select(col("claim"), lit(claimType.toLowerCase(java.util.Locale.ROOT)).as("claim_type"),
      when(col("rule_evidence") > 0, "PLAUSIBLE")
        .otherwise("UNKNOWN").as("status"),
      col("rule_evidence").as("evidence"),
      lit(null).cast("string").as("suggestion"))
      .withColumn("confidence", fixedConfidence("PLAUSIBLE" -> 0.4))
  }

  /** Q7 event-order check (checker.py:736-813): find both events with the
    * E7 fuzzy filter, order the first match of each (first = minimum
    * (doc_id, pos), the engine's deterministic stand-in for the reference's
    * extraction-order events1[0]), compare eras then years (E8 with an
    * empty relations table — the deterministic path extracts no explicit
    * event relations, and E9-inferred relations agree with the year
    * ordering by construction). INVALID verdicts carry the reference's
    * "Did you mean" suggestion.
    */
  def checkEventOrder(
      spark: SparkSession,
      claims: Seq[ParsedClaim],
      events: DataFrame): DataFrame = {
    import spark.implicits._
    val evc = claims.filter(c => c.claimType == "EVENT_ORDER")
    if (evc.isEmpty) return emptyOut(spark)
    val sides = evc.flatMap { c =>
      Seq(
        (c.original, 1, c.event1Agent.map(_.toLowerCase(java.util.Locale.ROOT)).orNull,
          c.event1Action.map(stem).orNull,
          c.event1Patient.map(_.toLowerCase(java.util.Locale.ROOT).replaceFirst("^(the|a|an) ", "")).orNull),
        (c.original, 2, c.event2Agent.map(_.toLowerCase(java.util.Locale.ROOT)).orNull,
          c.event2Action.map(stem).orNull,
          c.event2Patient.map(_.toLowerCase(java.util.Locale.ROOT).replaceFirst("^(the|a|an) ", "")).orNull))
    }.toDF("claim", "side", "c_agent", "c_stem", "c_patient")

    val evPatient = regexp_replace(lower(col("patient")), "^(the|a|an) ", "")
    val matched = broadcast(sides).join(events,
      (col("c_agent").isNull ||
        lower(col("agent")).contains(col("c_agent")) ||
        col("c_agent").contains(lower(col("agent")))) &&
      (col("c_stem").isNull || lower(col("action")).contains(col("c_stem"))) &&
      (col("c_patient").isNull ||
        evPatient.contains(col("c_patient")) ||
        col("c_patient").contains(evPatient)),
      "left")
    val seen = concat(col("doc_id"), lit("#"),
      lpad(col("pos").cast("string"), 19, "0"))
    val descr = concat_ws(" ", col("agent"), col("action"), col("patient"))
    val firsts = matched.groupBy("claim", "side")
      .agg(count(col("event_id")).as("matches"),
        min_by(col("era"), seen).as("era"),
        min_by(col("year"), seen).as("year"),
        min_by(descr, seen).as("descr"))
    val s1 = firsts.filter(col("side") === 1)
      .select(col("claim"), col("matches").as("m1"),
        Temporal.eraOrderCol(col("era")).as("e1"), col("year").as("y1"),
        col("descr").as("d1"))
    val s2 = firsts.filter(col("side") === 2)
      .select(col("claim"), col("matches").as("m2"),
        Temporal.eraOrderCol(col("era")).as("e2"), col("year").as("y2"),
        col("descr").as("d2"))
    val ords = evc.map { c =>
      val claimText = Seq(c.event1Agent, c.event1Action, c.event1Patient,
        c.event2Agent, c.event2Action, c.event2Patient).flatten.mkString(" ")
      (c.original, c.ordering.getOrElse("before"), claimText)
    }.toDF("claim", "claimed", "claim_text")
    val actual = when(col("e1").isNotNull && col("e2").isNotNull &&
        col("e1") =!= col("e2"),
        when(col("e1") < col("e2"), "before").otherwise("after"))
      .when(col("y1").isNotNull && col("y2").isNotNull &&
        col("y1") =!= col("y2"),
        when(col("y1") < col("y2"), "before").otherwise("after"))
      .otherwise(lit(null).cast("string"))
    // Q8 match-quality confidence (checker.py:779-798): evidence kind from
    // the matched pair (both years -> "year" 0.88, both eras -> "era" 0.80,
    // else "direct" 0.95) x token-set similarity between the claim's event
    // phrases and the matched events' descriptions ("agent action patient",
    // events.py:637); clamp [0.5, 0.95]; floor-based 2dp rounding for
    // Spark/DuckDB parity (the reference's Python round(x, 2) differs only
    // on exact halves).
    val cToks = array_distinct(split(lower(col("claim_text")), "\\s+"))
    val fToks = array_distinct(split(
      lower(concat_ws(" ", col("d1"), col("d2"))), "\\s+"))
    val sim = size(array_intersect(cToks, fToks)).cast("double") /
      size(array_union(cToks, fToks))
    val base = when(col("y1").isNotNull && col("y2").isNotNull, 0.88)
      .when(col("e1").isNotNull && col("e2").isNotNull, 0.80)
      .otherwise(0.95)
    val conf = floor(greatest(lit(0.5), least(lit(0.95), base * sim)) *
      100 + 0.5) / 100.0
    s1.join(s2, Seq("claim")).join(broadcast(ords), Seq("claim"))
      .withColumn("actual", actual)
      .withColumn("status",
        when(col("m1") === 0 || col("m2") === 0, "UNKNOWN")
          .when(col("actual").isNull, "UNKNOWN")
          .when(col("actual") === col("claimed"), "VALID")
          .otherwise("INVALID"))
      .select(col("claim"), lit("event_order").as("claim_type"),
        col("status"),
        (col("m1") + col("m2")).as("evidence"),
        when(col("m1") > 0 && col("m2") > 0 && col("actual").isNotNull &&
            col("actual") =!= col("claimed"),
          concat(lit("Did you mean: "),
            regexp_replace(col("claim"), col("claimed"), col("actual")),
            lit("?"))).as("suggestion"),
        when(col("status").isin("VALID", "INVALID"), conf)
          .otherwise(0.0).as("confidence"))
  }

  private def emptyOut(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, String, Long, String, Double)]
      .toDF(OutCols: _*)
  }

  /** Q3 check() routing (checker.py:255-296): parse every claim, dispatch
    * to its checker, union the verdicts.
    */
  def checkAll(
      spark: SparkSession,
      claimTexts: Seq[String],
      edges: DataFrame,
      vertices: DataFrame,
      rules: DataFrame,
      timeline: DataFrame,
      events: DataFrame): DataFrame = {
    val claims = claimTexts.map(parse)
    checkRelationships(spark, claims, edges, rules)
      .unionByName(checkEntities(spark, claims, vertices))
      .unionByName(checkAttributes(spark, claims, rules))
      .unionByName(checkTemporal(spark, claims, timeline))
      .unionByName(checkCapabilities(spark, claims, rules))
      .unionByName(checkAgainstRules(spark, claims, rules, "LOCATION"))
      .unionByName(checkEventOrder(spark, claims, events))
      .unionByName(checkAgainstRules(spark, claims, rules, "UNKNOWN"))
  }

  /** parse_multiple (parser.py:356-376): sentence-split a text block and
    * parse each fragment longer than 10 chars.
    */
  def parseMultiple(text: String): Seq[ParsedClaim] =
    text.split("[.!?]+").map(_.trim).filter(_.length > 10).map(parse).toSeq

  /** check_text (checker.py:298-308): validate every claim in a block. */
  def checkText(
      spark: SparkSession,
      text: String,
      edges: DataFrame,
      vertices: DataFrame,
      rules: DataFrame,
      timeline: DataFrame,
      events: DataFrame): DataFrame =
    checkAll(spark, parseMultiple(text).map(_.original),
      edges, vertices, rules, timeline, events)

  /** Q8 confidence blend (checker.py:27-56): base by evidence kind x
    * token-set similarity (Jaccard on token sets approximates rapidfuzz
    * token_set_ratio, SURVEY.md Q8), clamped to [0.5, 0.95].
    */
  def computeConfidence(evidenceKind: String, a: String, b: String): Double = {
    val base = evidenceKind match {
      case "direct" => 0.95
      case "year" => 0.88
      case _ => 0.80
    }
    val (ta, tb) = (a.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSet,
      b.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSet)
    val sim =
      if (ta.isEmpty || tb.isEmpty) 0.0
      else (ta intersect tb).size.toDouble / (ta union tb).size
    math.max(0.5, math.min(0.95, base * sim))
  }
}

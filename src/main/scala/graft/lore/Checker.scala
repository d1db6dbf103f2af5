package graft.lore

import java.util.regex.Pattern
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A structured claim. Reference: ParsedClaim (lore/parser.py). */
final case class ParsedClaim(
    original: String,
    claimType: String, // RELATIONSHIP | ENTITY_EXISTS | ATTRIBUTE | LOCATION | CAPABILITY | EVENT_ORDER | UNKNOWN
    subject: Option[String] = None,
    predicate: Option[String] = None,
    obj: Option[String] = None,
    attribute: Option[String] = None,
    value: Option[String] = None,
    negated: Boolean = false,
    uncertain: Boolean = false)

/** Lore-consistency query layer (reference lore/parser.py + checker.py,
  * SURVEY.md §2.13): regex claim parsing -> parameterized DataFrame
  * queries over the edge/vertex tables.
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

  private val Negation = Pattern.compile(
    """\b(not|never|didn't|did not|wasn't|was not|isn't|is not|aren't|are not)\b""",
    Pattern.CASE_INSENSITIVE)
  private val Uncertainty = Pattern.compile(
    """\b(might|may|possibly|perhaps|probably|could have|might have)\b""",
    Pattern.CASE_INSENSITIVE)

  /** ClaimParser.parse (Q1, parser.py:136-250), deterministic path. */
  def parse(text: String): ParsedClaim = {
    val negated = Negation.matcher(text).find()
    val uncertain = Uncertainty.matcher(text).find()
    val base = ParsedClaim(text, "UNKNOWN", negated = negated,
      uncertain = uncertain)

    // relationship verbs (first matching verb in list order wins)
    RelationshipVerbs.foreach { verb =>
      val p = Pattern.compile(
        s"""(\\w+(?:\\s+\\w+)?)\\s+${Pattern.quote(verb)}\\s+(\\w+(?:\\s+\\w+)?)""",
        Pattern.CASE_INSENSITIVE)
      val m = p.matcher(text)
      if (m.find())
        return base.copy(claimType = "RELATIONSHIP",
          subject = Some(m.group(1).trim), predicate = Some(verb),
          obj = Some(m.group(2).trim))
    }

    // "is a" -> entity type
    val isA = Pattern.compile("""(\w+(?:\s+\w+)?)\s+is\s+(?:a|an)\s+(\w+)""",
      Pattern.CASE_INSENSITIVE).matcher(text)
    if (isA.find())
      return base.copy(claimType = "ENTITY_EXISTS",
        subject = Some(isA.group(1).trim), attribute = Some("type"),
        value = Some(isA.group(2).trim))

    // "is/was <adjective>"
    val attr = Pattern.compile("""(\w+(?:\s+\w+)?)\s+(?:is|was)\s+(\w+)""",
      Pattern.CASE_INSENSITIVE).matcher(text)
    if (attr.find())
      return base.copy(claimType = "ATTRIBUTE",
        subject = Some(attr.group(1).trim), attribute = Some("description"),
        value = Some(attr.group(2).trim))

    // location
    val loc = Pattern.compile(
      """(\w+(?:\s+\w+)?)\s+is\s+(?:in|at|near)\s+(?:the\s+)?(\w+(?:\s+\w+)?)""",
      Pattern.CASE_INSENSITIVE).matcher(text)
    if (loc.find())
      return base.copy(claimType = "LOCATION",
        subject = Some(loc.group(1).trim), predicate = Some("located_in"),
        obj = Some(loc.group(2).trim))

    // capability
    val cap = Pattern.compile("""(\w+(?:\s+\w+)?)\s+can\s+(\w+(?:\s+\w+)?)""",
      Pattern.CASE_INSENSITIVE).matcher(text)
    if (cap.find())
      return base.copy(claimType = "CAPABILITY",
        subject = Some(cap.group(1).trim), attribute = Some("capability"),
        value = Some(cap.group(2).trim))

    base
  }

  /** Q5 relationship check for a batch of claims, as one join against the
    * edge table: evidence = edge count between substring-matched endpoints
    * of the mapped type. Status: VALID if evidence and not negated,
    * INVALID if evidence and negated, else UNSUPPORTED (checker.py:391-505).
    */
  def checkRelationships(
      spark: SparkSession,
      claims: Seq[ParsedClaim],
      edges: DataFrame): DataFrame = {
    import spark.implicits._
    val rel = claims.filter(_.claimType == "RELATIONSHIP")
    val cdf = rel.map { c =>
      val et = PredicateToEdgeType.getOrElse(c.predicate.get.toLowerCase,
        c.predicate.get.toUpperCase.replace(" ", "_"))
      (c.original, c.subject.get.toLowerCase, et, c.obj.get.toLowerCase,
        c.negated)
    }.toDF("claim", "subj", "edge_type", "obj", "negated")

    val joined = broadcast(cdf).join(edges,
      col("type") === col("edge_type") &&
        col("src").contains(col("subj")) &&
        col("dst").contains(col("obj")),
      "left")
    joined.groupBy("claim", "negated")
      .agg(sum(when(col("src").isNotNull, col("mention_count"))
        .otherwise(0L)).as("evidence"))
      .select(col("claim"),
        when(col("evidence") > 0 && !col("negated"), "VALID")
          .when(col("evidence") > 0 && col("negated"), "INVALID")
          .otherwise("UNSUPPORTED").as("status"),
        col("evidence"))
  }

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
    val (ta, tb) = (a.toLowerCase.split("\\s+").toSet,
      b.toLowerCase.split("\\s+").toSet)
    val sim =
      if (ta.isEmpty || tb.isEmpty) 0.0
      else (ta intersect tb).size.toDouble / (ta union tb).size
    math.max(0.5, math.min(0.95, base * sim))
  }

  /** Q4 entity-existence check against the vertex table. */
  def checkEntities(
      spark: SparkSession,
      claims: Seq[ParsedClaim],
      vertices: DataFrame): DataFrame = {
    import spark.implicits._
    val ent = claims.filter(c =>
      c.claimType == "ENTITY_EXISTS" && c.subject.isDefined)
    val cdf = ent.map(c => (c.original, c.subject.get.toLowerCase,
      c.value.getOrElse("").toLowerCase)).toDF("claim", "subj", "want_type")
    broadcast(cdf).join(vertices,
      col("id").contains(col("subj")), "left")
      .groupBy("claim", "want_type")
      .agg(
        count(col("id")).as("evidence"),
        sum(when(col("label").contains(col("want_type")), 1L).otherwise(0L))
          .as("type_matches"))
      .select(col("claim"),
        when(col("type_matches") > 0, "VALID")
          .when(col("evidence") > 0, "PLAUSIBLE")
          .otherwise("UNSUPPORTED").as("status"),
        col("evidence"))
  }
}

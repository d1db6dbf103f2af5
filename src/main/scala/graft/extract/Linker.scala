package graft.extract

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Seeded entity linking (reference EntityDatabase.lookup / EntityResolver,
  * extract/resolver.py:72-257), re-expressed as a broadcast-join cascade:
  *
  *   tier 1  exact key            — broadcast HASH join, conf 1.0
  *   tier 2  article-stripped key — broadcast hash join, conf 0.95
  *   tier 3  fuzzy                — broadcast candidate join blocked by
  *           (first char, |len diff| <= 3), similarity = rapidfuzz-exact
  *           indel ratio >= 0.85, conf = ratio (resolver.py:91-105)
  *
  * The build side (the seed registry) is tiny and broadcast, so the probe
  * side never shuffles — head-entity skew (one protagonist dominating
  * mention counts) cannot concentrate on a single reducer here. Downstream
  * aggregations rely on partial aggregation + AQE; see graft.Spark.session.
  */
object Linker {

  /** rapidfuzz `fuzz.ratio` semantics, exactly: indel distance (Levenshtein
    * with substitution cost 2) normalized — ratio = 2*LCS/(|a|+|b|).
    * SURVEY.md §7.4 risk 3: `1 - levenshtein/max(len)` differs on
    * substitutions, so we implement the real thing.
    */
  def indelRatio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val (s, t) = (a, b)
    // LCS length, two-row DP
    var prev = new Array[Int](t.length + 1)
    var cur = new Array[Int](t.length + 1)
    var i = 0
    while (i < s.length) {
      var j = 0
      while (j < t.length) {
        cur(j + 1) =
          if (s.charAt(i) == t.charAt(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    2.0 * prev(t.length) / (s.length + t.length)
  }

  /** Mention-text cleaning (resolver.py:213-221): collapse whitespace,
    * strip possessive 's.
    */
  def cleanKey(c: Column): Column =
    // final trim AFTER the possessive strip, like the reference
    // (resolver.py:213-221 ends with .strip()) and LocalLinker.cleanKey —
    // "Frodo 's" must clean to "frodo", not "frodo " (round-5 review: the
    // trailing space missed the exact tiers and fell to fuzzy, so the
    // fused and join linkers produced different confidences)
    lower(trim(regexp_replace(regexp_replace(trim(c), """\s+""", " "), "'s$", "")))

  /** Article strip (resolver.py:85-89). */
  def stripArticle(c: Column): Column =
    regexp_replace(c, "^(the |a |an )", "")

  /** Scala-side twin of [[inferType]] for fused mapPartitions stages. */
  def inferTypeLocal(label: String, text: String): String = label match {
    case "PERSON" | "ORG" => "character"
    case "PLACE" => "place"
    case "OBJECT" => "object"
    case "EVENT" => "event"
    case _ =>
      val l = text.toLowerCase(java.util.Locale.ROOT)
      if (graft.Lexicon.PlaceIndicators.exists(l.contains)) "place"
      else if (graft.Lexicon.ObjectIndicators.exists(l.contains)) "object"
      else "unknown"
  }

  /** Type inference for unlinked mentions (resolver.py:223-257). */
  def inferType(label: Column, text: Column): Column = {
    val lower_ = lower(text)
    val placeHit = graft.Lexicon.PlaceIndicators
      .map(k => lower_.contains(k)).reduce(_ || _)
    val objectHit = graft.Lexicon.ObjectIndicators
      .map(k => lower_.contains(k)).reduce(_ || _)
    when(label === "PERSON", "character")
      .when(label === "PLACE", "place")
      .when(label === "OBJECT", "object")
      .when(label === "EVENT", "event")
      .when(label === "ORG", "character")
      .when(placeHit, "place")
      .when(objectHit, "object")
      .otherwise("unknown")
  }

  /** Link mentions against a seed registry. Adds columns:
    * canonical_id, canonical_name, entity_type, link_confidence, is_new.
    */
  def link(
      spark: SparkSession,
      mentions: DataFrame,
      seeds: Seq[SeedEntity] = Seeds.default): DataFrame = {
    val ratioUdf = udf((a: String, b: String) => indelRatio(a, b))

    val alias = broadcast(Seeds.toDf(spark, seeds))
    val m = mentions
      .withColumn("mkey", cleanKey(col("text")))
      .withColumn("mkey2", stripArticle(col("mkey")))

    // tier 1: exact
    val t1 = m.join(alias, col("mkey") === col("akey"), "left")
    val hit1 = t1.filter(col("canonical_id").isNotNull)
      .withColumn("link_confidence", lit(1.0))
    val miss1 = t1.filter(col("canonical_id").isNull)
      .drop("akey", "canonical_id", "entity_type", "canonical_name")

    // tier 2: article-stripped
    val t2 = miss1.join(alias, col("mkey2") === col("akey"), "left")
    val hit2 = t2.filter(col("canonical_id").isNotNull)
      .withColumn("link_confidence", lit(0.95))
    val miss2 = t2.filter(col("canonical_id").isNull)
      .drop("akey", "canonical_id", "entity_type", "canonical_name")

    // tier 3: blocked fuzzy (broadcast nested-loop on the tiny registry).
    // The verdict for a mention depends ONLY on its cleaned key, so the
    // candidate expansion + indel-ratio DP + best-candidate window run
    // over the DISTINCT unmatched keys (a few hundred) instead of every
    // unmatched mention row (~the full mention table): the per-mention
    // window shuffle (partition by doc/pos/start/end over |mentions| x
    // candidate rows) becomes a distinct + tiny-window + broadcast
    // join-back — same rows out, |keys|/|mentions| of the DP calls
    // (LinkerSpec pins row-identical output vs the per-row form).
    // Best candidate per key by (ratio desc, id asc) — deterministic.
    val keys3 = miss2.select("mkey").distinct()
    val cand = keys3.join(
      alias,
      substring(col("mkey"), 1, 1) === substring(col("akey"), 1, 1) &&
        abs(length(col("mkey")) - length(col("akey"))) <= 3,
      "left")
      .withColumn("ratio",
        when(col("akey").isNotNull, ratioUdf(col("mkey"), col("akey"))))
      .withColumn("fuzzy_ok", col("ratio") >= 0.85)
    val w = Window.partitionBy("mkey")
      .orderBy(col("fuzzy_ok").desc_nulls_last, col("ratio").desc_nulls_last,
        col("canonical_id").asc_nulls_last)
    val best = cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .withColumn("matched", col("fuzzy_ok").isNotNull && col("fuzzy_ok"))
      .select(col("mkey"),
        col("akey"),
        when(col("matched"), col("canonical_id")).as("canonical_id"),
        when(col("matched"), col("canonical_name")).as("canonical_name"),
        when(col("matched"), col("entity_type")).as("entity_type"),
        when(col("matched"), col("ratio")).as("link_confidence"))
    // every distinct key has exactly one best row (the left join keeps
    // null-candidate keys), so this inner join is a per-row verdict attach
    val t3 = miss2.join(broadcast(best), Seq("mkey"))

    val all = hit1.unionByName(hit2).unionByName(t3, allowMissingColumns = false)
    all
      .withColumn("is_new", col("canonical_id").isNull)
      .withColumn("entity_type",
        when(col("is_new"), inferType(col("label"), col("text")))
          .otherwise(col("entity_type")))
      .withColumn("link_confidence",
        coalesce(col("link_confidence"), lit(0.0)))
      .drop("akey", "mkey", "mkey2")
  }
}

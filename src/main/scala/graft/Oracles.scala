package graft

import Lexicon._

/** DuckDB oracle SQL fragments. The synthesis CTE here is generated from
  * the SAME lexicon constants as [[graft.ingest.DocsSynth]], so the Spark
  * pipeline and the oracle can never drift on the corpus derivation.
  *
  * Tables available to the driver's DuckDB: the sf-dir parquet files
  * registered under their bare names (lineitem, orders, documents, ...).
  */
object Oracles {

  /** Common arithmetic, one column per selector (matches DocsSynth). */
  private val base: String =
    s"""syn_base AS (
       |  SELECT
       |    'doc_' || l_orderkey AS doc_id,
       |    l_orderkey, l_linenumber,
       |    CAST((row_number() OVER w) - 1 AS INT) AS pos,
       |    CAST(l_partkey % 20 AS INT) AS s,
       |    CAST(CASE WHEN (l_partkey + 3*l_linenumber) % 20 = l_partkey % 20
       |         THEN (l_partkey % 20 + 1) % 20
       |         ELSE (l_partkey + 3*l_linenumber) % 20 END AS INT) AS o,
       |    CAST(l_suppkey % 8 AS INT) AS v,
       |    CAST((l_partkey + l_suppkey) % 12 AS INT) AS p,
       |    CAST((7*l_partkey + 13*l_linenumber + 3*l_suppkey) % 29 AS INT) AS m,
       |    CAST(2900 + l_partkey % 60 AS INT) AS y
       |  FROM lineitem
       |  WINDOW w AS (PARTITION BY l_orderkey
       |               ORDER BY l_linenumber, l_partkey, l_suppkey)
       |)""".stripMargin

  private def charAt(i: String) = sqlElem(Chars, i)
  private def aliasAt(i: String) = sqlElem(CharAliases, i)
  private def placeAt(i: String) = sqlElem(Places, i)
  private def verbAt(i: String) = sqlElem(Verbs.map(_._1), i)
  private def predAt(i: String) = sqlElem(Verbs.map(_._2), i)
  private def birthEraAt(i: String) = sqlElem(BirthEras, i)
  private def deathEraAt(i: String) = sqlElem(DeathEras, i)
  private def peopleAt(i: String) = sqlElem(Peoples, i)
  /** 1 when the verb's object is a place. */
  private def objKindAt(i: String) =
    s"(${Verbs.map(_._3).mkString("[", ", ", "]")})[CAST(($i) AS INT) + 1]"

  /** Shared base + span derivation (everything up to and including
    * `syn0`); [[synCte]] and [[synCteLean]] both append their own
    * `syn` CTE on top so there is a single source of truth.
    */
  private val synPrefix: String = {
    val subj = charAt("s")
    val objC = charAt("o")
    val third = charAt("(o + 3) % 20")
    val place = placeAt("p")
    val place2 = placeAt("(p + 5) % 12")
    val alias = aliasAt("s")
    val verb = verbAt("v")
    val obj = s"CASE WHEN ${objKindAt("v")} = 1 THEN $place ELSE $objC END"
    val typo = s"substring($subj, 1, length($subj) - 1)"
    val eraB = birthEraAt("s % 2")
    val eraD = deathEraAt("s % 2")
    val people = peopleAt("p % 6")
    s"""$base,
       |syn0 AS (
       |  SELECT doc_id, pos, s, o, v, p, m, y,
       |    CAST(2800 + s * 7 AS INT) AS ya,
       |    CASE WHEN m BETWEEN 11 AND 13 OR m = 23 THEN 'dialogue'
       |         WHEN m BETWEEN 18 AND 19 THEN 'media' ELSE 'text' END AS kind,
       |    CASE
       |      WHEN m <= 10 THEN $subj || ' ' || $verb || ' ' || $obj || '.'
       |      WHEN m = 11 THEN
       |        '"We must ride to ' || $place || ' at dawn," said ' || $subj || '.'
       |      WHEN m = 12 THEN
       |        '"How do we get to ' || $place || ' at dawn?" asked ' || $subj || '.'
       |      WHEN m = 13 THEN $subj || ' said, "All is well in ' || $place || '."'
       |      WHEN m = 14 THEN $typo || ' ' || $verb || ' ' || $obj || '.'
       |      WHEN m BETWEEN 15 AND 16 THEN
       |        $subj || ' (also known as ' || $alias || ') rested quietly.'
       |      WHEN m = 17 THEN $subj || ' returned to ' || $place ||
       |        ' in the year ' || y || ' of the Third Age.'
       |      WHEN m = 20 THEN $subj || ' was born in the ' || $eraB || ' Age.'
       |      WHEN m = 21 THEN $subj || ' perished in the ' || $eraD || ' Age.'
       |      WHEN m = 22 THEN $subj || ' welcomed the King of ' || $place || '.'
       |      WHEN m = 23 AND v % 4 = 0 THEN
       |        '"I''ll tarry here, aye." ' || $subj || ' turned away.'
       |      WHEN m = 23 AND v % 4 = 2 THEN '"Who goes there?" The gate stayed shut.'
       |      WHEN m = 23 THEN '"We shall see." And quietly said ' || $subj || '.'
       |      WHEN m = 24 THEN $place || ' lies in the valley of ' || $place2 || '.'
       |      WHEN m = 25 THEN
       |        'The ' || $people || ' honor their custom of gift giving.'
       |      WHEN m = 26 AND v % 2 = 0 THEN
       |        'Only the wizards of ' || $place || ' can weave such spells.'
       |      WHEN m = 26 THEN $subj || ' cannot wield such magic openly.'
       |      WHEN m = 27 THEN $subj || ' arrived in ' || $place ||
       |        ' in the year ' || (2800 + s * 7) || ' of the Third Age.'
       |      WHEN m = 28 THEN $subj || ' met ' || $objC || '. ' || $objC ||
       |        ' helped ' || $third || '.'
       |      ELSE '' END AS text,
       |    CASE WHEN m BETWEEN 18 AND 19 THEN
       |      'm/' || l_orderkey || '/' || l_linenumber || '.png' END AS media_ref
       |  FROM syn_base
       |)""".stripMargin
  }

  /** Full span derivation: doc_id, pos, kind, text, media_ref, offset
    * plus the selector columns for downstream arithmetic oracles.
    */
  val synCte: String =
    s"""$synPrefix,
       |syn AS (
       |  SELECT *, CAST(coalesce(sum(length(text) + 1) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS "offset"
       |  FROM syn0
       |)""".stripMargin

  /** Wrap a SELECT over `syn` into a full oracle statement. */
  def overSyn(select: String): String = s"WITH $synCte\n$select"

  /** [[synCte]] without the per-doc cumulative-length `"offset"` window —
    * `syn` is plain `syn0`. The window sort is the single biggest memory
    * consumer in the shared corpus derivation, and the cluster-family
    * oracles (entity_rows + l2) never read `offset`; the r3 q38 oracle
    * died in a DuckDB allocation failure under harness memory pressure,
    * so its oracle (and only its SELECT shape) runs over this lean base.
    */
  val synCteLean: String = s"$synPrefix,\nsyn AS (SELECT * FROM syn0)"

  /** Wrap a SELECT over the lean (offset-free) `syn`. */
  def overSynLean(select: String): String = s"WITH $synCteLean\n$select"

  /** Shared derivation CTEs pinned `AS MATERIALIZED` in every emitted
    * oracle. DuckDB 1.0 re-INLINES a CTE at each reference site, so e.g.
    * `entity_rows`' ~30 UNION branches each recompute the full `syn`
    * window derivation — measured on the q09 oracle at sf0.01:
    * 442 s and >30 GB of spill inlined vs 0.22 s inside a 4 GB
    * memory_limit materialized (the r3 q38 driver OOM was this, not the
    * query shape). Names are a whitelist so WINDOW clauses (`w AS (`)
    * and the recursive q31 walk are never touched.
    */
  private val HeavySharedCtes = Seq(
    "syn_base", "syn0", "syn", "entity_rows", "triple_rows", "event_rows",
    "rule_rows", "timeline_rows", "vertex_rows", "dlg", "nodes", "e0",
    "sym", "l1", "l2")

  def materializeShared(sql: String): String =
    HeavySharedCtes.foldLeft(sql)((s, n) =>
      // word-boundary anchored: a bare substring replace of "e0 AS ("
      // would also fire inside a longer CTE name like "lived0 AS ("
      s.replaceAll(s"(?<![A-Za-z0-9_])${java.util.regex.Pattern.quote(n)} AS \\(",
        java.util.regex.Matcher.quoteReplacement(s"$n AS MATERIALIZED (")))

  /** Language-ID oracle: mirrors TextAnalysis.langId (same markers, same
    * earliest-wins argmax, same CJK short-circuit).
    */
  val langIdSql: String = {
    val scores = graft.text.TextAnalysis.LangMarkers.map { case (lang, ws) =>
      val s = ws.map(w =>
        s"(CASE WHEN regexp_matches(lower(text), '\\b$w\\b') THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"($s) AS score_$lang"
    }.mkString(",\n         ")
    val langs = graft.text.TextAnalysis.LangMarkers.map(_._1)
    val m = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
    val argmax = langs.map(l => s"WHEN score_$l = m THEN '$l'").mkString(" ")
    s"""WITH scored AS (
       |  SELECT doc_id, text,
       |         $scores
       |  FROM documents
       |), best AS (
       |  SELECT doc_id, text, $m AS m, * FROM scored
       |)
       |SELECT doc_id,
       |  CASE WHEN regexp_matches(text, '[\\x{4E00}-\\x{9FFF}]') THEN 'zh'
       |       WHEN m <= 0 THEN 'und' $argmax END AS predicted_lang,
       |  m AS lang_score
       |FROM best""".stripMargin
  }

  /** Quality oracle mirroring TextAnalysis.quality. */
  val qualitySql: String = {
    val stopHits = graft.text.TextAnalysis.Stopwords.map(w =>
      s"(len(regexp_split_to_array(lower(text), '\\b$w\\b')) - 1)")
      .mkString(" + ")
    s"""WITH q AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS words,
       |    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
       |    length(regexp_replace(text, '[^\\.,;:!\\?]', '', 'g')) AS punct,
       |    length(text) AS chars,
       |    ($stopHits) AS stop_hits
       |  FROM documents
       |)
       |SELECT doc_id, words,
       |  alpha::DOUBLE / greatest(words, 1) AS avg_word_len,
       |  punct::DOUBLE / greatest(chars, 1) AS punct_ratio,
       |  stop_hits::DOUBLE / greatest(words, 1) AS stopword_ratio,
       |  ((400 * least(words, 100)
       |    + (30000 - least((punct * 300000) // greatest(chars, 1), 30000))
       |    + least((stop_hits * 150000) // greatest(words, 1), 30000)
       |   )::DOUBLE / 100000.0) AS quality_score
       |FROM q""".stripMargin
  }

  // ------------------------------------------------------------------
  // Expression fragments over syn's selector columns (s, o, v, p, m, y)
  // for the arithmetic oracles of the extraction stages.
  // ------------------------------------------------------------------

  /** Subject character name. */
  val eSubj: String = charAt("s")
  /** Object character name. */
  val eObjC: String = charAt("o")
  /** Place name. */
  val ePlace: String = placeAt("p")
  /** Alias token of the subject character. */
  val eAlias: String = aliasAt("s")
  /** Verb surface phrase. */
  val eVerb: String = verbAt("v")
  /** Predicate (relationship type). */
  val ePred: String = predAt("v")
  /** True when the planted verb's object is a place. */
  val eObjIsPlace: String = s"${objKindAt("v")} = 1"
  /** The triple object's surface name. */
  val eObj: String = s"CASE WHEN $eObjIsPlace THEN $ePlace ELSE $eObjC END"
  /** Typo'd subject (m=14 rows). */
  val eTypo: String = s"substring($eSubj, 1, length($eSubj) - 1)"
  /** Third character (m=28 rows). */
  val eThird: String = charAt("(o + 3) % 20")
  /** Second place (m=24 rows). */
  val ePlace2: String = placeAt("(p + 5) % 12")
  /** Birth-era name (m=20 rows). */
  val eEraB: String = birthEraAt("s % 2")
  /** Death-era name (m=21 rows). */
  val eEraD: String = deathEraAt("s % 2")
  /** People group (m=25 rows). */
  val ePeople: String = peopleAt("p % 6")
  /** rapidfuzz indel ratio of typo vs full name: 2*(n-1)/(2n-1). */
  val eTypoRatio: String =
    s"(2.0 * (length($eSubj) - 1) / (2 * length($eSubj) - 1))"

  /** All planted mention rows with their expected linking outcome.
    * Columns: doc_id, pos, text, start, label, source, confidence,
    * canonical_id, entity_type, link_confidence, is_new.
    * One UNION ALL branch per (template, mention-slot).
    */
  val entityRowsCte: String = {
    def row(where: String, text: String, start: String, label: String,
        source: String, conf: String, cid: String, etype: String,
        lconf: String, isNew: String, comment: String): String =
      s"""  -- $comment
         |  SELECT doc_id, pos, $text AS text, CAST($start AS INT) AS start,
         |         $label AS label, $source AS source,
         |         CAST($conf AS DOUBLE) AS confidence,
         |         $cid AS canonical_id, $etype AS entity_type,
         |         CAST($lconf AS DOUBLE) AS link_confidence,
         |         $isNew AS is_new
         |  FROM syn WHERE $where""".stripMargin

    val objLabel = s"CASE WHEN $eObjIsPlace THEN 'PLACE' ELSE 'PERSON' END"
    val objId = s"lower($eObj)"
    val objType = s"CASE WHEN $eObjIsPlace THEN 'place' ELSE 'character' END"
    val branches = Seq(
      row("m <= 10", eSubj, "0", "'PERSON'", "'gazetteer'", "0.85",
        s"lower($eSubj)", "'character'", "1.0", "FALSE", "text subject"),
      row("m <= 10", eObj, s"length($eSubj) + 1 + length($eVerb) + 1",
        objLabel, "'gazetteer'", "0.85", objId, objType, "1.0", "FALSE",
        "text object"),
      row("m = 11", ePlace, "length('\"We must ride to ')",
        "'PLACE'", "'gazetteer'", "0.85", s"lower($ePlace)", "'place'",
        "1.0", "FALSE", "dialogue-1 place"),
      row("m = 11", eSubj,
        s"length('\"We must ride to ') + length($ePlace) + length(' at dawn,\" said ')",
        "'PERSON'", "'gazetteer'", "0.85", s"lower($eSubj)", "'character'",
        "1.0", "FALSE", "dialogue-1 speaker"),
      row("m = 12", ePlace, "length('\"How do we get to ')",
        "'PLACE'", "'gazetteer'", "0.85", s"lower($ePlace)", "'place'",
        "1.0", "FALSE", "dialogue-1q place"),
      row("m = 12", eSubj,
        s"length('\"How do we get to ') + length($ePlace) + length(' at dawn?\" asked ')",
        "'PERSON'", "'gazetteer'", "0.85", s"lower($eSubj)", "'character'",
        "1.0", "FALSE", "dialogue-1q speaker"),
      row("m = 13", eSubj, "0", "'PERSON'", "'gazetteer'", "0.85",
        s"lower($eSubj)", "'character'", "1.0", "FALSE", "dialogue-2 speaker"),
      row("m = 13", ePlace,
        s"length($eSubj) + length(' said, \"All is well in ')",
        "'PLACE'", "'gazetteer'", "0.85", s"lower($ePlace)", "'place'",
        "1.0", "FALSE", "dialogue-2 place"),
      row("m = 14", eTypo, "0", "'UNKNOWN'", "'heuristic'", "0.7",
        s"lower($eSubj)", "'character'", eTypoRatio, "FALSE", "typo subject"),
      row("m = 14", eObj, s"length($eTypo) + 1 + length($eVerb) + 1",
        objLabel, "'gazetteer'", "0.85", objId, objType, "1.0", "FALSE",
        "typo-row object"),
      row("m BETWEEN 15 AND 16", eSubj, "0", "'PERSON'", "'gazetteer'",
        "0.85", s"lower($eSubj)", "'character'", "1.0", "FALSE",
        "alias subject"),
      row("m BETWEEN 15 AND 16", eAlias,
        s"length($eSubj) + length(' (also known as ')",
        "'PERSON'", "'gazetteer'", "0.85", s"lower($eSubj)", "'character'",
        "1.0", "FALSE", "alias token -> same canonical id"),
      row("m = 17", eSubj, "0", "'PERSON'", "'gazetteer'", "0.85",
        s"lower($eSubj)", "'character'", "1.0", "FALSE", "temporal subject"),
      row("m = 17", ePlace, s"length($eSubj) + length(' returned to ')",
        "'PLACE'", "'gazetteer'", "0.85", s"lower($ePlace)", "'place'",
        "1.0", "FALSE", "temporal place"),
      row("m = 17", "'Third Age'",
        s"length($eSubj) + length(' returned to ') + length($ePlace) + " +
          "length(' in the year ') + length(CAST(y AS VARCHAR)) + length(' of the ')",
        "'UNKNOWN'", "'heuristic'", "0.7", "NULL", "'unknown'", "0.0",
        "TRUE", "'Third Age' — unseeded"),
      row("m = 20", eSubj, "0", "'PERSON'", "'gazetteer'", "0.85",
        s"lower($eSubj)", "'character'", "1.0", "FALSE", "birth subject"),
      row("m = 20", s"$eEraB || ' Age'", s"length($eSubj) + 17",
        "'UNKNOWN'", "'heuristic'", "0.7", "NULL", "'unknown'", "0.0",
        "TRUE", "birth era span — unseeded"),
      row("m = 21", eSubj, "0", "'PERSON'", "'gazetteer'", "0.85",
        s"lower($eSubj)", "'character'", "1.0", "FALSE", "death subject"),
      row("m = 21", s"$eEraD || ' Age'", s"length($eSubj) + 17",
        "'UNKNOWN'", "'heuristic'", "0.7", "NULL", "'unknown'", "0.0",
        "TRUE", "death era span — unseeded"),
      row("m = 22", eSubj, "0", "'PERSON'", "'gazetteer'", "0.85",
        s"lower($eSubj)", "'character'", "1.0", "FALSE", "title-row subject"),
      row("m = 22", s"'King of ' || $ePlace", s"length($eSubj) + 14",
        "'PERSON'", "'pattern'", "0.9", "NULL", "'character'", "0.0",
        "TRUE", "title span (N3) wins the N5 dedup over the place inside it"),
      row("m = 23 AND v % 4 = 0", eSubj, "24", "'PERSON'", "'gazetteer'",
        "0.85", s"lower($eSubj)", "'character'", "1.0", "FALSE",
        "tier-4 attribution speaker"),
      row("m = 23 AND v % 2 = 1", eSubj, "33", "'PERSON'", "'gazetteer'",
        "0.85", s"lower($eSubj)", "'character'", "1.0", "FALSE",
        "tier-3 attribution speaker"),
      row("m = 23 AND v % 4 = 2", "'Who'", "1",
        "'UNKNOWN'", "'heuristic'", "0.7", "NULL", "'unknown'", "0.0",
        "TRUE", "capitalized quote word — unseeded ('who' is not in the stoplist)"),
      row("m = 24", ePlace, "0", "'PLACE'", "'gazetteer'", "0.85",
        s"lower($ePlace)", "'place'", "1.0", "FALSE", "geography subject"),
      row("m = 24", ePlace2, s"length($ePlace) + 23",
        "'PLACE'", "'gazetteer'", "0.85", s"lower($ePlace2)", "'place'",
        "1.0", "FALSE", "geography object"),
      row("m = 26 AND v % 2 = 0", ePlace, "20", "'PLACE'", "'gazetteer'",
        "0.85", s"lower($ePlace)", "'place'", "1.0", "FALSE",
        "capability-rule place"),
      row("m = 26 AND v % 2 = 1", eSubj, "0", "'PERSON'", "'gazetteer'",
        "0.85", s"lower($eSubj)", "'character'", "1.0", "FALSE",
        "limitation-rule subject"),
      row("m = 27", eSubj, "0", "'PERSON'", "'gazetteer'", "0.85",
        s"lower($eSubj)", "'character'", "1.0", "FALSE", "arrival subject"),
      row("m = 27", ePlace, s"length($eSubj) + 12",
        "'PLACE'", "'gazetteer'", "0.85", s"lower($ePlace)", "'place'",
        "1.0", "FALSE", "arrival place"),
      row("m = 27", "'Third Age'",
        s"length($eSubj) + 12 + length($ePlace) + 13 + length(CAST(ya AS VARCHAR)) + 8",
        "'UNKNOWN'", "'heuristic'", "0.7", "NULL", "'unknown'", "0.0",
        "TRUE", "arrival 'Third Age' span"),
      row("m = 28", eSubj, "0", "'PERSON'", "'gazetteer'", "0.85",
        s"lower($eSubj)", "'character'", "1.0", "FALSE",
        "multi-sentence subject"),
      row("m = 28", eObjC, s"length($eSubj) + 5",
        "'PERSON'", "'gazetteer'", "0.85", s"lower($eObjC)", "'character'",
        "1.0", "FALSE", "first mention of the repeated character"),
      row("m = 28", eObjC, s"length($eSubj) + 5 + length($eObjC) + 2",
        "'PERSON'", "'gazetteer'", "0.85", s"lower($eObjC)", "'character'",
        "1.0", "FALSE", "second mention (sentence 2 subject)"),
      row("m = 28", eThird,
        s"length($eSubj) + 5 + 2 * length($eObjC) + 10",
        "'PERSON'", "'gazetteer'", "0.85", s"lower($eThird)", "'character'",
        "1.0", "FALSE", "third character"))
    s"entity_rows AS (\n${branches.mkString("\n  UNION ALL\n")}\n)"
  }

  /** Expected cluster assignment (node -> cluster) of the dynamic
    * canonicalization. Components on the synthetic corpus are stars of
    * diameter <= 2 (char + its alias token + its fuzzy typo), so two
    * min-label propagation rounds compute the exact fixpoint. The fuzzy
    * edge exists iff ratio = 2(n-1)/(2n-1) >= 0.90 <=> n >= 6
    * (LinkerSpec/CanonicalizeSpec assert no other pair reaches 0.90).
    * Requires entityRowsCte.
    */
  private def clusterCteAt(typoEdgeFilter: String): String =
    s"""nodes AS (SELECT DISTINCT lower(text) AS node FROM entity_rows),
       |e0 AS (
       |  SELECT lower($eSubj) AS src, lower($eAlias) AS dst
       |  FROM syn WHERE m BETWEEN 15 AND 16
       |  UNION
       |  SELECT lower($eTypo) AS src, lower($eSubj) AS dst
       |  FROM syn WHERE m = 14$typoEdgeFilter
       |    AND lower($eSubj) IN (SELECT node FROM nodes)
       |),
       |sym AS (SELECT src AS a, dst AS b FROM e0
       |        UNION SELECT dst AS a, src AS b FROM e0),
       |l1 AS (
       |  SELECT node, min(x) AS c FROM (
       |    SELECT node, node AS x FROM nodes
       |    UNION ALL SELECT a AS node, b AS x FROM sym
       |  ) GROUP BY node
       |),
       |l2 AS (
       |  SELECT node, min(x) AS cluster FROM (
       |    SELECT node, c AS x FROM l1
       |    UNION ALL
       |    SELECT s.a AS node, l.c AS x FROM sym s JOIN l1 l ON l.node = s.b
       |  ) GROUP BY node
       |)""".stripMargin

  val clusterCte: String = clusterCteAt(s" AND length($eSubj) >= 6")

  /** Cross-book variant of [[clusterCte]]: fuzzy threshold 0.85 (X3), so
    * EVERY typo merges — ratio 2(n-1)/(2n-1) >= 0.85 for all n >= 4, and
    * all planted names have n >= 4.
    */
  val clusterCte85: String = clusterCteAt("")

  /** Expected dialogue lines (V1/V3 outcome on the planted templates):
    * tiers 1-2 (m=11..13, conf 0.9), tier 4 (m=23 even, conf 0.4, no verb),
    * tier 3 (m=23 odd, conf 0.7).
    */
  val dialogueCte: String =
    s"""dlg AS (
       |  SELECT doc_id, pos,
       |    CASE WHEN m = 11 THEN 'We must ride to ' || $ePlace || ' at dawn,'
       |         WHEN m = 12 THEN 'How do we get to ' || $ePlace || ' at dawn?'
       |         ELSE 'All is well in ' || $ePlace || '.' END AS quote,
       |    $eSubj AS speaker,
       |    CASE WHEN m = 12 THEN 'asked' ELSE 'said' END AS speech_verb,
       |    CAST(0.9 AS DOUBLE) AS attribution_confidence,
       |    (m = 12) AS is_question,
       |    FALSE AS is_exclamation
       |  FROM syn WHERE m BETWEEN 11 AND 13
       |  UNION ALL
       |  SELECT doc_id, pos,
       |    CASE WHEN v % 4 = 0 THEN 'I''ll tarry here, aye.'
       |         WHEN v % 4 = 2 THEN 'Who goes there?'
       |         ELSE 'We shall see.' END AS quote,
       |    CASE WHEN v % 4 = 2 THEN NULL ELSE $eSubj END AS speaker,
       |    CASE WHEN v % 2 = 1 THEN 'said' END AS speech_verb,
       |    CAST(CASE WHEN v % 4 = 0 THEN 0.4 WHEN v % 4 = 2 THEN 0.0
       |         ELSE 0.7 END AS DOUBLE),
       |    (v % 4 = 2), FALSE
       |  FROM syn WHERE m = 23
       |)""".stripMargin

  /** Expected events (E5/E6 outcome): planted verbs that are also event
    * verbs — traveled(1), fought(2), met(3), killed(5) — plus the temporal
    * 'returned' rows carrying year + THIRD_AGE.
    */
  val eventRowsCte: String = {
    val agent = s"CASE WHEN m = 14 THEN $eTypo ELSE $eSubj END"
    val action = sqlElem(Seq("", "traveled", "fought", "met", "", "killed", "", ""), "v")
    val patient = s"CASE WHEN v = 1 THEN 'to ' || $ePlace ELSE $eObjC END"
    s"""event_rows AS (
       |  SELECT doc_id, pos,
       |    lower(replace($agent || '_' || $action || '_' || $patient, ' ', '_')) AS event_id,
       |    $agent AS agent, $action AS action, $patient AS patient,
       |    CAST(NULL AS INT) AS year, CAST(NULL AS VARCHAR) AS era,
       |    CAST(0.6 AS DOUBLE) AS confidence
       |  FROM syn WHERE (m <= 10 OR m = 14) AND v IN (1, 2, 3, 5)
       |  UNION ALL
       |  SELECT doc_id, pos,
       |    lower(replace($eSubj || '_returned_to ' || $ePlace, ' ', '_')) AS event_id,
       |    $eSubj, 'returned', 'to ' || $ePlace, y, 'THIRD_AGE',
       |    CAST(0.6 AS DOUBLE)
       |  FROM syn WHERE m = 17
       |  UNION ALL
       |  SELECT doc_id, pos,
       |    lower(replace($eSubj || '_arrived_in ' || $ePlace, ' ', '_')) AS event_id,
       |    $eSubj, 'arrived', 'in ' || $ePlace, ya, 'THIRD_AGE',
       |    CAST(0.6 AS DOUBLE)
       |  FROM syn WHERE m = 27
       |  UNION ALL
       |  SELECT doc_id, pos,
       |    lower($eSubj || '_met_' || $eObjC) AS event_id,
       |    $eSubj, 'met', $eObjC, CAST(NULL AS INT), CAST(NULL AS VARCHAR),
       |    CAST(0.6 AS DOUBLE)
       |  FROM syn WHERE m = 28
       |)""".stripMargin
  }

  /** Expected triples: doc_id, pos, subject_id, predicate, object_id.
    * m=27 arrival rows ("X arrived in P ...") yield TRAVELED_TO via the
    * surface form "arrived" in the verb lexicon.
    */
  val tripleRowsCte: String =
    s"""triple_rows AS (
       |  SELECT doc_id, pos,
       |         lower($eSubj) AS subject_id,
       |         $ePred AS predicate,
       |         lower($eObj) AS object_id
       |  FROM syn WHERE m <= 10 OR m = 14
       |  UNION ALL
       |  SELECT doc_id, pos, lower($eSubj), 'TRAVELED_TO', lower($ePlace)
       |  FROM syn WHERE m = 27
       |  UNION ALL
       |  SELECT doc_id, pos, lower($eSubj), 'MET', lower($eObjC)
       |  FROM syn WHERE m = 28
       |  UNION ALL
       |  SELECT doc_id, pos, lower($eObjC), 'HELPED', lower($eThird)
       |  FROM syn WHERE m = 28
       |)""".stripMargin

  /** Vertex table derived from entity_rows (the q32/q48 oracles' view of
    * Pipeline.vertices): id = canonical id or new_<slug>, label = type,
    * cname = lowercased canonical name (for the q48 containment match,
    * writer.py:771-772). For linked rows the registry display name lowers
    * to the canonical id by construction (Seeds: id =
    * lowercase(canonical_name)), so canonical_id is its exact surrogate;
    * new rows take min over the raw mention texts like
    * Pipeline.vertices' min(coalesce(canonical_name, text)).
    */
  val vertexRowsCte: String =
    """vertex_rows AS (
      |  SELECT coalesce(canonical_id,
      |      'new_' || regexp_replace(lower(trim(text)), '[^a-z0-9]+', '_', 'g')) AS id,
      |    entity_type AS label,
      |    lower(min(CASE WHEN canonical_id IS NOT NULL
      |                   THEN canonical_id ELSE text END)) AS cname
      |  FROM entity_rows
      |  GROUP BY 1, 2
      |)""".stripMargin

  /** Corpus-level distinct world rules (the lore checker's rule cache,
    * reference checker.py:221-235 over the bible's deduped rules): one row
    * per distinct lower(rule text). Derived from the planted W2 matches
    * (see q31's per-passage oracle for the derivation rationale).
    */
  val ruleRowsCte: String =
    s"""rule_rows AS (
       |  SELECT DISTINCT lower(rule_text) AS rule_text, category FROM (
       |    SELECT 'We must ride to ' || $ePlace || ' at dawn' AS rule_text,
       |           'themes' AS category FROM syn WHERE m = 11
       |    UNION ALL
       |    SELECT 'All is well in ' || $ePlace, 'themes' FROM syn WHERE m = 13
       |    UNION ALL
       |    SELECT $eSubj || ' was born in the ' || $eEraB || ' Age', 'history'
       |    FROM syn WHERE m = 20
       |    UNION ALL
       |    SELECT 'We shall see', 'themes' FROM syn WHERE m = 23 AND v % 2 = 1
       |    UNION ALL
       |    SELECT 'Only the wizards of ' || $ePlace || ' can weave such spells',
       |           'magic' FROM syn WHERE m = 26 AND v % 2 = 0
       |    UNION ALL
       |    SELECT $eSubj || ' cannot wield such magic openly', 'magic'
       |    FROM syn WHERE m = 26 AND v % 2 = 1
       |  )
       |)""".stripMargin

  /** Expected timeline (E12 outcome): planted characters carry a birth era
    * (m=20) and a death era (m=21), both pure functions of the character;
    * LIVED-pattern artifacts ("was born", "<Char> perished", "year NNNN")
    * are included with first-seen-by-(doc_id, pos) semantics — the engine's
    * deterministic, order-independent stand-in for the reference's
    * text-order processing (temporal.py:294-346).
    */
  val timelineCte: String =
    s"""birth AS (
       |  SELECT $eSubj AS name,
       |         CASE WHEN s % 2 = 0 THEN 'SECOND_AGE' ELSE 'THIRD_AGE' END AS era
       |  FROM syn WHERE m = 20 GROUP BY 1, 2
       |),
       |death AS (
       |  SELECT $eSubj AS name,
       |         CASE WHEN s % 2 = 0 THEN 'THIRD_AGE' ELSE 'FOURTH_AGE' END AS era
       |  FROM syn WHERE m = 21 GROUP BY 1, 2
       |),
       |lived0 AS (
       |  SELECT 'was born' AS name,
       |         CASE WHEN s % 2 = 0 THEN 'SECOND_AGE' ELSE 'THIRD_AGE' END AS era,
       |         doc_id, pos
       |  FROM syn WHERE m = 20
       |  UNION ALL
       |  SELECT $eSubj || ' perished',
       |         CASE WHEN s % 2 = 0 THEN 'THIRD_AGE' ELSE 'FOURTH_AGE' END,
       |         doc_id, pos
       |  FROM syn WHERE m = 21
       |  UNION ALL
       |  SELECT 'year ' || y, 'THIRD_AGE', doc_id, pos FROM syn WHERE m = 17
       |  UNION ALL
       |  SELECT 'year ' || ya, 'THIRD_AGE', doc_id, pos FROM syn WHERE m = 27
       |),
       |lived AS (
       |  SELECT name, arg_min(era, doc_id || '#' || lpad(CAST(pos AS VARCHAR), 19, '0')) AS era
       |  FROM lived0
       |  WHERE lower(name) NOT IN (SELECT lower(name) FROM birth
       |                            UNION SELECT lower(name) FROM death)
       |  GROUP BY name
       |),
       |timeline_rows AS (
       |  SELECT coalesce(b.name, d.name) AS name,
       |         b.era AS birth_era, d.era AS death_era
       |  FROM birth b FULL OUTER JOIN death d ON lower(b.name) = lower(d.name)
       |  UNION ALL
       |  SELECT name, era, era FROM lived
       |)""".stripMargin

}

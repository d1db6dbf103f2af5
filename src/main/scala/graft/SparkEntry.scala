package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.{DocsSynth, Passages}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SQL-expressible operator has a `queries` entry and a matching
  * DuckDB `oracleSql` entry; column names are aliased identically on both
  * sides (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query (character conversation graph) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q08_char_graph")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_passages" -> ((s, dir) =>
      Passages.fromDocs(DocsSynth.docs(s, dir))
        .select("doc_id", "pos", "kind", "text", "media_ref", "offset")),
    "q02_span_invariant" -> ((s, dir) =>
      Passages.validate(
        Passages.fromDocs(DocsSynth.docs(s, dir)),
        DocsSynth.spanRows(s, dir))),
    "q03_mentions" -> ((s, dir) =>
      Pipeline.mentions(s, dir)
        .select("doc_id", "pos", "text", "start", "label", "source",
          "confidence")),
    "q04_linked" -> ((s, dir) =>
      Pipeline.linked(s, dir)
        .select(col("doc_id"), col("pos"), col("text"), col("canonical_id"),
          col("entity_type"),
          col("link_confidence"),
          col("is_new"))),
    "q05_entity_mentions" -> ((s, dir) =>
      Pipeline.linked(s, dir)
        .filter(col("canonical_id").isNotNull)
        .groupBy("canonical_id", "entity_type")
        .agg(count(lit(1)).as("mention_count"))),
    "q06_triples" -> ((s, dir) =>
      Pipeline.triples(s, dir)
        .select("doc_id", "pos", "subject_id", "predicate", "object_id",
          "confidence")),
    "q07_edges" -> ((s, dir) => Pipeline.edges(s, dir)),
    "q08_char_graph" -> ((s, dir) => Pipeline.charGraph(s, dir)),
    "q09_clusters" -> ((s, dir) =>
      graft.extract.Canonicalize.clusters(
        s, Pipeline.textual(s, dir), Pipeline.mentions(s, dir))._1),
    "q10_cluster_registry" -> ((s, dir) => {
      val mentions = Pipeline.mentions(s, dir).localCheckpoint(true)
      val (assignment, _) = graft.extract.Canonicalize.clusters(
        s, Pipeline.textual(s, dir), mentions)
      graft.extract.Canonicalize.registry(s, mentions, assignment)
    }),
    "q11_dialogue" -> ((s, dir) =>
      graft.voice.Dialogue.fromPassages(s, Pipeline.textual(s, dir))
        .select("doc_id", "pos", "quote", "speaker", "speech_verb",
          "attribution_confidence", "is_question", "is_exclamation")),
    "q12_voice_profiles" -> ((s, dir) =>
      graft.voice.Dialogue.voiceProfiles(s,
        graft.voice.Dialogue.fromPassages(s, Pipeline.textual(s, dir)).toDF())),
    "q13_style_doc" -> ((s, dir) => {
      val txt = Pipeline.textual(s, dir)
      val metrics = graft.style.Metrics.sentenceMetrics(txt, col("text"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("sentences"),
          sum(col("word_count").cast("long")).as("words"),
          sum(col("char_count").cast("long")).as("chars"))
      val dlg = graft.voice.Dialogue.fromPassages(s, txt)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("quotes"),
          sum(when(col("is_question"), 1L).otherwise(0L)).as("question_quotes"),
          sum(col("quote_chars").cast("long")).as("qchars"))
      metrics.join(dlg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("sentences"), col("words"),
          coalesce(col("quotes"), lit(0L)).as("quotes"),
          coalesce(col("question_quotes"), lit(0L)).as("question_quotes"),
          (coalesce(col("qchars"), lit(0L)).cast("double")
            / col("chars")).as("dialogue_ratio"))
    }),
    "q14_readability" -> ((s, dir) =>
      graft.style.Metrics.readability(
        s, Pipeline.textual(s, dir), Seq("doc_id"))
        .select("doc_id", "sentences", "words", "syllables",
          "complex_words", "flesch", "fk_grade", "gunning_fog")),
    "q15_events" -> ((s, dir) =>
      graft.lore.Events.fromPassages(s, Pipeline.textual(s, dir))
        .select("doc_id", "pos", "event_id", "agent", "action", "patient",
          "year", "era", "confidence")),
    "q16_event_order" -> ((s, dir) =>
      graft.lore.Events.inferOrdering(
        graft.lore.Events.fromPassages(s, Pipeline.textual(s, dir)).toDF())),
    "q17_media_meta" -> ((s, dir) =>
      graft.media.Media.metadata(s, Pipeline.passages(s, dir))
        .select("doc_id", "pos", "media_ref", "width", "height", "format")),
    "q18_dedup_exact" -> ((s, dir) =>
      graft.text.Dedup.exactGroups(Pipeline.textual(s, dir), col("text"))),
    "q19_dedup_ngram" -> ((s, dir) =>
      graft.text.Dedup.consecutiveJaccard(docsTable(s, dir), "doc_id", "text")),
    "q20_langid" -> ((s, dir) =>
      graft.text.TextAnalysis.langId(docsTable(s, dir), col("text"))
        .select("doc_id", "predicted_lang", "lang_score")),
    "q21_quality" -> ((s, dir) =>
      graft.text.TextAnalysis.quality(docsTable(s, dir), col("text"))
        .select("doc_id", "words", "avg_word_len", "punct_ratio",
          "stopword_ratio", "quality_score")),
    "q22_tokens" -> ((s, dir) =>
      graft.text.TextAnalysis.tokenCounts(docsTable(s, dir), col("text"))
        .select("doc_id", "ws_tokens", "regex_tokens")),
    "q23_fingerprint" -> ((s, dir) =>
      graft.text.TextAnalysis.fingerprint(
        docsTable(s, dir), col("doc_id"), col("text"))),
    "q24_ann_topk" -> ((s, dir) =>
      graft.ml.Similarity.bruteForceTopK(embTable(s, dir))),
    "q25_embedding_neardup" -> ((s, dir) =>
      graft.ml.Similarity.nearDupPairs(embTable(s, dir), 0.4)),
    "q26_minhash_dups" -> ((s, dir) =>
      graft.text.Dedup.minhashNearDups(s, docsTable(s, dir), "doc_id", "text")),
    "q27_simhash_dups" -> ((s, dir) =>
      graft.text.Dedup.simhashNearDups(s, docsTable(s, dir), "doc_id", "text",
        maxHamming = 6)),
    "q28_ann_lsh" -> ((s, dir) =>
      graft.ml.Similarity.lshTopK(embTable(s, dir), dim = 64)),
    "q33_distinctive_words" -> ((s, dir) =>
      graft.voice.Profiles.distinctiveWords(
        graft.voice.Dialogue.fromPassages(s, Pipeline.textual(s, dir)).toDF())),
    "q34_classifier" -> ((s, dir) =>
      graft.style.Classifier.classifyPassages(s, Pipeline.textual(s, dir))),
    "q35_signature_phrases" -> ((s, dir) =>
      graft.voice.Profiles.signaturePhrases(
        graft.voice.Dialogue.fromPassages(s, Pipeline.textual(s, dir)).toDF())),
    "q36_burrows_delta" -> ((s, dir) => {
      val sents = Pipeline.textual(s, dir)
        .withColumn("corpus",
          pmod(substring(col("doc_id"), 5, 18).cast("long"), lit(2L)))
      graft.style.Fingerprint.burrowsDelta(
        graft.style.Fingerprint.functionWordZScores(sents, "corpus", "text"))
    }),
    "q37_crossbook" -> ((s, dir) =>
      graft.corpus.CrossBook.resolveAll(s,
        Pipeline.textual(s, dir), Pipeline.mentions(s, dir),
        pmod(substring(col("doc_id"), 5, 18).cast("long"), lit(4L)))._1),
    "q38_top_entities" -> ((s, dir) => {
      val mentions = Pipeline.mentions(s, dir).localCheckpoint(true)
      val (assignment, _) = graft.extract.Canonicalize.clusters(
        s, Pipeline.textual(s, dir), mentions)
      graft.extract.Canonicalize.registry(s, mentions, assignment)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("mention_count").desc, col("cluster").asc)))
        .filter(col("rank") <= 10)
        .select("rank", "cluster", "mention_count")
    }),
    "q39_sample_quotes" -> ((s, dir) =>
      graft.voice.Profiles.sampleQuotes(
        graft.voice.Dialogue.fromPassages(s, Pipeline.textual(s, dir)).toDF())),
    "q30_worldbible_cat" -> ((s, dir) =>
      graft.worldbible.WorldBible.categories(s, Pipeline.textual(s, dir))),
    "q31_worldbible_rules" -> ((s, dir) =>
      graft.worldbible.WorldBible.worldRules(s, Pipeline.textual(s, dir))),
    "q32_lore_checks" -> ((s, dir) =>
      graft.lore.Checker.checkRelationships(s,
        loreClaims.map(graft.lore.Checker.parse), Pipeline.edges(s, dir))),
    // raw-text splitter round trip: re-splitting the reconstructed doc
    // (paragraph-joined spans) must reproduce the span texts exactly
    "q29_split_roundtrip" -> ((s, dir) => {
      val txt = Pipeline.docs(s, dir).select(col("doc_id"),
        array_join(expr(
          "transform(filter(spans, x -> x.text <> ''), x -> x.text)"),
          "\n\n").as("t"))
      graft.ingest.Splitter.split(s, txt, "doc_id", "t")
        .select("doc_id", "passage_id", "text", "chapter_num",
          "paragraph_num", "sentence_num")
    })
  )

  /** Fixed lore-check claim battery (q32): parsed by Checker.parse and
    * checked against the edge table; the oracle re-derives the expected
    * verdicts from the same parse results over triple_rows.
    */
  val loreClaims: Seq[String] = Seq(
    "Gandalf spoke with Bilbo",
    "Bilbo traveled to Rivendell",
    "Thorin killed Smaug",
    "Gandalf never met Saruman",
    "Frodo visited Bree",
    "Boromir fought Gollum",
    "Zorro spoke with Gandalf")

  private def docsTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def embTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  def oracleSql: Map[String, String] = {
    val withEntities = (sel: String) =>
      Oracles.overSyn(s", ${Oracles.entityRowsCte}\n$sel")
    val withTriples = (sel: String) =>
      Oracles.overSyn(s", ${Oracles.tripleRowsCte}\n$sel")
    val withClusters = (sel: String) =>
      Oracles.overSyn(
        s", ${Oracles.entityRowsCte},\n${Oracles.clusterCte}\n$sel")
    val withDialogue = (sel: String) =>
      Oracles.overSyn(s", ${Oracles.dialogueCte}\n$sel")
    val withClusters85 = (sel: String) =>
      Oracles.overSyn(
        s", ${Oracles.entityRowsCte},\n${Oracles.clusterCte85}\n$sel")
    val withEvents = (sel: String) =>
      Oracles.overSyn(s", ${Oracles.eventRowsCte}\n$sel")
    Map(
      "q01_passages" -> Oracles.overSyn(
        "SELECT doc_id, pos, kind, text, media_ref, \"offset\" FROM syn"),
      "q02_span_invariant" -> Oracles.overSyn(
        "SELECT DISTINCT doc_id, TRUE AS ok FROM syn"),
      "q03_mentions" -> withEntities(
        """SELECT doc_id, pos, text, start, label, source, confidence
          |FROM entity_rows""".stripMargin),
      "q04_linked" -> withEntities(
        """SELECT doc_id, pos, text, canonical_id, entity_type,
          |       link_confidence, is_new
          |FROM entity_rows""".stripMargin),
      "q05_entity_mentions" -> withEntities(
        """SELECT canonical_id, entity_type, count(*) AS mention_count
          |FROM entity_rows WHERE canonical_id IS NOT NULL
          |GROUP BY 1, 2""".stripMargin),
      "q06_triples" -> withTriples(
        """SELECT doc_id, pos, subject_id, predicate, object_id,
          |       CAST(0.7 AS DOUBLE) AS confidence
          |FROM triple_rows""".stripMargin),
      "q07_edges" -> withTriples(
        """SELECT subject_id AS src, object_id AS dst, predicate AS type,
          |       count(*) AS mention_count,
          |       count(DISTINCT doc_id || '|' || pos) AS num_passages
          |FROM triple_rows GROUP BY 1, 2, 3""".stripMargin),
      "q08_char_graph" -> withTriples(
        """SELECT subject_id AS src, object_id AS dst,
          |       count(*) AS conversations
          |FROM triple_rows
          |WHERE predicate IN ('SPOKE_TO', 'SPOKE_WITH')
          |GROUP BY 1, 2""".stripMargin),
      "q09_clusters" -> withClusters(
        "SELECT node, cluster FROM l2"),
      "q10_cluster_registry" -> withClusters(
        """SELECT l2.cluster,
          |       arg_min(er.text, er.doc_id || '#' || lpad(CAST(er.pos AS VARCHAR), 6, '0')
          |               || '#' || lpad(CAST(er.start AS VARCHAR), 6, '0')) AS canonical_name,
          |       count(DISTINCT l2.node) AS member_count,
          |       count(*) AS mention_count
          |FROM entity_rows er
          |JOIN l2 ON l2.node = lower(er.text)
          |GROUP BY 1""".stripMargin),
      "q11_dialogue" -> withDialogue(
        """SELECT doc_id, pos, quote, speaker, speech_verb,
          |       attribution_confidence, is_question, is_exclamation
          |FROM dlg""".stripMargin),
      "q12_voice_profiles" -> withDialogue(
        """SELECT speaker, count(*) AS total_lines,
          |       CAST(sum(CASE WHEN is_question THEN 1 ELSE 0 END) AS BIGINT) AS questions,
          |       CAST(sum(CASE WHEN is_exclamation THEN 1 ELSE 0 END) AS BIGINT) AS exclamations,
          |       CAST(sum(CASE WHEN NOT is_question AND NOT is_exclamation THEN 1 ELSE 0 END) AS BIGINT) AS statements,
          |       avg(len(regexp_split_to_array(trim(quote), '\s+'))) AS avg_words,
          |       CAST(sum(len(regexp_split_to_array(trim(quote), '\s+'))) AS BIGINT) AS total_words
          |FROM dlg GROUP BY 1 HAVING count(*) >= 3""".stripMargin),
      "q13_style_doc" -> withDialogue(
        """SELECT s.doc_id,
          |       count(*) AS sentences,
          |       CAST(sum(len(regexp_split_to_array(trim(s.text), '\s+'))) AS BIGINT) AS words,
          |       CAST(coalesce(any_value(d.quotes), 0) AS BIGINT) AS quotes,
          |       CAST(coalesce(any_value(d.question_quotes), 0) AS BIGINT) AS question_quotes,
          |       (coalesce(any_value(d.qchars), 0)::DOUBLE / sum(length(s.text)))
          |         AS dialogue_ratio
          |FROM syn s
          |LEFT JOIN (SELECT doc_id, count(*) AS quotes,
          |                  CAST(sum(CASE WHEN is_question THEN 1 ELSE 0 END) AS BIGINT) AS question_quotes,
          |                  sum(length(quote)) AS qchars
          |           FROM dlg GROUP BY 1) d ON d.doc_id = s.doc_id
          |WHERE s.kind <> 'media'
          |GROUP BY 1""".stripMargin),
      "q15_events" -> withEvents(
        """SELECT doc_id, pos, event_id, agent, action, patient, year, era,
          |       confidence
          |FROM event_rows""".stripMargin),
      "q16_event_order" -> withEvents(
        """SELECT doc_id,
          |       lag(event_id) OVER w AS event1_id,
          |       event_id AS event2_id,
          |       'BEFORE' AS relation,
          |       CAST(0.9 AS DOUBLE) AS confidence
          |FROM event_rows WHERE year IS NOT NULL
          |WINDOW w AS (PARTITION BY doc_id ORDER BY year, pos)
          |QUALIFY lag(event_id) OVER w IS NOT NULL AND lag(year) OVER w <> year""".stripMargin),
      "q17_media_meta" -> Oracles.overSyn(
        """SELECT doc_id, pos, media_ref,
          |       CAST(64 + (length(media_ref) % 8) * 16 AS INT) AS width,
          |       CAST(48 + (length(media_ref) % 5) * 32 AS INT) AS height,
          |       'png' AS format
          |FROM syn WHERE kind = 'media'""".stripMargin),
      "q18_dedup_exact" -> Oracles.overSyn(
        """SELECT md5(text) AS text_hash, count(*) AS cnt
          |FROM syn WHERE kind <> 'media'
          |GROUP BY 1 HAVING count(*) > 1""".stripMargin),
      "q19_dedup_ngram" ->
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          |s AS (SELECT doc_id,
          |        CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
          |             ELSE list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
          |                                 for i in range(1, len(ws) - 1)]) END AS sh
          |      FROM t)
          |SELECT a.doc_id, b.doc_id AS next_doc_id,
          |       len(list_intersect(a.sh, b.sh))::DOUBLE
          |           / len(list_distinct(a.sh || b.sh)) AS jaccard
          |FROM s a JOIN s b ON b.doc_id = a.doc_id + 1""".stripMargin,
      "q20_langid" -> Oracles.langIdSql,
      "q21_quality" -> Oracles.qualitySql,
      "q22_tokens" ->
        """SELECT doc_id,
          |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
          |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INT) AS ws_tokens,
          |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS INT) AS regex_tokens
          |FROM documents""".stripMargin,
      "q23_fingerprint" ->
        """SELECT doc_id,
          |       CAST(sum(i * (('0x' || substring(md5(w), 1, 8))::BIGINT)) AS BIGINT) AS fingerprint
          |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w,
          |             generate_subscripts(string_split(text, ' '), 1) AS i
          |      FROM documents)
          |GROUP BY 1""".stripMargin,
      "q24_ann_topk" ->
        """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
          |           FROM embeddings WHERE vec_id < 20),
          |s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
          |             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS cos
          |      FROM embeddings e, q WHERE e.vec_id <> q.query_id)
          |SELECT query_id, CAST(rank_big AS INT) AS rank, neighbor_id FROM (
          |  SELECT query_id, neighbor_id,
          |         row_number() OVER (PARTITION BY query_id
          |                            ORDER BY cos DESC, neighbor_id) AS rank_big
          |  FROM s) WHERE rank_big <= 5""".stripMargin,
      "q33_distinctive_words" -> withDialogue(
        """, words AS (
          |  SELECT speaker, unnest(regexp_split_to_array(lower(quote), '\s+')) AS word
          |  FROM dlg
          |), counts AS (
          |  SELECT speaker, word, count(*) AS cnt FROM words
          |  WHERE length(word) > 0 GROUP BY 1, 2
          |), totals AS (SELECT speaker, sum(cnt) AS char_total FROM counts GROUP BY 1),
          |ns AS (SELECT count(DISTINCT speaker) AS n FROM counts),
          |dfreq AS (SELECT word, count(*) AS speakers_using FROM counts GROUP BY 1)
          |SELECT speaker, CAST(rank AS INT) AS rank, word FROM (
          |  SELECT c.speaker, c.word,
          |    row_number() OVER (PARTITION BY c.speaker ORDER BY
          |      ((c.cnt::DOUBLE / t.char_total)
          |       / (1.0 + (d.speakers_using - 1)::DOUBLE / ns.n)) DESC,
          |      c.word ASC) AS rank
          |  FROM counts c JOIN totals t USING (speaker)
          |       JOIN dfreq d USING (word), ns
          |  WHERE c.cnt >= 2
          |) WHERE rank <= 10""".stripMargin),
      "q37_crossbook" -> withClusters85(
        """SELECT l2.cluster AS entity,
          |       count(DISTINCT (CAST(substring(er.doc_id, 5) AS BIGINT) % 4))
          |         AS books_appeared,
          |       count(*) AS total_mentions,
          |       count(DISTINCT l2.node) AS member_count
          |FROM entity_rows er JOIN l2 ON l2.node = lower(er.text)
          |GROUP BY 1""".stripMargin),
      "q38_top_entities" -> withClusters(
        """SELECT CAST(rank_big AS INT) AS rank, cluster, mention_count FROM (
          |  SELECT cluster, mention_count,
          |         row_number() OVER (ORDER BY mention_count DESC, cluster ASC) AS rank_big
          |  FROM (
          |    SELECT l2.cluster, count(*) AS mention_count
          |    FROM entity_rows er JOIN l2 ON l2.node = lower(er.text)
          |    GROUP BY 1)
          |) WHERE rank_big <= 10""".stripMargin),
      "q39_sample_quotes" -> withDialogue(
        """SELECT speaker, qtype, quote FROM (
          |  SELECT speaker, qtype, quote,
          |         row_number() OVER (PARTITION BY speaker, qtype
          |                            ORDER BY quality DESC, quote ASC) AS rn
          |  FROM (SELECT speaker,
          |          CASE WHEN is_question THEN 'question'
          |               WHEN is_exclamation THEN 'exclamation'
          |               ELSE 'statement' END AS qtype,
          |          quote,
          |          CASE WHEN len(regexp_split_to_array(trim(quote), '\s+')) BETWEEN 5 AND 20 THEN 1.0
          |               WHEN len(regexp_split_to_array(trim(quote), '\s+')) BETWEEN 3 AND 30 THEN 0.5
          |               ELSE 0.1 END AS quality
          |        FROM dlg)
          |) WHERE rn = 1""".stripMargin),
      "q30_worldbible_cat" -> Oracles.overSyn(
        """SELECT doc_id, pos, 'geography' AS category,
          |       CAST(0.2 AS DOUBLE) AS score
          |FROM syn WHERE (m <= 10 OR m = 14) AND v = 1
          |UNION ALL
          |SELECT doc_id, pos, 'creatures', CAST(0.2 AS DOUBLE)
          |FROM syn WHERE (m <= 10 OR m = 14) AND v = 7
          |UNION ALL
          |SELECT doc_id, pos, 'themes', CAST(0.5 AS DOUBLE)
          |FROM syn WHERE m = 11 OR m = 13 OR (m = 23 AND v % 2 = 1)
          |UNION ALL
          |SELECT doc_id, pos, 'history',
          |       CAST(0.4 AS DOUBLE) + CAST(0.2 AS DOUBLE)
          |FROM syn WHERE m = 17 OR m = 27
          |UNION ALL
          |SELECT doc_id, pos, 'history', CAST(0.7 AS DOUBLE)
          |FROM syn WHERE m = 20
          |UNION ALL
          |SELECT doc_id, pos, 'history',
          |       CAST(CASE WHEN s % 2 = 0 THEN 0.4 ELSE 0.2 END AS DOUBLE)
          |FROM syn WHERE m = 21
          |UNION ALL
          |SELECT doc_id, pos, 'geography', CAST(0.2 AS DOUBLE)
          |FROM syn WHERE m = 24
          |UNION ALL
          |SELECT doc_id, pos, 'culture', CAST(0.6 AS DOUBLE)
          |FROM syn WHERE m = 25
          |UNION ALL
          |SELECT doc_id, pos, 'creatures', CAST(0.2 AS DOUBLE)
          |FROM syn WHERE m = 25 AND p % 6 = 4
          |UNION ALL
          |SELECT doc_id, pos, 'magic', CAST(0.2 AS DOUBLE)
          |FROM syn WHERE m = 25 AND p % 6 = 5
          |UNION ALL
          |SELECT doc_id, pos, 'magic',
          |       CAST(CASE WHEN v % 2 = 0 THEN 1.0 ELSE 0.5 END AS DOUBLE)
          |FROM syn WHERE m = 26""".stripMargin),
      "q31_worldbible_rules" -> Oracles.overSyn(
        s"""SELECT doc_id, pos, 'capability' AS pattern_name,
           |       'We must ride to ' || ${Oracles.ePlace} || ' at dawn' AS rule_text,
           |       'themes' AS category
           |FROM syn WHERE m = 11
           |UNION ALL
           |SELECT doc_id, pos, 'definition',
           |       'All is well in ' || ${Oracles.ePlace}, 'themes'
           |FROM syn WHERE m = 13
           |UNION ALL
           |SELECT doc_id, pos, 'definition',
           |       ${Oracles.eSubj} || ' was born in the ' || ${Oracles.eEraB} || ' Age',
           |       'history'
           |FROM syn WHERE m = 20
           |UNION ALL
           |SELECT doc_id, pos, 'capability', 'We shall see', 'themes'
           |FROM syn WHERE m = 23 AND v % 2 = 1
           |UNION ALL
           |SELECT doc_id, pos, 'capability',
           |       'Only the wizards of ' || ${Oracles.ePlace} || ' can weave such spells',
           |       'magic'
           |FROM syn WHERE m = 26 AND v % 2 = 0
           |UNION ALL
           |SELECT doc_id, pos, 'capability',
           |       ${Oracles.eSubj} || ' cannot wield such magic openly', 'magic'
           |FROM syn WHERE m = 26 AND v % 2 = 1""".stripMargin),
      "q32_lore_checks" -> withTriples(loreClaims.map { text =>
        val c = graft.lore.Checker.parse(text)
        val et = graft.lore.Checker.PredicateToEdgeType.getOrElse(
          c.predicate.get.toLowerCase,
          c.predicate.get.toUpperCase.replace(" ", "_"))
        val subj = c.subject.get.toLowerCase.replace("'", "''")
        val obj = c.obj.get.toLowerCase.replace("'", "''")
        val verdict = if (c.negated) "INVALID" else "VALID"
        s"""  SELECT '${text.replace("'", "''")}' AS claim,
           |    CASE WHEN ev > 0 THEN '$verdict' ELSE 'UNSUPPORTED' END AS status,
           |    ev AS evidence
           |  FROM (SELECT count(*) AS ev FROM triple_rows
           |        WHERE predicate = '$et'
           |          AND subject_id LIKE '%$subj%'
           |          AND object_id LIKE '%$obj%')""".stripMargin
      }.mkString("\nUNION ALL\n")),
      "q29_split_roundtrip" -> Oracles.overSyn(
        """SELECT doc_id,
          |       'p_' || doc_id || '_c1_p' || k || '_s1' AS passage_id,
          |       text,
          |       1 AS chapter_num, CAST(k AS INT) AS paragraph_num,
          |       1 AS sentence_num
          |FROM (SELECT doc_id, text,
          |             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS k
          |      FROM syn WHERE text <> '')""".stripMargin),
      "q25_embedding_neardup" ->
        """SELECT * FROM (
          |  SELECT a.vec_id AS a, b.vec_id AS b,
          |         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
          |                                      CAST(b.embedding AS DOUBLE[])), 4) AS cos
          |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          |) WHERE cos >= 0.4""".stripMargin
    )
  }
}

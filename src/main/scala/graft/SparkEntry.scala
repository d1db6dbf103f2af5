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
      Pipeline.passages(s, dir)
        .select("doc_id", "pos", "kind", "text", "media_ref", "offset")),
    "q02_span_invariant" -> ((s, dir) =>
      Passages.validate(
        Pipeline.passages(s, dir),
        Pipeline.spanRows(s, dir))),
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
    "q09_clusters" -> ((s, dir) => Pipeline.clusterAssignment(s, dir)),
    "q10_cluster_registry" -> ((s, dir) =>
      graft.extract.Canonicalize.registryFromNodes(
        Pipeline.registryNodes(s, dir))),
    "q11_dialogue" -> ((s, dir) =>
      Pipeline.dialogue(s, dir)
        .select("doc_id", "pos", "quote", "speaker", "speech_verb",
          "attribution_confidence", "is_question", "is_exclamation")),
    "q12_voice_profiles" -> ((s, dir) =>
      Pipeline.voiceProfiles(s, dir)
        .select("speaker", "total_lines", "questions", "exclamations",
          "statements", "avg_words", "utterance_std", "min_words",
          "max_words", "total_words", "total_chars", "unique_words",
          "type_token_ratio", "avg_word_len", "contraction_ratio",
          "first_person_ratio", "second_person_ratio", "archaism_count")),
    // V10 compare_voices (round-5 review: SQL-expressible but previously
    // unit-covered only); doubles floor-4dp'd for the oracle compare
    "q56_compare_voices" -> ((s, dir) => {
      val f4 = graft.style.Metrics.floor4 _
      graft.voice.Profiles.compareVoices(Pipeline.voiceProfiles(s, dir))
        .select(col("speaker_a"), col("speaker_b"),
          f4(col("utterance_length_diff")).as("utterance_length_diff"),
          f4(col("question_ratio_diff")).as("question_ratio_diff"),
          f4(col("type_token_ratio_diff")).as("type_token_ratio_diff"),
          f4(col("contraction_ratio_diff")).as("contraction_ratio_diff"),
          f4(col("similarity")).as("similarity"))
    }),
    "q41_voice_stats" -> ((s, dir) =>
      graft.voice.Dialogue.voiceStats(s, Pipeline.dialogue(s, dir),
        preProfiles = Some(Pipeline.voiceProfiles(s, dir)))),
    "q42_top_words" -> ((s, dir) =>
      graft.voice.Profiles.topWordsFromCounts(
        Pipeline.dialogueWordCounts(s, dir))),
    "q13_style_doc" -> ((s, dir) => {
      val txt = Pipeline.textual(s, dir)
      val metrics = graft.style.Metrics.sentenceMetrics(txt, col("text"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("sentences"),
          sum(col("word_count").cast("long")).as("words"),
          sum(col("char_count").cast("long")).as("chars"))
      val dlg = Pipeline.dialogue(s, dir)
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
      Pipeline.events(s, dir)
        .select("doc_id", "pos", "event_id", "agent", "action", "patient",
          "year", "era", "confidence")),
    "q16_event_order" -> ((s, dir) =>
      graft.lore.Events.inferOrdering(Pipeline.events(s, dir))),
    "q17_media_meta" -> ((s, dir) =>
      graft.media.Media.metadata(s, Pipeline.passages(s, dir))
        .select("doc_id", "pos", "media_ref", "width", "height", "format")),
    "q18_dedup_exact" -> ((s, dir) =>
      graft.text.Dedup.exactGroups(Pipeline.textual(s, dir), col("text"))),
    "q19_dedup_ngram" -> ((s, dir) =>
      graft.text.Dedup.consecutiveJaccard(docsTable(s, dir), "doc_id", "text",
        pinnedShingles = Some(Pipeline.shingles(s, dir)))),
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
      graft.text.Dedup.minhashNearDups(s, docsTable(s, dir), "doc_id", "text",
        pinnedShingles = Some(Pipeline.shingles(s, dir)))),
    "q27_simhash_dups" -> ((s, dir) =>
      graft.text.Dedup.simhashNearDups(s, docsTable(s, dir), "doc_id", "text",
        maxHamming = 6)),
    "q28_ann_lsh" -> ((s, dir) =>
      graft.ml.Similarity.lshTopK(embTable(s, dir), dim = 64)),
    // IVF scale path (coarse-quantizer cells + nprobe search), registered
    // at its EXACT DEGENERATION (nprobe = nlist): the full machinery runs
    // — Lloyd training, cell assignment, probe-table broadcast join,
    // per-query rerank window — and probing every cell makes the result
    // provably equal to brute force, so the row is fully oracle-checkable
    // (VERDICT r04 #1; shares q24's brute-force SQL). The approximate
    // nprobe < nlist path stays covered by SimilaritySpec's recall-floor
    // and partial-scan assertions — its results legitimately vary with the
    // input partition layout, so it has no DuckDB-expressible oracle.
    "q53_ann_ivf" -> ((s, dir) =>
      graft.ml.Similarity.ivfTopK(embTable(s, dir), nprobe = 16)),
    "q33_distinctive_words" -> ((s, dir) =>
      graft.voice.Profiles.distinctiveWordsFromCounts(
        Pipeline.dialogueWordCounts(s, dir))),
    "q34_classifier" -> ((s, dir) =>
      Pipeline.classified(s, dir)),
    "q35_signature_phrases" -> ((s, dir) =>
      graft.voice.Profiles.signaturePhrases(Pipeline.dialogue(s, dir))),
    "q36_burrows_delta" -> ((s, dir) => {
      val sents = Pipeline.textual(s, dir)
        .withColumn("corpus",
          pmod(substring(col("doc_id"), 5, 18).cast("long"), lit(2L)))
      graft.style.Fingerprint.burrowsDelta(
        graft.style.Fingerprint.functionWordZScores(sents, "corpus", "text"))
        .select(col("corpus_a"), col("corpus_b"),
          graft.style.Metrics.floor4(col("delta")).as("delta"))
    }),
    "q37_crossbook" -> ((s, dir) =>
      graft.corpus.CrossBook.resolveAll(s,
        Pipeline.textual(s, dir), Pipeline.linked(s, dir),
        pmod(substring(col("doc_id"), 5, 18).cast("long"), lit(4L)),
        pinnedAliasPairs = Some(Pipeline.aliasPairs(s, dir)),
        pinnedCoocEdges = Some(Pipeline.coocEdges(s, dir)))._1),
    "q38_top_entities" -> ((s, dir) => {
      // top-k idiom: TakeOrderedAndProject narrows to 10 rows BEFORE the
      // (unavoidable) global rank window runs — no full-table single
      // partition at scale (round-1 VERDICT.md issue #6)
      graft.extract.Canonicalize.registryFromNodes(
        Pipeline.registryNodes(s, dir))
        .orderBy(col("mention_count").desc, col("cluster").asc)
        .limit(10)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("mention_count").desc, col("cluster").asc)))
        .select("rank", "cluster", "mention_count")
    }),
    "q39_sample_quotes" -> ((s, dir) =>
      graft.voice.Profiles.sampleQuotes(Pipeline.dialogue(s, dir))),
    "q30_worldbible_cat" -> ((s, dir) => Pipeline.wbCategories(s, dir)),
    "q31_worldbible_rules" -> ((s, dir) => Pipeline.wbRules(s, dir)),
    "q32_lore_checks" -> ((s, dir) => {
      graft.lore.Checker.checkAll(s, loreClaims,
        Pipeline.edges(s, dir),
        Pipeline.vertices(s, dir).select("id", "label"),
        graft.worldbible.WorldBible.rulesTableFrom(Pipeline.wbRules(s, dir)),
        Pipeline.timeline(s, dir),
        Pipeline.events(s, dir))
    }),
    "q46_mentioned_in" -> ((s, dir) =>
      graft.graph.Materialize.mentionedInEdges(Pipeline.linked(s, dir))),
    "q47_dialogue_edges" -> ((s, dir) =>
      graft.graph.Materialize.dialogueGraph(s, Pipeline.dialogue(s, dir))
        ._2),
    "q48_event_links" -> ((s, dir) =>
      graft.graph.Materialize.eventEntityLinks(
        Pipeline.events(s, dir),
        Pipeline.vertices(s, dir).select("id", "label", "canonical_name"))),
    "q49_fingerprint" -> ((s, dir) =>
      graft.style.Fingerprint.assemble(s,
        Pipeline.textual(s, dir)
          .withColumn("corpus",
            pmod(substring(col("doc_id"), 5, 18).cast("long"), lit(2L))),
        "corpus", preClassified = Some(Pipeline.classified(s, dir)))),
    "q50_word_lengths" -> ((s, dir) =>
      graft.style.Fingerprint.wordLengthDistribution(
        Pipeline.textual(s, dir)
          .withColumn("corpus",
            pmod(substring(col("doc_id"), 5, 18).cast("long"), lit(2L))),
        "corpus")),
    "q43_cultures" -> ((s, dir) =>
      graft.worldbible.WorldBible.cultures(s, Pipeline.textual(s, dir),
        Some(Pipeline.wbCategories(s, dir)))
        .select("people", "name", "passages")),
    "q44_magic" -> ((s, dir) =>
      graft.worldbible.WorldBible.magicPassages(s, Pipeline.textual(s, dir),
        Some(Pipeline.wbCategories(s, dir)))),
    "q45_geography" -> ((s, dir) =>
      graft.worldbible.WorldBible.geography(s, Pipeline.textual(s, dir),
        Some(Pipeline.wbCategories(s, dir)))),
    "q40_timeline" -> ((s, dir) =>
      Pipeline.timeline(s, dir)
        .select("name", "birth_era", "death_era")),
    // X5 consolidation: three same-passage mentions per lineitem row —
    // "<Name>", "<Name> Took" (both character) and "<Name> Field" (place).
    // cooc>=3 + containment merges <Name> <-> "<Name> Took", which the
    // cross-book fuzzy tier alone MISSES (indel ratio 0.67 < 0.85, and the
    // (first char, |len diff| <= 3) blocking never even pairs them); the
    // place variant shares the containment but not the type, so the X5
    // type constraint keeps it a separate entity.
    "q51_consolidation" -> ((s, dir) => {
      val nameCol = element_at(typedlit(q51Names),
        pmod(col("l_orderkey"), lit(20)).cast("int") + 1)
      // lineitem is one parquet split at small SF — spread the narrow
      // mention synthesis across cores (same rationale as Pipeline.textual)
      val base = s.read.parquet(s"$dir/lineitem.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(
          concat(lit("c"), col("l_orderkey")).as("doc_id"),
          col("l_linenumber").cast("int").as("pos"),
          pmod(col("l_orderkey"), lit(4)).as("book"),
          nameCol.as("nm"))
      val ments = base.select(col("doc_id"), col("pos"), col("book"),
          explode(array(
            struct(col("nm").as("text"), lit("character").as("entity_type")),
            struct(concat(col("nm"), lit(" Took")).as("text"),
              lit("character").as("entity_type")),
            struct(concat(col("nm"), lit(" Field")).as("text"),
              lit("place").as("entity_type")))).as("mn"))
        .select(col("doc_id"), col("pos"), col("book"),
          col("mn.text").as("text"), col("mn.entity_type").as("entity_type"))
      graft.corpus.CrossBook
        .resolveAll(s, Pipeline.textual(s, dir), ments, col("book"),
          pinnedAliasPairs = Some(Pipeline.aliasPairs(s, dir)))._1
    }),
    // E13 explicit ORDER relations surfaced as a table: deterministic
    // passages with before/after/followed statements synthesized from
    // lineitem; the oracle re-runs the ORDER regexes in DuckDB. (The main
    // corpus plants no ORDER statements, so this is the query that
    // exercises Temporal.relations end-to-end — VERDICT r02 missing #4.)
    "q52_temporal_relations" -> ((s, dir) => {
      def nm(off: Int) = element_at(typedlit(q51Names),
        pmod(col("l_orderkey") + off, lit(20)).cast("int") + 1)
      // one parquet split at small SF: spread the regex scan across cores
      val passages = s.read.parquet(s"$dir/lineitem.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .select(
          concat(lit("t"), col("l_orderkey")).as("doc_id"),
          col("l_linenumber").cast("int").as("pos"),
          concat(nm(0), lit(" came before "), nm(1), lit(". "),
            nm(2), lit(" followed "), nm(3), lit(".")).as("text"))
      graft.lore.Temporal.relations(s, passages)
    }),
    // streaming batch twins over the driver's events stream table: the
    // same transform functions run under readStream (EventStreamSpec
    // asserts stream == batch); here they run in batch mode against the
    // DuckDB oracle
    "q54_event_windows" -> ((s, dir) =>
      graft.streaming.EventStream.windowedCounts(
        s.read.parquet(s"$dir/events.parquet"))),
    "q55_event_sessions" -> ((s, dir) =>
      graft.streaming.EventStream.sessionizeBatch(
        s.read.parquet(s"$dir/events.parquet"))),
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

  /** Fixed lore-check claim battery (q32), spanning all seven claim types
    * of the reference's checker (checker.py:255-296). The oracle is
    * HAND-WRITTEN: every claim's expected parse (type, subject, predicate,
    * object, value, era, event sides, negation) is an authored literal in
    * [[OracleClaim]] below — NOT produced by Checker.parse — and the
    * verdict is derived in DuckDB from the planted corpus, so a parser or
    * checker regression cannot go unnoticed (round-1 VERDICT.md issue #1).
    */
  val loreClaims: Seq[String] = Seq(
    // relationship (Q5) with rules fallback (Q10)
    "Gandalf traveled to Mirkwood",
    "Thorin killed Smaug",
    "Boromir fought Gollum",
    "Gandalf fought Frodo, not truly",
    "Gandalf never met Saruman",
    "Zorro spoke with Gandalf",
    "Bilbo visited Bree",
    "Gandalf met Bilbo, perhaps",
    // entity existence (Q4)
    "Gandalf is a character",
    "Rivendell is a place",
    "Smaug is a wizard",
    "Zorro is a wizard",
    // attribute support heuristics (Q10)
    "Gandalf was born",
    "Bilbo was weary",
    // temporal over the E12 timeline (Q6)
    "Gandalf during the Third Age",
    "Gandalf during the Fourth Age",
    "Thorin during the First Age",
    "Bilbo during the Fourth Age",
    "Zorro during the Second Age",
    // location rules scan (Q9)
    "Moria is near Rivendell",
    "Zanzibar is in Atlantis",
    // capability rules scan (Q9)
    "Gandalf can wield magic",
    // event ordering (Q7)
    "Gandalf arrived Moria before Balin",
    "Smaug arrived Erebor before Bilbo",
    "Gandalf killed Frodo before Thorin",
    "Gandalf arrived Hobbiton after Bilbo",
    // parser-branch battery (VERDICT r04 #6): the time-period and
    // uncertainty branches of parser.py:136-165, oracle-checked
    "Gandalf traveled to Mirkwood, in the Third Age",
    "Balin of the First Age",
    "Bilbo might have visited Esgaroth",
    "Gandalf possibly met Bilbo",
    "Gandalf met Bilbo, probably",
    // subject-less temporal: the time pattern fires but no leading
    // capitalized run exists, so the parse carries no subject — the
    // reference's _check_temporal returns its initialized UNKNOWN result
    // (checker.py:634-637); previously this claim produced NO verdict row
    // (round-5 review)
    "the elves of the Second Age",
    // unparseable -> general rules fallback
    "Perhaps beyond the misty mountains")

  /** Hand-authored expected parse of one battery claim (the q32 oracle's
    * ground truth; see [[loreClaims]]).
    */
  private[graft] final case class OracleClaim(
      text: String,
      ctype: String,
      subj: String = null,
      et: String = null, // mapped edge type (relationship)
      obj: String = null,
      value: String = null,
      negated: Boolean = false,
      eraOrd: Int = -1, // claimed era order (temporal)
      a1: String = null, stem1: String = null, p1: String = null,
      a2: String = null, stem2: String = null, p2: String = null,
      claimed: String = null, // claimed ordering (event_order)
      // raw claim event phrases "a1 act1 p1 a2 act2 p2" (unstemmed, as
      // parsed) — the Q8 confidence's claim side (checker.py:779-782)
      evClaimText: String = null)

  /** The authored parses, 1:1 with [[loreClaims]]. */
  private[graft] val oracleClaims: Seq[OracleClaim] = Seq(
    OracleClaim("Gandalf traveled to Mirkwood", "relationship",
      subj = "gandalf", et = "TRAVELED_TO", obj = "mirkwood"),
    OracleClaim("Thorin killed Smaug", "relationship",
      subj = "thorin", et = "KILLED", obj = "smaug"),
    OracleClaim("Boromir fought Gollum", "relationship",
      subj = "boromir", et = "FOUGHT", obj = "gollum"),
    // the parser's two-word subject group stops at the comma; "not truly"
    // sets the negation flag -> INVALID on positive evidence
    OracleClaim("Gandalf fought Frodo, not truly", "relationship",
      subj = "gandalf", et = "FOUGHT", obj = "frodo", negated = true),
    // reference quirk: the greedy subject group swallows "never"
    OracleClaim("Gandalf never met Saruman", "relationship",
      subj = "gandalf never", et = "INTERACTED_WITH", obj = "saruman",
      negated = true),
    OracleClaim("Zorro spoke with Gandalf", "relationship",
      subj = "zorro", et = "SPOKE_TO", obj = "gandalf"),
    // reference quirk: visited maps to TRAVELED_TO (checker.py:442)
    OracleClaim("Bilbo visited Bree", "relationship",
      subj = "bilbo", et = "TRAVELED_TO", obj = "bree"),
    OracleClaim("Gandalf met Bilbo, perhaps", "relationship",
      subj = "gandalf", et = "INTERACTED_WITH", obj = "bilbo"),
    OracleClaim("Gandalf is a character", "entity_exists",
      subj = "gandalf", value = "character"),
    OracleClaim("Rivendell is a place", "entity_exists",
      subj = "rivendell", value = "place"),
    OracleClaim("Smaug is a wizard", "entity_exists",
      subj = "smaug", value = "wizard"),
    OracleClaim("Zorro is a wizard", "entity_exists",
      subj = "zorro", value = "wizard"),
    OracleClaim("Gandalf was born", "attribute",
      subj = "gandalf", value = "born"),
    OracleClaim("Bilbo was weary", "attribute",
      subj = "bilbo", value = "weary"),
    // era orders use the full scale incl. tree years (temporal.py:47-58):
    // FIRST=2, SECOND=3, THIRD=4, FOURTH=5
    OracleClaim("Gandalf during the Third Age", "temporal",
      subj = "gandalf", eraOrd = 4),
    OracleClaim("Gandalf during the Fourth Age", "temporal",
      subj = "gandalf", eraOrd = 5),
    OracleClaim("Thorin during the First Age", "temporal",
      subj = "thorin", eraOrd = 2),
    OracleClaim("Bilbo during the Fourth Age", "temporal",
      subj = "bilbo", eraOrd = 5),
    OracleClaim("Zorro during the Second Age", "temporal",
      subj = "zorro", eraOrd = 3),
    OracleClaim("Moria is near Rivendell", "location",
      subj = "moria", obj = "rivendell"),
    OracleClaim("Zanzibar is in Atlantis", "location",
      subj = "zanzibar", obj = "atlantis"),
    OracleClaim("Gandalf can wield magic", "capability",
      subj = "gandalf", value = "wield magic"),
    OracleClaim("Gandalf arrived Moria before Balin", "event_order",
      a1 = "gandalf", stem1 = "arriv", p1 = "moria",
      a2 = "balin", stem2 = "arriv", p2 = "moria", claimed = "before",
      evClaimText = "Gandalf arrived Moria Balin arrived Moria"),
    OracleClaim("Smaug arrived Erebor before Bilbo", "event_order",
      a1 = "smaug", stem1 = "arriv", p1 = "erebor",
      a2 = "bilbo", stem2 = "arriv", p2 = "erebor", claimed = "before",
      evClaimText = "Smaug arrived Erebor Bilbo arrived Erebor"),
    OracleClaim("Gandalf killed Frodo before Thorin", "event_order",
      a1 = "gandalf", stem1 = "kill", p1 = "frodo",
      a2 = "thorin", stem2 = "kill", p2 = "frodo", claimed = "before",
      evClaimText = "Gandalf killed Frodo Thorin killed Frodo"),
    OracleClaim("Gandalf arrived Hobbiton after Bilbo", "event_order",
      a1 = "gandalf", stem1 = "arriv", p1 = "hobbiton",
      a2 = "bilbo", stem2 = "arriv", p2 = "hobbiton", claimed = "after",
      evClaimText = "Gandalf arrived Hobbiton Bilbo arrived Hobbiton"),
    // --- parser-branch battery (VERDICT r04 #6) ---
    // the TIME pattern fires ("in the Third Age") AND the relationship
    // cascade wins the claim type, exactly as in the reference (the comma
    // stops the greedy object group at "Mirkwood"; _check_relationship
    // ignores the parsed time_period) -> same VALID row as the bare claim
    OracleClaim("Gandalf traveled to Mirkwood, in the Third Age",
      "relationship", subj = "gandalf", et = "TRAVELED_TO", obj = "mirkwood"),
    // pure time-period fallback via the "of" alternation; subject from the
    // leading capitalized run; First Age (ord 2) precedes every planted
    // birth era, so the timeline yields a deterministic verdict
    OracleClaim("Balin of the First Age", "temporal",
      subj = "balin", eraOrd = 2),
    // uncertainty branch ("might have") + reference quirk: the modal
    // phrase is swallowed by the greedy subject group, so there is no
    // edge evidence and the claim falls to the rules scan
    OracleClaim("Bilbo might have visited Esgaroth", "relationship",
      subj = "might have", et = "TRAVELED_TO", obj = "esgaroth"),
    // mid-sentence uncertainty adverb: same greedy-subject swallow family
    // as "Gandalf never met Saruman" above
    OracleClaim("Gandalf possibly met Bilbo", "relationship",
      subj = "gandalf possibly", et = "INTERACTED_WITH", obj = "bilbo"),
    // uncertainty suffix after the comma: `uncertain` is parse-only state
    // in the reference (checker.py never reads it), so the verdict equals
    // the unmarked claim's — demonstrated as an oracle row
    OracleClaim("Gandalf met Bilbo, probably", "relationship",
      subj = "gandalf", et = "INTERACTED_WITH", obj = "bilbo"),
    // TEMPORAL with no subject (no leading capitalized run): the verdict
    // is the checker's initialized UNKNOWN result, statically
    OracleClaim("the elves of the Second Age", "temporal"),
    OracleClaim("Perhaps beyond the misty mountains", "unknown"))

  private def sq(s: String): String = s.replace("'", "''")

  /** q51 synthetic names: 20 distinct first letters so the blocked fuzzy
    * join has zero candidate pairs across families, and length 5 vs the
    * 10/11-char variants so within-family pairs miss the |len| <= 3 band —
    * the X5 merges are attributable to the consolidation edges alone.
    */
  private[graft] val q51Names: Seq[String] = ('A' to 'T').map(c => s"${c}aron")

  // one SQL string-escaping implementation repo-wide (round-5 review)
  private def sqlStrList(xs: Seq[String]): String = Lexicon.sqlList(xs)

  private def voiceStopSql: String = sqlStrList(Lexicon.VoiceStopWords)

  /** Full V5 voice-profile oracle select (over the dlg CTE) — mirrors
    * Dialogue.voiceProfiles' word semantics in DuckDB list functions.
    * Split as CTE chain + final select so q56 can wrap the profile
    * derivation as its own CTE.
    */
  private def voiceProfileOracleSelect: String =
    voiceProfileCtes + "\n" + voiceProfileFinalSelect

  private def voiceProfileCtes: String = {
    val strip = """regexp_replace(w, '^[.,!?"'']+|[.,!?"'']+$', '', 'g')"""
    val stripLen = """regexp_replace(w, '^[.,!?"''-]+|[.,!?"''-]+$', '', 'g')"""
    val contr = Lexicon.ContractionPatterns
      .map(pt => s"w LIKE '%${sq(pt)}%'").mkString(" OR ")
    s""", words AS (
       |  SELECT speaker, is_question, is_exclamation, quote,
       |         regexp_split_to_array(trim(lower(quote)), '\\s+') AS ws
       |  FROM dlg WHERE speaker IS NOT NULL
       |), lines AS (
       |  SELECT speaker, is_question, is_exclamation, quote, len(ws) AS wc,
       |    len(list_filter(ws, w -> $contr)) AS contr,
       |    len(list_filter(list_transform(ws, w -> $strip),
       |        w -> list_contains(${sqlStrList(Lexicon.FirstPersonWords)}, w))) AS fp,
       |    len(list_filter(list_transform(ws, w -> $strip),
       |        w -> list_contains(${sqlStrList(Lexicon.SecondPersonWords)}, w))) AS sp,
       |    len(list_filter(ws,
       |        w -> list_contains(${sqlStrList(Lexicon.VoiceArchaisms)}, w))) AS arch,
       |    list_sum(list_transform(ws, w -> length($stripLen))) AS wlen
       |  FROM words
       |), uniqw AS (
       |  SELECT speaker, CAST(count(DISTINCT w) AS BIGINT) AS unique_words
       |  FROM (SELECT speaker, unnest(ws) AS w FROM words) GROUP BY 1
       |), per AS (
       |  SELECT speaker, count(*) AS total_lines,
       |    CAST(sum(CASE WHEN is_question THEN 1 ELSE 0 END) AS BIGINT) AS questions,
       |    CAST(sum(CASE WHEN is_exclamation THEN 1 ELSE 0 END) AS BIGINT) AS exclamations,
       |    CAST(sum(CASE WHEN NOT is_question AND NOT is_exclamation THEN 1 ELSE 0 END) AS BIGINT) AS statements,
       |    floor(avg(wc) * 10000 + 0.5) / 10000.0 AS avg_words,
       |    floor(coalesce(stddev_samp(wc), 0.0) * 10000 + 0.5) / 10000.0 AS utterance_std,
       |    CAST(min(wc) AS INT) AS min_words,
       |    CAST(max(wc) AS INT) AS max_words,
       |    CAST(sum(wc) AS BIGINT) AS total_words,
       |    CAST(sum(length(quote)) AS BIGINT) AS total_chars,
       |    CAST(sum(contr) AS BIGINT) AS contractions,
       |    CAST(sum(fp) AS BIGINT) AS first_person,
       |    CAST(sum(sp) AS BIGINT) AS second_person,
       |    CAST(sum(arch) AS BIGINT) AS archaism_count,
       |    sum(wlen) AS wlen_sum
       |  FROM lines GROUP BY 1 HAVING count(*) >= 3
       |)""".stripMargin
  }

  private def voiceProfileFinalSelect: String =
    s"""SELECT p.speaker, total_lines, questions, exclamations, statements,
       |  avg_words, utterance_std, min_words, max_words, total_words,
       |  total_chars, u.unique_words,
       |  floor(u.unique_words::DOUBLE / total_words * 10000 + 0.5) / 10000.0 AS type_token_ratio,
       |  floor(wlen_sum::DOUBLE / total_words * 10000 + 0.5) / 10000.0 AS avg_word_len,
       |  floor(contractions::DOUBLE / total_words * 10000 + 0.5) / 10000.0 AS contraction_ratio,
       |  floor(first_person::DOUBLE / total_words * 10000 + 0.5) / 10000.0 AS first_person_ratio,
       |  floor(second_person::DOUBLE / total_words * 10000 + 0.5) / 10000.0 AS second_person_ratio,
       |  archaism_count
       |FROM per p JOIN uniqw u USING (speaker)""".stripMargin

  /** q56 oracle: the V10 pairwise voice comparison over the q12 profile
    * derivation wrapped as a CTE — same 4-diff blend as
    * Profiles.compareVoices, floor-4dp on both sides.
    */
  private def compareVoicesOracleSql: String = {
    def f4(x: String) = s"floor(($x) * 10000 + 0.5) / 10000.0"
    val d1 = "abs(a.avg_words - b.avg_words) / 20.0"
    val d2 = "abs(a.questions::DOUBLE / a.total_lines - b.questions::DOUBLE / b.total_lines)"
    val d3 = "abs(a.type_token_ratio - b.type_token_ratio)"
    val d4 = "abs(a.contraction_ratio - b.contraction_ratio)"
    s"""$voiceProfileCtes, prof AS (
       |$voiceProfileFinalSelect
       |)
       |SELECT a.speaker AS speaker_a, b.speaker AS speaker_b,
       |  ${f4(d1)} AS utterance_length_diff,
       |  ${f4(d2)} AS question_ratio_diff,
       |  ${f4(d3)} AS type_token_ratio_diff,
       |  ${f4(d4)} AS contraction_ratio_diff,
       |  ${f4(s"1.0 - (($d1) + ($d2) + ($d3) + ($d4)) / 4.0")} AS similarity
       |FROM prof a JOIN prof b ON a.speaker < b.speaker""".stripMargin
  }

  private val eraOrdSql: String => String = col =>
    s"""CASE $col WHEN 'BEFORE_TIME' THEN 0 WHEN 'YEARS_OF_TREES' THEN 1
       | WHEN 'FIRST_AGE' THEN 2 WHEN 'SECOND_AGE' THEN 3
       | WHEN 'THIRD_AGE' THEN 4 WHEN 'FOURTH_AGE' THEN 5 END""".stripMargin
      .replace("\n", "")

  /** One oracle SQL branch per battery claim — the verdict derivation per
    * claim type mirrors Checker's semantics over the planted-data CTEs.
    */
  private def claimBranchSql(c: OracleClaim): String = c.ctype match {
    case "relationship" =>
      val verdict = if (c.negated) "INVALID" else "VALID"
      s"""SELECT '${sq(c.text)}' AS claim, 'relationship' AS claim_type,
         |  CASE WHEN ev > 0 THEN '$verdict'
         |       WHEN rev > 0 THEN 'PLAUSIBLE' ELSE 'UNKNOWN' END AS status,
         |  CAST(CASE WHEN ev > 0 THEN ev ELSE rev END AS BIGINT) AS evidence,
         |  CAST(NULL AS VARCHAR) AS suggestion,
         |  CASE WHEN ev > 0 THEN 0.95 WHEN rev > 0 THEN 0.4
         |       ELSE 0.0 END AS confidence
         |FROM (SELECT
         |  (SELECT count(*) FROM triple_rows WHERE predicate = '${c.et}'
         |     AND subject_id LIKE '%${sq(c.subj)}%'
         |     AND object_id LIKE '%${sq(c.obj)}%') AS ev,
         |  (SELECT count(*) FROM rule_rows
         |     WHERE rule_text LIKE '%${sq(c.subj)}%'
         |        OR rule_text LIKE '%${sq(c.obj)}%') AS rev)""".stripMargin
    case "entity_exists" =>
      s"""SELECT '${sq(c.text)}', 'entity_exists',
         |  CASE WHEN tm > 0 THEN 'VALID' ELSE 'UNKNOWN' END,
         |  CAST(ev AS BIGINT), CAST(NULL AS VARCHAR),
         |  CASE WHEN tm > 0 THEN 0.9 ELSE 0.0 END
         |FROM (SELECT
         |  (SELECT count(*) FROM vertex_rows
         |     WHERE id LIKE '%${sq(c.subj)}%') AS ev,
         |  (SELECT count(*) FROM vertex_rows
         |     WHERE id LIKE '%${sq(c.subj)}%'
         |       AND label LIKE '%${sq(c.value)}%') AS tm)""".stripMargin
    case "attribute" =>
      val ev =
        if (c.negated) "0"
        else s"""(SELECT count(*) FROM rule_rows
                |   WHERE rule_text LIKE '%${sq(c.subj)}%'
                |     AND rule_text LIKE '%${sq(c.value)}%')""".stripMargin
      s"""SELECT '${sq(c.text)}', 'attribute',
         |  CASE WHEN ev > 0 THEN 'VALID' ELSE 'UNKNOWN' END,
         |  CAST(ev AS BIGINT), CAST(NULL AS VARCHAR),
         |  CASE WHEN ev > 0 THEN 0.8 ELSE 0.0 END
         |FROM (SELECT $ev AS ev)""".stripMargin
    case "temporal" if c.subj == null =>
      // subject-less parse: checker returns the initialized UNKNOWN result
      s"""SELECT '${sq(c.text)}', 'temporal', 'UNKNOWN',
         |  CAST(0 AS BIGINT), CAST(NULL AS VARCHAR), 0.0""".stripMargin
    case "temporal" =>
      s"""SELECT '${sq(c.text)}', 'temporal',
         |  CASE WHEN cnt = 0 THEN 'UNKNOWN'
         |       WHEN lo IS NOT NULL AND ${c.eraOrd} < lo THEN 'INVALID'
         |       WHEN hi IS NOT NULL AND ${c.eraOrd} > hi THEN 'INVALID'
         |       WHEN lo IS NOT NULL AND hi IS NOT NULL THEN 'VALID'
         |       ELSE 'UNKNOWN' END,
         |  CAST(cnt AS BIGINT), CAST(NULL AS VARCHAR),
         |  CASE WHEN cnt = 0 THEN 0.0
         |       WHEN lo IS NOT NULL AND ${c.eraOrd} < lo THEN 0.9
         |       WHEN hi IS NOT NULL AND ${c.eraOrd} > hi THEN 0.9
         |       WHEN lo IS NOT NULL AND hi IS NOT NULL THEN 0.9
         |       ELSE 0.0 END
         |FROM (SELECT count(*) AS cnt,
         |        any_value(${eraOrdSql("birth_era")}) AS lo,
         |        any_value(${eraOrdSql("death_era")}) AS hi
         |      FROM timeline_rows WHERE lower(name) = '${sq(c.subj)}')""".stripMargin
    case "capability" =>
      s"""SELECT '${sq(c.text)}', 'capability',
         |  CASE WHEN ev1 + ev2 > 0 THEN 'PLAUSIBLE' ELSE 'UNKNOWN' END,
         |  CAST(ev1 + ev2 AS BIGINT), CAST(NULL AS VARCHAR),
         |  CASE WHEN ev1 + ev2 > 0 THEN 0.6 ELSE 0.0 END
         |FROM (SELECT
         |  (SELECT count(*) FROM rule_rows
         |     WHERE rule_text LIKE '%${sq(c.subj)}%'
         |        OR rule_text LIKE '%${sq(c.value)}%') AS ev1,
         |  (SELECT count(*) FROM rule_rows
         |     WHERE rule_text LIKE '%${sq(c.subj)}%'
         |        OR rule_text LIKE '%can%') AS ev2)""".stripMargin
    case "location" | "unknown" =>
      val terms = Seq(Option(c.subj), Option(c.obj), Option(c.value)).flatten
      val ev =
        if (terms.isEmpty) "0"
        else s"""(SELECT count(*) FROM rule_rows WHERE ${terms
          .map(t => s"rule_text LIKE '%${sq(t)}%'").mkString(" OR ")})"""
      s"""SELECT '${sq(c.text)}', '${c.ctype}',
         |  CASE WHEN ev > 0 THEN 'PLAUSIBLE' ELSE 'UNKNOWN' END,
         |  CAST(ev AS BIGINT), CAST(NULL AS VARCHAR),
         |  CASE WHEN ev > 0 THEN 0.4 ELSE 0.0 END
         |FROM (SELECT $ev AS ev)""".stripMargin
    case "event_order" =>
      def cond(a: String, st: String, p: String): String =
        s"""(lower(agent) LIKE '%${sq(a)}%'
           |   OR '${sq(a)}' LIKE '%' || lower(agent) || '%')
           |  AND lower(action) LIKE '%${sq(st)}%'
           |  AND (pat LIKE '%${sq(p)}%'
           |       OR '${sq(p)}' LIKE '%' || pat || '%')""".stripMargin
      // Q8 confidence: the claim's token set is a compile-time literal;
      // the found side is the two matched events' "agent action patient"
      // descriptions. Same floor-2dp clamp formula as the Spark side.
      val cToks = c.evClaimText.toLowerCase(java.util.Locale.ROOT).split("\\s+").distinct
      val cToksLit = cToks.map(t => s"'${sq(t)}'").mkString("[", ", ", "]")
      val fToks =
        """list_distinct(regexp_split_to_array(lower(d1 || ' ' || d2), '\s+'))"""
      s"""SELECT '${sq(c.text)}', 'event_order',
         |  CASE WHEN m1 = 0 OR m2 = 0 THEN 'UNKNOWN'
         |       WHEN act IS NULL THEN 'UNKNOWN'
         |       WHEN act = '${c.claimed}' THEN 'VALID'
         |       ELSE 'INVALID' END,
         |  CAST(m1 + m2 AS BIGINT),
         |  CASE WHEN m1 > 0 AND m2 > 0 AND act IS NOT NULL
         |            AND act <> '${c.claimed}'
         |       THEN 'Did you mean: ' ||
         |            replace('${sq(c.text)}', '${c.claimed}', act) || '?'
         |  END,
         |  CASE WHEN m1 > 0 AND m2 > 0 AND act IS NOT NULL THEN
         |    floor(greatest(0.5, least(0.95,
         |      (CASE WHEN y1 IS NOT NULL AND y2 IS NOT NULL THEN 0.88
         |            WHEN e1 IS NOT NULL AND e2 IS NOT NULL THEN 0.80
         |            ELSE 0.95 END)
         |      * (len(list_intersect($cToksLit, $fToks))::DOUBLE
         |         / len(list_distinct(list_concat($cToksLit, $fToks))))
         |    )) * 100 + 0.5) / 100.0
         |  ELSE 0.0 END
         |FROM (SELECT m1, m2, e1, e2, y1, y2, d1, d2,
         |    CASE WHEN e1 IS NOT NULL AND e2 IS NOT NULL AND e1 <> e2
         |           THEN CASE WHEN e1 < e2 THEN 'before' ELSE 'after' END
         |         WHEN y1 IS NOT NULL AND y2 IS NOT NULL AND y1 <> y2
         |           THEN CASE WHEN y1 < y2 THEN 'before' ELSE 'after' END
         |    END AS act
         |  FROM (SELECT
         |      count(*) FILTER (${cond(c.a1, c.stem1, c.p1)}) AS m1,
         |      arg_min(eord, k) FILTER (${cond(c.a1, c.stem1, c.p1)}) AS e1,
         |      arg_min(year, k) FILTER (${cond(c.a1, c.stem1, c.p1)}) AS y1,
         |      arg_min(descr, k) FILTER (${cond(c.a1, c.stem1, c.p1)}) AS d1,
         |      count(*) FILTER (${cond(c.a2, c.stem2, c.p2)}) AS m2,
         |      arg_min(eord, k) FILTER (${cond(c.a2, c.stem2, c.p2)}) AS e2,
         |      arg_min(year, k) FILTER (${cond(c.a2, c.stem2, c.p2)}) AS y2,
         |      arg_min(descr, k) FILTER (${cond(c.a2, c.stem2, c.p2)}) AS d2
         |    FROM (SELECT *, ${eraOrdSql("era")} AS eord,
         |            doc_id || '#' || lpad(CAST(pos AS VARCHAR), 19, '0') AS k,
         |            regexp_replace(lower(patient), '^(the|a|an) ', '') AS pat,
         |            agent || ' ' || action || ' ' || patient AS descr
         |          FROM event_rows)))""".stripMargin
  }

  /** The full hand-written q32 oracle. */
  private def loreOracleSql: String =
    Oracles.overSyn(
      s""", ${Oracles.entityRowsCte},
         |${Oracles.tripleRowsCte},
         |${Oracles.ruleRowsCte},
         |${Oracles.eventRowsCte},
         |${Oracles.timelineCte},
         |${Oracles.vertexRowsCte}
         |${oracleClaims.map(claimBranchSql).mkString("\nUNION ALL\n")}""".stripMargin)

  /** q14 readability oracle: the vowel-group syllable heuristic
    * (Metrics.syllables) re-expressed in DuckDB list functions.
    */
  private def readabilityOracleSql: String =
    Oracles.overSyn(readabilityCtes("doc_id", "doc_id") +
      "\nSELECT * FROM readability")

  /** Readability CTEs ending in `readability(<groupAlias>, sentences,
    * words, syllables, complex_words, flesch, fk_grade, gunning_fog)`.
    */
  private def readabilityCtes(groupExpr: String, groupAlias: String): String = {
    // keep ALL letters, not just a-z: Metrics.syllables filters with
    // Character.isLetter, so an accented letter is a (consonant) letter
    // on the engine side — stripping it here would silently diverge the
    // vowel-group count the moment a non-ASCII character enters the
    // corpus (round-5 review; \p{L} is RE2's Unicode letter class)
    val w = """regexp_replace(lower(w0), '[^\p{L}]', '', 'g')"""
    val syll = "CASE WHEN length(w) = 0 THEN 0 ELSE greatest(1, len(regexp_extract_all(w, '[aeiouy]+')) - CASE WHEN w LIKE '%e' AND NOT w LIKE '%le' AND len(regexp_extract_all(w, '[aeiouy]+')) > 1 THEN 1 ELSE 0 END) END"
    (
      s""", toks AS (
         |  SELECT $groupExpr AS $groupAlias, pos,
         |         CASE WHEN length(trim(text)) = 0 THEN 0
         |              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS wc,
         |         list_transform(regexp_split_to_array(trim(text), '\\s+'),
         |                        w0 -> $w) AS ws
         |  FROM syn WHERE kind <> 'media'
         |), sylls AS (
         |  SELECT $groupAlias, pos, wc,
         |    list_sum(list_transform(ws, w -> $syll)) AS syll,
         |    len(list_filter(ws, w -> ($syll) >= 3)) AS cw
         |  FROM toks
         |), readability AS (
         |  SELECT $groupAlias, count(*) AS sentences,
         |    CAST(sum(wc) AS BIGINT) AS words,
         |    CAST(sum(coalesce(syll, 0)) AS BIGINT) AS syllables,
         |    CAST(sum(cw) AS BIGINT) AS complex_words,
         |    floor((206.835 - 1.015 * (sum(wc)::DOUBLE / count(*))
         |          - 84.6 * (sum(coalesce(syll, 0))::DOUBLE / sum(wc))) * 10000 + 0.5) / 10000.0 AS flesch,
         |    floor((0.39 * (sum(wc)::DOUBLE / count(*))
         |          + 11.8 * (sum(coalesce(syll, 0))::DOUBLE / sum(wc)) - 15.59) * 10000 + 0.5) / 10000.0 AS fk_grade,
         |    floor((0.4 * ((sum(wc)::DOUBLE / count(*))
         |          + 100.0 * sum(cw)::DOUBLE / sum(wc))) * 10000 + 0.5) / 10000.0 AS gunning_fog
         |  FROM sylls GROUP BY 1
         |)""".stripMargin)
  }

  /** q34 classifier oracle: the six scorers re-implemented in SQL over the
    * raw text (an independent derivation, not planted-template branches).
    */
  private def classifierOracleSql: String =
    Oracles.overSyn(classifierCtes +
      s"""
         |SELECT p.doc_id, p.pos,
         |  CASE WHEN p.score < 0.5 THEN 'unknown' ELSE p.name END AS primary_type,
         |  floor((CASE WHEN p.score < 0.5 THEN 0.0
         |              WHEN p.total > 0 THEN least(1.0, p.score / p.total)
         |              ELSE 0.0 END) * 10000 + 0.5) / 10000.0 AS confidence,
         |  CASE WHEN sx.score > 0.3 THEN sx.name END AS secondary_type,
         |  floor(p.s0 * 10000 + 0.5) / 10000.0 AS dialogue_score,
         |  floor(p.s1 * 10000 + 0.5) / 10000.0 AS action_score,
         |  floor(p.s2 * 10000 + 0.5) / 10000.0 AS description_score,
         |  floor(p.s3 * 10000 + 0.5) / 10000.0 AS travel_score,
         |  floor(p.s4 * 10000 + 0.5) / 10000.0 AS battle_score,
         |  floor(p.s5 * 10000 + 0.5) / 10000.0 AS reflection_score
         |FROM ranked p JOIN ranked sx
         |  ON p.doc_id = sx.doc_id AND p.pos = sx.pos
         |WHERE p.rn = 1 AND sx.rn = 2""".stripMargin)

  // -------------------------------------------------------------------
  // World-bible oracles (q30/q31/q43/q44/q45): the keyword/regex semantics
  // of WorldBible.classify / extractAll re-implemented in DuckDB over the
  // raw syn.text — independent derivations, not planted-template replays.
  // Match positions come from the regexp_extract_all / regexp_split_to_array
  // pair (cumulative segment lengths); the W4 greedy span-overlap dedup is a
  // recursive-CTE walk over matches sorted by (start, -conf, source
  // order) with string-encoded state ("maxend", chr(30)-joined kept
  // items) — NOT list_reduce, which DuckDB 1.0 both mis-folds for struct
  // accumulators and mis-evaluates in parallel pipelines under memory
  // pressure (observed cross-group row mixing at 32 threads).
  // -------------------------------------------------------------------

  private def wbPat(p: String): String = s"'(?i)${sq(p)}'"

  /** The 8 category names, in CategoryKeywords order (argmax tiebreak). */
  private def wbCatList: String =
    graft.worldbible.WorldBible.CategoryKeywords
      .map(c => s"'${c._1}'").mkString("[", ", ", "]")

  /** Integer keyword-hit counts per category over `col`, as an 8-list —
    * inferCategory's scores (patterns.py:162-177).
    */
  private def wbCtxScores(col: String): String =
    graft.worldbible.WorldBible.CategoryKeywords.map { case (_, ps) =>
      ps.map(p => s"len(regexp_extract_all($col, ${wbPat(p)}))")
        .mkString(" + ")
    }.mkString("[\n      ", ",\n      ", "]")

  /** The per-match struct list for one pattern's matches over `text`:
    * zips regexp_extract_all with the cumulative-length start offsets and
    * (optionally) the ±50-char context, all INSIDE one row expression —
    * the unnest output rows then carry only small scalars. (The earlier
    * shape unnested an index while carrying the ms/parts LIST columns on
    * every exploded row, which ballooned the intermediate enough to push
    * DuckDB 1.0 into an external-aggregation path that returns wrong
    * results under memory pressure at high thread counts.)
    */
  private def wbMatchStructs(withCtx: Boolean): String = {
    val start =
      s"""CAST(coalesce(list_sum(list_transform(parts[1:mi], x -> len(x))), 0)
         |     + coalesce(list_sum(list_transform(ms[1:mi - 1], x -> len(x))), 0)
         |     AS INT)""".stripMargin
    val ctx = if (!withCtx) ""
    else s""",
       |      'ctx': substring(text, greatest(0, z.st - 50) + 1,
       |               least(len(text), z.st + len(ms[z.mi]) + 50)
       |                 - greatest(0, z.st - 50))""".stripMargin
    // two nested transforms: inner computes each start once, outer builds
    // the struct (DuckDB lambdas have no let-binding; lambdas may
    // reference the row's other columns like ms/parts/text)
    s"""list_transform(
       |  list_transform(generate_series(1, len(ms)),
       |                 mi -> {'mi': mi, 'st': $start}),
       |  z -> {'i': z.mi, 't': ms[z.mi], 's': z.st$ctx})""".stripMargin
  }

  /** CTEs wbtext + wbrcat: every rule-pattern match with its span and the
    * category inferred from its ±50-char context (find_rule_matches,
    * patterns.py:141-162). pord is the pattern's position in RulePatterns —
    * the source order for the W4 stable sort.
    */
  private def wbRuleCtes: String = {
    val branches = graft.worldbible.WorldBible.RulePatterns.zipWithIndex
      .map { case ((pat, name), k) =>
        s"""  SELECT doc_id, pos, text, $k AS pord, '$name' AS pattern_name,
           |    regexp_extract_all(text, ${wbPat(pat)}) AS ms,
           |    regexp_split_to_array(text, ${wbPat(pat)}) AS parts
           |  FROM wbtext""".stripMargin
      }.mkString("\n  UNION ALL\n")
    s"""wbtext AS (
       |  SELECT doc_id, pos, text FROM syn WHERE kind <> 'media'
       |), wbrm AS (
       |$branches
       |), wbrz AS (
       |  SELECT doc_id, pos, pord, pattern_name,
       |         unnest(${wbMatchStructs(withCtx = true)}) AS mz
       |  FROM wbrm
       |), wbrc AS (
       |  SELECT doc_id, pos, pord, pattern_name, mz.i AS i, mz.t AS mtext,
       |         mz.s AS mstart, mz.s + len(mz.t) AS mend, mz.ctx AS ctx
       |  FROM wbrz
       |), wbrcat AS (
       |  SELECT doc_id, pos, pord, pattern_name, i, mtext, mstart, mend,
       |    CASE WHEN list_max(cs) = 0 THEN 'themes'
       |         ELSE ($wbCatList)[list_position(cs, list_max(cs))]
       |    END AS category
       |  FROM (SELECT *, ${wbCtxScores("ctx")} AS cs FROM wbrc)
       |)""".stripMargin
  }

  /** CTEs wbbasel + wbboost + wbcats: classify_passage
    * (patterns.py:179-203). Keyword base = per-pattern hits x 0.2 summed in
    * pattern order (bit-exact with the Scala accumulation), min'd at 1.0;
    * each rule whose context infers the category then folds
    * min(s + 0.3, 1.0), first rule setting 0.5 when no keyword base.
    */
  private def wbCatsCtes: String = {
    val baseCols = graft.worldbible.WorldBible.CategoryKeywords
      .map { case (c, ps) =>
        val sum = ps
          .map(p =>
            s"len(regexp_extract_all(text, ${wbPat(p)})) * CAST(0.2 AS DOUBLE)")
          .mkString("\n      + ")
        s"    $sum AS base_$c"
      }.mkString(",\n")
    val baseBranches = graft.worldbible.WorldBible.CategoryKeywords
      .map { case (c, _) =>
        s"""  SELECT doc_id, pos, '$c' AS category, base_$c AS raw
           |  FROM wbbase WHERE base_$c > 0""".stripMargin
      }.mkString("\n  UNION ALL\n")
    // iterated min(s + 0.3, 1.0) as an explicit nest per step count —
    // every possible start (>= 0.2 keyword base, or the 0.5 rule floor)
    // reaches exactly 1.0 within 3 steps, so k >= 4 is the constant 1.0.
    // (No list_reduce: DuckDB 1.0 mis-evaluates it in parallel pipelines
    // under memory pressure — see the q31 oracle's recursive walk.)
    def nest(start: String, k: Int): String =
      (1 to k).foldLeft(start)((s, _) =>
        s"least($s + CAST(0.3 AS DOUBLE), CAST(1.0 AS DOUBLE))")
    def boostLadder(start: String, stepsExpr: String): String =
      s"""CASE $stepsExpr
         |        WHEN 0 THEN $start
         |        WHEN 1 THEN ${nest(start, 1)}
         |        WHEN 2 THEN ${nest(start, 2)}
         |        WHEN 3 THEN ${nest(start, 3)}
         |        ELSE CAST(1.0 AS DOUBLE) END""".stripMargin
    s""", wbbase AS (
       |  SELECT doc_id, pos,
       |$baseCols
       |  FROM wbtext
       |), wbbasel AS (
       |$baseBranches
       |), wbboost AS (
       |  SELECT doc_id, pos, category, count(*) AS rcnt
       |  FROM wbrcat GROUP BY 1, 2, 3
       |), wbcats AS (
       |  SELECT coalesce(b.doc_id, r.doc_id) AS doc_id,
       |         coalesce(b.pos, r.pos) AS pos,
       |         coalesce(b.category, r.category) AS category,
       |    CASE WHEN r.rcnt IS NULL THEN least(b.raw, CAST(1.0 AS DOUBLE))
       |         WHEN b.raw IS NULL THEN
       |      ${boostLadder("CAST(0.5 AS DOUBLE)", "CAST(r.rcnt AS INT) - 1")}
       |         ELSE
       |      ${boostLadder("least(b.raw, CAST(1.0 AS DOUBLE))", "CAST(r.rcnt AS INT)")}
       |    END AS score
       |  FROM wbbasel b FULL OUTER JOIN wbboost r
       |    ON b.doc_id = r.doc_id AND b.pos = r.pos
       |   AND b.category = r.category
       |)""".stripMargin
  }

  /** q30: per-passage category scores from raw text. */
  private def worldbibleCatOracleSql: String =
    Oracles.overSyn(
      s""", $wbRuleCtes$wbCatsCtes
         |SELECT doc_id, pos, category, CAST(score AS DOUBLE) AS score
         |FROM wbcats""".stripMargin)

  /** q31: extract_all + W4 greedy overlap dedup + RuleNames filter
    * (extractor.py:268-300) from raw text. Keyword matches (conf 0.7)
    * occupy spans alongside rule matches (conf 0.85); only kept rule
    * matches in the five qualifying pattern names are emitted.
    */
  private def worldbibleRulesOracleSql: String = {
    val kwBranches = {
      var ord = -1
      graft.worldbible.WorldBible.CategoryKeywords.flatMap { case (c, ps) =>
        ps.map { p =>
          ord += 1
          s"""  SELECT doc_id, pos, text, $ord AS pord, '$c' AS category,
             |    regexp_extract_all(text, ${wbPat(p)}) AS ms,
             |    regexp_split_to_array(text, ${wbPat(p)}) AS parts
             |  FROM wbtext""".stripMargin
        }
      }.mkString("\n  UNION ALL\n")
    }
    val ruleNamesSql = graft.worldbible.WorldBible.RuleNames.toSeq.sorted
      .map(n => s"'$n'").mkString(", ")
    // W4 greedy span dedup WITHOUT list_reduce: a recursive CTE walks each
    // passage's sorted match list one element per step, carrying
    // (maxend, kept). DuckDB 1.0's list_reduce returns wrong results when
    // evaluated in parallel pipelines under memory pressure (observed
    // cross-group row mixing at 32 threads, ~1/3 of runs); the recursive
    // walk uses only scalar ops and joins back to the list per step, so
    // per-iteration state is one small row per unfinished passage.
    s"WITH RECURSIVE ${Oracles.synCte}\n" +
      s""", $wbRuleCtes, wbkm AS (
         |$kwBranches
         |), wbkz AS (
         |  SELECT doc_id, pos, pord,
         |         unnest(${wbMatchStructs(withCtx = false)}) AS mz
         |  FROM wbkm
         |), wbkx AS (
         |  SELECT doc_id, pos, pord, mz.i AS i, mz.t AS mtext, mz.s AS mstart
         |  FROM wbkz
         |), wbtok AS (
         |  SELECT doc_id, pos, 0 AS knd, pord, i, mstart,
         |         mstart + len(mtext) AS mend,
         |         CAST(0.7 AS DOUBLE) AS conf, '' AS item
         |  FROM wbkx
         |  UNION ALL
         |  SELECT doc_id, pos, 1, pord, i, mstart, mend,
         |         CAST(0.85 AS DOUBLE),
         |    CASE WHEN pattern_name IN ($ruleNamesSql)
         |         THEN pattern_name || chr(9) || mtext || chr(9) || category
         |         ELSE '' END
         |  FROM wbrcat
         |), wblists AS (
         |  SELECT doc_id, pos, list(mend || '|' || mstart || '|' || item
         |    ORDER BY mstart ASC, conf DESC, knd ASC, pord ASC, i ASC) AS l
         |  FROM wbtok GROUP BY doc_id, pos
         |), wbg AS (
         |  SELECT doc_id, pos, 0 AS idx, 0 AS maxend, '' AS kept FROM wblists
         |  UNION ALL
         |  SELECT g.doc_id, g.pos, g.idx + 1,
         |    CASE WHEN CAST(split_part(s.l[g.idx + 1], '|', 2) AS INT)
         |              >= g.maxend
         |         THEN CAST(split_part(s.l[g.idx + 1], '|', 1) AS INT)
         |         ELSE g.maxend END,
         |    CASE WHEN CAST(split_part(s.l[g.idx + 1], '|', 2) AS INT)
         |              >= g.maxend
         |              AND split_part(s.l[g.idx + 1], '|', 3) <> ''
         |         THEN CASE WHEN g.kept = ''
         |                   THEN split_part(s.l[g.idx + 1], '|', 3)
         |                   ELSE g.kept || chr(30) ||
         |                        split_part(s.l[g.idx + 1], '|', 3) END
         |         ELSE g.kept END
         |  FROM wbg g JOIN wblists s
         |    ON s.doc_id = g.doc_id AND s.pos = g.pos
         |  WHERE g.idx < len(s.l)
         |), wbkept AS (
         |  SELECT g.doc_id, g.pos,
         |         unnest(string_split(g.kept, chr(30))) AS item
         |  FROM wbg g JOIN wblists s
         |    ON s.doc_id = g.doc_id AND s.pos = g.pos
         |  WHERE g.idx = len(s.l) AND g.kept <> ''
         |)
         |SELECT DISTINCT doc_id, pos,
         |  split_part(item, chr(9), 1) AS pattern_name,
         |  split_part(item, chr(9), 2) AS rule_text,
         |  split_part(item, chr(9), 3) AS category
         |FROM wbkept WHERE item <> ''""".stripMargin
  }

  /** q51 oracle: the X5 consolidation re-derived in DuckDB — same-passage
    * co-occurrence counts, containment merge heuristic, type-compatibility
    * constraint, then connected components (star components, so two
    * min-label rounds reach the fixpoint). Fuzzy/article/alias families
    * are provably empty on this input (see [[q51Names]]).
    */
  private def consolidationOracleSql: String = {
    val nameRows = q51Names.zipWithIndex
      .map { case (n, i) => s"($i, '${n.toLowerCase(java.util.Locale.ROOT)}')" }.mkString(", ")
    s"""WITH names(si, nm) AS (VALUES $nameRows),
       |base AS (
       |  SELECT 'c' || l_orderkey AS doc_id, CAST(l_linenumber AS INT) AS pos,
       |         l_orderkey % 4 AS book, nm
       |  FROM lineitem JOIN names ON names.si = l_orderkey % 20
       |),
       |ments AS (
       |  SELECT doc_id, pos, book, nm AS node, 'character' AS et FROM base
       |  UNION ALL
       |  SELECT doc_id, pos, book, nm || ' took', 'character' FROM base
       |  UNION ALL
       |  SELECT doc_id, pos, book, nm || ' field', 'place' FROM base
       |),
       |pp AS (SELECT doc_id, pos, list_sort(list(DISTINCT node)) AS ks
       |       FROM ments GROUP BY 1, 2),
       |p1 AS (SELECT ks, unnest(generate_series(1, len(ks))) AS i FROM pp),
       |p2 AS (SELECT ks, i, unnest(generate_series(i + 1, len(ks))) AS j
       |       FROM p1),
       |cooc AS (SELECT ks[i] AS src, ks[j] AS dst, count(*) AS cnt
       |         FROM p2 GROUP BY 1, 2),
       |ntypes AS (SELECT node, min(et) AS t FROM ments GROUP BY 1),
       |e0 AS (
       |  SELECT src, dst FROM cooc
       |  JOIN ntypes t1 ON t1.node = src
       |  JOIN ntypes t2 ON t2.node = dst
       |  WHERE cnt >= 3
       |    AND (src LIKE '%' || dst || '%' OR dst LIKE '%' || src || '%'
       |         OR src = 'the ' || dst OR dst = 'the ' || src)
       |    AND (t1.t = 'unknown' OR t2.t = 'unknown' OR t1.t = t2.t)
       |),
       |nodes AS (SELECT DISTINCT node FROM ments),
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
       |)
       |SELECT l2.cluster AS entity,
       |       count(DISTINCT m.book) AS books_appeared,
       |       count(*) AS total_mentions,
       |       count(DISTINCT m.node) AS member_count,
       |       greatest(count(DISTINCT CASE WHEN m.et <> 'unknown'
       |                                    THEN m.et END) - 1, 0)
       |         AS type_conflicts
       |FROM ments m JOIN l2 ON l2.node = m.node
       |GROUP BY 1""".stripMargin
  }

  /** q52 oracle: the four ORDER_PATTERNS (temporal.py:276-281) re-run in
    * DuckDB over the same synthesized passages — group-1/group-2 extracts
    * zipped by match index.
    */
  private def temporalRelationsOracleSql: String = {
    val nameRows = q51Names.zipWithIndex
      .map { case (n, i) => s"($i, '$n')" }.mkString(", ")
    val pats = Seq(
      ("""(\w+(?:\s+\w+)?)\s+(?:came\s+)?before\s+(\w+(?:\s+\w+)?)""", "before"),
      ("""(\w+(?:\s+\w+)?)\s+(?:came\s+)?after\s+(\w+(?:\s+\w+)?)""", "after"),
      ("""(\w+(?:\s+\w+)?)\s+preceded\s+(\w+(?:\s+\w+)?)""", "before"),
      ("""(\w+(?:\s+\w+)?)\s+followed\s+(\w+(?:\s+\w+)?)""", "after"))
      .map { case (p, r) => s"('(?i)${sq(p)}', '$r')" }.mkString(",\n    ")
    s"""WITH names(si, nm) AS (VALUES $nameRows),
       |base AS (
       |  SELECT 't' || l_orderkey AS doc_id, CAST(l_linenumber AS INT) AS pos,
       |         n0.nm || ' came before ' || n1.nm || '. ' ||
       |         n2.nm || ' followed ' || n3.nm || '.' AS text
       |  FROM lineitem
       |  JOIN names n0 ON n0.si = l_orderkey % 20
       |  JOIN names n1 ON n1.si = (l_orderkey + 1) % 20
       |  JOIN names n2 ON n2.si = (l_orderkey + 2) % 20
       |  JOIN names n3 ON n3.si = (l_orderkey + 3) % 20
       |),
       |pats(pat, rel) AS (VALUES
       |    $pats),
       |mx AS (
       |  SELECT doc_id, pos, rel,
       |         regexp_extract_all(text, pat, 1) AS g1,
       |         regexp_extract_all(text, pat, 2) AS g2
       |  FROM base, pats
       |),
       |u AS (SELECT doc_id, pos, rel, g1, g2,
       |             unnest(generate_series(1, len(g1))) AS i
       |      FROM mx)
       |SELECT doc_id, pos, g1[i] AS subject, rel AS relation, g2[i] AS object
       |FROM u""".stripMargin
  }

  /** q26 oracle: MinHash+LSH re-derived in DuckDB — same shingles as q19,
    * md5-based base hash (Dedup.md5Hash32 twin), the permutation family as
    * 32 explicit list_min entries, 4-row band signatures, bucket
    * self-join, exact floor-4dp Jaccard verify. Fully checkable because
    * every hash is a DuckDB scalar expression (the former MurmurHash3
    * family was not, and a character-fold via list_reduce is unsafe —
    * see the q31 oracle note).
    */
  private def minhashOracleSql: String = {
    import graft.text.Dedup
    val sigEntries = Dedup.PermA.zip(Dedup.PermB).map { case (a, b) =>
      s"list_min(list_transform(hs, x -> ($a * x + $b) % ${Dedup.HashPrime}))"
    }.mkString("[\n      ", ",\n      ", "]")
    s"""WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |                  string_split(text, ' ') AS ws FROM documents),
       |s AS (SELECT doc_id,
       |        CASE WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
       |             ELSE list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
       |                                 for i in range(1, len(ws) - 1)]) END AS sh
       |      FROM t),
       |xs AS (SELECT doc_id, sh,
       |         list_transform(sh, sg ->
       |           ('0x' || substring(md5(sg), 1, 8))::BIGINT) AS hs
       |       FROM s),
       |sig AS (SELECT doc_id, $sigEntries AS sig FROM xs),
       |banded AS (
       |  SELECT doc_id, g.b,
       |         array_to_string(sig[g.b * 4 + 1 : g.b * 4 + 4], ',') AS band_sig
       |  FROM sig, generate_series(0, ${Dedup.Bands - 1}) AS g(b)
       |),
       |cand AS (
       |  SELECT l.doc_id AS ia, r.doc_id AS ib
       |  FROM banded l JOIN banded r
       |    ON l.b = r.b AND l.band_sig = r.band_sig AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT a, b, jaccard FROM (
       |  SELECT c.ia AS a, c.ib AS b,
       |         floor(len(list_intersect(sa.sh, sb.sh))::DOUBLE
       |               / len(list_distinct(sa.sh || sb.sh)) * 10000 + 0.5)
       |           / 10000.0 AS jaccard
       |  FROM cand c
       |  JOIN s sa ON sa.doc_id = c.ia
       |  JOIN s sb ON sb.doc_id = c.ib
       |) WHERE jaccard >= 0.7""".stripMargin
  }

  /** q27 oracle: SimHash re-derived in DuckDB — per-word packed polynomial
    * hash, 64 bit-counters per doc, pigeonhole chunk blocking, hamming
    * filter. Matches Dedup.simhash / simhashNearDups(maxHamming = 6).
    */
  private def simhashOracleSql: String = {
    import graft.text.Dedup
    val maxHamming = 6
    val chunks = maxHamming + 1
    val bounds = (0 to chunks).map(i => i * 64 / chunks)
    val chunkRows = (0 until chunks).map { i =>
      val lo = bounds(i)
      val width = bounds(i + 1) - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1
      s"($i, $lo, CAST($mask AS BIGINT))"
    }.mkString(", ")
    s"""WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |                  string_split(text, ' ') AS ws FROM documents),
       |wh AS (SELECT doc_id, unnest(ws) AS w FROM t),
       |hs AS (SELECT doc_id,
       |         ('0x' || substring(md5(w), 1, 15))::BIGINT AS h
       |       FROM wh),
       |bits AS (SELECT doc_id, g.i,
       |           sum(CASE WHEN (h >> g.i) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
       |         FROM hs, generate_series(0, 63) AS g(i) GROUP BY 1, 2),
       |sigs AS (SELECT doc_id,
       |           sum(CASE WHEN cnt > 0 THEN (CAST(1 AS BIGINT) << i)
       |                    ELSE CAST(0 AS BIGINT) END) AS sig
       |         FROM bits GROUP BY 1),
       |chunked AS (
       |  SELECT doc_id, sig, t.c AS chunk, (sig >> t.lo) & t.mask AS ckey
       |  FROM sigs, (VALUES $chunkRows) AS t(c, lo, mask)
       |)
       |SELECT a, b, hamming FROM (
       |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       |         CAST(bit_count(xor(l.sig, r.sig)) AS INT) AS hamming
       |  FROM chunked l JOIN chunked r
       |    ON l.chunk = r.chunk AND l.ckey = r.ckey AND l.doc_id < r.doc_id
       |) WHERE hamming <= $maxHamming""".stripMargin
  }

  /** q28 oracle: the SRP-LSH top-k re-derived in DuckDB. The deterministic
    * hyperplanes are computed IN SQL from the same integer recurrence as
    * `Similarity.planes` — the signed 64-bit wrapping multiply becomes a
    * HUGEINT multiply mod 2^64, `>>> 11` becomes `// 2048`, and the result
    * (< 2^53) converts exactly to DOUBLE. Bucket bits use the same
    * left-fold dot product (list ordered by dimension), so signs match
    * bit-for-bit; the rerank needs only consistent ORDERING (rank output,
    * like q24), so list_cosine_similarity suffices.
    */
  private def annLshOracleSql: String =
    """WITH planes AS (
      |  SELECT b.band, t.bit, d.j,
      |    CAST(((CAST((b.band * 8 + t.bit) * 1000003 + d.j * 19349663 AS HUGEINT)
      |           * 11400714819323198485) % 18446744073709551616) // 2048
      |         AS DOUBLE) / 9007199254740992.0 - 0.5 AS v
      |  FROM generate_series(0, 7) AS b(band), generate_series(0, 7) AS t(bit),
      |       generate_series(0, 63) AS d(j)
      |),
      |ev AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
      |              unnest(embedding) AS x
      |       FROM embeddings),
      |dots AS (
      |  SELECT ev.vec_id, p.band, p.bit,
      |    coalesce(list_sum(list(CAST(ev.x AS DOUBLE) * p.v ORDER BY ev.j)),
      |             0.0) AS dot
      |  FROM ev JOIN planes p ON p.j = ev.j
      |  GROUP BY 1, 2, 3
      |),
      |buckets AS (
      |  SELECT vec_id, band,
      |    sum(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << bit)
      |             ELSE CAST(0 AS BIGINT) END) AS bucket
      |  FROM dots GROUP BY 1, 2
      |),
      |qs AS (SELECT vec_id AS query_id, band, bucket
      |       FROM buckets WHERE vec_id < 20),
      |cand AS (
      |  SELECT DISTINCT q.query_id, b.vec_id AS neighbor_id
      |  FROM qs q JOIN buckets b ON b.band = q.band AND b.bucket = q.bucket
      |  WHERE b.vec_id <> q.query_id
      |),
      |scored AS (
      |  SELECT c.query_id, c.neighbor_id,
      |    list_cosine_similarity(CAST(eq.embedding AS DOUBLE[]),
      |                           CAST(en.embedding AS DOUBLE[])) AS cos
      |  FROM cand c
      |  JOIN embeddings eq ON eq.vec_id = c.query_id
      |  JOIN embeddings en ON en.vec_id = c.neighbor_id
      |)
      |SELECT query_id, CAST(rank_big AS INT) AS rank, neighbor_id FROM (
      |  SELECT query_id, neighbor_id,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id) AS rank_big
      |  FROM scored) WHERE rank_big <= 5""".stripMargin

  /** q43: culture-categorized passages bucketed by people keywords
    * (extractor.py:302-349), >= 2 passages each.
    */
  private def culturesOracleSql: String = {
    val peopleRows = graft.worldbible.WorldBible.PeoplesKeywords
      .map { case (people, kws) =>
        s"('$people', ${kws.map(k => s"'${sq(k)}'").mkString("[", ", ", "]")})"
      }.mkString(",\n         ")
    Oracles.overSyn(
      s""", $wbRuleCtes$wbCatsCtes
         |SELECT people,
         |       upper(substring(people, 1, 1)) || substring(people, 2) AS name,
         |       passages
         |FROM (
         |  SELECT p.people, count(*) AS passages
         |  FROM (SELECT doc_id, pos, lower(text) AS lw FROM wbtext
         |        WHERE (doc_id, pos) IN
         |          (SELECT (doc_id, pos) FROM wbcats
         |           WHERE category = 'culture')) t,
         |       (VALUES $peopleRows) AS p(people, kws)
         |  WHERE len(list_filter(p.kws, k -> contains(t.lw, k))) > 0
         |  GROUP BY 1
         |) WHERE passages >= 2""".stripMargin)
  }

  /** q44: magic-categorized passages split limitation/ability
    * (extractor.py:351-381).
    */
  private def magicOracleSql: String =
    Oracles.overSyn(
      s""", $wbRuleCtes$wbCatsCtes
         |SELECT doc_id, pos, kind FROM (
         |  SELECT doc_id, pos,
         |    CASE WHEN contains(lw, 'cannot') OR contains(lw, 'forbidden')
         |           THEN 'limitation'
         |         WHEN contains(lw, 'can') OR contains(lw, 'able')
         |           OR contains(lw, 'power') THEN 'ability' END AS kind
         |  FROM (SELECT doc_id, pos, lower(text) AS lw FROM wbtext
         |        WHERE (doc_id, pos) IN
         |          (SELECT (doc_id, pos) FROM wbcats WHERE category = 'magic'))
         |) WHERE kind IS NOT NULL""".stripMargin)

  /** q45: location names extracted from geography-categorized passages
    * (extractor.py:383-416), top-20 by (passages desc, name asc).
    */
  private def geographyOracleSql: String = {
    val locPat =
      """(the\s+)?([\w\s]+)\s+(is|was|lies|stands?)\s+(in|on|near|by|at)\s+"""
    Oracles.overSyn(
      s""", $wbRuleCtes$wbCatsCtes
         |SELECT name, passages FROM (
         |  SELECT name, count(*) AS passages FROM (
         |    SELECT trim(g2) AS name FROM (
         |      SELECT unnest(regexp_extract_all(text, ${wbPat(locPat)}, 2)) AS g2
         |      FROM wbtext
         |      WHERE (doc_id, pos) IN
         |        (SELECT (doc_id, pos) FROM wbcats
         |         WHERE category = 'geography'))
         |  ) WHERE len(name) > 2 AND regexp_matches(name, '^[A-Z]')
         |  GROUP BY 1
         |) ORDER BY passages DESC, name ASC LIMIT 20""".stripMargin)
  }

  /** q49 fingerprint oracle: sentence-metric ratios + readability +
    * vocabulary + classifier passage-type shares, all per corpus.
    */
  private def fingerprintOracleSql: String = {
    val corpus = "CAST(substring(doc_id, 5) AS BIGINT) % 2"
    val f4 = (x: String) => s"floor(($x) * 10000 + 0.5) / 10000.0"
    val subs = "(CASE WHEN regexp_matches(lower(text), '\\bthat\\b') THEN 1 ELSE 0 END) + (CASE WHEN regexp_matches(lower(text), '\\bwhich\\b') THEN 1 ELSE 0 END) + (CASE WHEN regexp_matches(lower(text), '\\bwho\\b') THEN 1 ELSE 0 END) + (CASE WHEN regexp_matches(lower(text), '\\bbecause\\b') THEN 1 ELSE 0 END) + (CASE WHEN regexp_matches(lower(text), '\\bwhen\\b') THEN 1 ELSE 0 END) + (CASE WHEN regexp_matches(lower(text), '\\bwhile\\b') THEN 1 ELSE 0 END) + (CASE WHEN regexp_matches(lower(text), '\\balthough\\b') THEN 1 ELSE 0 END) + (CASE WHEN regexp_matches(lower(text), '\\bif\\b') THEN 1 ELSE 0 END) + (CASE WHEN regexp_matches(lower(text), '\\bsince\\b') THEN 1 ELSE 0 END) + (CASE WHEN regexp_matches(lower(text), '\\bunless\\b') THEN 1 ELSE 0 END)"
    val smx =
      s""", smx AS (
         |  SELECT $corpus AS corpus,
         |    CASE WHEN length(trim(text)) = 0 THEN 0
         |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS wc,
         |    length(text) AS cc,
         |    length(regexp_replace(trim(text), '\\s+', '', 'g')) AS nospace,
         |    length(text) - length(regexp_replace(text, '[\\.,;:!\\?"''\\-]', '', 'g')) AS punct,
         |    (text LIKE '%?') AS is_q, (text LIKE '%!') AS is_e,
         |    (text LIKE '%"%' OR text LIKE '%“%') AS has_d,
         |    regexp_matches(text, '\\b(was|were|been|is|are|be)\\s+\\w+(ed|en)\\b') AS is_p,
         |    ($subs) AS subs
         |  FROM syn WHERE kind <> 'media'
         |), smagg AS (
         |  SELECT corpus, count(*) AS sentences,
         |    CAST(sum(wc) AS BIGINT) AS word_count,
         |    ${f4("avg(wc)")} AS sentence_len_mean,
         |    ${f4("coalesce(stddev_samp(wc), 0.0)")} AS sentence_len_std,
         |    ${f4("avg(CASE WHEN wc > 0 THEN nospace::DOUBLE / wc ELSE 0.0 END)")} AS word_len_mean,
         |    ${f4("avg(punct::DOUBLE / greatest(cc, 1))")} AS punct_density_mean,
         |    ${f4("avg(subs)")} AS clause_depth_mean,
         |    ${f4("avg(CASE WHEN has_d THEN 1.0 ELSE 0.0 END)")} AS dialogue_ratio,
         |    ${f4("avg(CASE WHEN is_p THEN 1.0 ELSE 0.0 END)")} AS passive_voice_ratio,
         |    ${f4("avg(CASE WHEN is_q THEN 1.0 ELSE 0.0 END)")} AS question_ratio,
         |    ${f4("avg(CASE WHEN is_e THEN 1.0 ELSE 0.0 END)")} AS exclamation_ratio
         |  FROM smx GROUP BY 1
         |)""".stripMargin
    val vocab =
      s""", toksv AS (
         |  SELECT $corpus AS corpus,
         |         unnest(regexp_split_to_array(lower(text), '[^a-z'']+')) AS word
         |  FROM syn WHERE kind <> 'media'
         |), wcounts AS (
         |  SELECT corpus, word, count(*) AS cnt FROM toksv
         |  WHERE length(word) > 0 GROUP BY 1, 2
         |), capsv AS (
         |  SELECT DISTINCT $corpus AS corpus, lower(w) AS word FROM (
         |    SELECT doc_id,
         |           unnest(regexp_split_to_array(text, '[^A-Za-z'']+')) AS w
         |    FROM syn WHERE kind <> 'media')
         |  WHERE length(w) > 0 AND regexp_matches(substring(w, 1, 1), '[A-Z]')
         |), inv AS (
         |  SELECT c.corpus, count(*) AS invented_count
         |  FROM wcounts c LEFT JOIN capsv k
         |    ON k.corpus = c.corpus AND k.word = c.word
         |  WHERE c.cnt <= 2 AND length(c.word) > 2
         |    AND NOT list_contains(${sqlStrList(graft.style.Fingerprint.FunctionWords)}, c.word)
         |    AND NOT list_contains(${sqlStrList(Lexicon.StyleArchaisms)}, c.word)
         |    AND k.word IS NULL
         |  GROUP BY 1
         |), vocab AS (
         |  SELECT w.corpus,
         |    ${f4("count(*)::DOUBLE / sum(w.cnt)")} AS ttr,
         |    ${f4("sum(CASE WHEN w.cnt = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)")} AS hapax_ratio,
         |    ${f4(s"sum(CASE WHEN list_contains(${sqlStrList(Lexicon.StyleArchaisms)}, w.word) THEN w.cnt ELSE 0 END)::DOUBLE / sum(w.cnt) * 1000")} AS archaism_density,
         |    ${f4("coalesce(any_value(i.invented_count), 0)::DOUBLE / sum(w.cnt) * 1000")} AS invented_word_density
         |  FROM wcounts w LEFT JOIN inv i ON i.corpus = w.corpus
         |  GROUP BY 1
         |)""".stripMargin
    val types = Seq("dialogue", "action", "description", "travel",
      "battle", "reflection", "unknown")
    val shares = types.map { t =>
      val cond =
        if (t == "unknown") "p.score < 0.5"
        else s"p.score >= 0.5 AND p.name = '$t'"
      s"${f4(s"avg(CASE WHEN $cond THEN 1.0 ELSE 0.0 END)")} AS share_$t"
    }.mkString(",\n    ")
    val cls =
      s""", clsagg AS (
         |  SELECT CAST(substring(p.doc_id, 5) AS BIGINT) % 2 AS corpus,
         |    $shares
         |  FROM ranked p WHERE p.rn = 1
         |  GROUP BY 1
         |)""".stripMargin
    Oracles.overSyn(
      classifierCtes + smx + vocab + cls +
        readabilityCtes(s"$corpus", "corpus") +
        """
          |SELECT s.corpus, s.sentences, s.word_count, s.sentence_len_mean,
          |  s.sentence_len_std, s.word_len_mean, s.punct_density_mean,
          |  s.clause_depth_mean, s.dialogue_ratio, s.passive_voice_ratio,
          |  s.question_ratio, s.exclamation_ratio,
          |  r.flesch, r.fk_grade, r.gunning_fog,
          |  v.ttr, v.hapax_ratio, v.archaism_density, v.invented_word_density,
          |  c.share_dialogue, c.share_action, c.share_description,
          |  c.share_travel, c.share_battle, c.share_reflection, c.share_unknown
          |FROM smagg s
          |JOIN readability r USING (corpus)
          |JOIN vocab v USING (corpus)
          |JOIN clsagg c USING (corpus)""".stripMargin)
  }

  /** Classifier score CTEs ending in `ranked` (shared by q34 and q49). */
  private def classifierCtes: String = {
    import graft.style.Classifier
    def present(words: Seq[String]): String = words
      .map(v => s"(CASE WHEN regexp_matches(lw, '\\b${sq(v)}\\b') THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
    def contained(words: Seq[String]): String = words
      .map(k => s"(CASE WHEN lw LIKE '%${sq(k)}%' THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
    val descMatches = Classifier.DescriptionPatterns
      .map(pt => s"len(regexp_extract_all(lw, '${sq(pt)}'))")
      .mkString("(", " + ", ")")
    val adjCount =
      s"len(list_filter(regexp_split_to_array(lw, '\\s+'), w -> list_contains(${sqlStrList(Classifier.DescAdjectives)}, w)))"
    val fpCount = Classifier.FirstPerson
      .map(pp => s"(CASE WHEN position(' ${sq(pp)} ' IN ' ' || lw || ' ') > 0 THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
    val quoted =
      """coalesce(list_sum(list_transform(
        |  regexp_extract_all(text, '["“][^"”]+["”]'), x -> length(x))), 0)"""
        .stripMargin.replace("\n", " ")
    val shortSents =
      """len(list_filter(string_split(regexp_replace(lw, '\.+$', ''), '.'),
        |  s -> len(list_filter(regexp_split_to_array(s, '\s+'),
        |                       x -> length(x) > 0)) BETWEEN 4 AND 9))"""
        .stripMargin.replace("\n", " ")
    val sentCount = """len(string_split(regexp_replace(lw, '\.+$', ''), '.'))"""
    (
      s""", lows AS (
         |  SELECT doc_id, pos, text, lower(text) AS lw FROM syn
         |  WHERE kind <> 'media'
         |), cls AS (
         |  SELECT doc_id, pos,
         |    (CASE WHEN $quoted > 0 AND length(text) > 0
         |          THEN $quoted::DOUBLE / length(text) * 3.0 ELSE 0.0 END
         |     + 0.3 * ${present(Classifier.DialogueVerbs)})::DOUBLE AS s0,
         |    least(0.4 * ${contained(Classifier.ActionVerbs)}
         |     + CASE WHEN $shortSents > $sentCount / 2.0 THEN 0.5 ELSE 0.0 END,
         |      3.0)::DOUBLE AS s1,
         |    (0.3 * $descMatches + 0.2 * $adjCount
         |     + CASE WHEN len(regexp_split_to_array(lw, '\\s+')) > 30
         |            THEN 0.3 ELSE 0.0 END)::DOUBLE AS s2,
         |    least(0.35 * ${contained(Classifier.TravelKeywords)}
         |      + 0.3 * ${contained(Classifier.Directions)}, 3.0)::DOUBLE AS s3,
         |    least(0.4 * ${contained(Classifier.BattleKeywords)}, 3.5)::DOUBLE AS s4,
         |    (0.35 * ${present(Classifier.ReflectionVerbs)} + 0.2 * $fpCount)::DOUBLE AS s5
         |  FROM lows
         |), unp AS (
         |  SELECT doc_id, pos, i,
         |    (['dialogue','action','description','travel','battle','reflection'])[i + 1] AS name,
         |    ([s0, s1, s2, s3, s4, s5])[i + 1] AS score,
         |    s0 + s1 + s2 + s3 + s4 + s5 AS total,
         |    s0, s1, s2, s3, s4, s5
         |  FROM cls, (SELECT unnest(range(6)) AS i)
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id, pos
         |                               ORDER BY score DESC, i ASC) AS rn
         |  FROM unp
         |)""".stripMargin)
  }

  /** q36 Burrows-delta oracle: 100-function-word frequency grid per
    * corpus, self-normalized z-scores, mean |z1 - z2|.
    */
  private def burrowsOracleSql: String = {
    val fwList = sqlStrList(graft.style.Fingerprint.FunctionWords)
    Oracles.overSyn(
      s""", w AS (
         |  SELECT CAST(substring(doc_id, 5) AS BIGINT) % 2 AS corpus,
         |         unnest(regexp_split_to_array(lower(text), '[^a-z'']+')) AS word
         |  FROM syn WHERE kind <> 'media'
         |), ww AS (SELECT corpus, word FROM w WHERE length(word) > 0),
         |tot AS (SELECT corpus, count(*) AS total FROM ww GROUP BY 1),
         |fw AS (SELECT unnest($fwList) AS word),
         |cnts AS (
         |  SELECT corpus, word, count(*) AS cnt FROM ww
         |  WHERE list_contains($fwList, word) GROUP BY 1, 2
         |), freqs AS (
         |  SELECT t.corpus, f.word,
         |         coalesce(c.cnt, 0)::DOUBLE / t.total AS freq
         |  FROM tot t CROSS JOIN fw f
         |  LEFT JOIN cnts c ON c.corpus = t.corpus AND c.word = f.word
         |), z AS (
         |  SELECT corpus, word,
         |    CASE WHEN stddev_samp(freq) OVER (PARTITION BY corpus) > 0
         |         THEN (freq - avg(freq) OVER (PARTITION BY corpus))
         |              / stddev_samp(freq) OVER (PARTITION BY corpus)
         |         ELSE 0.0 END AS z
         |  FROM freqs
         |)
         |SELECT a.corpus AS corpus_a, b.corpus AS corpus_b,
         |       floor(avg(abs(a.z - b.z)) * 10000 + 0.5) / 10000.0 AS delta
         |FROM z a JOIN z b ON a.word = b.word AND a.corpus < b.corpus
         |GROUP BY 1, 2""".stripMargin)
  }

  private def docsTable(s: SparkSession, dir: String): DataFrame =
    // deliberately NOT repartitioned (unlike Pipeline.shingles): the
    // document table is 5k short rows and these consumers are trivial
    // projections/hashes — a spreading exchange costs more than the
    // single-split compute it saves (measured round-6: q20-q23 each
    // +0.05-0.25 s with a repartition here)
    s.read.parquet(s"$dir/documents.parquet")

  private def embTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Exact cosine top-k oracle — shared by q24 (brute force) and q53 (IVF
    * at nprobe = nlist, which provably degenerates to the same exact
    * search; VERDICT r04 #1).
    */
  private val annTopKSql: String =
    """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      |           FROM embeddings WHERE vec_id < 20),
      |s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
      |             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS cos
      |      FROM embeddings e, q WHERE e.vec_id <> q.query_id)
      |SELECT query_id, CAST(rank_big AS INT) AS rank, neighbor_id FROM (
      |  SELECT query_id, neighbor_id,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id) AS rank_big
      |  FROM s) WHERE rank_big <= 5""".stripMargin

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
    // q38's r3 oracle died in a DuckDB allocation failure under harness
    // memory pressure (CORRECTNESS_r03 q38 err) — its oracle runs over the
    // lean offset-free corpus base (the cluster family never reads
    // "offset"), shaving the per-doc cumulative-length window sort off the
    // plan's peak memory.
    val withClustersLean = (sel: String) =>
      Oracles.overSynLean(
        s", ${Oracles.entityRowsCte},\n${Oracles.clusterCte}\n$sel")
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
          |       arg_min(er.text, er.doc_id || '#' || lpad(CAST(er.pos AS VARCHAR), 19, '0')
          |               || '#' || lpad(CAST(er.start AS VARCHAR), 19, '0')) AS canonical_name,
          |       count(DISTINCT l2.node) AS member_count,
          |       count(*) AS mention_count
          |FROM entity_rows er
          |JOIN l2 ON l2.node = lower(er.text)
          |GROUP BY 1""".stripMargin),
      "q11_dialogue" -> withDialogue(
        """SELECT doc_id, pos, quote, speaker, speech_verb,
          |       attribution_confidence, is_question, is_exclamation
          |FROM dlg""".stripMargin),
      "q12_voice_profiles" -> withDialogue(voiceProfileOracleSelect),
      "q56_compare_voices" -> withDialogue(compareVoicesOracleSql),
      "q41_voice_stats" -> withDialogue(
        """SELECT CAST(count(*) AS BIGINT) AS total_dialogue_lines,
          |  CAST(sum(CASE WHEN speaker IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |    AS unattributed_lines,
          |  floor((count(*) - sum(CASE WHEN speaker IS NULL THEN 1 ELSE 0 END))::DOUBLE
          |        / count(*) * 10000 + 0.5) / 10000.0 AS attribution_rate,
          |  (SELECT CAST(count(*) AS BIGINT) FROM (
          |     SELECT speaker FROM dlg WHERE speaker IS NOT NULL
          |     GROUP BY 1 HAVING count(*) >= 3)) AS total_characters
          |FROM dlg""".stripMargin),
      "q42_top_words" -> withDialogue(
        s""", words AS (
           |  SELECT speaker,
           |         unnest(regexp_split_to_array(trim(lower(quote)), '\\s+')) AS word
           |  FROM dlg WHERE speaker IS NOT NULL
           |)
           |SELECT speaker, CAST(rank_big AS INT) AS rank, word, cnt FROM (
           |  SELECT speaker, word, cnt,
           |         row_number() OVER (PARTITION BY speaker
           |                            ORDER BY cnt DESC, word ASC) AS rank_big
           |  FROM (SELECT speaker, word, count(*) AS cnt FROM words
           |        WHERE length(word) > 2
           |          AND NOT list_contains($voiceStopSql, word)
           |        GROUP BY 1, 2)
           |) WHERE rank_big <= 20""".stripMargin),
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
      "q14_readability" -> readabilityOracleSql,
      "q34_classifier" -> classifierOracleSql,
      "q36_burrows_delta" -> burrowsOracleSql,
      "q35_signature_phrases" -> withDialogue(
        s""", ng AS (
           |  SELECT speaker, unnest(
           |    [ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))] ||
           |    [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] FOR i IN range(1, len(ws) - 1)]
           |  ) AS phrase
           |  FROM (SELECT speaker,
           |          regexp_split_to_array(lower(quote), '\\s+') AS ws
           |        FROM dlg WHERE speaker IS NOT NULL)
           |)
           |SELECT speaker, CAST(rank_big AS INT) AS rank, phrase, cnt FROM (
           |  SELECT speaker, phrase, cnt,
           |    row_number() OVER (PARTITION BY speaker
           |                       ORDER BY cnt DESC, phrase ASC) AS rank_big
           |  FROM (SELECT speaker, phrase, count(*) AS cnt FROM ng
           |        WHERE NOT list_contains(${sqlStrList(graft.voice.Profiles.CommonPhrases)}, phrase)
           |        GROUP BY 1, 2)
           |  WHERE cnt >= 2
           |) WHERE rank_big <= 5""".stripMargin),
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
      "q24_ann_topk" -> annTopKSql,
      // IVF at nprobe = nlist degenerates to the exact search (every cell
      // probed), so the brute-force oracle is ITS oracle too — one SQL
      // text, two independent Spark plans checked against it
      "q53_ann_ivf" -> annTopKSql,
      "q33_distinctive_words" -> withDialogue(
        """, words AS (
          |  SELECT speaker, unnest(regexp_split_to_array(lower(quote), '\s+')) AS word
          |  FROM dlg WHERE speaker IS NOT NULL
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
          |       count(DISTINCT l2.node) AS member_count,
          |       greatest(count(DISTINCT CASE WHEN er.entity_type <> 'unknown'
          |                      THEN er.entity_type END) - 1, 0) AS type_conflicts
          |FROM entity_rows er JOIN l2 ON l2.node = lower(er.text)
          |GROUP BY 1""".stripMargin),
      // peak-memory-lean shape (VERDICT r03 #1): per-node counts aggregate
      // BEFORE the cluster join (the join intermediate is nodes-sized, not
      // mentions-sized), and ORDER BY/LIMIT 10 runs before the ranking
      // window so the window sees 10 rows, not every cluster
      "q38_top_entities" -> withClustersLean(
        """SELECT CAST(row_number() OVER (ORDER BY mention_count DESC, cluster ASC) AS INT)
          |         AS rank,
          |       cluster, mention_count
          |FROM (
          |  SELECT l2.cluster, CAST(sum(n.cnt) AS BIGINT) AS mention_count
          |  FROM (SELECT lower(text) AS node, count(*) AS cnt
          |        FROM entity_rows GROUP BY 1) n
          |  JOIN l2 ON l2.node = n.node
          |  GROUP BY 1
          |  ORDER BY 2 DESC, 1 ASC
          |  LIMIT 10
          |)""".stripMargin),
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
          |        FROM dlg WHERE speaker IS NOT NULL)
          |) WHERE rn = 1""".stripMargin),
      "q30_worldbible_cat" -> worldbibleCatOracleSql,
      "q31_worldbible_rules" -> worldbibleRulesOracleSql,
      "q32_lore_checks" -> loreOracleSql,
      "q46_mentioned_in" -> Oracles.overSyn(
        s""", ${Oracles.entityRowsCte}
           |SELECT coalesce(canonical_id,
           |         'new_' || regexp_replace(lower(trim(text)), '[^a-z0-9]+', '_', 'g')) AS src,
           |       'p_' || doc_id || '_s' || pos AS dst,
           |       count(*) AS mention_count,
           |       'MENTIONED_IN' AS type
           |FROM entity_rows GROUP BY 1, 2""".stripMargin),
      "q47_dialogue_edges" -> withDialogue(
        """SELECT lower(speaker) AS src,
          |       'p_' || doc_id || '_s' || pos || '#0' AS dst,
          |       'SPEAKS' AS type
          |FROM dlg WHERE speaker IS NOT NULL
          |UNION ALL
          |SELECT 'p_' || doc_id || '_s' || pos || '#0',
          |       'p_' || doc_id || '_s' || pos, 'IN_PASSAGE'
          |FROM dlg""".stripMargin),
      "q48_event_links" -> Oracles.overSyn(
        s""", ${Oracles.entityRowsCte},
           |${Oracles.eventRowsCte},
           |${Oracles.vertexRowsCte},
           |ev AS (SELECT DISTINCT event_id, lower(agent) AS agent,
           |                       lower(patient) AS patient
           |       FROM event_rows)
           |SELECT src, dst, type, role FROM (
           |  SELECT v.id AS src, e.event_id AS dst,
           |         'PARTICIPATED_IN' AS type, 'agent' AS role,
           |         row_number() OVER (PARTITION BY e.event_id
           |                            ORDER BY v.id ASC) AS rn
           |  FROM ev e JOIN vertex_rows v
           |    ON v.label = 'character' AND v.cname LIKE '%' || e.agent || '%'
           |) WHERE rn = 1
           |UNION ALL
           |SELECT src, dst, type, role FROM (
           |  SELECT v.id AS src, e.event_id AS dst,
           |         'INVOLVED_IN' AS type, 'patient' AS role,
           |         row_number() OVER (PARTITION BY e.event_id
           |                            ORDER BY CASE v.label WHEN 'character' THEN 0
           |                                     WHEN 'place' THEN 1 ELSE 2 END,
           |                                     v.id ASC) AS rn
           |  FROM ev e JOIN vertex_rows v
           |    ON v.label IN ('character', 'place', 'object')
           |   AND v.cname LIKE '%' || e.patient || '%'
           |) WHERE rn = 1""".stripMargin),
      "q50_word_lengths" -> Oracles.overSyn(
        """, toks50 AS (
          |  SELECT CAST(substring(doc_id, 5) AS BIGINT) % 2 AS corpus,
          |         unnest(regexp_split_to_array(lower(text), '[^a-z'']+')) AS word
          |  FROM syn WHERE kind <> 'media'
          |)
          |SELECT corpus, CAST(length(word) AS INT) AS length, count(*) AS cnt
          |FROM toks50 WHERE length(word) > 0 GROUP BY 1, 2""".stripMargin),
      "q49_fingerprint" -> fingerprintOracleSql,
      "q51_consolidation" -> consolidationOracleSql,
      "q52_temporal_relations" -> temporalRelationsOracleSql,
      "q43_cultures" -> culturesOracleSql,
      "q44_magic" -> magicOracleSql,
      "q45_geography" -> geographyOracleSql,
      "q40_timeline" -> Oracles.overSyn(
        s", ${Oracles.timelineCte}\n" +
          "SELECT name, birth_era, death_era FROM timeline_rows"),
      "q29_split_roundtrip" -> Oracles.overSyn(
        s"""SELECT doc_id,
           |       'p_' || doc_id || '_c1_p' || k || '_s' || sidx AS passage_id,
           |       stext AS text,
           |       1 AS chapter_num, CAST(k AS INT) AS paragraph_num,
           |       CAST(sidx AS INT) AS sentence_num
           |FROM (
           |  SELECT doc_id, k, 1 AS sidx,
           |         CASE WHEN m = 28
           |              THEN ${Oracles.eSubj} || ' met ' || ${Oracles.eObjC} || '.'
           |              ELSE text END AS stext
           |  FROM (SELECT doc_id, text, s, o, m,
           |               row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS k
           |        FROM syn WHERE text <> '')
           |  UNION ALL
           |  SELECT doc_id, k, 2,
           |         ${Oracles.eObjC} || ' helped ' || ${Oracles.eThird} || '.'
           |  FROM (SELECT doc_id, s, o, m,
           |               row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS k
           |        FROM syn WHERE text <> '')
           |  WHERE m = 28
           |)""".stripMargin),
      "q25_embedding_neardup" ->
        """SELECT * FROM (
          |  SELECT a.vec_id AS a, b.vec_id AS b,
          |         floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
          |                 CAST(b.embedding AS DOUBLE[])) * 10000 + 0.5) / 10000.0 AS cos
          |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          |) WHERE cos >= 0.4""".stripMargin,
      "q26_minhash_dups" -> minhashOracleSql,
      "q27_simhash_dups" -> simhashOracleSql,
      "q28_ann_lsh" -> annLshOracleSql,
      "q54_event_windows" ->
        """SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
          |       time_bucket(INTERVAL '10 minutes', ts)
          |         + INTERVAL '10 minutes' AS window_end,
          |       event_type, count(*) AS n_events,
          |       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0
          |         AS total_value
          |FROM events GROUP BY 1, 2, 3""".stripMargin,
      "q55_event_sessions" ->
        """WITH e AS (
          |  SELECT user_id, ts, event_id,
          |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
          |  FROM events
          |), x AS (
          |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
          |                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
          |                      > 1800000000 THEN 1 ELSE 0 END AS ns
          |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          |), y AS (
          |  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                          ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM x
          |)
          |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
          |       count(*) AS n_events, sum(cents) / 100.0 AS total_value
          |FROM y GROUP BY user_id, sid""".stripMargin
    ).map { case (k, v) => k -> Oracles.materializeShared(v) }
  }
}

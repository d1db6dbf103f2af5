package graft.extract

import java.util.regex.Pattern
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Lexicon

/** An extracted (subj, pred, obj) triple.
  * Reference: ExtractedRelationship (models/relationships.py:70-99). */
final case class Triple(
    doc_id: String,
    pos: Int,
    passage_id: String,
    subject_text: String,
    subject_id: Option[String],
    subject_type: Option[String],
    predicate: String,
    predicate_raw: String,
    object_text: String,
    object_id: Option[String],
    object_type: Option[String],
    confidence: Double,
    extraction_method: String)

/** SVO triple extraction — the second mapPartitions-vectorized stage of the
  * north rule. Deterministic re-expression of the reference's
  * dependency-parse path (extract/relationships.py:161-276) without spaCy:
  *
  *  - verb = token whose lowercase form is in the verb lexicon
  *    (lemma AND surface forms, Lexicon.VerbToRelationship)
  *  - subject = nearest noun phrase ending before the verb
  *  - object  = nearest noun phrase starting after the verb (preposition
  *    tokens in between are skipped naturally) — mirrors dobj|prep->pobj
  *  - noun phrases = detected mention spans plus article+commonnoun chunks
  *    ("the dragon"), mirroring spaCy noun_chunks (relationships.py:236-250)
  *  - a verb token directly preceded by a closing quote is speech
  *    attribution ("...," said X), which the dependency path would parse as
  *    an inverted nsubj with no dobj -> no triple; we skip it likewise
  *  - NPs inside a quoted region are not arguments of verbs outside it
  *    (spaCy parses quoted content as ccomp, never dobj)
  *  - triple emitted iff >=1 argument matches the passage's mention set
  *    (exact -> article-strip -> substring containment, T4
  *    relationships.py:252-276); confidence 0.7
  *  - per-passage dedup on lower(subj)|pred|lower(obj) keeping max
  *    confidence (T6, relationships.py:384-398)
  *  - self-loops (subject == object text) dropped: positional fallback for
  *    conjunction-shared subjects the dep parse would leave subject-less
  */
object Triples {

  private val WordToken: Pattern = Pattern.compile("""[A-Za-z][A-Za-z'-]*""")
  private val DetChunk: Pattern =
    Pattern.compile("""\b([Tt]he|[Aa]n?)\s+([a-z]+(?:\s+[a-z]+)?)\b""")
  /** T3 NP widening (relationships.py:236-250 compound/amod/det lefts):
    * a mention directly preceded by a determiner plus up to three
    * lowercase modifier words widens to one NP spanning from the
    * determiner — "the great dragon Smaug" binds as a single phrase whose
    * head keeps the mention's identity. Anchored at the prefix end so it
    * only fires on contiguous lefts; lexicon-verb words disqualify the
    * widening (a dependency parse would attach them as the predicate, not
    * a modifier).
    */
  private val DetPrefix: Pattern =
    Pattern.compile("""\b([Tt]he|[Aa]n?)\s+((?:[a-z]+(?:'[a-z]+)?\s+){0,3})$""")
  private val QuoteRegion: Pattern =
    Pattern.compile("\"[^\"]*\"|“[^”]*”")

  /** A linked mention span visible to the extractor. */
  final case class Arg(text: String, start: Int, end: Int,
      id: Option[String], etype: Option[String])

  private final case class Np(text: String, start: Int, end: Int,
      fromMention: Boolean)

  /** T4 argument->entity matching: exact, article-strip, then containment
    * either way. Returns the matching mention if any. Takes the
    * PRE-LOWERCASED (key, arg) list — building it here allocated a fresh
    * list of lowercased strings twice per verb occurrence in the
    * extraction hot loop (round-5 review; same allocation discipline as
    * the DetPrefix index walk above).
    */
  private def findEntity(text: String, byKey: Seq[(String, Arg)]): Option[Arg] = {
    val t = text.toLowerCase(java.util.Locale.ROOT).trim
    byKey.find(_._1 == t).map(_._2)
      .orElse {
        val stripped = Seq("the ", "a ", "an ").collectFirst {
          case p if t.startsWith(p) => t.substring(p.length)
        }
        stripped.flatMap(s => byKey.find(_._1 == s).map(_._2))
      }
      .orElse(byKey.find { case (k, _) => k.contains(t) || t.contains(k) }
        .map(_._2))
  }

  /** Pure per-passage extractor — unit-testable without Spark. */
  private[extract] def extract(
      text: String,
      mentions: Seq[Arg]): Seq[(String, String, Option[Arg], String, Option[Arg], String)] = {
    // quote regions (for argument/attribution scoping)
    val quotes = {
      val q = QuoteRegion.matcher(text)
      val b = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      while (q.find()) b += ((q.start, q.end))
      b.toSeq
    }
    def quoteOf(p: Int): Int = quotes.indexWhere(r => p >= r._1 && p < r._2)

    // built once per passage, shared by every findEntity call
    val mentionsByKey =
      mentions.map(a => a.text.toLowerCase(java.util.Locale.ROOT) -> a)

    // candidate noun phrases: (det-widened) mentions + det-chunks
    val nps = scala.collection.mutable.ArrayBuffer.empty[Np]
    val mentionNps = mentions.map { m =>
      // region(), not substring(): identical match semantics (anchoring
      // bounds are on by default, so `$` matches at the region end and
      // `\b` sees the region edge exactly like a string boundary) without
      // copying up-to-the-mention text once per mention in the extraction
      // hot loop (round-5 GC work: the 16-thread scaling leg is
      // allocation-bound)
      val pm = DetPrefix.matcher(text)
      pm.region(0, m.start)
      val widened =
        if (pm.find()) {
          val mods = pm.group(2).split("\\s+").filter(_.nonEmpty)
          if (mods.forall(w => !Lexicon.VerbToRelationship.contains(w.toLowerCase(java.util.Locale.ROOT))))
            Some(Np(text.substring(pm.start, m.end), pm.start, m.end,
              fromMention = true))
          else None
        } else None
      widened.getOrElse(Np(m.text, m.start, m.end, fromMention = true))
    }
    mentionNps.foreach(nps += _)
    val dm = DetChunk.matcher(text)
    while (dm.find()) {
      // the greedy two-word group would swallow a following lexicon verb
      // into the NP ("The dragon attacked Smaug" -> chunk "The dragon
      // attacked", leaving no NP ending before the verb and dropping the
      // triple). Trim trailing lexicon-verb words — the same
      // disqualification DetPrefix applies (a dependency parse attaches
      // them as the predicate, not part of the noun chunk); round-5 review.
      // Index walk, not split(): this runs once per det-chunk in the
      // extraction hot loop, and a split("\\s+") here recompiled the
      // pattern and allocated a word array per chunk — measured as 16%
      // GC wall on the 16-core bench leg. The common no-trailing-verb
      // case now allocates one small substring (the set lookup key).
      // A chunk whose words are ALL lexicon verbs stays whole — "the
      // attacked Smaug" reads the verb as a participle modifier, the
      // documented widening-gate compromise (TriplesSpec).
      val g2s = dm.start(2)
      var end = dm.end
      var trimmedAny = false
      var done = false
      while (!done) {
        var we = end
        while (we > g2s && Character.isWhitespace(text.charAt(we - 1))) we -= 1
        if (we == g2s) { end = dm.end; done = true } // every word was a verb
        else {
          var ws = we
          while (ws > g2s && !Character.isWhitespace(text.charAt(ws - 1))) ws -= 1
          if (Lexicon.VerbToRelationship.contains(text.substring(ws, we).toLowerCase(java.util.Locale.ROOT))) {
            end = ws; trimmedAny = true
          } else {
            end = if (trimmedAny) we else dm.end
            done = true
          }
        }
      }
      val chunkEnd = end
      val overlapsMention = mentionNps.exists(m =>
        !(chunkEnd <= m.start || dm.start >= m.end))
      if (!overlapsMention)
        nps += Np(text.substring(dm.start, chunkEnd), dm.start, chunkEnd,
          fromMention = false)
    }
    val sortedNps = nps.sortBy(_.start).toSeq

    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, String, Option[Arg], String, Option[Arg], String)]

    val wm = WordToken.matcher(text)
    while (wm.find()) {
      val token = wm.group(0)
      val tLower = token.toLowerCase(java.util.Locale.ROOT)
      Lexicon.VerbToRelationship.get(tLower).foreach { pred =>
        val vStart = wm.start
        val vEnd = wm.end
        // attribution skip: closing quote (optionally + comma) right before
        val before = text.substring(math.max(0, vStart - 3), vStart)
        val isAttribution = before.matches(""".*["”],?\s?""")
        if (!isAttribution) {
          val vq = quoteOf(vStart)
          val subj = sortedNps.filter(n => n.end <= vStart && quoteOf(n.start) == vq)
            .sortBy(n => -n.end).headOption
          val obj = sortedNps.filter(n => n.start >= vEnd && quoteOf(n.start) == vq)
            .sortBy(n => n.start).headOption
          (subj, obj) match {
            case (Some(s), Some(o)) if !s.text.equalsIgnoreCase(o.text) =>
              val se = findEntity(s.text, mentionsByKey)
              val oe = findEntity(o.text, mentionsByKey)
              if (se.isDefined || oe.isDefined) {
                val key = s"${s.text.toLowerCase(java.util.Locale.ROOT)}|$pred|${o.text.toLowerCase(java.util.Locale.ROOT)}"
                if (!out.contains(key))
                  out(key) = (s.text, pred, se, o.text, oe, token)
              }
            case _ =>
          }
        }
      }
    }
    out.values.toSeq
  }

  /** FUSED hot path: detection + SVO extraction + broadcast-index linking
    * in ONE narrow mapPartitions over passages — zero shuffles before the
    * edge aggregate. This is the 100 TB shape: scan -> narrow extract ->
    * partial-agg. Linking semantics are identical to the join-cascade
    * Linker (LocalLinker; asserted by LinkerSpec).
    */
  def fromPassagesFused(
      spark: SparkSession,
      passages: DataFrame,
      seeds: Seq[graft.extract.SeedEntity] = Seeds.default): Dataset[Triple] = {
    import spark.implicits._
    val gaz = spark.sparkContext.broadcast(Mentions.gazetteer(seeds))
    val linker = spark.sparkContext.broadcast(new LocalLinker(seeds))
    passages
      .select("doc_id", "pos", "passage_id", "text")
      .as[(String, Int, String, String)]
      .mapPartitions { it =>
        val g = gaz.value
        val lk = linker.value
        it.flatMap { case (docId, pos, pid, text) =>
          val raw = Mentions.detect(text, g)
          if (raw.size < 2) Iterator.empty // T7 gate
          else {
            val args = raw.map { r =>
              val linked = lk.lookup(r.text)
              // on lookup miss, infer the type like the join path does
              // (Linker.link's is_new branch) — fused/join type parity
              Arg(r.text, r.start, r.end,
                linked.map(_._1),
                linked.map(_._2)
                  .orElse(Some(Linker.inferTypeLocal(r.label, r.text))))
            }
            extract(text, args).iterator.map {
              case (st, pred, se, ot, oe, rawVerb) =>
                Triple(docId, pos, pid,
                  st, se.flatMap(_.id), se.flatMap(_.etype),
                  pred, rawVerb,
                  ot, oe.flatMap(_.id), oe.flatMap(_.etype),
                  0.7, "svo")
            }
          }
        }
      }
  }

  /** Join-based variant (one co-partitioned shuffle to collect the
    * per-passage mention set, then a narrow mapPartitions); kept for
    * pipelines that already materialized linked mentions.
    */
  def fromPassages(
      spark: SparkSession,
      passages: DataFrame,
      linkedMentions: DataFrame): Dataset[Triple] = {
    import spark.implicits._
    val perPassage = linkedMentions
      .groupBy("doc_id", "pos")
      .agg(collect_list(struct(
        col("text"), col("start"), col("end"),
        col("canonical_id"), col("entity_type"))).as("ments"))
      .filter(size(col("ments")) >= 2)

    passages
      .select("doc_id", "pos", "passage_id", "text")
      .join(perPassage, Seq("doc_id", "pos"))
      .select(col("doc_id"), col("pos"), col("passage_id"), col("text"),
        col("ments"))
      .as[(String, Int, String, String, Seq[(String, Int, Int, Option[String], Option[String])])]
      .mapPartitions { it =>
        it.flatMap { case (docId, pos, pid, text, ments) =>
          val args = ments.map(m => Arg(m._1, m._2, m._3, m._4, m._5))
          extract(text, args).map { case (st, pred, se, ot, oe, raw) =>
            Triple(docId, pos, pid,
              st, se.flatMap(_.id), se.flatMap(_.etype),
              pred, raw,
              ot, oe.flatMap(_.id), oe.flatMap(_.etype),
              0.7, "svo")
          }
        }
      }
  }
}

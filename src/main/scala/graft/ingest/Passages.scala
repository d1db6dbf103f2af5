package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Passage rows from the docs table, plus the per-row span-sequence
  * validation stage required by BASELINE.json's input_hint.
  *
  * Mirrors the reference's `split_into_passages`
  * (/root/reference/src/book_graph_analyzer/ingest/splitter.py:34-78): the
  * input table is pre-split (SURVEY.md §1.4), so ingest is a single
  * `posexplode(spans)` — a narrow transformation; no shuffle.
  */
object Passages {

  /** Explode docs(doc_id, spans) to one row per span.
    * passage_id scheme mirrors generate_passage_id (splitter.py:173-178).
    */
  def fromDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "span")))
      .select(
        col("doc_id"), col("pos"),
        col("span.kind").as("kind"),
        col("span.text").as("text"),
        col("span.media_ref").as("media_ref"),
        col("span.offset").as("offset"),
        concat(lit("p_"), col("doc_id"), lit("_s"), col("pos")).as("passage_id"))

  /** Only the spans that enter mention/triple extraction (SURVEY.md §1.4:
    * media spans flow through untouched). */
  def textual(passages: DataFrame): DataFrame =
    passages.filter(col("kind") === "text" || col("kind") === "dialogue")

  /** Span-sequence invariant: after ingest, the (kind, text, media_ref,
    * order) sequence of every doc must equal the source rows exactly.
    * Returns one row per doc with an `ok` flag; a full-outer join on
    * (doc_id, pos) so both drops and phantoms are caught.
    */
  def validate(passages: DataFrame, sourceRows: DataFrame): DataFrame = {
    val p = passages.select(col("doc_id"), col("pos"),
      col("kind").as("p_kind"), col("text").as("p_text"),
      col("media_ref").as("p_ref"), col("offset").as("p_off"),
      lit(true).as("p_present"))
    val s = sourceRows.select(col("doc_id"), col("pos"),
      col("kind").as("s_kind"), col("text").as("s_text"),
      col("media_ref").as("s_ref"), col("offset").as("s_off"),
      lit(true).as("s_present"))
    p.join(s, Seq("doc_id", "pos"), "full_outer")
      // null-safe equality (<=>) on EVERY field, not just media_ref: the
      // validator is a generic span-sequence checker and a table whose
      // spans carry null text/kind/offset on both sides must compare
      // equal, not fail with a three-valued-logic null (round-5 review).
      // The presence flags keep drops/phantoms failing — field-wise <=>
      // alone would pass an all-null span row against a missing row.
      .withColumn("row_ok",
        col("p_present").isNotNull && col("s_present").isNotNull &&
          (col("p_kind") <=> col("s_kind")) && (col("p_text") <=> col("s_text")) &&
          (col("p_ref") <=> col("s_ref")) && (col("p_off") <=> col("s_off")))
      .groupBy("doc_id")
      .agg((count(lit(1)) === sum(when(col("row_ok"), 1L).otherwise(0L))).as("ok"))
  }
}

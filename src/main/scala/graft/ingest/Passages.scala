package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
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
    // One union + hash aggregate instead of a full-outer sort-merge join:
    // both forms must meet on (doc_id, pos), but the aggregate skips the
    // two sorts and the join machinery (guide §2.4; measured ~1 s -> ~0.7 s
    // at sf0.1). Exact pairwise-join semantics are preserved, including on
    // duplicate (doc_id, pos) keys: the old full-outer join compared every
    // p-row against every s-row of the key, which is equivalent to "all
    // p-rows equal AND all s-rows equal AND p == s" — expressed below as
    // field-wise null-safe equality of the per-side min/max value structs
    // (structs ordering-equal iff field-wise <=>-equal, so min == max
    // iff the side is uniform).
    // Null handling (round-5 review): <=> on EVERY field, so spans with
    // null text/kind/offset on both sides compare equal; the presence
    // counts keep drops/phantoms failing — a missing side has np/ns == 0
    // and the conjunction short-circuits to false, never null.
    def side(df: DataFrame, tag: Int) = df.select(
      col("doc_id"), col("pos"), lit(tag).as("side"),
      struct(col("kind"), col("text"), col("media_ref"), col("offset"))
        .as("v"))
    def eqNS(a: Column, b: Column) =
      (a("kind") <=> b("kind")) && (a("text") <=> b("text")) &&
        (a("media_ref") <=> b("media_ref")) && (a("offset") <=> b("offset"))
    side(passages, 1).union(side(sourceRows, 2))
      .groupBy("doc_id", "pos")
      .agg(
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("np"),
        sum(when(col("side") === 2, 1L).otherwise(0L)).as("ns"),
        min(when(col("side") === 1, col("v"))).as("p_min"),
        max(when(col("side") === 1, col("v"))).as("p_max"),
        min(when(col("side") === 2, col("v"))).as("s_min"),
        max(when(col("side") === 2, col("v"))).as("s_max"))
      .withColumn("row_ok",
        col("np") >= 1 && col("ns") >= 1 &&
          eqNS(col("p_min"), col("p_max")) &&
          eqNS(col("s_min"), col("s_max")) &&
          eqNS(col("p_min"), col("s_min")))
      .groupBy("doc_id")
      .agg((count(lit(1)) === sum(when(col("row_ok"), 1L).otherwise(0L))).as("ok"))
  }
}

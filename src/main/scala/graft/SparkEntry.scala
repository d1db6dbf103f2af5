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

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_passages")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_passages" -> ((s, dir) =>
      Passages.fromDocs(DocsSynth.docs(s, dir))
        .select("doc_id", "pos", "kind", "text", "media_ref", "offset")),
    "q02_span_invariant" -> ((s, dir) =>
      Passages.validate(
        Passages.fromDocs(DocsSynth.docs(s, dir)),
        DocsSynth.spanRows(s, dir)))
  )

  def oracleSql: Map[String, String] = Map(
    "q01_passages" -> Oracles.overSyn(
      "SELECT doc_id, pos, kind, text, media_ref, \"offset\" FROM syn"),
    "q02_span_invariant" -> Oracles.overSyn(
      "SELECT DISTINCT doc_id, TRUE AS ok FROM syn")
  )
}

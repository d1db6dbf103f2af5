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
          round(col("link_confidence"), 4).as("link_confidence"),
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
      val mentions = Pipeline.mentions(s, dir)
      val (assignment, _) = graft.extract.Canonicalize.clusters(
        s, Pipeline.textual(s, dir), mentions)
      graft.extract.Canonicalize.registry(s, mentions, assignment)
    })
  )

  def oracleSql: Map[String, String] = {
    val withEntities = (sel: String) =>
      Oracles.overSyn(s", ${Oracles.entityRowsCte}\n$sel")
    val withTriples = (sel: String) =>
      Oracles.overSyn(s", ${Oracles.tripleRowsCte}\n$sel")
    val withClusters = (sel: String) =>
      Oracles.overSyn(
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
          |       round(link_confidence, 4) AS link_confidence, is_new
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
          |GROUP BY 1""".stripMargin)
    )
  }
}

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
       |    CAST((7*l_partkey + 13*l_linenumber + 3*l_suppkey) % 20 AS INT) AS m,
       |    CAST(2900 + l_partkey % 60 AS INT) AS y
       |  FROM lineitem
       |  WINDOW w AS (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey)
       |)""".stripMargin

  private def charAt(i: String) = sqlElem(Chars, i)
  private def aliasAt(i: String) = sqlElem(CharAliases, i)
  private def placeAt(i: String) = sqlElem(Places, i)
  private def verbAt(i: String) = sqlElem(Verbs.map(_._1), i)
  private def predAt(i: String) = sqlElem(Verbs.map(_._2), i)
  /** 1 when the verb's object is a place. */
  private def objKindAt(i: String) =
    s"(${Verbs.map(_._3).mkString("[", ", ", "]")})[CAST(($i) AS INT) + 1]"

  /** Full span derivation: doc_id, pos, kind, text, media_ref, offset
    * plus the selector columns for downstream arithmetic oracles.
    */
  val synCte: String = {
    val subj = charAt("s")
    val objC = charAt("o")
    val place = placeAt("p")
    val alias = aliasAt("s")
    val verb = verbAt("v")
    val obj = s"CASE WHEN ${objKindAt("v")} = 1 THEN $place ELSE $objC END"
    val typo = s"substring($subj, 1, length($subj) - 1)"
    s"""$base,
       |syn0 AS (
       |  SELECT doc_id, pos, s, o, v, p, m, y,
       |    CASE WHEN m BETWEEN 11 AND 13 THEN 'dialogue'
       |         WHEN m >= 18 THEN 'media' ELSE 'text' END AS kind,
       |    CASE
       |      WHEN m <= 10 THEN $subj || ' ' || $verb || ' ' || $obj || '.'
       |      WHEN m BETWEEN 11 AND 12 THEN
       |        '"We must ride to ' || $place || ' at dawn," said ' || $subj || '.'
       |      WHEN m = 13 THEN $subj || ' said, "All is well in ' || $place || '."'
       |      WHEN m = 14 THEN $typo || ' ' || $verb || ' ' || $obj || '.'
       |      WHEN m BETWEEN 15 AND 16 THEN
       |        $subj || ' (also known as ' || $alias || ') rested quietly.'
       |      WHEN m = 17 THEN $subj || ' returned to ' || $place ||
       |        ' in the year ' || y || ' of the Third Age.'
       |      ELSE '' END AS text,
       |    CASE WHEN m >= 18 THEN
       |      'm/' || l_orderkey || '/' || l_linenumber || '.png' END AS media_ref
       |  FROM syn_base
       |),
       |syn AS (
       |  SELECT *, CAST(coalesce(sum(length(text) + 1) OVER (
       |      PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS "offset"
       |  FROM syn0
       |)""".stripMargin
  }

  /** Wrap a SELECT over `syn` into a full oracle statement. */
  def overSyn(select: String): String = s"WITH $synCte\n$select"
}

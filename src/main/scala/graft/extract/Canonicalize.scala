package graft.extract

import java.util.regex.Pattern
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cc.ConnectedComponents

/** Dynamic (zero-seed) entity canonicalization — reference
  * DynamicEntityResolver (extract/dynamic_resolver.py), re-expressed as
  * alias-similarity edge generation + connected components (SURVEY.md §2.5).
  *
  * Edge sources, each mirroring a reference merge rule:
  *  - article-strip equality ("the X" == "X")           (D1 tier 2)
  *  - fuzzy indel ratio >= 0.90, blocked self-join      (D1 tier 3)
  *  - explicit alias statements, 4 regexes              (D6)
  *  - co-occurrence >= 3 passing _should_merge           (D2-D4)
  *
  * Cluster representative: the component's first-seen mention by total
  * order (doc_id, pos, start) — deterministic, order-independent stand-in
  * for the reference's "first mention wins" (§7.4 risk 1).
  */
object Canonicalize {

  /** D6 alias regexes, ported from dynamic_resolver.py:328-334. */
  private val AliasPatterns: Seq[Pattern] = Seq(
    """([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*),?\s+whose\s+(?:real\s+)?name\s+was\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)""",
    """([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)\s*\((?:also\s+)?(?:known|called)\s+(?:as\s+)?([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)\)""",
    """([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*),?\s+or\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)\s+as\s+(?:he|she|they)\s+(?:was|were)\s+(?:called|known)""",
    """([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*),?\s+(?:whom|who)\s+(?:they|we|people)\s+(?:called|named)\s+([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)"""
  ).map(Pattern.compile)

  /** Literal substring each alias pattern REQUIRES (its regex contains it
    * verbatim, case-sensitively): a passage without the literal cannot
    * match, so the expensive nested-quantifier scan is skipped. P1 needs
    * "name" ("whose name was" / "whose real name was"; "name" rather
    * than "name was" because the regex allows any \s+ between the words),
    * P2/P3 need "known" or "called", P4 needs "called" or "named" (and
    * "named" contains "name"). Gate equivalence is property-tested in
    * CanonicalizeSpec.
    */
  private val AliasGates: IndexedSeq[Seq[String]] = IndexedSeq(
    Seq("name"), Seq("known", "called"), Seq("known", "called"),
    Seq("called", "named"))

  /** Explicit alias pairs from passage text (lowercased keys). The
    * keyword gate turns 4 full regex scans per passage into (at most) 3
    * cheap `contains` scans on the overwhelming majority of passages
    * that mention no alias construction — at corpus scale the alias
    * regex pass over every passage was ~30% of the cluster-edge build
    * (EdgeProbe, rep-16: 2.96 s of ~10.6 s).
    */
  def aliasPairs(spark: SparkSession, textualPassages: DataFrame): DataFrame = {
    import spark.implicits._
    textualPassages.select("text").as[String].mapPartitions { it =>
      it.flatMap { text =>
        // union of all per-pattern gates: "named" ⊃ "name", so three
        // literals cover the four patterns
        if (!text.contains("name") && !text.contains("known") &&
          !text.contains("called")) Nil
        else AliasPatterns.indices.flatMap { pi =>
          if (!AliasGates(pi).exists(text.contains)) Nil
          else {
            val m = Hot.of(AliasPatterns(pi), text)
            val b = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
            while (m.find()) b += ((m.group(1).toLowerCase(java.util.Locale.ROOT), m.group(2).toLowerCase(java.util.Locale.ROOT)))
            b
          }
        }
      }
    }.toDF("src", "dst").distinct()
  }

  /** Same-passage co-occurrence pair counts by mention-text key (D2).
    * Pairs are generated inside a per-passage fold (collect_set + explode
    * of local combinations) — no self-join, so head-entity skew cannot
    * produce a hot join key; passages are sentences, so the per-row pair
    * count is tiny on real data.
    *
    * The quadratic local expansion is additionally CAPPED (VERDICT r04
    * #5): only the first `maxKeysPerPassage` distinct keys (canonical
    * sorted order — deterministic from the key set alone, independent of
    * row arrival order) enter the pair expansion, so an adversarial
    * mention-dense passage costs at most K(K-1)/2 pairs per row
    * (K=64 -> 2016) instead of unbounded quadratic work in one task. The
    * per-group state before the cap is only O(distinct keys) (linear, a
    * collect_set). The cap NEVER BINDS on the real corpora — the synth
    * templates plant at most 3 mentions per passage — so query results
    * and oracles are unchanged; it exists to bound the damage of a
    * pathological input at scale.
    */
  def cooccurrence(
      mentions: DataFrame, maxKeysPerPassage: Int = 64): DataFrame =
    pairRows(mentions, maxKeysPerPassage, Linker.cleanKey(col("text")))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("cnt"))

  /** The per-passage pair expansion feeding [[cooccurrence]] — one row per
    * (passage, unordered key pair). `keyExpr` lets callers that already
    * carry a cleaned key column (CrossBook's pinned mention table) skip
    * the per-row cleanKey regex re-derivation; cleanKey is idempotent, so
    * passing the precomputed column is exact.
    */
  private[graft] def pairRows(
      mentions: DataFrame, maxKeysPerPassage: Int,
      keyExpr: org.apache.spark.sql.Column): DataFrame = {
    val keyed = mentions.select(col("doc_id"), col("pos"), keyExpr.as("k"))
    val perPassage = keyed.groupBy("doc_id", "pos")
      .agg(slice(array_sort(collect_set(col("k"))), 1, maxKeysPerPassage)
        .as("ks"))
      .filter(size(col("ks")) >= 2)
    // local pair expansion: (ks[i], ks[j]) for i<j
    perPassage.select(explode(expr(
      """flatten(transform(ks, (x, i) ->
        |  transform(slice(ks, i + 2, size(ks)), y -> struct(x AS src, y AS dst))))"""
        .stripMargin)).as("pair"))
      .select(col("pair.src").as("src"), col("pair.dst").as("dst"))
  }

  /** Blocked fuzzy self-join: equi-join on (first char, length) with the
    * length band exploded on the src side — equivalent candidate set to
    * (first char, |len diff| <= 3) but with length IN the shuffle key.
    * Shared by within-book (0.90) and cross-book (0.85) canonicalization.
    */
  private[graft] def fuzzyEdges(
      nodes: DataFrame,
      threshold: Double,
      ratioUdf: org.apache.spark.sql.expressions.UserDefinedFunction): DataFrame = {
    val n1 = nodes.select(col("node").as("src"),
        substring(col("node"), 1, 1).as("blk"),
        length(col("node")).as("len1"))
      .withColumn("len",
        explode(sequence(greatest(col("len1") - 3, lit(1)), col("len1") + 3)))
    val n2 = nodes.select(col("node").as("dst"),
      substring(col("node"), 1, 1).as("blk"), length(col("node")).as("len"))
    n1.join(n2, Seq("blk", "len"))
      .filter(col("src") < col("dst"))
      .filter(ratioUdf(col("src"), col("dst")) >= threshold)
      .select("src", "dst")
  }

  /** _should_merge heuristic (D4, dynamic_resolver.py:244-264):
    * substring containment either way, or "the X" == X.
    */
  private def shouldMerge(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    a.contains(b) || b.contains(a) ||
      (a === concat(lit("the "), b)) || (b === concat(lit("the "), a))

  /** Article-strip equality edges: "the X" == "X" (D1 tier 2). */
  private[graft] def articleEdges(nodes: DataFrame): DataFrame = {
    val stripped = nodes
      .withColumn("stripped", Linker.stripArticle(col("node")))
      .filter(col("stripped") =!= col("node"))
    stripped
      .join(nodes.withColumnRenamed("node", "dst"),
        col("stripped") === col("dst"))
      .select(col("node").as("src"), col("dst"))
  }

  /** Co-occurrence >= 3 passing the merge heuristic (D2-D4, D3 default
    * min_cooccurrence=3, dynamic_resolver.py:196).
    */
  private[graft] def coocMergeEdges(
      mentions: DataFrame,
      keyExpr: Option[org.apache.spark.sql.Column] = None): DataFrame =
    // shouldMerge depends only on (src, dst), so it commutes with the
    // pair-count aggregate: filtering BEFORE the groupBy shuffles only the
    // containment-passing pairs (rare — different co-occurring names
    // seldom contain each other) instead of every co-occurrence pair
    // (guide §2.3 aggregate-before-shuffle / project-early; the unfiltered
    // pair count was the single largest piece of the q37/q51 probe).
    // count(filter(pairs)) >= 3 == filter(count(pairs) >= 3) exactly.
    pairRows(mentions, 64,
      keyExpr.getOrElse(Linker.cleanKey(col("text"))))
      .filter(shouldMerge(col("src"), col("dst")))
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 3)
      .select("src", "dst")

  /** Build the full alias-similarity edge set over mention keys.
    * `pinnedNodes`: an already-materialized distinct node table — callers
    * that also need the node set (CC seeding) pass theirs so the
    * full-mention-table distinct shuffle runs exactly once.
    */
  /** Mention-key expression for a mention table: the pre-materialized
    * `mkey` column when present (Pipeline.mentions stores it with the
    * stage — cleanKey costs ~2 s per full-table evaluation at sf0.1),
    * else the cleanKey derivation. cleanKey is deterministic, so the two
    * are interchangeable.
    */
  private[graft] def keyOf(mentions: DataFrame): org.apache.spark.sql.Column =
    if (mentions.columns.contains("mkey")) col("mkey")
    else Linker.cleanKey(col("text"))

  def edges(
      spark: SparkSession,
      textualPassages: DataFrame,
      mentions: DataFrame,
      pinnedNodes: Option[DataFrame] = None,
      pinnedAliasPairs: Option[DataFrame] = None,
      pinnedCoocEdges: Option[DataFrame] = None): DataFrame = {
    val ratioUdf = udf((a: String, b: String) => Linker.indelRatio(a, b))
    // distinct node keys: a shuffle over the full mention table — pin the
    // (tiny) result once, or every edge family below re-runs it inside the
    // union plan (profiled 6x recompute = most of the edge-build time)
    val nodes = pinnedNodes.getOrElse(
      mentions.select(keyOf(mentions).as("node"))
        .distinct().localCheckpoint(true))

    // 1. article-strip equality
    val eArticle = articleEdges(nodes)

    // 2. blocked fuzzy self-join at the 0.90 cluster-match threshold
    //    (dynamic_resolver.py:148-151). The candidate set is (first char,
    //    |len diff| <= 3), and BOTH dimensions are in the equi-join key:
    //    the src side explodes its length band so the join key is
    //    (first char, length) — ~26 x |length| buckets instead of ~26, so
    //    head-letter skew cannot concentrate the self-join on one reducer
    //    at corpus scale (round-1 VERDICT.md scale issue #5).
    val eFuzzy = fuzzyEdges(nodes, 0.90, ratioUdf)

    // 3. explicit alias statements — callers with a session-cached alias
    //    table (Pipeline.aliasPairs) pass it so the full-corpus gated
    //    regex scan runs once per session, not once per edge build
    val eAlias = pinnedAliasPairs.getOrElse(aliasPairs(spark, textualPassages))
      .join(nodes.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
      .join(nodes.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
      .select("src", "dst")

    // 4. co-occurrence >= 3 passing the merge heuristic — callers with a
    //    session-cached edge table (Pipeline.coocEdges) pass it so the
    //    full-mention-table pair expansion runs once per session
    val eCooc = pinnedCoocEdges.getOrElse(
      coocMergeEdges(mentions, keyExpr = Some(keyOf(mentions))))

    eArticle.union(eFuzzy).union(eAlias).union(eCooc).distinct()
  }

  /** Full canonicalization: (node -> cluster) assignment plus superstep
    * metrics. Cluster id = min member key (deterministic). With
    * `checkpoints` set, the edge derivation and every CC superstep persist
    * through the checkpoint table (stages `cc_edges`, `cc_sym`,
    * `cc_labels_<k>`) so a killed run resumes mid-CC.
    */
  def clusters(
      spark: SparkSession,
      textualPassages: DataFrame,
      mentions: DataFrame,
      checkpoints: Option[graft.graph.Checkpoints] = None,
      pinnedAliasPairs: Option[DataFrame] = None,
      pinnedCoocEdges: Option[DataFrame] = None)
      : (DataFrame, Seq[ConnectedComponents.Superstep]) = {
    // materialize the mention stage once — nodes and three of the four
    // edge families all read it; the distinct node set is pinned once and
    // shared between the edge builder and the CC seed. The pre-derived
    // mkey rides along when the input has one (see keyOf).
    val m = mentions
      .select(Seq(col("doc_id"), col("pos"), col("text")) ++
        (if (mentions.columns.contains("mkey")) Seq(col("mkey")) else Nil): _*)
      .localCheckpoint(true)
    val nodes = m.select(keyOf(m).as("node"))
      .distinct().localCheckpoint(true)
    val e = checkpoints match {
      case Some(ck) =>
        ck.stage("cc_edges") {
          edges(spark, textualPassages, m, Some(nodes), pinnedAliasPairs,
            pinnedCoocEdges)
        }
      case None =>
        edges(spark, textualPassages, m, Some(nodes), pinnedAliasPairs,
          pinnedCoocEdges)
    }
    ConnectedComponents.run(spark, nodes, e, checkpoints = checkpoints)
  }

  /** D8 dynamic-registry resolve (dynamic_resolver.py:352-389): resolve
    * free text against a post-CC assignment — exact key (conf 1.0) ->
    * article-stripped (0.95) -> best fuzzy >= 0.85 (conf = ratio). The
    * registry side is broadcast; adds (cluster, resolve_confidence) to the
    * input, nulls when unresolved.
    */
  def resolve(
      spark: SparkSession,
      texts: DataFrame,
      assignment: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ratioUdf = udf((a: String, b: String) => Linker.indelRatio(a, b))
    val reg = broadcast(assignment.select(
      col("node").as("rkey"), col("cluster").as("rcluster")))
    // resolve DISTINCT cleaned keys, then join the verdicts back onto the
    // full input — duplicate input texts must each keep their row (the
    // round-2 qkey-window dropped all but one row per distinct key,
    // ADVICE r02 medium), and the expensive fuzzy tier runs once per key
    // instead of once per row.
    val m = texts.withColumn("qkey", Linker.cleanKey(col("text")))
    val keys = m.select("qkey").distinct()
      .withColumn("qkey2", Linker.stripArticle(col("qkey")))

    val t1 = keys.join(reg, col("qkey") === col("rkey"), "left")
    val hit1 = t1.filter(col("rcluster").isNotNull)
      .withColumn("resolve_confidence", lit(1.0))
    val miss1 = t1.filter(col("rcluster").isNull).drop("rkey", "rcluster")

    val t2 = miss1.join(reg, col("qkey2") === col("rkey"), "left")
    val hit2 = t2.filter(col("rcluster").isNotNull)
      .withColumn("resolve_confidence", lit(0.95))
    val miss2 = t2.filter(col("rcluster").isNull).drop("rkey", "rcluster")

    val cand = miss2.join(reg,
        substring(col("qkey"), 1, 1) === substring(col("rkey"), 1, 1) &&
          abs(length(col("qkey")) - length(col("rkey"))) <= 3, "left")
      .withColumn("ratio",
        when(col("rkey").isNotNull, ratioUdf(col("qkey"), col("rkey"))))
      .withColumn("ok", col("ratio") >= 0.85)
    val w = Window.partitionBy("qkey")
      .orderBy(col("ok").desc_nulls_last, col("ratio").desc_nulls_last,
        col("rcluster").asc_nulls_last)
    val t3 = cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .withColumn("rcluster",
        when(col("ok").isNotNull && col("ok"), col("rcluster")))
      .withColumn("resolve_confidence",
        when(col("ok").isNotNull && col("ok"), col("ratio")))
      .drop("rn", "ratio", "ok")

    val resolved = hit1.unionByName(hit2)
      .unionByName(t3, allowMissingColumns = false)
      .select(col("qkey"), col("rcluster").as("cluster"),
        col("resolve_confidence"))
    m.join(resolved, Seq("qkey"), "left").drop("qkey")
  }

  /** Cluster registry: representative name = first-seen mention text by
    * (doc_id, pos, start); sizes and mention counts per cluster.
    */
  def registry(
      spark: SparkSession,
      mentions: DataFrame,
      assignment: DataFrame): DataFrame =
    registryFromNodes(registryNodes(mentions, assignment))

  /** First level of the registry aggregate: one row per (cluster, node)
    * with its first-seen mention and count — the full-mention-table pass.
    * A pure function of (mentions, assignment); Pipeline caches it per
    * session so q10 and q38 share one pass (each previously re-ran it per
    * bench pass). Exact two-level split: member_count == number of
    * (cluster, node) groups, mention_count == sum of per-group counts,
    * and the global first-seen mention is the min-by over the per-node
    * first-seens (seen keys are unique — dedup guarantees one span per
    * (doc, pos, start)).
    */
  def registryNodes(mentions: DataFrame, assignment: DataFrame): DataFrame = {
    val keyed = mentions
      .withColumn("node", keyOf(mentions))
      // width 19 covers any Long: lpad TRUNCATES values wider than the
      // pad, which at width 6 silently corrupted ordering (and collided
      // distinct positions) past 10^6 passages/offsets — exactly the
      // corpus scale this targets (round-5 review)
      .withColumn("seen_key",
        concat(col("doc_id"), lit("#"),
          lpad(col("pos").cast("string"), 19, "0"), lit("#"),
          lpad(col("start").cast("string"), 19, "0")))
    // grouping by (cluster, node) first runs with map-side partial
    // aggregation (min_by/min/count all support partials) — countDistinct
    // next to plain aggregates would Expand every mention row 2x before
    // the shuffle; the second level is a per-node-sized table
    keyed.join(assignment, Seq("node"))
      .groupBy("cluster", "node")
      .agg(
        min_by(col("text"), col("seen_key")).as("node_first_text"),
        min(col("seen_key")).as("node_first_seen"),
        count(lit(1)).as("cnt"))
  }

  /** Second level of the registry aggregate over [[registryNodes]]. */
  def registryFromNodes(nodeTable: DataFrame): DataFrame =
    nodeTable
      .groupBy(col("cluster"))
      .agg(
        min_by(col("node_first_text"), col("node_first_seen"))
          .as("canonical_name"),
        count(lit(1)).as("member_count"),
        sum(col("cnt")).as("mention_count"))
}

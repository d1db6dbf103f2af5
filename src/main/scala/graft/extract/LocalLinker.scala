package graft.extract

/** In-process seed lookup with EXACTLY the Linker join-cascade semantics
  * (exact 1.0 -> article-strip 0.95 -> blocked fuzzy >= 0.85, best by
  * (ratio desc, id asc)). Used inside fused mapPartitions stages where a
  * broadcast-join would force a shuffle barrier; LinkerSpec asserts the
  * two implementations agree key-for-key.
  */
final class LocalLinker(seeds: Seq[SeedEntity]) extends Serializable {

  // aliasRows is already one-row-per-key (last registration wins, the
  // reference's dict semantics), so this toMap cannot drop information —
  // the join cascade builds from the SAME deduped rows
  private val index: Map[String, (String, String, String)] =
    Seeds.aliasRows(seeds).map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  /** (firstChar, keys sorted) blocking for the fuzzy tier. */
  private val byFirst: Map[Char, Seq[String]] =
    index.keys.toSeq.sorted.groupBy(_.head)

  private def cleanKey(text: String): String =
    text.trim.split("\\s+").mkString(" ")
      .replaceAll("'s$", "").trim.toLowerCase(java.util.Locale.ROOT)

  private def stripArticle(k: String): String =
    k.replaceFirst("^(the |a |an )", "")

  /** Returns (canonical_id, entity_type, canonical_name, confidence). */
  def lookup(text: String): Option[(String, String, String, Double)] = {
    val k = cleanKey(text)
    if (k.isEmpty) return None
    index.get(k).map { case (id, t, n) => (id, t, n, 1.0) }
      .orElse {
        val s = stripArticle(k)
        if (s != k) index.get(s).map { case (id, t, n) => (id, t, n, 0.95) }
        else None
      }
      .orElse {
        val cands = byFirst.getOrElse(k.head, Nil)
          .filter(a => math.abs(a.length - k.length) <= 3)
          .map(a => (a, Linker.indelRatio(k, a)))
          .filter(_._2 >= 0.85)
        if (cands.isEmpty) None
        else {
          // best ratio; ties by canonical id asc (matches the join's
          // row_number ordering)
          val best = cands.map { case (a, r) =>
            val (id, t, n) = index(a); (id, t, n, r)
          }.minBy { case (id, _, _, r) => (-r, id) }
          Some(best)
        }
      }
  }
}

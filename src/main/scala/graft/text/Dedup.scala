package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

/** Deduplication operators for a training-data pipeline: exact
  * (hash-groupBy), n-gram Jaccard, MinHash+LSH banding, SimHash.
  *
  * Exact and n-gram variants are pure column expressions with DuckDB
  * oracles; MinHash/SimHash use per-partition Scala hashing (mapPartitions
  * shape) and are covered by unit tests instead.
  */
object Dedup {

  /** Exact duplicate groups by content hash (md5). */
  def exactGroups(df: DataFrame, text: Column): DataFrame =
    df.groupBy(md5(text).as("text_hash"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Distinct word-trigram shingles of a text column. */
  def shingles(text: Column): Column = {
    val words = split(text, " ")
    array_distinct(
      when(size(words) < 3, array(concat_ws(" ", words)))
        .otherwise(transform(
          sequence(lit(0), size(words) - 3),
          i => concat_ws(" ",
            element_at(words, i + 1),
            element_at(words, i + 2),
            element_at(words, i + 3)))))
  }

  /** Trigram-Jaccard similarity of each doc vs its successor (equi-join on
    * id+1 — co-partitioned, no window over a global sort).
    */
  def consecutiveJaccard(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol)).as("sh"))
    val a = sh.select(col("doc_id"), col("sh").as("sh_a"))
    val b = sh.select((col("doc_id") - 1).as("doc_id"), col("doc_id").as("next_doc_id"),
      col("sh").as("sh_b"))
    a.join(b, Seq("doc_id"))
      .select(col("doc_id"), col("next_doc_id"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  val NumHashes = 32
  val Bands = 8 // 4 rows per band

  private def minhashSig(shingleSet: Seq[String]): Array[Int] = {
    val sig = Array.fill(NumHashes)(Int.MaxValue)
    shingleSet.foreach { s =>
      var i = 0
      while (i < NumHashes) {
        val h = MurmurHash3.stringHash(s, i)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** MinHash+LSH near-duplicate candidate pairs, verified by exact
    * shingle Jaccard >= `threshold`. Pipeline shape:
    * shingle -> minhash signature (mapPartitions) -> explode bands ->
    * groupBy (band, band-signature) bucket join -> exact verify.
    */
  def minhashNearDups(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.7): DataFrame = {
    import spark.implicits._
    val sh = docs.select(col(idCol).cast("long").as("doc_id"),
      shingles(col(textCol)).as("sh"))

    val banded = sh.as[(Long, Seq[String])].mapPartitions { it =>
      it.flatMap { case (id, shingleSet) =>
        val sig = minhashSig(shingleSet)
        (0 until Bands).map { b =>
          val rows = sig.slice(b * NumHashes / Bands, (b + 1) * NumHashes / Bands)
          (id, b, rows.mkString(","))
        }
      }
    }.toDF("doc_id", "band", "band_sig")

    // bucket join: pairs sharing any band signature
    val l = banded.select(col("band"), col("band_sig"), col("doc_id").as("a"))
    val r = banded.select(col("band"), col("band_sig"), col("doc_id").as("b"))
    val candidates = l.join(r, Seq("band", "band_sig"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()

    // exact verification join
    val shA = sh.select(col("doc_id").as("a"), col("sh").as("sh_a"))
    val shB = sh.select(col("doc_id").as("b"), col("sh").as("sh_b"))
    candidates.join(shA, Seq("a")).join(shB, Seq("b"))
      .select(col("a"), col("b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
          / size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash over word hashes. */
  def simhash(words: Seq[String]): Long = {
    val v = new Array[Int](64)
    words.foreach { w =>
      val h = (MurmurHash3.stringHash(w, 0x9747b28c).toLong << 32) |
        (MurmurHash3.stringHash(w, 0x85ebca6b).toLong & 0xffffffffL)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) v(i) += 1 else v(i) -= 1
        i += 1
      }
    }
    v.zipWithIndex.foldLeft(0L) { case (acc, (cnt, i)) =>
      if (cnt > 0) acc | (1L << i) else acc
    }
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming, blocked
    * by bit chunks: with maxHamming+1 chunks, a pair within distance d <=
    * maxHamming must share at least one chunk exactly (pigeonhole), so the
    * bucket join loses no true pair.
    */
  def simhashNearDups(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val sigs = docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("t"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        (id, simhash(t.split(" ").toSeq))
      }).toDF("doc_id", "sig")

    val chunks = maxHamming + 1
    val bounds = (0 to chunks).map(i => i * 64 / chunks)
    val chunked = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until chunks).map { i =>
        val lo = bounds(i)
        val width = bounds(i + 1) - lo
        val mask = if (width >= 64) -1L else (1L << width) - 1
        struct(lit(i).as("chunk"),
          shiftright(col("sig"), lo).bitwiseAND(lit(mask)).as("ckey"))
      }: _*)).as("c"))
      .select(col("doc_id"), col("sig"), col("c.chunk"), col("c.ckey"))

    val l = chunked.select(col("chunk"), col("ckey"),
      col("doc_id").as("a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk"), col("ckey"),
      col("doc_id").as("b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "ckey"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}

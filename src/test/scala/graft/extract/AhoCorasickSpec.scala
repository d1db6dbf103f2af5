package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** The Aho-Corasick gazetteer scan must be byte-for-byte equivalent to the
  * legacy per-alias indexOf loop it replaced (all occurrences, overlaps,
  * duplicates, ordering).
  */
class AhoCorasickSpec extends AnyFunSuite {

  /** The legacy scan: every occurrence of every pattern by indexOf. */
  private def naive(patterns: IndexedSeq[String], text: String): Seq[(Int, Int)] =
    patterns.zipWithIndex.flatMap { case (p, pi) =>
      val b = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var idx = text.indexOf(p)
      while (idx >= 0) { b += ((pi, idx)); idx = text.indexOf(p, idx + 1) }
      b.toSeq
    }

  private def check(patterns: IndexedSeq[String], text: String): Unit =
    assert(new AhoCorasick(patterns).find(text) === naive(patterns, text))

  test("basic multi-pattern matching equals the naive scan") {
    check(Vector("gandalf", "bilbo", "gan", "dal"),
      "gandalf met bilbo; gandalf laughed")
  }

  test("overlapping self-occurrences are all reported") {
    check(Vector("aa", "aaa"), "aaaaa")
  }

  test("patterns that are suffixes of each other") {
    check(Vector("shire", "ire", "e"), "the shire is near")
  }

  test("duplicate patterns each report their own hits") {
    check(Vector("moria", "moria"), "to moria, into moria")
  }

  test("no matches") {
    check(Vector("xyzzy"), "nothing here")
  }

  test("randomized parity against the naive scan") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd "
    (1 to 50).foreach { _ =>
      val patterns = Vector.fill(rnd.nextInt(8) + 1)(
        (1 to (rnd.nextInt(4) + 1)).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      val text = (1 to 200).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
      check(patterns, text)
    }
  }

  test("per-text cost stays ~flat when the alias count grows 10x") {
    // the point of the automaton: scan cost is O(|text| + hits), not
    // O(|aliases| x |text|). Non-matching aliases are free after the
    // one-time build. Timing bound is deliberately loose (shared,
    // co-tenanted box): a linear-in-aliases scan would cost ~10x, we
    // assert < 6x — min-of-3 of 2000-rep averages rejects load spikes.
    val rnd = new scala.util.Random(7)
    def aliases(n: Int): IndexedSeq[String] =
      (0 until n).map(i => s"zz${('a' + i % 26).toChar}${i}q") // never match
    val text = (1 to 400).map(_ => "abcdefgh "(rnd.nextInt(9))).mkString
    def perTextNanos(ac: AhoCorasick): Double = {
      (1 to 200).foreach(_ => ac.find(text)) // warm JIT
      val reps = 2000
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => ac.find(text))
      (System.nanoTime() - t0).toDouble / reps
    }
    val small = new AhoCorasick(aliases(72))
    val big = new AhoCorasick(aliases(720))
    // min-of-3 per side to reject co-tenant noise
    val tSmall = (1 to 3).map(_ => perTextNanos(small)).min
    val tBig = (1 to 3).map(_ => perTextNanos(big)).min
    assert(tBig < tSmall * 6,
      f"10x aliases cost ${tBig / tSmall}%.1fx per text - scan is not alias-independent")
  }

  test("gazetteer scan inside Mentions matches the Seq path") {
    val gaz = Seq("gandalf" -> "character", "moria" -> "place",
      "mithrandir" -> "character")
    val text = "Gandalf, called Mithrandir, entered Moria. Moria was dark."
    val viaSeq = Mentions.detect(text, gaz)
    val viaAc = Mentions.detect(text, new Gazetteer(gaz.toIndexedSeq))
    assert(viaSeq === viaAc)
    assert(viaAc.count(_.source == "gazetteer") === 4)
  }
}

package graft.extract

import java.util.regex.{Matcher, Pattern}

/** Allocation discipline for the fused extraction hot loop (the scaling
  * bench's 16-thread leg is allocation/GC-bound — round-5 JFR profile:
  * per-call `Pattern.compile` via `String.matches`/`split`/`replaceAll`
  * and per-passage `Matcher` churn were ~35% of all sampled allocation).
  *
  * Semantics are never changed here: every helper is an exact,
  * allocation-free re-expression of a documented `java.util.regex` /
  * `String` idiom, asserted by the existing extraction specs plus the
  * dedicated equivalence specs in HotSpec.
  */
private[graft] object Hot {

  /** Case-insensitive ASCII `contains`: true iff `text` contains
    * `needleLower` under ASCII case folding. Exact gate for a Java-regex
    * CASE_INSENSITIVE (without UNICODE_CASE) literal: that mode folds
    * case for ASCII only, so a lowercase-ASCII needle matches exactly
    * where this scan says it does. `needleLower` must be lowercase ASCII.
    */
  def containsIgnoreCaseAscii(text: String, needleLower: String): Boolean = {
    val n = text.length
    val m = needleLower.length
    if (m == 0) return true
    var i = 0
    while (i <= n - m) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        var c = text.charAt(i + j)
        if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
        if (c != needleLower.charAt(j)) ok = false
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  /** Per-thread Matcher reuse: `of(P, text)` returns P's thread-local
    * Matcher reset onto `text` — the exact state `P.matcher(text)` returns,
    * without allocating a Matcher (plus its int[] group/locals arrays) per
    * passage per pattern. Callers must finish with a matcher before
    * requesting the SAME pattern again on the same thread (all extraction
    * uses are sequential, non-nested tight loops). Patterns are static
    * singletons, so identity keying is exact.
    */
  private val matchers =
    new ThreadLocal[java.util.IdentityHashMap[Pattern, Matcher]] {
      override def initialValue() =
        new java.util.IdentityHashMap[Pattern, Matcher]()
    }

  def of(p: Pattern, text: CharSequence): Matcher = {
    val cache = matchers.get()
    val m = cache.get(p)
    if (m == null) {
      val fresh = p.matcher(text)
      cache.put(p, fresh)
      fresh
    } else m.reset(text)
  }

  /** Java-regex `\s` (NOT `Character.isWhitespace`, which accepts more). */
  @inline def isRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' ||
      c == '\r'

  /** Java-regex default-mode `.` exclusions (line terminators). */
  @inline def isLineTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == 0x85.toChar || c == 0x2028.toChar ||
      c == 0x2029.toChar

  /** Speech-attribution test before a verb at `vStart`: exact walk of
    * `text.substring(max(0, vStart-3), vStart).matches(".*[\"”],?\\s?")`
    * with no substring and no per-call Pattern compile (String.matches
    * compiles every call — one per VERB TOKEN in the extraction loop;
    * round-5 JFR). Optional suffix tokens are consumed end-first in
    * reverse regex order (`\s?`, then `,?`), then the required quote;
    * `.*` accepts the remaining window iff it has no line terminator
    * (default-mode `.`). Property-tested against the regex in HotSpec.
    */
  def attributionBefore(text: String, vStart: Int): Boolean = {
    val b = math.max(0, vStart - 3)
    var p = vStart
    if (p > b && isRegexWs(text.charAt(p - 1))) p -= 1
    if (p > b && text.charAt(p - 1) == ',') p -= 1
    if (p <= b) false
    else {
      val q = text.charAt(p - 1)
      if (q != '"' && q != '”') false
      else {
        var i = b
        while (i < p - 1) {
          if (isLineTerm(text.charAt(i))) return false
          i += 1
        }
        true
      }
    }
  }

  /** `s.toLowerCase(Locale.ROOT)` with a zero-allocation fast path for
    * strings that are ASCII with no upper-case letter (most prose word
    * tokens): for those, ROOT lower-casing is the identity, so `s` itself
    * is returned. Exact: ROOT case mapping only differs from identity on
    * ASCII at 'A'-'Z', and non-ASCII chars fall back to the JDK call.
    */
  def lowerAscii(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 128 || (c >= 'A' && c <= 'Z'))
        return s.toLowerCase(java.util.Locale.ROOT)
      i += 1
    }
    s
  }
}

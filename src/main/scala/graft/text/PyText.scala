package graft.text

/** Text primitives that reproduce the reference engine's Python string
  * semantics bit-for-bit, so frozen goldens stay stable.
  *
  * Python's `str.strip()` / `re \s` whitespace set differs from both
  * Java's `String.strip` (excludes U+00A0) and Java regex `\s`
  * (ASCII-only). Python treats a char as whitespace when its Unicode
  * category is Zs/Zl/Zp or its bidi class is WS/B/S — concretely the
  * set enumerated in [[isPySpace]].
  *
  * Reference behaviors pinned here:
  *  - per-text-node strip (core/extractors/base.py:85)
  *  - whitespace collapse `re.sub(r"\s+", " ", text.strip())`
  *    (core/processors/base.py:59-61)
  */
object PyText {

  /** Python str whitespace: \\t-\\r, \\x1c-\\x1f, space, \\x85, Zs, Zl, Zp.
    * Structured so the overwhelmingly common case (ASCII letters and
    * digits, 0x21..0x84) decides in two comparisons — this predicate
    * runs per character in the stats/emission/tokenize hot loops.
    */
  def isPySpace(c: Char): Boolean = {
    if (c > 0x20) {
      if (c < 0x85) false
      else c == 0x85 || c == 0xa0 || c == 0x1680 ||
        (c >= 0x2000 && c <= 0x200a) || c == 0x2028 || c == 0x2029 ||
        c == 0x202f || c == 0x205f || c == 0x3000
    } else
      c == 0x20 || (c >= 0x09 && c <= 0x0d) || (c >= 0x1c && c <= 0x1f)
  }

  /** Java-regex character class equal to Python's `\s` over str. */
  val PyWsClass: String =
    "[\\t-\\r\\x1c-\\x1f \\x85\\xa0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]"

  /** Python `str.strip()`. */
  def strip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && isPySpace(s.charAt(a))) a += 1
    while (b > a && isPySpace(s.charAt(b - 1))) b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Python `re.sub(r"\s+", " ", s.strip())` — whitespace normalize. */
  def normalizeWhitespace(s: String): String = {
    val t = strip(s)
    val n = t.length
    var i = 0
    var changed = false
    while (i < n && !changed) {
      if (isPySpace(t.charAt(i))) changed = true
      i += 1
    }
    if (!changed) return t
    val out = new java.lang.StringBuilder(n)
    i = 0
    while (i < n) {
      val c = t.charAt(i)
      if (isPySpace(c)) {
        out.append(' ')
        while (i < n && isPySpace(t.charAt(i))) i += 1
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Per-CODE-POINT simple lowercase (Character.toLowerCase over code
    * points) — the semantics of DuckDB's utf8proc `lower()`, which maps
    * one code point to one code point. JVM `String.toLowerCase` applies
    * FULL case mapping, whose length-changing cases (U+0130 'İ' → 'i'
    * U+0069 + combining dot U+0307) would shift code-point lengths,
    * word boundaries and n-gram identities against a SQL oracle.
    * Returns the input unchanged (no allocation) for strings the
    * mapping leaves untouched — the common ASCII-lowercase case.
    */
  def simpleLower(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (Character.toLowerCase(cp) != cp) {
        val out = new java.lang.StringBuilder(n)
        out.append(s, 0, i)
        var j = i
        while (j < n) {
          val c = s.codePointAt(j)
          out.appendCodePoint(Character.toLowerCase(c))
          j += Character.charCount(c)
        }
        return out.toString
      }
      i += Character.charCount(cp)
    }
    s
  }

  /** Python `re.split(r'(?<=[.!?])\s+', text.strip())` — the reference
    * chunker's sentence splitter (core/processors/chunking.py:85).
    * Returns the stripped text split after sentence-final punctuation.
    */
  def splitSentences(text: String): Array[String] = {
    val t = strip(text)
    if (t.isEmpty) return Array(t)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    val n = t.length
    while (i < n) {
      val c = t.charAt(i)
      if ((c == '.' || c == '!' || c == '?') && i + 1 < n && isPySpace(t.charAt(i + 1))) {
        out += t.substring(start, i + 1)
        i += 1
        while (i < n && isPySpace(t.charAt(i))) i += 1
        start = i
      } else i += 1
    }
    out += t.substring(start)
    out.toArray
  }
}

package graft.functions

/** Shared whitespace tokenizer for the scan-side text kernels.
  *
  * [[splitWs]] is an exact replica of
  * `java.util.regex.Pattern.compile("\\s+").split(s, -1)` — the split
  * every kernel replicates (`tokens(text)` = `split(trim(text),
  * "\\s+")` on the Column side). Java's `\s` without UNICODE flags is
  * exactly the six ASCII characters tested by [[isWs]], so a direct
  * character scan produces the identical token array (leading empty
  * token when the string starts with whitespace, trailing empty when
  * it ends with whitespace, `[""]` for the empty string — all the
  * limit=-1 quirks) without the regex engine: the kernel profile
  * measured `Pattern.split` at ~23% of the whole hygiene-verdict scan
  * (two splits per document), and `String.split("\\s+", -1)` in the
  * shingle kernels additionally re-compiled the pattern per row.
  * Equivalence is pinned by a PropertySpec fuzz test against
  * `Pattern.split` itself.
  */
object Tok {

  /** `\s` per Java regex (no UNICODE_CHARACTER_CLASS): exactly these
    * six ASCII chars. */
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Exact `Pattern.compile("\\s+").split(s, -1)`. */
  def splitWs(s: String): Array[String] = {
    val n = s.length
    if (n == 0) return Array("")
    // count separators first: one exact-sized array, no ArrayList
    var seps = 0
    var i = 0
    var inWs = false
    while (i < n) {
      if (isWs(s.charAt(i))) { if (!inWs) seps += 1; inWs = true }
      else inWs = false
      i += 1
    }
    if (seps == 0) return Array(s)
    val out = new Array[String](seps + 1)
    var k = 0
    var start = 0
    i = 0
    while (i < n) {
      if (isWs(s.charAt(i))) {
        var j = i + 1
        while (j < n && isWs(s.charAt(j))) j += 1
        out(k) = s.substring(start, i)
        k += 1
        start = j
        i = j
      } else i += 1
    }
    out(k) = s.substring(start, n)
    out
  }
}

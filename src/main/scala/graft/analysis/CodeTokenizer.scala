package graft.analysis

import scala.collection.mutable

/** Deterministic code tokenizer (SURVEY.md §7.1 `analysis/`).
  *
  * Spec (kept trivially oracle-matchable — the DuckDB oracle expresses the
  * identical rule as `unnest(regexp_split_to_array(lower(text),
  * '[^a-z0-9_]+'))` filtered to length 2..64):
  *   - ASCII-lowercase 'A'-'Z';
  *   - a token is a maximal run of [a-z0-9_];
  *   - keep tokens with 2 <= length <= 64.
  *
  * Character-level scan rather than regex split: this runs once per input
  * byte of a ~100 TB corpus, so it must be allocation-lean and branch-cheap.
  * No subword (camelCase/snake_case) splitting in v0 (SURVEY.md §7.1).
  *
  * Reference analogue: terrier's expression pipeline over VARCHAR columns
  * (string_functions.cpp Lower/SplitPart) — re-expressed as a typed flatMap
  * (the UDTF-shaped surface, SURVEY.md §2.10).
  */
object CodeTokenizer {
  final val MinLen = 2
  final val MaxLen = 64

  @inline private def isTokenChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_' ||
      (c >= 'A' && c <= 'Z')

  @inline private def toLowerAscii(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** All kept tokens of `content`, in document order. */
  def tokenize(content: String): mutable.ArrayBuffer[String] = {
    val out = new mutable.ArrayBuffer[String](content.length / 6 + 4)
    val n = content.length
    var i = 0
    val sb = new java.lang.StringBuilder(32)
    while (i < n) {
      val c = content.charAt(i)
      if (isTokenChar(c)) sb.append(toLowerAscii(c))
      else {
        val len = sb.length
        if (len >= MinLen && len <= MaxLen) out += sb.toString
        sb.setLength(0)
      }
      i += 1
    }
    val len = sb.length
    if (len >= MinLen && len <= MaxLen) out += sb.toString
    out
  }

  /** Term-frequency map of `content` plus the document length (token count).
    * Single pass; the hot path of the inversion stage. */
  def termFreqs(content: String): (mutable.HashMap[String, Int], Int) = {
    val tf = new mutable.HashMap[String, Int]()
    var dl = 0
    val toks = tokenize(content)
    val it = toks.iterator
    while (it.hasNext) {
      val t = it.next()
      dl += 1
      tf.update(t, tf.getOrElse(t, 0) + 1)
    }
    (tf, dl)
  }

  /** Token count only (document length). */
  def docLength(content: String): Int = tokenize(content).length
}

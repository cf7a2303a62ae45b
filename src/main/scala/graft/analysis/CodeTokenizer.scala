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

  /** ASCII-only case fold — an intentional, DOCUMENTED input contract:
    * the SQL oracle twins (Spark `lower`, DuckDB `lower`) apply full
    * Unicode lowercasing before splitting, which agrees with this fold
    * exactly on ASCII input but diverges on the handful of non-ASCII
    * characters whose Unicode lowercase contains ASCII letters (U+212A
    * KELVIN SIGN → 'k', 'İ' → 'i'+combining dot): there the SQL side
    * keeps an extra letter while this tokenizer treats the character as a
    * separator. Oracle parity (TokenizerSpec, q30-q36, q50-q54) therefore
    * assumes ASCII corpora — true for the generated code corpus and the
    * driver's documents table. A deployment over arbitrary Unicode text
    * must either strip non-ASCII on both sides or switch both sides to
    * the same Unicode fold. */
  @inline private def toLowerAscii(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** Opt-in Unicode mode (the non-ASCII-corpus escape hatch the ASCII
    * contract above points to): the whole string is lowercased with the
    * JDK's ROOT-locale full case mapping — the same fold Spark's `lower()`
    * applies — and token characters are Unicode letters plus [0-9_]. The
    * SQL twin both engines agree on is
    * `split(lower(s), '[^\p{L}0-9_]+')` + length 2..64 (TokenizerSpec pins
    * it property-style over a mixed-script corpus). Token length counts
    * UTF-16 code units, so the agreement contract covers the BMP;
    * supplementary-plane letters count 2 here vs 1 in engines that count
    * code points. ASCII stays the default: on pure-ASCII input both modes
    * tokenize identically, but the ASCII scan is the allocation-lean hot
    * path (no full-string lowercase pass). */
  @inline private def isUniTokenChar(c: Char): Boolean =
    (c >= '0' && c <= '9') || c == '_' || Character.isLetter(c)

  @inline private def keepChar(c: Char, unicode: Boolean): Boolean =
    if (unicode) isUniTokenChar(c) else isTokenChar(c)

  /** Fold a query PREFIX with the index's character rules: lowercased
    * with the matching mode's fold; valid only when non-empty, at most
    * MaxLen, and every char is a token char (a separator inside a prefix
    * could never match any single indexed token). Unlike [[tokenize]]
    * there is NO minimum length — `a*` is a legal (broad) prefix; the
    * expansion cap bounds the work, not the prefix length. */
  def foldPrefix(prefix: String,
      unicodeFold: Boolean = false): Option[String] = {
    val s = if (unicodeFold) prefix.toLowerCase(java.util.Locale.ROOT)
            else prefix.map(toLowerAscii)
    if (s.nonEmpty && s.length <= MaxLen &&
        s.forall(keepChar(_, unicodeFold))) Some(s)
    else None
  }

  /** All kept tokens of `content`, in document order. */
  def tokenize(content: String,
      unicodeFold: Boolean = false): mutable.ArrayBuffer[String] = {
    val s = if (unicodeFold) content.toLowerCase(java.util.Locale.ROOT)
            else content
    val out = new mutable.ArrayBuffer[String](s.length / 6 + 4)
    val n = s.length
    var i = 0
    val sb = new java.lang.StringBuilder(32)
    while (i < n) {
      val c = s.charAt(i)
      if (keepChar(c, unicodeFold))
        sb.append(if (unicodeFold) c else toLowerAscii(c))
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

  /** Per-term position lists of `content` plus the document length.
    * A position is the 0-based ordinal of the token among the KEPT tokens
    * (the 2..64-length filter applies BEFORE positions are assigned), so
    * "phrase adjacency" means adjacency in the filtered token sequence —
    * the same rule the SQL oracle expresses by filtering the split array
    * before indexing it. Positions within a term are strictly increasing
    * by construction. Runs only at positional-index build time (opt-in
    * sidecar), not on the main tokenize hot path. */
  def termPositions(content: String, unicodeFold: Boolean = false)
      : (mutable.HashMap[String, mutable.ArrayBuffer[Int]], Int) = {
    val toks = tokenize(content, unicodeFold)
    val m = new mutable.HashMap[String, mutable.ArrayBuffer[Int]]()
    var i = 0
    while (i < toks.length) {
      m.getOrElseUpdate(toks(i), new mutable.ArrayBuffer[Int](4)) += i
      i += 1
    }
    (m, toks.length)
  }

  /** Term-frequency map of `content` plus the document length (token count).
    * Single pass via TokenCounter: allocates one String per DISTINCT term
    * (not per occurrence) — tokenization is the engine's hottest path and
    * allocation rate is what limits thread scaling in a shared JVM. */
  def termFreqs(content: String,
      unicodeFold: Boolean = false): (mutable.HashMap[String, Int], Int) = {
    val (c, dl) = termFreqsRaw(content, unicodeFold)
    (c.toMap, dl)
  }

  /** Allocation-lean variant: exposes the counter directly. */
  def termFreqsRaw(content: String,
      unicodeFold: Boolean = false): (TokenCounter, Int) = {
    val counter = new TokenCounter
    val dl = scan(content, counter, unicodeFold)
    (counter, dl)
  }

  /** Token count only (document length); allocation-free. */
  def docLength(content: String, unicodeFold: Boolean = false): Int =
    scan(content, null, unicodeFold)

  /** Core scan: counts kept tokens; if `counter` non-null, also tallies
    * term frequencies without allocating per-occurrence Strings. */
  private def scan(content: String, counter: TokenCounter,
      unicode: Boolean = false): Int = {
    val s = if (unicode) content.toLowerCase(java.util.Locale.ROOT)
            else content
    val n = s.length
    val buf = new Array[Char](MaxLen + 1)
    var len = 0
    var dl = 0
    var i = 0
    while (i <= n) {
      val c = if (i < n) s.charAt(i) else ' '
      if (keepChar(c, unicode)) {
        if (len <= MaxLen) { // overlong tokens: stop copying, keep counting
          if (len < MaxLen + 1) buf(len) = if (unicode) c else toLowerAscii(c)
        }
        len += 1
      } else if (len > 0) {
        if (len >= MinLen && len <= MaxLen) {
          dl += 1
          if (counter != null) counter.add(buf, len)
        }
        len = 0
      }
      i += 1
    }
    dl
  }
}

/** Open-addressing token counter keyed by (char[], len) content: probes
  * without materializing a String; allocates a String key only when a term
  * is first seen. Cuts per-document garbage by the average tf factor. */
final class TokenCounter {
  private var cap = 64
  private var keys = new Array[String](cap)
  private var counts = new Array[Int](cap)
  private var used = 0

  private def hashOf(buf: Array[Char], len: Int): Int = {
    var h = 0
    var i = 0
    while (i < len) { h = h * 31 + buf(i); i += 1 }
    h
  }

  private def eq(k: String, buf: Array[Char], len: Int): Boolean = {
    if (k.length != len) return false
    var i = 0
    while (i < len) { if (k.charAt(i) != buf(i)) return false; i += 1 }
    true
  }

  private def grow(): Unit = {
    val ok = keys; val oc = counts
    cap <<= 1
    keys = new Array[String](cap)
    counts = new Array[Int](cap)
    used = 0
    var i = 0
    while (i < ok.length) {
      if (ok(i) != null) insert(ok(i), oc(i))
      i += 1
    }
  }

  private def insert(k: String, c: Int): Unit = {
    var idx = (k.hashCode & 0x7fffffff) & (cap - 1)
    while (keys(idx) != null) idx = (idx + 1) & (cap - 1)
    keys(idx) = k; counts(idx) = c; used += 1
  }

  def add(buf: Array[Char], len: Int): Unit = {
    if (used * 2 >= cap) grow()
    var idx = (hashOf(buf, len) & 0x7fffffff) & (cap - 1)
    while (true) {
      val k = keys(idx)
      if (k == null) {
        keys(idx) = new String(buf, 0, len)
        counts(idx) = 1
        used += 1
        return
      } else if (eq(k, buf, len)) {
        counts(idx) += 1
        return
      }
      idx = (idx + 1) & (cap - 1)
    }
  }

  def toMap: mutable.HashMap[String, Int] = {
    val m = new mutable.HashMap[String, Int]()
    m.sizeHint(used)
    var i = 0
    while (i < cap) {
      if (keys(i) != null) m.update(keys(i), counts(i))
      i += 1
    }
    m
  }

  def foreach(f: (String, Int) => Unit): Unit = {
    var i = 0
    while (i < cap) {
      if (keys(i) != null) f(keys(i), counts(i))
      i += 1
    }
  }

  def size: Int = used
}

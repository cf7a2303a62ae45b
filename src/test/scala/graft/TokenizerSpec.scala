package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.CodeTokenizer

class TokenizerSpec extends AnyFunSuite {

  test("lowercases, splits on non [a-z0-9_], keeps length 2..64") {
    val toks = CodeTokenizer.tokenize("def Foo_Bar(x1: Int) = x1 + BAZ;")
    assert(toks == Seq("def", "foo_bar", "x1", "int", "x1", "baz"))
  }

  test("single-char tokens dropped, 2-char kept, 64-char kept, 65-char dropped") {
    val t64 = "a" * 64
    val t65 = "b" * 65
    val toks = CodeTokenizer.tokenize(s"a ab $t64 $t65 c")
    assert(toks == Seq("ab", t64))
  }

  test("matches the oracle SQL semantics: regex split of lowercased text") {
    // Same rule the DuckDB oracle uses:
    // unnest(regexp_split_to_array(lower(text),'[^a-z0-9_]+')) len 2..64
    val samples = Seq(
      "The QUICK brown-fox_jumps.over 12 lazy_DOGS!!",
      "x;;y zz\t\nmulti  spaceéaccent", // é splits in both
      "", "   ", "_", "__", "a_b c_d_e 123 4")
    samples.foreach { s =>
      val expected = s.toLowerCase.split("[^a-z0-9_]+").toSeq
        .filter(t => t.length >= 2 && t.length <= 64)
      assert(CodeTokenizer.tokenize(s).toSeq == expected, s"input: '$s'")
    }
  }

  test("termFreqs counts and doc length agree with tokenize") {
    val s = "if if if return val val x"
    val (tf, dl) = CodeTokenizer.termFreqs(s)
    assert(dl == 6) // 'x' dropped
    assert(tf("if") == 3 && tf("return") == 1 && tf("val") == 2)
    assert(CodeTokenizer.docLength(s) == 6)
  }
}

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

  test("unicode fold: property vs the SQL twin over a mixed-script corpus") {
    // The engine twin both sides agree on for non-ASCII corpora:
    //   split(lower(s), '[^\p{L}0-9_]+')  filtered to length 2..64
    // Deterministic pseudo-random corpus mixing Latin, accents, Greek,
    // Cyrillic, CJK, digits, and separators (BMP only — the documented
    // contract; length counts UTF-16 code units).
    val alphabets = Seq("abcXYZ_09", "éÉàÜöß", "αβΓΔλΣ", "ждЩЫЁ", "日本語漢字",
      " .,;!-\t\n()[]«»…")
    val rnd = new scala.util.Random(6)
    val corpus = (0 until 200).map { _ =>
      val sb = new StringBuilder
      (0 until rnd.nextInt(120)).foreach { _ =>
        val a = alphabets(rnd.nextInt(alphabets.length))
        sb.append(a.charAt(rnd.nextInt(a.length)))
      }
      sb.toString
    } ++ Seq("Ünïcode_Wörter zählen", "ΚΌΣΜΟΣ κόσμος", "ПРИВЕТ мир",
      "mixedΛатин漢ascii", "KKelvin İstanbul") // fold specials
    corpus.foreach { s =>
      val expected = s.toLowerCase(java.util.Locale.ROOT)
        .split("[^\\p{L}0-9_]+").toSeq
        .filter(t => t.length >= 2 && t.length <= 64)
      assert(CodeTokenizer.tokenize(s, unicodeFold = true).toSeq == expected,
        s"input: '$s'")
      // termFreqs/docLength agree with tokenize in unicode mode too
      val (tf, dl) = CodeTokenizer.termFreqs(s, unicodeFold = true)
      assert(dl == expected.length)
      assert(tf == scala.collection.mutable.HashMap(
        expected.groupBy(identity).view.mapValues(_.size).toSeq: _*))
    }
    // pure-ASCII input: both modes identical (the default stays the hot path)
    Seq("def Foo_Bar(x1: Int) = x1 + BAZ;", "a ab abc_d 12 x").foreach { s =>
      assert(CodeTokenizer.tokenize(s, unicodeFold = true).toSeq ==
        CodeTokenizer.tokenize(s).toSeq)
    }
  }

  test("unicode fold end-to-end: index + WAND == sequential oracle on a non-ASCII corpus") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = (0 until 60).map { i =>
      val words = Seq("κόσμος", "мир", "wörter", "zählen", "日本語", "coffee",
        "ΚΌΣΜΟΣ", "İstanbul", "straße", "token")
      val rnd = new scala.util.Random(i)
      graft.model.SourceFile(s"r${i % 3}", s"f$i.txt", "c0", "txt",
        (0 until 40).map(_ => words(rnd.nextInt(words.length))).mkString(" "))
    }
    val cfg = graft.index.IndexConfig(
      indexDir = TestSpark.tmpDir("graft-index-uni"),
      numShards = 4, buildPartitions = 4, unicodeFold = true)
    graft.index.IndexBuilder.build(spark, spark.createDataset(docs), cfg)
    val searcher = new graft.query.Searcher(spark, cfg)
    val oracle = new graft.query.SequentialOracle(docs, unicodeFold = true)
    Seq("κόσμος мир", "WÖRTER zählen", "日本語", "istanbul straße",
      "coffee token κόσμος").foreach { q =>
      assert(searcher.searchWAND(q, 10).toVector == oracle.topK(q, 10),
        s"unicode rank divergence for '$q'")
    }
  }
}

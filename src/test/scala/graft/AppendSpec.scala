package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}
import graft.model.SourceFile
import graft.query.{Searcher, SequentialOracle}

/** Incremental append: a second batch merges into an existing index as a
  * new segment; queries over the appended index are rank-identical to the
  * sequential oracle on the combined corpus AND to a from-scratch build. */
class AppendSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // repos prefixed so the global lexicographic key order equals the append
  // order — making docIds comparable across appended vs from-scratch builds
  val base: Seq[SourceFile] = (0L until 300L)
    .map(i => { val f = CorpusGen.genFile(i, 42L); f.copy(repo = "a_" + f.repo) })
  val batch: Seq[SourceFile] = (1000L until 1200L)
    .map(i => { val f = CorpusGen.genFile(i, 42L); f.copy(repo = "b_" + f.repo) })
  lazy val oracle = new SequentialOracle(base ++ batch)

  val queries = Seq("if return", "hash join", "def val", "scan sort merge",
    "get_set", "the and for with", "buf_node import", "zzz_missing if")

  def cfg(dir: String) = IndexConfig(indexDir = dir, numShards = 4,
    heavyDfThreshold = 150, buildPartitions = 4)

  test("append merges a segment; results match oracle and a from-scratch build") {
    import spark.implicits._
    val dirA = TestSpark.tmpDir("graft-append")
    val cA = cfg(dirA)
    IndexBuilder.build(spark, base.toDS(), cA, "base")
    val stBefore = IndexBuilder.stats(cA)
    assert(stBefore.numDocs == 300)

    val stAfter = IndexBuilder.append(spark, batch.toDS(), cA, "batch1")
    assert(stAfter.numDocs == 500)
    assert(stAfter.totalTokens > stBefore.totalTokens)

    // from-scratch build over the combined corpus
    val dirB = TestSpark.tmpDir("graft-scratch")
    val cB = cfg(dirB)
    IndexBuilder.build(spark, (base ++ batch).toDS(), cB, "all")

    val sA = new Searcher(spark, cA)
    val sB = new Searcher(spark, cB)
    queries.foreach { q =>
      val exp = oracle.topK(q, 10)
      assert(sA.searchWAND(q, 10).toVector == exp, s"appended WAND vs oracle: '$q'")
      assert(sA.searchTAAT(q, 10).toVector == exp, s"appended TAAT vs oracle: '$q'")
      assert(sB.searchWAND(q, 10).toVector == exp, s"scratch WAND vs oracle: '$q'")
    }

    // lexicon df identical between appended and from-scratch indexes
    val dfA = spark.read.parquet(cA.lexiconPath)
      .select($"term", $"df").as[(String, Long)].collect().toMap
    val dfB = spark.read.parquet(cB.lexiconPath)
      .select($"term", $"df").as[(String, Long)].collect().toMap
    assert(dfA == dfB)

    // lineage across both segments
    assert(sA.verifyLineage((base ++ batch).toDS()) == 0L)
  }

  test("second append keeps extending (multi-segment)") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("graft-append2")
    val c = cfg(dir)
    IndexBuilder.build(spark, base.toDS(), c, "base")
    IndexBuilder.append(spark, batch.toDS(), c, "b1")
    val batch2 = (2000L until 2100L)
      .map(i => { val f = CorpusGen.genFile(i, 42L); f.copy(repo = "c_" + f.repo) })
    val st = IndexBuilder.append(spark, batch2.toDS(), c, "b2")
    assert(st.numDocs == 600)
    val oracle3 = new SequentialOracle(base ++ batch ++ batch2)
    val s = new Searcher(spark, c)
    Seq("if return", "hash join", "scan sort").foreach { q =>
      assert(s.searchWAND(q, 10).toVector == oracle3.topK(q, 10), s"'$q'")
    }
  }
}

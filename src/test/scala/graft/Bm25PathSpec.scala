package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.entry.IndexQueries

/** The q50/q51 entries serve BM25 through the WAND path with a margin +
  * rounded re-sort; this spec pins that result against the full-TAAT
  * scoring twin for every frozen bench query — the invariant that keeps the
  * DuckDB oracle (which ranks the FULL corpus on rounded scores) valid. */
class Bm25PathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
    test(s"WAND serving path == full TAAT scoring for all bench queries ($sf)") {
      Bench.QuerySet.foreach { q =>
        val wand = IndexQueries.bm25(spark, sf, q, 20).collect().toSeq
        val full = IndexQueries.bm25FullScore(spark, sf, q, 20).collect().toSeq
        assert(wand == full, s"path divergence for '$q' at $sf")
      }
    }
  }
}

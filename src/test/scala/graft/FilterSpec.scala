package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}
import graft.model.{ScoredDoc, SourceFile}
import graft.query.Searcher

/** Attribute-filtered search ([[Searcher.searchWhere]]): membership is
  * restricted to an allow-set, scores stay those of the UNFILTERED index
  * (Lucene FilteredQuery semantics). Pins: (a) filtered results = the
  * unfiltered full ranking restricted to the allow-set, scores
  * Double-identical; (b) the WAND-with-allow-set path and the distributed
  * TAAT+semi-join fallback are identical; (c) the filter composes with
  * tombstones on a maintained index. */
class FilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val NumFiles = 250L
  lazy val corpusDS = CorpusGen.generate(spark, NumFiles).cache()

  lazy val cfg: IndexConfig = {
    val dir = TestSpark.tmpDir("graft-filter")
    val c = IndexConfig(indexDir = dir, numShards = 4, buildPartitions = 8,
      heavyDfThreshold = 500)
    IndexBuilder.build(spark, corpusDS, c, "filter-spec")
    c
  }

  private def byKey(c: IndexConfig, top: Array[ScoredDoc])
      : Seq[((String, String), Double)] = {
    val keys = spark.read.parquet(c.docsPath)
      .select($"docId", $"repo", $"path").as[(Long, String, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    top.toSeq.map(sd => keys(sd.docId) -> sd.score)
  }

  test("filtered = unfiltered ranking restricted to the allow-set; " +
      "both serving paths identical") {
    val s = new Searcher(spark, cfg)
    val docs = spark.read.parquet(cfg.docsPath)
    // a deterministic ~40% slice of the corpus
    val allowed = docs.filter(pmod(crc32($"path"), lit(5)) < 2)
      .select($"docId")
    val allowedSet = allowed.as[Long].collect().toSet
    assert(allowedSet.nonEmpty && allowedSet.size < NumFiles)

    Seq("if return", "val def class", "hash").foreach { q =>
      // reference: the FULL ranking (exact scores), restricted, top-k
      val full = s.scoreAll(q).collect()
        .filter(sd => allowedSet.contains(sd.docId))
        .sortBy(sd => (-sd.score, sd.docId)).take(10).toSeq
      val viaWand = s.searchWhere(q, 10, allowed).toSeq
      assert(viaWand == full, s"WAND-filtered != restricted ranking for '$q'")
      // gatherMax=0 forces the distributed TAAT + semi-join fallback
      val viaTaat = s.searchWhere(q, 10, allowed, gatherMax = 0).toSeq
      assert(viaTaat == full, s"TAAT-filtered != restricted ranking for '$q'")
      // scores are the UNFILTERED index's scores for those docs
      val unfiltered = s.scoreAll(q).collect().map(sd => sd.docId -> sd.score).toMap
      viaWand.foreach(sd => assert(unfiltered(sd.docId) == sd.score))
    }
    // an empty filter matches nothing
    assert(s.searchWhere("if return", 10, allowed.limit(0)).isEmpty)
    s.close()
  }

  test("filter composes with tombstones on a maintained index") {
    val root = TestSpark.tmpDir("graft-filter-maint")
    val ops = new graft.sources.TableOps(spark, root)
    ops.create("fdocs", corpusDS.limit(100).toDF().repartition(3, col("path")))
    val c = IndexConfig(indexDir = s"$root/__idx", numShards = 2,
      buildPartitions = 4, heavyDfThreshold = 500)
    val ti = new graft.index.TableIndexer(spark, ops, c)
    ti.create("fdocs")
    ops.delete("fdocs", pmod(crc32(col("path")), lit(4)) === 0)
    ti.refresh("fdocs")

    val s = new Searcher(spark, c)
    val live = ops.read("fdocs").select($"repo", $"path", $"commit")
    val liveKeys = live.as[(String, String, String)].collect().toSet
    // allow-set: live docs whose path hashes into another slice
    val allowed = live.filter(pmod(crc32($"path"), lit(4)) === 1)
      .join(spark.read.parquet(c.docsPath), Seq("repo", "path", "commit"))
      .select($"docId")
    val top = s.searchWhere("if return", 50, allowed)
    assert(top.nonEmpty)
    val keys = byKey(c, top).map(_._1)
    // every hit is live AND in the filter slice
    keys.foreach { case (repo, path) =>
      assert(liveKeys.exists(t => t._1 == repo && t._2 == path),
        s"tombstoned doc ($repo,$path) surfaced through the filter")
    }
    // a from-scratch rebuild of the live slice ranks identically
    val c2 = IndexConfig(indexDir = TestSpark.tmpDir("graft-filter-ref"),
      numShards = 2, buildPartitions = 4, heavyDfThreshold = 500)
    IndexBuilder.build(spark,
      ops.read("fdocs").select($"repo", $"path", $"commit", $"lang", $"content")
        .as[SourceFile], c2, "filter-ref")
    val s2 = new Searcher(spark, c2)
    val allowed2 = live.filter(pmod(crc32($"path"), lit(4)) === 1)
      .join(spark.read.parquet(c2.docsPath), Seq("repo", "path", "commit"))
      .select($"docId")
    val refTop = s2.searchWhere("if return", 50, allowed2)
    assert(byKey(c, top).toMap == byKey(c2, refTop).toMap,
      "maintained+filtered != rebuilt+filtered")
    s.close(); s2.close()
  }
}

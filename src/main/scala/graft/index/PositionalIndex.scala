package graft.index

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.CodeTokenizer
import graft.checkpoint.{Manifest, StageRecord}
import graft.codec.VByte
import graft.model.SourceFile

/** One positional posting: every occurrence position of `termId` in
  * `docId`. `posBytes` = VByte stream of the 0-based positions as
  * first-absolute + deltas (deltas ≥ 1 — positions are strictly
  * increasing); `tf` = the position count; `dl` carried so phrase scoring
  * never joins the docs table. The Lucene .pos-file shape, one row per
  * (term, doc) instead of block-packed: position payloads are
  * per-occurrence (not per-posting), so row overhead is already a small
  * fraction and the row layout keeps the reader a plain pushed-down
  * parquet scan. */
final case class PosPostingRow(
    termId: Int,
    docId: Long,
    tf: Int,
    dl: Int,
    posBytes: Array[Byte])

/** Opt-in positional sidecar of a built index (phrase / proximity queries).
  *
  * The main build keeps its content-read-once contract and its forward
  * schema; positions are a SEPARATE pass over the corpus, built only for
  * deployments that serve phrase queries (Lucene's optional positions the
  * same way: an index without them cannot run PhraseQuery). The sidecar
  * reuses the main index's keymap (docIds) and vocab (termIds), so phrase
  * and bag-of-words queries agree on every id.
  *
  * Layout: range-partitioned + sorted on (termId, docId) — the same
  * file-level IndexScan discipline as the postings layout: a phrase's
  * terms resolve to O(1) parquet files via footer min/max
  * ([[graft.query.Searcher.searchPhrase]] prunes with them).
  *
  * Scale shape (100 TB): tokenize runs in place (content never shuffled);
  * the only wide exchanges move (term, docId, positions) rows bounded by
  * token count — the keymap join ships 3 short strings + positions per
  * doc-term, the vocab join is AQE-broadcast for all but web-scale
  * vocabularies, and the final range exchange moves the packed bytes once.
  * Resumable: the `positions` manifest record skips a completed build with
  * a matching fingerprint (the same stage discipline as build()).
  *
  * Maintenance boundary (declared): the sidecar is NOT incrementally
  * maintained by TableIndexer refreshes — a deployment serving phrases
  * over a mutating table rebuilds the sidecar from the live snapshot
  * (build() with the new fingerprint overwrites in place), the same
  * rebuild-on-refresh contract as the index compact() path. Tombstones of
  * the MAIN index are honored at query time (searchPhrase skips dead
  * docs), so a phrase query between DML and rebuild never surfaces
  * deleted documents; documents added since the last sidecar build are
  * simply not phrase-matchable yet.
  */
object PositionalIndex {

  /** Build (or reuse) the positional sidecar. Returns the row count. */
  def build(spark: SparkSession, corpus: Dataset[SourceFile],
      cfg: IndexConfig, fingerprint: String = ""): Long = {
    import spark.implicits._
    val manifest = new Manifest(cfg.indexDir)
    require(manifest.get("postings").nonEmpty,
      s"positional sidecar needs the main index built at ${cfg.indexDir}")
    val fp = s"v${IndexBuilder.FormatVersion}:positions:" +
      (if (fingerprint.nonEmpty) fingerprint else "corpus")
    if (manifest.isComplete("positions", fp))
      return manifest.get("positions").get.rows

    val t0 = System.nanoTime()
    val parts = if (cfg.buildPartitions > 0) cfg.buildPartitions
      else spark.sparkContext.defaultParallelism
    val uniFold = cfg.unicodeFold
    val perTerm = corpus.flatMap { sf =>
      val (poss, dl) = CodeTokenizer.termPositions(sf.content, uniFold)
      poss.iterator.map { case (term, ps) =>
        val out = scala.collection.mutable.ArrayBuilder.make[Byte]
        var prev = 0
        var j = 0
        while (j < ps.length) {
          VByte.encode((ps(j) - prev).toLong, out); prev = ps(j); j += 1
        }
        (sf.repo, sf.path, sf.commit, term, ps.length, dl, out.result())
      }
    }.toDF("repo", "path", "commit", "term", "tf", "dl", "posBytes")

    perTerm
      .join(spark.read.parquet(cfg.keymapPath), Seq("repo", "path", "commit"))
      .join(spark.read.parquet(cfg.vocabPath).select($"termId", $"term"),
        "term") // AQE broadcasts the vocab when small
      .select($"termId", $"docId", $"tf", $"dl", $"posBytes")
      .repartitionByRange(parts, $"termId", $"docId")
      .sortWithinPartitions($"termId", $"docId")
      .write.mode("overwrite").parquet(cfg.positionsPath)

    val n = spark.read.parquet(cfg.positionsPath).count()
    manifest.commit(StageRecord("positions", "complete", fp, n,
      (System.nanoTime() - t0) / 1000000, Map.empty))
    n
  }

  /** Decode a posBytes stream back to absolute positions. */
  def decodePositions(bytes: Array[Byte], tf: Int): Array[Int] = {
    val out = new Array[Int](tf)
    val pos = Array(0)
    var prev = 0
    var i = 0
    while (i < tf) {
      prev += VByte.decode(bytes, pos).toInt
      out(i) = prev
      i += 1
    }
    out
  }
}

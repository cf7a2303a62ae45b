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
  * Maintenance: the sidecar follows the main index's segment model.
  * [[append]] adds one batch of freshly-appended documents as
  * `possegN-` part files inside the same positions dir (the layout stays
  * a union of range-sorted runs — file-level footer pruning holds per
  * file), and [[graft.index.TableIndexer.refresh]] drives it from the
  * same commit diff as the main append. Deletes need NO positional
  * bookkeeping: searchPhrase computes phrase df and tf live from the
  * position rows and skips the MAIN index's tombstones, so phrase scores
  * after any incremental cycle equal a from-scratch rebuild of the live
  * snapshot exactly (PhraseSpec pins it). compact() rebuilds the sidecar
  * fresh alongside the main index, dropping dead rows.
  */
object PositionalIndex {

  /** (termId, docId, tf, dl, posBytes) rows for `corpus`, docIds resolved
    * against the index's docs table restricted to `docId >= baseDocId` —
    * for an appended batch the floor is the append's docId base, so a key
    * REWRITTEN by an update (its old docId just died as a tombstone) maps
    * only to its fresh id, never to the dead twin. */
  private def positionRows(spark: SparkSession, corpus: Dataset[SourceFile],
      cfg: IndexConfig, baseDocId: Long) = {
    import spark.implicits._
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
      .join(spark.read.parquet(cfg.docsPath)
          .filter($"docId" >= baseDocId)
          .select($"docId", $"repo", $"path", $"commit"),
        Seq("repo", "path", "commit"))
      .join(spark.read.parquet(cfg.vocabPath).select($"termId", $"term"),
        "term") // AQE broadcasts the vocab when small
      .select($"termId", $"docId", $"tf", $"dl", $"posBytes")
  }

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
    val cap = if (cfg.buildPartitions > 0) cfg.buildPartitions
      else spark.sparkContext.defaultParallelism
    // scale-adaptive range sizing (IndexBuilder.sizedParts): position rows
    // are ~4 B/token (VByte deltas + row overhead); the main index is
    // already built, so its token total is in the manifest
    val toks = scala.util.Try(IndexBuilder.stats(cfg).totalTokens)
      .getOrElse(Long.MaxValue / 8)
    val parts = IndexBuilder.sizedParts(toks * 4L, cfg.rangeTargetBytes, cap)
    // persist before a multi-partition range exchange: its sampling job
    // would otherwise run the tokenize + two joins lineage TWICE (the
    // writeRanked one-pass fix; a 1-partition exchange samples nothing,
    // so the persist would be pure churn there)
    val rows0 = positionRows(spark, corpus, cfg, baseDocId = 0L)
    val rows = if (parts > 1)
      rows0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else rows0
    try {
      rows
        .repartitionByRange(parts, $"termId", $"docId")
        .sortWithinPartitions($"termId", $"docId")
        .write.mode("overwrite").parquet(cfg.positionsPath)
    } finally { if (parts > 1) rows.unpersist(); () }

    // single-partition regime: count from the file footers driver-side
    val n = if (parts == 1) IndexBuilder.parquetRowCount(spark, cfg.positionsPath)
      else spark.read.parquet(cfg.positionsPath).count()
    manifest.commit(StageRecord("positions", "complete", fp, n,
      (System.nanoTime() - t0) / 1000000, Map.empty))
    n
  }

  /** Append one batch's position rows as a new positional segment —
    * the sidecar half of [[IndexBuilder.append]] (call it AFTER the main
    * append: the batch's final docIds and any new termIds come from the
    * just-merged docs table and vocabulary). `baseDocId` = the main
    * append's docId base (corpus size before the append). Idempotent on
    * retry: a posseg record with the same caller fingerprint short-
    * circuits, and the staged-write → prefix-delete → move merge keys on
    * the segment index. Returns the batch's row count. */
  def append(spark: SparkSession, batch: Dataset[SourceFile],
      cfg: IndexConfig, fingerprint: String, baseDocId: Long): Long = {
    import spark.implicits._
    val manifest = new Manifest(cfg.indexDir)
    require(manifest.get("positions").nonEmpty,
      s"no positional sidecar at ${cfg.indexDir} — build() it first")
    require(fingerprint.nonEmpty, "positional append needs a fingerprint")
    val fp = s"v${IndexBuilder.FormatVersion}:positions:$fingerprint"
    val existing = manifest.read()
    val prior = existing.collectFirst {
      case (k, r) if k.matches("posseg-\\d+") && r.inputFingerprint == fp =>
        r.rows
    }
    if (prior.isDefined) return prior.get
    val segIdx = existing.keys.count(_.matches("posseg-\\d+"))

    val t0 = System.nanoTime()
    val cap = if (cfg.buildPartitions > 0) cfg.buildPartitions
      else spark.sparkContext.defaultParallelism
    // size the segment's range exchange from the batch's estimated bytes
    // (positions are a fraction of content size; the cap keeps the old
    // core-derived behavior when the estimate is unusable)
    val parts = {
      val s = batch.toDF().queryExecution.optimizedPlan.stats.sizeInBytes
      val bytes = if (s.isValidLong && s.toLong > 0L) s.toLong else Long.MaxValue
      IndexBuilder.sizedParts(bytes, cfg.rangeTargetBytes, cap)
    }
    val stage = s"${cfg.indexDir}/stage_positions_$segIdx"
    // same one-pass persist discipline as build() above
    val rows0 = positionRows(spark, batch, cfg, baseDocId)
    val rows = if (parts > 1)
      rows0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else rows0
    try {
      rows
        .repartitionByRange(parts, $"termId", $"docId")
        .sortWithinPartitions($"termId", $"docId")
        .write.mode("overwrite").parquet(stage)
    } finally { if (parts > 1) rows.unpersist(); () }
    val n = if (parts == 1) IndexBuilder.parquetRowCount(spark, stage)
      else spark.read.parquet(stage).count()
    IndexBuilder.mergeParquetDir(stage, cfg.positionsPath, s"posseg$segIdx")
    // re-list cached plans rooted here now that the posseg files exist: a
    // live Searcher's persisted positional reads pin the pre-append file
    // listing and would otherwise be substituted — minus this segment —
    // into later phrase queries (see IndexBuilder.append step 5)
    spark.catalog.refreshByPath(cfg.indexDir)
    manifest.commit(StageRecord(s"posseg-$segIdx", "complete", fp, n,
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

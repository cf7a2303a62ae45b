package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.CodeTokenizer
import graft.checkpoint.{Manifest, StageRecord}
import graft.model.{CorpusStats, SourceFile}
import graft.query.Searcher
import graft.sources.TableOps

/** Maintained full-text search index over a MANAGED table — the
  * reference's index-maintenance-on-DML role (it updates BwTree/hash
  * indexes inside every Insert/Update/Delete: builtins `IndexInsert/
  * IndexInsertUnique/IndexDelete`, src/include/execution/ast/builtins.h:
  * 229-231, applied by the compiled DML pipelines) re-expressed for a
  * snapshot table store: maintenance is SNAPSHOT-INCREMENTAL, driven by
  * the commit diff rather than per-row hooks.
  *
  * The table store is copy-on-write at file granularity, so the set
  * difference between two versions' manifest file lists IS the change set
  * (the Iceberg incremental-scan observation):
  *
  *   - files ADDED since the last sync → their rows are new documents,
  *     appended as one segment ([[IndexBuilder.append]] — docIds dense
  *     after the existing corpus, vocabulary extended, blocks rebased);
  *   - files REMOVED since the last sync → every row they held left this
  *     table version (deleted, updated, or rewritten by compaction); their
  *     docIds become TOMBSTONES (the Lucene live-docs-bitset role): the
  *     postings stay on disk, scoring skips them.
  *
  * A row REWRITTEN by an update/compaction appears on both sides — its old
  * docId dies, its current content re-enters with a fresh docId — so the
  * live doc set always mirrors the table snapshot exactly.
  *
  * Scoring stays EXACTLY equal to a from-scratch build of the live
  * snapshot (same scores, not just same ranks): alongside the tombstones
  * the refresh records the dead docs' per-term df (re-tokenizing just the
  * removed files) and their token total, and the Searcher scores with
  * df_live / N_live / avgdl_live. Spec-pinned by TableIndexerSpec.
  *
  * Contract: the table carries the corpus columns (repo, path, commit,
  * lang, content) and (repo, path, commit) is unique per snapshot — the
  * same key-uniqueness contract as the builder itself (docIds are dense
  * ranks of the unique key).
  *
  * Scale notes: a refresh touches only the changed files (append cost =
  * O(new rows), tombstone cost = O(removed rows) + one docs-table join
  * pruned to docId < base); nothing re-reads the unchanged corpus. The
  * tombstone set is serving-bounded ([[Searcher.TombstonesMaxDocs]]);
  * past it, [[compact]] rebuilds from the live snapshot and resets the
  * index to the single-segment, zero-tombstone layout.
  */
final class TableIndexer(spark: SparkSession, ops: TableOps,
    val cfg: IndexConfig) {
  import spark.implicits._

  private def manifest = new Manifest(cfg.indexDir)

  private def rebuildDir = s"${cfg.indexDir}__rebuild"

  /** Finish a [[compact]] interrupted between delete and move: the staged
    * rebuild is complete (its marker is written last), the live dir is
    * gone — move the rebuild into place. */
  private def recoverSwap(): Unit = {
    val live = new java.io.File(cfg.indexDir)
    val staged = new java.io.File(rebuildDir)
    if (staged.exists() && new java.io.File(staged, "manifest.json").exists()
        && !new java.io.File(live, "manifest.json").exists()) {
      org.apache.commons.io.FileUtils.deleteDirectory(live)
      java.nio.file.Files.move(staged.toPath, live.toPath)
    }
  }

  private def toCorpus(df: DataFrame) =
    df.select($"repo", $"path", $"commit", $"lang", $"content").as[SourceFile]

  private def commitSync(table: String, v: Long): Unit =
    manifest.commit(StageRecord("tableSync", "complete", s"$table:v$v", v,
      0L, Map("table" -> table, "version" -> v.toString)))

  /** The table version the index currently mirrors. */
  def syncedVersion: Long =
    manifest.get("tableSync").map(_.extra("version").toLong).getOrElse(-1L)

  /** Build the index from the table's current snapshot and record the
    * synced version. `positions = true` also builds the positional
    * sidecar ([[PositionalIndex]] — phrase queries); refreshes then keep
    * it maintained alongside the main index. */
  def create(table: String, positions: Boolean = false): CorpusStats = {
    recoverSwap()
    val v = ops.currentVersion(table)
    require(v >= 0, s"table $table does not exist")
    val st = IndexBuilder.build(spark, toCorpus(ops.readVersion(table, v)),
      cfg, fingerprint = s"table:$table:v$v")
    if (positions)
      PositionalIndex.build(spark, toCorpus(ops.readVersion(table, v)),
        cfg, fingerprint = s"table:$table:v$v")
    commitSync(table, v)
    st
  }

  /** Advance the index to the table's current snapshot: one segment append
    * for the added files' rows, tombstones + df corrections for the
    * removed files' rows. Idempotent on retry (append's merge steps and
    * the versioned tombstone dirs both key on the target version; the
    * manifest record flips last, atomically). */
  def refresh(table: String): CorpusStats = {
    recoverSwap()
    val synced = syncedVersion
    require(synced >= 0, s"index at ${cfg.indexDir} is not synced to a table" +
      " — call create() first")
    val cur = ops.currentVersion(table)
    if (cur == synced) return IndexBuilder.stats(cfg)
    require(cur > synced, s"table $table moved backwards ($synced -> $cur)")

    val oldFiles = ops.dataFiles(table, synced).toSet
    val newFiles = ops.dataFiles(table, cur).toSet
    val removed = oldFiles -- newFiles
    val added = newFiles -- oldFiles

    // docIds below this base are pre-append — the only ones a removed key
    // may refer to (its re-indexed twin, if any, gets an id >= base)
    val base = IndexBuilder.stats(cfg).numDocs

    // skip an empty batch: an added file can hold zero rows (TRUNCATE's
    // empty-state commit) — appending an empty segment is pointless. The
    // manifest's exact per-file row stats answer it without a Spark job;
    // a stats-less legacy file falls back to the isEmpty job.
    val addedRows = ops.rowsOfFilesFromStats(table, cur, added)
    ops.readFilesOf(table, cur, added)
      .filterNot(df => addedRows.map(_ == 0L).getOrElse(df.isEmpty))
      .foreach { df =>
      IndexBuilder.append(spark, toCorpus(df), cfg,
        fingerprint = s"table:$table:v$synced-v$cur")
      // positional sidecar (when built): the batch's position rows land as
      // one positional segment, resolved against the just-merged docs
      // table with `base` as the docId floor — a key REWRITTEN by an
      // update maps only to its fresh id, never its dead twin. Deletes
      // need no positional bookkeeping: phrase df/tf are computed live
      // and tombstoned docs are skipped at query time.
      if (manifest.get("positions").nonEmpty)
        PositionalIndex.append(spark, toCorpus(df), cfg,
          fingerprint = s"table:$table:v$synced-v$cur", baseDocId = base)
    }

    if (removed.nonEmpty) {
      val prev = manifest.get("tombstones")
      val prevDead: DataFrame = prev match {
        case Some(r) => spark.read
          .parquet(s"${cfg.indexDir}/${r.extra("dir")}").select($"docId")
        case None => Seq.empty[Long].toDF("docId")
      }
      val removedRows = ops.readFilesOf(table, synced, removed).get
        .select($"repo", $"path", $"commit", $"content")
      // the removed keys' pre-append docIds, minus already-dead ones
      // (a key compacted/updated in an earlier refresh left a dead docId
      // behind — only the live one dies now, and only it may subtract df)
      val newlyDead = spark.read.parquet(cfg.docsPath)
        .filter($"docId" < base)
        .join(removedRows.select($"repo", $"path", $"commit"),
          Seq("repo", "path", "commit"))
        .join(prevDead, Seq("docId"), "left_anti")
        .select($"docId", $"dl", $"repo", $"path", $"commit")
        .persist()
      val agg = newlyDead.agg(
        count($"docId").as("n"), coalesce(sum($"dl"), lit(0L)).as("tok")).head()
      val (nNew, tokNew) = (agg.getLong(0), agg.getLong(1))
      val totalDead = prev.map(_.rows).getOrElse(0L) + nNew
      val totalTok =
        prev.flatMap(_.extra.get("deadTokens")).map(_.toLong).getOrElse(0L) +
          tokNew
      require(totalDead <= Searcher.TombstonesMaxDocs,
        s"$totalDead tombstones exceed the serving bound — compact() first")

      // df of the dead docs: re-tokenize just the removed rows (their
      // content IS the indexed content — files are immutable and every
      // rewrite re-indexes), distinct terms per doc, count docs per term
      val unicode = cfg.unicodeFold
      val deadTerms = removedRows
        .join(newlyDead.select($"repo", $"path", $"commit"),
          Seq("repo", "path", "commit"), "left_semi")
        .select($"content").as[String]
        .flatMap(c => CodeTokenizer.tokenize(c, unicode).distinct)
        .toDF("term")
        .groupBy($"term").agg(count(lit(1)).as("delta"))
      val vocab = spark.read.parquet(cfg.vocabPath)
        .select($"term", $"termId")
      val newDelta = deadTerms.join(vocab, "term")
        .select($"termId", $"delta")
      val prevDelta: DataFrame = prev match {
        case Some(r) => spark.read
          .parquet(s"${cfg.indexDir}/${r.extra("dfDir")}")
          .select($"termId", $"delta")
        case None => Seq.empty[(Int, Long)].toDF("termId", "delta")
      }
      // versioned output dirs: overwrite-idempotent on retry, invisible
      // until the manifest record flips to them
      val tsDir = s"tombstones-v$cur"
      val dfDir = s"dfdelta-v$cur"
      prevDead.union(newlyDead.select($"docId"))
        .write.mode("overwrite").parquet(s"${cfg.indexDir}/$tsDir")
      prevDelta.union(newDelta)
        .groupBy($"termId").agg(sum($"delta").as("delta"))
        .write.mode("overwrite").parquet(s"${cfg.indexDir}/$dfDir")
      newlyDead.unpersist()
      manifest.commit(StageRecord("tombstones", "complete",
        s"$table:v$cur", totalDead, 0L,
        Map("deadTokens" -> totalTok.toString, "dir" -> tsDir,
          "dfDir" -> dfDir)))
    }

    commitSync(table, cur)
    // drop any cached plans rooted under the index dir a second time: a
    // Searcher left open across this refresh re-materializes its persisted
    // reads from its ORIGINAL file listing, and a later (fresh) Searcher's
    // identical-path reads would be cache-substituted with that stale data.
    // (IndexBuilder.append already invalidated at ITS entry — this covers
    // the refresh's own later reads and readers created after it.)
    spark.catalog.refreshByPath(cfg.indexDir)
    IndexBuilder.stats(cfg)
  }

  /** Reclaim deletes: rebuild the whole index from the table's live
    * snapshot — fresh dense docIds, single segment, zero tombstones —
    * staged beside the live index and swapped in ([[recoverSwap]] covers
    * the delete→move window). The role of a Lucene merge that drops
    * deleted docs; segment-merge WITHOUT delete reclaim is
    * [[IndexBuilder.compact]]. */
  def compact(table: String): CorpusStats = {
    recoverSwap()
    val v = ops.currentVersion(table)
    require(v >= 0, s"table $table does not exist")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(rebuildDir))
    val subCfg = cfg.copy(indexDir = rebuildDir)
    IndexBuilder.build(spark, toCorpus(ops.readVersion(table, v)), subCfg,
      fingerprint = s"table:$table:v$v:rebuild")
    // a maintained positional sidecar is rebuilt fresh with the index
    // (single range-sorted layout again, dead rows dropped)
    if (manifest.get("positions").nonEmpty)
      PositionalIndex.build(spark, toCorpus(ops.readVersion(table, v)),
        subCfg, fingerprint = s"table:$table:v$v:rebuild")
    new Manifest(rebuildDir).commit(StageRecord("tableSync", "complete",
      s"$table:v$v", v, 0L,
      Map("table" -> table, "version" -> v.toString)))
    // swap: delete live, move staged in; a crash between the two is
    // finished by recoverSwap() on the next call
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(cfg.indexDir))
    java.nio.file.Files.move(java.nio.file.Paths.get(rebuildDir),
      java.nio.file.Paths.get(cfg.indexDir))
    IndexBuilder.stats(cfg)
  }
}

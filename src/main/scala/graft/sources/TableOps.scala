package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.immutable.ListMap
import com.fasterxml.jackson.databind.ObjectMapper

/** Snapshot-style managed parquet tables with FILE-LEVEL commits: create /
  * insert / delete / update / MERGE upsert / lazy ALTER ADD+DROP COLUMN /
  * multi-operation transactions (tx) / idempotent streaming ingest /
  * bin-pack + sort-clustered compaction / expire + vacuum lifecycle /
  * named views — all as atomic manifest swaps over immutable data files.
  *
  * Reference parity (SURVEY.md §2.1 Insert/Update/Delete,
  * logical_operators.h:718,929,995; the fork's lazy schema change,
  * DESIGN.md:21-76): terrier mutates MVCC version chains under WAL; the
  * Spark-native equivalent is the Iceberg commit model — a table version is
  * a MANIFEST listing immutable parquet files, and every mutation writes
  * only the files it must, then atomically repoints a `current` marker:
  *
  *   - insert appends the new rows' files and lists old + new (no rewrite);
  *   - delete/update rewrite ONLY the files containing matches — candidate
  *     files are found by a predicate-pushdown scan over each group, where
  *     the parquet footer min/max stats skip non-matching files without
  *     reading their data (the same file-pruning role Iceberg's manifest
  *     stats play);
  *   - ALTER ADD/DROP COLUMN write only a new manifest (schema delta):
  *     defaults are filled on read, dropped columns projected away on read,
  *     and any file touched by a later rewrite materializes the evolved
  *     layout (migration-on-write).
  *
  * At 100 TB this is the difference between an INSERT costing O(new rows)
  * and O(table). Readers resolve `current` at read time, so concurrent
  * readers never observe a torn table; old manifests stay readable (time
  * travel). Crash-safety: data files are written before their manifest and
  * the manifest before the pointer move, so a crash at any point leaves at
  * worst orphaned data dirs, never a torn or inconsistent table.
  *
  * Manifests are Jackson-serialized (never string-interpolated), so column
  * names / default expressions containing quotes or backslashes round-trip.
  */
final class TableOps(spark: SparkSession, root: String) {

  /** A set of files sharing a write-time schema, plus the defaults for
    * columns added since they were written (filled on read, in order). */
  private case class Group(paths: Seq[String], fills: ListMap[String, String])

  /** columns = the version's logical projection (drops = absence);
    * props = commit-carried key/value metadata (e.g. per-source ingest
    * watermarks for idempotent streaming writes), inherited by later
    * versions until overwritten. */
  private case class VersionManifest(columns: Seq[String], groups: Seq[Group],
      props: Map[String, String] = Map.empty)

  private val mapper = new ObjectMapper()

  private def currentMarker(table: String): Path =
    Paths.get(root, table, "current")

  private def manifestPath(table: String, v: Long): Path =
    Paths.get(root, table, s"manifest-v$v.json")

  def currentVersion(table: String): Long = {
    val m = currentMarker(table)
    var v =
      if (Files.exists(m)) new String(Files.readAllBytes(m), "UTF-8").trim.toLong
      else -1L
    // roll forward past a crash between claim+manifest and the pointer
    // move: claim + manifest together mean the commit is durable — the
    // pointer is only a cache of "highest committed"
    while (Files.exists(claimPath(table, v + 1)) &&
        Files.exists(manifestPath(table, v + 1))) v += 1
    v
  }

  /** Files.list with the stream closed (a bare .iterator leaks the
    * directory handle for the life of the process). */
  private def listDir(dir: Path): Seq[Path] = {
    val st = Files.list(dir)
    try { import scala.jdk.CollectionConverters._; st.iterator().asScala.toSeq }
    finally st.close()
  }

  private def atomicWrite(target: Path, bytes: Array[Byte]): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(s".${target.getFileName}.tmp")
    Files.write(tmp, bytes)
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def claimPath(table: String, v: Long): Path =
    Paths.get(root, table, "commits", s"v$v")

  /** Optimistic-concurrency commit (the Iceberg catalog-CAS analogue on a
    * plain filesystem): exactly ONE writer wins each version number via an
    * atomic create-new claim file; the loser gets a
    * ConcurrentCommitException and must recompute against the new current
    * version (its orphaned uuid data dirs are harmless). Claim, then
    * manifest, then pointer — a crash after the claim+manifest is rolled
    * forward by currentVersion(); a crash between claim and manifest
    * leaves an in-doubt claim that subsequent commits surface with a
    * recovery instruction rather than silently losing either write. */
  private def commitVersion(table: String, v: Long, m: VersionManifest): Unit = {
    val claim = claimPath(table, v)
    Files.createDirectories(claim.getParent)
    try Files.createFile(claim)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      // The claim may belong to (a) a writer that already committed, (b) a
      // LIVE writer between claim and manifest, or (c) a crashed writer.
      // (b) and (c) are indistinguishable from a single observation, so
      // re-check with backoff before reporting: a live winner lands its
      // manifest within the wait, and we must never instruct the operator
      // to delete a claim a live writer still holds (that would let two
      // writers claim the same version — a silently lost update).
      var waitMs = 20L
      var waited = 0L
      while (!Files.exists(manifestPath(table, v)) && waited < 1000L) {
        Thread.sleep(waitMs); waited += waitMs; waitMs *= 2
      }
      if (Files.exists(manifestPath(table, v)))
        throw new TableOps.ConcurrentCommitException(
          s"table $table: version $v was committed by another writer — " +
            "reread the table and retry the operation")
      else {
        val ageMs = System.currentTimeMillis -
          Files.getLastModifiedTime(claim).toMillis
        throw new TableOps.ConcurrentCommitException(
          s"table $table: version $v has a claim with no manifest after " +
            s"${waited} ms of re-checking (claim age ${ageMs} ms) — POSSIBLY " +
            "an in-flight writer mid-commit. Verify no writer is active " +
            s"(or that the claim is older than the longest plausible " +
            s"commit) before removing $claim to recover")
      }
    }
    writeManifest(table, v, m)
    atomicWrite(currentMarker(table), v.toString.getBytes("UTF-8"))
  }

  private def writeManifest(table: String, v: Long, m: VersionManifest): Unit = {
    // merge groups with identical fills so the manifest grows with distinct
    // schema states, not with every insert
    var merged = ListMap.empty[ListMap[String, String], Seq[String]]
    m.groups.foreach { g =>
      if (g.paths.nonEmpty)
        merged = merged.updated(g.fills, merged.getOrElse(g.fills, Seq.empty) ++ g.paths)
    }
    val rootNode = mapper.createObjectNode()
    rootNode.put("version", v)
    val cols = rootNode.putArray("columns")
    m.columns.foreach(cols.add)
    val groups = rootNode.putArray("groups")
    merged.foreach { case (fills, paths) =>
      val g = groups.addObject()
      val p = g.putArray("paths")
      paths.foreach(p.add)
      val f = g.putObject("fills")
      fills.foreach { case (c, sql) => f.put(c, sql) }
    }
    if (m.props.nonEmpty) {
      val pr = rootNode.putObject("props")
      m.props.foreach { case (k, value) => pr.put(k, value) }
    }
    atomicWrite(manifestPath(table, v),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(rootNode))
  }

  private def readManifest(table: String, v: Long): VersionManifest = {
    val p = manifestPath(table, v)
    require(Files.exists(p), s"no manifest for $table v$v under $root")
    val n = mapper.readTree(Files.readAllBytes(p))
    val columns = (0 until n.get("columns").size())
      .map(i => n.get("columns").get(i).asText())
    val groups = (0 until n.get("groups").size()).map { i =>
      val g = n.get("groups").get(i)
      val paths = (0 until g.get("paths").size())
        .map(j => g.get("paths").get(j).asText())
      var fills = ListMap.empty[String, String]
      val it = g.get("fills").fieldNames()
      while (it.hasNext) { val k = it.next(); fills += k -> g.get("fills").get(k).asText() }
      Group(paths, fills)
    }
    var props = Map.empty[String, String]
    if (n.has("props")) {
      val it = n.get("props").fieldNames()
      while (it.hasNext) { val k = it.next(); props += k -> n.get("props").get(k).asText() }
    }
    VersionManifest(columns, groups, props)
  }

  /** Write `df` as immutable files under a fresh uuid dir; returns the
    * relative part-file paths for the manifest. */
  private def writeData(table: String, v: Long, df: DataFrame): Seq[String] = {
    val sub = s"data/v$v-${java.util.UUID.randomUUID.toString.take(8)}"
    val dir = s"$root/$table/$sub"
    df.write.mode(SaveMode.Overwrite).parquet(dir)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
      .map(name => s"$sub/$name").toSeq
  }

  private def readGroup(table: String, g: Group, columns: Seq[String]): DataFrame = {
    var df = spark.read.parquet(g.paths.map(p => s"$root/$table/$p"): _*)
    g.fills.foreach { case (c, sql) => df = df.withColumn(c, expr(sql)) }
    df.select(columns.map(col): _*)
  }

  /** Tables under this root (dirs with at least one committed version). */
  def listTables(): Seq[String] = {
    val r = Paths.get(root)
    if (!Files.exists(r)) Seq.empty
    else listDir(r).filter(Files.isDirectory(_))
      .map(_.getFileName.toString)
      .filterNot(_.startsWith("_"))
      .filter(t => currentVersion(t) >= 0)
      .sorted
  }

  /** DROP TABLE: remove the table's whole directory — manifests, claims,
    * stats, data, staging. Irreversible (time travel included); views over
    * the table are left dangling and fail on read with "does not exist",
    * the standard late-binding-view behavior. */
  def dropTable(table: String): Unit = {
    val dir = Paths.get(root, table)
    require(Files.exists(dir) && currentVersion(table) >= 0,
      s"table $table does not exist under $root")
    deleteRecursively(dir)
    ()
  }

  /** TRUNCATE: one commit to the empty state with the current schema —
    * rows gone, history kept (old snapshots still read; expire() reclaims
    * them). The O(1) path for "delete every row", vs delete(lit(true))
    * which the no-empty-manifest guard rejects by design. */
  def truncate(table: String): Long = {
    val v = currentVersion(table)
    require(v >= 0, s"table $table does not exist under $root")
    val next = v + 1
    val m = readManifest(table, v)
    val empty = readVersion(table, v).limit(0).coalesce(1)
    val files = writeData(table, next, empty)
    commitVersion(table, next, m.copy(groups = Seq(Group(files, ListMap.empty))))
    next
  }

  def create(table: String, df: DataFrame): Long = {
    val v = currentVersion(table) + 1
    val files = writeData(table, v, df)
    commitVersion(table, v, VersionManifest(df.columns.toSeq,
      Seq(Group(files, ListMap.empty))))
    v
  }

  def read(table: String): DataFrame = {
    val v = currentVersion(table)
    require(v >= 0, s"table $table does not exist under $root")
    readVersion(table, v)
  }

  /** Read a historical snapshot (time travel). Schema deltas resolve
    * lazily: base files are read as written, added columns are filled from
    * their default expressions, dropped columns are projected away — no
    * data was rewritten at ALTER time. */
  def readVersion(table: String, v: Long): DataFrame = {
    val m = readManifest(table, v)
    require(m.groups.nonEmpty, s"$table v$v has no data files")
    m.groups.map(readGroup(table, _, m.columns)).reduce(_.unionByName(_))
  }

  /** INSERT: write ONLY the new rows' files; the new manifest lists
    * old + new (an O(new rows) commit, never an O(table) rewrite). */
  def insert(table: String, rows: DataFrame): Long = {
    val v = currentVersion(table)
    require(v >= 0, s"table $table does not exist under $root")
    val next = v + 1
    commitVersion(table, next, applyInsert(table, next, readManifest(table, v), rows))
    next
  }

  /** Idempotent INSERT for exactly-once streaming ingest (the Delta-style
    * txn appId/version discipline): each ingest source carries a
    * monotonically increasing batch version (Structured Streaming's
    * batchId); the committed manifest records the highest applied version
    * per source in its props, IN THE SAME atomic commit as the data — so
    * a replayed batch (foreachBatch re-delivers after any failure) is
    * detected against the manifest and skipped, never double-inserted.
    * Returns the table version holding the batch (current version if the
    * batch was already applied). */
  def insertIdempotent(table: String, rows: DataFrame, sourceId: String,
      batchVersion: Long): Long = {
    val v = currentVersion(table)
    require(v >= 0, s"table $table does not exist under $root")
    val m = readManifest(table, v)
    val key = s"ingest.$sourceId"
    if (m.props.get(key).exists(_.toLong >= batchVersion)) return v // replay
    val next = v + 1
    val m2 = applyInsert(table, next, m, rows)
    commitVersion(table, next,
      m2.copy(props = m2.props + (key -> batchVersion.toString)))
    next
  }

  /** DELETE WHERE cond: rewrite only the files containing matches. */
  def delete(table: String, cond: Column): Long =
    mutate(table, cond, df => df.filter(!coalesce(cond, lit(false))))

  /** UPDATE SET col = value WHERE cond: rewrite only matching files. */
  def update(table: String, cond: Column, setCol: String, value: Column): Long =
    mutate(table, cond, df => df.withColumn(setCol,
      when(coalesce(cond, lit(false)), value).otherwise(col(setCol))))

  private def applyInsert(table: String, next: Long, m: VersionManifest,
      rows: DataFrame): VersionManifest = {
    val files = writeData(table, next, rows.select(m.columns.map(col): _*))
    m.copy(groups = m.groups :+ Group(files, ListMap.empty))
  }

  /** Copy-on-write at FILE granularity against an arbitrary working
    * manifest: a pushdown scan finds the files with matching rows (parquet
    * footer min/max prunes the rest without reading data); only those files
    * are rewritten — with the current schema materialized
    * (migration-on-write) — and every untouched file is carried as-is. */
  private def applyMutate(table: String, next: Long, m: VersionManifest,
      cond: Column, rewrite: DataFrame => DataFrame): VersionManifest = {
    var kept = Seq.empty[Group]
    var hitDfs = Seq.empty[DataFrame]
    m.groups.foreach { g =>
      var df = spark.read.parquet(g.paths.map(p => s"$root/$table/$p"): _*)
        .withColumn("__file", input_file_name())
      g.fills.foreach { case (c, sql) => df = df.withColumn(c, expr(sql)) }
      val affected = df.filter(coalesce(cond, lit(false)))
        .select(col("__file")).distinct().collect().map(_.getString(0)).toSet
      val (hit, unhit) = g.paths.partition(p => affected.exists(_.endsWith(p)))
      if (unhit.nonEmpty) kept :+= Group(unhit, g.fills)
      if (hit.nonEmpty) hitDfs :+= readGroup(table, g.copy(paths = hit), m.columns)
    }
    val groups =
      if (hitDfs.isEmpty) kept
      else {
        val rewritten = rewrite(hitDfs.reduce(_.unionByName(_)))
          .select(m.columns.map(col): _*)
        val files = writeData(table, next, rewritten)
        if (files.nonEmpty) kept :+ Group(files, ListMap.empty) else kept
      }
    m.copy(groups = groups)
  }

  private def mutate(table: String, cond: Column,
      rewrite: DataFrame => DataFrame): Long = {
    val v = currentVersion(table)
    require(v >= 0, s"table $table does not exist under $root")
    val next = v + 1
    val m2 = applyMutate(table, next, readManifest(table, v), cond, rewrite)
    require(m2.groups.nonEmpty, s"mutation would leave $table with no files " +
      "(delete of every row is expressed as create of the empty state)")
    commitVersion(table, next, m2)
    next
  }

  /** A multi-operation atomic transaction over one table — the reference's
    * Begin/Commit/Abort surface (transaction_manager.h:50-92: a txn spans
    * arbitrarily many operations; abort rolls all of them back via version
    * chains). Spark-native equivalent: every operation inside the
    * transaction writes its data files eagerly (staged under the target
    * version's uuid dirs) but edits only an IN-MEMORY working manifest;
    * commit publishes the final manifest as ONE optimistic-concurrency
    * version — readers see all of the transaction's effects or none.
    * Abort (any exception out of the body, or rollback()) publishes
    * nothing: the staged files are unreferenced orphans, invisible to
    * every reader and reclaimed by vacuum() — exactly the crash story of
    * single operations, extended to the whole sequence. Operations inside
    * the transaction see their predecessors' effects (read-your-writes),
    * so insert→update→delete compose with sequential semantics. */
  final class Transaction private[TableOps] (table: String, base: Long) {
    private[TableOps] val next: Long = base + 1
    private[TableOps] var work: VersionManifest = readManifest(table, base)

    /** The version this transaction will publish on commit (for the
      * catalog's multi-table intent record). */
    private[sources] def stagedVersion: Long = next

    def insert(rows: DataFrame): Unit =
      work = applyInsert(table, next, work, rows)

    def update(cond: Column, setCol: String, value: Column): Unit =
      work = applyMutate(table, next, work, cond, df => df.withColumn(setCol,
        when(coalesce(cond, lit(false)), value).otherwise(col(setCol))))

    def delete(cond: Column): Unit =
      work = applyMutate(table, next, work, cond,
        df => df.filter(!coalesce(cond, lit(false))))

    /** MERGE inside the transaction (see TableOps.merge): upsert staged
      * against the working state, published with the rest of the tx. */
    def merge(source: DataFrame, key: String, setCols: Seq[String]): Unit =
      work = applyMerge(table, next, work, source, key, setCols)

    /** Lazy ALTERs inside the transaction — DDL composes with DML in one
      * atomic commit (add a column, backfill it with update(), publish
      * both together). */
    def addColumn(name: String, defaultSql: String): Unit =
      work = applyAddColumn(work, name, defaultSql)

    def dropColumn(name: String): Unit =
      work = applyDropColumn(work, name)

    /** The transaction's current working state (uncommitted read-your-writes
      * view; other readers cannot see it). */
    def read(): DataFrame = {
      require(work.groups.nonEmpty, s"transaction state of $table is empty")
      work.groups.map(readGroup(table, _, work.columns)).reduce(_.unionByName(_))
    }

    /** Explicit abort: unwinds tx() without committing. */
    def rollback(): Nothing = throw new TableOps.TransactionAborted(table)
  }

  /** Run `body` as one atomic transaction; returns the committed version.
    * Any exception (including rollback()) aborts — no version is published
    * and the table is unchanged. The commit itself is the same OCC claim as
    * single operations: a concurrent committed writer makes the whole
    * transaction fail with ConcurrentCommitException (retry = rerun tx()).
    * Scope: ONE table — for atomicity ACROSS tables use Catalog.tx, which
    * stages several of these transactions and publishes them under one
    * catalog-pointer flip (the Iceberg/Nessie multi-table-commit model). */
  def tx(table: String)(body: Transaction => Unit): Long = {
    val t = begin(table)
    body(t)
    commitStaged(table, t)
  }

  /** Open a transaction without committing — the staging half of tx(),
    * exposed package-privately so Catalog.tx can stage several tables and
    * commit them under one catalog flip. */
  private[sources] def begin(table: String): Transaction = {
    val v = currentVersion(table)
    require(v >= 0, s"table $table does not exist under $root")
    new Transaction(table, v)
  }

  /** Publish a staged transaction as one OCC version (the commit half of
    * tx()); returns the committed version. */
  private[sources] def commitStaged(table: String, t: Transaction): Long = {
    require(t.work.groups.nonEmpty, s"transaction would leave $table with " +
      "no files (delete of every row is expressed as create of the empty state)")
    commitVersion(table, t.next, t.work)
    t.next
  }

  /** MERGE INTO target USING source ON target.key = source.key
    * WHEN MATCHED THEN UPDATE SET (setCols from source)
    * WHEN NOT MATCHED THEN INSERT (all columns from source)
    * — the keyed-upsert shape every incremental ingest runs (reference
    * plans Insert/InsertSelect + Update with index maintenance,
    * logical_operators.h:718,801,995; the modern surface is SQL MERGE).
    *
    * Copy-on-write at file granularity, like update()/delete(): a semi-join
    * scan per group finds the files holding matched keys (footer min/max
    * prunes the rest); ONLY those files are rewritten, with matched rows
    * taking the source's setCols; unmatched source rows are appended from
    * an anti-join against the full target. One atomic commit covers both
    * halves. `source` must be key-unique (the SQL MERGE cardinality rule —
    * enforced, since duplicate matches would write nondeterministically)
    * and must carry every target column (for the insert half). */
  def merge(table: String, source: DataFrame, key: String,
      setCols: Seq[String]): Long = {
    val v = currentVersion(table)
    require(v >= 0, s"table $table does not exist under $root")
    val next = v + 1
    val m2 = applyMerge(table, next, readManifest(table, v), source, key, setCols)
    require(m2.groups.nonEmpty, s"merge would leave $table with no files")
    commitVersion(table, next, m2)
    next
  }

  private def applyMerge(table: String, next: Long, m: VersionManifest,
      source: DataFrame, key: String, setCols: Seq[String]): VersionManifest = {
    require(m.columns.contains(key), s"no key column $key in $table")
    require(setCols.forall(m.columns.contains),
      s"setCols ${setCols.filterNot(m.columns.contains)} not in $table")
    require(!setCols.contains(key), "cannot update the merge key itself")
    val src = source.select(m.columns.map(col): _*)
    require(src.groupBy(col(key)).count().filter(col("count") > 1).isEmpty,
      s"merge source has duplicate $key values (SQL MERGE cardinality rule)")
    val srcKeys = src.select(col(key))
    var kept = Seq.empty[Group]
    var hitDfs = Seq.empty[DataFrame]
    // insert-only merge (no setCols): a matched row is a no-op, so skip
    // the matched-file scan entirely — no file is rewritten, only the
    // anti-join insert half runs
    if (setCols.isEmpty) kept = m.groups
    else m.groups.foreach { g =>
      var df = spark.read.parquet(g.paths.map(p => s"$root/$table/$p"): _*)
        .withColumn("__file", input_file_name())
      g.fills.foreach { case (c, sql) => df = df.withColumn(c, expr(sql)) }
      val affected = df.join(srcKeys, Seq(key), "left_semi")
        .select(col("__file")).distinct().collect().map(_.getString(0)).toSet
      val (hit, unhit) = g.paths.partition(p => affected.exists(_.endsWith(p)))
      if (unhit.nonEmpty) kept :+= Group(unhit, g.fills)
      if (hit.nonEmpty) hitDfs :+= readGroup(table, g.copy(paths = hit), m.columns)
    }
    // matched rows: source values for setCols, keyed by an explicit marker
    // (NOT coalesce — a legitimately-NULL source value must win)
    val marked = src.select(col(key) +: setCols.map(c =>
      col(c).as(s"__src_$c")) :+ lit(true).as("__matched"): _*)
    val updated = hitDfs.reduceOption(_.unionByName(_)).map { hits =>
      hits.join(marked, Seq(key), "left").select(m.columns.map { c =>
        if (setCols.contains(c))
          when(col("__matched"), col(s"__src_$c")).otherwise(col(c)).as(c)
        else col(c)
      }: _*)
    }
    // unmatched source rows = anti-join vs the FULL current target
    val target = m.groups.map(readGroup(table, _, m.columns))
      .reduce(_.unionByName(_))
    val inserts = src.join(target.select(col(key)), Seq(key), "left_anti")
      .select(m.columns.map(col): _*)
    val toWrite = updated.map(_.unionByName(inserts)).getOrElse(inserts)
    val files = writeData(table, next, toWrite)
    val groups = if (files.nonEmpty) kept :+ Group(files, ListMap.empty) else kept
    m.copy(groups = groups)
  }

  /** Table-file compaction — the missing half of the O(new rows) insert
    * story (the reference's background block compactor,
    * /root/reference/src/storage/block_compactor.cpp, folds hot blocks into
    * cold contiguous blocks; Iceberg ships the same as rewrite_data_files):
    * every insert appends a small file-group, and at 100 TB the accumulated
    * small files — not the data volume — kill scan planning. compactTable
    * bin-packs all files SMALLER than `targetFileBytes` into consolidated
    * files (materializing the current schema — migration-on-write) and
    * commits them as one new version; files already at target size are
    * carried by reference, untouched. Older versions keep their manifests
    * and files, so time travel is intact; expire() reclaims the superseded
    * small files. coalesce (not repartition): bin-packing needs no shuffle —
    * each output task drains a run of input files, the Iceberg binpack
    * strategy.
    *
    * `sortBy` (opt-in, Iceberg's "sort" rewrite strategy) range-partitions
    * and sorts the packed rows instead: output files get DISJOINT min/max
    * ranges on the sort columns, so parquet footer stats actually prune —
    * every later file-level mutate/merge/scan with a predicate on those
    * columns touches only the files whose range matches. Costs one shuffle
    * (the point of doing it at compaction time, once, instead of per
    * query).
    *
    * `zorder = true` (with ≥2 numeric sortBy columns — Delta's OPTIMIZE
    * ZORDER BY) clusters on the Z-value instead: each column is min/max
    * normalized to 16 bits and the bits INTERLEAVED into one key, so
    * every output file covers a bounded range in EVERY listed dimension —
    * footer stats then prune for predicates on any of them, where a
    * lexicographic sort only ever prunes on its leading column. The
    * interleave is a pure Catalyst expression fold (codegen'd, no UDF).
    * Returns the new version (or the current one if there was nothing to
    * compact). */
  def compactTable(table: String, targetFileBytes: Long = 128L * 1024 * 1024,
      sortBy: Seq[String] = Nil, zorder: Boolean = false): Long = {
    val v = currentVersion(table)
    require(v >= 0, s"table $table does not exist under $root")
    val m = readManifest(table, v)
    var carried = Seq.empty[Group]
    var small = Seq.empty[Group]
    var smallBytes = 0L
    var nSmall = 0
    m.groups.foreach { g =>
      // bin-packing rewrites only sub-target files; CLUSTERING (sortBy)
      // rewrites everything — a file already at target size is still in
      // the wrong order (Delta's OPTIMIZE ZORDER rewrites all files)
      val (big, sm) =
        if (sortBy.nonEmpty) (Seq.empty[String], g.paths)
        else g.paths.partition(p =>
          Files.size(Paths.get(root, table, p)) >= targetFileBytes)
      if (big.nonEmpty) carried :+= Group(big, g.fills)
      if (sm.nonEmpty) {
        small :+= Group(sm, g.fills)
        smallBytes += sm.map(p => Files.size(Paths.get(root, table, p))).sum
        nSmall += sm.size
      }
    }
    if (nSmall <= 1 && sortBy.isEmpty) return v // nothing to bin-pack
    if (small.isEmpty) return v
    val next = v + 1
    val byBytes = math.max(1L, (smallBytes + targetFileBytes - 1) / targetFileBytes)
    // plain bin-packing never SPLITS (capped at the input file count);
    // sort/z-order clustering may legitimately split one jumbled file
    // into many range files
    val nOut = (if (sortBy.isEmpty) byBytes.min(nSmall.toLong) else byBytes).toInt
    val unioned = small.map(readGroup(table, _, m.columns))
      .reduce(_.unionByName(_))
    val packed =
      if (sortBy.isEmpty) unioned.coalesce(nOut)
      else if (!zorder) unioned.repartitionByRange(nOut, sortBy.map(col): _*)
        .sortWithinPartitions(sortBy.map(col): _*)
      else {
        require(sortBy.size >= 2, "zorder needs >= 2 columns (use plain sortBy for 1)")
        // per-column min/max in one pass, then 16-bit normalize + interleave
        val aggs = sortBy.flatMap(c => Seq(
          min(col(c).cast("double")).as(s"${c}__mn"),
          max(col(c).cast("double")).as(s"${c}__mx")))
        val r = unioned.agg(aggs.head, aggs.tail: _*).head()
        val Bits = 16
        val normed = sortBy.map { c =>
          // boxed reads: an all-NULL or non-castable column has null
          // min/max — it carries no order information, z-bits 0 (same as
          // a constant column), rather than an unboxing NPE
          val mn = Option(r.getAs[java.lang.Double](s"${c}__mn")).map(_.doubleValue)
          val mx = Option(r.getAs[java.lang.Double](s"${c}__mx")).map(_.doubleValue)
          (mn, mx) match {
            case (Some(lo), Some(hi)) if hi > lo =>
              ((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit((1 << Bits) - 1))
                .cast("long")
            case _ => lit(0L)
          }
        }
        // interleave: bit i of column j lands at position i*dims + j
        val zkey = (0 until Bits).flatMap(i => normed.zipWithIndex.map {
          case (n, j) => shiftleft(shiftright(n, i).bitwiseAND(lit(1L)),
            i * sortBy.size + j)
        }).reduce(_ + _)
        unioned.withColumn("__zkey", zkey)
          .repartitionByRange(nOut, col("__zkey"))
          .sortWithinPartitions(col("__zkey"))
          .drop("__zkey")
      }
    val files = writeData(table, next, packed)
    commitVersion(table, next, m.copy(groups =
      if (files.nonEmpty) carried :+ Group(files, ListMap.empty) else carried))
    next
  }

  /** ALTER TABLE ADD COLUMN with LAZY migration — the reference fork's
    * headline feature (DESIGN.md:21-76): only a new manifest is written;
    * readers fill the default on the fly; rewrites materialize it. */
  def addColumn(table: String, name: String, defaultSql: String): Long = {
    val v = currentVersion(table)
    require(v >= 0, s"table $table does not exist under $root")
    val next = v + 1
    commitVersion(table, next,
      applyAddColumn(readManifest(table, v), name, defaultSql))
    next
  }

  // copy (not a fresh VersionManifest): props — e.g. recorded ingest batch
  // watermarks — must survive a schema change, or a post-ALTER streaming
  // replay would double-insert
  private def applyAddColumn(m: VersionManifest, name: String,
      defaultSql: String): VersionManifest = {
    require(!m.columns.contains(name), s"column $name already exists")
    m.copy(columns = m.columns :+ name,
      groups = m.groups.map(g => g.copy(fills = g.fills + (name -> defaultSql))))
  }

  /** ANALYZE TABLE: per-column statistics — row count, null count, exact
    * NDV, numeric min/max — the same per-column stat set the reference's
    * optimizer keeps (stats_calculator.cpp: HLL-backed ndv, min/max,
    * null fraction feeding its cost model). Computed in ONE aggregation
    * pass over the current snapshot, returned as a DataFrame AND persisted
    * as stats-vN.json next to the manifest so the optimizer (or a human)
    * reads them without a rescan; Spark's own CBO twin
    * (`ANALYZE TABLE ... FOR ALL COLUMNS` + spark.sql.cbo.enabled) is
    * exercised in StatsSpec. */
  def analyze(table: String): DataFrame = {
    val v = currentVersion(table)
    require(v >= 0, s"table $table does not exist under $root")
    val df = read(table)
    val numeric = df.schema.fields.filter(f => f.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    }).map(_.name).toSet
    val aggs = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      // coalesce: sum() over zero rows is NULL — an empty (or all-pruned)
      // table must yield 0 null-counts, not an unboxing NPE
      Seq(coalesce(sum(c.isNull.cast("long")), lit(0L)).as(s"${f.name}__nulls"),
        countDistinct(c).as(s"${f.name}__ndv")) ++
        (if (numeric(f.name))
          Seq(min(c).cast("double").as(s"${f.name}__min"),
            max(c).cast("double").as(s"${f.name}__max"))
        else Seq.empty)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def g(n: String): Long = row.getAs[Long](n)
    val statRows = df.schema.fields.map { f =>
      (f.name, g(s"${f.name}__nulls"), g(s"${f.name}__ndv"),
        if (numeric(f.name)) Option(row.getAs[java.lang.Double](s"${f.name}__min"))
          .map(_.doubleValue) else None,
        if (numeric(f.name)) Option(row.getAs[java.lang.Double](s"${f.name}__max"))
          .map(_.doubleValue) else None)
    }.sortBy(_._1)
    val node = mapper.createObjectNode()
    node.put("version", v)
    val cols = node.putArray("columns")
    statRows.foreach { case (name, nulls, ndv, mn, mx) =>
      val o = cols.addObject()
      o.put("name", name); o.put("nulls", nulls); o.put("ndv", ndv)
      mn.foreach(o.put("min", _)); mx.foreach(o.put("max", _))
    }
    atomicWrite(Paths.get(root, table, s"stats-v$v.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    import spark.implicits._
    statRows.toSeq
      .toDF("col_name", "n_nulls", "ndv", "min_num", "max_num")
      .orderBy(col("col_name"))
  }

  /** ALTER TABLE DROP COLUMN with LAZY semantics (the fork's symmetric
    * delta, alter_plan_node.h:165 DropColumnCmd): only a new manifest is
    * written — the column vanishes from the logical projection; data files
    * keep it physically until their next rewrite; older snapshots (time
    * travel) still expose it. */
  def dropColumn(table: String, name: String): Long = {
    val v = currentVersion(table)
    require(v >= 0, s"table $table does not exist under $root")
    val next = v + 1
    commitVersion(table, next, applyDropColumn(readManifest(table, v), name))
    next
  }

  private def applyDropColumn(m: VersionManifest, name: String): VersionManifest = {
    require(m.columns.contains(name), s"no column $name — cannot drop")
    m.copy(columns = m.columns.filterNot(_ == name),
      groups = m.groups.map(g => g.copy(fills = g.fills - name)))
  }

  /** Recursively delete a file or directory tree (e.g. a `_temporary` dir
    * left by a crashed Spark write nested inside a writer dir — a flat
    * Files.delete would throw DirectoryNotEmptyException mid-sweep and
    * leave expire/vacuum partially applied). Returns deleted parquet count. */
  private def deleteRecursively(p: Path): Int = {
    var parquet = 0
    if (Files.isDirectory(p)) listDir(p).foreach(parquet += deleteRecursively(_))
    else if (p.getFileName.toString.endsWith(".parquet")) parquet = 1
    Files.delete(p)
    parquet
  }

  /** Snapshot expiration — the lifecycle half of the commit model (the
    * reference GCs version chains in garbage_collector.cpp; Iceberg's
    * expire_snapshots): drop every version older than the newest
    * `keepVersions`, delete their manifests / claims / stats, then delete
    * the data files those EXPIRED manifests referenced and no kept manifest
    * still does. Time travel inside the kept window stays exact (files are
    * refcounted across manifests, so a file shared with a kept version
    * survives); reads of expired versions fail with "no manifest". Files
    * referenced by NO manifest at all (in-flight or crashed writers) are
    * deliberately NOT expire's business — only vacuum(), with its age
    * guard, touches them — so expire is safe to run concurrently with a
    * writer. Returns (expiredVersions, deletedFiles). */
  def expire(table: String, keepVersions: Int): (Int, Int) = {
    require(keepVersions >= 1, "must keep at least the current version")
    val current = currentVersion(table)
    require(current >= 0, s"table $table does not exist under $root")
    val keepFrom = math.max(0L, current - keepVersions + 1)
    val kept = (keepFrom to current).filter(v => Files.exists(manifestPath(table, v)))
    val referenced: Set[String] =
      kept.flatMap(v => readManifest(table, v).groups.flatMap(_.paths)).toSet
    // files owned by the expiring window: referenced by an expired manifest,
    // by no kept one (read these BEFORE deleting the manifests)
    val expiring = (0L until keepFrom)
      .filter(v => Files.exists(manifestPath(table, v)))
    val toDelete: Set[String] = expiring
      .flatMap(v => readManifest(table, v).groups.flatMap(_.paths))
      .toSet -- referenced
    var expired = 0
    (0L until keepFrom).foreach { v =>
      val mp = manifestPath(table, v)
      if (Files.exists(mp)) { Files.delete(mp); expired += 1 }
      Files.deleteIfExists(claimPath(table, v))
      Files.deleteIfExists(Paths.get(root, table, s"stats-v$v.json"))
    }
    var deleted = 0
    toDelete.foreach { rel =>
      val p = Paths.get(root, table, rel)
      if (Files.deleteIfExists(p)) deleted += 1
    }
    // sweep writer dirs the deletions emptied of expired-owned content:
    // remaining entries that are neither referenced nor parquet (Spark
    // _SUCCESS markers, crashed _temporary dirs) go with the dir
    toDelete.map(rel => Paths.get(root, table, rel).getParent).foreach { sub =>
      if (Files.exists(sub)) {
        val rel = s"data/${sub.getFileName}"
        val entries = listDir(sub)
        val liveContent = entries.exists(f =>
          referenced.contains(s"$rel/${f.getFileName}") ||
            f.getFileName.toString.endsWith(".parquet"))
        if (!liveContent) deleteRecursively(sub)
      }
    }
    (expired, deleted)
  }

  /** Orphan-file vacuum: delete data files referenced by NO manifest at all
    * — the uuid dirs left by crashed, aborted-transaction or OCC-losing
    * writers (acknowledged harmless for correctness, unbounded for
    * storage). An in-flight writer's files are also not yet referenced —
    * the standard Iceberg remove_orphan_files hazard — so `minAgeMs`
    * defaults to the production-safe 24 h (TableOps.DefaultVacuumAgeMs):
    * only dirs whose every file is older than the longest plausible commit
    * are swept. Tests and single-writer maintenance windows pass 0L
    * explicitly. Returns deleted parquet-file count. */
  def vacuum(table: String, minAgeMs: Long = TableOps.DefaultVacuumAgeMs): Int = {
    require(currentVersion(table) >= 0, s"table $table does not exist under $root")
    val referenced: Set[String] = listDir(Paths.get(root, table))
      .filter(_.getFileName.toString.matches("manifest-v\\d+\\.json"))
      .flatMap { p =>
        val v = p.getFileName.toString.stripPrefix("manifest-v")
          .stripSuffix(".json").toLong
        readManifest(table, v).groups.flatMap(_.paths)
      }.toSet
    var deleted = 0
    val now = System.currentTimeMillis
    val dataRoot = Paths.get(root, table, "data")
    if (Files.exists(dataRoot)) {
      listDir(dataRoot).filter(Files.isDirectory(_)).foreach { sub =>
        val rel = s"data/${sub.getFileName}"
        val files = listDir(sub)
        val anyReferenced =
          files.exists(f => referenced.contains(s"$rel/${f.getFileName}"))
        // age check walks the whole subtree, so a fresh file inside a
        // nested _temporary dir also holds the sweep back
        def ageOk(p: Path): Boolean =
          if (Files.isDirectory(p)) listDir(p).forall(ageOk)
          else now - Files.getLastModifiedTime(p).toMillis >= minAgeMs
        if (!anyReferenced && files.nonEmpty && files.forall(ageOk))
          deleted += deleteRecursively(sub)
      }
    }
    deleted
  }

  // --- named views (reference create_view_plan_node.h /
  // drop_view_plan_node.h, SURVEY.md §2.11): a view is a stored SQL text
  // over a managed table, resolved against the table's CURRENT version at
  // read time (so a view automatically sees later inserts — the standard
  // late-binding view semantics). Stored as Jackson JSON under the root's
  // _views/ namespace; create/drop never touch table manifests, so
  // existing snapshots are unaffected by definition.

  private def viewPath(name: String): Path = Paths.get(root, "_views", s"$name.json")

  /** CREATE [OR REPLACE] VIEW name AS <sql>, where <sql> references the
    * managed table by its table name. */
  def createView(name: String, table: String, sql: String,
      replace: Boolean = false): Unit = {
    require(currentVersion(table) >= 0, s"table $table does not exist under $root")
    require(replace || !Files.exists(viewPath(name)),
      s"view $name already exists (use replace = true)")
    val node = mapper.createObjectNode()
    node.put("table", table)
    node.put("sql", sql)
    atomicWrite(viewPath(name),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
  }

  /** Resolve a view: read the CURRENT table snapshot, register it under the
    * table name, run the stored SQL. */
  def readView(name: String): DataFrame = {
    val p = viewPath(name)
    require(Files.exists(p), s"view $name does not exist under $root")
    val n = mapper.readTree(Files.readAllBytes(p))
    val table = n.get("table").asText()
    read(table).createOrReplaceTempView(table)
    spark.sql(n.get("sql").asText())
  }

  def dropView(name: String): Unit = {
    require(Files.exists(viewPath(name)), s"view $name does not exist under $root")
    Files.delete(viewPath(name))
  }

  def viewExists(name: String): Boolean = Files.exists(viewPath(name))
}

object TableOps {
  /** Thrown when another writer committed the version this operation tried
    * to claim (write-write conflict under optimistic concurrency). */
  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  /** Thrown by Transaction.rollback() — unwinds tx() without committing. */
  final class TransactionAborted(table: String)
    extends RuntimeException(s"transaction on $table rolled back")

  /** Default orphan age below which vacuum() will not sweep: longer than
    * any plausible in-flight commit, so the default orientation is safe
    * against a live writer (tests pass 0L explicitly). */
  val DefaultVacuumAgeMs: Long = 24L * 3600 * 1000
}

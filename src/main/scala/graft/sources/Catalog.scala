package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.immutable.ListMap
import com.fasterxml.jackson.databind.ObjectMapper

/** Catalog-level snapshots: MULTI-TABLE atomic transactions over TableOps
  * tables — the cross-table half of the reference's transaction surface
  * (transaction_manager.h: one txn timestamp spans every table it touches;
  * the TPC-C NewOrder writes warehouse+district+orders+lineitem as one
  * unit).
  *
  * Model (the Iceberg/Nessie multi-table-commit design): a CATALOG version
  * is a JSON map tableName → tableVersion, committed with the same
  * claim-file OCC + atomic pointer move as table manifests. A multi-table
  * transaction stages every table's work through the existing per-table
  * Transaction machinery, commits each table's version, then performs ONE
  * catalog flip — the atomic cut. Readers that resolve tables through the
  * catalog (`read`) always see a consistent cross-table snapshot: all of a
  * transaction's effects or none, plus time travel across the whole
  * catalog (`readAt`).
  *
  * Declared visibility boundary (not an accident): per-table commits are
  * individually durable, so a reader going DIRECTLY to a table (plain
  * TableOps.read) can observe table A's new version while the catalog
  * still maps the pre-transaction snapshot — per-table read-committed, the
  * same two-level reality Iceberg has between a table's metadata files and
  * the catalog that names the current one. Cross-table atomicity is a
  * property of catalog-resolved reads.
  *
  * Crash story: an INTENT record (the WAL analogue) listing every
  * (table, version) is written durably BEFORE the per-table commits; a
  * crash after some table commits leaves the catalog at the previous
  * consistent snapshot, and `recover()` completes the flip iff every
  * intended table version is durable (claim + manifest), else reports the
  * intent for the operator — never a torn catalog.
  *
  * Lifecycle caveat: TableOps.expire() reasons about per-table history
  * only; expiring a table version an OLD catalog snapshot still maps
  * breaks readAt() for that snapshot (the standard Iceberg caveat —
  * snapshot expiration bounds catalog time travel). Keep at least as many
  * table versions as the catalog history you want replayable. */
final class Catalog(spark: SparkSession, root: String) {

  /** The underlying per-table store (shared layout: catalog tables are
    * ordinary TableOps tables plus a `_catalog/` namespace). */
  val tables = new TableOps(spark, root)

  private val mapper = new ObjectMapper()
  private def catDir: Path = Paths.get(root, "_catalog")
  private def catPath(v: Long): Path = catDir.resolve(s"cat-v$v.json")
  private def claimPath(v: Long): Path =
    catDir.resolve("commits").resolve(s"v$v")
  private def marker: Path = catDir.resolve("current")
  private def intentPath(id: String): Path =
    catDir.resolve("intents").resolve(s"$id.json")

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

  /** Same claim+roll-forward discipline as TableOps.currentVersion. */
  def currentCatalogVersion: Long = {
    var v =
      if (Files.exists(marker))
        new String(Files.readAllBytes(marker), "UTF-8").trim.toLong
      else -1L
    while (Files.exists(claimPath(v + 1)) && Files.exists(catPath(v + 1))) v += 1
    v
  }

  private def readCat(v: Long): ListMap[String, Long] = {
    val p = catPath(v)
    require(Files.exists(p), s"no catalog version $v under $root")
    val n = mapper.readTree(Files.readAllBytes(p))
    var m = ListMap.empty[String, Long]
    val it = n.get("tables").fieldNames()
    while (it.hasNext) { val k = it.next(); m += k -> n.get("tables").get(k).asLong() }
    m
  }

  private def serializeCat(v: Long, m: Map[String, Long]): Array[Byte] = {
    val node = mapper.createObjectNode()
    node.put("version", v)
    val t = node.putObject("tables")
    m.foreach { case (k, tv) => t.put(k, tv) }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node)
  }

  /** One-writer-per-version catalog commit (claim → file → pointer). */
  private def commitCat(v: Long, m: Map[String, Long]): Unit = {
    val claim = claimPath(v)
    Files.createDirectories(claim.getParent)
    try Files.createFile(claim)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      throw new TableOps.ConcurrentCommitException(
        s"catalog version $v was claimed by another writer — " +
          "reread the catalog and retry the transaction")
    }
    atomicWrite(catPath(v), serializeCat(v, m))
    atomicWrite(marker, v.toString.getBytes("UTF-8"))
  }

  /** Snapshot a table's CURRENT version into the catalog (CREATE/REGISTER).
    * Returns the new catalog version. */
  def register(table: String): Long = {
    val tv = tables.currentVersion(table)
    require(tv >= 0, s"table $table does not exist under $root")
    val cv = currentCatalogVersion
    val base = if (cv >= 0) readCat(cv) else ListMap.empty[String, Long]
    val next = cv + 1
    commitCat(next, base + (table -> tv))
    next
  }

  /** Remove a table from the catalog's namespace (a new catalog snapshot
    * without it); the table itself and its history are untouched —
    * dropping the data is TableOps.dropTable's job, after unregistering. */
  def unregister(table: String): Long = {
    val cv = currentCatalogVersion
    require(cv >= 0, s"catalog is empty under $root")
    val base = readCat(cv)
    require(base.contains(table), s"table $table is not in the catalog")
    val next = cv + 1
    commitCat(next, base - table)
    next
  }

  /** Tables the CURRENT catalog snapshot maps, with their versions. */
  def listTables(): Map[String, Long] = {
    val cv = currentCatalogVersion
    if (cv < 0) Map.empty else readCat(cv)
  }

  def tableVersion(table: String): Long = {
    val cv = currentCatalogVersion
    require(cv >= 0, s"catalog is empty under $root")
    readCat(cv).getOrElse(table,
      throw new IllegalArgumentException(s"table $table is not in the catalog"))
  }

  /** Catalog-resolved read: the version the CURRENT catalog snapshot maps,
    * regardless of per-table pointers — the atomic cross-table view. */
  def read(table: String): DataFrame =
    tables.readVersion(table, tableVersion(table))

  /** Catalog time travel: the whole multi-table state as of catalog
    * version `cv`. */
  def readAt(cv: Long, table: String): DataFrame = {
    val m = readCat(cv)
    tables.readVersion(table, m.getOrElse(table,
      throw new IllegalArgumentException(
        s"table $table is not in catalog version $cv")))
  }

  /** A multi-table transaction: per-table staging through the existing
    * Transaction machinery (insert/update/delete/merge/addColumn/
    * dropColumn all compose), committed under ONE catalog flip. */
  final class MultiTx private[Catalog] () {
    private[Catalog] var txs = ListMap.empty[String, tables.Transaction]

    /** The staging handle for `table` (opened lazily; the table must be
      * registered in the catalog so the flip can cover it). */
    def on(table: String): tables.Transaction = txs.getOrElse(table, {
      tableVersion(table) // must be catalog-managed
      val t = tables.begin(table)
      txs += table -> t
      t
    })

    def rollback(): Nothing = throw new TableOps.TransactionAborted("catalog")
  }

  /** Run `body` as ONE atomic multi-table transaction; returns the new
    * catalog version. Any exception aborts: nothing is committed anywhere
    * and staged files are vacuumable orphans. Commit order: durable intent
    * record → per-table OCC commits → catalog flip → intent removed. A
    * conflict on any per-table commit (or the flip) throws
    * ConcurrentCommitException — rerun the whole transaction. */
  def tx(body: MultiTx => Unit): Long = {
    val cv = currentCatalogVersion
    require(cv >= 0, s"catalog is empty under $root — register tables first")
    val t = new MultiTx()
    body(t)
    require(t.txs.nonEmpty, "transaction touched no tables")
    val intended: Map[String, Long] =
      t.txs.map { case (name, tr) => name -> tr.stagedVersion }
    val intentId = java.util.UUID.randomUUID.toString.take(8)
    val node = mapper.createObjectNode()
    node.put("catalogBase", cv)
    val tn = node.putObject("tables")
    intended.foreach { case (k, v) => tn.put(k, v) }
    atomicWrite(intentPath(intentId),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    try {
      t.txs.foreach { case (name, tr) => tables.commitStaged(name, tr) }
      val next = currentCatalogVersion + 1
      commitCat(next, readCat(next - 1) ++ intended)
      next
    } finally Files.deleteIfExists(intentPath(intentId))
    // a crash before the finally leaves the intent on disk for recover()
  }

  /** Catalog-history expiration (the catalog twin of TableOps.expire):
    * drop every catalog snapshot older than the newest `keepVersions`
    * (file + claim). Table manifests and data are NOT touched — run
    * TableOps.expire per table afterwards, keeping at least the table
    * versions the kept catalog window still maps (see the lifecycle
    * caveat above). Returns the expired-snapshot count. */
  def expireCatalog(keepVersions: Int): Int = {
    require(keepVersions >= 1, "must keep at least the current snapshot")
    val cur = currentCatalogVersion
    require(cur >= 0, s"catalog is empty under $root")
    val keepFrom = math.max(0L, cur - keepVersions + 1)
    var n = 0
    (0L until keepFrom).foreach { v =>
      if (Files.deleteIfExists(catPath(v))) n += 1
      Files.deleteIfExists(claimPath(v))
    }
    n
  }

  /** Complete flips interrupted between the per-table commits and the
    * catalog pointer move: for each surviving intent whose EVERY intended
    * table version is durable (claim + manifest), apply the flip; intents
    * with missing table commits are left for the operator (their writer
    * died mid-commit; the staged versions that did land are per-table
    * durable and harmless). Returns (flipsApplied, intentsLeft). */
  def recover(): (Int, Int) = {
    val dir = catDir.resolve("intents")
    if (!Files.exists(dir)) return (0, 0)
    val st = Files.list(dir)
    val intents =
      try { import scala.jdk.CollectionConverters._
        st.iterator().asScala.toSeq.filter(_.toString.endsWith(".json")) }
      finally st.close()
    var applied = 0
    var left = 0
    intents.foreach { p =>
      val n = mapper.readTree(Files.readAllBytes(p))
      var m = ListMap.empty[String, Long]
      val it = n.get("tables").fieldNames()
      while (it.hasNext) { val k = it.next(); m += k -> n.get("tables").get(k).asLong() }
      val allDurable = m.forall { case (table, v) =>
        tables.currentVersion(table) >= v // claim+manifest roll-forward
      }
      if (allDurable) {
        val cur = currentCatalogVersion
        val curMap = readCat(cur)
        // already covered (flip happened, crash was before intent delete)?
        if (m.forall { case (k, v) => curMap.get(k).exists(_ >= v) }) ()
        else commitCat(cur + 1, curMap ++ m)
        Files.delete(p)
        applied += 1
      } else left += 1
    }
    (applied, left)
  }
}

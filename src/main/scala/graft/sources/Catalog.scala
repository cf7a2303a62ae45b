package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap
import com.fasterxml.jackson.databind.ObjectMapper
import graft.io.TableIO

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
  * Transaction machinery, then commits with a REDO-LOG protocol:
  *
  *   1. write a durable INTENT record carrying the transaction id AND the
  *      full manifest content each table will publish (redo content, not
  *      just version numbers);
  *   2. CLAIM every table's target version, all-or-nothing, with the txn id
  *      as the claim token — once the claims are held no other writer can
  *      commit those versions, so the transaction can no longer lose;
  *      a claim conflict here aborts cleanly (own claims released, intent
  *      deleted, nothing published anywhere);
  *   3. publish every table's manifest (conflict-free under the claims);
  *   4. flip the catalog pointer — retried past concurrent register()
  *      flips, merging per-entry with max() so a mapping never regresses;
  *   5. delete the intent.
  *
  * A crash at ANY point leaves a state `recover()` resolves exactly: before
  * step 2 completes → roll BACK (release own claims, drop the intent);
  * after step 2 → roll FORWARD from the intent's redo content (publish the
  * missing manifests, flip, drop the intent). Identity is verified
  * everywhere — claims carry the txn id, published manifests carry it in
  * their props — so recovery can never mistake a foreign writer's commit
  * at the same version number for its own (and never flips a catalog onto
  * another transaction's content).
  *
  * Declared visibility boundary (not an accident): per-table commits are
  * individually durable, so a reader going DIRECTLY to a table (plain
  * TableOps.read) can observe table A's new version while the catalog
  * still maps the pre-transaction snapshot — per-table read-committed, the
  * same two-level reality Iceberg has between a table's metadata files and
  * the catalog that names the current one. Cross-table atomicity is a
  * property of catalog-resolved reads.
  *
  * `recover()` is an administrative operation: run it when no writer that
  * could own the surviving intents is still alive (the standard recovery
  * contract — a WAL replay makes the same assumption).
  *
  * Lifecycle caveat: TableOps.expire() reasons about per-table history
  * only; expiring a table version an OLD catalog snapshot still maps
  * breaks readAt() for that snapshot (the standard Iceberg caveat —
  * snapshot expiration bounds catalog time travel). Keep at least as many
  * table versions as the catalog history you want replayable. */
final class Catalog(spark: SparkSession, root: String, io: TableIO) {

  def this(spark: SparkSession, root: String) =
    this(spark, root, TableIO.forPath(root, spark.sessionState.newHadoopConf()))

  /** The underlying per-table store (shared layout: catalog tables are
    * ordinary TableOps tables plus a `_catalog/` namespace). */
  val tables = new TableOps(spark, root, io)

  private val mapper = new ObjectMapper()
  private def catDir: String = s"$root/_catalog"
  private def catPath(v: Long): String = s"$catDir/cat-v$v.json"
  private def claimPath(v: Long): String = s"$catDir/commits/v$v"
  private def marker: String = s"$catDir/current"
  private def intentPath(id: String): String = s"$catDir/intents/$id.json"

  /** Test-only crash injection: naming a failpoint makes tx() die there
    * with a SimulatedCrash (no cleanup runs — exactly a process kill), so
    * the recovery tests exercise the REAL protocol states instead of
    * fabricated files. Production value: "". */
  private[graft] var failpoint: String = ""
  private def crash(p: String): Unit =
    if (failpoint == p) throw new Catalog.SimulatedCrash(p)

  /** Same claim+roll-forward discipline as TableOps.currentVersion. */
  def currentCatalogVersion: Long = {
    var v =
      if (io.exists(marker))
        new String(io.readBytes(marker), "UTF-8").trim.toLong
      else -1L
    while (io.exists(claimPath(v + 1)) && io.exists(catPath(v + 1))) v += 1
    v
  }

  private def readCat(v: Long): ListMap[String, Long] = {
    val p = catPath(v)
    require(io.exists(p), s"no catalog version $v under $root")
    val n = mapper.readTree(io.readBytes(p))
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
    if (!io.createExclusive(claimPath(v), Array.emptyByteArray))
      throw new TableOps.ConcurrentCommitException(
        s"catalog version $v was claimed by another writer — " +
          "reread the catalog and retry the transaction")
    io.atomicWrite(catPath(v), serializeCat(v, m))
    io.atomicWrite(marker, v.toString.getBytes("UTF-8"))
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

    /** Tables with staged work, in first-touch order. */
    def stagedTables: Seq[String] = txs.keys.toSeq
  }

  /** Run `body` as ONE atomic multi-table transaction; returns the new
    * catalog version. Any exception out of the body aborts: nothing is
    * committed anywhere and staged files are vacuumable orphans. A claim
    * conflict (another writer committed one of the target table versions
    * first) also aborts cleanly — own claims released, intent deleted —
    * and throws ConcurrentCommitException: rerun the whole transaction
    * against the new state. Once every claim is held the transaction can
    * no longer fail short of a crash, and a crash from there is rolled
    * FORWARD by recover() from the intent's redo content. */
  def tx(body: MultiTx => Unit): Long = {
    val t = beginMulti()
    body(t)
    commitMulti(t)
  }

  /** Session-style begin (the SQL front door's `BEGIN CATALOG`): stage
    * per-table work on the returned handle, then [[commitMulti]] — the
    * exact commit path [[tx]] uses. An abandoned handle commits nothing
    * (staged files are vacuumable orphans). */
  def beginMulti(): MultiTx = {
    require(currentCatalogVersion >= 0,
      s"catalog is empty under $root — register tables first")
    new MultiTx()
  }

  /** Commit a [[beginMulti]] handle: intent → claims → publishes → one
    * catalog flip (the [[tx]] protocol, steps 1-5). */
  def commitMulti(t: MultiTx): Long = {
    val cv0 = currentCatalogVersion
    require(t.txs.nonEmpty, "transaction touched no tables")
    val txnId = java.util.UUID.randomUUID.toString
    // stamp the txn identity into every staged manifest BEFORE serializing:
    // recovery verifies it to tell our durable commit at version v apart
    // from a foreign writer's commit at the same version number
    t.txs.foreach { case (_, tr) => tr.setProp("txn.id", txnId) }
    val entries: Seq[(String, (Long, Array[Byte]))] = t.txs.toSeq.map {
      case (name, tr) => name -> (tr.stagedVersion, tables.stagedManifestBytes(tr))
    }
    // 1. durable intent = the redo record (id + per-table manifest content)
    val node = mapper.createObjectNode()
    node.put("txnId", txnId)
    node.put("catalogBase", cv0)
    val tn = node.putObject("tables")
    entries.foreach { case (name, (v, bytes)) =>
      val e = tn.putObject(name)
      e.put("version", v)
      e.set[com.fasterxml.jackson.databind.JsonNode]("manifest", mapper.readTree(bytes))
    }
    io.atomicWrite(intentPath(txnId),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    crash("intent-written")
    // 2. claim phase — all-or-nothing: conflict => clean abort
    var claimed = List.empty[(String, Long)]
    try entries.foreach { case (name, (v, _)) =>
      tables.claimVersion(name, v, txnId)
      claimed ::= (name, v)
      crash("mid-claims")
    } catch { case e: TableOps.ConcurrentCommitException =>
      claimed.foreach { case (n, v) => tables.releaseClaim(n, v, txnId) }
      io.deleteIfExists(intentPath(txnId))
      throw e
    }
    crash("claims-done")
    // 3. publish phase — conflict-free under the held claims
    entries.foreach { case (name, (v, bytes)) =>
      tables.publishManifestBytes(name, v, bytes)
      crash("mid-publish")
    }
    crash("before-flip")
    // 4. the atomic cut
    val next = flipCatalog(entries.map { case (n, (v, _)) => n -> v }.toMap)
    crash("before-intent-delete")
    // 5. done — the intent has served its purpose
    io.deleteIfExists(intentPath(txnId))
    next
  }

  /** Advance the catalog to cover `intended`, retrying past concurrent
    * register()/unregister() flips (the per-table commits already won, so
    * the flip MUST land). Per-entry max() merge: a mapping never moves
    * backward, even if a later register() published a newer version of one
    * of the tables while we were committing. */
  private def flipCatalog(intended: Map[String, Long]): Long = {
    while (true) {
      val cv = currentCatalogVersion
      val cur = readCat(cv)
      if (intended.forall { case (k, v) => cur.get(k).exists(_ >= v) })
        return cv // already covered (recovery rerun, or raced past us)
      val merged = cur ++ intended.map { case (k, v) =>
        k -> math.max(cur.getOrElse(k, -1L), v)
      }
      try { commitCat(cv + 1, merged); return cv + 1 }
      catch { case _: TableOps.ConcurrentCommitException => () /* retry */ }
    }
    -1L // unreachable
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
      if (io.deleteIfExists(catPath(v))) n += 1
      io.deleteIfExists(claimPath(v))
    }
    n
  }

  /** Resolve every surviving intent record (crash recovery; run with no
    * live writer that could own them — see the class doc):
    *
    *   - every entry is OURS and at least claimed (claim token or published
    *     manifest props carry the intent's txn id) → roll FORWARD: publish
    *     the missing manifests from the intent's redo content, flip the
    *     catalog (max-merge), drop the intent;
    *   - anything else (an entry was never claimed, or a foreign writer
    *     holds/committed it — the crash happened before the claim phase
    *     completed, so nothing of ours is durable anywhere) → roll BACK:
    *     release only claims that carry our txn id, drop the intent.
    *
    * Idempotent: a crash during recovery re-resolves to the same outcome.
    * Returns (rolledForward, rolledBack). */
  def recover(): (Int, Int) = {
    val dir = s"$catDir/intents"
    var forward = 0
    var back = 0
    io.list(dir).filter(_.endsWith(".json")).foreach { name =>
      val p = s"$dir/$name"
      val n = mapper.readTree(io.readBytes(p))
      val txnId = if (n.has("txnId")) n.get("txnId").asText() else ""
      var entries = ListMap.empty[String, (Long, Array[Byte])]
      val it = n.get("tables").fieldNames()
      while (it.hasNext) {
        val k = it.next()
        val e = n.get("tables").get(k)
        entries += k -> (e.get("version").asLong(),
          mapper.writerWithDefaultPrettyPrinter()
            .writeValueAsBytes(e.get("manifest")))
      }
      def durableOurs(table: String, v: Long): Boolean =
        tables.manifestExistsAt(table, v) &&
          tables.versionProps(table, v).get("txn.id").contains(txnId)
      def claimedOurs(table: String, v: Long): Boolean =
        !tables.manifestExistsAt(table, v) &&
          tables.claimToken(table, v).contains(txnId)
      val allOurs = txnId.nonEmpty && entries.forall { case (t, (v, _)) =>
        durableOurs(t, v) || claimedOurs(t, v)
      }
      if (allOurs) {
        entries.foreach { case (t, (v, bytes)) =>
          if (!durableOurs(t, v)) tables.publishManifestBytes(t, v, bytes)
        }
        flipCatalog(entries.map { case (t, (v, _)) => t -> v }.toMap)
        io.deleteIfExists(p)
        forward += 1
      } else {
        // releaseClaim is identity-guarded: a foreign claim or a claim with
        // a published manifest is never touched; an empty txnId releases
        // nothing (it would alias plain single-op claims' empty token)
        if (txnId.nonEmpty) entries.foreach { case (t, (v, _)) =>
          tables.releaseClaim(t, v, txnId)
        }
        io.deleteIfExists(p)
        back += 1
      }
    }
    (forward, back)
  }
}

object Catalog {
  /** Thrown only by the test failpoints — simulates a process kill at an
    * exact protocol step (no cleanup runs, like a real crash). */
  final class SimulatedCrash(point: String)
    extends RuntimeException(s"simulated crash at $point")
}

package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Catalyst [[FileIndex]] over ONE schema group of a managed table — the
  * piece that makes manifest stats and parquet blooms work for EVERY read
  * path, not just the explicit `scanWhere` API: Spark's scan planning
  * calls `listFiles(partitionFilters, dataFilters)` with the filters it
  * pushed down, and this index answers with only the files whose
  * manifest-carried min/max ([[StatsPruner]]) and, for `bloom.cols`,
  * per-file parquet bloom filters ([[BloomPruner]]) cannot rule out. A
  * front-door SELECT, a view, a join input — anything that plans a filter
  * over the table — prunes files at PLANNING time from metadata, the role
  * Iceberg's manifest-driven scan planning plays (and the reference's
  * IndexScan choice in the optimizer, rule.h:31).
  *
  * Driver-side cost model: min/max pruning is pure in-memory metadata
  * (the manifest is already loaded); bloom probes open candidate footers
  * CONCURRENTLY on the shared pool and only for files the stats kept.
  * File sizes come from one `listStatus` per data subdirectory (not one
  * RPC per file), taken lazily at first plan.
  */
final class GraftFileIndex(
    spark: SparkSession,
    tableRoot: String,
    paths: Seq[String],
    stats: Map[String, FileStats],
    dataSchema: StructType,
    bloomCols: Seq[String],
    statusCache: java.util.concurrent.ConcurrentHashMap[String, FileStatus] =
      new java.util.concurrent.ConcurrentHashMap()) extends FileIndex {

  /** Observability for specs: files listed by the last listFiles call. */
  @volatile var lastListed: Int = -1
  @volatile var lastPruned: Int = -1

  /** Data files are immutable once committed, so their statuses are
    * cached across index instances (the caller passes the table-store's
    * shared cache): a read-heavy small-transaction workload pays one
    * listStatus per data subdirectory EVER, not per read. */
  private lazy val statuses: Map[String, FileStatus] = {
    val missing = paths.filterNot(p => statusCache.containsKey(s"$tableRoot/$p"))
    if (missing.nonEmpty) {
      val conf = spark.sessionState.newHadoopConf()
      missing.groupBy(p => p.substring(0, p.lastIndexOf('/'))).foreach {
        case (dir, _) =>
          val d = new Path(s"$tableRoot/$dir")
          val fs = d.getFileSystem(conf)
          fs.listStatus(d).foreach(st =>
            statusCache.put(s"$tableRoot/$dir/${st.getPath.getName}", st))
      }
    }
    paths.map { p =>
      val st = statusCache.get(s"$tableRoot/$p")
      require(st != null, s"data file $tableRoot/$p is missing on storage")
      p -> st
    }.toMap
  }

  override def rootPaths: Seq[Path] = Seq(new Path(tableRoot))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val byStats = paths.filter(p => stats.get(p) match {
      case Some(fs) => dataFilters.forall(e => StatsPruner.mayMatch(e, fs))
      case None => true // no stats recorded — cannot rule the file out
    })
    val cnf = dataFilters.flatMap(BloomPruner.cnfProbes)
      .filter(cl => cl.nonEmpty && cl.forall(p => bloomCols.contains(p.col)))
    val kept =
      if (cnf.isEmpty || byStats.isEmpty) byStats
      else {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: scala.concurrent.ExecutionContext =
          TableOps.groupScanPool
        val conf = spark.sessionState.newHadoopConf()
        val fs = byStats.map(p => Future(
          (p, BloomPruner.mayContain(s"$tableRoot/$p", cnf, conf))))
        Await.result(Future.sequence(fs), Duration.Inf)
          .collect { case (p, true) => p }
      }
    lastListed = kept.size
    lastPruned = paths.size - kept.size
    Seq(PartitionDirectory(InternalRow.empty,
      kept.map(statuses(_)).toArray))
  }

  override def inputFiles: Array[String] =
    paths.map(p => s"$tableRoot/$p").toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = statuses.valuesIterator.map(_.getLen).sum

  override def partitionSchema: StructType = new StructType()
}

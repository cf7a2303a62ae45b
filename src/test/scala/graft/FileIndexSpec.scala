package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.{GraftSql, TableOps}

/** Planning-time file pruning on EVERY read path: managed tables are read
  * through a custom Catalyst FileIndex, so filters Catalyst pushes into
  * the scan prune files from manifest stats (+ blooms for `bloom.cols`)
  * during planning — plain read().filter, SQL over a temp view, the
  * front door — not just the explicit scanWhere API. */
class FileIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Files actually selected by the scan, from the executed plan's scan
    * metrics (AQE-safe: taken after the action ran). */
  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectWithSubqueries {
      case s: FileSourceScanExec => s.metrics("numFiles").value
    }.sum
  }

  /** Table clustered by key ranges: file i holds keys [100i, 100i+99],
    * so min/max stats separate the files perfectly. */
  private def rangedTable(tag: String): TableOps = {
    val ops = new TableOps(spark, TestSpark.tmpDir(s"graft-fidx-$tag"))
    ops.create("t",
      (0 until 100).map(i => (i.toLong, s"r$i")).toDF("k", "v").coalesce(1))
    (1 until 6).foreach { b =>
      ops.insert("t",
        (0 until 100).map(i => ((b * 100 + i).toLong, s"r${b * 100 + i}"))
          .toDF("k", "v").coalesce(1))
    }
    ops
  }

  test("plain read().filter prunes files at planning time via manifest stats") {
    val ops = rangedTable("stats")
    val df = ops.read("t").filter(col("k") === 333L)
    assert(df.select("v").as[String].collect().toSeq == Seq("r333"))
    assert(scannedFiles(df) == 1, "stats should prune to exactly 1 file")
    // an unfiltered read still sees everything
    assert(ops.read("t").count() == 600)
  }

  test("SQL over the table prunes the same way (front door and temp view)") {
    val ops = rangedTable("sql")
    val door = new GraftSql(spark, ops)
    val viaDoor = door.exec("SELECT v FROM t WHERE k = 42")
    assert(viaDoor.as[String].collect().toSeq == Seq("r42"))
    assert(scannedFiles(viaDoor) == 1, "front-door SELECT should plan-prune")
    ops.read("t").createOrReplaceTempView("t_fidx")
    val viaSql = spark.sql("SELECT v FROM t_fidx WHERE k BETWEEN 205 AND 208")
    assert(viaSql.as[String].collect().sorted.length == 4)
    assert(scannedFiles(viaSql) == 1, "range predicate should plan-prune")
  }

  test("bloom columns prune interleaved keys on the plain read path too") {
    val ops = new TableOps(spark, TestSpark.tmpDir("graft-fidx-bloom"))
    ops.create("t", Seq.empty[(Long, String)].toDF("k", "v").coalesce(1),
      Map("bloom.cols" -> "k"))
    (0 until 6).foreach { b =>
      ops.insert("t",
        (0 until 40).map(i => ((i * 6 + b).toLong, s"row-${i * 6 + b}"))
          .toDF("k", "v").coalesce(1))
    }
    // interleaved layout: stats keep all files, only blooms separate
    val df = ops.read("t").filter(col("k") === 77L)
    assert(df.select("v").as[String].collect().toSeq == Seq("row-77"))
    assert(scannedFiles(df) <= 2,
      s"bloom should prune the plain read to <=2 files, got ${scannedFiles(df)}")
  }

  test("schema evolution still resolves across groups through the index path") {
    val ops = rangedTable("evo")
    ops.addColumn("t", "score", "k * 2")
    ops.insert("t", Seq((900L, "r900", 123L)).toDF("k", "v", "score"))
    val df = ops.read("t").filter(col("k").isin(333L, 900L)).orderBy("k")
    assert(df.as[(Long, String, Long)].collect().toSeq ==
      Seq((333L, "r333", 666L), (900L, "r900", 123L)))
    // read-plan caching: same version returns the same plan object
    val a = ops.read("t"); val b = ops.read("t")
    assert(a eq b, "same-version reads should reuse the cached plan")
    ops.insert("t", Seq((901L, "r901", 1L)).toDF("k", "v", "score"))
    assert(ops.read("t").count() == 602, "new version must refresh the plan")
  }
}

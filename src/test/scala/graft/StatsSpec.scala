package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.TableOps

/** ANALYZE / table statistics (reference stats_calculator.cpp feeds per-
  * column ndv/min-max/null-fraction into its cost model): graft's own
  * one-pass analyze(), plus the Spark-native twin — ANALYZE TABLE + CBO —
  * which is the platform layer the reference's Cascades cost model maps
  * onto here. */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("TableOps.analyze computes exact per-column stats and persists them") {
    val root = TestSpark.tmpDir("graft-stats")
    val ops = new TableOps(spark, root)
    ops.create("t", Seq(
      (1L, Some("a"), 1.5), (2L, Some("b"), 2.5),
      (3L, None, 2.5), (4L, Some("a"), -1.0)
    ).toDF("id", "name", "score"))
    val stats = ops.analyze("t")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(stats("id") == (("id", 0L, 4L, Some(1.0), Some(4.0))))
    assert(stats("name") == (("name", 1L, 2L, None, None)))
    assert(stats("score") == (("score", 0L, 3L, Some(-1.0), Some(2.5))))
    // persisted beside the manifest for the optimizer to read without rescan
    val f = new java.io.File(s"$root/t/stats-v0.json")
    assert(f.exists())
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    assert(txt.contains("\"ndv\" : 4") && txt.contains("\"name\""))
  }

  test("Spark ANALYZE TABLE feeds CBO: column stats recorded, row counts in the plan") {
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_stats_t")
      (1L to 500L).map(i => (i, s"n$i", i * 1.5)).toDF("id", "name", "score")
        .write.mode("overwrite").saveAsTable("graft_stats_t")
      spark.sql("ANALYZE TABLE graft_stats_t COMPUTE STATISTICS FOR ALL COLUMNS")
      // catalog carries the per-column stats
      val desc = spark.sql("DESCRIBE EXTENDED graft_stats_t id")
        .as[(String, String)].collect().toMap
      // the catalog ndv is HLL-estimated (the same sketch family the
      // reference's stats keep) — assert it within 10% of exact
      val ndv = desc.get("distinct_count").map(_.trim.toLong)
        .getOrElse(fail(s"ndv not recorded: $desc"))
      assert(math.abs(ndv - 500L) <= 50L, s"ndv estimate off: $ndv")
      assert(desc.get("max").map(_.trim).contains("500"))
      // and the optimizer sees an exact row count for costing
      val st = spark.table("graft_stats_t").queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(500)), s"CBO rowCount missing: $st")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prev)
      spark.sql("DROP TABLE IF EXISTS graft_stats_t")
    }
  }
}

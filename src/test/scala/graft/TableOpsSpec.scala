package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.TableOps

/** DML parity surface (reference Insert/Update/Delete, SURVEY.md §2.1) via
  * snapshot copy-on-write tables. */
class TableOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("create / insert / delete / update with snapshot isolation") {
    val ops = new TableOps(spark, TestSpark.tmpDir("graft-tables"))
    val v0 = ops.create("t", Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("id", "name", "score"))
    assert(v0 == 0 && ops.read("t").count() == 2)

    val v1 = ops.insert("t", Seq((3L, "c", 30.0)).toDF("id", "name", "score"))
    assert(ops.read("t").count() == 3)

    val v2 = ops.delete("t", col("id") === 2L)
    assert(ops.read("t").select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))

    val v3 = ops.update("t", col("id") === 3L, "score", lit(99.0))
    val scores = ops.read("t").select("id", "score").as[(Long, Double)]
      .collect().toMap
    assert(scores == Map(1L -> 10.0, 3L -> 99.0))

    // time travel: every old snapshot still readable and intact
    assert(ops.readVersion("t", v0).count() == 2)
    assert(ops.readVersion("t", v1).count() == 3)
    assert(ops.readVersion("t", v2).count() == 2)
    assert(v3 == 3 && ops.currentVersion("t") == 3)
  }

  test("ALTER ADD COLUMN is lazy: no data rewrite, default filled on read, migrated on write") {
    val root = TestSpark.tmpDir("graft-tables-evolve")
    val ops = new TableOps(spark, root)
    ops.create("t", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))

    val vAlter = ops.addColumn("t", "tag", "'none'")
    // LAZY: the alter version dir contains only the schema delta — the
    // base version's parquet files were NOT rewritten (DESIGN.md:21-76)
    val alterDir = new java.io.File(s"$root/t/v$vAlter")
    assert(alterDir.listFiles().map(_.getName).toSet == Set("schema_delta.json"),
      "ALTER rewrote data")
    // default filled on read
    val afterAlter = ops.read("t").select("id", "tag").as[(Long, String)]
      .collect().toMap
    assert(afterAlter == Map(1L -> "none", 2L -> "none"))
    // old snapshot keeps the old schema
    assert(!ops.readVersion("t", 0).columns.contains("tag"))

    // next write materializes the evolved layout (migration-on-write)
    val vIns = ops.insert("t", Seq((3L, "c", "fresh")).toDF("id", "name", "tag"))
    val after = ops.read("t").select("id", "tag").as[(Long, String)]
      .collect().toMap
    assert(after == Map(1L -> "none", 2L -> "none", 3L -> "fresh"))
    val insDir = new java.io.File(s"$root/t/v$vIns")
    assert(insDir.listFiles().exists(_.getName.endsWith(".parquet")),
      "insert after alter should materialize the evolved layout")
  }
}

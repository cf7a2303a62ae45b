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
}

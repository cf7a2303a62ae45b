package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{Catalog, TableOps}

/** Multi-table atomic transactions through the catalog-level snapshot
  * (Iceberg/Nessie multi-table-commit model; reference
  * transaction_manager.h — one txn spanning every table it touches). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): Catalog =
    new Catalog(spark, TestSpark.tmpDir(s"graft-catalog-$tag"))

  test("multi-table tx: both tables advance under ONE catalog flip; abort touches nothing") {
    val cat = fresh("basic")
    cat.tables.create("acct", Seq((1L, 100.0), (2L, 50.0)).toDF("id", "bal"))
    cat.tables.create("log", Seq((0L, "init")).toDF("seq", "what"))
    cat.register("acct"); cat.register("log")
    val cv0 = cat.currentCatalogVersion

    // the classic cannot-be-torn shape: debit one table, append to another
    val cv1 = cat.tx { t =>
      t.on("acct").update($"id" === 1L, "bal", lit(75.0))
      t.on("log").insert(Seq((1L, "debit 25")).toDF("seq", "what"))
    }
    assert(cv1 == cv0 + 1)
    assert(cat.read("acct").filter($"id" === 1L).select("bal")
      .as[Double].head() == 75.0)
    assert(cat.read("log").count() == 2)
    // catalog time travel: the PAIR of tables as one consistent snapshot
    assert(cat.readAt(cv0, "acct").filter($"id" === 1L).select("bal")
      .as[Double].head() == 100.0)
    assert(cat.readAt(cv0, "log").count() == 1)

    // abort: neither table nor the catalog moves
    intercept[TableOps.TransactionAborted] {
      cat.tx { t =>
        t.on("acct").update($"id" === 2L, "bal", lit(0.0))
        t.on("log").insert(Seq((2L, "never")).toDF("seq", "what"))
        t.rollback()
      }
    }
    assert(cat.currentCatalogVersion == cv1)
    assert(cat.tables.currentVersion("acct") == 1) // create(v0) + tx(v1) only
    assert(cat.tables.currentVersion("log") == 1)
    assert(cat.read("acct").filter($"id" === 2L).select("bal")
      .as[Double].head() == 50.0)
    assert(cat.read("log").count() == 2)
    // staged orphans from the abort are vacuumable
    assert(cat.tables.vacuum("acct", 0L) + cat.tables.vacuum("log", 0L) >= 1)

    // catalog-history expiration: old snapshots become unreadable, the
    // current one (and the tables) are untouched
    assert(cat.expireCatalog(1) == cv1.toInt)
    intercept[IllegalArgumentException] { cat.readAt(cv0, "acct") }
    assert(cat.read("acct").count() == 2 && cat.read("log").count() == 2)
    assert(cat.expireCatalog(1) == 0) // idempotent

    // unregister removes the NAME, not the table; the pre-unregister
    // snapshot still maps it (catalog time travel)
    assert(cat.listTables().keySet == Set("acct", "log"))
    val cvU = cat.unregister("log")
    assert(cat.listTables().keySet == Set("acct"))
    intercept[IllegalArgumentException] { cat.read("log") }
    assert(cat.readAt(cvU - 1, "log").count() == 2)
    assert(cat.tables.read("log").count() == 2, "unregister touched the table")
    intercept[IllegalArgumentException] { cat.unregister("log") }
  }

  test("crash between table commits and the flip: catalog stays consistent, recover() completes") {
    val root = TestSpark.tmpDir("graft-catalog-recover")
    val cat = new Catalog(spark, root)
    cat.tables.create("a", Seq((1L, 1.0)).toDF("id", "v"))
    cat.tables.create("b", Seq((1L, 1.0)).toDF("id", "v"))
    cat.register("a"); cat.register("b")
    val cv = cat.currentCatalogVersion

    // fabricate the exact crash state: per-table commits durable, intent on
    // disk, catalog pointer NOT flipped — by running a real tx and then
    // rewinding the catalog while restoring the intent record
    val cvAfter = cat.tx { t =>
      t.on("a").update($"id" === 1L, "v", lit(2.0))
      t.on("b").update($"id" === 1L, "v", lit(2.0))
    }
    val catDir = java.nio.file.Paths.get(root, "_catalog")
    java.nio.file.Files.delete(catDir.resolve(s"cat-v$cvAfter.json"))
    java.nio.file.Files.delete(catDir.resolve("commits").resolve(s"v$cvAfter"))
    java.nio.file.Files.write(catDir.resolve("current"),
      cv.toString.getBytes("UTF-8"))
    val intents = catDir.resolve("intents")
    java.nio.file.Files.createDirectories(intents)
    val node = s"""{"catalogBase": $cv, "tables": {"a": 1, "b": 1}}"""
    java.nio.file.Files.write(intents.resolve("deadbeef.json"),
      node.getBytes("UTF-8"))

    // the catalog is CONSISTENT at the old snapshot (both tables old)
    assert(cat.currentCatalogVersion == cv)
    assert(cat.read("a").select("v").as[Double].head() == 1.0)
    assert(cat.read("b").select("v").as[Double].head() == 1.0)

    // recovery completes the flip (both intended versions are durable)
    val (applied, left) = cat.recover()
    assert(applied == 1 && left == 0)
    assert(cat.read("a").select("v").as[Double].head() == 2.0)
    assert(cat.read("b").select("v").as[Double].head() == 2.0)
    // idempotent
    assert(cat.recover() == ((0, 0)))
  }

  test("recover() leaves a half-committed intent for the operator") {
    val root = TestSpark.tmpDir("graft-catalog-partial")
    val cat = new Catalog(spark, root)
    cat.tables.create("a", Seq((1L, 1.0)).toDF("id", "v"))
    cat.register("a")
    val intents = java.nio.file.Paths.get(root, "_catalog", "intents")
    java.nio.file.Files.createDirectories(intents)
    // intent names a version "a" never reached: writer died before commit
    java.nio.file.Files.write(intents.resolve("dead0001.json"),
      s"""{"catalogBase": 0, "tables": {"a": 7}}""".getBytes("UTF-8"))
    val (applied, left) = cat.recover()
    assert(applied == 0 && left == 1)
    assert(cat.read("a").count() == 1) // untouched
  }

  test("per-table OCC conflict aborts the whole multi-table tx; catalog never tears") {
    val cat = fresh("occ")
    cat.tables.create("a", Seq((1L, 1.0)).toDF("id", "v"))
    cat.tables.create("b", Seq((1L, 1.0)).toDF("id", "v"))
    cat.register("a"); cat.register("b")
    val cv = cat.currentCatalogVersion
    intercept[TableOps.ConcurrentCommitException] {
      cat.tx { t =>
        t.on("a").insert(Seq((2L, 2.0)).toDF("id", "v"))
        t.on("b").insert(Seq((2L, 2.0)).toDF("id", "v"))
        // a direct writer races ahead on b: the tx's staged b-version loses
        cat.tables.insert("b", Seq((9L, 9.0)).toDF("id", "v"))
      }
    }
    // catalog still maps the pre-tx snapshot for BOTH tables
    assert(cat.currentCatalogVersion == cv)
    assert(cat.read("a").count() == 1)
    assert(cat.read("b").count() == 1)
    // the racing writer's commit is per-table durable (direct read), the
    // catalog simply has not adopted it — re-register publishes it
    assert(cat.tables.read("b").count() == 2)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.{GraftSql, TableOps}

/** The SQL front door (entry-point-A parity, reference
  * traffic_cop.cpp:248-258): every statement class of the snapshot-table
  * surface driven purely by SQL strings. */
class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String): GraftSql =
    new GraftSql(spark, new TableOps(spark, TestSpark.tmpDir(s"graft-sql-$tag")))

  test("CREATE TABLE AS / INSERT VALUES / INSERT SELECT / UPDATE / DELETE / SELECT") {
    val sql = fresh("dml")
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "x")
      .createOrReplaceTempView("seed_sql1")
    sql.exec("CREATE TABLE t AS SELECT * FROM seed_sql1")
    assert(sql.exec("SELECT count(*) AS n FROM t").as[Long].head() == 2)
    sql.exec("INSERT INTO t VALUES (3, 'c', 30.0), (4, 'd', 40.0)")
    sql.exec("INSERT INTO t SELECT id + 10, name, x FROM seed_sql1")
    assert(sql.exec("SELECT count(*) AS n FROM t").as[Long].head() == 6)
    // multi-assignment UPDATE publishes as ONE version
    val v0 = sql.ops.currentVersion("t")
    sql.exec("UPDATE t SET name = upper(name), x = x * 2 WHERE id <= 2")
    assert(sql.ops.currentVersion("t") == v0 + 1)
    assert(sql.exec("SELECT name FROM t WHERE id = 1").as[String].head() == "A")
    assert(sql.exec("SELECT x FROM t WHERE id = 2").as[Double].head() == 40.0)
    sql.exec("DELETE FROM t WHERE id > 10")
    assert(sql.exec("SELECT count(*) AS n FROM t").as[Long].head() == 4)
  }

  test("UPDATE splits SET/WHERE quote-aware: literals with WHERE and ''") {
    val sql = fresh("qsplit")
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .createOrReplaceTempView("seed_qsplit")
    sql.exec("CREATE TABLE t AS SELECT * FROM seed_qsplit")
    // a SET value whose STRING LITERAL contains the word WHERE (plus a
    // comma): the statement must split at the real top-level WHERE
    sql.exec("UPDATE t SET name = 'x WHERE y, z' WHERE id = 1")
    assert(sql.exec("SELECT name FROM t WHERE id = 1")
      .as[String].head() == "x WHERE y, z")
    // a doubled-quote escape inside a SET value
    sql.exec("UPDATE t SET name = 'don''t, stop' WHERE id = 2")
    assert(sql.exec("SELECT name FROM t WHERE id = 2")
      .as[String].head() == "don't, stop")
    // no top-level WHERE is still a loud error
    val e = intercept[IllegalArgumentException] {
      sql.exec("UPDATE t SET name = 'a WHERE b'")
    }
    assert(e.getMessage.contains("WHERE"))
  }

  test("MERGE INTO: matched update + unmatched insert; insert-only variant") {
    val sql = fresh("merge")
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v").createOrReplaceTempView("seed_sql2")
    sql.exec("CREATE TABLE t AS SELECT * FROM seed_sql2")
    sql.exec("""MERGE INTO t USING (SELECT id + 1 AS id, v * 10 AS v
      FROM seed_sql2) ON id
      WHEN MATCHED THEN UPDATE SET v
      WHEN NOT MATCHED THEN INSERT ALL""")
    val m = sql.exec("SELECT id, v FROM t ORDER BY id").as[(Long, Double)]
      .collect().toSeq
    assert(m == Seq((1L, 1.0), (2L, 10.0), (3L, 20.0)))
    // insert-only merge: matched rows untouched, no file rewritten
    sql.exec("""MERGE INTO t USING (SELECT id, v FROM t UNION ALL
      SELECT 9 AS id, 9.0 AS v) ON id
      WHEN NOT MATCHED THEN INSERT ALL""")
    assert(sql.exec("SELECT count(*) AS n FROM t").as[Long].head() == 4)
    assert(sql.exec("SELECT v FROM t WHERE id = 2").as[Double].head() == 10.0)
  }

  test("ALTER ADD/DROP COLUMN, TRUNCATE, views, DROP TABLE") {
    val sql = fresh("ddl")
    Seq((1L, 5.0)).toDF("id", "v").createOrReplaceTempView("seed_sql3")
    sql.exec("CREATE TABLE t AS SELECT * FROM seed_sql3")
    sql.exec("ALTER TABLE t ADD COLUMN flag DEFAULT cast(1 as int)")
    assert(sql.exec("SELECT flag FROM t").as[Int].head() == 1)
    sql.exec("ALTER TABLE t DROP COLUMN flag")
    assert(!sql.exec("SELECT * FROM t").columns.contains("flag"))
    sql.exec("CREATE VIEW big AS SELECT id FROM t WHERE v > 1.0")
    assert(sql.ops.readView("big").count() == 1)
    sql.exec("CREATE OR REPLACE VIEW big AS SELECT id FROM t WHERE v > 9.0")
    assert(sql.ops.readView("big").count() == 0)
    sql.exec("DROP VIEW big")
    assert(!sql.ops.viewExists("big"))
    sql.exec("TRUNCATE TABLE t")
    assert(sql.exec("SELECT count(*) AS n FROM t").as[Long].head() == 0)
    sql.exec("DROP TABLE t")
    assert(sql.ops.listTables().isEmpty)
  }

  test("BEGIN/COMMIT: one atomic version, read-your-writes; ROLLBACK leaves no trace") {
    val sql = fresh("tx")
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v").createOrReplaceTempView("seed_sql4")
    sql.exec("CREATE TABLE t AS SELECT * FROM seed_sql4")
    val v0 = sql.ops.currentVersion("t")
    sql.exec("BEGIN")
    sql.exec("INSERT INTO t VALUES (3, 3.0)")
    // read-your-writes inside the transaction…
    assert(sql.exec("SELECT count(*) AS n FROM t").as[Long].head() == 3)
    sql.exec("UPDATE t SET v = v * 10 WHERE id = 3")
    // …but other readers see nothing until COMMIT
    assert(sql.ops.read("t").count() == 2)
    assert(sql.ops.currentVersion("t") == v0)
    sql.exec("COMMIT")
    assert(sql.ops.currentVersion("t") == v0 + 1)
    assert(sql.exec("SELECT v FROM t WHERE id = 3").as[Double].head() == 30.0)
    // rollback
    sql.exec("BEGIN")
    sql.exec("DELETE FROM t WHERE id = 1")
    sql.exec("ROLLBACK")
    assert(sql.ops.read("t").count() == 3)
    // a transaction binds to ONE table (cross-table atomicity = Catalog.tx)
    Seq((1L, 1.0)).toDF("id", "v").createOrReplaceTempView("seed_sql4b")
    sql.exec("CREATE TABLE u AS SELECT * FROM seed_sql4b")
    sql.exec("BEGIN")
    sql.exec("INSERT INTO t VALUES (4, 4.0)")
    val e = intercept[IllegalArgumentException] {
      sql.exec("INSERT INTO u VALUES (9, 9.0)")
    }
    assert(e.getMessage.contains("bound to table"))
    sql.exec("ROLLBACK")
    // statement errors outside any tx don't corrupt the session
    intercept[IllegalStateException] { sql.exec("COMMIT") }
  }

  test("CREATE FUNCTION persists; a fresh front door re-registers from disk") {
    val sql = fresh("fn")
    Seq((1L, 100.0), (2L, 250.0)).toDF("id", "p").createOrReplaceTempView("seed_fn")
    sql.exec("CREATE TABLE t AS SELECT * FROM seed_fn")
    sql.exec("CREATE FUNCTION taxed(x DOUBLE) RETURNS DOUBLE RETURN x * 1.1")
    assert(sql.exec("SELECT taxed(p) AS tp FROM t WHERE id = 1")
      .as[Double].head() == 100.0 * 1.1)
    // kill the session registration; a NEW door must restore it from disk
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS taxed")
    val door2 = new GraftSql(spark, sql.ops)
    assert(door2.exec("SELECT taxed(p) AS tp FROM t WHERE id = 2")
      .as[Double].head() == 250.0 * 1.1)
    // replace changes behavior; plain create on an existing name fails
    intercept[IllegalArgumentException] {
      sql.exec("CREATE FUNCTION taxed(x DOUBLE) RETURNS DOUBLE RETURN x")
    }
    sql.exec("CREATE OR REPLACE FUNCTION taxed(x DOUBLE) RETURNS DOUBLE RETURN x * 2.0")
    assert(sql.exec("SELECT taxed(p) AS tp FROM t WHERE id = 1")
      .as[Double].head() == 200.0)
    sql.exec("DROP FUNCTION taxed")
    assert(!sql.ops.functionExists("taxed"))
  }

  test("AFTER triggers fire on standalone DML; INSERT sees the inserted view") {
    val sql = fresh("trg")
    Seq((1L, 10.0)).toDF("id", "v").createOrReplaceTempView("seed_trg")
    sql.exec("CREATE TABLE t AS SELECT * FROM seed_trg WHERE 1 = 0")
    sql.exec("CREATE TABLE log AS SELECT CAST(0 AS BIGINT) AS n, " +
      "CAST(0.0 AS DOUBLE) AS s FROM seed_trg LIMIT 0")
    sql.exec("CREATE TRIGGER t_ins AFTER INSERT ON t EXECUTE " +
      "INSERT INTO log SELECT CAST(count(*) AS BIGINT), sum(v) FROM inserted")
    sql.exec("CREATE TRIGGER t_del AFTER DELETE ON t EXECUTE " +
      "INSERT INTO log SELECT CAST(-1 AS BIGINT), sum(v) FROM t")
    sql.exec("INSERT INTO t VALUES (1, 10.0), (2, 20.0)")
    sql.exec("INSERT INTO t VALUES (3, 30.0)")
    sql.exec("DELETE FROM t WHERE id = 2")
    val log = sql.exec("SELECT n, s FROM log ORDER BY n, s")
      .as[(Long, Double)].collect().toSeq
    assert(log == Seq((-1L, 40.0), (1L, 30.0), (2L, 30.0)))
    // triggers do NOT fire for DML staged inside BEGIN…COMMIT (boundary)
    sql.exec("BEGIN")
    sql.exec("INSERT INTO t VALUES (9, 90.0)")
    sql.exec("COMMIT")
    assert(sql.exec("SELECT count(*) AS n FROM log").as[Long].head() == 3)
    // transition view does not leak past the firing
    assert(!spark.catalog.tableExists("inserted"))
    sql.exec("DROP TRIGGER t_ins")
    sql.exec("INSERT INTO t VALUES (4, 40.0)")
    assert(sql.exec("SELECT count(*) AS n FROM log").as[Long].head() == 3)
  }

  test("a trigger cascade that cycles fails instead of looping") {
    val sql = fresh("trgcycle")
    Seq((1L, 1.0)).toDF("id", "v").createOrReplaceTempView("seed_cycle")
    sql.exec("CREATE TABLE a AS SELECT * FROM seed_cycle WHERE 1 = 0")
    sql.exec("CREATE TABLE b AS SELECT * FROM seed_cycle WHERE 1 = 0")
    sql.exec("CREATE TRIGGER ab AFTER INSERT ON a EXECUTE " +
      "INSERT INTO b SELECT * FROM inserted")
    sql.exec("CREATE TRIGGER ba AFTER INSERT ON b EXECUTE " +
      "INSERT INTO a SELECT * FROM inserted")
    val e = intercept[IllegalArgumentException] {
      sql.exec("INSERT INTO a VALUES (1, 1.0)")
    }
    assert(e.getMessage.contains("depth"))
  }

  test("CREATE SEARCH INDEX: DML auto-refreshes the index before SEARCH") {
    val sql = fresh("sidx")
    val docs = (0 until 120).map(i => graft.corpus.CorpusGen.genFile(i.toLong, 9L))
    docs.toDF().createOrReplaceTempView("seed_sidx")
    sql.exec("CREATE TABLE docs AS SELECT * FROM seed_sidx")
    sql.exec("CREATE SEARCH INDEX dix ON docs")
    val before = sql.exec("SEARCH dix 'hash join' TOP 5").collect()
    assert(before.nonEmpty)

    // INSERT of a uniquely-marked doc is findable immediately (synchronous
    // maintenance, the reference's in-DML IndexInsert)
    sql.exec("INSERT INTO docs VALUES ('zz/r', 'p1', 'c1', 'scala', " +
      "'qqq_unique_marker qqq_unique_marker hash join')")
    val hit = sql.exec("SEARCH dix 'qqq_unique_marker' TOP 5")
    assert(hit.select("path").as[String].collect().toSeq == Seq("p1"))

    // UPDATE moves the marker to another doc: old occurrence dead, new live
    sql.exec("UPDATE docs SET content = 'rrr_moved_marker' WHERE path = 'p1'")
    assert(sql.exec("SEARCH dix 'qqq_unique_marker' TOP 5").collect().isEmpty)
    assert(sql.exec("SEARCH dix 'rrr_moved_marker' TOP 5")
      .select("path").as[String].collect().toSeq == Seq("p1"))

    // DELETE kills it
    sql.exec("DELETE FROM docs WHERE path = 'p1'")
    assert(sql.exec("SEARCH dix 'rrr_moved_marker' TOP 5").collect().isEmpty)

    // DML inside a transaction refreshes at COMMIT, not before
    sql.exec("BEGIN")
    sql.exec("INSERT INTO docs VALUES ('zz/r', 'p2', 'c2', 'scala', " +
      "'sss_tx_marker body text')")
    sql.exec("COMMIT")
    assert(sql.exec("SEARCH dix 'sss_tx_marker' TOP 5")
      .select("path").as[String].collect().toSeq == Seq("p2"))

    // a second front door on the same store finds the persisted index
    val sql2 = new GraftSql(spark, sql.ops)
    assert(sql2.exec("SEARCH dix 'sss_tx_marker' TOP 5").collect().length == 1)

    // DROP TABLE cascades the index registration
    sql.exec("DROP SEARCH INDEX dix")
    intercept[IllegalArgumentException](sql.exec("SEARCH dix 'x' TOP 5"))
  }

  test("BEGIN CATALOG: multi-table SQL transaction under one catalog flip") {
    import graft.sources.{Catalog, GraftSql}
    val root = TestSpark.tmpDir("graft-sqlcat")
    val cat = new Catalog(spark, root)
    cat.tables.create("a", Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal"))
    cat.tables.create("b", Seq((0L, "seed")).toDF("id", "note"))
    cat.register("a"); cat.register("b")
    val sql = new GraftSql(spark, cat)

    // plain BEGIN still binds to ONE table and says so
    sql.exec("BEGIN")
    sql.exec("UPDATE a SET bal = 11.0 WHERE id = 1")
    intercept[IllegalArgumentException](
      sql.exec("INSERT INTO b VALUES (9, 'x')"))
    sql.exec("ROLLBACK")

    // catalog tx: stage DML on BOTH tables, read-your-writes pre-commit
    val cv0 = cat.currentCatalogVersion
    sql.exec("BEGIN CATALOG")
    sql.exec("UPDATE a SET bal = 99.0 WHERE id = 1")
    sql.exec("INSERT INTO b VALUES (1, 'bumped')")
    assert(sql.exec("SELECT bal FROM a WHERE id = 1").as[Double].head() == 99.0)
    assert(sql.exec("SELECT count(*) AS n FROM b").as[Long].head() == 2L)
    // nothing visible outside the session yet
    assert(cat.read("a").filter($"id" === 1L).select($"bal")
      .as[Double].head() == 10.0)
    sql.exec("COMMIT")
    // ONE catalog flip covers both tables; catalog-resolved reads agree
    assert(cat.currentCatalogVersion == cv0 + 1)
    assert(cat.read("a").filter($"id" === 1L).select($"bal")
      .as[Double].head() == 99.0)
    assert(cat.read("b").count() == 2L)

    // rollback leaves both tables and the catalog untouched
    sql.exec("BEGIN CATALOG")
    sql.exec("DELETE FROM a WHERE id = 2")
    sql.exec("INSERT INTO b VALUES (7, 'никогда')")
    sql.exec("ROLLBACK")
    assert(cat.currentCatalogVersion == cv0 + 1)
    assert(cat.read("a").count() == 2L && cat.read("b").count() == 2L)

    // a catalog-less session rejects BEGIN CATALOG loudly
    val plain = new GraftSql(spark, cat.tables)
    intercept[IllegalStateException](plain.exec("BEGIN CATALOG"))

    // immediate (store-level) DDL cannot silently escape a transaction
    sql.exec("BEGIN")
    intercept[IllegalArgumentException](
      sql.exec("CREATE TABLE c AS SELECT 1 AS one"))
    intercept[IllegalArgumentException](
      sql.exec("CREATE VIEW v AS SELECT * FROM a"))
    intercept[IllegalArgumentException](
      sql.exec("CREATE FUNCTION f(x INT) RETURNS INT RETURN x + 1"))
    sql.exec("ROLLBACK")
  }

  test("maintenance DDL: COMPACT / EXPIRE / VACUUM / CHANGES statements") {
    val sql = fresh("maint")
    sql.exec("CREATE TABLE t AS SELECT id, id % 7 AS k FROM range(64)")
    sql.exec("INSERT INTO t SELECT id, id % 7 AS k FROM range(64, 128)")
    val v0 = sql.ops.currentVersion("t")
    sql.exec("UPDATE t SET k = 99 WHERE id = 5")

    // CHANGES: the net snapshot diff, carried rewrite rows excluded
    val ch = sql.exec(s"CHANGES t FROM $v0 TO ${sql.ops.currentVersion("t")}")
      .as[(Long, Long, String)].collect().toSet
    assert(ch == Set((5L, 5L, "delete"), (5L, 99L, "insert")))

    // COMPACT: row set intact; SORT BY / ZORDER forms run; ZORDER alone
    // is rejected (no dims)
    val before = sql.ops.read("t").inputFiles.length
    sql.exec("COMPACT TABLE t")
    assert(sql.ops.read("t").inputFiles.length <= before)
    sql.exec("COMPACT TABLE t SORT BY id")
    sql.exec("COMPACT TABLE t SORT BY id, k ZORDER")
    assert(sql.exec("SELECT count(*) AS n FROM t").as[Long].head() == 128L)
    assert(sql.exec("SELECT k FROM t WHERE id = 5").as[Long].head() == 99L)
    intercept[IllegalArgumentException](sql.exec("COMPACT TABLE t ZORDER"))

    // EXPIRE drops pre-window snapshots; VACUUM (age 0) sweeps orphans;
    // the current state stays fully readable
    sql.exec("EXPIRE TABLE t KEEP 1")
    intercept[Exception](sql.ops.readVersion("t", v0))
    sql.exec("VACUUM TABLE t MIN AGE 0")
    assert(sql.exec("SELECT count(*) AS n FROM t").as[Long].head() == 128L)

    // maintenance is not allowed inside a transaction
    sql.exec("BEGIN")
    intercept[IllegalArgumentException](sql.exec("COMPACT TABLE t"))
    intercept[IllegalArgumentException](sql.exec("EXPIRE TABLE t KEEP 1"))
    sql.exec("ROLLBACK")

    // introspection: SHOW TABLES / DESCRIBE / SHOW HISTORY
    val tabs = sql.exec("SHOW TABLES").as[(String, Long)].collect().toMap
    assert(tabs.contains("t") && tabs("t") == sql.ops.currentVersion("t"))
    val desc = sql.exec("DESCRIBE t").as[(String, String)].collect().toSeq
    assert(desc == Seq(("id", "bigint"), ("k", "bigint")))
    val hist = sql.exec("SHOW HISTORY t").as[(Long, Long)].collect()
    // expire KEEP 1 above left exactly the current version readable
    assert(hist.map(_._1).toSeq == Seq(sql.ops.currentVersion("t")))
    assert(hist.head._2 >= 1L)
  }

  test("VERSION AS OF reads historical snapshots inside plain SELECTs") {
    val sql = fresh("asof")
    sql.exec("CREATE TABLE t AS SELECT id FROM range(5)")     // v0: 0..4
    sql.exec("INSERT INTO t SELECT id FROM range(5, 10)")     // v1: 0..9
    sql.exec("DELETE FROM t WHERE id = 0")                    // v2: 1..9
    def n(q: String): Long = sql.exec(q).as[Long].head()
    assert(n("SELECT count(*) AS n FROM t VERSION AS OF 0") == 5L)
    assert(n("SELECT count(*) AS n FROM t VERSION AS OF 1") == 10L)
    assert(n("SELECT count(*) AS n FROM t") == 9L)
    // historical and current snapshots compose in one statement (the rows
    // deleted since v1), with a table alias after the clause
    val gone = sql.exec(
      "SELECT a.id FROM t VERSION AS OF 1 a LEFT ANTI JOIN t b ON a.id = b.id")
      .as[Long].collect().toSeq
    assert(gone == Seq(0L))
    // a non-managed name is untouched (plain Spark error, not a rewrite)
    intercept[Exception](sql.exec("SELECT * FROM nosuch VERSION AS OF 0"))
  }

  test("SEARCH wildcard + FACET: prefix expansion and match-set counts") {
    val sql = fresh("wfacet")
    val docs = (0 until 100).map(i => graft.corpus.CorpusGen.genFile(i.toLong, 9L))
    docs.toDF().createOrReplaceTempView("seed_wfacet")
    sql.exec("CREATE TABLE docs AS SELECT * FROM seed_wfacet")
    sql.exec("INSERT INTO docs VALUES ('zz/r', 'pa', 'c1', 'scala', " +
      "'wld_alpha wld_alpha body'), ('zz/r', 'pb', 'c1', 'java', " +
      "'wld_beta body text')")
    sql.exec("CREATE SEARCH INDEX wix ON docs")

    // wildcard == the hand-expanded OR query, docIds AND scores
    val viaStar = sql.exec("SEARCH wix 'wld_*' TOP 5")
      .as[(String, String, String, Double)].collect().toSeq
    val viaOr = sql.exec("SEARCH wix 'wld_alpha wld_beta' TOP 5")
      .as[(String, String, String, Double)].collect().toSeq
    assert(viaStar == viaOr && viaStar.map(_._2).toSet == Set("pa", "pb"))
    // malformed wildcards are loud, not silently mis-scored
    intercept[IllegalArgumentException](sql.exec("SEARCH wix 'hash jo*' TOP 5"))
    // wildcard/boolean compose with WHERE: membership restricted by the
    // predicate, scores unchanged from the unfiltered form
    val starAll = sql.exec("SEARCH wix 'wld_*' TOP 5")
      .as[(String, String, String, Double)].collect()
      .map(r => r._2 -> r._4).toMap
    val starJava = sql.exec("SEARCH wix 'wld_*' WHERE lang = 'java' TOP 5")
      .as[(String, String, String, Double)].collect().toSeq
    assert(starJava.map(_._2) == Seq("pb") &&
      starJava.head._4 == starAll("pb"))
    assert(sql.exec("SEARCH wix '+wld_alpha' WHERE lang = 'java' TOP 5")
      .collect().isEmpty) // the must term lives only in a scala doc
    val boolScala = sql.exec(
      "SEARCH wix '+wld_alpha' WHERE lang = 'scala' TOP 5")
      .as[(String, String, String, Double)].collect().toSeq
    assert(boolScala.map(_._2) == Seq("pa"))
    // FACET stays plain-terms-only, loudly; PHRASE+WHERE is a declared
    // boundary with its own error, not a SELECT-path parse failure
    intercept[IllegalArgumentException](
      sql.exec("SEARCH wix 'wld_*' FACET lang"))
    intercept[IllegalArgumentException](
      sql.exec("SEARCH wix PHRASE 'wld_alpha body' WHERE lang = 'scala'"))
    // COMPACT SEARCH INDEX reclaims tombstones, results unchanged
    sql.exec("COMPACT SEARCH INDEX wix")
    assert(sql.exec("SEARCH wix 'wld_*' WHERE lang = 'java' TOP 5")
      .as[(String, String, String, Double)].collect().toSeq == starJava)

    // FACET: counts of the FULL match set by table attribute, twin-checked
    // against direct tokenization of the current table state
    val facets = sql.exec("SEARCH wix 'hash join' FACET lang")
      .as[(String, Long)].collect().toMap
    val expected = sql.ops.read("docs")
      .select("lang", "content").as[(String, String)].collect()
      .filter { case (_, c) =>
        val ts = graft.analysis.CodeTokenizer.tokenize(c)
        ts.contains("hash") || ts.contains("join") }
      .groupBy(_._1).map { case (l, rs) => l -> rs.length.toLong }
    assert(facets == expected && facets.values.sum > 5)

    // the facet set follows DML: deleting one language's matches drops it
    sql.exec("DELETE FROM docs WHERE lang = 'scala'")
    val after = sql.exec("SEARCH wix 'hash join' FACET lang")
      .as[(String, Long)].collect().toMap
    assert(!after.contains("scala") &&
      after == expected.filterNot(_._1 == "scala"))
  }

  test("metadata-only aggregates: stats-served plan, scan-twin values, " +
      "honest fallthrough") {
    val sql = fresh("statsagg")
    Seq((5L, Some(10L), 1.5), (2L, None, 2.5), (9L, Some(3L), 3.5))
      .toDF("id", "opt", "x").createOrReplaceTempView("seed_sagg")
    sql.exec("CREATE TABLE t AS SELECT * FROM seed_sagg")
    sql.exec("INSERT INTO t VALUES (40, NULL, 4.5), (1, 7, 5.5)")
    sql.exec("DELETE FROM t WHERE id = 9")

    // pin on the optimized LOGICAL plan (AQE wraps the physical plan in an
    // AdaptiveSparkPlanExec leaf, hiding FileSourceScanExec from collect):
    // a stats-served answer has NO file relation at all
    def hasScan(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectWithSubqueries {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
      }.nonEmpty

    val stmt = "SELECT count(*) AS n, min(id) AS mn, max(id) AS mx, " +
      "min(opt) AS mno, max(opt) AS mxo FROM t"
    val fast = sql.exec(stmt)
    assert(!hasScan(fast), "metadata aggregate still scanned files")
    // the scan twin: same statement over a subquery (declined — not a bare
    // managed-table aggregate), must produce identical values
    val slow = sql.exec(stmt.replace("FROM t", "FROM (SELECT * FROM t) z"))
    assert(hasScan(slow))
    assert(fast.collect().toSeq == slow.collect().toSeq)

    // double bounds are dropped at write time (NaN safety) — min(x) falls
    // through to a real scan and still answers
    val dbl = sql.exec("SELECT min(x) AS mnx FROM t")
    assert(hasScan(dbl))
    assert(dbl.as[Double].head() == 1.5)
    // WHERE / expressions / unknown aggregates decline too
    assert(hasScan(sql.exec("SELECT count(*) AS n FROM t WHERE id > 2")))
    assert(hasScan(sql.exec("SELECT sum(id) AS s FROM t")))

    // an all-NULL column serves NULL from stats
    sql.exec("UPDATE t SET opt = NULL WHERE id >= 0")
    val nulls = sql.exec("SELECT min(opt) AS mno, count(*) AS n FROM t")
    assert(!hasScan(nulls))
    val r = nulls.head()
    assert(r.isNullAt(0) && r.getLong(1) == 4L)

    // schema evolution: a pending fill declines min/max but count serves
    sql.exec("ALTER TABLE t ADD COLUMN extra DEFAULT cast(99 as bigint)")
    assert(hasScan(sql.exec("SELECT min(extra) AS me FROM t")))
    assert(!hasScan(sql.exec("SELECT count(*) AS n FROM t")))
    // default Spark-style names when no alias is given
    assert(sql.exec("SELECT count(*) FROM t").columns.toSeq == Seq("count(1)"))
  }

  test("SEARCH ... WHERE filters by table attributes; scores unchanged") {
    val sql = fresh("fidx")
    val docs = (0 until 60).map(i => graft.corpus.CorpusGen.genFile(i.toLong, 13L))
    docs.toDF().createOrReplaceTempView("seed_fidx")
    sql.exec("CREATE TABLE docs AS SELECT * FROM seed_fidx")
    sql.exec("CREATE SEARCH INDEX fix ON docs")
    sql.exec("INSERT INTO docs VALUES " +
      "('zz/r','fa','c1','scala','ww_term common')," +
      "('zz/r','fb','c2','java','ww_term common common')")

    val all = sql.exec("SEARCH fix 'ww_term' TOP 5")
      .select("path", "score").as[(String, Double)].collect().toMap
    assert(all.keySet == Set("fa", "fb"))
    val filt = sql.exec("SEARCH fix 'ww_term' WHERE lang = 'java' TOP 5")
      .select("path", "score").as[(String, Double)].collect()
    assert(filt.map(_._1).toSeq == Seq("fb"))
    // FilteredQuery semantics: the score equals the unfiltered search's
    assert(filt.head._2 == all("fb"))
    // predicate over any table column, matching nothing
    assert(sql.exec("SEARCH fix 'ww_term' WHERE lang = 'go' TOP 5")
      .collect().isEmpty)
    // the filter sees the CURRENT snapshot: after DML moves a doc out of
    // the slice, the filtered search follows
    sql.exec("UPDATE docs SET lang = 'scala' WHERE path = 'fb'")
    assert(sql.exec("SEARCH fix 'ww_term' WHERE lang = 'java' TOP 5")
      .collect().isEmpty)
  }

  test("WITH POSITIONS: SEARCH PHRASE is maintained through DML") {
    val sql = fresh("pidx")
    val docs = (0 until 80).map(i => graft.corpus.CorpusGen.genFile(i.toLong, 11L))
    docs.toDF().createOrReplaceTempView("seed_pidx")
    sql.exec("CREATE TABLE docs AS SELECT * FROM seed_pidx")
    sql.exec("CREATE SEARCH INDEX pix ON docs WITH POSITIONS")

    // exact adjacency, not bag-of-words: a doc holding both terms apart
    // must NOT match the phrase
    sql.exec("INSERT INTO docs VALUES " +
      "('zz/r', 'adj', 'c1', 'scala', 'qq_alpha qq_beta tail tail')," +
      "('zz/r', 'apart', 'c2', 'scala', 'qq_alpha tail tail qq_beta')")
    val hit = sql.exec("SEARCH pix PHRASE 'qq_alpha qq_beta' TOP 5")
    assert(hit.select("path").as[String].collect().toSeq == Seq("adj"))

    // UPDATE re-registers the phrase on another doc; DELETE kills it
    sql.exec("UPDATE docs SET content = 'qq_alpha qq_beta moved' " +
      "WHERE path = 'apart'")
    assert(sql.exec("SEARCH pix PHRASE 'qq_alpha qq_beta' TOP 5")
      .select("path").as[String].collect().toSet == Set("adj", "apart"))
    sql.exec("DELETE FROM docs WHERE path = 'adj'")
    assert(sql.exec("SEARCH pix PHRASE 'qq_alpha qq_beta' TOP 5")
      .select("path").as[String].collect().toSeq == Seq("apart"))

    // the bag-of-words SEARCH stays served by the same maintained index
    assert(sql.exec("SEARCH pix 'qq_alpha' TOP 5").collect().nonEmpty)
  }
}

package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational parity surface: the reference's operator inventory
  * (SURVEY.md §2 — scans, filters, projections, hash/NL joins, semi/anti
  * joins, hash & distinct aggregation, HAVING, sorts, top-k, limit/offset,
  * set ops, scalar/string/date functions, subqueries) exercised as
  * declarative Spark plans over the driver's TPC-H-ish parquet tables, each
  * with an ANSI-SQL DuckDB oracle.
  *
  * Conventions that make the driver's hash-compare deterministic:
  *   - every query has a total ORDER BY (unique key suffix);
  *   - computed integers are BIGINT on both sides (DuckDB sum(int) is
  *     HUGEINT and year()/length() are BIGINT — cast explicitly);
  *   - double aggregates are rounded (sum/avg to 2/4 decimals) since
  *     summation order differs between engines; per-row arithmetic is left
  *     exact (bit-identical in IEEE754);
  *   - ORDER BY on nullable keys says NULLS FIRST explicitly (Spark's asc
  *     default) since DuckDB defaults to NULLS LAST.
  *
  * Scale notes: filters/projections push into the parquet scan (Catalyst);
  * small dims (region/nation/supplier) broadcast; the only large shuffles
  * are the lineitem-side joins/aggregations, which shuffle on their keys as
  * they must. Verified via .explain in QueryPlanSpec.
  */
object TpchQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // --- scan → filter → hash agg → sort (TPC-H Q1 shape; reference
    //     compiler_test.cpp:3286 runs Q1 as its flagship golden test)
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // --- filter + projection with per-row arithmetic (exact, no rounding
    //     reorder risk) pushed to the scan
    "q02_filter_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_quantity") < lit(10.0))
        // per-row IEEE arithmetic is bit-identical cross-engine — no round
        // (round() itself diverges on exact .xx5 ties: Java HALF_UP on the
        // decimal string vs DuckDB rounding the binary value)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        // (l_orderkey, l_linenumber) is NOT unique in this dataset — revenue
        // completes the total order for cross-engine row-order stability
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue"))
    }),

    // --- hash join + agg (orders ⋈ customer)
    "q03_join_agg" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
    }),

    // --- multi-way join through broadcast-able dims
    "q04_multi_join" -> ((s, d) => {
      val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
      val c = t(s, d, "customer"); val n = t(s, d, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("l_extendedprice")), 2).as("volume"))
        .orderBy(col("n_name"))
    }),

    // --- small-dim star join (all broadcast)
    "q05_dim_join" -> ((s, d) => {
      val c = t(s, d, "customer"); val n = t(s, d, "nation"); val r = t(s, d, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("total_bal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // --- semi join (EXISTS; reference LogicalSemiJoin logical_operators.h:624)
    "q06_semi_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 100000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // --- anti join (NOT EXISTS); predicate chosen to be non-empty at every
    //     scale factor (every customer has SOME order in this data)
    "q07_anti_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // --- top-k: Catalyst plans TakeOrderedAndProject (terrier's fused
    //     sort+limit heap, sorter.cpp:33-98)
    "q08_topk" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // --- sort + limit + offset (limit_plan_node.h:16-65)
    "q09_limit_offset" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
        .offset(10).limit(20)
    }),

    // --- SELECT DISTINCT (rewritten to group-by in the reference,
    //     query_to_operator_transformer.cpp:105-118)
    "q10_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // --- HAVING over hash agg
    "q11_having" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .filter(col("n") >= 40)
        .orderBy(col("l_partkey"))
    }),

    // --- DISTINCT aggregates (aggregate_util.h:96,219)
    "q12_distinct_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // --- CASE / NULLIF / COALESCE (expression_defs.h:65-67)
    "q13_case_expr" -> ((s, d) => {
      t(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "F", lit("finished"))
            .when(col("o_orderstatus") === "O", lit("open"))
            .otherwise(lit("other")).as("status_word"),
          coalesce(nullif(col("o_orderstatus"), lit("P")), lit("was_p")).as("np"))
        .groupBy(col("status_word"), col("np"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("status_word"), col("np"))
    }),

    // --- scalar math functions (arithmetic_functions.h:21-236)
    "q14_scalar_math" -> ((s, d) => {
      t(s, d, "orders").filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          abs(col("o_totalprice") * lit(-1.0)).as("abs_price"),
          ceil(col("o_totalprice")).cast("long").as("ceil_price"),
          floor(col("o_totalprice")).cast("long").as("floor_price"),
          round(sqrt(col("o_totalprice")), 6).as("sqrt_price"),
          round(log(col("o_totalprice")), 6).as("ln_price"),
          // cast: DuckDB sign(DOUBLE) returns TINYINT while Spark signum
          // returns DOUBLE — both sides go through BIGINT for a stable hash
          signum(col("o_totalprice") - lit(50000.0)).cast("long").as("sign_mid"),
          (col("o_orderkey") % 7).as("mod7"))
        .orderBy(col("o_orderkey"))
    }),

    // --- string functions (string_functions.h:26-124)
    "q15_string_fns" -> ((s, d) => {
      t(s, d, "part").filter(col("p_partkey") < 100)
        .select(col("p_partkey"),
          lower(col("p_type")).as("lo"),
          upper(col("p_name")).as("up"),
          substring(col("p_name"), 1, 4).as("sub4"),
          length(col("p_name")).cast("long").as("len"),
          reverse(col("p_brand")).as("rev"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
          split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("cat"),
          trim(lit("  x  ")).as("trimmed"))
        .orderBy(col("p_partkey"))
    }),

    // --- date/time extraction (reference exposes only ExtractYear,
    //     builtins.h:26 — we cover the family)
    "q16_date_fns" -> ((s, d) => {
      t(s, d, "orders")
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .groupBy(col("yr"), col("mo"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("yr"), col("mo"))
    }),

    // --- IN (subquery) → mark join → semi join (unnesting_rules.h:18)
    "q17_in_subquery" -> ((s, d) => {
      val o = t(s, d, "orders"); val c = t(s, d, "customer")
      val rich = c.filter(col("c_acctbal") > 4500.0).select(col("c_custkey"))
      o.join(rich, o("o_custkey") === rich("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    }),

    // --- scalar subquery (LogicalSingleJoin logical_operators.h:434);
    //     max() is order-insensitive → exact cross-engine compare
    "q18_scalar_subquery" -> ((s, d) => {
      val o = t(s, d, "orders")
      val mx = o.agg(max(col("o_totalprice")).as("mx"))
      o.crossJoin(broadcast(mx))
        .filter(col("o_totalprice") > col("mx") * 0.95)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // --- set operations (reference has dead SetOp plan nodes only,
    //     set_op_plan_node.h — Spark gives the full family)
    "q19_union" -> ((s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_acctbal") < 500.0).select(col("c_custkey"))
        .union(c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey")))
        .distinct().orderBy(col("c_custkey"))
    }),
    "q20_intersect" -> ((s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_acctbal") > 1000.0).select(col("c_custkey"))
        .intersect(c.filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey")))
        .orderBy(col("c_custkey"))
    }),
    "q21_except" -> ((s, d) => {
      val c = t(s, d, "customer")
      c.select(col("c_custkey"))
        .except(c.filter(col("c_acctbal") > 1000.0).select(col("c_custkey")))
        .orderBy(col("c_custkey"))
    }),

    // --- window: rank within group (absent in the reference, §2.5 — Spark
    //     superset, used by our pipelines)
    "q22_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rk"))
    }),

    // --- window: running sum (frame order fixed ⇒ exact doubles both sides)
    "q23_window_running" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is not unique — extend the frame order
      // with quantity and price so the running sum is engine-independent
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "lineitem").filter(col("l_orderkey") < 200)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          sum(col("l_quantity")).over(w).as("running_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("running_qty"))
    }),

    // --- theta (non-equi) nested-loop join (physical_operators.h:483)
    "q24_theta_join" -> ((s, d) => {
      val n1 = t(s, d, "nation").select(col("n_name").as("a"), col("n_regionkey").as("ra"))
      val n2 = t(s, d, "nation").select(col("n_name").as("b"), col("n_regionkey").as("rb"))
      n1.join(n2, col("ra") === col("rb") && col("a") < col("b"))
        .select(col("a"), col("b"))
        .orderBy(col("a"), col("b"))
    }),

    // --- time-bucketed aggregation over the events table (batch analogue
    //     of a tumbling window)
    "q25_events_hourly" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy(col("hr"), col("event_type"))
    }),

    // --- JSON extraction from the events props column
    "q26_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") >= 50)
        .orderBy(col("event_id"))
    }),

    // --- CSV scan + external-file export (csv_scan_plan_node.h:14-69,
    //     export_external_file_plan_node.h): write to CSV, read back with an
    //     explicit schema, aggregate — the roundtrip is lossless (shortest
    //     round-trip double formatting), so the oracle is the parquet agg
    "q28_csv_roundtrip" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      // stable per-dataset path (overwritten each run — no tmp-dir litter)
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-csv-" +
        d.replaceAll("[^a-zA-Z0-9]", "_")
      o.write.mode("overwrite").option("header", "true").csv(dir)
      s.read.option("header", "true")
        .schema("o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
        .csv(dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    // --- JSON external-file roundtrip (ExternalFileGet family, a second
    //     sink/source format beside q28's CSV): export a projection as
    //     line-delimited JSON, read it back with an explicit schema,
    //     aggregate — pinning the export encodes and the reader decodes
    //     values losslessly (Double text round-trip included).
    "q84_json_roundtrip" -> ((s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_orderkey") < 300)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_returnflag"))
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft-json-" +
        d.replaceAll("[^a-zA-Z0-9]", "_")
      li.write.mode("overwrite").json(dir)
      s.read
        .schema("l_orderkey LONG, l_linenumber INT, l_quantity DOUBLE, l_returnflag STRING")
        .json(dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("l_returnflag"))
    }),

    // --- trigonometric / transcendental functions (builtins.h:146-153)
    "q29_trig" -> ((s, d) => {
      t(s, d, "orders").filter(col("o_orderkey") < 50)
        .select(col("o_orderkey"),
          round(sin(col("o_totalprice") / 100000.0), 6).as("sin_x"),
          round(cos(col("o_totalprice") / 100000.0), 6).as("cos_x"),
          round(tan(col("o_orderkey").cast("double") / 100.0), 6).as("tan_x"),
          round(atan2(col("o_totalprice"), col("o_orderkey").cast("double") + 1.0), 6).as("atan2_x"),
          round(degrees(col("o_orderkey").cast("double") / 10.0), 6).as("deg_x"),
          round(exp(col("o_orderkey").cast("double") / 1000.0), 6).as("exp_x"),
          round(pow(col("o_orderkey").cast("double"), 1.5), 6).as("pow_x"))
        .orderBy(col("o_orderkey"))
    }),

    // --- rollup (grouping sets; beyond the reference, §2.4) + NULL
    //     predicates (is_null_predicate.h, builtins.h:11-12) over the
    //     rollup's generated nulls
    "q27_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .withColumn("is_grand_total",
          col("l_returnflag").isNull && col("l_linestatus").isNull)
        .withColumn("is_subtotal",
          col("l_returnflag").isNotNull && col("l_linestatus").isNull)
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // --- correlated scalar subquery (LogicalDependentJoin
    //     logical_operators.h:358, unnesting_rules.h) through the SQL-string
    //     entry point (the reference's entry point A, traffic_cop.cpp:248):
    //     each customer's priciest order; max() is order-insensitive so the
    //     cross-engine compare is exact
    "q61_correlated_subquery" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_q61")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM orders_q61 o
          |WHERE o_totalprice = (SELECT max(o2.o_totalprice)
          |                      FROM orders_q61 o2
          |                      WHERE o2.o_custkey = o.o_custkey)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // --- DML through the snapshot table layer (reference Simple{Insert,
    //     Update,Delete}Test, test/execution/compiler_test.cpp:2319-3286):
    //     seed a managed table from orders, mutate, read the post-state
    //     back. The oracle recomputes the mutated state in pure SQL.
    "q55_insert" -> ((s, d) => {
      val ops = freshTable(s, d, "q55")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      ops.create("t", o.filter(col("o_orderkey") < 1000))
      ops.insert("t", o.filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 2000))
      ops.read("t").orderBy(col("o_orderkey"))
    }),
    "q56_update" -> ((s, d) => {
      val ops = freshTable(s, d, "q56")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      ops.create("t", o.filter(col("o_orderkey") < 1000))
      ops.update("t", col("o_totalprice") > 150000.0, "o_orderstatus", lit("X"))
      ops.read("t").orderBy(col("o_orderkey"))
    }),
    "q57_delete" -> ((s, d) => {
      val ops = freshTable(s, d, "q57")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      ops.create("t", o.filter(col("o_orderkey") < 1000))
      ops.delete("t", col("o_orderstatus") === "F")
      ops.read("t").orderBy(col("o_orderkey"))
    }),

    // --- incremental change read between snapshots (Iceberg changelog /
    //     incremental-scan role; the engine's CDC surface over the
    //     copy-on-write manifest diff). Full DML mix — delete, update,
    //     insert — then changes(v0, current) must equal the pure-SQL
    //     snapshot diff: deletes = pre EXCEPT ALL post, inserts = post
    //     EXCEPT ALL pre. Rows carried along by copy-on-write rewrites
    //     must NOT surface (the netting pin; also in TableOpsSpec).
    "q106_changes" -> ((s, d) => {
      val ops = freshTable(s, d, "q106")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      ops.create("t", o.filter(col("o_orderkey") < 1000))
      ops.delete("t", col("o_orderstatus") === "F")
      ops.update("t", col("o_totalprice") > 150000.0, "o_orderstatus", lit("X"))
      ops.insert("t", o.filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 1200))
      ops.changes("t", 0L, ops.currentVersion("t"))
        .orderBy(col("_change_type"), col("o_orderkey"))
    }),

    // --- the q106 CDC lifecycle driven purely through SQL statements,
    //     with a COMPACT TABLE dropped in the middle: compaction rewrites
    //     every file but preserves content, so CHANGES across it must
    //     still net to exactly the DML's row diff (same oracle as q106) —
    //     pinning both the SQL maintenance surface and the diff's
    //     rewrite-invariance
    "q110_sql_changes" -> ((s, d) => {
      val ops = freshTable(s, d, "q110")
      val door = new graft.sources.GraftSql(s, ops)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .createOrReplaceTempView("orders_q110")
      door.exec("CREATE TABLE t AS SELECT * FROM orders_q110 WHERE o_orderkey < 1000")
      door.exec("DELETE FROM t WHERE o_orderstatus = 'F'")
      door.exec("UPDATE t SET o_orderstatus = 'X' WHERE o_totalprice > 150000.0")
      door.exec("COMPACT TABLE t")
      door.exec("INSERT INTO t SELECT * FROM orders_q110 " +
        "WHERE o_orderkey >= 1000 AND o_orderkey < 1200")
      door.exec(s"CHANGES t FROM 0 TO ${ops.currentVersion("t")}")
        .orderBy(col("_change_type"), col("o_orderkey"))
    }),

    // --- the q90 multi-table catalog transaction driven purely via SQL:
    //     BEGIN CATALOG stages DML on two tables, an aborted attempt must
    //     leave both untouched, the committed one lands under ONE catalog
    //     flip — same oracle as q90
    "q112_sql_catalog_tx" -> ((s, d) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft-dml-" +
        d.replaceAll("[^a-zA-Z0-9]", "_") + "-q112"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val cat = new graft.sources.Catalog(s, root)
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
      o.createOrReplaceTempView("orders_q112")
      cat.tables.create("accts", o.filter(col("o_orderkey") < 500))
      cat.tables.create("audit", s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType()
          .add("o_orderkey", "long").add("note", "string")))
      cat.register("accts"); cat.register("audit")
      val door = new graft.sources.GraftSql(s, cat)
      door.exec("BEGIN CATALOG")
      door.exec("UPDATE accts SET o_totalprice = 0.0 WHERE o_orderkey < 100")
      door.exec("INSERT INTO audit SELECT o_orderkey, 'never' AS note " +
        "FROM orders_q112 WHERE o_orderkey < 100")
      door.exec("ROLLBACK")
      door.exec("BEGIN CATALOG")
      door.exec("UPDATE accts SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderkey < 100")
      door.exec("INSERT INTO audit SELECT o_orderkey, 'doubled' AS note " +
        "FROM orders_q112 WHERE o_orderkey < 100")
      door.exec("COMMIT")
      cat.read("accts").join(cat.read("audit"), Seq("o_orderkey"), "left")
        .select(col("o_orderkey"), col("o_totalprice"),
          coalesce(col("note"), lit("-")).as("note"))
        .orderBy(col("o_orderkey"))
    }),

    // --- the q67 time-travel read through the SQL session: `t VERSION AS
    //     OF 0` (Delta's syntax) must see the pre-DELETE snapshot while
    //     the bare name sees the current one, in ONE statement
    "q111_sql_time_travel" -> ((s, d) => {
      val ops = freshTable(s, d, "q111")
      val door = new graft.sources.GraftSql(s, ops)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .createOrReplaceTempView("orders_q111")
      door.exec("CREATE TABLE t AS SELECT * FROM orders_q111 WHERE o_orderkey < 500")
      door.exec("DELETE FROM t WHERE o_orderstatus = 'F'")
      door.exec(
        """SELECT o_orderkey, o_orderstatus, o_totalprice,
          |  CAST(0 AS BIGINT) AS v FROM t VERSION AS OF 0
          |UNION ALL
          |SELECT o_orderkey, o_orderstatus, o_totalprice,
          |  CAST(1 AS BIGINT) AS v FROM t
          |ORDER BY v, o_orderkey""".stripMargin)
    }),

    // --- IndexScan over a managed table (reference index_iterator.cpp /
    //     bwtree_index.h: a selective key predicate reaches only matching
    //     blocks): the table is laid out as ranged files whose per-file
    //     min/max stats live in the MANIFEST, so scanWhere plans the
    //     point+range lookup from metadata and opens only the files whose
    //     key range can match — the pruning itself is pinned in
    //     TableOpsSpec (df.inputFiles); here the RESULT is oracle-checked.
    "q91_point_lookup" -> ((s, d) => {
      val ops = freshTable(s, d, "q91")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      ops.create("t", o.filter(col("o_orderkey") < 1000).coalesce(1))
      (1 to 3).foreach { k =>
        ops.insert("t", o.filter(col("o_orderkey") >= k * 1000 &&
          col("o_orderkey") < (k + 1) * 1000).coalesce(1))
      }
      val maxKey = o.filter(col("o_orderkey") < 1000)
        .agg(max(col("o_orderkey"))).head().getLong(0)
      ops.scanWhere("t", col("o_orderkey") === maxKey ||
          (col("o_orderkey") >= 2000 && col("o_orderkey") <= 2100))
        .orderBy(col("o_orderkey"))
    }),

    // --- bloom-filter point lookup (reference bwtree_index.h / index
    //     builtins ast/builtins.h:229-231 — the secondary-index role):
    //     orders are dealt round-robin across 6 files so every file spans
    //     the whole o_orderkey range. Manifest min/max stats cannot prune
    //     that layout; the per-file parquet blooms written via the table's
    //     bloom.cols property can (pruning pinned in BloomSpec; here the
    //     RESULT is oracle-checked).
    "q94_bloom_lookup" -> ((s, d) => {
      val ops = freshTable(s, d, "q94")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .filter(col("o_orderkey") < 6000)
      ops.create("t", o.filter(col("o_orderkey") % 6 === 0).coalesce(1),
        Map("bloom.cols" -> "o_orderkey"))
      (1 to 5).foreach { b =>
        ops.insert("t", o.filter(col("o_orderkey") % 6 === b).coalesce(1))
      }
      val k = o.agg(max(col("o_orderkey"))).head().getLong(0)
      ops.scanWhere("t", col("o_orderkey") === k)
        .orderBy(col("o_orderkey"))
    }),

    // --- sketch aggregates (reference optimizer statistics sketches:
    //     hyperloglog.h:23, count_min_sketch.h:25, top_k_elements.h:31).
    //     The HLL estimate itself is engine-specific, so the pinned output
    //     is the exact count plus a boolean "estimate within 5% of exact"
    //     (rsd=0.01 ⇒ typical error ~1%, wide margin).
    "q58_sketch_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_nd"),
          approx_count_distinct(col("l_partkey"), 0.01).as("approx_nd"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("approx_med"),
          expr("percentile(l_extendedprice, 0.5)").as("exact_med"))
        .select(col("l_returnflag"), col("exact_nd"),
          (abs(col("approx_nd") - col("exact_nd")) <=
            col("exact_nd") * 0.05).as("hll_ok"),
          (abs(col("approx_med") - col("exact_med")) <=
            col("exact_med") * 0.05).as("pctl_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // --- LIKE / regexp predicates (parsed but never executed in the
    //     reference: parser/expression_defs.h:30-39, selectivity.cpp:118)
    "q59_like_regexp" -> ((s, d) => {
      t(s, d, "part").filter(col("p_partkey") < 300)
        .select(col("p_partkey"),
          col("p_name").like("%a%").as("has_a"),
          col("p_name").like("s%").as("starts_s"),
          col("p_type").rlike("^[A-Z]+ ").as("re_head"),
          regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("last_word"))
        .filter(col("has_a") || col("re_head"))
        .orderBy(col("p_partkey"))
    }),

    // --- parameterized query (reference entry point B: prepared
    //     statements, postgres_network_commands.cpp:171-433) — named
    //     parameter markers through spark.sql(sql, args)
    "q60_parameterized" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_q60")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice
          |FROM orders_q60
          |WHERE o_totalprice > :minPrice AND o_orderstatus = :status
          |ORDER BY o_orderkey""".stripMargin,
        Map("minPrice" -> 150000.0, "status" -> "O"))
    }),

    // --- faithful TPC-H Q4 shape (EXISTS-count by priority; the reference's
    //     own bench set, benchmark/runner/tpch_runner.cpp:20-29). The
    //     correlated predicate is adapted to this schema (no l_commitdate):
    //     orders in a quarter having at least one returned line.
    "q62_tpch_q4" -> ((s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val li = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // --- faithful TPC-H Q5 shape: 6-way regional volume join; dims
    //     (supplier, nation, region) broadcast, the lineitem⋈orders⋈customer
    //     spine shuffles on its keys
    "q63_tpch_q5" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      val li = t(s, d, "lineitem"); val su = t(s, d, "supplier")
      val n = t(s, d, "nation"); val r = t(s, d, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // --- faithful TPC-H Q6 shape: pure filter + ungrouped aggregate, the
    //     scan-dominated query — filters push to the parquet reader
    "q64_tpch_q6" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24.0)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // --- snapshot time travel (reference: MVCC versioned reads,
    //     data_table.h:191-207 version chains; Spark-native equivalent =
    //     immutable snapshot versions): mutate a managed table, then read
    //     BOTH the historical v0 and the current version — if time travel
    //     leaked the mutation into v0, the oracle catches it.
    "q67_time_travel" -> ((s, d) => {
      val ops = freshTable(s, d, "q67")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      ops.create("t", o.filter(col("o_orderkey") < 500))
      ops.delete("t", col("o_orderstatus") === "F")
      val v0 = ops.readVersion("t", 0).withColumn("v", lit(0L))
      val v1 = ops.read("t").withColumn("v", lit(1L))
      v0.unionByName(v1).orderBy(col("v"), col("o_orderkey"))
    }),

    // --- non-blocking schema evolution with lazy migration — the reference
    //     FORK's headline delta vs upstream terrier (DESIGN.md:21-76:
    //     multiple live layout versions, defaults filled on read, tuples
    //     migrated on their next write). ALTER ADD COLUMN writes only a
    //     schema delta (no data rewrite); the subsequent insert
    //     materializes the evolved layout; old rows carry the default, new
    //     rows their written values.
    "q69_schema_evolution" -> ((s, d) => {
      val ops = freshTable(s, d, "q69")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      ops.create("t", o.filter(col("o_orderkey") < 500))
      ops.addColumn("t", "note", "'n/a'")
      ops.insert("t", o.filter(col("o_orderkey") >= 500 && col("o_orderkey") < 700)
        .withColumn("note", lit("new")))
      ops.read("t").orderBy(col("o_orderkey"))
    }),

    // --- LEFT OUTER join with NULL-extension-sensitive aggregates
    //     (reference LogicalLeftJoin logical_operators.h:510, physical NLJ
    //     variants physical_operators.h:483-614): customers keep their row
    //     even with no qualifying order; count(o_orderkey) counts only
    //     matches (0 for the NULL-extended rows), max() is NULL there.
    "q72_left_outer" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 250000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_big"),
          round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("total_big"),
          max(col("o_orderdate")).as("last_big"))
        .orderBy(col("c_custkey"))
    }),

    // --- RIGHT OUTER join (reference logical_operators.h:548, physical
    //     RightNLJoin family physical_operators.h:519): the symmetric of
    //     q72 with the preserved side on the RIGHT — every customer keeps a
    //     row even with no qualifying urgent order; count(o_orderkey)
    //     counts matches only, count(*) counts the NULL-extended row too
    //     (the distinction only an outer join exposes).
    "q74_right_outer" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 150000.0)
      val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "right_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_urgent"),
          count(lit(1)).as("n_rows"),
          round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("total_urgent"))
        .orderBy(col("c_custkey"))
    }),

    // --- FULL OUTER join of two filtered projections (reference
    //     LogicalOuterJoin logical_operators.h:586): each side contributes
    //     rows the other lacks; the NULL pattern (only_a/only_b) is part of
    //     the pinned output.
    "q73_full_outer" -> ((s, d) => {
      val c = t(s, d, "customer")
      val a = c.filter(col("c_acctbal") > 3000.0)
        .select(col("c_custkey").as("ka"), col("c_acctbal"))
      val b = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("kb"), col("c_name"))
      a.join(b, col("ka") === col("kb"), "full_outer")
        .select(coalesce(col("ka"), col("kb")).as("custkey"),
          col("c_acctbal"), col("c_name"),
          col("ka").isNull.as("only_b"), col("kb").isNull.as("only_a"))
        .orderBy(col("custkey"))
    }),

    // --- faithful TPC-H Q7 shape (two-party volume shipping; the
    //     reference's bench set, tpch_runner.cpp:25): disjunctive
    //     nation-pair predicate, shipment-year split, volume sum. Adapted
    //     to this data's fan-out by pairing REGIONS 0↔1 (single nations
    //     yield no rows at sf0.001) — the plan shape (two aliased nation
    //     dims both broadcast, OR-of-conjunctions filter, year extraction)
    //     is Q7's.
    "q75_tpch_q7" -> ((s, d) => {
      val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
      val c = t(s, d, "customer"); val su = t(s, d, "supplier")
      val n1 = t(s, d, "nation")
        .select(col("n_nationkey").as("nk1"), col("n_name").as("supp_nation"),
          col("n_regionkey").as("supp_region"))
      val n2 = t(s, d, "nation")
        .select(col("n_nationkey").as("nk2"), col("n_name").as("cust_nation"),
          col("n_regionkey").as("cust_region"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n1), su("s_nationkey") === col("nk1"))
        .join(broadcast(n2), c("c_nationkey") === col("nk2"))
        .filter((col("supp_region") === 0 && col("cust_region") === 1) ||
          (col("supp_region") === 1 && col("cust_region") === 0))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        // round to 4, not 2: prices/discounts are 2-decimal, so group sums
        // sit on a 0.0001 grid — 2-decimal rounding lands on exact .xx5
        // ties (engines disagree), 4-decimal ties are off-grid by 0.00005
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // --- faithful TPC-H Q11 shape (group-value share with a
    //     scalar-subquery HAVING; reference bench set tpch_runner.cpp:26).
    //     This data has no partsupp, so the "important parts" variant is
    //     per-part lineitem value vs 1.2× the mean part value — the plan
    //     shape (grouped sum HAVING > scalar subquery over the same fact
    //     table, computed once and broadcast) is Q11's.
    "q76_tpch_q11" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val per = li.groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice")).as("value"))
      val cut = li.agg(
        (sum(col("l_extendedprice")) * 1.2 /
          countDistinct(col("l_partkey"))).as("cutoff"))
      per.crossJoin(broadcast(cut))
        // compare on the rounded grid (both engines): the raw sums differ
        // by summation-order ulps across engines, so a part whose value
        // lands within ulps of the cutoff could flip membership — rounding
        // both sides to 4 decimals puts the comparison on a grid where tie
        // spacing dwarfs the ulp noise (ADVICE r3)
        .filter(round(col("value"), 4) > round(col("cutoff"), 4))
        .select(col("l_partkey"), round(col("value"), 2).as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    // --- lazy ALTER DROP COLUMN (the fork's symmetric schema delta,
    //     alter_plan_node.h:165 DropColumnCmd; DESIGN.md:9-11 names add AND
    //     drop): the drop writes only a manifest — the column vanishes from
    //     reads while old snapshots keep it (pinned in TableOpsSpec); the
    //     subsequent insert writes the narrowed layout.
    "q77_drop_column" -> ((s, d) => {
      val ops = freshTable(s, d, "q77")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      ops.create("t", o.filter(col("o_orderkey") < 500))
      ops.dropColumn("t", "o_orderstatus")
      ops.insert("t", o.filter(col("o_orderkey") >= 500 && col("o_orderkey") < 700)
        .select(col("o_orderkey"), col("o_totalprice")))
      ops.read("t").orderBy(col("o_orderkey"))
    }),

    // --- ANALYZE TABLE / per-column statistics (reference
    //     stats_calculator.cpp: ndv/min/max/null-fraction per column feed
    //     the optimizer's cost model; the Spark-CBO twin is pinned in
    //     StatsSpec): one aggregation pass, persisted beside the manifest.
    "q78_analyze_stats" -> ((s, d) => {
      val ops = freshTable(s, d, "q78")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      ops.create("t", o)
      ops.analyze("t")
    }),

    // --- CREATE/DROP VIEW over a managed table (reference
    //     create_view_plan_node.h / drop_view_plan_node.h; SURVEY.md
    //     §2.11): a named stored-SQL view resolved against the table's
    //     CURRENT version at read time — the insert AFTER the create is
    //     visible through the view (late binding); a second view is
    //     created and dropped to exercise the drop path (absence asserted
    //     in TableOpsSpec along with snapshot non-interference).
    "q80_view" -> ((s, d) => {
      val ops = freshTable(s, d, "q80")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      ops.create("t", o.filter(col("o_orderkey") < 500))
      ops.createView("big_urgent", "t",
        "SELECT o_orderkey, round(o_totalprice, 2) AS price FROM t " +
          "WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 100000.0")
      ops.insert("t", o.filter(col("o_orderkey") >= 500 && col("o_orderkey") < 900))
      ops.createView("tmp", "t", "SELECT count(*) AS n FROM t")
      ops.dropView("tmp")
      ops.readView("big_urgent").orderBy(col("o_orderkey"))
    }),

    // --- snapshot expiration + orphan vacuum (reference
    //     garbage_collector.cpp GCs version chains; Iceberg
    //     expire_snapshots / remove_orphan_files): after create → insert →
    //     update, expire(keep 2) drops the v0/v1 manifests and the data
    //     files only they referenced, vacuum sweeps orphaned writer dirs —
    //     and the CURRENT state is byte-for-byte unaffected, which is
    //     exactly what the oracle checks (file-level deletion details are
    //     pinned in TableOpsSpec).
    "q83_expire" -> ((s, d) => {
      val ops = freshTable(s, d, "q83")
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
      ops.create("t", o.filter(col("o_orderkey") < 400))
      ops.insert("t", o.filter(col("o_orderkey") >= 400 && col("o_orderkey") < 800))
      // *2 is exact in IEEE754, so raw doubles stay bit-identical cross-engine
      ops.update("t", col("o_orderkey") < 100, "o_totalprice",
        col("o_totalprice") * 2)
      ops.expire("t", 2)
      ops.vacuum("t", 0L) // single-writer maintenance window: no age guard
      ops.read("t").orderBy(col("o_orderkey"))
    }),

    // --- multi-operation atomic transaction (reference Begin/Commit/Abort,
    //     transaction_manager.h:50-92 — the TPC-C NewOrder shape: several
    //     DML statements visible all-or-nothing): insert, then update, then
    //     delete inside ONE tx = ONE committed version; the update sees the
    //     inserted rows (read-your-writes) and the oracle replays the same
    //     sequence in SQL. An aborted probe tx beforehand (rollback after
    //     staging an insert) must leave no trace. *2 is IEEE-exact.
    "q85_transaction" -> ((s, d) => {
      val ops = freshTable(s, d, "q85")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      ops.create("t", o.filter(col("o_orderkey") < 1000))
      // aborted transaction: staged files must never become visible
      try ops.tx("t") { tx =>
        tx.insert(o.filter(col("o_orderkey") >= 5000 && col("o_orderkey") < 5200))
        tx.rollback()
      } catch { case _: graft.sources.TableOps.TransactionAborted => () }
      ops.tx("t") { tx =>
        tx.insert(o.filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 1500))
        tx.update(col("o_orderstatus") === "F", "o_totalprice",
          col("o_totalprice") * 2)
        tx.delete(col("o_totalprice") > 300000.0)
      }
      ops.read("t").orderBy(col("o_orderkey"))
    }),

    // --- the SQL front door (entry point A, reference
    //     traffic_cop.cpp:248-258: statements arrive as SQL strings and
    //     are dispatched to the engine): the EXACT q85 transaction
    //     sequence — aborted probe tx, then insert+update+delete as one
    //     atomic commit — driven purely through SQL statement strings
    //     against the snapshot-table layer, checked by the same oracle.
    "q92_sql_session" -> ((s, d) => {
      val ops = freshTable(s, d, "q92")
      val sqlDoor = new graft.sources.GraftSql(s, ops)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .createOrReplaceTempView("orders_q92")
      sqlDoor.exec("CREATE TABLE t AS SELECT * FROM orders_q92 WHERE o_orderkey < 1000")
      // aborted transaction: staged rows must never become visible
      sqlDoor.exec("BEGIN")
      sqlDoor.exec("INSERT INTO t SELECT * FROM orders_q92 " +
        "WHERE o_orderkey >= 5000 AND o_orderkey < 5200")
      sqlDoor.exec("ROLLBACK")
      sqlDoor.exec("BEGIN")
      sqlDoor.exec("INSERT INTO t SELECT * FROM orders_q92 " +
        "WHERE o_orderkey >= 1000 AND o_orderkey < 1500")
      sqlDoor.exec("UPDATE t SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_orderstatus = 'F'")
      sqlDoor.exec("DELETE FROM t WHERE o_totalprice > 300000.0")
      sqlDoor.exec("COMMIT")
      sqlDoor.exec("SELECT * FROM t ORDER BY o_orderkey")
    }),

    // --- metadata-only aggregates (Iceberg's metadata scan; the stats
    //     role of the reference's table-level block metadata): after DML
    //     reshapes the table, COUNT/MIN/MAX over exact-typed columns are
    //     served from MANIFEST file stats — zero data-file opens, zero
    //     Spark scan (plan pinned in GraftSqlSpec). At 100 TB this is the
    //     difference between a free answer and a full-table scan.
    "q103_stats_agg" -> ((s, d) => {
      val ops = freshTable(s, d, "q103")
      val sqlDoor = new graft.sources.GraftSql(s, ops)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .createOrReplaceTempView("orders_q103")
      sqlDoor.exec("CREATE TABLE t AS SELECT * FROM orders_q103")
      sqlDoor.exec("DELETE FROM t WHERE o_orderkey % 7 = 0")
      sqlDoor.exec("INSERT INTO t SELECT o_orderkey + 10000000, " +
        "o_custkey, o_totalprice FROM orders_q103 WHERE o_orderkey % 11 = 0")
      sqlDoor.exec("SELECT count(*) AS n, min(o_orderkey) AS min_key, " +
        "max(o_orderkey) AS max_key, min(o_custkey) AS min_cust, " +
        "max(o_custkey) AS max_cust FROM t")
    }),

    // --- stored SQL function (reference PL/pgSQL CREATE FUNCTION —
    //     embryonic there, README.md:29 / udf_test.cpp; here: Spark's
    //     native SQL-UDF form persisted in the table store). The session
    //     registration is dropped before the final SELECT, so the query
    //     proves a FRESH front door re-registers the function from disk —
    //     the catalog-persistence role. Per-row arithmetic ships raw
    //     doubles (IEEE ops are bit-identical cross-engine).
    "q95_create_function" -> ((s, d) => {
      val ops = freshTable(s, d, "q95")
      val door = new graft.sources.GraftSql(s, ops)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .createOrReplaceTempView("orders_q95")
      door.exec("CREATE TABLE t AS SELECT * FROM orders_q95 WHERE o_orderkey < 4000")
      door.exec("CREATE FUNCTION priced(p DOUBLE, prio STRING) RETURNS DOUBLE " +
        "RETURN CASE WHEN prio LIKE '1-%' THEN p * 0.9 " +
        "WHEN prio LIKE '2-%' THEN p * 0.95 ELSE p END")
      s.sql("DROP TEMPORARY FUNCTION IF EXISTS priced")
      val door2 = new graft.sources.GraftSql(s, ops)
      door2.exec("SELECT o_orderkey, priced(o_totalprice, o_orderpriority) " +
        "AS effective FROM t ORDER BY o_orderkey")
    }),

    // --- executing AFTER triggers (reference CREATE TRIGGER is PARSE-ONLY
    //     — postgresparser.cpp:1236-1298; this is a strict superset: the
    //     stored trigger statements actually RUN). An INSERT trigger
    //     appends per-batch aggregates of the `inserted` transition view
    //     to an audit table; an UPDATE trigger snapshots the post-state.
    //     The audit table IS the result, so the oracle replays the whole
    //     firing history.
    "q96_trigger" -> ((s, d) => {
      val ops = freshTable(s, d, "q96")
      val door = new graft.sources.GraftSql(s, ops)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .createOrReplaceTempView("orders_q96")
      door.exec("CREATE TABLE t AS SELECT * FROM orders_q96 WHERE 1 = 0")
      door.exec("CREATE TABLE audit AS SELECT CAST(0 AS BIGINT) " +
        "AS batch_rows, CAST(0.0 AS DOUBLE) AS batch_total " +
        "FROM orders_q96 LIMIT 0")
      door.exec("CREATE TRIGGER audit_ins AFTER INSERT ON t EXECUTE " +
        "INSERT INTO audit SELECT CAST(count(*) AS BIGINT), " +
        "round(sum(o_totalprice), 2) FROM inserted")
      door.exec("CREATE TRIGGER audit_upd AFTER UPDATE ON t EXECUTE " +
        "INSERT INTO audit SELECT CAST(count(*) AS BIGINT), " +
        "round(sum(o_totalprice), 2) FROM t")
      (0 until 3).foreach { b =>
        door.exec("INSERT INTO t SELECT * FROM orders_q96 " +
          s"WHERE o_orderkey % 3 = $b AND o_orderkey < 3000")
      }
      door.exec("UPDATE t SET o_totalprice = o_totalprice + 1.0 " +
        "WHERE o_orderkey % 3 = 0 AND o_orderkey < 300")
      door.exec("SELECT batch_rows, batch_total FROM audit " +
        "ORDER BY batch_rows, batch_total")
    }),

    // --- TPC-C-shaped multi-table OLTP over Catalog.tx (reference
    //     integration anchor: tpcc_test.cpp / tpcc_benchmark.cpp:58 —
    //     NewOrder + Payment over warehouse/district/customer/orders as
    //     atomic multi-table transactions). Parameters derive
    //     deterministically from the TPC-H orders table, so the oracle
    //     replays the net effect in SQL: per-district order counts,
    //     ROW_NUMBER order-id checksums, and ytd/balance sums.
    "q93_tpcc" -> ((s, d) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft-dml-" +
        d.replaceAll("[^a-zA-Z0-9]", "_") + "-q93"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val tpcc = new graft.workload.Tpcc(s, new graft.sources.Catalog(s, root))
      tpcc.setup()
      tpcc.runFromOrders(t(s, d, "orders"), 16)
      tpcc.finalStateByDistrict()
    }),

    // --- MERGE INTO / upsert-by-key (reference Insert/InsertSelect +
    //     Update, logical_operators.h:718,801,995; the incremental-ingest
    //     shape): matched keys take the source's o_totalprice (file-pruned
    //     copy-on-write), unmatched source rows are inserted — one atomic
    //     commit. Source = keys 500..1499 with *2 price (IEEE-exact), so
    //     keys 500..999 update in place and 1000..1499 append.
    "q86_merge_upsert" -> ((s, d) => {
      val ops = freshTable(s, d, "q86")
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      ops.create("t", o.filter(col("o_orderkey") < 1000))
      val source = o.filter(col("o_orderkey") >= 500 && col("o_orderkey") < 1500)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      ops.merge("t", source, "o_orderkey", Seq("o_totalprice"))
      ops.read("t").orderBy(col("o_orderkey"))
    }),

    // --- MULTI-TABLE atomic transaction through the catalog snapshot
    //     (reference transaction_manager.h: one txn spans every table it
    //     touches — the TPC-C NewOrder shape; Spark-native = the
    //     Iceberg/Nessie multi-table-commit: per-table staging, ONE catalog
    //     flip as the atomic cut). An aborted cross-table tx first (must
    //     leave both tables and the catalog untouched), then the real one:
    //     update table A + append the audit rows to table B, visible
    //     together-or-not-at-all to catalog readers. The output joins the
    //     pair, so the oracle checks BOTH tables' post-state at once.
    //     *2 is IEEE-exact.
    "q90_catalog_tx" -> ((s, d) => {
      val root = s"${System.getProperty("java.io.tmpdir")}/graft-dml-" +
        d.replaceAll("[^a-zA-Z0-9]", "_") + "-q90"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val cat = new graft.sources.Catalog(s, root)
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
      cat.tables.create("accts", o.filter(col("o_orderkey") < 500))
      cat.tables.create("audit", s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType()
          .add("o_orderkey", "long").add("note", "string")))
      cat.register("accts"); cat.register("audit")
      try cat.tx { tx =>
        tx.on("accts").update(col("o_orderkey") < 100, "o_totalprice", lit(0.0))
        tx.on("audit").insert(o.filter(col("o_orderkey") < 100)
          .select(col("o_orderkey"), lit("never").as("note")))
        tx.rollback()
      } catch { case _: graft.sources.TableOps.TransactionAborted => () }
      cat.tx { tx =>
        tx.on("accts").update(col("o_orderkey") < 100, "o_totalprice",
          col("o_totalprice") * 2)
        tx.on("audit").insert(o.filter(col("o_orderkey") < 100)
          .select(col("o_orderkey"), lit("doubled").as("note")))
      }
      cat.read("accts").join(cat.read("audit"), Seq("o_orderkey"), "left")
        .select(col("o_orderkey"), col("o_totalprice"),
          coalesce(col("note"), lit("-")).as("note"))
        .orderBy(col("o_orderkey"))
    }),

    // --- table-file compaction (reference block_compactor.cpp folds hot
    //     blocks into cold contiguous blocks; Iceberg rewrite_data_files):
    //     four O(new rows) inserts accumulate small file-groups; compact
    //     bin-packs them into consolidated files as one new version, and
    //     the data is byte-identical — which is exactly what the oracle
    //     checks (file counts, time travel and expire() interplay are
    //     pinned in TableOpsSpec).
    "q88_compact" -> ((s, d) => {
      val ops = freshTable(s, d, "q88")
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
      ops.create("t", o.filter(col("o_orderkey") < 250))
      ops.insert("t", o.filter(col("o_orderkey") >= 250 && col("o_orderkey") < 500))
      ops.insert("t", o.filter(col("o_orderkey") >= 500 && col("o_orderkey") < 750))
      ops.insert("t", o.filter(col("o_orderkey") >= 750 && col("o_orderkey") < 1000))
      ops.compactTable("t")
      ops.read("t").orderBy(col("o_orderkey"))
    }),

    // --- runtime Bloom-filter join (reference pushes a bloom filter from
    //     the hash-join build side, execution/sql/join_hash_table.h /
    //     bloom_filter.cpp): Spark's runtime bloom filter injects a
    //     might_contain() pre-filter on the probe side before the shuffle.
    //     Thresholds lowered so injection fires at test scale; semantics
    //     are unchanged (the filter is conservative), so the oracle is the
    //     plain join. Plan asserted in QueryPlanSpec.
    "q65_bloom_join" -> ((s, d) => {
      // The injection thresholds are SCOPED to this query: set, force the
      // logical optimization (queryExecution.optimizedPlan is a lazy val,
      // so the injected filter is pinned into the plan), then restore the
      // session confs — later queries in the same session run with the
      // defaults, no hidden cross-query optimizer state. The merge hint
      // forces a shuffle join so injection applies even at test scale,
      // without touching the session broadcast threshold.
      val keys = Seq(
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      val saved = keys.map(k => k -> s.conf.getOption(k))
      s.conf.set(keys(0), "true")
      s.conf.set(keys(1), "100MB")
      s.conf.set(keys(2), "0")
      try {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 200000.0)
        val q = li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_extendedprice")), 2).as("volume"))
          .orderBy(col("l_returnflag"))
        q.queryExecution.optimizedPlan // optimize under the scoped confs
        q
      } finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    })
  )

  /** A fresh managed-table root for the DML entries: wiped per run so the
    * mutation sequence is deterministic and re-runnable. */
  private def freshTable(s: SparkSession, d: String,
      tag: String): graft.sources.TableOps = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-dml-" +
      d.replaceAll("[^a-zA-Z0-9]", "_") + s"-$tag"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    new graft.sources.TableOps(s, root)
  }

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice*(1.0-l_discount) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity < 10.0
        |ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice),2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q04_multi_join" ->
      """SELECT n_name, count(*) AS n_lines,
        |  round(sum(l_extendedprice),2) AS volume
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q05_dim_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  round(sum(c_acctbal),2) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,
    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q08_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q09_limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |ORDER BY o_orderkey LIMIT 20 OFFSET 10""".stripMargin,
    "q10_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY 1,2""".stripMargin,
    "q11_having" ->
      """SELECT l_partkey, count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY 1 HAVING count(*) >= 40
        |ORDER BY l_partkey""".stripMargin,
    "q12_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_case_expr" ->
      """SELECT CASE WHEN o_orderstatus='F' THEN 'finished'
        |  WHEN o_orderstatus='O' THEN 'open' ELSE 'other' END AS status_word,
        |  coalesce(nullif(o_orderstatus,'P'),'was_p') AS np, count(*) AS n
        |FROM orders GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q14_scalar_math" ->
      """SELECT o_orderkey, abs(o_totalprice*-1.0) AS abs_price,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,
        |  CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
        |  round(sqrt(o_totalprice),6) AS sqrt_price,
        |  round(ln(o_totalprice),6) AS ln_price,
        |  CAST(sign(o_totalprice - 50000.0) AS BIGINT) AS sign_mid,
        |  o_orderkey % 7 AS mod7
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin,
    "q15_string_fns" ->
      """SELECT p_partkey, lower(p_type) AS lo, upper(p_name) AS up,
        |  substring(p_name,1,4) AS sub4, CAST(length(p_name) AS BIGINT) AS len,
        |  reverse(p_brand) AS rev, lpad(CAST(p_partkey AS VARCHAR),8,'0') AS padded,
        |  split_part(p_name,' ',1) AS first_word,
        |  p_brand || ':' || p_type AS cat, trim('  x  ') AS trimmed
        |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin,
    "q16_date_fns" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo, count(*) AS n
        |FROM orders GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q17_in_subquery" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 4500.0)
        |ORDER BY o_orderkey""".stripMargin,
    "q18_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.95
        |ORDER BY o_orderkey""".stripMargin,
    "q19_union" ->
      """SELECT DISTINCT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_acctbal < 500.0
        |  UNION ALL
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') u
        |ORDER BY c_custkey""".stripMargin,
    "q20_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_acctbal > 1000.0
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        |ORDER BY c_custkey""".stripMargin,
    "q21_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 1000.0
        |ORDER BY c_custkey""".stripMargin,
    "q22_window_rank" ->
      """SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS rk
        |  FROM customer) x
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,
    "q23_window_running" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  sum(l_quantity) OVER (PARTITION BY l_orderkey
        |    ORDER BY l_linenumber, l_quantity, l_extendedprice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |FROM lineitem WHERE l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber, l_quantity, running_qty""".stripMargin,
    "q24_theta_join" ->
      """SELECT n1.n_name AS a, n2.n_name AS b
        |FROM nation n1 JOIN nation n2
        |  ON n1.n_regionkey = n2.n_regionkey AND n1.n_name < n2.n_name
        |ORDER BY a, b""".stripMargin,
    "q25_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n,
        |  round(sum(value),2) AS total
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q26_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |FROM events WHERE CAST(json_extract_string(props,'$.k') AS BIGINT) >= 50
        |ORDER BY event_id""".stripMargin,
    "q27_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  l_returnflag IS NULL AND l_linestatus IS NULL AS is_grand_total,
        |  l_returnflag IS NOT NULL AND l_linestatus IS NULL AS is_subtotal
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q61_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice = (SELECT max(o2.o_totalprice)
        |                      FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q28_csv_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  round(sum(o_totalprice),2) AS total
        |FROM orders WHERE o_orderkey < 500
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q84_json_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_quantity),2) AS qty
        |FROM lineitem WHERE l_orderkey < 300
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q55_insert" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,
    "q56_update" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 150000.0 THEN 'X' ELSE o_orderstatus END
        |    AS o_orderstatus,
        |  o_totalprice
        |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin,
    "q57_delete" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey < 1000 AND o_orderstatus <> 'F'
        |ORDER BY o_orderkey""".stripMargin,
    "q106_changes" ->
      """WITH pre AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey < 1000),
        |post AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_totalprice > 150000.0 THEN 'X' ELSE o_orderstatus END
        |      AS o_orderstatus,
        |    o_totalprice
        |  FROM orders WHERE o_orderkey < 1000 AND o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey >= 1000 AND o_orderkey < 1200)
        |SELECT * FROM (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    'insert' AS _change_type
        |  FROM (SELECT * FROM post EXCEPT ALL SELECT * FROM pre)
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    'delete' AS _change_type
        |  FROM (SELECT * FROM pre EXCEPT ALL SELECT * FROM post))
        |ORDER BY _change_type, o_orderkey""".stripMargin,
    // identical to q106: compaction must be invisible to the net diff
    "q110_sql_changes" ->
      """WITH pre AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey < 1000),
        |post AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_totalprice > 150000.0 THEN 'X' ELSE o_orderstatus END
        |      AS o_orderstatus,
        |    o_totalprice
        |  FROM orders WHERE o_orderkey < 1000 AND o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey >= 1000 AND o_orderkey < 1200)
        |SELECT * FROM (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    'insert' AS _change_type
        |  FROM (SELECT * FROM post EXCEPT ALL SELECT * FROM pre)
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice,
        |    'delete' AS _change_type
        |  FROM (SELECT * FROM pre EXCEPT ALL SELECT * FROM post))
        |ORDER BY _change_type, o_orderkey""".stripMargin,
    "q58_sketch_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_nd,
        |  TRUE AS hll_ok, TRUE AS pctl_ok
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q59_like_regexp" ->
      """SELECT p_partkey, p_name LIKE '%a%' AS has_a,
        |  p_name LIKE 's%' AS starts_s,
        |  regexp_matches(p_type, '^[A-Z]+ ') AS re_head,
        |  coalesce(regexp_extract(p_type, '([A-Z]+)$', 1), '') AS last_word
        |FROM part WHERE p_partkey < 300
        |  AND (p_name LIKE '%a%' OR regexp_matches(p_type, '^[A-Z]+ '))
        |ORDER BY p_partkey""".stripMargin,
    "q60_parameterized" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,
    "q62_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q63_tpch_q5" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q64_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24.0""".stripMargin,
    "q67_time_travel" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CAST(0 AS BIGINT) AS v FROM orders
        |WHERE o_orderkey < 500
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CAST(1 AS BIGINT) AS v FROM orders
        |WHERE o_orderkey < 500 AND o_orderstatus <> 'F'
        |ORDER BY v, o_orderkey""".stripMargin,
    "q111_sql_time_travel" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CAST(0 AS BIGINT) AS v FROM orders
        |WHERE o_orderkey < 500
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CAST(1 AS BIGINT) AS v FROM orders
        |WHERE o_orderkey < 500 AND o_orderstatus <> 'F'
        |ORDER BY v, o_orderkey""".stripMargin,
    "q69_schema_evolution" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CASE WHEN o_orderkey < 500 THEN 'n/a' ELSE 'new' END AS note
        |FROM orders WHERE o_orderkey < 700
        |ORDER BY o_orderkey""".stripMargin,
    "q65_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS volume
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000.0
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q77_drop_column" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey < 700 ORDER BY o_orderkey""".stripMargin,
    "q78_analyze_stats" ->
      """SELECT col_name, n_nulls, ndv, min_num, max_num FROM (
        |  SELECT 'o_orderkey' AS col_name,
        |    sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
        |    count(DISTINCT o_orderkey)::BIGINT AS ndv,
        |    CAST(min(o_orderkey) AS DOUBLE) AS min_num,
        |    CAST(max(o_orderkey) AS DOUBLE) AS max_num
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus',
        |    sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT o_orderstatus)::BIGINT,
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice',
        |    sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |    count(DISTINCT o_totalprice)::BIGINT,
        |    CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE)
        |  FROM orders)
        |ORDER BY col_name""".stripMargin,
    "q72_left_outer" ->
      """SELECT c_custkey, c_mktsegment,
        |  count(o_orderkey) AS n_big,
        |  round(sum(coalesce(o_totalprice, 0.0)), 2) AS total_big,
        |  max(o_orderdate) AS last_big
        |FROM customer LEFT OUTER JOIN
        |  (SELECT * FROM orders WHERE o_totalprice > 250000.0) o
        |  ON c_custkey = o_custkey
        |GROUP BY 1,2 ORDER BY c_custkey""".stripMargin,
    "q73_full_outer" ->
      """SELECT coalesce(a.c_custkey, b.c_custkey) AS custkey,
        |  a.c_acctbal, b.c_name,
        |  a.c_custkey IS NULL AS only_b,
        |  b.c_custkey IS NULL AS only_a
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 3000.0) a
        |FULL OUTER JOIN
        |  (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING') b
        |  ON a.c_custkey = b.c_custkey
        |ORDER BY custkey""".stripMargin,
    "q75_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_regionkey = 0 AND n2.n_regionkey = 1)
        |   OR (n1.n_regionkey = 1 AND n2.n_regionkey = 0)
        |GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    "q76_tpch_q11" ->
      """SELECT l_partkey, round(sum(l_extendedprice), 2) AS value
        |FROM lineitem GROUP BY 1
        |HAVING round(sum(l_extendedprice), 4) >
        |  (SELECT round(1.2 * sum(l_extendedprice) / count(DISTINCT l_partkey), 4)
        |   FROM lineitem)
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q74_right_outer" ->
      """SELECT c_custkey,
        |  count(o_orderkey) AS n_urgent,
        |  count(*)::BIGINT AS n_rows,
        |  round(sum(coalesce(o_totalprice, 0.0)), 2) AS total_urgent
        |FROM (SELECT * FROM orders
        |      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0) o
        |RIGHT OUTER JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_custkey""".stripMargin,
    "q85_transaction" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey < 1500),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base)
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd
        |WHERE o_totalprice <= 300000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q86_merge_upsert" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderkey >= 500 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey < 1500
        |ORDER BY o_orderkey""".stripMargin,
    "q88_compact" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin,
    "q91_point_lookup" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey < 4000
        |  AND (o_orderkey = (SELECT max(o_orderkey) FROM orders
        |                     WHERE o_orderkey < 1000)
        |       OR o_orderkey BETWEEN 2000 AND 2100)
        |ORDER BY o_orderkey""".stripMargin,
    "q94_bloom_lookup" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey = (SELECT max(o_orderkey) FROM orders
        |                    WHERE o_orderkey < 6000)
        |ORDER BY o_orderkey""".stripMargin,
    "q95_create_function" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderpriority LIKE '1-%' THEN o_totalprice * 0.9
        |       WHEN o_orderpriority LIKE '2-%' THEN o_totalprice * 0.95
        |       ELSE o_totalprice END AS effective
        |FROM orders WHERE o_orderkey < 4000
        |ORDER BY o_orderkey""".stripMargin,
    "q96_trigger" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 3000),
        |b AS (
        |  SELECT CAST(count(*) AS BIGINT) AS batch_rows,
        |         round(sum(o_totalprice), 2) AS batch_total
        |  FROM base GROUP BY o_orderkey % 3),
        |post AS (
        |  SELECT CASE WHEN o_orderkey % 3 = 0 AND o_orderkey < 300
        |              THEN o_totalprice + 1.0 ELSE o_totalprice END AS p
        |  FROM base),
        |b3 AS (
        |  SELECT CAST(count(*) AS BIGINT) AS batch_rows,
        |         round(sum(p), 2) AS batch_total FROM post)
        |SELECT batch_rows, batch_total FROM b
        |UNION ALL SELECT batch_rows, batch_total FROM b3
        |ORDER BY batch_rows, batch_total""".stripMargin,
    "q92_sql_session" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey < 1500),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base)
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd
        |WHERE o_totalprice <= 300000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q103_stats_agg" ->
      """WITH post AS (
        |  SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 7 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey FROM orders
        |  WHERE o_orderkey % 11 = 0)
        |SELECT count(*) AS n, min(o_orderkey) AS min_key,
        |  max(o_orderkey) AS max_key, min(o_custkey) AS min_cust,
        |  max(o_custkey) AS max_cust FROM post""".stripMargin,
    "q93_tpcc" ->
      """WITH txn AS (
        |  SELECT o_orderkey,
        |    o_custkey % 2 AS w, o_custkey % 3 AS d,
        |    o_orderkey % 2 AS typ,
        |    CAST(CAST(floor(o_totalprice) AS BIGINT) % 500 + 1 AS DOUBLE) AS amt,
        |    o_orderkey % 10 + 1 AS ol_cnt
        |  FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 16)),
        |no_txn AS (
        |  SELECT w, d, count(*) AS n_orders,
        |    CAST(sum(ol_cnt) AS BIGINT) AS sum_ol_cnt,
        |    CAST(sum(oid) AS BIGINT) AS sum_o_id
        |  FROM (SELECT w, d, ol_cnt,
        |          row_number() OVER (PARTITION BY w, d ORDER BY o_orderkey) AS oid
        |        FROM txn WHERE typ = 0)
        |  GROUP BY w, d),
        |pay AS (SELECT w, d, count(*) AS n_payments, sum(amt) AS d_ytd
        |        FROM txn WHERE typ = 1 GROUP BY w, d),
        |wpay AS (SELECT w, sum(amt) AS w_ytd FROM txn WHERE typ = 1 GROUP BY w),
        |grid AS (SELECT gw.range AS w, gd.range AS d
        |         FROM range(0, 2) gw CROSS JOIN range(0, 3) gd)
        |SELECT g.w, g.d,
        |  1 + coalesce(no_txn.n_orders, 0) AS next_o_id,
        |  CAST(coalesce(pay.d_ytd, 0) AS DOUBLE) AS d_ytd,
        |  CAST(coalesce(wpay.w_ytd, 0) AS DOUBLE) AS w_ytd,
        |  coalesce(no_txn.n_orders, 0) AS n_orders,
        |  coalesce(no_txn.sum_ol_cnt, 0) AS sum_ol_cnt,
        |  coalesce(no_txn.sum_o_id, 0) AS sum_o_id,
        |  CAST(-coalesce(pay.d_ytd, 0) AS DOUBLE) AS c_balance_sum,
        |  coalesce(pay.n_payments, 0) AS n_payments
        |FROM grid g
        |LEFT JOIN no_txn ON no_txn.w = g.w AND no_txn.d = g.d
        |LEFT JOIN pay ON pay.w = g.w AND pay.d = g.d
        |LEFT JOIN wpay ON wpay.w = g.w
        |ORDER BY g.w, g.d""".stripMargin,
    "q90_catalog_tx" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey < 100 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  CASE WHEN o_orderkey < 100 THEN 'doubled' ELSE '-' END AS note
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin,
    // the identical end state, reached through BEGIN CATALOG … COMMIT
    "q112_sql_catalog_tx" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey < 100 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  CASE WHEN o_orderkey < 100 THEN 'doubled' ELSE '-' END AS note
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin,
    "q83_expire" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey < 100 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey < 800
        |ORDER BY o_orderkey""".stripMargin,
    "q80_view" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_orderkey < 900
        |  AND o_orderpriority = '1-URGENT' AND o_totalprice > 100000.0
        |ORDER BY o_orderkey""".stripMargin,
    "q29_trig" ->
      """SELECT o_orderkey,
        |  round(sin(o_totalprice/100000.0),6) AS sin_x,
        |  round(cos(o_totalprice/100000.0),6) AS cos_x,
        |  round(tan(CAST(o_orderkey AS DOUBLE)/100.0),6) AS tan_x,
        |  round(atan2(o_totalprice, CAST(o_orderkey AS DOUBLE)+1.0),6) AS atan2_x,
        |  round(degrees(CAST(o_orderkey AS DOUBLE)/10.0),6) AS deg_x,
        |  round(exp(CAST(o_orderkey AS DOUBLE)/1000.0),6) AS exp_x,
        |  round(pow(CAST(o_orderkey AS DOUBLE),1.5),6) AS pow_x
        |FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey""".stripMargin
  )
}

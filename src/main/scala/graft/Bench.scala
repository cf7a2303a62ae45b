package graft

import org.apache.spark.sql.SparkSession

import graft.entry.IndexQueries
import graft.index.{IndexBuilder, IndexConfig}
import graft.query.Searcher

/** Driver-run benchmark: one JSON line with total seconds + per-query
  * seconds on SPARK_GRAFT_SF_DIR. Also reports index-build throughput
  * (corpus GB/hour, the BASELINE.json headline metric) and BM25 top-k
  * latency percentiles over the frozen query set as extra top-level keys.
  */
object Bench {

  /** Frozen reference query set (FIXTURES.md §1): rare/common/absent mixes,
    * 1-4 terms, incl. all-heavy-hitter queries. */
  val QuerySet: Seq[String] = Seq(
    "hash join", "window merge", "customer order", "scan sort merge agg",
    "the fast", "slow batch value", "table row filter", "key order",
    "group query row data", "stream customer", "vector column",
    "part window small", "data group sort", "join filter window row",
    "agg line group hash", "small hash scan join", "fast column table",
    "merge part", "query order join small", "line batch")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // match ScalingBench's protocol: without this the 0.8 GB corpus scan
      // is capped at ~7 input splits, far below 32 cores
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // 1a) index build over the sf documents corpus, cold (fresh dir) —
    //     the correctness-scale build
    val corpus = IndexQueries.corpusFromDocuments(spark, sfDir)
    val corpusBytes = corpus.toDF()
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("content"))))
      .head().getLong(0)
    val idxDir = java.nio.file.Files.createTempDirectory("graft-bench-idx").toString
    val cfg = IndexConfig(indexDir = idxDir, numShards = 32,
      heavyDfThreshold = 1000, buildPartitions = cpus.toInt)
    val tBuild = secs { IndexBuilder.build(spark, corpus, cfg, "bench") }

    // 1b) throughput-scale build: the sf documents table is ~1.5 MB, so its
    //     build time is all fixed overhead; GB/hour is measured on a 60k-file
    //     (~0.8 GB) generated corpus staged to parquet (same protocol as
    //     ScalingBench / BENCH/BASELINE.md)
    // shared with ScalingBench's staging path — one 0.8 GB copy on disk
    val bigPath = s"${System.getProperty("java.io.tmpdir")}/graft-scale-corpus-60000"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(bigPath, "_SUCCESS")))
      graft.corpus.CorpusGen.generate(spark, 60000L, partitions = 64)
        .write.mode("overwrite").parquet(bigPath)
    import spark.implicits._
    val bigCorpus = spark.read.parquet(bigPath).as[graft.model.SourceFile]
    val bigBytes = bigCorpus.toDF()
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("content"))))
      .head().getLong(0)
    // best-of-2 like the headline queries (±30% single-shot VM noise was
    // whipsawing the recorded GB/h); each rep builds into a fresh dir
    val bigBuilds = (1 to 2).map { _ =>
      val bigDir = java.nio.file.Files.createTempDirectory("graft-bench-big").toString
      // numShards pinned to the recorded-rounds layout (autoShards == 32 on
      // a <=32-core box): a larger box must not silently change the shard
      // count and break round-over-round comparability (ADVICE r4)
      val c = IndexConfig(indexDir = bigDir, numShards = 32,
        heavyDfThreshold = 5000, buildPartitions = cpus.toInt)
      (secs { IndexBuilder.build(spark, bigCorpus, c, "bench60k") }, c)
    }
    val (tBig, bigCfg) = bigBuilds.minBy(_._1)
    val gbPerHour = (bigBytes / 1e9) / (tBig / 3600.0)

    // 1c) distributed-WAND latency on the 60k index (above the local-serve
    //     block budget, so every query takes the cluster path) — the second
    //     serving regime, reported alongside the local-serve p50 below
    // each latency is best-of-3 exactly like the headline queries (a
    // single timed pass whipsawed round-over-round p50s ~2x on identical
    // code — the same VM-noise class best-of-k cured for the queries)
    val LatBestOf = 3
    val bigSearcher = new Searcher(spark, bigCfg)
    bigSearcher.searchWAND(QuerySet.head, 10) // warm
    val dLats = QuerySet.take(10).map(q =>
      (1 to LatBestOf).map(_ =>
        secs { bigSearcher.searchWAND(q, 10) } * 1000.0).min).sorted
    val p50Dist = dLats(dLats.length / 2)

    // 2) BM25 top-10 latency over the frozen query set (block-max WAND;
    //    serves driver-local below the block budget — Searcher.localServe).
    //    One full warm pass first (cache + JIT), then best-of-3 timed
    //    passes — the steady-state a serving deployment runs in.
    val searcher = new Searcher(spark, cfg)
    QuerySet.foreach(q => searcher.searchWAND(q, 10))
    val lats = QuerySet.map(q =>
      (1 to LatBestOf).map(_ => secs { searcher.searchWAND(q, 10) } * 1000.0).min)
    val sorted = lats.sorted
    val p50 = sorted(sorted.length / 2)
    val p95 = sorted(math.min(sorted.length - 1, (sorted.length * 95) / 100))

    // 3) headline queries across the surface (index-cache pre-warmed so
    //    q5x_* timings measure the query, not a second index build)
    IndexQueries.indexFor(spark, sfDir)
    val heads = Seq(
      "q01_pricing_summary", "q04_multi_join", "q08_topk", "q12_distinct_agg",
      "q22_window_rank", "q25_events_hourly", "q30_token_stats",
      "q33_exact_dedup", "q35_minhash_pairs", "q36_ngram_jaccard",
      "q40_knn_bruteforce", "q41_knn_lsh", "q42_embedding_dedup",
      "q50_bm25_hash_join", "q52_index_lexicon", "q54_postings_roundtrip",
      "q58_sketch_agg", "q63_tpch_q5", "q64_tpch_q6")
    // index_build_60k is sf-independent — reported as a top-level key,
    // NOT in queries/total, so the headline stays comparable across runs.
    // Each headline query is timed best-of-k (ScalingBench's protocol):
    // this VM shows ±2-3× run-to-run noise on identical jobs, so a
    // single-shot timing encodes co-tenancy noise as a plan regression
    // (BENCH_r02 recorded q36 at 16 s; the best-of re-measure is ~1-4 s).
    val BestOf = 3
    val results: Seq[(String, Double)] =
      Seq("index_build" -> tBuild) ++
      heads.map { name =>
        val fn = SparkEntry.queries(name)
        name -> (1 to BestOf).map(_ => secs { fn(spark, sfDir).count() }).min
      } ++ Seq("bm25_p50_query" -> p50 / 1000.0)

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.4f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // round-4+ operators measured per-round as SEPARATE keys — not in the
    // headline total, which stays comparable with earlier rounds' records
    val newOps = Seq("q79_dedup_components", "q81_stream_join",
      "q82_embedding_components", "q84_json_roundtrip",
      "q85_transaction", "q86_merge_upsert", "q87_stream_dedup",
      "q88_compact", "q89_stream_ingest", "q90_catalog_tx",
      "q91_point_lookup", "q92_sql_session", "q94_bloom_lookup",
      "q95_create_function", "q96_trigger", "q97_hash_sample",
      "q98_hash_topn", "q99_table_search", "q100_sql_search",
      "q101_phrase_search", "q102_phrase_maintained", "q103_stats_agg",
      "q104_filtered_search", "q105_stream_search", "q106_changes",
      "q107_prefix_search", "q108_facet_counts", "q109_boolean_search",
      "q110_sql_changes", "q111_sql_time_travel", "q112_sql_catalog_tx",
      "q113_boolean_filtered")
    val extras = newOps.map { name =>
      val fn = SparkEntry.queries(name)
      name -> (1 to 2).map(_ => secs { fn(spark, sfDir).count() }).min
    } ++ {
      // TPC-C-shaped OLTP throughput (reference tpcc_benchmark.cpp:58):
      // q93's 16-txn serial replay, plus a 4-writer concurrent payment
      // loop with OCC retries — txns/sec is the reference's unit
      val t93 = secs { SparkEntry.queries("q93_tpcc")(spark, sfDir).count() }
      val root = s"${System.getProperty("java.io.tmpdir")}/graft-bench-tpcc"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      val tpcc = new graft.workload.Tpcc(spark,
        new graft.sources.Catalog(spark, root))
      tpcc.setup()
      val (n, retries, ms) = tpcc.runConcurrentPayments(4, 4,
        (ti, i) => (ti * 4 + i + 1).toDouble)
      Seq("q93_tpcc" -> t93,
        "tpcc_txns_per_sec" -> n.toDouble / (ms / 1000.0),
        "tpcc_occ_retries" -> retries.toDouble)
    }
    val extrasJson = extras.map { case (k, v) => "\"" + k + f"\":$v%.4f" }
      .mkString("{", ",", "}")

    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"new_ops":$extrasJson,"sf":"$sfDir","gb_per_hour":$gbPerHour%.3f,"index_build_60k_sec":$tBig%.2f,"bm25_p50_ms":$p50%.2f,"bm25_p95_ms":$p95%.2f,"bm25_p50_ms_distributed":$p50Dist%.2f,"corpus_bytes":$corpusBytes,"big_corpus_bytes":$bigBytes,"cpus":$cpus}"""
    println(json)
    // also write the line to a file: the stdout line lands inside sbt [info]
    // noise, so machine consumers (BENCH_r{N}.json "parsed") read this copy
    try {
      val out = java.nio.file.Paths.get("BENCH/last_run.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.writeString(out, json + "\n")
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write BENCH/last_run.json: $e")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}
import graft.query.Searcher

/** Two-parallelism scaling evidence (BASELINE.json north_rule: ≥0.8
  * throughput scaling efficiency from N to 4N executors; sandbox proxy =
  * the identical job at local[8] vs local[32] on the same deterministic
  * input — no real cluster exists here, per BASELINE.md).
  *
  * Runs the full index build (the engine's dominant workload) over a
  * generated corpus at both parallelism levels in one JVM (sequential
  * SparkSessions), checks rank-identical query results across the two
  * runs, and prints one JSON line:
  *   throughput_8, throughput_32 (GB/hour), efficiency = (T32/T8)/4.
  *
  * Usage: runMain graft.ScalingBench [numFiles] [outMdPath]
  */
object ScalingBench {

  final case class RunResult(
      secs: Double, bytes: Long,
      stageMs: Map[String, Long],
      topk: Seq[Seq[(Long, Double)]])

  def runAt(cores: Int, numFiles: Long, corpusPath: String,
      numShards: Int): RunResult = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // at this corpus size the default 128 MB split would cap the scan at
      // ~7 tasks — far below 32 cores; real deployments have ample splits
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // materialize the corpus as a parquet table first (untimed): the
      // workload being measured is "index a stored corpus", and reading
      // parquet once per stage is the real access pattern — regenerating
      // synthetic content on every pass is not.
      import spark.implicits._
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(corpusPath, "_SUCCESS")))
        CorpusGen.generate(spark, numFiles, partitions = 64)
          .write.mode("overwrite").parquet(corpusPath)
      val corpus = spark.read.parquet(corpusPath).as[graft.model.SourceFile]
      val bytes = corpus.toDF()
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("content"))))
        .head().getLong(0)
      val dir = java.nio.file.Files.createTempDirectory(s"graft-scale$cores").toString
      // numShards is PINNED by the caller (computed once from the larger
      // leg), not per-session autoShards: on a >32-core box the two legs'
      // defaultParallelism would otherwise derive different shard counts
      // and silently invalidate the scaling comparison (ADVICE r4)
      val cfg = IndexConfig(indexDir = dir, numShards = numShards,
        heavyDfThreshold = 5000, buildPartitions = cores)
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, corpus, cfg, s"scaling-$numFiles")
      val secs = (System.nanoTime() - t0) / 1e9
      val stageMs = new graft.checkpoint.Manifest(dir).read()
        .map { case (k, v) => k -> v.wallMs }
      // rank-identity evidence across parallelism levels
      val searcher = new Searcher(spark, cfg)
      val results = Bench.QuerySet.take(8).map(q =>
        searcher.searchWAND(q, 10).toSeq.map(sd => (sd.docId, sd.score)))
      RunResult(secs, bytes, stageMs.toMap, results)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val numFiles = if (args.length > 0) args(0).toLong else 60000L
    val outMd = if (args.length > 1) args(1) else ""
    val loCores = if (args.length > 2) args(2).toInt else 8
    val hiCores = if (args.length > 3) args(3).toInt else loCores * 4
    val corpusPath =
      s"${System.getProperty("java.io.tmpdir")}/graft-scale-corpus-$numFiles"

    // ONE shard layout for both legs, derived from the larger leg (the
    // same formula autoShards applies to a session with hiCores cores):
    // identical shards ⇒ identical work and bit-identical results, the
    // precondition for the N vs 4N comparison to measure parallelism only
    val numShards = math.max(32, hiCores)

    // best-of-2 per level: this sandbox VM shows ±2× run-to-run noise on
    // identical jobs; min-of-k is the standard estimator under such noise
    def bestOf(cores: Int): RunResult = {
      val a = runAt(cores, numFiles, corpusPath, numShards)
      val b = runAt(cores, numFiles, corpusPath, numShards)
      if (a.secs <= b.secs) a else b
    }
    val r8run = bestOf(loCores)
    val r32run = bestOf(hiCores)
    val (t8, bytes, r8) = (r8run.secs, r8run.bytes, r8run.topk)
    val (t32, r32) = (r32run.secs, r32run.topk)
    val identical = r8 == r32
    val gb = bytes / 1e9
    val thr8 = gb / (t8 / 3600.0)
    val thr32 = gb / (t32 / 3600.0)
    val eff = (thr32 / thr8) / 4.0
    def st(m: Map[String, Long]) =
      Seq("keymap", "forward", "docs", "postings", "lexicon")
        .map(k => s""""$k":${m.getOrElse(k, -1L)}""").mkString("{", ",", "}")
    val json =
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","num_files":$numFiles,"corpus_gb":$gb%.3f,"cores_n":$loCores,"cores_4n":$hiCores,"build_sec_n":$t8%.2f,"build_sec_4n":$t32%.2f,"gb_per_hour_n":$thr8%.3f,"gb_per_hour_4n":$thr32%.3f,"rank_identical_across_parallelism":$identical,"stage_ms_n":${st(r8run.stageMs)},"stage_ms_4n":${st(r32run.stageMs)}}"""
    println(json)
    if (outMd.nonEmpty) {
      val md =
        f"""## Scaling run (N vs 4N parallelism proxy: local[$loCores] vs local[$hiCores])
           |
           |Same job (full index build: docmap → docs → postings → lexicon),
           |same deterministic corpus (CorpusGen seed=42, $numFiles files,
           |$gb%.2f GB of content), one machine (32 cores / 125 GB).
           |
           || parallelism | build time (s) | throughput (GB/hour) |
           ||---|---|---|
           || local[$loCores]  (N)  | $t8%.1f | $thr8%.2f |
           || local[$hiCores] (4N) | $t32%.1f | $thr32%.2f |
           |
           |**Scaling efficiency = (thr_4N / thr_N) / 4 = $eff%.3f** (target ≥ 0.8)
           |
           |Top-10 BM25 results (docIds AND scores) for 8 reference queries are
           |identical across the two parallelism levels: $identical.
           |""".stripMargin
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outMd), md)
    }
  }
}

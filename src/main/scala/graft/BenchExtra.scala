package graft

import org.apache.spark.sql.SparkSession

import graft.entry.IndexQueries
import graft.index.{IndexBuilder, IndexConfig}

/** Optimization-round profiling harness (spark_optimization_guide §1):
  * NOT part of the frozen driver bench. Times individual declared queries
  * with the noop sink (computes every column, discards the output — the
  * guide's recommended isolation) and prints a fresh small-corpus index
  * build with its per-stage wall times from the manifest.
  *
  * Usage: runMain graft.BenchExtra [queryName ...]
  *   no args        — profile the index build + the default hot set
  *   "build"        — just the fresh small-corpus build with stage times
  *   query names    — time those entries, best-of-2, noop sink
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // job/task counters (guide §1: know where the time goes — at small
    // scale the job COUNT is the fixed-overhead proxy)
    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          tasks.addAndGet(j.stageInfos.map(_.numTasks.toLong).sum)
        }
      })
    def counted(f: => Unit): (Double, Long, Long) = {
      val (j0, t0) = (jobs.get(), tasks.get())
      val s = secs(f)
      (s, jobs.get() - j0, tasks.get() - t0)
    }

    val hotDefault = Seq("q99_table_search", "q100_sql_search",
      "q102_phrase_maintained", "q105_stream_search", "q93_tpcc",
      "q81_stream_join", "q79_dedup_components", "q82_embedding_components",
      "q35_minhash_pairs", "q87_stream_dedup")
    val wants = if (args.isEmpty) "build" +: hotDefault else args.toSeq

    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    wants.foreach {
      case "build" =>
        // fresh dir per timing — the cold-build fixed overhead the frozen
        // bench measures as index_build
        val corpus = IndexQueries.corpusFromDocuments(spark, sfDir)
        val times = (1 to 2).map { _ =>
          val dir = java.nio.file.Files.createTempDirectory("graft-extra-idx")
            .toString
          val cfg = IndexConfig(indexDir = dir, numShards = 32,
            heavyDfThreshold = 1000, buildPartitions = cpus.toInt)
          val t = secs { IndexBuilder.build(spark, corpus, cfg, "extra") }
          val stages = new graft.checkpoint.Manifest(dir).read()
            .map { case (k, v) => s"$k=${v.wallMs}ms" }.mkString(" ")
          System.err.println(f"[extra] build $t%.3f s  $stages")
          t
        }
        out += "index_build_small" -> times.min
      case name =>
        val fn = SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query $name"))
        spark.sparkContext.setJobDescription(s"extra:$name")
        val runs = (1 to 2).map(_ => counted {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        })
        val best = runs.minBy(_._1)
        System.err.println(
          f"[extra] $name ${best._1}%.3f s  jobs=${best._2} tasks=${best._3}")
        spark.sparkContext.setJobDescription(null)
        out += name -> best._1
    }
    val qs = out.map { case (k, v) => "\"" + k + f"\":$v%.4f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"extra","queries":$qs,"sf":"$sfDir","cpus":$cpus}""")
    spark.stop()
  }
}

package graft.index

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.CollectionAccumulator

import graft.analysis.CodeTokenizer
import graft.checkpoint.{Manifest, StageRecord}
import graft.codec.PostingCodec
import graft.model._

/** Index layout + build configuration.
  *
  * `numShards`: docId space is cut into `numShards` contiguous ranges;
  * posting blocks NEVER span a shard boundary, so (a) heavy terms can be
  * salted by shard and their sub-segments concatenate in docId order with no
  * re-sort, and (b) query-time sharded scoring is exact (every document's
  * postings for every term live in the same shard). This is the engine's
  * analogue of the reference's fixed 512-way overflow partitioning in the
  * parallel aggregation path (aggregation_hash_table.cpp:120,422).
  *
  * `heavyDfThreshold`: terms with more postings than this are salted across
  * shards at build time (skew defusal — a Zipfian `if`/`return` otherwise
  * lands on one reducer; SURVEY.md §7.5).
  */
final case class IndexConfig(
    indexDir: String,
    bm25: BM25Params = BM25Params(),
    blockSize: Int = PostingCodec.DefaultBlockSize,
    numShards: Int = 32,
    heavyDfThreshold: Long = 100000L,
    maxHeavyTerms: Int = 4096,
    buildPartitions: Int = 0) {
  def docmapPath: String = s"$indexDir/docmap"
  def docsPath: String = s"$indexDir/docs"
  def postingsPath: String = s"$indexDir/postings"
  def lexiconPath: String = s"$indexDir/lexicon"
  def metricsPath: String = s"$indexDir/metrics"
}

/** Per-partition build metrics row (the reference records per-pipeline
  * operating-unit features for its self-driving models, brain_defs.h:5-44;
  * we record the same shape for observability: SURVEY.md §7.6). */
final case class PartitionMetric(
    stage: String,
    partitionId: Int,
    rows: Long,
    tokens: Long,
    bytesOut: Long,
    wallMs: Long)

/** Distributed inverted-index builder.
  *
  * Stages (each checkpointed in manifest.json; resume skips completed stages
  * whose input fingerprint matches):
  *
  *   1. docmap   — global dense docId = lexicographic rank of the unique key
  *                 (repo, path, commit). Keys-only scan (content column is
  *                 pruned at the parquet reader), distributed sort +
  *                 zipWithIndex. This is the single place the engine drops to
  *                 the RDD API: a dense global rank needs the
  *                 sort-then-offset scheme, and RDD.zipWithIndex reuses the
  *                 materialized shuffle output for both of its internal
  *                 passes, which Dataset-level re-execution does not
  *                 guarantee (SURVEY.md §7.5 documents this decision).
  *   2. docs     — corpus ⋈ docmap, tokenize once per document for dl
  *                 (BM25 doc length) + sha2(content,256) lineage column.
  *   3. postings — corpus ⋈ docmap, invert to (term, docId, tf, dl); detect
  *                 heavy terms (df > threshold) with a map-side-combined
  *                 count; repartition by (term, salt) where salt = docId
  *                 shard for heavy terms and 0 otherwise; sort within
  *                 partitions by (term, salt, docId); stream-encode
  *                 delta+VByte blocks with block-max metadata.
  *   4. lexicon  — per-term stats (df, cf, nBlocks, maxTfNorm) aggregated
  *                 from block metadata, plus corpus stats (N, avgdl).
  *
  * Scale notes (100 TB / 1000 executors): the only content-bearing shuffles
  * are the two corpus⋈docmap joins (docmap carries keys only, a few % of
  * corpus bytes); postings shuffle moves (term, docId, tf, dl) tuples —
  * bounded by token count, not content bytes; every stage streams
  * iterator-to-iterator (no per-term materialization of full posting lists);
  * heavy-term salting bounds any single reducer's input at roughly
  * df/numShards postings.
  */
object IndexBuilder {

  @inline def shardOf(docId: Long, numDocs: Long, numShards: Int): Int = {
    val s = ((docId * numShards) / math.max(numDocs, 1L)).toInt
    if (s >= numShards) numShards - 1 else if (s < 0) 0 else s
  }

  @inline def tfNorm(tf: Int, dl: Int, avgDl: Double, p: BM25Params): Double =
    tf / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgDl))

  /** Robertson-ish idf, Lucene form (always positive):
    * ln(1 + (N - df + 0.5) / (df + 0.5)). */
  @inline def idf(numDocs: Long, df: Long): Double =
    math.log(1.0 + (numDocs - df + 0.5) / (df + 0.5))

  def build(spark: SparkSession, corpus: Dataset[SourceFile],
      cfg: IndexConfig, fingerprint: String = ""): CorpusStats = {
    import spark.implicits._
    val manifest = new Manifest(cfg.indexDir)
    val fp = if (fingerprint.nonEmpty) fingerprint else "corpus"
    val parts =
      if (cfg.buildPartitions > 0) cfg.buildPartitions
      else spark.sparkContext.defaultParallelism
    val metricsAcc: CollectionAccumulator[PartitionMetric] =
      spark.sparkContext.collectionAccumulator[PartitionMetric]("graft.metrics")

    // ---- stage 1: docmap --------------------------------------------------
    if (!manifest.isComplete("docmap", fp)) {
      val t0 = System.nanoTime()
      val ranked = corpus
        .select($"repo", $"path", $"commit")
        .as[(String, String, String)]
        .rdd
        .sortBy(identity, ascending = true, numPartitions = parts)
        .zipWithIndex()
        .map { case ((repo, path, commit), docId) =>
          DocMapEntry(docId, repo, path, commit) }
        .toDS()
      ranked.write.mode("overwrite").parquet(cfg.docmapPath)
      val n = spark.read.parquet(cfg.docmapPath).count()
      manifest.commit(StageRecord("docmap", "complete", fp, n,
        (System.nanoTime() - t0) / 1000000, Map("partitions" -> parts.toString)))
    }

    val docmap = spark.read.parquet(cfg.docmapPath).as[DocMapEntry]
    val numDocs = manifest.get("docmap").get.rows
    def withIds: Dataset[(SourceFile, Long)] = corpus
      .joinWith(docmap,
        corpus("repo") === docmap("repo") &&
        corpus("path") === docmap("path") &&
        corpus("commit") === docmap("commit"))
      .map { case (sf, dm) => (sf, dm.docId) }

    // ---- stage 2: docs ----------------------------------------------------
    if (!manifest.isComplete("docs", fp)) {
      val t0 = System.nanoTime()
      val docs = withIds.mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val pt0 = System.nanoTime()
        var rows = 0L; var toks = 0L
        val mapped = it.map { case (sf, docId) =>
          val dl = CodeTokenizer.docLength(sf.content)
          rows += 1; toks += dl
          DocEntry(docId, sf.repo, sf.path, sf.commit, sf.lang, dl,
            graft.corpus.CorpusGen.sha256Hex(sf.content))
        }
        new Iterator[DocEntry] {
          def hasNext: Boolean = {
            val h = mapped.hasNext
            if (!h) metricsAcc.add(PartitionMetric("docs", pid, rows, toks, 0L,
              (System.nanoTime() - pt0) / 1000000))
            h
          }
          def next(): DocEntry = mapped.next()
        }
      }
      docs
        .repartitionByRange(parts, $"docId")
        .sortWithinPartitions($"docId")
        .write.mode("overwrite").parquet(cfg.docsPath)
      val agg = spark.read.parquet(cfg.docsPath)
        .agg(count(lit(1)), sum($"dl")).as[(Long, Long)].head()
      manifest.commit(StageRecord("docs", "complete", fp, agg._1,
        (System.nanoTime() - t0) / 1000000,
        Map("totalTokens" -> agg._2.toString)))
    }

    val totalTokens = manifest.get("docs").get.extra("totalTokens").toLong
    val avgDl = totalTokens.toDouble / math.max(numDocs, 1L)

    // ---- stage 3: postings ------------------------------------------------
    if (!manifest.isComplete("postings", fp)) {
      val t0 = System.nanoTime()
      val raw: Dataset[RawPosting] = withIds.flatMap { case (sf, docId) =>
        val (tf, dl) = CodeTokenizer.termFreqs(sf.content)
        tf.iterator.map { case (term, f) => RawPosting(term, docId, f, dl) }
      }
      // Heavy-hitter detection: exact df-count with map-side partial agg.
      // At 100 TB the same plan holds (partial aggregation bounds shuffle
      // rows at vocabSize × mapTasks); an approx_count_distinct / sampled
      // pre-pass is the documented fallback if vocab explodes.
      val heavy: Set[String] = raw
        .groupBy($"term").agg(count(lit(1)).as("n"))
        .filter($"n" > cfg.heavyDfThreshold)
        .orderBy($"n".desc)
        .limit(cfg.maxHeavyTerms)
        .select($"term").as[String].collect().toSet
      val heavyB = spark.sparkContext.broadcast(heavy)
      val nShards = cfg.numShards
      val nDocs = numDocs
      val blockSize = cfg.blockSize
      val bm25 = cfg.bm25
      val avgDlV = avgDl

      val salted = raw.map { p =>
        val salt =
          if (heavyB.value.contains(p.term)) shardOf(p.docId, nDocs, nShards)
          else 0
        (p.term, salt, p.docId, p.tf, p.dl)
      }.toDF("term", "salt", "docId", "tf", "dl")

      val blocks = salted
        .repartition(parts, $"term", $"salt")
        .sortWithinPartitions($"term", $"salt", $"docId")
        .as[(String, Int, Long, Int, Int)]
        .mapPartitions { it =>
          val pid = TaskContext.getPartitionId()
          val pt0 = System.nanoTime()
          var rows = 0L; var bytesOut = 0L
          // Stream runs of equal term — never materialize a full term's
          // postings: emit a block whenever 1) blockSize postings buffered,
          // 2) the docId shard changes, or 3) the term changes. At most
          // blockSize postings are ever buffered per partition.
          new Iterator[PostingBlockRow] {
            private val base = it.buffered
            private var blockIdx = 0
            private var lastTerm: String = null
            private var metricsEmitted = false
            private val buf =
              scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]

            def hasNext: Boolean = {
              val h = base.hasNext
              if (!h && !metricsEmitted) {
                metricsAcc.add(PartitionMetric("postings", pid, rows, rows,
                  bytesOut, (System.nanoTime() - pt0) / 1000000))
                metricsEmitted = true
              }
              h
            }

            def next(): PostingBlockRow = {
              val term = base.head._1
              val shard = shardOf(base.head._3, nDocs, nShards)
              if (term != lastTerm) { blockIdx = 0; lastTerm = term }
              buf.clear()
              var continue = true
              while (continue && base.hasNext && buf.length < blockSize) {
                val (t, _, d, tf, dl) = base.head
                if (t == term && shardOf(d, nDocs, nShards) == shard) {
                  buf += ((d, tf, dl)); rows += 1; base.next()
                } else continue = false
              }
              val b = PostingCodec.buildBlocks(term, shard, buf.toSeq,
                (tf, dl) => tfNorm(tf, dl, avgDlV, bm25), blockSize)
                .head.copy(blockIdx = blockIdx)
              blockIdx += 1
              bytesOut += b.bytes.length
              b
            }
          }
        }
      blocks.write.mode("overwrite").parquet(cfg.postingsPath)
      val nb = spark.read.parquet(cfg.postingsPath).count()
      manifest.commit(StageRecord("postings", "complete", fp, nb,
        (System.nanoTime() - t0) / 1000000,
        Map("heavyTerms" -> heavy.size.toString,
            "numShards" -> nShards.toString)))
    }

    // ---- stage 4: lexicon + stats ------------------------------------------
    if (!manifest.isComplete("lexicon", fp)) {
      val t0 = System.nanoTime()
      val blocks = spark.read.parquet(cfg.postingsPath)
      blocks
        .groupBy($"term")
        .agg(sum($"count").as("df"), sum($"sumTf").as("cf"),
          count(lit(1)).cast("int").as("nBlocks"),
          max($"maxTfNorm").as("maxTfNorm"))
        .repartitionByRange(math.max(parts / 4, 1), $"term")
        .sortWithinPartitions($"term")
        .write.mode("overwrite").parquet(cfg.lexiconPath)
      val vocab = spark.read.parquet(cfg.lexiconPath).count()
      manifest.commit(StageRecord("lexicon", "complete", fp, vocab,
        (System.nanoTime() - t0) / 1000000,
        Map("numDocs" -> numDocs.toString, "avgDl" -> avgDl.toString,
            "totalTokens" -> totalTokens.toString)))
    }

    // ---- metrics sink -------------------------------------------------------
    val collected = metricsAcc.value
    if (!collected.isEmpty) {
      import scala.jdk.CollectionConverters._
      spark.createDataset(collected.asScala.toSeq)
        .write.mode("append").parquet(cfg.metricsPath)
    }

    val lex = manifest.get("lexicon").get
    CorpusStats(numDocs, avgDl, totalTokens, lex.rows)
  }

  /** Stats of an already-built index (no build triggered). */
  def stats(cfg: IndexConfig): CorpusStats = {
    val manifest = new Manifest(cfg.indexDir)
    val lex = manifest.get("lexicon").getOrElse(
      throw new IllegalStateException(s"index at ${cfg.indexDir} not built"))
    CorpusStats(
      lex.extra("numDocs").toLong,
      lex.extra("avgDl").toDouble,
      lex.extra("totalTokens").toLong,
      lex.rows)
  }
}

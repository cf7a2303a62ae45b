package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for corpus curation — the
  * operation a training-data pipeline runs constantly (downsample a
  * language, carve a held-out split, cap a source's share) and where
  * `rand()`-based sampling is a silent reproducibility bug: its output
  * depends on partitioning, task retries, and cluster size.
  *
  * Spark-first shape: the keep-decision is a pure Column predicate over
  * the ROW KEY — `md5(salt || key) < threshold(rate)` on the 128-bit hex
  * string (fixed-length lowercase hex compares as the integer it encodes).
  * No RNG state, no UDF, fully codegen'd, and the same row set comes back
  * under any repartitioning, any engine (the DuckDB oracle replays it
  * bit-for-bit), any scale. At 100 TB it is a narrow filter fused into
  * the scan — zero shuffles; the exact-N variant is one
  * TakeOrderedAndProject (per-partition top-N, single reduce).
  *
  * Reference scope note: terrier has no sampling operator (its optimizer
  * samples internally for stats only) — this is part of the pipeline
  * superset, like dedup/ANN.
  */
object Sampling {

  /** floor(rate * 2^128) as 32-digit zero-padded lowercase hex — the
    * keep-threshold against the uniform [0, 2^128) integer md5(key). */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0, 1]")
    val full = BigInt(1) << 128
    // java.math.BigDecimal: exact by default — Scala's wrapper carries a
    // DECIMAL128 context that silently rounds 2^128 (39 digits) to 34
    // significant digits and would skew every threshold
    val t = BigInt(new java.math.BigDecimal(rate)
        .multiply(new java.math.BigDecimal(full.bigInteger))
        .toBigInteger)
      .min(full - 1).max(BigInt(0))
    val hex = t.toString(16)
    ("0" * (32 - hex.length)) + hex
  }

  /** Keep-predicate: row survives iff md5(salt || key) < threshold(rate).
    * Different salts give independent samples (split trains/held-out);
    * a NULL key never survives (md5 of NULL is NULL — same both engines
    * with the `||` operator). */
  def hashSample(key: Column, rate: Double, salt: String = ""): Column =
    md5(concat(lit(salt), key.cast("string"))) < lit(thresholdHex(rate))

  /** Exact-N uniform sample: the N smallest hashes, key-tiebroken (total
    * order → deterministic even on hash collisions). */
  def hashTopN(df: DataFrame, key: Column, n: Int, salt: String = ""): DataFrame =
    df.orderBy(md5(concat(lit(salt), key.cast("string"))), key).limit(n)

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")

  // power-of-two rates so the thresholds are short exact hex literals in
  // BOTH engines (any rate works — the oracle embeds thresholdHex output)
  private val RateEn = 0.5
  private val RateFr = 0.25
  private val RateRest = 0.125

  val queries: Map[String, Q] = Map(
    // --- stratified deterministic downsample: per-language keep rates,
    //     the "rebalance the language mix" curation step
    "q97_hash_sample" -> ((s, d) => {
      val keep = when(col("lang") === "en", hashSample(col("doc_id"), RateEn, "s1"))
        .when(col("lang") === "fr", hashSample(col("doc_id"), RateFr, "s1"))
        .otherwise(hashSample(col("doc_id"), RateRest, "s1"))
      docs(s, d).filter(keep)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // --- exact-N uniform sample (hash order + key tiebreak), e.g. a
    //     fixed-size eval split carved reproducibly from the corpus
    "q98_hash_topn" -> ((s, d) => {
      hashTopN(docs(s, d).select(col("doc_id"), col("lang")),
        col("doc_id"), 100, "s2")
        .orderBy(col("doc_id"))
    }))

  val oracles: Map[String, String] = Map(
    "q97_hash_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE md5('s1' || CAST(doc_id AS VARCHAR)) <
         |  CASE WHEN lang = 'en' THEN '${thresholdHex(RateEn)}'
         |       WHEN lang = 'fr' THEN '${thresholdHex(RateFr)}'
         |       ELSE '${thresholdHex(RateRest)}' END
         |ORDER BY doc_id""".stripMargin,
    "q98_hash_topn" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang FROM documents
        |  ORDER BY md5('s2' || CAST(doc_id AS VARCHAR)), doc_id
        |  LIMIT 100)
        |ORDER BY doc_id""".stripMargin)
}

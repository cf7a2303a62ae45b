package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.entry.IndexQueries
import graft.pipeline.{Multimodal, Sampling, Similarity, TextPipeline}
import graft.relational.TpchQueries
import graft.streaming.StreamingOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the engine's whole surface:
  *   q0x_* — relational parity (SURVEY.md §2 operator inventory),
  *   q3x_* — text pipeline (token stats, quality, lang-id, dedup family),
  *   q4x_* — similarity search + multimodal plumbing,
  *   q5x_* — the inverted-index + BM25 engine itself over the documents
  *            table, each stage pinned to a DuckDB SQL recomputation.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * BM25 top-k through the full index pipeline. */
  def entry(spark: SparkSession): DataFrame =
    IndexQueries.bm25(spark, "/root/testdata/sf0.001", "hash join scan", 10)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TpchQueries.queries ++ TextPipeline.queries ++ Sampling.queries ++
      Similarity.queries ++ Similarity.extraQueries ++ Multimodal.queries ++
      IndexQueries.queries ++ StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (q37 simhash, q41 lsh-ann, q43 ivf-ann, q46 media frames) →
    * rows-only check. */
  def oracleSql: Map[String, String] =
    TpchQueries.oracles ++ TextPipeline.oracles ++ Sampling.oracles ++
      Similarity.oracles ++ Multimodal.oracles ++ IndexQueries.oracles ++
      StreamingOps.oracles
}

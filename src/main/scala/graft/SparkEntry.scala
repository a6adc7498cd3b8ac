package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 + the builder
  * prompt. Each operator group contributes a `queries` map (Spark
  * DataFrame plans) and an `oracles` map (DuckDB-parity ANSI SQL over
  * the same parquet tables); keys pair 1:1.
  */
object SparkEntry {

  private val groups: Seq[QueryGroup] = Seq(
    VectorSearch,
    Ann,
    Lexical,
    Dedup,
    Relational,
    Temporal,
    TimeSeries,
    Curation,
    Sketches,
    TextAnalysis,
    Ingest,
    RulesParse,
    Graph,
    Rerank,
    Retrieval,
    graft.streaming.Streaming,
    graft.multimodal.Multimodal,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    VectorSearch.topK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    groups.map(_.oracles).reduce(_ ++ _)
}

/** Interface every operator group implements so SparkEntry can fold
  * them together. */
trait QueryGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed readers for the driver-generated testdata star schema
  * (TESTDATA.md).
  *
  * Re-expresses the reference's document/embedding pairing
  * (reference: db/init.sql:17-76, one document table joined 1:1 to a
  * vector(768) embedding table) as parquet-backed DataFrames:
  * `documents` plays the role of mtg_cards/mtg_rules/mtg_glossary and
  * `embeddings` plays the mtg_*_embeddings tables (64-dim float
  * vectors keyed by vec_id = doc_id).
  *
  * All readers are plain `spark.read.parquet` so Catalyst keeps full
  * pushdown/pruning freedom — filters and projections land in the
  * parquet scan (verify via explain: PushedFilters / ReadSchema).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** Normalize an events-shaped relation's `ts` to a session-zone
    * TimestampType regardless of how the generator wrote the column —
    * the physical type has changed across driver testdata
    * generations, and the readers must serve both:
    * - TIMESTAMP(NANOS) parquet arrives as a nanos BIGINT under the
    *   legacy nanosAsLong conf; the generator emits whole
    *   microseconds, so `ts DIV 1000` is lossless.
    * - micro-precision TIMESTAMP arrives as TIMESTAMP_NTZ (Spark 4
    *   infers NTZ for isAdjustedToUTC=false); every session here
    *   runs UTC, so the LTZ cast preserves the instant. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Events with `ts` normalized via [[normalizeTs]] (the legacy
    * nanos conf is set first so a NANOS file reads as long instead
    * of erroring). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame =
    table(s, d, "documents")

  /** Embeddings with the vector pre-cast to array<double> so every
    * downstream similarity computation runs in double precision (the
    * raw column is array<float>; float-precision dot products drift
    * ~1e-8 from the oracle). */
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
      .withColumn("embedding", col("embedding").cast("array<double>"))

  /** Register every table as a temp view so the pure-SQL surface
    * (the reference's "Direct SQL Queries" usage, plus the functions
    * injected by [[GraftExtensions]]) can query the schema by name:
    * `spark.sql("SELECT … FROM documents JOIN embeddings …")`. */
  def registerAll(s: SparkSession, d: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach(t => table(s, d, t).createOrReplaceTempView(t))
    events(s, d).createOrReplaceTempView("events")
    documents(s, d).createOrReplaceTempView("documents")
    embeddings(s, d).createOrReplaceTempView("embeddings")
  }
}

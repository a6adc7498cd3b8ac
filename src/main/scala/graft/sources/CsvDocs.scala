package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV document source/sink — the flat-file sibling of
  * [[JsonDocs]] for corpora delivered as delimited exports (the
  * reference's cleaned-card stage is tabular before embedding).
  * Same contract: schema enforced at read (no inference pass — at
  * 100 TB inference is a full extra scan), identical cleaning
  * normalization, quoted/escaped round-trip so embedded commas,
  * quotes, and newlines in document text survive.
  *
  * Scale design: CSV without embedded newlines is splittable like
  * JSONL; with `multiLine` quoting it is not — the sink therefore
  * escapes rather than multi-lines, keeping written files
  * splittable.
  */
object CsvDocs {

  /** Read CSV documents with the enforced [[JsonDocs.schema]] and
    * the same cleaning semantics as the JSONL path. */
  def readDocuments(s: SparkSession, path: String): DataFrame =
    s.read.schema(JsonDocs.schema)
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
      .where(col("doc_id").isNotNull && col("text").isNotNull &&
        length(col("text")) > 0)
      .select(col("doc_id"),
        regexp_replace(trim(col("text")), " +", " ").as("text"),
        lower(col("lang")).as("lang"),
        col("source"), col("n_chars"))

  /** CSV sink: header + RFC-4180 quoting (escape = double-quote) so
    * the read side round-trips exactly. */
  def writeDocuments(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
}

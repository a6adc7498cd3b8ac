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
  * Scale design: CSV without embedded literal newlines is splittable
  * like JSONL; with `multiLine` quoting it is not. Spark's
  * line-based CSV reader cannot parse a quoted field containing a
  * raw newline, so the sink TRANSLATES newlines to the C0 control
  * separators (LF→U+001E record-sep, CR→U+001F unit-sep — characters
  * that never occur in document text) and the reader translates them
  * back: lossless round-trip AND splittable files. For CSVs produced
  * by OTHER writers that quote raw newlines (RFC 4180), pass
  * `multiLine = true` — correctness over splittability for foreign
  * corpora.
  */
object CsvDocs {

  /** Read CSV documents with the enforced [[JsonDocs.schema]] and
    * the same cleaning semantics as the JSONL path. Restores the
    * sink's control-separator newline encoding before cleaning.
    *
    * @param multiLine parse RFC-4180 quoted raw newlines (needed for
    *   externally-written CSVs only; files stop being splittable).
    */
  def readDocuments(s: SparkSession, path: String,
      multiLine: Boolean = false): DataFrame =
    s.read.schema(JsonDocs.schema)
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", multiLine.toString)
      .csv(path)
      .where(col("doc_id").isNotNull && col("text").isNotNull &&
        length(col("text")) > 0)
      .select(col("doc_id"),
        regexp_replace(trim(translate(col("text"), "\u001E\u001F", "\n\r")),
          " +", " ").as("text"),
        lower(col("lang")).as("lang"),
        col("source"), col("n_chars"))

  /** CSV sink: header + RFC-4180 quoting (escape = double-quote),
    * newlines translated to C0 separators so files stay splittable
    * and the read side round-trips exactly (a char-to-char
    * `translate` both ways — no escape-sequence ambiguity). */
  def writeDocuments(df: DataFrame, path: String): Unit =
    df.withColumn("text", translate(col("text"), "\n\r", "\u001E\u001F"))
      .write.mode("overwrite")
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
}

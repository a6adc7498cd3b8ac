package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON document source/sink — the reference ingests card JSON
  * (reference: cardsCleaning/cleanCardJson.py over AtomicCards.json,
  * db/ingest_cards.py:14-70), cleaning and projecting it into the
  * document schema before embedding. This module is that ingest
  * path for the graft document schema: schema-enforced JSONL read
  * (no inference scan — at 100 TB schema inference is a full extra
  * pass), cleaning normalization, and a JSONL sink for interchange.
  *
  * Scale design: JSONL is splittable, so the read parallelizes per
  * split like parquet (minus column pruning — the cleaning step
  * projects immediately to keep downstream plans narrow).
  */
object JsonDocs {

  /** The document schema, enforced at read (corrupt records null out
    * rather than failing the batch — PERMISSIVE, the ingest-pipeline
    * default). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Read JSONL documents with the enforced schema and the
    * reference's cleaning semantics: trim + whitespace-collapse the
    * text, lowercase the lang tag, drop records with no id or no
    * text (cleanCardJson.py drops cards without oracle text). */
  def readDocuments(s: SparkSession, path: String): DataFrame =
    s.read.schema(schema).json(path)
      .where(col("doc_id").isNotNull && col("text").isNotNull &&
        length(col("text")) > 0)
      .select(col("doc_id"),
        regexp_replace(trim(col("text")), " +", " ").as("text"),
        lower(col("lang")).as("lang"),
        col("source"), col("n_chars"))

  /** JSONL sink (one JSON object per line, splittable interchange). */
  def writeDocuments(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORC document source/sink — columnar interchange sibling of
  * [[JsonDocs]]/[[CsvDocs]] (same enforced schema and cleaning
  * contract; ORC brings parquet-class column pruning and predicate
  * pushdown for corpora delivered from Hive-lineage systems). */
object OrcDocs {

  def readDocuments(s: SparkSession, path: String): DataFrame =
    s.read.schema(JsonDocs.schema).orc(path)
      .where(col("doc_id").isNotNull && col("text").isNotNull &&
        length(col("text")) > 0)
      .select(col("doc_id"),
        regexp_replace(trim(col("text")), " +", " ").as("text"),
        lower(col("lang")).as("lang"),
        col("source"), col("n_chars"))

  def writeDocuments(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Ingestion / text-prep pipeline — the reference's entire write
  * path, re-expressed as Spark transforms: embedding-text
  * construction (reference: db/ingest_cards.py:97-108
  * create_card_embedding_text — concatenate name/type/text fields,
  * strip markup), ingest-time duplicate collapse by content id
  * (reference: db/ingest_cards.py:95-105 scryfallOracleId upsert
  * key), and corpus statistics (reference: db/query_example.py:142-171
  * "database statistics").
  *
  * Scale design: embed-text is a map-only projection; the dedup
  * collapse is a hash-agg on a uniformly distributed md5 key (no
  * skew); stats aggregate on the bounded source key with map-side
  * combine. No joins, no windows.
  */
object Ingest extends graft.QueryGroup {

  /** Normalized content: lowercase, strip non-alnum "markup",
    * collapse whitespace — the cleanCardJson.py semantics. */
  private def normText(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Embedding-text construction: `name | lang | normalized body`
    * truncated to a fixed prefix — the shape the reference feeds its
    * embedding model. */
  def embedText(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat_ws(" | ", docName(col("text")), col("lang"),
          substring(normText(col("text")), 1, 120)).as("embed_text"))
      .select(col("doc_id"), col("embed_text"),
        length(col("embed_text")).as("embed_len"))
      .orderBy(col("doc_id").asc)

  /** Ingest-time duplicate collapse: group by content id (md5 of the
    * normalized text = the oracle_id role), keep the lowest doc_id as
    * canonical winner, count collapsed copies. */
  def ingestDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(md5(normText(col("text"))).as("content_id"), col("doc_id"))
      .groupBy(col("content_id"))
      .agg(min(col("doc_id")).as("canonical_doc"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("content_id").asc)

  /** Per-source corpus statistics: doc count, distinct languages,
    * char totals/extremes — query_example.py's "database statistics"
    * panel as one aggregation. */
  def docStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
          .as("avg_chars"))
      .orderBy(col("source").asc)

  /** Keyed MERGE/upsert — the reference's batch write path
    * (db/ingest_cards.py:120-152 `ON CONFLICT (oracle_id) DO
    * UPDATE`, db/init.sql:88-116 upsert functions) as one relational
    * pass: full-outer-join the current snapshot with an incoming
    * batch on the key, classify every key as insert (batch-only) /
    * update (both, content differs) / unchanged (both, identical) /
    * carryover (snapshot-only), and emit the labeled new snapshot —
    * the shape every incremental corpus refresh runs.
    *
    * The demo snapshot/batch derive deterministically from
    * `documents` so the oracle can replicate them: snapshot = ids
    * not divisible by 10, batch = ids divisible by 3 with revised
    * text for ids divisible by 6 — all four classes populated.
    *
    * Scale: ONE shuffle of each side on the uniformly distributed
    * key (no skew), map-side md5, no windows. At 100 TB the
    * snapshot is stored bucketed by key, which turns this into a
    * storage-partitioned join that shuffles only the (much smaller)
    * batch; the classification itself is unchanged. */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val snap = docs.where(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("h_old"))
    val batch = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 6 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("h_new"))
    snap.join(batch, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, lit("insert"))
          .when(col("h_new").isNull, lit("carryover"))
          .when(col("h_old") =!= col("h_new"), lit("update"))
          .otherwise(lit("unchanged")).as("action"),
        coalesce(col("h_new"), col("h_old")).as("content_hash"))
      .orderBy(col("doc_id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_text" -> ((s, d) => embedText(s, d)),
    "q_ingest_dedup" -> ((s, d) => ingestDedup(s, d)),
    "q_doc_stats" -> ((s, d) => docStats(s, d)),
    "q_merge_upsert" -> ((s, d) => mergeUpsert(s, d)),
  )

  private val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      | ' +', ' ', 'g'))""".stripMargin.replace("\n", "")

  val oracles: Map[String, String] = Map(
    "q_embed_text" ->
      s"""WITH e AS (
         |  SELECT doc_id,
         |         lower(substr(text, 1, 24)) || ' | ' || lang || ' | ' ||
         |           substr($normSql, 1, 120) AS embed_text
         |  FROM documents)
         |SELECT doc_id, embed_text, len(embed_text) AS embed_len
         |FROM e ORDER BY doc_id ASC""".stripMargin,
    "q_ingest_dedup" ->
      s"""SELECT md5($normSql) AS content_id,
         |       min(doc_id) AS canonical_doc,
         |       count(*) AS n_copies
         |FROM documents GROUP BY content_id
         |ORDER BY content_id ASC""".stripMargin,
    "q_merge_upsert" ->
      """WITH snap AS (
        |  SELECT doc_id, md5(text) AS h_old FROM documents
        |  WHERE doc_id % 10 <> 0),
        |batch AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 6 = 0 THEN text || ' v2'
        |                  ELSE text END) AS h_new
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT coalesce(s.doc_id, b.doc_id) AS doc_id,
        |       CASE WHEN s.doc_id IS NULL THEN 'insert'
        |            WHEN b.doc_id IS NULL THEN 'carryover'
        |            WHEN s.h_old <> b.h_new THEN 'update'
        |            ELSE 'unchanged' END AS action,
        |       coalesce(b.h_new, s.h_old) AS content_hash
        |FROM snap s FULL OUTER JOIN batch b ON s.doc_id = b.doc_id
        |ORDER BY doc_id ASC""".stripMargin,
    "q_doc_stats" ->
      """SELECT source, count(*) AS n_docs,
        |       count(DISTINCT lang) AS n_langs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       min(n_chars) AS min_chars,
        |       max(n_chars) AS max_chars,
        |       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
        |FROM documents GROUP BY source ORDER BY source ASC""".stripMargin,
  )
}

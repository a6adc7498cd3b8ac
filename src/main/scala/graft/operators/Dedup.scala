package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication suite over the documents/embeddings corpus — the
  * LLM-data-pipeline operators (exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, embedding-cosine near-dup). The reference deduplicates at
  * ingest by oracle id (reference: db/ingest_cards.py:95-105
  * scryfallOracleId); this generalizes that to content-level and
  * near-duplicate detection.
  *
  * Scale design (100 TB):
  * - Exact/fingerprints: map-side partial agg on uniformly
  *   distributed hash keys — no skew, one shuffle of (hash, 1).
  * - MinHash+LSH: only (band_id, band_hash, doc_id) tuples shuffle —
  *   O(docs × bands) small rows, never O(n²) pairs; candidate pairs
  *   come from equi-joining band buckets, then an exact Jaccard
  *   verify touches only candidates.
  * - SimHash: signature build is two narrow aggregations; the pair
  *   join is blocked (here by source — in production by simhash
  *   prefix bands) so the join key bounds the blow-up.
  * - Embedding near-dup: blocked by label (= coarse IVF cell), the
  *   same blocking a 100 TB deployment gets from its coarse
  *   quantizer; within-block pairs only.
  *
  * All hashing is md5 (identical in Spark and DuckDB) so every
  * operator here is fully oracle-checkable; the production-scale
  * variant would swap xxhash64 for md5 with no structural change.
  */
object Dedup extends graft.QueryGroup {

  val NumHashes = 16
  val NumBands = 8 // rows-per-band r = 2

  /** Exact dedup stats per source: docs, distinct contents, dupes
    * (hash-groupBy; at 100 TB identical plan, keys never skew). */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), md5(col("text")).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_dupes"))
      .orderBy(col("source").asc)

  /** (doc_id, h0..h15) MinHash signature over distinct unigram
    * tokens: h_i = min over tokens of md5(i ':' token). Built as 16
    * parallel min-aggregates over the exploded token set — one
    * shuffle on doc_id, no nested lambdas, map-side combine. */
  private def minhashSignature(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(tokenSet(col("text"))).as("token"))
    val aggs = (0 until NumHashes).map(i =>
      min(md5(concat_ws(":", lit(i), col("token")))).as(s"h$i"))
    toks.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH near-dup: band-bucket join → candidate pairs →
    * exact Jaccard verify → top-20 most similar pairs. */
  def minhashLsh(s: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    val sig = minhashSignature(s, dir)
    val bandCols = (0 until NumBands).map { b =>
      struct(lit(b).as("bi"),
        md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))).as("bh"))
    }
    val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.bi").as("bi"), col("band.bh").as("bh"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("did_a"), col("b.doc_id").as("did_b"))
      .distinct()
    val docSets = Tables.documents(s, dir)
      .select(col("doc_id"), tokenSet(col("text")).as("ts"))
    val verified = cand
      .join(docSets.withColumnRenamed("doc_id", "did_a")
        .withColumnRenamed("ts", "ts_a"), Seq("did_a"))
      .join(docSets.withColumnRenamed("doc_id", "did_b")
        .withColumnRenamed("ts", "ts_b"), Seq("did_b"))
      .select(col("did_a"), col("did_b"),
        jaccard(col("ts_a"), col("ts_b")).as("jac"))
    verified.orderBy(col("jac").desc, col("did_a").asc, col("did_b").asc)
      .limit(topN)
      .select(col("did_a"), col("did_b"), round(col("jac"), 6).as("jac"))
  }

  /** 32-bit SimHash from md5 hex-char parity: bit p of token t =
    * ascii(md5(t)[p]) % 2; doc bit = majority vote over distinct
    * tokens. */
  private def simhash(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        explode(tokenSet(col("text"))).as("token"))
    val bits = toks
      .select(col("doc_id"), col("source"), md5(col("token")).as("th"),
        explode(sequence(lit(0), lit(31))).as("p"))
      .select(col("doc_id"), col("source"), col("p"),
        (ascii(col("th").substr(col("p") + 1, lit(1))) % 2 * 2 - 1).as("w"))
    bits.groupBy(col("doc_id"), col("source"), col("p"))
      .agg(sum(col("w")).as("sw"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(when(col("sw") > 0,
        pow(lit(2.0d), col("p")).cast("long")).otherwise(lit(0L)))
        .as("simhash"))
  }

  /** SimHash near-dup pairs: source-blocked join, Hamming ≤ 10,
    * nearest 50 pairs. */
  def simhashPairs(s: SparkSession, dir: String, maxHamming: Int = 10,
      topN: Int = 50): DataFrame = {
    val sh = simhash(s, dir)
    sh.as("a").join(sh.as("b"),
        col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.source").as("source"),
        col("a.doc_id").as("did_a"), col("b.doc_id").as("did_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .orderBy(col("hamming").asc, col("did_a").asc, col("did_b").asc)
      .limit(topN)
  }

  /** Word-bigram Jaccard near-dup, source-blocked, top-30 pairs. */
  def ngramJaccard(s: SparkSession, dir: String, topN: Int = 30): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        wordShingles(col("text"), 2).as("sh"))
    docs.as("a").join(docs.as("b"),
        col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("did_a"), col("b.doc_id").as("did_b"),
        jaccard(col("a.sh"), col("b.sh")).as("jac"))
      .orderBy(col("jac").desc, col("did_a").asc, col("did_b").asc)
      .limit(topN)
      .select(col("did_a"), col("did_b"), round(col("jac"), 6).as("jac"))
  }

  /** Embedding-cosine near-dup: label-blocked (coarse-quantizer
    * cell), 50 closest pairs. */
  def embeddingNearDup(s: SparkSession, dir: String, topN: Int = 50): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.label").as("label"),
        col("a.vec_id").as("vid_a"), col("b.vec_id").as("vid_b"),
        cosineSim(col("a.embedding"), col("b.embedding")).as("sim"))
      .orderBy(col("sim").desc, col("vid_a").asc, col("vid_b").asc)
      .limit(topN)
      .select(col("label"), col("vid_a"), col("vid_b"),
        round(col("sim"), 6).as("sim"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, d) => exactDedup(s, d)),
    "q_dedup_minhash" -> ((s, d) => minhashLsh(s, d)),
    "q_dedup_simhash" -> ((s, d) => simhashPairs(s, d)),
    "q_dedup_ngram_jaccard" -> ((s, d) => ngramJaccard(s, d)),
    "q_dedup_embedding" -> ((s, d) => embeddingNearDup(s, d)),
  )

  private val sigSelect = (0 until NumHashes).map(i =>
    s"min(md5('$i:' || token)) AS h$i").mkString(", ")
  private val bandsUnion = (0 until NumBands).map(b =>
    s"SELECT doc_id, $b AS bi, md5(h${2 * b} || h${2 * b + 1}) AS bh FROM sig")
    .mkString(" UNION ALL ")

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT source, count(*) AS n_docs,
        |       count(DISTINCT md5(text)) AS n_distinct,
        |       count(*) - count(DISTINCT md5(text)) AS n_dupes
        |FROM documents GROUP BY source ORDER BY source ASC""".stripMargin,
    "q_dedup_minhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_distinct(str_split(text, ' '))) AS token
         |  FROM documents),
         |sig AS (SELECT doc_id, $sigSelect FROM toks GROUP BY doc_id),
         |bands AS ($bandsUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS did_a, b.doc_id AS did_b
         |         FROM bands a JOIN bands b
         |           ON a.bi = b.bi AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |sets AS (SELECT doc_id, list_distinct(str_split(text, ' ')) AS ts
         |         FROM documents),
         |v AS (SELECT c.did_a, c.did_b,
         |             CASE WHEN len(list_distinct(sa.ts || sb.ts)) = 0 THEN 0.0
         |                  ELSE len(list_intersect(sa.ts, sb.ts))
         |                       / len(list_distinct(sa.ts || sb.ts)) END AS jac
         |      FROM cand c JOIN sets sa ON c.did_a = sa.doc_id
         |                  JOIN sets sb ON c.did_b = sb.doc_id)
         |SELECT did_a, did_b, round(jac, 6) AS jac FROM v
         |ORDER BY jac DESC, did_a ASC, did_b ASC LIMIT 20""".stripMargin,
    "q_dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |         unnest(list_distinct(str_split(text, ' '))) AS token
        |  FROM documents),
        |bits AS (
        |  SELECT doc_id, source, p,
        |         (ascii(substr(md5(token), p + 1, 1)) % 2) * 2 - 1 AS w
        |  FROM toks, (SELECT unnest(generate_series(0, 31)) AS p)),
        |pos AS (SELECT doc_id, source, p, sum(w) AS sw
        |        FROM bits GROUP BY doc_id, source, p),
        |sh AS (SELECT doc_id, source,
        |              CAST(sum(CASE WHEN sw > 0
        |                       THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |       FROM pos GROUP BY doc_id, source),
        |pairs AS (SELECT a.source AS source, a.doc_id AS did_a,
        |                 b.doc_id AS did_b,
        |                 bit_count(xor(a.simhash, b.simhash)) AS hamming
        |          FROM sh a JOIN sh b
        |            ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT source, did_a, did_b, hamming FROM pairs
        |WHERE hamming <= 10
        |ORDER BY hamming ASC, did_a ASC, did_b ASC LIMIT 50""".stripMargin,
    "q_dedup_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, source, str_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, source,
        |  CASE WHEN len(t) < 2 THEN []
        |       ELSE list_distinct([t[i] || ' ' || t[i + 1]
        |                           for i in generate_series(1, len(t) - 1)])
        |  END AS sh FROM d),
        |pairs AS (SELECT a.doc_id AS did_a, b.doc_id AS did_b,
        |  CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 0.0
        |       ELSE len(list_intersect(a.sh, b.sh))
        |            / len(list_distinct(a.sh || b.sh)) END AS jac
        |  FROM sh a JOIN sh b
        |    ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT did_a, did_b, round(jac, 6) AS jac FROM pairs
        |ORDER BY jac DESC, did_a ASC, did_b ASC LIMIT 30""".stripMargin,
    "q_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |           FROM embeddings),
        |pairs AS (SELECT a.label AS label, a.vec_id AS vid_a,
        |                 b.vec_id AS vid_b,
        |                 list_cosine_similarity(a.v, b.v) AS sim
        |          FROM e a JOIN e b
        |            ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT label, vid_a, vid_b, round(sim, 6) AS sim FROM pairs
        |ORDER BY sim DESC, vid_a ASC, vid_b ASC LIMIT 50""".stripMargin,
  )
}

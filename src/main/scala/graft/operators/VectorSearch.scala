package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._

/** Similarity search over the embeddings table — the Spark-first
  * re-expression of the reference's pgvector search functions
  * (reference: db/init.sql:162-254 `search_similar_cards/rules/
  * glossary`; db/search_strategies.py:126-238).
  *
  * Scale design (100 TB): the query side is always tiny (one vector
  * or a small batch) and is `broadcast()`; the corpus side is a
  * map-only scan — similarity is computed partition-locally and only
  * top-k survivors per partition reach the final ordering, so no
  * corpus shuffle ever happens. Top-k uses `orderBy().limit(k)`,
  * which Spark executes as TakeOrderedAndProject (partition-local
  * heap + driver merge of k×P rows), exactly the partial-top-k
  * pattern we want at 1000 executors.
  */
object VectorSearch extends graft.QueryGroup {

  /** The broadcast single-row query-vector side, keyed off a corpus
    * row (no collect — the "query literal" stays a plan node). */
  private def queryVec(s: SparkSession, dir: String, id: Long): DataFrame =
    Tables.embeddings(s, dir).where(col("vec_id") === id)
      .select(col("embedding").as("qvec"))

  /** search_similar_* semantics: cosine top-k for one query vector,
    * deterministic vec_id tiebreak. Selection orders by the
    * unrounded similarity; output rounds to 6 decimals for
    * cross-engine hash parity. */
  def topK(s: SparkSession, dir: String, id: Long = 0L, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
    e.where(col("vec_id") =!= id)
      .crossJoin(broadcast(queryVec(s, dir, id)))
      .select(col("vec_id"), cosineSim(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), round(col("sim"), 6).as("sim"))
  }

  /** Threshold + top-k, the exact contract of search_similar_cards
    * (reference: db/init.sql:162-186: `WHERE 1 - (e.embedding <=> q)
    * > match_threshold ORDER BY distance LIMIT match_count`). */
  def topKThreshold(s: SparkSession, dir: String, id: Long = 0L,
      threshold: Double = 0.3, k: Int = 20): DataFrame = {
    val e = Tables.embeddings(s, dir)
    e.where(col("vec_id") =!= id)
      .crossJoin(broadcast(queryVec(s, dir, id)))
      .select(col("vec_id"), col("label"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
      .where(col("sim") > threshold)
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("label"), round(col("sim"), 6).as("sim"))
  }

  /** Batch kNN join: top-k corpus neighbors for EACH query vector.
    * Query batch (vec_id < nq) is broadcast; ranking uses the bounded
    * [[graft.plans.TopKByScore]] aggregate, which reduces
    * partition-locally (each task ships ≤ k pairs per qid), so only
    * O(k × partitions) tiny rows shuffle — never the full scored
    * corpus. A `Window.partitionBy(qid)` plan would funnel every
    * scored row onto ≤ nq reducers: catastrophic at 100 TB. */
  def knnJoin(s: SparkSession, dir: String, nq: Long = 10L, k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val queries = e.where(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = e.where(col("vec_id") >= nq)
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col("qid"), col("vec_id"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
    scored.groupBy(col("qid"))
      .agg(graft.plans.TopKByScore(col("sim"), col("vec_id"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col.id").as("vec_id"),
        round(col("col.score"), 6).as("sim"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("qid").asc, col("rnk").asc)
  }

  /** Grouped search: top-k per label for one query vector (the
    * "search within each collection" shape of the reference's three
    * per-table search functions, fused into one pass). */
  def topKPerLabel(s: SparkSession, dir: String, id: Long = 0L, k: Int = 3): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val scored = e.where(col("vec_id") =!= id)
      .crossJoin(broadcast(queryVec(s, dir, id)))
      .select(col("label"), col("vec_id"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
    scored.groupBy(col("label"))
      .agg(graft.plans.TopKByScore(col("sim"), col("vec_id"), k).as("tk"))
      .select(col("label"), posexplode(col("tk")))
      .select(col("label"), col("col.id").as("vec_id"),
        round(col("col.score"), 6).as("sim"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("label").asc, col("rnk").asc)
  }

  /** Vector-math sanity distributions per label: map-side partial
    * aggregation only (hash agg on 10 keys). The mean is accumulated
    * in fixed-point micro-units (long) so the sum is exact and
    * order-independent — a raw double `avg` depends on Spark's
    * nondeterministic partial-aggregation order and can flip the
    * 6-decimal rounding at a boundary vs the oracle's sequential
    * fold. min/max are order-independent already. */
  def pairStats(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    e.select(col("label"), normBuiltin(col("embedding")).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("nrm") * 1e6).cast("long")).as("sf"),
        round(min(col("nrm")), 6).as("min_norm"),
        round(max(col("nrm")), 6).as("max_norm"))
      .select(col("label"), col("n"),
        round(col("sf").cast("double") / col("n") / 1e6, 6).as("avg_norm"),
        col("min_norm"), col("max_norm"))
      .orderBy(col("label").asc)
  }

  /** Filtered vector search: metadata predicate (label equality — the
    * reference README's "colors @> …" + vector search combination)
    * applied BEFORE scoring, so the filter reaches the parquet scan
    * and the cosine loop runs only on survivors ("filtered ANN" done
    * the pre-filter way; at 100 TB the label would also be a
    * partition key → pruned read). */
  def topKFiltered(s: SparkSession, dir: String, id: Long = 0L,
      label: Int = 3, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
    e.where(col("vec_id") =!= id && col("label") === label)
      .crossJoin(broadcast(queryVec(s, dir, id)))
      .select(col("vec_id"), col("label"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("label"), round(col("sim"), 6).as("sim"))
  }

  /** Search returning DOCUMENT fields — the reference's actual output
    * shape (init.sql search functions join mtg_*_embeddings back to
    * the document table and return name/text + similarity). Top-k
    * cut happens BEFORE the join, so only k rows join against the
    * documents table (broadcast of the tiny candidate list). */
  def topKWithDocs(s: SparkSession, dir: String, id: Long = 0L,
      k: Int = 10): DataFrame = {
    val hits = topK(s, dir, id, k) // (vec_id, sim), already rounded
    Tables.documents(s, dir)
      .join(broadcast(hits), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        col("sim"))
      .orderBy(col("sim").desc, col("doc_id").asc)
  }

  /** Per-label centroid (prototype) vectors: exact fixed-point
    * elementwise means via the bounded
    * [[graft.plans.ElementwiseSum]] aggregate — ONE narrow shuffle of
    * (label, long[64]) rows regardless of corpus size (the
    * class-prototype construction behind centroid classifiers and
    * cluster summaries). Output: per label the member count, the
    * centroid norm, and its first two coordinates. */
  def labelCentroids(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.{microInts, microMean, normBuiltin}
    Tables.embeddings(s, dir)
      .select(col("label"), microInts(col("embedding")).as("mi"))
      .groupBy(col("label"))
      .agg(graft.plans.ElementwiseSum(col("mi"), 64).as("ms"),
        count(lit(1)).as("n"))
      .select(col("label"), col("n"), microMean(col("ms"), col("n")).as("cv"))
      .select(col("label"), col("n"),
        round(normBuiltin(col("cv")), 6).as("norm"),
        round(element_at(col("cv"), 1), 6).as("c0"),
        round(element_at(col("cv"), 2), 6).as("c1"))
      .orderBy(col("label").asc)
  }

  private val RrfK = 60
  private val MultiK = 10
  private[graft] val MrlDim = 32

  /** Multi-embedding-space search — the reference stores TWO
    * embedding spaces per card (`mtg_card_embeddings` next to
    * `mtg_card_nl_embeddings`, reference: db/init.sql:59-75) and
    * searches either. Space A is the full 64-dim embedding; space B
    * is its 32-dim Matryoshka prefix (MRL truncation — the standard
    * way one stored vector yields a second, cheaper search space).
    * Top-k per space, then reciprocal-rank fusion of the two ≤k-row
    * lists (rank arithmetic over integers — exact cross-engine).
    * Scale: each space's search is the same map-only scan +
    * TakeOrdered as topK; fusion touches 2k rows. */
  def multiSpace(s: SparkSession, dir: String, id: Long = 0L,
      k: Int = MultiK): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val scored = e.where(col("vec_id") =!= id)
      .crossJoin(broadcast(queryVec(s, dir, id)))
    def ranked(space: Column => Column, tag: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("sim").desc, col("vec_id").asc)
      scored
        .select(col("vec_id"),
          cosineSim(space(col("embedding")), space(col("qvec"))).as("sim"))
        .orderBy(col("sim").desc, col("vec_id").asc).limit(k)
        .withColumn(s"rank_$tag", row_number().over(w))
        .select(col("vec_id"), col(s"rank_$tag"),
          round(col("sim"), 6).as(s"sim_$tag"))
    }
    val a = ranked(identity, "full")
    val b = ranked(c => slice(c, 1, MrlDim), "mrl")
    def rr(rank: Column): Column =
      coalesce(lit(1.0d) / (lit(RrfK) + rank), lit(0.0d))
    // Fuse via union + one tiny hash-agg, not a full-outer join —
    // Spark cannot broadcast a FullOuter build side, so the join
    // formulation would shuffle-sort both lists (same reasoning as
    // hybrid's fusion; the agg touches ≤ 2k rows).
    val u = a
      .select(col("vec_id"), col("rank_full").as("rk"),
        col("sim_full").as("sm"), lit("full").as("m"))
      .unionAll(b.select(col("vec_id"), col("rank_mrl"),
        col("sim_mrl"), lit("mrl")))
    u.groupBy(col("vec_id"))
      .agg(min(when(col("m") === "full", col("rk"))).as("rank_full"),
        min(when(col("m") === "full", col("sm"))).as("sim_full"),
        min(when(col("m") === "mrl", col("rk"))).as("rank_mrl"),
        min(when(col("m") === "mrl", col("sm"))).as("sim_mrl"))
      .select(col("vec_id"), col("rank_full"), col("sim_full"),
        col("rank_mrl"), col("sim_mrl"),
        round(rr(col("rank_full")) + rr(col("rank_mrl")), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("vec_id").asc)
  }

  private val ExpandHits = 5
  private val ExpandRefs = 3

  /** Cross-reference expansion — the reference's `related_rules` /
    * `related_faces` arrays (reference: db/init.sql:38,134, populated
    * by db/ingest_glossary.py, surfaced by the formatters at
    * db/search_strategies.py:482-495): every search hit is expanded
    * with the documents it references. The testdata carries no FK
    * array, so each doc's references are derived from its CONTENT —
    * its first [[ExpandRefs]] sorted distinct tokens, each hashed
    * into the doc-id space (deterministic on both engines). The plan
    * is the reference's shape regardless: explode the hit's ref
    * array, equi-join the documents table. Scale: hits ≤ k, refs
    * ≤ k×3 — the expansion side broadcasts; the documents side is a
    * pushed-down equi-join probe. */
  def relatedExpand(s: SparkSession, dir: String, id: Long = 0L,
      k: Int = ExpandHits): DataFrame = {
    import graft.functions.MinHash
    import graft.functions.TextFunctions.tokenSet
    val hits = topK(s, dir, id, k) // (vec_id, sim), rounded
    val nd = Tables.documents(s, dir).agg(count(lit(1)).as("nd"))
    val refs = Tables.documents(s, dir)
      .join(broadcast(hits), col("doc_id") === col("vec_id"))
      .select(col("vec_id").as("hit_id"), col("sim"),
        explode(slice(sort_array(tokenSet(col("text"))), 1, ExpandRefs))
          .as("tok"))
      .crossJoin(broadcast(nd))
      .select(col("hit_id"), col("sim"), col("tok"),
        pmod(MinHash.hash60(concat(lit("rel:"), col("tok"))), col("nd"))
          .as("ref_id"))
    Tables.documents(s, dir)
      .join(broadcast(refs), col("doc_id") === col("ref_id"))
      .select(col("hit_id"), col("sim"), col("tok"), col("ref_id"),
        col("source").as("ref_source"), col("n_chars").as("ref_chars"))
      .orderBy(col("hit_id").asc, col("tok").asc)
  }

  /** q_vec_dim_audit — per-DIMENSION embedding-space health audit:
    * count / sum / variance / range of every coordinate, the
    * collapse detector run before any index build (a dead dimension
    * — variance ≈ 0 — means the encoder collapsed; a runaway range
    * means bad normalization upstream; both silently degrade every
    * cosine downstream). Components are fixed-pointed to micro-units
    * per ROW (map-only, deterministic — a raw float sum would depend
    * on Spark's partial-agg order), then all statistics are integer
    * arithmetic: variance in micro² via (n·Σm² − (Σm)²) / n², the
    * squares riding DECIMAL(38,0)/HUGEINT (n·Σm² overflows BIGINT
    * already at sf0.1).
    *
    * Scale: one posexplode (two longs per element, no payload) and
    * one hash-agg on the ≤dims key — map-side combine collapses
    * everything before the shuffle; output is |dims| rows. */
  def dimAudit(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        round(col("v").cast("double") * 1e6).cast("long").as("m"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("m")).as("sum_micro"),
        sum(expr("CAST(m AS DECIMAL(38,0)) * m")).as("ssq"),
        min(col("m")).as("min_micro"), max(col("m")).as("max_micro"))
      .selectExpr("dim", "n_vecs", "sum_micro",
        """CAST((CAST(n_vecs AS DECIMAL(38,0)) * ssq
                 - CAST(sum_micro AS DECIMAL(38,0)) * sum_micro)
                div (CAST(n_vecs AS DECIMAL(38,0)) * n_vecs)
           AS BIGINT) AS var_micro2""",
        "min_micro", "max_micro")
      .orderBy(col("dim").asc)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_vec_dim_audit" -> ((s, d) => dimAudit(s, d)),
    "q_vec_multispace" -> ((s, d) => multiSpace(s, d)),
    "q_related_expand" -> ((s, d) => relatedExpand(s, d)),
    "q_vec_centroids" -> ((s, d) => labelCentroids(s, d)),
    "q_vec_topk" -> ((s, d) => topK(s, d)),
    "q_vec_topk_threshold" -> ((s, d) => topKThreshold(s, d)),
    "q_vec_knn_join" -> ((s, d) => knnJoin(s, d)),
    "q_vec_topk_per_label" -> ((s, d) => topKPerLabel(s, d)),
    "q_vec_pair_stats" -> ((s, d) => pairStats(s, d)),
    "q_vec_filtered" -> ((s, d) => topKFiltered(s, d)),
    "q_vec_doc_join" -> ((s, d) => topKWithDocs(s, d)),
  )

  // DuckDB oracle parity notes: embeddings cast to DOUBLE[] so the
  // similarity is the same sequential double fold as cosineSim;
  // scores rounded to 6 decimals on both sides; every ordering has a
  // unique tiebreak.
  private val cosExpr =
    "list_cosine_similarity(e.embedding::DOUBLE[], q.qv)"

  val oracles: Map[String, String] = Map(
    "q_vec_dim_audit" ->
      """WITH t AS (SELECT embedding::DOUBLE[] AS e FROM embeddings),
        |dims AS (SELECT unnest(generate_series(1,
        |           (SELECT max(len(e)) FROM t))) AS i),
        |x AS (SELECT i - 1 AS dim,
        |             CAST(round(e[i] * 1000000) AS BIGINT) AS m
        |      FROM t, dims WHERE i <= len(e)),
        |a AS (SELECT dim, count(*) AS n_vecs,
        |             CAST(sum(m) AS BIGINT) AS sum_micro,
        |             sum(m::HUGEINT * m) AS ssq,
        |             min(m) AS min_micro, max(m) AS max_micro
        |      FROM x GROUP BY dim)
        |SELECT dim, n_vecs, sum_micro,
        |       CAST((n_vecs::HUGEINT * ssq
        |              - sum_micro::HUGEINT * sum_micro)
        |            // (n_vecs::HUGEINT * n_vecs) AS BIGINT) AS var_micro2,
        |       min_micro, max_micro
        |FROM a ORDER BY dim ASC""".stripMargin,
    "q_vec_multispace" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |sa AS (SELECT e.vec_id, $cosExpr AS sim
         |       FROM embeddings e, q WHERE e.vec_id <> 0
         |       ORDER BY sim DESC, vec_id ASC LIMIT $MultiK),
         |ra AS (SELECT vec_id,
         |              CAST(row_number() OVER (ORDER BY sim DESC, vec_id ASC)
         |                AS INTEGER) AS rank_full,
         |              round(sim, 6) AS sim_full FROM sa),
         |sb AS (SELECT e.vec_id,
         |              list_cosine_similarity((e.embedding::DOUBLE[])[1:$MrlDim],
         |                                     q.qv[1:$MrlDim]) AS sim
         |       FROM embeddings e, q WHERE e.vec_id <> 0
         |       ORDER BY sim DESC, vec_id ASC LIMIT $MultiK),
         |rb AS (SELECT vec_id,
         |              CAST(row_number() OVER (ORDER BY sim DESC, vec_id ASC)
         |                AS INTEGER) AS rank_mrl,
         |              round(sim, 6) AS sim_mrl FROM sb)
         |SELECT coalesce(ra.vec_id, rb.vec_id) AS vec_id,
         |       rank_full, sim_full, rank_mrl, sim_mrl,
         |       round(coalesce(CAST(1 AS DOUBLE) / ($RrfK + rank_full), 0) +
         |             coalesce(CAST(1 AS DOUBLE) / ($RrfK + rank_mrl), 0), 6)
         |         AS rrf
         |FROM ra FULL OUTER JOIN rb ON ra.vec_id = rb.vec_id
         |ORDER BY rrf DESC, vec_id ASC""".stripMargin,
    "q_related_expand" -> {
      val h = graft.functions.MinHash.hash60Sql("'rel:' || tok")
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |s AS (SELECT e.vec_id, round($cosExpr, 6) AS sim
         |      FROM embeddings e, q WHERE e.vec_id <> 0
         |      ORDER BY $cosExpr DESC, e.vec_id ASC LIMIT $ExpandHits),
         |nd AS (SELECT count(*) AS nd FROM documents),
         |r AS (SELECT s.vec_id AS hit_id, s.sim,
         |             unnest(list_sort(list_distinct(
         |               str_split(d.text, ' ')))[1:$ExpandRefs]) AS tok
         |      FROM s JOIN documents d ON d.doc_id = s.vec_id),
         |x AS (SELECT hit_id, sim, tok, $h % nd.nd AS ref_id FROM r, nd)
         |SELECT x.hit_id, x.sim, x.tok, x.ref_id,
         |       d.source AS ref_source, d.n_chars AS ref_chars
         |FROM x JOIN documents d ON d.doc_id = x.ref_id
         |ORDER BY x.hit_id ASC, x.tok ASC""".stripMargin
    },
    "q_vec_centroids" ->
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings),
        |d AS (SELECT label, g.i AS pos,
        |             CAST(round(v[g.i] * 1e6) AS BIGINT) AS m
        |      FROM e, generate_series(1, 64) AS g(i)),
        |c AS (SELECT label, pos, CAST(sum(m) AS DOUBLE) / count(*) / 1e6 AS c
        |      FROM d GROUP BY label, pos),
        |cv AS (SELECT label, list(c ORDER BY pos) AS cv FROM c GROUP BY label),
        |n AS (SELECT label, count(*) AS n FROM e GROUP BY label)
        |SELECT cv.label, n.n,
        |       round(sqrt(list_sum([cv.cv[i] * cv.cv[i]
        |                            for i in generate_series(1, 64)])), 6)
        |         AS norm,
        |       round(cv.cv[1], 6) AS c0, round(cv.cv[2], 6) AS c1
        |FROM cv JOIN n USING (label) ORDER BY label ASC""".stripMargin,
    "q_vec_topk" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |s AS (SELECT e.vec_id, $cosExpr AS sim
         |      FROM embeddings e, q WHERE e.vec_id <> 0)
         |SELECT vec_id, round(sim, 6) AS sim FROM s
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q_vec_topk_threshold" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |s AS (SELECT e.vec_id, e.label, $cosExpr AS sim
         |      FROM embeddings e, q WHERE e.vec_id <> 0)
         |SELECT vec_id, label, round(sim, 6) AS sim FROM s
         |WHERE sim > 0.3 ORDER BY sim DESC, vec_id ASC LIMIT 20""".stripMargin,
    "q_vec_knn_join" ->
      s"""WITH qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |            FROM embeddings WHERE vec_id < 10),
         |s AS (SELECT q.qid, e.vec_id,
         |             list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS sim
         |      FROM embeddings e, qs q WHERE e.vec_id >= 10),
         |r AS (SELECT qid, vec_id, sim,
         |             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rnk
         |      FROM s)
         |SELECT qid, vec_id, round(sim, 6) AS sim, rnk FROM r
         |WHERE rnk <= 5 ORDER BY qid ASC, rnk ASC""".stripMargin,
    "q_vec_topk_per_label" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |s AS (SELECT e.label, e.vec_id, $cosExpr AS sim
         |      FROM embeddings e, q WHERE e.vec_id <> 0),
         |r AS (SELECT label, vec_id, sim,
         |             row_number() OVER (PARTITION BY label ORDER BY sim DESC, vec_id ASC) AS rnk
         |      FROM s)
         |SELECT label, vec_id, round(sim, 6) AS sim, rnk FROM r
         |WHERE rnk <= 3 ORDER BY label ASC, rnk ASC""".stripMargin,
    "q_vec_filtered" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |s AS (SELECT e.vec_id, e.label, $cosExpr AS sim
         |      FROM embeddings e, q WHERE e.vec_id <> 0 AND e.label = 3)
         |SELECT vec_id, label, round(sim, 6) AS sim FROM s
         |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
    "q_vec_doc_join" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |s AS (SELECT e.vec_id, round($cosExpr, 6) AS sim
         |      FROM embeddings e, q WHERE e.vec_id <> 0
         |      ORDER BY $cosExpr DESC, e.vec_id ASC LIMIT 10)
         |SELECT d.doc_id, d.source, d.lang, d.n_chars, s.sim
         |FROM documents d JOIN s ON d.doc_id = s.vec_id
         |ORDER BY s.sim DESC, d.doc_id ASC""".stripMargin,
    "q_vec_pair_stats" ->
      """WITH n AS (SELECT label,
        |  sqrt(list_sum([x * x for x in embedding::DOUBLE[]])) AS nrm
        |  FROM embeddings)
        |SELECT label, count(*) AS n,
        |       round(CAST(sum(CAST(round(nrm * 1e6) AS BIGINT)) AS DOUBLE)
        |             / count(*) / 1e6, 6) AS avg_norm,
        |       round(min(nrm), 6) AS min_norm,
        |       round(max(nrm), 6) AS max_norm
        |FROM n GROUP BY label ORDER BY label ASC""".stripMargin,
  )
}

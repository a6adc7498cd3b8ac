package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Retrieve-then-rerank and multi-source fusion — the reference's
  * headline search capability (reference: db/db_utils.py:271-497
  * OllamaReranker.rerank retrieve initial_k → LLM-score → final_k;
  * db/search_with_reranker.py:249-330 search_all_sources parallel
  * cards/rules/glossary search with score fusion). The LLM scoring
  * pass is replaced by a deterministic feature blend (cosine +
  * name-trigram + stopword-density) with the same retrieve→score→cut
  * shape, so the operator is fully oracle-checkable.
  *
  * Scale design: retrieval is the scale-safe top-k path
  * (TakeOrderedAndProject over a map-only scored scan); everything
  * after the cut operates on ≤ initial_k rows, so the rerank join is
  * a broadcast of the tiny candidate set into the documents scan and
  * the fusion windows rank fixed-size lists (k rows, not the corpus).
  */
object Rerank extends graft.QueryGroup {

  /** Cosine retrieve initial_k → feature rerank → final_k.
    * rerank = 0.7·cosine + 0.2·trigram(name, query name) +
    * 0.1·stopword-density, all deterministic. */
  def rerank(s: SparkSession, dir: String, initialK: Int = 50,
      finalK: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val qvec = e.where(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val cand = e.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(qvec))
      .select(col("vec_id").as("doc_id"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
      .orderBy(col("sim").desc, col("doc_id").asc)
      .limit(initialK)
    val qname = Tables.documents(s, dir).where(col("doc_id") === 0)
      .select(docName(col("text")).as("qname"))
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), docName(col("text")).as("name"),
        tokens(col("text")).as("toks"))
    docs.join(broadcast(cand), Seq("doc_id"))
      .crossJoin(broadcast(qname))
      .select(col("doc_id"), col("sim"),
        trigramSim(col("name"), col("qname")).as("tri"),
        (size(filter(col("toks"),
          t => t.isin(TextAnalysis.StopwordSets.head._2: _*))).cast("double") /
          size(col("toks"))).as("sr"))
      .select(col("doc_id"), col("sim"), col("tri"),
        (lit(0.7d) * col("sim") + lit(0.2d) * col("tri") +
          lit(0.1d) * col("sr")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(finalK)
      .select(col("doc_id"), round(col("sim"), 6).as("sim"),
        round(col("tri"), 6).as("tri"), round(col("score"), 6).as("score"))
  }

  /** Reciprocal-rank fusion across three search modalities (vector
    * cosine, name trigram, levenshtein) — search_all_sources with RRF
    * instead of raw-score mixing. Each list is a scale-safe top-k cut
    * (TakeOrderedAndProject); the three ≤k-row lists are then UNIONED
    * with a modality tag, ranked by ONE tiny window (ascending sort
    * key = raw score for ascending modalities, negated otherwise) and
    * pivoted back to rank columns by a single ≤3k-row hash-agg — two
    * small shuffles total where a full_outer-join formulation pays
    * two un-broadcastable join shuffles. */
  def fusion(s: SparkSession, dir: String, k: Int = 20,
      finalK: Int = 10): DataFrame = {
    val rrfK = 60
    val e = Tables.embeddings(s, dir)
    val qvec = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val names = Tables.documents(s, dir)
      .select(col("doc_id"), docName(col("text")).as("name"))

    // Each list: deterministic top-k cut, tagged with its modality.
    // The cut and the shared ranking window BOTH order by the same
    // normalized ascending key sk (= s for ascending modalities, -s
    // for descending) — ordering by `s desc` in the cut but `sk asc`
    // in the window would disagree on NaN placement (Spark sorts NaN
    // greatest under both `desc` and `asc`, and -NaN is still NaN),
    // letting a NaN score enter the cut first yet rank last. With one
    // key, NaN scores deterministically sort last everywhere.
    def cut(scored: DataFrame, asc: Boolean, m: String): DataFrame =
      scored
        .select(col("doc_id"),
          (if (asc) col("s") else -col("s")).as("sk"), lit(m).as("m"))
        .orderBy(col("sk").asc, col("doc_id").asc).limit(k)
    val vec = cut(e.where(col("vec_id") =!= 0).crossJoin(broadcast(qvec))
      .select(col("vec_id").as("doc_id"),
        cosineSim(col("embedding"), col("qvec")).as("s")),
      asc = false, "vec")
    val tri = cut(names
      .select(col("doc_id"),
        trigramSim(col("name"), lit(Lexical.trigramQuery)).as("s")),
      asc = false, "tri")
    val lev = cut(names
      .select(col("doc_id"),
        levenshtein(col("name"), lit(Lexical.trigramQuery))
          .cast("double").as("s")), asc = true, "lev")

    val ranked = vec.unionAll(tri).unionAll(lev)
      .withColumn("r", row_number().over(
        Window.partitionBy(col("m"))
          .orderBy(col("sk").asc, col("doc_id").asc)))

    def rrf(r: org.apache.spark.sql.Column) =
      coalesce(lit(1.0d) / (lit(rrfK) + r), lit(0.0d))
    ranked.groupBy(col("doc_id"))
      .agg(min(when(col("m") === "vec", col("r"))).as("r_vec"),
        min(when(col("m") === "tri", col("r"))).as("r_tri"),
        min(when(col("m") === "lev", col("r"))).as("r_lev"))
      .select(col("doc_id"), col("r_vec"), col("r_tri"), col("r_lev"),
        (rrf(col("r_vec")) + rrf(col("r_tri")) + rrf(col("r_lev"))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(finalK)
      .select(col("doc_id"), col("r_vec"), col("r_tri"), col("r_lev"),
        round(col("rrf"), 6).as("rrf"))
  }

  /** MMR weights as LITERALS shared verbatim with the oracle — never
    * derive 0.3 as 1 − 0.7 (IEEE gives 0.30000000000000004 and the
    * hash compare would see it). */
  private val MmrLam = 0.7d
  private val MmrPen = 0.3d

  /** Maximal-marginal-relevance diversified top-k — the rerank tier
    * that trades pure relevance for coverage: greedily pick the
    * candidate maximizing λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), k
    * times. The corpus is touched exactly once, by the distributed
    * top-`nc` relevance scan (the same retrieve-then-rerank cut as
    * [[rerank]]); the pairwise candidate sims are computed
    * distributed too (bit-identical cosine either way). The greedy
    * selection itself then runs ON THE DRIVER over those ≤ nc rel
    * values and ≤ nc² sims: greedy MMR is inherently sequential and
    * the candidate set is driver-bounded BY CONSTRUCTION, so k−1
    * rounds of tiny Spark jobs would spend ~8 scheduler round-trips
    * per selected row on ≤ 20-row inputs (r5 bench: 1.4 s of pure
    * job scheduling — the one place driver-side compute is the
    * honest plan, not a scalability leak). Same double arithmetic
    * (0.7·rel − 0.3·pen, IEEE max) as the distributed loop it
    * replaces. The oracle is an INDEPENDENT derivation: a DuckDB
    * recursive CTE carrying the selected-id list through the
    * recursion. */
  def mmr(s: SparkSession, dir: String, k: Int = 5, nc: Int = 20)
      : DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val cand = e.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"),
        cosineSim(col("embedding"), col("qvec")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc).limit(nc)
      .transform(graft.Checkpoints.cut)
    val rel = cand.select(col("vec_id"), col("rel")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sim = cand.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(broadcast(
        cand.select(col("vec_id").as("ib"), col("embedding").as("vb"))))
      .where(col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"), cosineSim(col("va"), col("vb")).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val selected = Seq.newBuilder[(Int, Long, Double)]
    var chosen = List.empty[Long]
    var remaining = rel.keys.toSeq.sorted
    for (t <- 1 to k if remaining.nonEmpty) {
      val scored = remaining.map { id =>
        val score =
          if (chosen.isEmpty) MmrLam * rel(id)
          else MmrLam * rel(id) - MmrPen * chosen.map(c => sim((id, c))).max
        (id, score)
      }
      // Tie-break identical to orderBy(score desc, vec_id asc):
      // scored is id-ascending, so strict > keeps the smaller id.
      // Double.compare (not the > operator) reproduces Spark's total
      // order on the degenerate values too: NaN greatest (a
      // zero-magnitude embedding yields cosine 0/0), -0.0 < 0.0.
      val (bestId, bestScore) = scored.reduceLeft { (a, b) =>
        if (java.lang.Double.compare(b._2, a._2) > 0) b else a
      }
      selected += ((t, bestId, bestScore))
      chosen ::= bestId
      remaining = remaining.filterNot(_ == bestId)
    }
    import s.implicits._
    selected.result().toDF("rnk", "vec_id", "score")
      .select(col("rnk"), col("vec_id"), round(col("score"), 6).as("score"))
      .orderBy(col("rnk").asc)
  }

  /** Candidates per query in the listwise prompt and the planted
    * query count (qids 0..3 — one per protocol branch: clean
    * permutation / noisy / duplicated / no-digits fallback). */
  private[graft] val ListwiseN = 8
  private[graft] val ListwiseQ = 4L

  /** q_rerank_listwise — the reference's DEFAULT rerank mode: the
    * LISTWISE permutation protocol (db/db_utils.py:283-407 `rerank` +
    * `_get_batch_ranking`): candidates are numbered 1..n in a batch
    * prompt, the model answers free text, and the client PARSES a
    * permutation out of it — extract every integer, 0-index, drop
    * out-of-range entries, append the missing indices sorted,
    * truncate to n (duplicates survive exactly as in the reference) —
    * scoring rank r as 1 − r/n; a reply with NO digits falls back to
    * the original retrieval order at flat score 0.5. q_rerank grades
    * the pointwise scorer; this row grades that
    * parse-validate-fallback control flow. The "model reply" is a
    * deterministic stub (no model in this sandbox — the decodeStub
    * discipline): the permutation is the candidates ordered by
    * md5('lw:'||qid||':'||cand), and each planted qid decorates it
    * with one defect class (prose prefix + out-of-range tokens /
    * truncation / a duplicated entry / no digits at all), so every
    * branch of the reference's parser executes and the row grades
    * hash-exact. A deployment swaps the stub column for the model
    * call; parse, validation, fill, truncation, scoring and fallback
    * are exactly these expressions.
    *
    * Scale: retrieval is the bounded TopKByScore cut (the knnJoin
    * discipline); everything after operates on ≤ N×Q rows — the
    * parse/validate chain is per-QUERY array logic inside one
    * codegen stage, and the final join probes the tiny candidate
    * relation broadcast. */
  def rerankListwise(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MinHash
    val n = ListwiseN
    val e = Tables.embeddings(s, dir)
    val qs = e.where(col("vec_id") < ListwiseQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = e.where(col("vec_id") >= ListwiseQ)
      .crossJoin(broadcast(qs))
      .select(col("qid"), col("vec_id"),
        cosineSim(col("embedding"), col("qv")).as("sim"))
    // Prompt order: retrieved rank 1..n per query (sim desc, id asc).
    val cand = scored.groupBy(col("qid"))
      .agg(graft.plans.TopKByScore(col("sim"), col("vec_id"), n).as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col.id").as("cand_id"),
        (col("pos") + 1).cast("int").as("idx"))
      .transform(graft.Checkpoints.cut)
    // The stub model's opinion: prompt indices reordered by md5.
    val perm = cand
      .select(col("qid"), col("idx"),
        MinHash.hash60(concat(lit("lw:"), col("qid").cast("string"),
          lit(":"), col("cand_id").cast("string"))).as("ok"))
      .groupBy(col("qid"))
      .agg(transform(sort_array(collect_list(struct(col("ok"), col("idx")))),
        x => x.getField("idx")).as("pa"))
    val respCol = when(col("qid") === 0,
        array_join(col("pa"), " "))
      .when(col("qid") === 1, concat(lit("Ranking: "),
        array_join(slice(col("pa"), 1, 5), " "), lit(" 99 0")))
      .when(col("qid") === 2,
        array_join(concat(slice(col("pa"), 1, 1), col("pa")), " "))
      .otherwise(lit("unable to comply."))
    // ---- the protocol under test: parse the opaque reply ----
    val withResp = perm.select(col("qid"), respCol.as("resp"))
      .select(col("qid"), col("resp"),
        expr("transform(regexp_extract_all(resp, '\\\\d+', 0), " +
          "x -> cast(x as int) - 1)").as("parsed"))
    val ranked = withResp
      .select(col("qid"),
        (size(col("parsed")) === 0).as("fb"),
        filter(col("parsed"), x => x >= 0 && x < n).as("valid"))
      .select(col("qid"), col("fb"),
        when(col("fb"), sequence(lit(0), lit(n - 1)))
          .otherwise(slice(concat(col("valid"),
            array_except(sequence(lit(0), lit(n - 1)), col("valid"))),
            1, n)).as("fl"))
      .select(col("qid"), col("fb"), posexplode(col("fl")))
      .select(col("qid"), col("fb"), (col("pos") + 1).as("pos"),
        (col("col") + 1).as("idx"))
    ranked.join(broadcast(cand), Seq("qid", "idx"))
      .select(col("qid"), col("pos").cast("long").as("pos"),
        col("cand_id"),
        when(col("fb"), lit(500000L))
          .otherwise(lit(1000000L) -
            (col("pos") - 1) * lit(1000000L / n)).cast("long")
          .as("score_ppm"),
        when(col("fb"), lit("fallback")).otherwise(lit("listwise"))
          .as("rank_mode"))
      .orderBy(col("qid").asc, col("pos").asc, col("cand_id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rerank" -> ((s, d) => rerank(s, d)),
    "q_rerank_listwise" -> ((s, d) => rerankListwise(s, d)),
    "q_fusion" -> ((s, d) => fusion(s, d)),
    "q_mmr" -> ((s, d) => mmr(s, d)),
    "q_search_e2e" -> ((s, d) => searchE2e(s, d)),
  )

  /** The SEARCH CAPSTONE — the reference's full user-facing flow
    * (db/search_with_reranker.py main(): search across sources, fuse,
    * rerank, format each hit with its cross-references) as ONE
    * composed query, the search-side sibling of q_pipeline (curation)
    * and q_ingest_all (ingest), so every reference entry point has a
    * graded end-to-end row. Stages, each a separately-graded
    * operator composing through Catalyst:
    *  1. lexical tier — trigram name similarity vs the shared typo'd
    *     query (q_name_trigram's kernel), bounded top-20 cut;
    *  2. dense tier — cosine vs the query vector (q_vec_topk),
    *     bounded top-20 cut;
    *  3. RRF fusion of the two lists (q_fusion's one-window shape),
    *     fused top-10;
    *  4. feature rerank 0.7·cosine + 0.3·name-trigram over the
    *     bounded fused list (q_rerank's discipline), final top-5;
    *  5. cross-reference expansion stats per final hit
    *     (q_related_expand's deterministic ref rule): distinct
    *     existing refs + their total chars.
    *
    * Scale: both tier cuts are TakeOrdered; the fusion window ranks
    * ≤ 40 rows; every downstream join probes the corpus with a
    * broadcast ≤ 10-row list (map-only scans, no corpus shuffle);
    * the expansion joins a broadcast ≤ 15-row distinct ref list.
    *
    * The dense tier excludes vec 0 (it IS the query vector, not a
    * document playing itself); the lexical tier runs over every
    * name — doc 0 ranking first there is the intended behavior (the
    * typo'd lexical query resolving to its canonical document), the
    * same asymmetry as the reference's text-vs-embedding entry
    * points. */
  def searchE2e(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MinHash
    import graft.functions.TextFunctions.tokenSet
    val rrfK = 60
    val e = Tables.embeddings(s, dir)
    val qvec = e.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val names = Tables.documents(s, dir)
      .select(col("doc_id"), docName(col("text")).as("name"))
    // Bounded tier cuts — same single-sort-key discipline as fusion
    // (sk = -s so the cut and the rank window cannot disagree).
    def cut(scored: DataFrame, m: String): DataFrame =
      scored.select(col("doc_id"), (-col("s")).as("sk"), lit(m).as("m"))
        .orderBy(col("sk").asc, col("doc_id").asc).limit(20)
    val vec = cut(e.where(col("vec_id") =!= 0).crossJoin(broadcast(qvec))
      .select(col("vec_id").as("doc_id"),
        cosineSim(col("embedding"), col("qvec")).as("s")), "vec")
    val lex = cut(names.select(col("doc_id"),
      trigramSim(col("name"), lit(Lexical.trigramQuery)).as("s")), "lex")
    val ranked = vec.unionAll(lex)
      .withColumn("r", row_number().over(
        Window.partitionBy(col("m"))
          .orderBy(col("sk").asc, col("doc_id").asc)))
    def rrf(r: org.apache.spark.sql.Column) =
      coalesce(lit(1.0d) / (lit(rrfK) + r), lit(0.0d))
    val fused = ranked.groupBy(col("doc_id"))
      .agg(min(when(col("m") === "vec", col("r"))).as("r_vec"),
        min(when(col("m") === "lex", col("r"))).as("r_lex"))
      .select(col("doc_id"), col("r_vec"), col("r_lex"),
        (rrf(col("r_vec")) + rrf(col("r_lex"))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc).limit(10)
    // Rerank features: corpus scans probed by the broadcast fused list.
    val withSim = e.join(broadcast(fused), e("vec_id") === fused("doc_id"))
      .crossJoin(broadcast(qvec))
      .select(col("doc_id"), col("r_vec"), col("r_lex"), col("rrf"),
        cosineSim(col("embedding"), col("qvec")).as("sim"))
    val reranked = names.join(broadcast(withSim), Seq("doc_id"))
      .select(col("doc_id"), col("r_vec"), col("r_lex"), col("rrf"),
        col("sim"),
        trigramSim(col("name"), lit(Lexical.trigramQuery)).as("tri"))
      .select(col("*"),
        (lit(0.7d) * col("sim") + lit(0.3d) * col("tri")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(5)
    // Cross-reference expansion stats (the q_related_expand rule).
    val nd = Tables.documents(s, dir).agg(count(lit(1)).as("nd"))
    val refs = Tables.documents(s, dir)
      .join(broadcast(reranked.select(col("doc_id"))), Seq("doc_id"))
      .select(col("doc_id"),
        explode(slice(sort_array(tokenSet(col("text"))), 1, 3)).as("tok"))
      .crossJoin(broadcast(nd))
      .select(col("doc_id"),
        pmod(MinHash.hash60(concat(lit("rel:"), col("tok"))), col("nd"))
          .as("ref_id"))
      .distinct()
    val rel = Tables.documents(s, dir)
      .select(col("doc_id").as("ref_id"), col("n_chars"))
      .join(broadcast(refs), Seq("ref_id"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("ref_id")).as("n_related"),
        sum(col("n_chars")).as("ref_chars"))
    // Order on the RAW score before the rounding projection (the
    // q_rerank convention): ordering by the rounded alias would
    // tie-break pairs that differ only past 6 decimals differently
    // from the oracle's raw-score ORDER BY.
    reranked.join(broadcast(rel), Seq("doc_id"), "left")
      .orderBy(col("score").desc, col("doc_id").asc)
      .select(col("doc_id"), col("r_lex"), col("r_vec"),
        round(col("rrf"), 6).as("rrf"), round(col("sim"), 6).as("sim"),
        round(col("tri"), 6).as("tri"), round(col("score"), 6).as("score"),
        coalesce(col("n_related"), lit(0L)).as("n_related"),
        coalesce(col("ref_chars"), lit(0L)).as("ref_chars"))
  }

  // Trigram-set similarity SQL (same construction as Lexical's).
  private def tg(e: String): String =
    s"""(CASE WHEN len($e) < 3 THEN [] ELSE
       | list_distinct([substr($e, i, 3) for i in generate_series(1, len($e) - 2)])
       | END)""".stripMargin.replace("\n", "")
  private def tsim(a: String, b: String): String =
    s"""(CASE WHEN len(list_distinct($a || $b)) = 0 THEN 0.0 ELSE
       | len(list_intersect($a, $b)) / len(list_distinct($a || $b))
       | END)""".stripMargin.replace("\n", "")

  val oracles: Map[String, String] = Map(
    "q_rerank_listwise" -> {
      val n = ListwiseN
      val h = graft.functions.MinHash.hash60Sql(
        "'lw:' || CAST(qid AS VARCHAR) || ':' || CAST(cand_id AS VARCHAR)")
      s"""WITH qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
         |            FROM embeddings WHERE vec_id < $ListwiseQ),
         |s AS (SELECT q.qid, e.vec_id AS cand_id,
         |             list_cosine_similarity(e.embedding::DOUBLE[], q.qv)
         |               AS sim
         |      FROM embeddings e, qs q WHERE e.vec_id >= $ListwiseQ),
         |c AS (SELECT qid, cand_id, idx FROM (
         |        SELECT qid, cand_id, row_number() OVER (PARTITION BY qid
         |          ORDER BY sim DESC, cand_id ASC) AS idx FROM s)
         |      WHERE idx <= $n),
         |perm AS (SELECT qid, list(idx ORDER BY $h ASC, idx ASC) AS pa
         |         FROM c GROUP BY qid),
         |resp AS (SELECT qid, CASE qid
         |    WHEN 0 THEN array_to_string(pa, ' ')
         |    WHEN 1 THEN 'Ranking: ' || array_to_string(pa[1:5], ' ')
         |                || ' 99 0'
         |    WHEN 2 THEN array_to_string(list_prepend(pa[1], pa), ' ')
         |    ELSE 'unable to comply.' END AS resp
         |  FROM perm),
         |par AS (SELECT qid, resp,
         |    list_transform(regexp_extract_all(resp, '\\d+'),
         |      x -> CAST(x AS INT) - 1) AS parsed
         |  FROM resp),
         |va AS (SELECT qid, len(parsed) = 0 AS fb,
         |    list_filter(parsed, x -> x >= 0 AND x < $n) AS valid
         |  FROM par),
         |fin AS (SELECT qid, fb,
         |    CASE WHEN fb THEN range(0, $n)
         |         ELSE (valid || list_filter(range(0, $n),
         |                x -> NOT list_contains(valid, x)))[1:$n]
         |    END AS fl
         |  FROM va),
         |ex AS (SELECT qid, fb, g.i AS pos, fl[g.i] + 1 AS idx
         |       FROM fin, generate_series(1, $n) AS g(i))
         |SELECT e.qid, CAST(e.pos AS BIGINT) AS pos, c.cand_id,
         |       CAST(CASE WHEN e.fb THEN 500000
         |                 ELSE 1000000 - (e.pos - 1) * ${1000000 / n}
         |            END AS BIGINT) AS score_ppm,
         |       CASE WHEN e.fb THEN 'fallback' ELSE 'listwise' END
         |         AS rank_mode
         |FROM ex e JOIN c ON c.qid = e.qid AND c.idx = e.idx
         |ORDER BY e.qid ASC, e.pos ASC, c.cand_id ASC""".stripMargin
    },
    "q_search_e2e" -> {
      val q = s"'${Lexical.trigramQuery}'"
      val h = graft.functions.MinHash.hash60Sql("'rel:' || tok")
      s"""WITH qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings
         |            WHERE vec_id = 0),
         |n AS (SELECT doc_id, lower(substr(text, 1, 24)) AS name
         |      FROM documents),
         |vec AS (SELECT doc_id, sk,
         |               row_number() OVER (ORDER BY sk ASC, doc_id ASC) AS r
         |        FROM (SELECT e.vec_id AS doc_id,
         |                     -list_cosine_similarity(e.embedding::DOUBLE[],
         |                                             qv.v) AS sk
         |              FROM embeddings e, qv WHERE e.vec_id <> 0
         |              ORDER BY sk ASC, doc_id ASC LIMIT 20)),
         |lex AS (SELECT doc_id, sk,
         |               row_number() OVER (ORDER BY sk ASC, doc_id ASC) AS r
         |        FROM (SELECT doc_id, -${tsim(tg("name"), tg(q))} AS sk
         |              FROM n ORDER BY sk ASC, doc_id ASC LIMIT 20)),
         |fused AS (SELECT doc_id,
         |                 min(CASE WHEN m = 'vec' THEN r END) AS r_vec,
         |                 min(CASE WHEN m = 'lex' THEN r END) AS r_lex
         |          FROM (SELECT doc_id, r, 'vec' AS m FROM vec
         |                UNION ALL
         |                SELECT doc_id, r, 'lex' AS m FROM lex)
         |          GROUP BY doc_id),
         |f2 AS (SELECT doc_id, r_vec, r_lex,
         |              coalesce(1.0 / (60 + r_vec), 0) +
         |              coalesce(1.0 / (60 + r_lex), 0) AS rrf
         |       FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 10),
         |feats AS (SELECT f2.doc_id, f2.r_vec, f2.r_lex, f2.rrf,
         |                 list_cosine_similarity(e.embedding::DOUBLE[],
         |                                        qv.v) AS sim,
         |                 ${tsim(tg("n.name"), tg(q))} AS tri
         |          FROM f2
         |          JOIN embeddings e ON e.vec_id = f2.doc_id
         |          JOIN n ON n.doc_id = f2.doc_id, qv),
         |rr AS (SELECT *, 0.7 * sim + 0.3 * tri AS score FROM feats
         |       ORDER BY score DESC, doc_id ASC LIMIT 5),
         |nd AS (SELECT count(*) AS nd FROM documents),
         |toks AS (SELECT rr.doc_id,
         |                unnest(list_sort(list_distinct(
         |                  str_split(d.text, ' ')))[1:3]) AS tok
         |         FROM rr JOIN documents d ON d.doc_id = rr.doc_id),
         |refs AS (SELECT DISTINCT doc_id, $h % nd.nd AS ref_id
         |         FROM toks, nd),
         |rel AS (SELECT refs.doc_id,
         |               count(DISTINCT refs.ref_id) AS n_related,
         |               CAST(sum(d.n_chars) AS BIGINT) AS ref_chars
         |        FROM refs JOIN documents d ON d.doc_id = refs.ref_id
         |        GROUP BY refs.doc_id)
         |SELECT rr.doc_id, rr.r_lex, rr.r_vec,
         |       round(rr.rrf, 6) AS rrf, round(rr.sim, 6) AS sim,
         |       round(rr.tri, 6) AS tri, round(rr.score, 6) AS score,
         |       coalesce(rel.n_related, 0) AS n_related,
         |       coalesce(rel.ref_chars, 0) AS ref_chars
         |FROM rr LEFT JOIN rel ON rel.doc_id = rr.doc_id
         |ORDER BY rr.score DESC, rr.doc_id ASC""".stripMargin
    },
    "q_mmr" ->
      s"""WITH RECURSIVE
         |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
         |      WHERE vec_id = 0),
         |cand AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS v,
         |                list_cosine_similarity(e.embedding::DOUBLE[], q.qv)
         |                  AS rel
         |         FROM embeddings e, q WHERE e.vec_id <> 0
         |         ORDER BY rel DESC, vec_id ASC LIMIT 20),
         |pairs AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
         |                 list_cosine_similarity(a.v, b.v) AS s
         |          FROM cand a, cand b WHERE a.vec_id <> b.vec_id),
         |sel AS (
         |  SELECT 1 AS rnk, [c0.vec_id] AS ids, c0.vec_id, c0.score
         |  FROM (SELECT vec_id, $MmrLam * rel AS score FROM cand
         |        ORDER BY score DESC, vec_id ASC LIMIT 1) c0
         |  UNION ALL
         |  SELECT sel.rnk + 1, list_append(sel.ids, nxt.vec_id),
         |         nxt.vec_id, nxt.score
         |  FROM sel, LATERAL (
         |    SELECT c.vec_id, $MmrLam * c.rel - $MmrPen * max(p.s) AS score
         |    FROM cand c JOIN pairs p
         |      ON p.ia = c.vec_id AND list_contains(sel.ids, p.ib)
         |    WHERE NOT list_contains(sel.ids, c.vec_id)
         |    GROUP BY c.vec_id, c.rel
         |    ORDER BY score DESC, c.vec_id ASC LIMIT 1) nxt
         |  WHERE sel.rnk < 5)
         |SELECT rnk, vec_id, round(score, 6) AS score FROM sel
         |ORDER BY rnk ASC""".stripMargin,
    "q_rerank" -> {
      val en = TextAnalysis.StopwordSets.head._2
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |cand AS (
         |  SELECT e.vec_id AS doc_id,
         |         list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS sim
         |  FROM embeddings e, q WHERE e.vec_id <> 0
         |  ORDER BY sim DESC, doc_id ASC LIMIT 50),
         |qn AS (SELECT lower(substr(text, 1, 24)) AS qname FROM documents WHERE doc_id = 0),
         |f AS (
         |  SELECT c.doc_id, c.sim,
         |         ${tsim(tg("lower(substr(d.text, 1, 24))"), tg("qn.qname"))} AS tri,
         |         CAST(len(list_filter(str_split(d.text, ' '),
         |                t -> list_contains($en, t))) AS DOUBLE)
         |           / len(str_split(d.text, ' ')) AS sr
         |  FROM cand c JOIN documents d ON c.doc_id = d.doc_id, qn),
         |r AS (SELECT doc_id, sim, tri,
         |             0.7 * sim + 0.2 * tri + 0.1 * sr AS score
         |      FROM f)
         |SELECT doc_id, round(sim, 6) AS sim, round(tri, 6) AS tri,
         |       round(score, 6) AS score
         |FROM r ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin
    },
    "q_fusion" -> {
      val q = s"'${Lexical.trigramQuery}'"
      s"""WITH qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
         |n AS (SELECT doc_id, lower(substr(text, 1, 24)) AS name FROM documents),
         |vec AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r
         |  FROM (SELECT e.vec_id AS doc_id,
         |               list_cosine_similarity(e.embedding::DOUBLE[], qv.v) AS s
         |        FROM embeddings e, qv WHERE e.vec_id <> 0
         |        ORDER BY s DESC, doc_id ASC LIMIT 20)),
         |tri AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS r
         |  FROM (SELECT doc_id, ${tsim(tg("name"), tg(q))} AS s
         |        FROM n ORDER BY s DESC, doc_id ASC LIMIT 20)),
         |lev AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY s ASC, doc_id ASC) AS r
         |  FROM (SELECT doc_id, CAST(levenshtein(name, $q) AS DOUBLE) AS s
         |        FROM n ORDER BY s ASC, doc_id ASC LIMIT 20)),
         |fused AS (
         |  SELECT doc_id, vec.r AS r_vec, tri.r AS r_tri, lev.r AS r_lev,
         |         coalesce(1.0 / (60 + vec.r), 0.0)
         |           + coalesce(1.0 / (60 + tri.r), 0.0)
         |           + coalesce(1.0 / (60 + lev.r), 0.0) AS rrf
         |  FROM vec
         |  FULL JOIN tri USING (doc_id)
         |  FULL JOIN lev USING (doc_id))
         |SELECT doc_id, r_vec, r_tri, r_lev, round(rrf, 6) AS rrf
         |FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 10""".stripMargin
    },
  )
}

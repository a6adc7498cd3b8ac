package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis suite over the documents corpus — the LLM-pipeline
  * mandate operators: language ID, quality scoring, token counting,
  * fingerprinting. The reference's corpus is curated and single-
  * language, so its pipeline has no explicit analysis pass; these are
  * the operators its ingest path (cardsCleaning/cleanCardJson.py,
  * rulesCleaning/parse_rules_both_versions.py — normalize, strip,
  * filter) implies at training-data scale.
  *
  * Scale design: every query is a map-only projection over the scan
  * followed by at most one hash-agg on a bounded or uniform key —
  * no joins, no windows, no skew. All scoring is Column expressions
  * (codegen'd, no UDFs) with exact DuckDB equivalents.
  */
object TextAnalysis extends graft.QueryGroup {

  /** (lang → marker stopwords). Deterministic argmax with fixed
    * tiebreak order decides the predicted language. */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"),
  )

  private[graft] def hits(toksCol: Column, words: Seq[String]): Column =
    size(filter(toksCol, t => t.isin(words: _*)))

  /** Stopword-occurrence language ID: count marker-word occurrences
    * per candidate language, predict the argmax (ties resolved in
    * StopwordSets order, 'und' = no evidence). */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      .select(Seq(col("doc_id"), col("lang")) ++
        StopwordSets.map { case (l, ws) => hits(col("toks"), ws).as(s"hits_$l") }: _*)
    val best = StopwordSets.map(p => col(s"hits_${p._1}"))
      .reduce((a, b) => greatest(a, b))
    val pred = StopwordSets.foldRight(lit("und"): Column) { case ((l, _), acc) =>
      when(col(s"hits_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    // foldRight gives earlier languages precedence: the first branch
    // that matches wins, so ties resolve in StopwordSets order.
    base.select(col("doc_id"), col("lang"),
      col("hits_en"), col("hits_de"), col("hits_fr"), col("hits_es"),
      pred.as("pred_lang"))
      .orderBy(col("doc_id").asc)
  }

  /** Quality features per document: token count, distinct-token
    * ratio, stopword ratio, mean word length, and a composite score.
    * All ratios derive from exact integer counts, so the doubles are
    * deterministic. */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    qualityProjection(Tables.documents(s, dir))
      .orderBy(col("doc_id").asc)

  /** The quality feature projection over any (doc_id, source, text)
    * relation — shared by the batch query and its streaming twin
    * (map-only, so it runs identically on a stream). */
  def qualityProjection(in: DataFrame): DataFrame = {
    val enWords = StopwordSets.head._2
    in
      .select(col("doc_id"), col("source"), length(col("text")).as("len"),
        tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        hits(col("toks"), enWords).as("n_stop"),
        col("len"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        round(col("n_distinct").cast("double") / col("n_tokens"), 6)
          .as("distinct_ratio"),
        round(col("n_stop").cast("double") / col("n_tokens"), 6)
          .as("stopword_ratio"),
        round((col("len") - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens"), 6).as("mean_word_len"),
        round(col("n_distinct").cast("double") / col("n_tokens") *
          least(lit(1.0d), col("n_tokens").cast("double") / 40.0d), 6)
          .as("quality"))
  }

  /** Token counts per source: whitespace tokens plus a BPE-ish
    * regex tokenization ([a-z0-9]+ runs and single non-alnum
    * symbols), aggregated per source. */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"),
        size(tokens(col("text"))).as("ws"),
        regexp_count(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9 ]"))
          .as("bpe"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"),
        max(col("ws")).as("max_ws"),
        round(sum(col("ws")).cast("double") / count(lit(1)), 6).as("avg_ws"))
      .orderBy(col("source").asc)

  /** The normalized content (lowercase, alnum+space only, collapsed/
    * trimmed whitespace) — the canonical form [[fingerprint]] hashes
    * and the funnel's dedup stage reuses
    * ([[Curation.filterFunnel]]). */
  private[graft] def normExpr: Column = trim(regexp_replace(
    regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))

  /** Document fingerprint: md5 of the normalized content (lowercase,
    * alnum+space only, collapsed/trimmed whitespace) plus a length
    * band — the exact-dedup key a 100 TB ingest would bucket on. */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val norm = normExpr
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(norm).as("fp"),
        (length(norm).cast("long") / lit(100L)).cast("long").as("len_band"))
      .orderBy(col("doc_id").asc)
  }

  /** ORDER-SENSITIVE rolling-hash fingerprint (Rabin-Karp over the
    * token stream): fp = fold of acc·B + h(tok) mod M, left to
    * right — two docs with the same token SET but different order
    * fingerprint differently (the content hash in [[fingerprint]]
    * can't see order through normalization-stable permutations).
    * Map-only; the sequential fold is per-row, not cross-row. */
  def rollingFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), rollingFp.as("rfp"))
      .orderBy(col("doc_id").asc)

  private[graft] val RfpB = 1000003L
  private[graft] val RfpM = 2147483647L // 2^31-1; acc·B + x < 2^52
  private[graft] val RfpHashMod = 1048576L

  /** The per-doc fold as the fused native kernel
    * ([[graft.plans.RollingFp]] — one pass, whole-stage codegen).
    * Bit-identical to [[rollingFpBuiltin]] (TokenKernelsSpec). */
  private[graft] def rollingFp: Column =
    graft.plans.RollingFp(tokens(col("text")), RfpHashMod, RfpB, RfpM)

  /** Composed-HOF reference formulation of [[rollingFp]] — kept for
    * the bit-parity cross-check (two interpreted HOFs per token). */
  private[graft] def rollingFpBuiltin: Column =
    aggregate(
      transform(tokens(col("text")),
        t => graft.functions.MinHash.hash60(t) % lit(RfpHashMod)),
      lit(0L), (acc, x) => (acc * lit(RfpB) + x) % lit(RfpM))

  /** Denylist terms for the scrub audit — stand-ins for PII patterns
    * (emails, phones) on this synthetic corpus; the operator shape
    * (anchored regex → redact → account) is identical either way. */
  val Denylist: Seq[String] = Seq("customer", "key", "value")
  private val DenyPat = Denylist.mkString("\\b(", "|", ")\\b")

  /** Redaction scrub: replace denylisted terms with a mask token and
    * account for the damage per source — the PII-scrub pass of a
    * training pipeline (regex redaction + audit trail). Map-only
    * projection (regexp_count + regexp_replace are codegen'd
    * expressions) feeding one small-key agg; at 100 TB the scrubbed
    * text would be written back columnar while this same audit rolls
    * up. */
  def scrubDenylist(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), col("text"),
        regexp_count(col("text"), lit(DenyPat)).as("hits"),
        regexp_replace(col("text"), DenyPat, "[MASKED]").as("scrubbed"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("docs_touched"),
        sum(col("hits")).as("n_redactions"),
        sum(length(col("text"))).cast("long").as("chars_in"),
        sum(length(col("scrubbed"))).cast("long").as("chars_out"))
      .orderBy(col("source").asc)

  /** Repetition / boilerplate audit (Gopher-style quality signals):
    * per-doc duplicate-word fraction and top-word fraction, pooled
    * per source over exact integer counts (one division at the end —
    * no float accumulation to drift cross-engine). The per-doc max
    * word frequency folds over the SORTED token array with a
    * run-length accumulator — map-only, no explode, no per-doc
    * shuffle; the only exchange is the ~20-key source rollup. A doc
    * flags as repetitious when over half its words are repeats
    * (2·(n−distinct) > n, integer compare). */
  /** Max frequency of any element in a token array — one map-side
    * kernel call, no explode/shuffle (the spec cross-checks it
    * against the explode → groupBy → max formulation AND the
    * composed sorted-run fold). Native ([[graft.plans.MaxTokenFreq]],
    * one hash-map pass inside whole-stage codegen); value-identical
    * to [[maxWordFreqBuiltin]]. */
  def maxWordFreq(toks: Column): Column = graft.plans.MaxTokenFreq(toks)

  /** Composed reference formulation of [[maxWordFreq]]: the longest
    * equal-run over the SORTED array — an interpreted struct fold
    * per token, kept for the parity cross-check. */
  private[graft] def maxWordFreqBuiltin(toks: Column): Column = {
    val acc0 = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("best"))
    aggregate(sort_array(toks), acc0,
      (a, w) => {
        val run = when(a.getField("prev") === w, a.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(w.as("prev"), run.as("run"),
          greatest(a.getField("best"), run).as("best"))
      },
      a => a.getField("best"))
  }

  def repetition(s: SparkSession, dir: String): DataFrame = {
    val best = maxWordFreq(tokens(col("text")))
    Tables.documents(s, dir)
      .select(col("source"),
        size(tokens(col("text"))).cast("long").as("n"),
        size(array_distinct(tokens(col("text")))).cast("long").as("nd"),
        best.as("best"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("words"),
        round((sum(col("n")) - sum(col("nd"))).cast("double") /
          sum(col("n")), 6).as("dup_frac"),
        round(sum(col("best")).cast("double") / sum(col("n")), 6)
          .as("top_frac"),
        sum(when(lit(2L) * (col("n") - col("nd")) > col("n"), 1L)
          .otherwise(0L)).as("n_flagged"))
      .orderBy(col("source").asc)
  }

  /** (shingle width, flag threshold ppm) for [[redundancy]] — the
    * thresholds sit in each width's upper tail on the synthetic
    * corpus so the flag count is a real minority at every SF. */
  private[graft] val RedundancyWidths = Seq(2 -> 80000L, 3 -> 40000L)

  /** q_redundancy — duplicate n-GRAM fraction ladder (bigram +
    * trigram), the Gopher-family repetition signal one level above
    * [[repetition]]'s unigram pass: a doc that loops whole phrases
    * shows near-zero unigram duplication but a high duplicate-bigram
    * fraction. Per doc, red_ppm(w) = (#shingles − #distinct
    * shingles) / #shingles in rounded ppm — integer-exact, shingle
    * sets from the fused [[graft.plans.WordShingles]] kernel (one
    * pass, codegen). Rolled up per (source, w): mean/max ppm and
    * docs flagged over the width's threshold.
    *
    * Scale: map-only scoring, one hash-agg on the bounded source
    * key; the width unpivot (stack) runs AFTER the rollup so only
    * ~|sources| rows widen, never the corpus. */
  def redundancy(s: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val perDoc = Tables.documents(s, dir).select(
      col("source") +:
        RedundancyWidths.flatMap { case (w, _) => Seq(
          greatest(size(t).cast("long") - (w - 1), lit(0L)).as(s"n$w"),
          size(wordShingles(col("text"), w)).cast("long").as(s"d$w"))
        }: _*)
      .selectExpr("source" +:
        RedundancyWidths.map { case (w, _) =>
          s"(2 * 1000000 * (n$w - d$w) + greatest(n$w, 1)) DIV " +
            s"(2 * greatest(n$w, 1)) AS r$w"
        }: _*)
    val agged = perDoc.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      RedundancyWidths.flatMap { case (w, th) => Seq(
        sum(col(s"r$w")).as(s"s$w"),
        max(col(s"r$w")).as(s"x$w"),
        sum(when(col(s"r$w") >= th, 1L).otherwise(0L)).as(s"f$w"))
      }: _*)
    val cells = RedundancyWidths.map { case (w, _) =>
      s"${w}L, n_docs, (2 * s$w + n_docs) DIV (2 * n_docs), x$w, f$w"
    }.mkString(", ")
    agged.selectExpr("source",
      s"stack(${RedundancyWidths.size}, $cells) AS " +
        "(w, n_docs, mean_red_ppm, max_red_ppm, n_flagged)")
      .orderBy(col("source").asc, col("w").asc)
  }

  private[graft] val ChunkWindow = 32
  private[graft] val ChunkStride = 24

  /** Overlapping sliding-window text chunking — the RAG-ingestion /
    * long-document training prep the reference performs implicitly
    * by embedding whole (short) cards (db/ingest_cards.py:13-49
    * renders one embedding text per card; a 100 TB corpus has
    * book-length docs that must be split before embedding). Each doc
    * becomes ceil(n_tokens / stride) chunks of ≤ [[ChunkWindow]]
    * tokens, consecutive chunks overlapping by window − stride
    * tokens so no span is lost at a boundary.
    *
    * Scale: map-only — chunk starts come from `sequence`, chunks
    * from `slice` (both codegen'd); the only exchange in the plan is
    * the range sort that fixes the OUTPUT order for the dump (plan-
    * asserted in CurationSpec: no hash exchange anywhere), output
    * rows ∝ tokens/stride. This is the shape that feeds
    * q_embed_text / the embedding UDF batch at 100 TB: chunking
    * itself never repartitions the corpus. */
  def chunkText(s: SparkSession, dir: String): DataFrame =
    chunkTextOver(Tables.documents(s, dir))
      .orderBy(col("doc_id").asc, col("chunk_id").asc)

  /** The chunking transform alone — NO output sort, so the plan is
    * exchange-free end to end (what a 100 TB run feeds straight into
    * the embed stage). `in`: any (doc_id, text) relation (scale-
    * smoke injection point); [[chunkText]] adds the dump order. */
  private[graft] def chunkTextOver(in: DataFrame): DataFrame =
    in
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - 1,
          lit(ChunkStride))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col").cast("long").as("start_tok"),
        slice(col("toks"), col("col") + 1, lit(ChunkWindow)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("chunk")).cast("long").as("n_tok"),
        array_join(col("chunk"), " ").as("chunk_text"))

  /** Normalized-entropy flag threshold for [[entropy]] (ppm): a doc
    * whose token entropy sits under 94% of its maximum (uniform over
    * its own vocabulary) has its mass concentrated on a few repeated
    * tokens — boilerplate / template / keyword-stuffed text that the
    * ratio features of [[qualityScore]] under-penalize. (Tuned to
    * the synthetic corpus, whose docs are all near-uniform; a real
    * deployment sets this from its own quality-labelled sample.) */
  private[graft] val LowEntPpm = 940000L

  /** q_entropy — per-document token SHANNON ENTROPY, the
    * information-theoretic quality signal the ratio features miss
    * (a doc can have a healthy distinct_ratio while 90% of its MASS
    * sits on three tokens). H = ln n − (Σ_t c_t·ln c_t)/n over the
    * per-token counts c_t; emitted in MICRO-NATS under an explicit
    * fixed-point scheme — each distinct token contributes
    * round(1e6·c·ln(c)/n) and the contributions are summed as
    * BIGINTs — so every cross-row sum is integer (float summation
    * order can never flake the gate; the single per-row ln + round
    * is the proven q_tfidf parity class). c = 1 contributes exactly
    * 0, so uniform docs stay integer-exact end to end. ent_norm_ppm
    * = H / ln(vocab) (0 for single-token docs) positions each doc
    * against its own maximum; low_ent flags docs under
    * [[LowEntPpm]].
    *
    * Scale: one (doc, token) counting shuffle (counts only, no
    * payload — partial-aggregated map-side), the per-doc token
    * total rides in map-only (size of the token array, broadcast
    * join), and the final per-doc agg re-aggregates from compact
    * count rows. No joins wider than the 1-col totals, no windows,
    * no skew (doc_id is the key). */
  def entropy(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val n = docs.select(col("doc_id"), size(col("toks")).cast("long").as("n"))
    val tc = docs.select(col("doc_id"), explode(col("toks")).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
    tc.join(broadcast(n), Seq("doc_id"))
      .select(col("doc_id"), col("n"),
        expr("CAST(round(1e6 * c * ln(c) / n) AS BIGINT)").as("u"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_tokens"), count(lit(1)).as("vocab"),
        sum(col("u")).as("su"))
      .select(col("doc_id"), col("n_tokens"), col("vocab"),
        expr("CAST(round(1e6 * ln(n_tokens)) AS BIGINT) - su")
          .as("ent_unats"))
      .withColumn("ent_norm_ppm",
        expr(s"""CASE WHEN vocab = 1 THEN CAST(0 AS BIGINT) ELSE
                 (2 * 1000000 * ent_unats
                  + CAST(round(1e6 * ln(vocab)) AS BIGINT))
                 DIV (2 * CAST(round(1e6 * ln(vocab)) AS BIGINT)) END"""))
      .withColumn("low_ent",
        (col("ent_norm_ppm") < lit(LowEntPpm)).cast("long"))
      .orderBy(col("doc_id").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_entropy" -> ((s, d) => entropy(s, d)),
    "q_chunk_text" -> ((s, d) => chunkText(s, d)),
    "q_scrub_denylist" -> ((s, d) => scrubDenylist(s, d)),
    "q_repetition" -> ((s, d) => repetition(s, d)),
    "q_redundancy" -> ((s, d) => redundancy(s, d)),
    "q_lang_id" -> ((s, d) => langId(s, d)),
    "q_quality_score" -> ((s, d) => qualityScore(s, d)),
    "q_token_count" -> ((s, d) => tokenCount(s, d)),
    "q_fingerprint" -> ((s, d) => fingerprint(s, d)),
    "q_fingerprint_rolling" -> ((s, d) => rollingFingerprint(s, d)),
  )

  private def sqlList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")
  private def sqlHits(l: String, ws: Seq[String]): String =
    s"len(list_filter(str_split(text, ' '), t -> list_contains(${sqlList(ws)}, t))) AS hits_$l"

  val oracles: Map[String, String] = Map(
    "q_chunk_text" ->
      s"""WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks
         |           FROM documents),
         |c AS (SELECT doc_id, toks,
         |        unnest(generate_series(0, len(toks) - 1, $ChunkStride))
         |          AS st
         |      FROM t)
         |SELECT doc_id, CAST(st // $ChunkStride AS BIGINT) AS chunk_id,
         |       CAST(st AS BIGINT) AS start_tok,
         |       CAST(len(toks[st + 1 : st + $ChunkWindow]) AS BIGINT)
         |         AS n_tok,
         |       array_to_string(toks[st + 1 : st + $ChunkWindow], ' ')
         |         AS chunk_text
         |FROM c ORDER BY doc_id ASC, chunk_id ASC""".stripMargin,
    "q_scrub_denylist" -> {
      val pat = Denylist.mkString("\\b(", "|", ")\\b")
      s"""WITH t AS (
         |  SELECT source, text,
         |         len(regexp_extract_all(text, '$pat')) AS hits,
         |         regexp_replace(text, '$pat', '[MASKED]', 'g') AS scrubbed
         |  FROM documents)
         |SELECT source, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS docs_touched,
         |       CAST(sum(hits) AS BIGINT) AS n_redactions,
         |       CAST(sum(len(text)) AS BIGINT) AS chars_in,
         |       CAST(sum(len(scrubbed)) AS BIGINT) AS chars_out
         |FROM t GROUP BY source ORDER BY source ASC""".stripMargin
    },
    "q_repetition" ->
      """WITH d AS (
        |  SELECT doc_id, source, str_split(text, ' ') AS toks
        |  FROM documents),
        |per AS (
        |  SELECT doc_id, source, len(toks) AS n,
        |         len(list_distinct(toks)) AS nd
        |  FROM d),
        |mx AS (
        |  SELECT doc_id, max(c) AS best FROM (
        |    SELECT doc_id, t, count(*) AS c
        |    FROM (SELECT doc_id, unnest(toks) AS t FROM d)
        |    GROUP BY doc_id, t)
        |  GROUP BY doc_id)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(n) AS BIGINT) AS words,
        |       round(CAST(sum(n) - sum(nd) AS DOUBLE) / sum(n), 6)
        |         AS dup_frac,
        |       round(CAST(sum(best) AS DOUBLE) / sum(n), 6) AS top_frac,
        |       CAST(sum(CASE WHEN 2 * (n - nd) > n THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_flagged
        |FROM per JOIN mx USING (doc_id)
        |GROUP BY source ORDER BY source ASC""".stripMargin,
    "q_redundancy" -> {
      def sh(w: Int): String =
        (0 until w).map(j => s"t[i + $j]").mkString(" || ' ' || ")
      val per = RedundancyWidths.map { case (w, _) =>
        s"""greatest(len(t) - ${w - 1}, 0) AS n$w,
           |  CASE WHEN len(t) < $w THEN 0
           |       ELSE len(list_distinct([${sh(w)}
           |            for i in generate_series(1, len(t) - ${w - 1})]))
           |  END AS d$w""".stripMargin
      }.mkString(",\n  ")
      val reds = RedundancyWidths.map { case (w, _) =>
        s"(2 * 1000000 * (n$w - d$w) + greatest(n$w, 1)) " +
          s"// (2 * greatest(n$w, 1)) AS r$w"
      }.mkString(",\n  ")
      val aggs = RedundancyWidths.map { case (w, th) =>
        s"""CAST((2 * sum(r$w) + count(*)) // (2 * count(*)) AS BIGINT)
           |    AS m$w, max(r$w) AS x$w,
           |  CAST(count(*) FILTER (r$w >= $th) AS BIGINT) AS f$w""".stripMargin
      }.mkString(",\n  ")
      val arms = RedundancyWidths.map { case (w, _) =>
        s"""SELECT source, CAST($w AS BIGINT) AS w, n_docs,
           |       m$w AS mean_red_ppm, x$w AS max_red_ppm,
           |       f$w AS n_flagged FROM a""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH d AS (SELECT source, str_split(text, ' ') AS t
         |           FROM documents),
         |per AS (SELECT source,
         |  $per
         |FROM d),
         |r AS (SELECT source,
         |  $reds
         |FROM per),
         |a AS (SELECT source, count(*) AS n_docs,
         |  $aggs
         |FROM r GROUP BY source)
         |$arms
         |ORDER BY source ASC, w ASC""".stripMargin
    },
    "q_lang_id" -> {
      val hitCols = StopwordSets.map { case (l, ws) => sqlHits(l, ws) }
        .mkString(",\n|         ")
      val bestExpr = StopwordSets.map(p => s"hits_${p._1}")
        .reduce((a, b) => s"greatest($a, $b)")
      val predExpr = StopwordSets.foldRight("'und'") { case ((l, _), acc) =>
        s"CASE WHEN hits_$l = best AND best > 0 THEN '$l' ELSE $acc END"
      }
      s"""WITH h AS (
         |  SELECT doc_id, lang,
         |         $hitCols
         |  FROM documents),
         |b AS (SELECT *, $bestExpr AS best FROM h)
         |SELECT doc_id, lang, hits_en, hits_de, hits_fr, hits_es,
         |       $predExpr AS pred_lang
         |FROM b ORDER BY doc_id ASC""".stripMargin
    },
    "q_quality_score" -> {
      val en = sqlList(StopwordSets.head._2)
      s"""WITH t AS (
         |  SELECT doc_id, source, len(text) AS l,
         |         str_split(text, ' ') AS toks
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, len(toks) AS n_tokens,
         |         len(list_distinct(toks)) AS n_distinct,
         |         len(list_filter(toks, t -> list_contains($en, t))) AS n_stop,
         |         l
         |  FROM t)
         |SELECT doc_id, source, n_tokens,
         |       round(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_ratio,
         |       round(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
         |       round(CAST(l - (n_tokens - 1) AS DOUBLE) / n_tokens, 6)
         |         AS mean_word_len,
         |       round(CAST(n_distinct AS DOUBLE) / n_tokens *
         |             least(1.0, CAST(n_tokens AS DOUBLE) / 40.0), 6) AS quality
         |FROM c ORDER BY doc_id ASC""".stripMargin
    },
    "q_token_count" ->
      """WITH t AS (
        |  SELECT source, len(str_split(text, ' ')) AS ws,
        |         len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]'))
        |           AS bpe
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(ws) AS BIGINT) AS ws_tokens,
        |       CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
        |       max(ws) AS max_ws,
        |       round(CAST(sum(ws) AS DOUBLE) / count(*), 6) AS avg_ws
        |FROM t GROUP BY source ORDER BY source ASC""".stripMargin,
    "q_fingerprint_rolling" ->
      """SELECT doc_id, source,
        |       list_reduce(
        |         list_prepend(CAST(0 AS BIGINT),
        |           [CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) % 1048576
        |            for t in str_split(text, ' ')]),
        |         (acc, x) -> (acc * 1000003 + x) % 2147483647) AS rfp
        |FROM documents ORDER BY doc_id ASC""".stripMargin,
    "q_fingerprint" ->
      """WITH n AS (
        |  SELECT doc_id,
        |         trim(regexp_replace(
        |           regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |           ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS fp,
        |       CAST(len(norm) // 100 AS BIGINT) AS len_band
        |FROM n ORDER BY doc_id ASC""".stripMargin,
    // Same fixed-point scheme as the Spark side: per-token-count
    // rounding to BIGINT micro-nats, integer sums only.
    "q_entropy" ->
      s"""WITH d AS (SELECT doc_id, str_split(text, ' ') AS toks
         |           FROM documents),
         |n AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n FROM d),
         |tc AS (SELECT doc_id, t, count(*) AS c
         |       FROM (SELECT doc_id, unnest(toks) AS t FROM d)
         |       GROUP BY doc_id, t),
         |u AS (SELECT doc_id, n,
         |             CAST(round(1e6 * c * ln(c) / n) AS BIGINT) AS u
         |      FROM tc JOIN n USING (doc_id)),
         |p AS (SELECT doc_id, max(n) AS n_tokens,
         |             CAST(count(*) AS BIGINT) AS vocab,
         |             CAST(sum(u) AS BIGINT) AS su
         |      FROM u GROUP BY doc_id),
         |e AS (SELECT doc_id, n_tokens, vocab,
         |             CAST(round(1e6 * ln(n_tokens)) AS BIGINT) - su
         |               AS ent_unats,
         |             CAST(round(1e6 * ln(vocab)) AS BIGINT) AS lnv
         |      FROM p)
         |SELECT doc_id, n_tokens, vocab, ent_unats,
         |       CASE WHEN vocab = 1 THEN CAST(0 AS BIGINT)
         |            ELSE CAST((2 * 1000000 * ent_unats + lnv)
         |                      // (2 * lnv) AS BIGINT) END
         |         AS ent_norm_ppm,
         |       CAST(CASE WHEN (CASE WHEN vocab = 1 THEN 0
         |                       ELSE (2 * 1000000 * ent_unats + lnv)
         |                            // (2 * lnv) END) < $LowEntPpm
         |                 THEN 1 ELSE 0 END AS BIGINT) AS low_ent
         |FROM e ORDER BY doc_id ASC""".stripMargin,
  )
}

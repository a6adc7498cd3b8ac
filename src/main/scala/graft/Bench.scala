package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and emits ONE JSON line on stdout —
  * `{"metric":"total","value":N,"queries":{...},"sf":...}` (all values
  * seconds; per-query keys drop the `q_` prefix for stdout tail-window
  * budget) — plus a full-key full-precision copy at bench_out.json
  * (belt and braces: round 1's stdout
  * line was mangled by sbt's run logger; build.sbt now uses
  * StdoutOutput, and the file survives any future stdout decoration).
  *
  * Failures are NOT swallowed into the total: a failed query reports
  * `-1` in `queries` and its message in `errors`, so a broken query
  * reads as broken instead of as a fast one.
  */
object Bench {
  /** Compact-stdout family-prefix abbreviations, applied after the
    * `q_` strip (first match wins; non-matching keys pass through).
    * Full keys always live in bench_out.json. */
  private[graft] val Abbrev: Seq[(String, String)] = Seq(
    "dedup_" -> "dd_", "stream_" -> "st_", "multimodal_" -> "mm_",
    "vec_" -> "v_", "ann_" -> "a_", "name_" -> "nm_",
    // r7b: 106 rows left ~36 chars of headroom; five more families
    // reclaim ~58 (fingerprint_ before fingerprint: first match wins)
    "fingerprint_" -> "fp_", "fingerprint" -> "fp", "quality_" -> "ql_",
    "window_" -> "w_", "top_n_" -> "tn_", "rule_" -> "rl_",
    "glossary_" -> "gl_")

  /** r7c: 111 rows pushed the stdout line to 1930 chars — PAST the
    * ~1927-char tail window (measured r5) — so prefix families alone
    * no longer fit. Second stage: segment abbreviations applied to
    * the prefix-abbreviated key (each replaced wherever it occurs;
    * list order = application order). ~170 chars reclaimed at 111
    * rows. The full-key mapping stays recoverable: bench_out.json
    * always records full keys, and BASELINE.md documents the scheme. */
  private[graft] val Seg: Seq[(String, String)] = Seq(
    "incremental" -> "incr", "sessionize" -> "sess",
    "session_window" -> "sess_w", "contamination" -> "contam",
    "containment" -> "contain", "array_contains" -> "arr",
    "ngram_jaccard" -> "njac", "pack_sequences" -> "pack",
    "quantile" -> "qtl", "threshold" -> "thr", "per_label" -> "lbl",
    "stratified" -> "strat", "framesample" -> "frames",
    "levenshtein" -> "lev", "repetition" -> "repet",
    "federated" -> "fed", "percentile" -> "pctl",
    "merge_upsert" -> "upsert", "scrub_denylist" -> "deny",
    "related_expand" -> "rel_exp", "filter_funnel" -> "funnel",
    "chunk_text" -> "chunk_t", "shard_shuffle" -> "shards",
    // r7d: 121 rows left ~30 chars of headroom; seven more segment
    // rules reclaim ~32 (the §6-planned lever, applied BEFORE the
    // rows that needed it).
    "substring" -> "substr", "multispace" -> "multi",
    "embedding" -> "emb", "centroids" -> "cents",
    "hierarchy" -> "hier", "combined" -> "comb", "converged" -> "conv",
    // r7e: rows 123-124 (batch retrieval + mining).
    "hard_negatives" -> "hard_neg", "bm25_batch" -> "bm25_b",
    // r7f: reclaim ~50 chars from the longest compact keys before
    // row 125 (the alternative was changing the per-query value
    // unit on the stdout line, which would silently 10x-skew the
    // driver's BENCH_r{N} numbers against BASELINE.md).
    "asof_join_native" -> "asof_nat", "events_bucket" -> "ev_bkt",
    "bm25_indexed" -> "bm25_idx", "hll_distinct" -> "hll_dist",
    "ingest_dedup" -> "ing_dd", "json_extract" -> "json_ext",
    "source_stats" -> "src_stats", "pair_stats" -> "pairs",
    "lsh_bucket" -> "lsh_b", "latest" -> "last",
    "hard_neg_vec" -> "hnv",
    // r7g: rows 126-129 (tokenizer/mixing/ingest tier) — reclaim
    // ~28 chars from the remaining longest compact keys first.
    "sample_strat" -> "smp_str", "mix_weights" -> "mix_w",
    "salted_join" -> "salted", "token_count" -> "tok_cnt",
    "embed_text" -> "emb_txt", "last_tws" -> "l_tws",
    "ingest_all" -> "ing_all",
    // r7i: headroom hardening at 130 rows — 19 chars left meant ONE
    // capped error message could clip the metric line; reclaim ~60
    // from the remaining 10+-char keys so an error-carrying line
    // still fits the driver's tail window.
    "rolling" -> "roll", "cluster" -> "clus", "minhash" -> "mh",
    "simhash" -> "sh", "contain" -> "cont", "knn_join" -> "knn",
    "bloom_semi" -> "bloom", "meta_range" -> "m_range",
    "string_agg" -> "str_agg", "text_ilike" -> "ilike",
    "doc_join" -> "doc_j", "qtl_sample" -> "qtl_smp",
    "range_join" -> "range_j", "quality" -> "ql",
    "json_clean" -> "json_cl")

  /** The one compact-key definition (stdout flavor): `q_` strip →
    * family-prefix abbreviation → segment abbreviation. The
    * uniqueness spec (SurveySyncSpec) pins this exact function, so
    * bench and spec cannot drift. */
  private[graft] def compactKey(k: String): String = {
    val b = k.stripPrefix("q_")
    val pre = Abbrev.collectFirst {
      case (p, r) if b.startsWith(p) => r + b.substring(p.length)
    }.getOrElse(b)
    Seg.foldLeft(pre) { case (s, (from, to)) => s.replace(from, to) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      // Stateful streams size state partitions to state volume, not
      // CPU count (the count is baked into each stream's checkpoint;
      // see Streaming.StatePartitionsKey). 8 fits the testdata key
      // spaces; a 100 TB deployment raises it with its key space.
      .config(graft.streaming.Streaming.StatePartitionsKey, "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM + parquet footers once so the first measured query
    // doesn't absorb session/scan initialization.
    Seq("documents", "embeddings", "lineitem", "orders")
      .foreach(t => Tables.table(spark, sfDir, t).count())
    Tables.events(spark, sfDir).count() // needs the nanos-ts conf
    // Then warm the shared engine machinery (Janino compiler, shuffle
    // writers, parquet column decoders, localCheckpoint, micro-batch
    // engine + state store, TypedImperativeAggregate ser/de) with one
    // untimed pass of a representative query per machinery class.
    // Queries run alphabetically, which puts the heavy q_ann_*/
    // q_dedup_* shapes first — without this they absorb the whole
    // JIT ramp inside their measured reps (r4: q_dedup_cluster 6.99 s
    // cold vs 1.49 s steady-state).
    val warm = SparkEntry.queries
    // q_stream_join warms the stream-stream symmetric-hash-join state
    // machinery, which q_stream_window's agg state store does not
    // touch (measured: 4.6 s unwarmed vs ~1.5 s steady-state).
    Seq("q_dedup_cluster", "q_stream_window", "q_stream_join",
        "q_join_agg", "q_vec_topk")
      .foreach(n => try warm(n)(spark, sfDir).count()
        catch { case _: Throwable => () })
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Two reps, report the min: the first execution of a query
      // shape pays one-off plan compilation + whole-stage-codegen
      // JIT, a cost that amortizes to nothing at real scale. The
      // DuckDB baseline (tools/baseline.py) measures the same way,
      // so the comparison stays symmetric.
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .take(200)
          -1.0
        }
      }
      val r1 = once()
      val r2 = if (r1 >= 0) once() else -1.0
      name -> (if (r1 >= 0 && r2 >= 0) math.min(r1, r2) else -1.0)
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Per-query seconds at 1 decimal, the total at 2; trailing zeros
    // trimmed from both ("0.40"→"0.4", "8.10"→"8.1", "1.00"→"1"): the
    // driver captures only the LAST ~2000 chars of stdout and parses
    // the metric line out of that tail; at 66+ queries full
    // nanosecond precision pushed the line past the window and round
    // 3 recorded `parsed: null`. 0.1 s granularity keeps ~75 chars of
    // headroom at 85 queries. Full precision goes to bench_out.json
    // (below), which each round's git history preserves, and feeds
    // BASELINE.md.
    def trim(s: String): String =
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      else s
    def s1(v: Double): String =
      trim(String.format(java.util.Locale.ROOT, "%.1f", Double.box(v)))
    def s3(v: Double): String =
      trim(String.format(java.util.Locale.ROOT, "%.2f", Double.box(v)))
    def s6(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def jsonLine(fmt: Double => String, fmtQ: Double => String,
                 compact: Boolean): String = {
      // compact=true is the stdout flavor: the driver captures only the
      // LAST ~2000 chars of stdout (measured r5: 1927-char budget after
      // sbt's `[success]` epilogue, and the r5 line was 1901 — 26 chars
      // of headroom). So stdout strips the `q_` key prefix (−2×88
      // bytes; full names live in bench_out.json and BASELINE.md
      // documents the mapping) and drops `"unit":"sec"` (seconds is the
      // contract; the verdict sanctioned dropping it). bench_out.json
      // keeps full keys, full precision, and the unit.
      // r7: rows 99+ would have clipped the tail window (42 chars of
      // headroom at 98 queries), so compact keys also abbreviate the
      // six family prefixes (~150 chars reclaimed). The mapping is
      // documented in SURVEY §6 and BASELINE.md; bench_out.json keeps
      // full keys.
      def key(k: String): String = if (compact) Bench.compactKey(k) else k
      val qs = results.map { case (k, v) => s"${q(key(k))}:${fmtQ(v)}" }
        .mkString("{", ",", "}")
      // Stdout error messages are capped harder than bench_out's 200
      // chars: one long exception message must not push the metric
      // line past the driver's ~1927-char tail window (the remaining
      // headroom at 98 queries is ~40 chars; a truncated message
      // still identifies the failure, bench_out.json keeps the rest).
      val errJson = errors.map { case (k, v) =>
          s"${q(key(k))}:${q(if (compact) v.take(60) else v)}" }
        .mkString("{", ",", "}")
      val total = results.collect { case (_, v) if v >= 0 => v }.sum
      // Omit the errors object when empty — every byte of the stdout
      // line spends tail-window budget.
      val errPart = if (errors.isEmpty) "" else s""","errors":$errJson"""
      val unitPart = if (compact) "" else "\"unit\":\"sec\","
      // Compact drops the sf suffix entirely (r6 verdict sanctioned
      // this lever); bench_out.json still records it.
      val sfName = new java.io.File(sfDir).getName // "sf0.1" — path prefix is tail-budget
      val sfPart = if (compact) "" else s""","sf":${q(sfName)}"""
      s"""{"metric":"total","value":${fmt(total)},${unitPart}"queries":$qs$errPart$sfPart}"""
    }
    Files.writeString(Paths.get("bench_out.json"),
      jsonLine(s6, s6, compact = false) + "\n")
    spark.stop()
    // Print LAST, after Spark shutdown, so only sbt's `[success]`
    // epilogue can land between the line and the end of the tail.
    println(jsonLine(s3, s1, compact = true))
  }
}

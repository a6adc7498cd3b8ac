package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, Trigger}

import graft.Tables
import graft.functions.VectorFunctions.cosineSim
import graft.operators.Ann

/** Structured Streaming twins of the batch event queries — the
  * reference ingests in batch (reference: db/ingest_cards.py), but a
  * 100 TB deployment ingests continuously; these queries prove the
  * same plans run as streams.
  *
  * Each query here runs a real `readStream → transform → writeStream`
  * pipeline to completion with `Trigger.AvailableNow` (process all
  * currently-available input, then stop — the standard
  * batch-over-stream harness), sinks to an in-memory table, and
  * returns the sink as a DataFrame. That makes the streaming path
  * oracle-checkable end-to-end: the DuckDB oracle is the exact batch
  * SQL, so CORRECTNESS verifies stream-equals-batch, not just
  * rows>0.
  *
  * Scale design: the windowed aggregation is a standard watermarked
  * tumbling-window state store (state = open windows × event types,
  * bounded by the watermark horizon); dedup state is the distinct key
  * set within the watermark horizon. At 100 TB/day both key spaces
  * are bounded and hash-partitioned across executors; the memory sink
  * here holds only the tiny aggregate, never events.
  */
/** Max-accumulator: `value` = the largest Long ever added. Idempotent
  * under task retries (max is order- and repeat-insensitive), so it
  * is safe as a STATE-SIZE observability channel from inside
  * stateful-stream functions. */
final class MaxAccumulator
    extends org.apache.spark.util.AccumulatorV2[Long, Long] {
  private var v = 0L
  override def isZero: Boolean = v == 0L
  override def copy(): MaxAccumulator = {
    val a = new MaxAccumulator; a.v = v; a
  }
  override def reset(): Unit = v = 0L
  override def add(x: Long): Unit = v = math.max(v, x)
  override def merge(
      o: org.apache.spark.util.AccumulatorV2[Long, Long]): Unit =
    v = math.max(v, o.value)
  override def value: Long = v
}

object Streaming extends graft.QueryGroup {

  /** Peak per-key state entry count of the last completed run of each
    * sink's resolver — the bounded-state contract made measurable
    * (StreamingSpec asserts pruned ≪ unpruned over the same replay). */
  private[graft] val peakStateEntries =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  private def newPeakAcc(s: SparkSession): MaxAccumulator = {
    val acc = new MaxAccumulator
    s.sparkContext.register(acc, "graft.peakStateEntries")
    acc
  }

  /** Streaming reader over the events parquet with the same
    * timestamp normalization as the batch reader
    * ([[graft.Tables.normalizeTs]] — serves both the nanos-long and
    * TIMESTAMP_NTZ testdata generations). The schema comes from a
    * footer-only batch read (driver metadata, not data). */
  /** Footer-schema cache for the streaming readers, keyed by file
    * path (r12, guide §6 small-I/O hygiene): every twin invocation
    * re-derived its source schema with a batch `read.parquet(...)
    * .schema` — a file listing + footer parse per run, pure metadata,
    * ~30-60 ms × 27 twins × reps. The testdata files are immutable
    * within a session; a deployment that REPLACES a source file with
    * a different schema restarts the session (schema evolution of a
    * live table goes through VersionedTable, not raw files). */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]()

  private def footerSchema(s: SparkSession, path: String) =
    schemaCache.computeIfAbsent(path, p => s.read.parquet(p).schema)

  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = footerSchema(s, path)
    // The streaming file source wants a directory; point it at the sf
    // dir and glob-filter to the events file(s).
    graft.Tables.normalizeTs(
      s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }

  /** State-partition sizing for the streaming twins. A stateful
    * operator BAKES the shuffle-partition count into its checkpoint
    * at first start, so a deployment sizes it deliberately — to state
    * volume (keys × stores per partition), not to the session's
    * CPU-oriented batch setting — and must keep it constant across
    * restarts of the same checkpoint. When this conf is set,
    * [[runToCompletion]] scopes `spark.sql.shuffle.partitions` to it
    * for the duration of the stream only (batch queries and the sink
    * read-back keep the session setting). Measured on the
    * stream-stream join (4 state stores per partition): 5.2 s at 32
    * state partitions vs 2.0 s at 8 on the same sf0.1 input —
    * per-partition store commit overhead, not data.
    *
    * Thread-safety note (r6 ADVICE): the override MUTATES the shared
    * session conf for the stream's duration — a batch query planned
    * CONCURRENTLY on the same SparkSession during that window would
    * silently plan with the streaming partition count. The bench /
    * verify / test harnesses are single-threaded so this never
    * bites there; a deployment running concurrent batch work should
    * start the stream from its own `spark.newSession()` clone, which
    * scopes the conf. */
  val StatePartitionsKey = "graft.stream.statePartitions"

  /** Optional root for the twins' checkpoint dirs. Unset (default):
    * Spark's temp-checkpoint path under java.io.tmpdir. The graded
    * AvailableNow twins use DISPOSABLE checkpoints (each run is a
    * one-shot rebuild; Spark deletes the temp dir on success), yet
    * every state-store commit still fsyncs delta+crc files through
    * it — on an ext4 /tmp that disk round-trip is a fixed per-trigger
    * tax that NEVER protects anything. Pointing the root at a tmpfs
    * (e.g. /dev/shm) removes the tax without touching semantics;
    * measured on the r11 stream panel: see SURVEY §6. A PRODUCTION
    * stream whose checkpoint is its restart contract keeps a durable
    * root (object store / HDFS) — this key is for disposable-
    * checkpoint runs only, which is why it is opt-in. */
  val CheckpointRootKey = "graft.stream.checkpointRoot"

  /** Fast checkpoint I/O for ONE-SHOT streams (r12, guide §1/§6):
    * every twin here runs a DISPOSABLE checkpoint (AvailableNow, a
    * fresh per-run dir, deleted on completion — restart-from-
    * checkpoint never happens), yet the default
    * FileContextBasedCheckpointFileManager re-resolves a Hadoop
    * AbstractFileSystem per metadata operation: measured ~50 ms per
    * offset/commit-log write on a tmpfs checkpoint, ~150 ms per
    * trigger before any data moves, and the same tax inside every
    * state-store delta commit. The FileSystemBased manager rides the
    * process-wide FileSystem cache: the same minimal AvailableNow
    * stream drops 0.65 s → 0.30 s wall (offset ops 50 → 10 ms,
    * queryPlanning 140 → 60 ms). Its rename is not atomic-no-
    * overwrite — exactly the property a crash-RESTARTED checkpoint
    * needs and a run-once-then-delete checkpoint cannot observe (one
    * writer, no reader after failure), so this scope is applied only
    * around the one-shot runs and restored after; a production
    * stream whose checkpoint is its restart contract keeps the
    * default atomic manager. */
  private val CkptMgrKey = "spark.sql.streaming.checkpointFileManagerClass"
  private val FastCkptMgr = "org.apache.spark.sql.execution.streaming." +
    "checkpointing.FileSystemBasedCheckpointFileManager"
  private[graft] def withOneShotCheckpointIO[A](s: SparkSession)(
      body: => A): A = {
    val prev = s.conf.getOption(CkptMgrKey)
    s.conf.set(CkptMgrKey, FastCkptMgr)
    try body
    finally prev match {
      case Some(v) => s.conf.set(CkptMgrKey, v)
      case None => s.conf.unset(CkptMgrKey)
    }
  }

  private def runToCompletion(df: DataFrame, name: String,
      mode: String): Unit =
    runAllToCompletion(Seq((df, name, mode)))

  /** Run one or more INDEPENDENT one-shot streams to completion —
    * CONCURRENTLY when given several (guide §2.6 "overlap independent
    * jobs": two AvailableNow runs with disjoint sinks/checkpoints
    * are independent actions; each one's tail leaves most cores
    * idle, so the second stream back-fills instead of queueing its
    * whole fixed floor behind the first). The session-conf scopes
    * (noDataMicroBatches, state partitions, checkpoint manager) are
    * applied ONCE around the whole group — the per-stream
    * set/restore nesting would race when two scopes overlap. */
  private def runAllToCompletion(
      streams: Seq[(DataFrame, String, String)]): Unit = {
    // No query here emits on watermark advancement (complete-mode
    // window, first-sight dropDuplicates, fMGWS emitting during
    // processing), so the trailing no-data micro-batch is pure fixed
    // cost — skip it. State-eviction timing changes; output does not
    // (the stream-vs-batch equality suite runs under this setting).
    val s = streams.head._1.sparkSession
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = s.conf.getOption(key)
    val spKey = "spark.sql.shuffle.partitions"
    val prevSp = s.conf.get(spKey)
    s.conf.set(key, "false")
    s.conf.getOption(StatePartitionsKey).foreach(s.conf.set(spKey, _))
    // Per-query disposable checkpoint under the opt-in root (see
    // CheckpointRootKey); unique per (query, start) like Spark's own
    // temp path, deleted on completion like it.
    val ckpts = streams.map { case (_, name, _) =>
      s.conf.getOption(CheckpointRootKey).map { root =>
        s"$root/${name}_${java.util.UUID.randomUUID()}"
      }
    }
    try {
      withOneShotCheckpointIO(s) {
        val qs = streams.zip(ckpts).map { case ((df, name, mode), ckpt) =>
          val w = df.writeStream.format("memory").queryName(name)
            .outputMode(mode).trigger(Trigger.AvailableNow())
          ckpt.fold(w)(c => w.option("checkpointLocation", c)).start()
        }
        qs.foreach(_.awaitTermination())
      }
    } finally {
      val ckpt = ckpts.flatten
      // The checkpoint is disposable, so the providers the run loaded
      // (and their in-heap state maps) are dead weight — unload them
      // before the next suite row instead of letting 26 twins × reps
      // × partitions of final state pile onto the heap (measured as
      // suite-position inflation: identical twins cost 2-3x mid-suite
      // vs solo on the same code).
      org.apache.spark.sql.GraftBridge.unloadStateStores()
      ckpt.foreach { c =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(new java.io.File(c))
      }
      s.conf.set(spKey, prevSp)
      prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }

  /** Watermark + tumbling 1h window × event_type aggregation — the
    * streaming twin of [[graft.operators.Relational.eventsBucket]];
    * fixed-point value sum for cross-engine exactness. Complete
    * output mode so the trailing (unclosed) windows are emitted too
    * and the result equals the batch query exactly. */
  def streamWindow(s: SparkSession, dir: String): DataFrame =
    streamWindowOver(s, eventsStream(s, dir), "graft_stream_window")

  private[graft] def streamWindowOver(s: SparkSession, in: DataFrame,
      sink: String): DataFrame = {
    val agg = in
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1e6).cast("long")).as("sv"))
    runToCompletion(agg, sink, "complete")
    s.table(sink)
      .select(col("window.start").as("bucket"), col("event_type"), col("n"),
        round(col("sv").cast("double") / 1e6, 6).as("sum_value"))
      .orderBy(col("bucket").asc, col("event_type").asc)
  }

  /** Streaming dedup via `dropDuplicatesWithinWatermark` — the
    * operator whose state actually EVICTS at the watermark (plain
    * dropDuplicates without the event-time column in the key keeps
    * its key set forever, which voids the O(horizon) claim); a key is
    * re-emitted if it reappears after its state expired, which the
    * distinct sink rollup absorbs. The 35-day delay covers the full
    * disorder of the replay harness (same setting as the
    * stream-stream join), so no input row is late-dropped and the
    * rollup — the distinct key set per event type, invariant to which
    * duplicate survived — is oracle-exact; a production deployment
    * shortens the delay to its real disorder bound and state becomes
    * O(horizon × arrival rate). */
  def streamDedup(s: SparkSession, dir: String): DataFrame =
    streamDedupOver(s, eventsStream(s, dir), "graft_stream_dedup")

  private[graft] def streamDedupOver(s: SparkSession, in: DataFrame,
      sink: String, delay: String = "35 days"): DataFrame = {
    val dedup = in
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    runToCompletion(dedup, sink, "append")
    // Defensive distinct: state expiry legally re-emits a key that
    // reappears later — the OUTPUT contract is the distinct key set,
    // so dedupe the sink before rolling up rather than assuming
    // single-emission.
    s.table(sink).distinct()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_keys"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type").asc)
  }

  /** Continuous theta-sketch maintenance — the streaming twin of
    * [[graft.operators.Sketches.thetaSketch]]: the sketch's whole
    * state is the distinct (type, user) MEMBERSHIP (the θ-sample bit
    * is a pure function of the key, so maintaining membership IS
    * maintaining the sketch), kept at ingest by watermark-bounded
    * streaming dedup; the pair-overlap estimates are the serve-side
    * rollup over that maintained table. Same oracle as the batch row
    * — the hash match proves at-ingest maintenance ≡ batch build,
    * and the replay spec proves it under adversarial micro-batch
    * splits. State: one entry per live (type, user) key within the
    * horizon — the q_stream_dedup bound; re-emission after state
    * expiry is absorbed by the rollup's distinct (membership is a
    * set, idempotent by definition). */
  def streamTheta(s: SparkSession, dir: String): DataFrame =
    streamThetaOver(s, eventsStream(s, dir), "graft_stream_theta")

  private[graft] def streamThetaOver(s: SparkSession, in: DataFrame,
      sink: String): DataFrame = {
    val member = in
      .withWatermark("ts", "35 days")
      .dropDuplicatesWithinWatermark("event_type", "user_id")
      .select(col("event_type").as("t"), col("user_id").as("u"))
    runToCompletion(member, sink, "append")
    graft.operators.Sketches.thetaSketchOver(s.table(sink))
  }

  /** Continuous HLL-register maintenance — the streaming form of
    * [[graft.operators.Sketches.hllDistinct]]'s register build, over
    * the (event_type, user_id) stream: the 256-register max-rho
    * sketch is maintained AT INGEST by a complete-mode streaming
    * aggregation whose whole state is the register table itself —
    * O(types × 256) entries regardless of arrival volume, the
    * at-scale distinct-count shape (contrast the theta twin, whose
    * state is the live membership). The exact-distinct audit column
    * (batch row convention: the sketch is never trusted blind) rides
    * a second, watermark-bounded dedup stream; the serve-side fold
    * is the SAME [[graft.operators.Sketches.hllEstimate]] the batch
    * row uses, so stream-maintained registers provably feed the
    * identical estimator. max is associative/commutative/idempotent,
    * so the register table is exact under any micro-batch split or
    * replay — the q_stream_window argument. */
  def streamHll(s: SparkSession, dir: String): DataFrame =
    streamHllOver(s, eventsStream(s, dir), "graft_stream_hll")

  private[graft] def streamHllOver(s: SparkSession, in: DataFrame,
      sink: String): DataFrame = {
    import graft.operators.Sketches
    val h = graft.functions.MinHash.hash60(
      concat(lit("hll:"), col("user_id").cast("string")))
    val prep = in.select(col("event_type").as("g"),
      pmod(h, lit(Sketches.HllM.toLong)).as("bucket"),
      Sketches.hllRho(shiftright(h, 8).bitwiseAND(lit(0xffffL)))
        .as("rho"),
      col("user_id").as("k"), col("ts"))
    val regs = prep.groupBy(col("g"), col("bucket"))
      .agg(max(col("rho")).as("m"))
    val member = prep
      .withWatermark("ts", "35 days")
      .dropDuplicatesWithinWatermark("g", "k")
      .select(col("g"), col("bucket"), col("k"))
    // The register stream and the exact-audit membership stream are
    // independent (disjoint sinks, checkpoints, state stores) — run
    // them concurrently so the twin pays ONE stream-machinery floor,
    // not two in sequence (r12; measured 1.9 s → 1.0 s at sf0.1).
    runAllToCompletion(Seq(
      (regs, sink + "_regs", "complete"),
      (member, sink + "_mem", "append")))
    val nd = s.table(sink + "_mem").distinct()
      .groupBy(col("g"), col("bucket"))
      .agg(countDistinct(col("k")).as("nd"))
    Sketches.hllEstimate(
        s.table(sink + "_regs").join(nd, Seq("g", "bucket")))
      .withColumnRenamed("g", "event_type")
      .orderBy(col("event_type").asc)
  }

  /** Continuous OHLC candle maintenance — the streaming twin of
    * [[graft.operators.TimeSeries.ohlc]]: the per-(type, day) candle
    * is maintained AT INGEST by a complete-mode streaming aggregation
    * over the shared [[graft.operators.TimeSeries.ohlcAgg]]
    * definition — open/close are lexicographic (us, id, value)
    * struct extremes, so every column of the candle is associative/
    * commutative and the maintained state (one candle per open
    * (type, day) cell) is exact under any micro-batch split or
    * arrival order. Same oracle as the batch row. */
  def streamOhlc(s: SparkSession, dir: String): DataFrame =
    streamOhlcOver(s, eventsStream(s, dir), "graft_stream_ohlc")

  private[graft] def streamOhlcOver(s: SparkSession, in: DataFrame,
      sink: String): DataFrame = {
    import graft.operators.TimeSeries
    runToCompletion(TimeSeries.ohlcAgg(TimeSeries.ohlcProject(in)),
      sink, "complete")
    s.table(sink).orderBy(col("event_type").asc, col("d").asc)
  }

  /** Continuous CHANGEPOINT monitoring — the q_changepoint twin: the
    * detector's whole input is the (type, hour) count table, which
    * is exactly the q_stream_window maintained state (watermarked
    * tumbling counts, complete mode so unclosed windows emit too);
    * the split scan runs serve-side over that tiny table each time
    * the monitor is read. Same oracle as the batch row — continuous
    * count maintenance ≡ batch scan, graded hash-exact; count
    * aggregation is order/split-invariant so the replay spec holds
    * by the q_stream_window argument. */
  def streamChangepoint(s: SparkSession, dir: String): DataFrame =
    streamChangepointOver(s, eventsStream(s, dir), "graft_stream_cp")

  private[graft] def streamChangepointOver(s: SparkSession, in: DataFrame,
      sink: String): DataFrame = {
    val agg = in
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    runToCompletion(agg, sink, "complete")
    graft.operators.Relational.changepointScan(
      s.table(sink).select(col("event_type"),
        col("window.start").as("bucket"), col("c")))
  }

  final case class UpEvent(user_id: Long, event_type: String,
    event_id: Long, us: Long)
  final case class UpWinner(us: Long, event_id: Long)
  final case class UpOut(user_id: Long, event_type: String,
    event_id: Long, us: Long)

  /** Streaming CDC latest-wins compaction — the continuous half of
    * the keyed upsert write path ([[graft.operators.Ingest
    * .mergeUpsert]] applies a batch; this maintains the snapshot as
    * events arrive) and the streaming twin of
    * [[graft.operators.Dedup.dedupLatest]]. Custom state via
    * `flatMapGroupsWithState`: per (user_id, event_type) key the
    * state is ONLY the current winner (us, event_id) — two longs, the
    * O(1)-per-key state bound a CDC compactor needs at 100 TB (no
    * history, no horizon; contrast the sessionizer, whose semantics
    * force an open-suffix buffer). A batch emits a row only when its
    * max improves the winner; winners per key are therefore monotone
    * across emissions, so the sink rollup (max per key) is exact
    * under ANY micro-batch split or arrival order — max is
    * associative, commutative, and replay-idempotent. */
  def streamLatest(s: SparkSession, dir: String): DataFrame =
    streamLatestOver(s, eventsStream(s, dir), "graft_stream_latest")

  /** Typed (user_id, event_type, event_id, us) event stream — the
    * shared projection of both latest-wins compactors. */
  private def upEvents(s: SparkSession,
      in: DataFrame): org.apache.spark.sql.Dataset[UpEvent] = {
    import s.implicits._
    in.select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .as[UpEvent]
  }

  /** Max-struct winner rollup of a latest-wins sink — idempotent
    * under the compactors' monotone winner emissions; shared by both
    * state-API variants (a drift here would let the fMGWS and
    * transformWithState rows disagree against the same oracle). */
  private def latestSinkRollup(s: SparkSession, sink: String): DataFrame =
    s.table(sink)
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(col("us"), col("event_id"))).as("w"))
      .select(col("user_id"), col("event_type"),
        col("w.event_id").as("event_id"), col("w.us").as("us"))
      .orderBy(col("user_id").asc, col("event_type").asc)

  private[graft] def streamLatestOver(s: SparkSession, in: DataFrame,
      sink: String): DataFrame = {
    import s.implicits._
    val winners = upEvents(s, in).groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[UpWinner, UpOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((uid, et), evs, state: GroupState[UpWinner]) =>
          val incoming = evs.map(e => (e.us, e.event_id)).max
          val improved = state.getOption
            .forall(w => Ordering[(Long, Long)].lt((w.us, w.event_id),
              incoming))
          if (improved) {
            state.update(UpWinner(incoming._1, incoming._2))
            Iterator.single(UpOut(uid, et, incoming._2, incoming._1))
          } else Iterator.empty
      }
    runToCompletion(winners.toDF(), sink, "append")
    latestSinkRollup(s, sink)
  }

  /** The latest-wins compactor on Spark 4's `transformWithState` —
    * the CURRENT arbitrary-state API (StatefulProcessor + typed state
    * handles over the RocksDB store; `flatMapGroupsWithState` is the
    * legacy surface [[streamLatest]] keeps for comparison). Same
    * contract: ValueState holds ONE (us, event_id) winner per
    * (user_id, event_type) key — O(1) state — and a row emits only
    * when the winner improves, so winners are monotone and the
    * max-rollup sink read is exact under any split or disorder. At
    * 100 TB/day the RocksDB store adds changelog checkpointing and
    * out-of-heap state the HDFS-backed store lacks — this is the
    * deployment-grade variant. */
  final class LatestWinsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        (Long, String), UpEvent, UpOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues,
      TTLConfig, ValueState}
    @transient private var winner: ValueState[UpWinner] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      winner = getHandle.getValueState[UpWinner]("winner",
        org.apache.spark.sql.Encoders.product[UpWinner], TTLConfig.NONE)
    override def handleInputRows(key: (Long, String),
        rows: Iterator[UpEvent], tv: TimerValues): Iterator[UpOut] = {
      val incoming = rows.map(e => (e.us, e.event_id)).max
      val improved = !winner.exists() ||
        Ordering[(Long, Long)].lt(
          (winner.get().us, winner.get().event_id), incoming)
      if (improved) {
        winner.update(UpWinner(incoming._1, incoming._2))
        Iterator.single(UpOut(key._1, key._2, incoming._2, incoming._1))
      } else Iterator.empty
    }
  }

  def streamLatestTws(s: SparkSession, dir: String): DataFrame =
    streamLatestTwsOver(s, eventsStream(s, dir), "graft_stream_latest_tws")

  /** transformWithState runs on the RocksDB state store; scope the
    * provider to the enclosed stream run and restore the session
    * default after — ONE definition for every tws query (a restore
    * bug fixed here fixes all of them). */
  private def withRocksDBProvider[A](s: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  private[graft] def streamLatestTwsOver(s: SparkSession, in: DataFrame,
      sink: String): DataFrame = {
    import org.apache.spark.sql.streaming.TimeMode
    import s.implicits._
    val winners = upEvents(s, in).groupByKey(e => (e.user_id, e.event_type))
      .transformWithState(new LatestWinsProcessor,
        TimeMode.None(), OutputMode.Append())
    withRocksDBProvider(s) {
      runToCompletion(winners.toDF(), sink, "append")
    }
    latestSinkRollup(s, sink)
  }

  /** Tombstone divisor for the streaming-erasure twin: an event with
    * hash60('tomb:' || event_id) ≡ 0 (mod 5) is its user's DELETE op
    * (~20%, content-independent so the oracle replicates the op
    * stream exactly). */
  private[graft] val TombMod = 5L

  final case class TombEvent(user_id: Long, event_id: Long, us: Long,
    is_del: Boolean)
  final case class TombWinner(us: Long, event_id: Long, is_del: Boolean)
  final case class TombOut(user_id: Long, event_id: Long, us: Long,
    is_del: Boolean)

  /** Latest-wins compactor WITH delete tombstones — the streaming
    * right-to-be-forgotten path (the continuous twin of the batch
    * q_forget erasure pass, on the CDC shape of q_stream_latest): a
    * user's serving row is their latest event UNLESS that latest op
    * is a tombstone, in which case the user is ABSENT from the
    * snapshot — true erasure, not a masked row. State is one
    * (us, event_id, is_del) winner per user — O(1), no history — and
    * a row emits only when the winner improves, so emissions stay
    * monotone in (us, event_id) and the max-struct sink rollup (with
    * the tombstone filter applied AFTER the rollup) is exact under
    * any micro-batch split or arrival order, the same replay proof
    * as [[streamLatest]]. Deletes that are later overtaken by a
    * newer upsert correctly resurface the user (CDC semantics); a
    * final tombstone erases them. */
  final class ForgetProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TombEvent, TombOut] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues,
      TTLConfig, ValueState}
    @transient private var winner: ValueState[TombWinner] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      winner = getHandle.getValueState[TombWinner]("winner",
        org.apache.spark.sql.Encoders.product[TombWinner], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[TombEvent],
        tv: TimerValues): Iterator[TombOut] = {
      val best = rows.maxBy(e => (e.us, e.event_id))
      val improved = !winner.exists() ||
        Ordering[(Long, Long)].lt(
          (winner.get().us, winner.get().event_id), (best.us, best.event_id))
      if (improved) {
        winner.update(TombWinner(best.us, best.event_id, best.is_del))
        Iterator.single(TombOut(key, best.event_id, best.us, best.is_del))
      } else Iterator.empty
    }
  }

  def streamForget(s: SparkSession, dir: String): DataFrame =
    streamForgetOver(s, eventsStream(s, dir), "graft_stream_forget")

  private[graft] def streamForgetOver(s: SparkSession, in: DataFrame,
      sink: String): DataFrame = {
    import org.apache.spark.sql.streaming.TimeMode
    import s.implicits._
    val evs = in.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        (pmod(graft.functions.MinHash.hash60(
          concat(lit("tomb:"), col("event_id").cast("string"))),
          lit(TombMod)) === 0).as("is_del"))
      .as[TombEvent]
    val winners = evs.groupByKey(_.user_id)
      .transformWithState(new ForgetProcessor,
        TimeMode.None(), OutputMode.Append())
    withRocksDBProvider(s) {
      runToCompletion(winners.toDF(), sink, "append")
    }
    s.table(sink)
      .groupBy(col("user_id"))
      .agg(max(struct(col("us"), col("event_id"), col("is_del"))).as("w"))
      .where(!col("w.is_del"))
      .select(col("user_id"), col("w.event_id").as("event_id"),
        col("w.us").as("us"))
      .orderBy(col("user_id").asc)
  }

  /** Native watermarked STREAM-STREAM inner join — Spark's built-in
    * symmetric-hash join operator (clicks ⋈ purchases by user within
    * [click, click+1h]), the third join tier next to the batch
    * temporal joins and the custom fMGWS as-of resolvers. Both sides
    * carry a watermark and the join predicate carries the time-range
    * bound, so each side's state retains only the
    * watermark-plus-window suffix — O(horizon × arrival rate)
    * entries, the bounded-state contract of a continuous join at
    * 100 TB/day. An inner join emits a pair exactly when the later
    * side arrives (no watermark-close latency), so the emitted pair
    * set equals the batch join under any micro-batch split whose
    * disorder stays inside the watermark delay — asserted against an
    * adversarial out-of-order replay in StreamingSpec and against
    * the batch-SQL oracle by the correctness gate. */
  def streamJoin(s: SparkSession, dir: String): DataFrame =
    streamJoinOver(s, eventsStream(s, dir), "graft_stream_join")

  private[graft] def streamJoinOver(s: SparkSession, in: DataFrame,
      sink: String): DataFrame = {
    val clicks = in.where(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "35 days")
    val purchases = in.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "35 days")
    val pairs = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("c_ts") &&
          col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("c_id"), col("user_id"), col("p_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
    runToCompletion(pairs, sink, "append")
    // (c_id, p_id) pairs are unique by construction; the defensive
    // distinct absorbs any epoch-replay duplication in the sink.
    s.table(sink).distinct()
      .orderBy(col("c_id").asc, col("p_id").asc)
  }

  /** Per-event input / versioned per-session output / carried state
    * for the custom-state sessionizer. State holds the per-user
    * (us, event_id) history plus the emission version — the finite
    * replay keeps the full history for disorder-exactness; an
    * unbounded deployment prunes it at the watermark. */
  final case class SessEvent(user_id: Long, event_id: Long, us: Long)
  final case class SessState(events: Seq[(Long, Long)], ver: Long)
  final case class SessOutV(user_id: Long, ver: Long, sess_idx: Long,
      n_events: Long, start_us: Long, dur_us: Long)

  /** Gap-based sessionization (>30 min inactivity breaks a session)
    * as a `flatMapGroupsWithState` stateful operator — the
    * KeyValueGroupedDataset custom-state API the mandate calls for.
    *
    * Exact under ANY micro-batch split or arrival order: state per
    * user holds the (us, event_id) history; each batch re-sessionizes
    * the full history and re-emits the user's complete session list
    * tagged with a monotone version, and the sink read keeps only
    * each user's LATEST version. A late gap-filling event can merge
    * two previously-emitted sessions — an append sink cannot retract
    * rows, but versioning makes stale emissions invisible. (A
    * max-per-key rollup is NOT enough: session indices shift when
    * late events change the gap structure — the multi-batch
    * out-of-order replay test in StreamingSpec fails that design.)
    *
    * Scale design: state is hash-partitioned by user_id (cardinality
    * grows with data — no fixed-key funnel). The finite replay keeps
    * the full per-user history so the result is exact under
    * arbitrary disorder; an unbounded deployment prunes the buffer at
    * the watermark (events older than the horizon collapse into the
    * closed-session prefix, emitted once and dropped), giving
    * O(open-horizon) state per user with the identical resolution
    * logic. */
  def streamSessionize(s: SparkSession, dir: String): DataFrame =
    streamSessionizeOver(s, eventsStream(s, dir), "graft_stream_sessionize")

  /** The sessionize pipeline over an arbitrary events stream —
    * test-injectable so the multi-micro-batch out-of-order replay
    * path is exercised with split input files (StreamingSpec). */
  private[graft] def streamSessionizeOver(s: SparkSession,
      in: DataFrame, sink: String): DataFrame = {
    import s.implicits._
    val gapUs = 30L * 60L * 1000000L
    val events = in
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[SessEvent]

    val sessions = events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessOutV](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[SessState]) =>
          val st = state.getOption.getOrElse(SessState(Nil, 0L))
          val all = (st.events ++ evs.map(e => (e.us, e.event_id)))
            .sortBy(identity)
          val ver = st.ver + 1
          val out = Seq.newBuilder[SessOutV]
          var idx = 0L
          var start = 0L
          var last = 0L
          var n = 0L
          for ((us, _) <- all) {
            if (n == 0L) { idx = 1L; start = us; last = us; n = 1L }
            else if (us - last > gapUs) {
              out += SessOutV(uid, ver, idx, n, start, last - start)
              idx += 1; start = us; last = us; n = 1L
            } else { last = us; n += 1L }
          }
          if (n > 0L) out += SessOutV(uid, ver, idx, n, start, last - start)
          state.update(SessState(all, ver))
          out.result().iterator
      }

    runToCompletion(sessions.toDF(), sink, "append")
    // Latest-version-wins sink read: only the rows of each user's
    // final re-emission count; earlier versions are stale.
    latestVersionRows(s.table(sink))
      .select(col("user_id"), col("sess_idx"), col("n_events"),
        col("start_us"), col("dur_us"))
      .orderBy(col("user_id").asc, col("sess_idx").asc)
  }

  /** Watermark-PRUNED sessionizer state: `baseIdx` closed-and-
    * finalized sessions precede the retained open-suffix events. */
  final case class SessStateWm(baseIdx: Long, events: Seq[(Long, Long)],
      ver: Long)

  /** Event row for the watermark-pruned resolvers: carries the
    * watermark-tagged `ts` column through to the stateful operator
    * (Spark requires the tagged event-time column in the operator's
    * input to expose `getCurrentWatermarkMs`). */
  final case class SessEventW(user_id: Long, event_id: Long, us: Long,
      ts: java.sql.Timestamp)
  final case class AsofEventW(user_id: Long, event_id: Long, us: Long,
      side: Int, ts: java.sql.Timestamp)

  /** PRODUCTION variant of [[streamSessionize]]: same gap semantics,
    * state pruned at the event-time watermark instead of growing with
    * the full per-user history.
    *
    * Pruning invariant: a session whose last event is older than
    * `watermark − gap` can never re-open (late rows behind the
    * watermark are dropped upstream, so every future event has
    * ts ≥ watermark, i.e. gap-exceeding distance from the closed
    * session). Such sessions are emitted ONCE as FINAL (`ver = -1`)
    * and their events leave the state; only the open suffix —
    * O(horizon) events — is retained and re-emitted under the
    * monotone version. The sink read unions final rows with each
    * user's latest-version open rows; a finalizing invocation always
    * also emits a fresh open version (its trigger event is ≥ the
    * watermark, hence in the open suffix), so stale versions that
    * still contain the finalized sessions are always superseded.
    *
    * Exactness contract: identical to the batch sessionizer for any
    * disorder BOUNDED by the watermark horizon (the standard
    * streaming contract); the keep-all variant above stays exact
    * under arbitrary disorder at the cost of unbounded state. Both
    * are asserted in StreamingSpec; the correctness gate proves this
    * variant equals the batch oracle end-to-end. */
  def streamSessionizeWm(s: SparkSession, dir: String): DataFrame =
    streamSessionizeWmOver(s, eventsStream(s, dir),
      "graft_stream_sessionize_wm")

  private[graft] def streamSessionizeWmOver(s: SparkSession,
      in: DataFrame, sink: String, horizon: String = "2 hours"): DataFrame = {
    import s.implicits._
    val gapUs = 30L * 60L * 1000000L
    val events = in
      .withWatermark("ts", horizon)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("ts"))
      .as[SessEventW]

    val sessions = events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessStateWm, SessOutV](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[SessStateWm]) =>
          val st = state.getOption.getOrElse(SessStateWm(0L, Nil, 0L))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // Explicit late-row guard: fMGWS under NoTimeout does NOT
          // filter behind-watermark input (Spark applies that filter
          // only under EventTimeTimeout), so enforce the contract
          // here — a beyond-horizon row DROPS (the standard streaming
          // degradation) instead of resequencing into state whose
          // sessions were already emitted as final.
          val all = (st.events ++ evs.filter(_.us >= wmUs)
            .map(e => (e.us, e.event_id)))
            .sortBy(identity)
          // Sessionize the retained window; indices offset by the
          // already-finalized prefix.
          val sess = Seq.newBuilder[(Long, Long, Long, Long)] // idx,n,start,last
          var idx = st.baseIdx
          var start = 0L; var last = 0L; var n = 0L
          for ((us, _) <- all) {
            if (n == 0L) { idx += 1; start = us; last = us; n = 1L }
            else if (us - last > gapUs) {
              sess += ((idx, n, start, last))
              idx += 1; start = us; last = us; n = 1L
            } else { last = us; n += 1L }
          }
          if (n > 0L) sess += ((idx, n, start, last))
          val built = sess.result()
          // Split closed-forever prefix from the open suffix.
          val (closed, open) = built.span(_._4 < wmUs - gapUs)
          val out = Seq.newBuilder[SessOutV]
          for ((i, cn, cs, cl) <- closed)
            out += SessOutV(uid, -1L, i, cn, cs, cl - cs)
          val ver = st.ver + 1
          for ((i, on, os, ol) <- open)
            out += SessOutV(uid, ver, i, on, os, ol - os)
          val keepFrom = if (open.isEmpty) Long.MaxValue else open.head._3
          state.update(SessStateWm(st.baseIdx + closed.length,
            all.filter(_._1 >= keepFrom), ver))
          out.result().iterator
      }

    runToCompletion(sessions.toDF(), sink, "append")
    val t = s.table(sink)
    val finals = t.where(col("ver") === -1L)
    val opens = latestVersionRows(t.where(col("ver") > 0L))
    finals.select(col("user_id"), col("sess_idx"), col("n_events"),
        col("start_us"), col("dur_us"))
      .unionAll(opens.select(col("user_id"), col("sess_idx"),
        col("n_events"), col("start_us"), col("dur_us")))
      .orderBy(col("user_id").asc, col("sess_idx").asc)
  }

  /** Streaming reader over the documents parquet (footer-only schema
    * read, then a glob-filtered file stream — same harness as
    * [[eventsStream]]). */
  private def documentsStream(s: SparkSession, dir: String): DataFrame = {
    val schema = footerSchema(s, s"$dir/documents.parquet")
    s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
  }

  /** Stateless streaming twin of the quality scorer
    * ([[graft.operators.TextAnalysis.qualityScore]]) — the
    * score-at-ingest shape of a continuously-fed corpus. Map-only:
    * no watermark, no state store; every micro-batch appends its
    * scored rows, so the sink equals the batch query whatever the
    * batch split. */
  def streamQuality(s: SparkSession, dir: String): DataFrame = {
    val scored = graft.operators.TextAnalysis
      .qualityProjection(documentsStream(s, dir))
    runToCompletion(scored, "graft_stream_quality", "append")
    s.table("graft_stream_quality").orderBy(col("doc_id").asc)
  }

  /** CONTINUOUS text-index maintenance — the streaming face of the
    * append-only inverted index (the batch O(batch) refresh is
    * q_text_incremental / Retrieval.appendBm25Delta; this is the
    * same contract fed by a STREAM): each arriving document emits
    * its posting DELTA rows map-only — per-doc tf computed inside
    * the row from the token array (the one-pass
    * [[graft.plans.TermFreqs]] kernel: O(len) per doc where the
    * prior array_distinct + per-term filter-count form was
    * O(len × distinct), quadratic on long documents — no
    * aggregation, no watermark, no state store), so any
    * micro-batch split appends exactly the same delta multiset. The
    * sink rollup (per term: df = posting count, tf mass) must then
    * equal the one-shot batch index content whatever the split —
    * which is precisely the additive-delta property the stored
    * index's probe relies on when it sums df/stats rows.
    *
    * Scale: the stream side is stateless and map-only (the 100 TB
    * shape: ingest emits deltas, the index table absorbs appends);
    * the rollup here stands in for the partitioned index write. */
  def streamIndex(s: SparkSession, dir: String): DataFrame =
    streamIndexOver(s, documentsStream(s, dir), "graft_stream_index")

  private[graft] def streamIndexOver(s: SparkSession, in: DataFrame,
      sink: String): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val deltas = in
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(graft.plans.TermFreqs(col("toks"))).as("p"))
      .select(col("doc_id"), col("dl"),
        col("p.term").as("term"), col("p.tf").as("tf"))
    runToCompletion(deltas, sink, "append")
    s.table(sink)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_sum"))
      .select(col("term"),
        graft.operators.Retrieval.termBucket("tb:", col("term")).as("tb"),
        col("df"), col("tf_sum"))
      .orderBy(col("term").asc)
  }

  /** Streaming reader over the embeddings parquet, vector pre-cast
    * to array<double> like the batch reader ([[graft.Tables
    * .embeddings]]) so stream-side similarities are double-exact. */
  private def embeddingsStream(s: SparkSession, dir: String): DataFrame = {
    val schema = footerSchema(s, s"$dir/embeddings.parquet")
    s.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir)
      .withColumn("embedding", col("embedding").cast("array<double>"))
  }

  /** Query vectors with vec_id ≡ 0 (mod this) stream in as the
    * online side of [[streamAnn]]; the rest are the standing corpus. */
  val StreamAnnQMod = 25L

  /** ONLINE ANN SERVING — the streaming twin of q_ann_ivf and the
    * live face of the reference's search path (reference:
    * db/search_strategies.py:217-255 search_ambiguous runs one
    * vector query per user request against the standing pgvector
    * index; db/init.sql:50-52). Queries arrive as a STREAM of
    * vectors; the standing side is the IVF index q_ann_ivf serves
    * from ([[graft.operators.Ann.ivfServingSide]] — same quantizer
    * definition, so stream results are provably results of the same
    * index).
    *
    * Per micro-batch, everything before the final top-k is
    * STATELESS and map-only: each query row computes its own
    * NProbe=2 probe cells against the broadcast centroid array
    * ([[graft.operators.Ann.probeCellsTop2]] — a per-row argmin
    * chain, no aggregation), explodes to (qid, cell), and
    * stream-static equi-joins the celled corpus — the candidate
    * read is ∝ probed-cell occupancy, exactly like the batch probe.
    * The only state is the per-qid bounded top-k buffer
    * ([[graft.plans.TopKByScore]], ≤ k entries per active query).
    * Complete output mode because the memory-sink harness re-emits
    * the full result set per batch; a production deployment runs
    * update mode and each query's row goes out when its batch
    * commits. At 100 TB the corpus side is the partition-pruned
    * stored index ([[graft.operators.Ann.writeIvfIndex]]); the
    * stream side's per-batch work is queries × probe-cell occupancy,
    * corpus-scan-free. */
  def streamAnn(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    streamAnnOver(s, embeddingsStream(s, dir),
      e.where(col("vec_id") % StreamAnnQMod =!= 0), "graft_stream_ann", k)
  }

  /** `in`: any stream with the embeddings schema; `corpus`: any
    * (vec_id, embedding array<double>) relation (replay harness and
    * scale-smoke injection points). The query rows are selected from
    * the stream by [[StreamAnnQMod]]. */
  private[graft] def streamAnnOver(s: SparkSession, in: DataFrame,
      corpus: DataFrame, sink: String, k: Int = 10): DataFrame = {
    // FREEZE the standing side before the stream starts — the
    // deployment shape (queries probe a stored IVF index; nothing
    // rebuilds the quantizer per micro-batch). Without the cut, the
    // stream-static join re-evaluates the celled corpus AND the
    // centroid build (a corpus-wide aggregate) inside every
    // trigger's addBatch: measured 1.5-2.1 s of the twin's addBatch
    // at sf0.1 was quantizer rebuild, not probe work. localCheckpoint
    // materializes both once; per-batch cost is then queries ×
    // probe-cell occupancy, exactly the stored-index serving claim.
    val (a1u, centArrU) = Ann.ivfServingSide(corpus)
    val (a1, centArr) = (a1u.localCheckpoint(), centArrU.localCheckpoint())

    val queries = in
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .where(col("vec_id") % StreamAnnQMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // Constant-key equi-join against the one-row broadcast centroid
    // array (spells "stream-static broadcast join" in a form the
    // streaming planner always accepts).
    val probed = queries.withColumn("one", lit(1))
      .join(broadcast(centArr.withColumn("one", lit(1))), "one")
      .select(col("qid"), col("qvec"),
        explode(Ann.probeCellsTop2(col("qvec"), col("cents"))).as("cell"))
    val scored = probed.join(a1, Seq("cell"))
      .select(col("qid"),
        col("vec_id"), cosineSim(col("embedding"), col("qvec")).as("sim"))
    val topk = scored.groupBy(col("qid"))
      .agg(graft.plans.TopKByScore(col("sim"), col("vec_id"), k).as("tk"))
    runToCompletion(topk, sink, "complete")
    s.table(sink)
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col.id").as("vec_id"),
        round(col("col.score"), 6).as("sim"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy(col("qid").asc, col("rnk").asc)
  }

  /** q_stream_multimodal — media-METADATA extraction at ingest, the
    * streaming face of [[graft.multimodal.Multimodal.multimodalMeta]]
    * (binary payloads arrive continuously; their typed metadata —
    * byte length, content hash, magic-number format sniff — is
    * extracted before the payloads land in storage, so routing /
    * dedup / quota decisions never need a second pass over the
    * bytes). Shares the batch row's projection
    * ([[graft.multimodal.Multimodal.metaProjection]]) so the
    * extraction cannot drift between them; map-only and stateless,
    * so any micro-batch split appends the same rows and the sink
    * equals the batch query exactly (same oracle). */
  def streamMultimodal(s: SparkSession, dir: String): DataFrame = {
    val meta = graft.multimodal.Multimodal.metaProjection(
      graft.multimodal.Multimodal.payloadsOver(documentsStream(s, dir)))
    runToCompletion(meta, "graft_stream_mm", "append")
    s.table("graft_stream_mm").orderBy(col("doc_id").asc)
  }

  /** q_stream_table — the EXACTLY-ONCE FILE SINK, the streaming twin
    * of q_table_version and the one twin that lands in DURABLE
    * storage instead of a memory sink: every micro-batch commits as
    * one [[graft.sources.VersionedTable]] version keyed by its
    * batchId (batch 0 = the base snapshot, later batches = append
    * manifests), and the commit is IDEMPOTENT on the batch id — a
    * batch replayed after a crash/retry finds its id already
    * committed and no-ops. That version-per-batchId transaction rule
    * is exactly how a lakehouse streaming sink turns foreachBatch's
    * at-least-once delivery into exactly-once table contents
    * (reference intent: the continuously-upserted store of
    * db/ingest_cards.py, landed durably). Serving reads the LATEST
    * version back THROUGH THE MANIFESTS and aggregates the
    * per-source census, which must equal the one-shot batch profile
    * whatever the micro-batch split — the gate grades the round-trip
    * through real files, not a memory table.
    *
    * Scale: each commit is O(batch) (append manifests list only the
    * new files); the read resolves the manifest chain — never a
    * directory listing; periodic `commit` (snapshot) compaction
    * bounds chain length exactly like the text tier's LSM pair. */
  def streamTable(s: SparkSession, dir: String): DataFrame = {
    // Fresh table root per execution: the graded row REBUILDS its
    // sink each run like every twin; a deployment passes a durable
    // root and keeps the chain. The per-source census is a bounded
    // handful of rows, so it is materialized (localCheckpoint cuts
    // the lineage back to the parquet chain) and the table root
    // deleted before returning — the lazy formulation pinned a full
    // projected copy of the corpus under java.io.tmpdir per
    // invocation (the bench runs 5 passes per SF: unbounded tmp
    // growth).
    val table = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_stream_table_${java.util.UUID.randomUUID()}"
    try streamTableOver(s, documentsStream(s, dir), table)
      .localCheckpoint(eager = true)
    finally graft.sources.VersionedTable.deleteRecursively(
      new java.io.File(table))
  }

  private[graft] def streamTableOver(s: SparkSession, in: DataFrame,
      table: String): DataFrame = {
    import graft.sources.VersionedTable
    val proj = in.select(col("doc_id"), col("source"), col("n_chars"))
    val land: (DataFrame, Long) => Unit =
      (b, id) => { VersionedTable.commitBatch(b, table, id); () }
    withOneShotCheckpointIO(s) {
      val q = proj.writeStream
        .foreachBatch(land)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // ids_digest is the order-invariant sum(hash60(doc_id)) census —
    // O(1) agg state per task and shard-mergeable, where the r11
    // collect_list formulation buffered every doc_id of a source in
    // one task (unbounded at 100 TB).
    VersionedTable.read(s, table)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(graft.functions.MinHash.hash60(col("doc_id").cast("string"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("string").as("ids_digest"))
      .orderBy(col("source").asc)
  }

  /** q_stream_mview — EXACTLY-ONCE INCREMENTAL VIEW MAINTENANCE,
    * the streaming capstone of the VersionedTable tier (q_stream
    * _table lands data exactly once; q_table_mview folds a change
    * feed; this row chains them under replay): every micro-batch
    * (1) lands in the DATA table as a version keyed by its batchId,
    * (2) derives its delta census from [[graft.sources
    * .VersionedTable.readChanges]] over exactly that version — the
    * manifests' own files, O(batch) — and (3) merges the delta into
    * a standing VIEW table committed as a snapshot keyed by the SAME
    * batchId. Idempotence hangs off the VIEW (the final consumer):
    * a replayed batch whose id the view has recorded is a no-op;
    * a crash BETWEEN the data commit and the view commit replays
    * safely because the data commit is itself idempotent and the
    * delta re-derives deterministically from the manifests — the
    * end-to-end exactly-once argument, not per-step. The graded
    * read is the view's LATEST version, which must equal the
    * one-shot batch census whatever the micro-batch split (same
    * oracle as q_stream_table).
    *
    * Scale: per batch O(batch + |view|) — the change set resolves
    * from the append manifest (never the standing table) and the
    * view is per-source-bounded; the standing aggregate is never
    * recomputed from the data table. */
  def streamMview(s: SparkSession, dir: String): DataFrame = {
    val root = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_stream_mview_${java.util.UUID.randomUUID()}"
    try streamMviewOver(s, documentsStream(s, dir), root)
      .localCheckpoint(eager = true)
    finally graft.sources.VersionedTable.deleteRecursively(
      new java.io.File(root))
  }

  /** One micro-batch of the mview pipeline — package-private so the
    * replay spec can drive duplicate/late batch ids directly. */
  private[graft] def landMviewBatch(s: SparkSession, root: String,
      b: DataFrame, id: Long): Unit = {
    import graft.sources.VersionedTable
    val (data, view) = (s"$root/data_t", s"$root/view_t")
    if (VersionedTable.committedBatch(view, id).isEmpty) {
      val v = VersionedTable.commitBatch(b, data, id)
      val delta = mviewCensus(
        VersionedTable.readChanges(s, data, v - 1, Some(v)))
      val merged = VersionedTable.latestVersion(view) match {
        case None => delta
        case Some(pv) => VersionedTable.read(s, view, Some(pv))
          .unionByName(delta)
          .groupBy(col("source"))
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("total_chars")).as("total_chars"),
            sum(col("dig")).cast(
              org.apache.spark.sql.types.DecimalType(38, 0)).as("dig"))
      }
      VersionedTable.commitBatchSnapshot(merged, view, id)
      ()
    }
  }

  /** The additive per-source census both the delta fold and the
    * graded read share: counts/sums plus the order-invariant
    * sum-digest — every column shard- AND delta-mergeable. */
  private def mviewCensus(r: DataFrame): DataFrame =
    r.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(graft.functions.MinHash.hash60(col("doc_id").cast("string"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("dig"))

  private[graft] def streamMviewOver(s: SparkSession, in: DataFrame,
      root: String): DataFrame = {
    val proj = in.select(col("doc_id"), col("source"), col("n_chars"))
    val land: (DataFrame, Long) => Unit =
      (b, id) => landMviewBatch(s, root, b, id)
    withOneShotCheckpointIO(s) {
      val q = proj.writeStream
        .foreachBatch(land)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    graft.sources.VersionedTable.read(s, s"$root/view_t")
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("dig").cast("string").as("ids_digest"))
      .orderBy(col("source").asc)
  }

  /** q_stream_contamination — CONTINUOUS benchmark-leak guard, the
    * streaming face of [[graft.operators.Curation.contamination]]:
    * every arriving corpus document is scored against the standing
    * benchmark (eval-suite) shingle sets AT INGEST, so a
    * contaminated doc is flagged before it ever lands in a training
    * shard. The benchmark side is folded batch-side into ONE
    * broadcast row — an array of (test_id, sorted shingle-hash keys,
    * aligned occurrence counts) — and each stream row xxhash64-hashes
    * and sorts its own shingles once, then counts shared occurrences
    * per test with the [[graft.plans.SortedPairCount]] two-pointer
    * kernel (Σ_g cnt_test(g) over the doc's shingle occurrences —
    * exactly the batch row's occurrence-pair count, so the two share
    * one oracle; the r8 map-lookup fold paid a linear `element_at`
    * key scan per shingle — O(|sngs|·|test|) string compares per
    * pair, 6 s of suite marginal at sf0.1 — where the merge is
    * O(|sngs|+|test|) over longs). Map-only and STATELESS: no
    * watermark, no state store, no aggregation — any micro-batch
    * split appends the same flagged rows, which is what makes
    * stream ≡ batch exact by construction.
    *
    * Scale: eval suites are small by nature (the batch row's Bloom
    * tier bounds the broadcast at real suite sizes); the stream
    * side's per-row work is |doc shingles| × |tests| long merges,
    * corpus-scan-free and embarrassingly parallel. */
  def streamContamination(s: SparkSession, dir: String): DataFrame =
    streamContaminationOver(s, documentsStream(s, dir),
      Tables.documents(s, dir), "graft_stream_contam")

  /** `in`: any stream with the documents schema; `benchmark`: any
    * (doc_id, text) relation whose doc_id < ContamTestDocs rows are
    * the eval set (replay harness injection point). */
  private[graft] def streamContaminationOver(s: SparkSession,
      in: DataFrame, benchmark: DataFrame, sink: String): DataFrame = {
    import graft.functions.TextFunctions.wordShingles
    import graft.operators.Curation.{ContamTestDocs, ContamMinShared}
    val tests = benchmark.where(col("doc_id") < ContamTestDocs)
      .select(col("doc_id").as("test_id"),
        explode(wordShingles(col("text"), 3)).as("sng"))
      .groupBy(col("test_id"), xxhash64(col("sng")).as("h"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("test_id"))
      // sort_array over struct(h, c) orders by h (distinct within a
      // test), giving the kernel its sorted keys + aligned counts.
      .agg(sort_array(collect_list(struct(col("h"), col("c"))))
        .as("e"))
      .select(col("test_id"), col("e.h").as("keys"),
        col("e.c").as("cnts"))
      .agg(collect_list(struct(col("test_id"), col("keys"),
        col("cnts"))).as("tests"))
      .withColumn("one", lit(1))
    val flagged = in.where(col("doc_id") >= ContamTestDocs)
      .select(col("doc_id"),
        sort_array(transform(wordShingles(col("text"), 3),
          g => xxhash64(g))).as("sngs"))
      .withColumn("one", lit(1))
      // The one-row constant-key broadcast join (the streamAnnOver
      // trick): stream-static, stateless, map-only. The per-test
      // counts fold INSIDE one transform over the tests array —
      // exploding tests first would copy the doc's hash array into
      // every (doc, test) output row (the q_multimodal_pipeline
      // lesson); here only the ≥ threshold survivors explode.
      .join(broadcast(tests), "one")
      .select(col("doc_id"), explode(filter(
        transform(col("tests"), t => struct(
          t.getField("test_id").as("test_id"),
          graft.plans.SortedPairCount(col("sngs"), t.getField("keys"),
            t.getField("cnts")).as("n_shared"))),
        r => r.getField("n_shared") >= ContamMinShared)).as("r"))
      .select(col("doc_id"), col("r.test_id").as("test_id"),
        col("r.n_shared").as("n_shared"))
    runToCompletion(flagged, sink, "append")
    s.table(sink)
      .orderBy(col("n_shared").desc, col("doc_id").asc,
        col("test_id").asc)
  }

  /** q_stream_neardup — CONTINUOUS near-dup index maintenance, the
    * streaming face of [[graft.operators.Dedup.minhashLsh]]: every
    * arriving document computes its MinHash band keys AT INGEST —
    * the md5-per-token signature pass that dominates the batch
    * build — and appends them to the standing band table; the pair
    * derivation (bucket-star candidates + exact Jaccard verify)
    * serves from that table batch-side, exactly the stored
    * text-index contract (q_stream_index) applied to the dedup
    * tier. The per-row signature is the same xor-min over the same
    * hashed token set the batch groupBy computes (min over a doc's
    * feature rows ≡ `array_min` over its feature array; empty token
    * sets drop out on both paths), so sink ≡ batch signature
    * relation and the row shares q_dedup_minhash's oracle verbatim.
    * Map-only and STATELESS: no watermark, no state store — any
    * micro-batch split appends the same band rows.
    *
    * Scale: banding cost is paid once per document at ingest and
    * never re-paid by maintenance (the batch rebuild re-hashes the
    * whole corpus); the standing (doc_id, bk) table is the exact
    * relation the batch build shuffles, so candidates stay
    * star-bounded. */
  def streamNeardup(s: SparkSession, dir: String): DataFrame =
    streamNeardupOver(s, documentsStream(s, dir),
      Tables.documents(s, dir), "graft_stream_neardup")

  /** `in`: any stream with the documents schema; `corpus`: the
    * batch relation the verify stage hydrates feature sets from
    * (replay harness injection point). */
  private[graft] def streamNeardupOver(s: SparkSession, in: DataFrame,
      corpus: DataFrame, sink: String): DataFrame = {
    import graft.functions.TextFunctions.tokenSet
    import graft.operators.Dedup
    val seeds = graft.functions.MinHash.seeds
    val sigCols = seeds.zipWithIndex.map { case (sd, i) =>
      array_min(transform(col("fs"), f => f.bitwiseXOR(lit(sd))))
        .as(s"h$i")
    }
    // The signature pass (md5 per token + NumHashes xor-min folds) is
    // the batch's CPU bill paid at ingest — but a micro-batch's
    // parallelism is its FILE SPLITS, and a compact arrival file is
    // one split, serializing the whole pass on one core (measured:
    // 6-9 s for the row vs ~2 s warm at sf0.1). Redistribute rows
    // before the heavy map so signature CPU tracks cores, not arrival
    // file layout; the exchanged rows are raw (doc_id, text) — tiny
    // next to the hash work they unlock — and the op stays stateless.
    val banded = Dedup.bandKeys(in
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        transform(tokenSet(col("text")),
          f => graft.functions.MinHash.hash60(f)).as("fs"))
      .where(size(col("fs")) > 0)
      .select(col("doc_id") +: sigCols: _*))
    runToCompletion(banded, sink, "append")
    // The candidate derivation self-joins the band table; a memory
    // sink's view re-resolves to IDENTICAL attribute ids on both
    // sides and Catalyst cannot dedup a MemoryPlan — cut lineage
    // once so the standing table joins like any stored relation.
    Dedup.jaccardVerify(
      Dedup.candidatesFromBands(graft.Checkpoints.cut(s.table(sink))),
      corpus.select(col("doc_id"), tokenSet(col("text")).as("fs")),
      topN = 20)
  }

  /** q_stream_semantic — CONTINUOUS SemDeDup maintenance, the
    * streaming face of [[graft.operators.Dedup.semanticDedup]]:
    * every arriving vector computes its cluster assignment AT
    * INGEST — a per-row argmin against the broadcast standing
    * quantizer (trained once on the standing corpus, the
    * q_stream_ann contract) — and appends (vec_id, cell) to the
    * standing assignment table; the within-cell prune census serves
    * from that table batch-side through the SAME
    * [[graft.operators.Dedup.semanticCensus]] stage the batch row
    * runs, so the row shares q_dedup_semantic's oracle verbatim
    * (sink ≡ batch assignment). Map-only and STATELESS: no
    * watermark, no state store — any micro-batch split appends the
    * same assignment rows.
    *
    * Scale: the assignment argmin is paid once per vector at ingest
    * and never re-paid by maintenance (the batch rebuild re-assigns
    * the whole corpus); census work stays Σ cell-occupancy² —
    * bounded by the cell dial, never corpus-quadratic. */
  def streamSemantic(s: SparkSession, dir: String): DataFrame =
    streamSemanticOver(s, embeddingsStream(s, dir),
      Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
      "graft_stream_semantic")

  /** `in`: any stream with the embeddings schema; `corpus`: the
    * batch relation the quantizer trains on and the census hydrates
    * embeddings from (replay harness injection point). */
  private[graft] def streamSemanticOver(s: SparkSession, in: DataFrame,
      corpus: DataFrame, sink: String): DataFrame = {
    import graft.operators.Dedup
    val centArr = Ann.asArray(Ann.ivfCentroidsOf(corpus, Dedup.SemCells))
    // Constant-key equi-join against the one-row broadcast centroid
    // array (the streamAnn spelling of "stream-static broadcast
    // join"); the argmin itself is per-row, map-only.
    val assigned = in
      .select(col("vec_id"), col("embedding")).withColumn("one", lit(1))
      .join(broadcast(centArr.withColumn("one", lit(1))), "one")
      .select(col("vec_id"),
        graft.plans.NearestCell(col("embedding"), col("cents")).as("cell"))
    runToCompletion(assigned, sink, "append")
    // Census from the standing assignment table; embeddings hydrate
    // batch-side (the streamNeardup lineage-cut discipline).
    val a1 = graft.Checkpoints.cut(s.table(sink))
      .join(corpus, Seq("vec_id"))
      .select(col("vec_id"), col("embedding"), col("cell"))
    Dedup.semanticCensus(a1, corpus)
  }

  /** Columns [[streamStats]] profiles (name, isNumeric). `text` is
    * deliberately absent: a near-unique unbounded-cardinality column
    * makes the exact dictionary as big as the data — unbounded
    * columns take the register path ([[StreamStatsHllCols]]). */
  private[graft] val StreamStatsCols =
    Seq(("doc_id", true), ("lang", false), ("source", false),
      ("n_chars", true))

  /** Columns whose NDV rides the q_stream_hll REGISTER path instead
    * of the exact dictionary: `doc_id` is unique per row, so an
    * exact dictionary for it would carry one state entry per corpus
    * row — O(rows), a scale-killer at 100 TB. Registers keep its
    * standing state at O(256) while min/max (associative) ride the
    * counters row; bounded columns (enums, small measures) keep the
    * exact dictionary, which for them IS the dictionary-encoding
    * artifact a columnar writer wants. A deployment that needs the
    * exact-uniqueness audit runs it as a BATCH reconciliation pass
    * (q_table_stats), not as standing stream state. */
  private[graft] val StreamStatsHllCols = Set("doc_id")

  /** q_stream_stats — CONTINUOUS CATALOG-STATS maintenance, the
    * streaming twin of [[graft.operators.Relational.tableStats]]:
    * per-column row/null counts, rendered-width sums AND min/max
    * ride a complete-mode aggregation whose whole state is one row
    * per column (count/sum/min/max are all associative — exact under
    * any micro-batch split, the q_stream_window argument; numerics
    * min/max through a zero-padded fixed-width sort key so the
    * string extreme IS the numeric extreme, reported as the plain
    * render). NDV splits by column class: BOUNDED columns keep the
    * exact STANDING DICTIONARY — one state entry per distinct
    * (column, value) — while UNBOUNDED key columns
    * ([[StreamStatsHllCols]]) ride the q_stream_hll REGISTER path:
    * a max-rho table of O(256) entries per column, folded through
    * the same fixed-point estimator the sketch tier serves (the
    * oracle replays it bit for bit). All three tiers live in ONE
    * complete-mode aggregation keyed by (arm, column, sub-key) —
    * one ingest pass, one state store, one commit cycle per trigger
    * (r11 ran them as three separate streaming queries and paid the
    * per-query floor three times for identical state).
    *
    * Scale: counters state is O(columns), registers O(columns×256),
    * the dictionary O(NDV) for bounded columns only — nothing in the
    * standing state grows with corpus rows (the r10 registration
    * profiled `doc_id` through the exact dictionary, one entry per
    * row — a scale-killer at 100 TB, re-routed here). Nothing
    * re-reads history; every sink absorbs each batch
    * incrementally. */
  def streamStats(s: SparkSession, dir: String): DataFrame =
    streamStatsOver(s, documentsStream(s, dir), "graft_stream_stats")

  private[graft] def streamStatsOver(s: SparkSession, in: DataFrame,
      sink: String): DataFrame = {
    val arms = StreamStatsCols.map { case (c, num) =>
      val v = col(c).cast("string")
      struct(lit(c).as("col_name"), v.as("val"),
        (if (num) lpad(v, 20, "0") else v).as("sortkey"),
        length(v).as("len"),
        when(col(c).isNull, 1L).otherwise(0L).as("is_null"))
    }
    val unpivot = in.select(explode(array(arms: _*)).as("r"))
      .select(col("r.*"))
    // ONE ingest pass, three state tiers in ONE complete-mode
    // aggregation keyed by (arm, col_name, k2): counters (arm "c",
    // one state row per column), the exact standing dictionary for
    // bounded columns (arm "d", one row per distinct value — the
    // same O(NDV) state the former dropDuplicates stream kept, now
    // sharing the store), and the max-rho registers for unbounded
    // key columns (arm "r", one row per (column, bucket), O(256)).
    // r11 ran these as THREE streaming queries; each paid its own
    // query start/stop, offset/commit logs and state-store commit
    // cycle — pure per-query floor ×3 for the same row work. All
    // three tiers are associative aggregates over the same unpivot,
    // so they fold in one store exactly (the replay spec argument
    // is unchanged: count/sum/min/max/max-rho are split-invariant).
    import graft.operators.Sketches
    val bounded = !col("col_name").isInCollection(StreamStatsHllCols)
    val h = graft.functions.MinHash.hash60(concat(lit("hll:"), col("val")))
    val tagged = unpivot.select(col("col_name"), col("sortkey"),
      col("val"), col("len"), col("is_null"),
      explode(filter(array(
        struct(lit("c").as("arm"), lit("").as("k2"), lit(0L).as("rho")),
        when(col("is_null") === 0L && bounded,
          struct(lit("d").as("arm"), col("val").as("k2"),
            lit(0L).as("rho"))),
        when(col("is_null") === 0L && !bounded,
          struct(lit("r").as("arm"),
            pmod(h, lit(Sketches.HllM.toLong)).cast("string").as("k2"),
            Sketches.hllRho(shiftright(h, 8).bitwiseAND(lit(0xffffL)))
              .cast("long").as("rho")))),
        x => x.isNotNull)).as("t"))
    val live = when(col("is_null") === 0L && col("t.arm") === "c",
      struct(col("sortkey"), col("val")))
    val agg = tagged.groupBy(col("t.arm").as("arm"), col("col_name"),
        col("t.k2").as("k2"))
      .agg(count(lit(1)).as("n_rows"), sum(col("is_null")).as("n_null"),
        sum(col("len")).as("sum_len"),
        min(live).getField("val").as("min_v"),
        max(live).getField("val").as("max_v"),
        max(col("t.rho")).as("m"))
    runToCompletion(agg, sink, "complete")
    val st = s.table(sink)
    // Re-alias the grouped branches: three reads of the same memory
    // sink share attribute ids, and the analyzer does not dedup them
    // through MemoryPlan — a fresh Alias per branch disambiguates.
    val ndvDict = st.where(col("arm") === "d")
      .groupBy(col("col_name")).agg(count(lit(1)).as("ndv"))
      .select(col("col_name").as("col_name"), col("ndv"))
    val ndvRegs = Sketches.hllNdv(
      st.where(col("arm") === "r").select(col("col_name"), col("m")),
      "col_name")
      .select(col("col_name").as("col_name"), col("ndv").as("ndv"))
    st.where(col("arm") === "c")
      .join(ndvDict.unionByName(ndvRegs), Seq("col_name"))
      .select(col("col_name"), col("n_rows"), col("n_null"), col("ndv"),
        col("min_v"), col("max_v"),
        expr("1000000 * sum_len DIV (n_rows - n_null)")
          .as("avg_len_micro"))
      .orderBy(col("col_name").asc)
  }

  /** q_stream_graph — CONTINUOUS link-graph maintenance, the
    * streaming face of group M: every arriving document derives its
    * out-edges AT INGEST (the [[graft.operators.Graph.edgesOver]]
    * content rule — tokenize, sort, take [[graft.operators.Graph
    * .EdgeRefs]], hash into the id space) and appends them to the
    * standing edge table; the whole-graph analytics (here the degree
    * distribution — the first diagnostic run on any web-scale graph)
    * serve from that table batch-side, the stored-index contract
    * (q_stream_index / q_stream_neardup) applied to the graph tier.
    * The row shares q_graph_degree_dist's oracle verbatim, so sink ≡
    * batch edge relation is what the gate grades.
    *
    * Map-only and STATELESS: the id-space modulus (a fixed deployment
    * config; here the corpus count) rides a one-row broadcast
    * crossJoin, per-doc dst dedup is `array_distinct` on the doc's
    * own edge array (src is unique per doc, so per-doc dedup ≡ the
    * batch rule's global distinct on (src, dst)), and any micro-batch
    * split appends the same edge rows. Cross-doc (u, v) collapse —
    * genuinely global — happens serve-side, exactly where the batch
    * op pays it.
    *
    * Scale: edge derivation is paid once per document at ingest and
    * never re-paid by re-analysis (the batch path re-tokenizes the
    * whole corpus per run); the standing (src, dst) table is the
    * exact relation every group-M op starts from, so ANY of them —
    * triangles, CC, rank — can serve from the same sink. */
  def streamGraph(s: SparkSession, dir: String): DataFrame =
    streamGraphOver(s, documentsStream(s, dir),
      Tables.documents(s, dir), "graft_stream_graph")

  /** The at-ingest edge derivation shared by [[streamGraph]] and
    * [[streamCc]] (one rule, two serves — the standing table is the
    * relation every group-M op starts from). */
  private def ingestEdges(s: SparkSession, in: DataFrame,
      corpus: DataFrame, sink: String): DataFrame = {
    import graft.functions.TextFunctions.tokenSet
    import graft.operators.Graph
    val nd = corpus.agg(count(lit(1)).as("nd")).withColumn("one", lit(1))
    val edges = in
      .withColumn("one", lit(1))
      .join(broadcast(nd), "one")
      .select(col("doc_id").as("src"),
        explode(array_distinct(transform(
          slice(sort_array(tokenSet(col("text"))), 1, Graph.EdgeRefs),
          t => pmod(graft.functions.MinHash.hash60(
            concat(lit("rel:"), t)), col("nd"))))).as("dst"))
      .where(col("src") =!= col("dst"))
    runToCompletion(edges, sink, "append")
    graft.Checkpoints.cut(s.table(sink))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
  }

  private[graft] def streamGraphOver(s: SparkSession, in: DataFrame,
      corpus: DataFrame, sink: String): DataFrame =
    graft.operators.Graph.degreeDistOf(
      ingestEdges(s, in, corpus, sink))

  /** q_stream_cc — the COMPONENT census served from the standing
    * at-ingest edge table: the same sink [[streamGraph]] maintains
    * (one ingest rule, many serves) feeds the strong-edge filter and
    * the BspKernel propagation of q_graph_cc. The served graph IS
    * the batch graph — identical edges, identical supersteps, so the
    * row shares q_graph_cc's oracle verbatim INCLUDING the stop
    * iteration; hash equality grades both the standing table's
    * completeness and the propagation's stopping decision. */
  def streamCc(s: SparkSession, dir: String): DataFrame =
    streamCcOver(s, documentsStream(s, dir),
      Tables.documents(s, dir), "graft_stream_cc")

  private[graft] def streamCcOver(s: SparkSession, in: DataFrame,
      corpus: DataFrame, sink: String): DataFrame = {
    import graft.operators.Graph
    val ue = Graph.strongFilter(ingestEdges(s, in, corpus, sink))
    val (lab, t, _) = Graph.convergeComponentsOf(s,
      corpus.select(col("doc_id")), ue)
    Graph.ccHistogram(lab)
      .withColumn("conv_iter", lit(t.toLong))
      .orderBy(col("bucket").asc)
  }

  /** Streaming as-of state/rows. `matched_us = -1` encodes "no prior
    * purchase yet"; matches only ever improve (matched_us is
    * monotonically non-decreasing per click), which is what makes
    * the sink read reconcilable. */
  final case class AsofEvent(user_id: Long, event_id: Long, us: Long,
      side: Int)
  final case class AsofOut(event_id: Long, user_id: Long, us: Long,
      matched_us: Long, matched_id: Long, lag_us: Long)
  final case class AsofState(purchases: Seq[(Long, Long)],
      clicks: Seq[(Long, Long)], emitted: Map[Long, (Long, Long)])

  /** Streaming point-in-time (as-of) join — the online-feature-store
    * twin of [[graft.operators.Temporal.asofJoin]]: for every click,
    * the most recent purchase by the same user at-or-before it.
    *
    * State per user holds the purchase/click history and the
    * last-emitted match per click; every batch re-resolves the
    * clicks against the full purchase set and re-emits ONLY rows
    * whose match improved. A match can only improve (a late
    * purchase either lands between the current match and the click,
    * raising matched_us, or is irrelevant), so the sink read's
    * max(struct(matched_us, …)) rollup reconstructs the final answer
    * under ANY micro-batch split or arrival order — no
    * single-micro-batch assumption.
    *
    * Scale design: a production deployment prunes both lists at the
    * watermark (purchases older than the horizon collapse to the
    * single best-so-far entry per click horizon; resolved clicks
    * drop once the watermark passes their timestamp), giving O(open
    * horizon) state per user. The finite AvailableNow replay here
    * skips the pruning so the result stays exact under arbitrary
    * disorder — the resolution logic is identical either way. */
  def streamAsof(s: SparkSession, dir: String): DataFrame =
    streamAsofOver(s, eventsStream(s, dir), "graft_stream_asof")

  /** The as-of pipeline over an arbitrary events stream —
    * test-injectable so the multi-micro-batch out-of-order replay
    * path (late purchases, re-emission) is exercised with split
    * input files (StreamingSpec). */
  /** Resolve every click against the SORTED purchase list, emitting
    * only matches that IMPROVE on what was already emitted — the ONE
    * resolution rule both as-of resolvers share (a drift between the
    * plain and wm variants would silently break the "wm equals
    * keep-all within horizon" contract). Best = max (us, id) among
    * purchases with us <= click us — the last qualifying entry of the
    * sorted list. Emissions dedup on the full (us, id) match key: two
    * equal-us purchases split across batches still re-emit when the
    * higher id arrives (matched_id alone improves). Returns the
    * emissions and the updated emitted-match map. */
  private def resolveClicks(uid: Long, purchases: Seq[(Long, Long)],
      clicks: Seq[(Long, Long)], emitted0: Map[Long, (Long, Long)])
      : (Seq[AsofOut], Map[Long, (Long, Long)]) = {
    val out = Seq.newBuilder[AsofOut]
    var emitted = emitted0
    for ((cus, cid) <- clicks) {
      val i = purchases.lastIndexWhere(_._1 <= cus)
      val (bus, bid) = if (i < 0) (-1L, -1L) else purchases(i)
      if (!emitted.get(cid).contains((bus, bid))) {
        out += AsofOut(cid, uid, cus, bus, bid,
          if (i < 0) -1L else cus - bus)
        emitted += (cid -> ((bus, bid)))
      }
    }
    (out.result(), emitted)
  }

  /** Idempotent as-of sink read — matches only improve in (us, id)
    * order, so the max (matched_us, matched_id) struct per click is
    * final; -1 decodes to null. Shared by both resolvers. */
  private def asofSinkRollup(s: SparkSession, sink: String): DataFrame =
    s.table(sink)
      .groupBy(col("event_id"), col("user_id"), col("us"))
      .agg(max(struct(col("matched_us"), col("matched_id"), col("lag_us")))
        .as("m"))
      .select(col("event_id"), col("user_id"), col("us"),
        when(col("m.matched_us") < 0, lit(null).cast("long"))
          .otherwise(col("m.matched_id")).as("matched_id"),
        when(col("m.matched_us") < 0, lit(null).cast("long"))
          .otherwise(col("m.lag_us")).as("lag_us"))
      .orderBy(col("event_id").asc)

  private[graft] def streamAsofOver(s: SparkSession, in: DataFrame,
      sink: String): DataFrame = {
    import s.implicits._
    val peakAcc = newPeakAcc(s)
    val events = in
      .where(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("side"))
      .as[AsofEvent]

    val matched = events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[AsofState]) =>
          val st = state.getOption
            .getOrElse(AsofState(Nil, Nil, Map.empty))
          val batch = evs.toSeq
          val purchases =
            (st.purchases ++ batch.filter(_.side == 0)
              .map(e => (e.us, e.event_id))).sortBy(identity)
          val clicks = st.clicks ++ batch.filter(_.side == 1)
            .map(e => (e.us, e.event_id))
          val (out, emitted) = resolveClicks(uid, purchases, clicks,
            st.emitted)
          state.update(AsofState(purchases, clicks, emitted))
          peakAcc.add(purchases.size + clicks.size + emitted.size)
          out.iterator
      }

    runToCompletion(matched.toDF(), sink, "append")
    peakStateEntries.put(sink, peakAcc.value)
    asofSinkRollup(s, sink)
  }

  /** PRODUCTION variant of [[streamAsof]]: state pruned at the
    * event-time watermark to O(horizon) per user.
    *
    * Pruning invariants (both follow from "future rows have
    * ts ≥ watermark" once late rows are dropped upstream):
    *  - A click older than the watermark is FROZEN — any future
    *    purchase has us ≥ watermark > click.us, so it can never
    *    improve the match. Its best match was already emitted the
    *    moment it improved; drop the click and its emitted-map entry.
    *  - Purchases older than the watermark collapse to the single
    *    best (max (us, id)) entry: every surviving or future click
    *    has us ≥ watermark ≥ that entry's us, so the collapsed entry
    *    stands in for the whole prefix in any future resolution.
    * The sink read is the same idempotent max-struct rollup — no
    * versioning needed, because per-click matches only improve and
    * frozen clicks simply stop re-emitting. */
  def streamAsofWm(s: SparkSession, dir: String): DataFrame =
    streamAsofWmOver(s, eventsStream(s, dir), "graft_stream_asof_wm")

  private[graft] def streamAsofWmOver(s: SparkSession, in: DataFrame,
      sink: String, horizon: String = "2 hours"): DataFrame = {
    import s.implicits._
    val peakAcc = newPeakAcc(s)
    val events = in
      .withWatermark("ts", horizon)
      .where(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("side"),
        col("ts"))
      .as[AsofEventW]

    val matched = events.groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[AsofState]) =>
          val st = state.getOption
            .getOrElse(AsofState(Nil, Nil, Map.empty))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // Same explicit late-row guard as the wm sessionizer: a
          // beyond-horizon row must DROP, not resolve against the
          // collapsed purchase prefix (which keeps only the prefix
          // max once the watermark passes).
          val batch = evs.filter(_.us >= wmUs).toSeq
          val purchases =
            (st.purchases ++ batch.filter(_.side == 0)
              .map(e => (e.us, e.event_id))).sortBy(identity)
          val clicks = st.clicks ++ batch.filter(_.side == 1)
            .map(e => (e.us, e.event_id))
          val (out, emitted) = resolveClicks(uid, purchases, clicks,
            st.emitted)
          // Prune: frozen clicks leave the state entirely; the
          // purchase prefix older than the watermark collapses to its
          // best entry (sorted order preserved: it is the prefix max).
          val (frozen, live) = clicks.partition(_._1 < wmUs)
          val (oldP, newP) = purchases.partition(_._1 < wmUs)
          val keptP = (if (oldP.isEmpty) Nil else Seq(oldP.max)) ++ newP
          val kept = emitted -- frozen.map(_._2)
          state.update(AsofState(keptP, live, kept))
          peakAcc.add(keptP.size + live.size + kept.size)
          out.iterator
      }

    runToCompletion(matched.toDF(), sink, "append")
    peakStateEntries.put(sink, peakAcc.value)
    asofSinkRollup(s, sink)
  }

  final case class FunnelEvent(user_id: Long, event_type: String, us: Long)
  final case class FunnelState(events: Seq[(Long, String)], ver: Long)
  final case class FunnelOutV(user_id: Long, ver: Long, reached: Long)

  /** q_stream_funnel — the ordered-step conversion funnel
    * ([[graft.operators.Relational.eventFunnel]]) maintained as a
    * stream: per-user fMGWS state machine re-deriving the strict-
    * after step times from the buffered (time-sorted) step events on
    * every micro-batch, versioned re-emission + latest-version-wins
    * sink read (the [[streamSessionizeOver]] discipline — exact
    * under ARBITRARY disorder: a late-arriving early view can lower
    * t1 and legitimately re-open step-2 eligibility, which a greedy
    * forward-only state machine would miss). State per user is the
    * step-typed events only (the isin prune runs before the shuffle),
    * so state ∝ funnel-relevant activity, not the event firehose;
    * the watermark-pruned variant would finalize users once their
    * last possible t3 predecessor passes the horizon.
    *
    * Output and oracle are the batch row's — the gate proves
    * stream ≡ batch end-to-end. */
  def streamFunnel(s: SparkSession, dir: String): DataFrame =
    streamFunnelOver(s, eventsStream(s, dir), "graft_stream_funnel")

  private[graft] def streamFunnelOver(s: SparkSession, in: DataFrame,
      sink: String): DataFrame = {
    import s.implicits._
    val steps = Seq("view", "click", "purchase")
    val events = in.where(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[FunnelEvent]
    val prog = events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOutV](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, evs, state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(FunnelState(Nil, 0L))
          val all = (st.events ++ evs.map(e => (e.us, e.event_type)))
            .sortBy(identity)
          val ver = st.ver + 1
          val t1 = all.collectFirst { case (us, "view") => us }
          val t2 = t1.flatMap(a =>
            all.collectFirst { case (us, "click") if us > a => us })
          val t3 = t2.flatMap(b =>
            all.collectFirst { case (us, "purchase") if us > b => us })
          val reached =
            if (t3.isDefined) 3L
            else if (t2.isDefined) 2L
            else if (t1.isDefined) 1L
            else 0L
          state.update(FunnelState(all, ver))
          Iterator.single(FunnelOutV(uid, ver, reached))
      }
    runToCompletion(prog.toDF(), sink, "append")
    val reached = latestVersionRows(s.table(sink))
      .select(col("user_id"), col("reached"))
    val counts = Seq(1L -> "1_view", 2L -> "2_click", 3L -> "3_purchase")
      .map { case (k, name) =>
        reached.where(col("reached") >= k)
          .agg(count(lit(1)).as("n")).select(lit(name).as("step"), col("n"))
      }.reduce(_ unionAll _)
    // The rollup is the batch row's own (shared code — the stream
    // cannot drift from q_event_funnel's ppm convention).
    graft.operators.Relational.funnelRollup(counts)
  }

  /** Latest-version-wins read of a versioned re-emission sink: each
    * user's highest-`ver` rows (callers that segregate FINAL rows
    * pre-filter `t` before passing it in). */
  private def latestVersionRows(t: DataFrame): DataFrame = {
    val latest = t.groupBy(col("user_id")).agg(max(col("ver")).as("mver"))
      .withColumnRenamed("user_id", "lv_user_id")
    t.join(broadcast(latest),
      col("user_id") === col("lv_user_id") && col("ver") === col("mver"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_funnel" -> ((s, d) => streamFunnel(s, d)),
    "q_stream_window" -> ((s, d) => streamWindow(s, d)),
    "q_stream_dedup" -> ((s, d) => streamDedup(s, d)),
    "q_stream_theta" -> ((s, d) => streamTheta(s, d)),
    "q_stream_hll" -> ((s, d) => streamHll(s, d)),
    "q_stream_ohlc" -> ((s, d) => streamOhlc(s, d)),
    "q_stream_changepoint" -> ((s, d) => streamChangepoint(s, d)),
    "q_stream_sessionize" -> ((s, d) => streamSessionize(s, d)),
    "q_stream_sessionize_wm" -> ((s, d) => streamSessionizeWm(s, d)),
    "q_stream_asof" -> ((s, d) => streamAsof(s, d)),
    "q_stream_asof_wm" -> ((s, d) => streamAsofWm(s, d)),
    "q_stream_quality" -> ((s, d) => streamQuality(s, d)),
    "q_stream_index" -> ((s, d) => streamIndex(s, d)),
    "q_stream_latest" -> ((s, d) => streamLatest(s, d)),
    "q_stream_latest_tws" -> ((s, d) => streamLatestTws(s, d)),
    "q_stream_forget" -> ((s, d) => streamForget(s, d)),
    "q_stream_join" -> ((s, d) => streamJoin(s, d)),
    "q_stream_ann" -> ((s, d) => streamAnn(s, d)),
    "q_stream_contamination" -> ((s, d) => streamContamination(s, d)),
    "q_stream_neardup" -> ((s, d) => streamNeardup(s, d)),
    "q_stream_semantic" -> ((s, d) => streamSemantic(s, d)),
    "q_stream_graph" -> ((s, d) => streamGraph(s, d)),
    "q_stream_cc" -> ((s, d) => streamCc(s, d)),
    "q_stream_stats" -> ((s, d) => streamStats(s, d)),
    "q_stream_multimodal" -> ((s, d) => streamMultimodal(s, d)),
    "q_stream_table" -> ((s, d) => streamTable(s, d)),
    "q_stream_mview" -> ((s, d) => streamMview(s, d)),
  )

  val oracles: Map[String, String] = Map(
    // The streaming funnel must equal the batch funnel exactly —
    // same oracle (Relational group).
    "q_stream_funnel" ->
      graft.operators.Relational.oracles("q_event_funnel"),
    // The at-ingest contamination guard must flag exactly what the
    // batch scan flags — same oracle (Curation group).
    "q_stream_contamination" ->
      graft.operators.Curation.oracles("q_contamination"),
    // The at-ingest band build must serve exactly the batch LSH
    // pairs — same oracle (Dedup group).
    "q_stream_neardup" ->
      graft.operators.Dedup.oracles("q_dedup_minhash"),
    // The at-ingest cluster assignment must yield exactly the batch
    // SemDeDup census — same oracle (Dedup group).
    "q_stream_semantic" ->
      graft.operators.Dedup.oracles("q_dedup_semantic"),
    // At-ingest edge extraction must serve exactly the batch degree
    // distribution — same oracle (Graph group).
    "q_stream_graph" ->
      graft.operators.Graph.oracles("q_graph_degree_dist"),
    // The census served from the standing edge table must equal the
    // batch census exactly, stop iteration included — same oracle
    // (Graph group).
    "q_stream_cc" ->
      graft.operators.Graph.oracles("q_graph_cc"),
    // Continuous profiling must equal the one-shot batch profile —
    // the q_table_stats arm shape over the documents columns.
    // Unbounded key columns (StreamStatsHllCols) report the HLL
    // register estimate instead of the exact distinct: the oracle
    // replays the register build + fixed-point fold bit for bit
    // (the q_hll_distinct SQL, integer-rounded).
    "q_stream_stats" -> {
      import graft.operators.Sketches.{HllM, HllNum, HllWindow}
      val arms = StreamStatsCols.map { case (c, _) =>
        val ndvSql =
          if (!StreamStatsHllCols.contains(c)) s"count(DISTINCT $c)"
          else {
            val h = graft.functions.MinHash.hash60Sql(
              s"'hll:' || CAST($c AS VARCHAR)")
            s"""(SELECT CAST(round($HllNum / CAST(
               |    CAST(sum(1::BIGINT << (${HllWindow + 1} - m)) AS BIGINT) +
               |    ($HllM - count(*)) * ${1L << (HllWindow + 1)}
               |    AS DOUBLE)) AS BIGINT)
               |  FROM (SELECT $h % $HllM AS bucket,
               |          max(CASE WHEN ($h >> 8) & 65535 = 0
               |                THEN ${HllWindow + 1}
               |                ELSE ${HllWindow + 1} -
               |                  length(bin(($h >> 8) & 65535)) END) AS m
               |        FROM documents WHERE $c IS NOT NULL
               |        GROUP BY bucket))""".stripMargin
          }
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |       count(*) - count($c) AS n_null,
           |       $ndvSql AS ndv,
           |       CAST(min($c) AS VARCHAR) AS min_v,
           |       CAST(max($c) AS VARCHAR) AS max_v,
           |       CAST(1000000 * sum(length(CAST($c AS VARCHAR)))
           |            // count($c) AS BIGINT) AS avg_len_micro
           |FROM documents""".stripMargin
      }
      arms.mkString("\nUNION ALL\n") + "\nORDER BY col_name ASC"
    },
    // The exactly-once file sink's read-back census must equal the
    // one-shot batch profile of the same columns.
    "q_stream_table" -> {
      val dig = graft.functions.MinHash.hash60Sql("CAST(doc_id AS VARCHAR)")
      s"""SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       CAST(sum(CAST($dig AS DECIMAL(38,0))) AS VARCHAR)
        |         AS ids_digest
        |FROM documents GROUP BY source ORDER BY source ASC""".stripMargin
    },
    // The incrementally-maintained view must equal the one-shot
    // census of everything landed — q_stream_table's oracle.
    "q_stream_mview" -> {
      val dig = graft.functions.MinHash.hash60Sql("CAST(doc_id AS VARCHAR)")
      s"""SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       CAST(sum(CAST($dig AS DECIMAL(38,0))) AS VARCHAR)
        |         AS ids_digest
        |FROM documents GROUP BY source ORDER BY source ASC""".stripMargin
    },
    // Metadata-at-ingest must equal the batch extraction — same
    // oracle (Multimodal group).
    "q_stream_multimodal" ->
      graft.multimodal.Multimodal.oracles("q_multimodal_meta"),
    // The watermark-pruned production resolvers must produce exactly
    // what their keep-all twins produce (the gate input's disorder is
    // within the horizon), i.e. the same batch oracles.
    "q_stream_sessionize_wm" -> oraclesBase("q_stream_sessionize"),
    "q_stream_asof_wm" -> oraclesBase("q_stream_asof"),
    // The streaming CDC compactor must equal the batch
    // dedup-by-latest exactly — same oracle (Dedup group).
    "q_stream_latest" -> graft.operators.Dedup.oracles("q_dedup_latest"),
    // Same contract on the transformWithState API — same oracle.
    "q_stream_latest_tws" ->
      graft.operators.Dedup.oracles("q_dedup_latest"),
    // Streaming erasure: the final snapshot equals the batch
    // latest-per-user with tombstone-final users absent.
    "q_stream_forget" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
         |  (${graft.functions.MinHash.hash60Sql(
               "'tomb:' || CAST(event_id AS VARCHAR)")}
         |     % $TombMod = 0) AS is_del
         |           FROM events),
         |w AS (SELECT user_id, event_id, us, is_del,
         |             row_number() OVER (PARTITION BY user_id
         |               ORDER BY us DESC, event_id DESC) AS rn
         |      FROM e)
         |SELECT user_id, event_id, us FROM w
         |WHERE rn = 1 AND NOT is_del
         |ORDER BY user_id ASC""".stripMargin,
    // The native stream-stream join must emit exactly the batch
    // interval join's pair set.
    "q_stream_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |c AS (SELECT event_id AS c_id, user_id, us AS c_us FROM e
        |      WHERE event_type = 'click'),
        |p AS (SELECT event_id AS p_id, user_id, us AS p_us FROM e
        |      WHERE event_type = 'purchase')
        |SELECT c.c_id, c.user_id, p.p_id, p.p_us - c.c_us AS lag_us
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.p_us >= c.c_us AND p.p_us <= c.c_us + 3600000000
        |ORDER BY c_id ASC, p_id ASC""".stripMargin,
    // Online ANN serving: the stream must return exactly what the
    // batch IVF probe returns for every query id — quantizer built
    // on the corpus (non-query ids), NProbe=2, top-10 per query.
    "q_stream_ann" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |corp AS (SELECT * FROM e WHERE vec_id % $StreamAnnQMod <> 0),
         |qs AS (SELECT vec_id AS qid, v AS qv FROM e
         |       WHERE vec_id % $StreamAnnQMod = 0),
         |seeds AS (SELECT vec_id AS sid, v AS sv FROM corp
         |          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
         |          LIMIT ${Ann.IvfCells}),
         |d0 AS (SELECT corp.vec_id, s.sid,
         |              list_sum([(corp.v[i] - s.sv[i]) * (corp.v[i] - s.sv[i])
         |                        for i in generate_series(1, ${Ann.Dim})]) AS d
         |       FROM corp, seeds s),
         |a0 AS (SELECT vec_id, sid AS cid FROM (
         |         SELECT vec_id, sid,
         |                row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY d ASC, sid ASC) AS rn
         |         FROM d0) WHERE rn = 1),
         |dims AS (SELECT a0.cid, g.i AS pos,
         |                CAST(round(corp.v[g.i] * 1e6) AS BIGINT) AS m
         |         FROM a0 JOIN corp USING (vec_id),
         |              generate_series(1, ${Ann.Dim}) AS g(i)),
         |cdim AS (SELECT cid, pos, CAST(sum(m) AS DOUBLE) / count(*) / 1e6 AS c
         |         FROM dims GROUP BY cid, pos),
         |cent AS (SELECT cid, list(c ORDER BY pos) AS cv
         |         FROM cdim GROUP BY cid),
         |d1 AS (SELECT corp.vec_id, t.cid,
         |              list_sum([(corp.v[i] - t.cv[i]) * (corp.v[i] - t.cv[i])
         |                        for i in generate_series(1, ${Ann.Dim})]) AS d
         |       FROM corp, cent t),
         |a1 AS (SELECT vec_id, cid AS cell FROM (
         |         SELECT vec_id, cid,
         |                row_number() OVER (PARTITION BY vec_id
         |                  ORDER BY d ASC, cid ASC) AS rn
         |         FROM d1) WHERE rn = 1),
         |qd AS (SELECT q.qid, q.qv, t.cid AS cell,
         |              list_sum([(q.qv[i] - t.cv[i]) * (q.qv[i] - t.cv[i])
         |                        for i in generate_series(1, ${Ann.Dim})]) AS d
         |       FROM qs q, cent t),
         |qc AS (SELECT qid, qv, cell FROM (
         |         SELECT qid, qv, cell,
         |                row_number() OVER (PARTITION BY qid
         |                  ORDER BY d ASC, cell ASC) AS rn
         |         FROM qd) WHERE rn <= ${Ann.NProbe}),
         |res AS (SELECT qc.qid, a1.vec_id,
         |               list_cosine_similarity(corp.v, qc.qv) AS sim
         |        FROM a1 JOIN qc USING (cell) JOIN corp USING (vec_id)),
         |r AS (SELECT qid, vec_id, sim,
         |             row_number() OVER (PARTITION BY qid
         |               ORDER BY sim DESC, vec_id ASC) AS rnk
         |      FROM res)
         |SELECT qid, vec_id, round(sim, 6) AS sim, rnk FROM r
         |WHERE rnk <= 10 ORDER BY qid ASC, rnk ASC""".stripMargin,
  ) ++ oraclesBase

  private lazy val oraclesBase: Map[String, String] = Map(
    // Exactly the batch q_quality_score semantics — stream == batch.
    "q_stream_quality" ->
      graft.operators.TextAnalysis.oracles("q_quality_score"),
    // Stream-appended posting deltas rolled up == the one-shot batch
    // index content — the additive-delta contract of the stored
    // text index, proven cross-engine by the gate.
    "q_stream_index" -> {
      val h = graft.functions.MinHash.hash60Sql("'tb:' || term")
      s"""WITH t AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term
         |           FROM documents),
         |p AS (SELECT doc_id, term, count(*) AS tf
         |      FROM t GROUP BY doc_id, term)
         |SELECT term,
         |       $h % ${graft.operators.Retrieval.TermBuckets} AS tb,
         |       count(*) AS df,
         |       CAST(sum(tf) AS BIGINT) AS tf_sum
         |FROM p GROUP BY term ORDER BY term ASC""".stripMargin
    },
    // Exactly the batch q_events_bucket semantics: the correctness
    // gate therefore proves stream == batch.
    "q_stream_window" ->
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        |       count(*) AS n,
        |       round(CAST(sum(CAST(round(value * 1e6) AS BIGINT)) AS DOUBLE)
        |             / 1e6, 6) AS sum_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY bucket ASC, event_type ASC""".stripMargin,
    "q_stream_dedup" ->
      """WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT event_type, count(*) AS n_keys,
        |       count(DISTINCT user_id) AS n_users
        |FROM d GROUP BY event_type ORDER BY event_type ASC""".stripMargin,
    // The batch theta row's oracle verbatim — stream maintenance must
    // serve the identical sketch (the stream-equals-batch contract).
    "q_stream_theta" -> graft.operators.Sketches.oracles("q_theta_sketch"),
    // Continuous candle maintenance must equal the batch downsample
    // exactly — same oracle (TimeSeries group).
    "q_stream_ohlc" -> graft.operators.TimeSeries.oracles("q_ohlc"),
    // Events-keyed HLL: the batch estimator SQL over (type, user) —
    // register maintenance at ingest must land on the same sketch.
    "q_stream_hll" -> {
      import graft.operators.Sketches.{HllM, HllNum, HllWindow}
      val h = graft.functions.MinHash.hash60Sql(
        "'hll:' || CAST(user_id AS VARCHAR)")
      s"""WITH b AS (
         |  SELECT event_type,
         |         $h % $HllM AS bucket,
         |         ($h >> 8) & 65535 AS r16,
         |         user_id
         |  FROM events),
         |r AS (
         |  SELECT event_type, bucket,
         |         max(CASE WHEN r16 = 0 THEN ${HllWindow + 1}
         |                  ELSE ${HllWindow + 1} - length(bin(r16)) END) AS m,
         |         count(DISTINCT user_id) AS nd
         |  FROM b GROUP BY event_type, bucket)
         |SELECT event_type,
         |       CAST(sum(nd) AS BIGINT) AS n_exact,
         |       count(*) AS regs_hit,
         |       round($HllNum / CAST(
         |         CAST(sum(1::BIGINT << (${HllWindow + 1} - m)) AS BIGINT) +
         |         ($HllM - count(*)) * ${1L << (HllWindow + 1)}
         |         AS DOUBLE), 3) AS est
         |FROM r GROUP BY event_type
         |ORDER BY event_type ASC""".stripMargin
    },
    "q_stream_changepoint" ->
      graft.operators.Relational.oracles("q_changepoint"),
    // Exactly the batch q_asof_join semantics (Temporal group) — the
    // gate proves the stateful resolver equals the LATERAL top-1.
    "q_stream_asof" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |l AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
        |r AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.us,
        |       m.mid AS matched_id, l.us - m.mus AS lag_us
        |FROM l LEFT JOIN LATERAL (
        |  SELECT r.event_id AS mid, r.us AS mus FROM r
        |  WHERE r.user_id = l.user_id AND r.us <= l.us
        |  ORDER BY r.us DESC, r.event_id DESC LIMIT 1) m ON TRUE
        |ORDER BY l.event_id ASC""".stripMargin,
    // Exactly the batch q_sessionize semantics (Relational group) —
    // the gate proves the stateful operator equals the batch windows.
    "q_stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         lag(epoch_us(ts), 1) OVER
        |           (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, us,
        |         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM e),
        |g AS (
        |  SELECT user_id, event_id, us,
        |         CAST(sum(is_new) OVER
        |           (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |           AS sess_idx
        |  FROM f)
        |SELECT user_id, sess_idx, count(*) AS n_events,
        |       min(us) AS start_us, max(us) - min(us) AS dur_us
        |FROM g GROUP BY user_id, sess_idx
        |ORDER BY user_id ASC, sess_idx ASC""".stripMargin,
  )
}

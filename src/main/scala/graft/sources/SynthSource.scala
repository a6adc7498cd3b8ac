package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-synth` — a DataSource V2 deterministic corpus generator:
  * the load-generation tool of a 100 TB pipeline. Reads NOTHING from
  * disk; each partition synthesizes its id range on the executor, so
  * a scale test drives the full engine (scan → shuffle → agg) at any
  * size with zero storage and perfect reproducibility (md5-seeded,
  * seed in the options).
  *
  * {{{
  * spark.read.format("graft-synth")
  *   .option("rows", 1000000).option("parts", 64).option("seed", 7)
  *   .load()                       // document-shaped rows
  * }}}
  *
  * This is the engine-surface showcase of the connector API tier:
  *  - `SupportsPushDownRequiredColumns`: the reader materializes ONLY
  *    requested columns — `select(doc_id)` never renders text (column
  *    pruning visible in explain as the scan's narrowed schema).
  *  - `SupportsPushDownFilters`: `doc_id` comparisons are consumed by
  *    the source — they PRUNE whole input partitions at planning time
  *    (the DSv2 analogue of parquet row-group/partition pruning) and
  *    filter residually inside surviving partitions, so Spark doesn't
  *    re-evaluate them.
  * Both behaviors are asserted in SynthSourceSpec.
  *
  * The generated shape mirrors the testdata `documents` table
  * (doc_id, text, lang, source, n_chars) with the same small
  * vocabulary so every text operator (shingles, minhash, quality)
  * exercises realistically. (Reference intent: the cleaning fixtures
  * of cardsCleaning/cleanCardJson.py — synthetic but corpus-shaped.)
  */
class SynthSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-synth"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schemaFor(
      Option(options.get("shape")).getOrElse("documents"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(
      shape = Option(properties.get("shape")).getOrElse("documents"),
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      parts = Option(properties.get("parts")).map(_.toInt).getOrElse(8),
      seed = Option(properties.get("seed")).map(_.toLong).getOrElse(0L),
      centers = Option(properties.get("centers")).map(_.toInt).getOrElse(0),
      sigma = Option(properties.get("sigma")).map(_.toDouble).getOrElse(0.15))
}

object SynthSource {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  /** Embedding-table shape (matches testdata `embeddings`: 64-dim
    * double vectors, 10 labels). */
  val EmbSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("label", LongType, nullable = false),
    StructField("embedding", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  /** Event-stream shape (matches testdata `events` post-read: micro
    * timestamps, 5 event types, JSON props). */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("props", StringType, nullable = false)))

  val EmbDim = 64

  def schemaFor(shape: String): StructType = shape match {
    case "documents" => Schema
    case "embeddings" => EmbSchema
    case "events" => EventSchema
    case other => throw new IllegalArgumentException(
      s"graft-synth shape must be documents|embeddings|events, got $other")
  }

  /** The id column each shape supports pushdown on. */
  def idColFor(shape: String): String = shape match {
    case "documents" => "doc_id"
    case "embeddings" => "vec_id"
    case "events" => "event_id"
  }

  val EventTypes: IndexedSeq[String] =
    IndexedSeq("click", "error", "purchase", "signup", "view")

  val Vocab: IndexedSeq[String] = IndexedSeq(
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "a", "the", "line", "sort", "window",
    "order", "data", "column", "join", "small", "customer", "query", "big",
    "stream", "group", "filter")
  val Langs: IndexedSeq[String] = IndexedSeq("en", "de", "fr", "es")

  /** Deterministic 64-bit mix (splitmix64 finalizer) — cheap,
    * stateless, and identical on every executor. */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def textFor(id: Long, seed: Long): String = {
    val h0 = mix(id ^ mix(seed))
    val n = 20 + (java.lang.Long.remainderUnsigned(h0, 81L)).toInt // 20..100
    val sb = new java.lang.StringBuilder(n * 6)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      val w = java.lang.Long
        .remainderUnsigned(mix(h0 + i), Vocab.length.toLong).toInt
      sb.append(Vocab(w))
      i += 1
    }
    sb.toString
  }
}

final class SynthTable(shape: String, rows: Long, parts: Int, seed: Long,
    centers: Int = 0, sigma: Double = 0.15)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-synth($shape, $rows rows, $parts parts)"
  override def schema(): StructType = SynthSource.schemaFor(shape)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(shape, rows, parts, seed,
      Option(options.get("rowsperbatch")).map(_.toLong)
        .getOrElse(math.max(1L, rows / 4)), centers, sigma)
}

final class SynthScanBuilder(shape: String, rows: Long, parts: Int,
    seed: Long, rowsPerBatch: Long = Long.MaxValue, centers: Int = 0,
    sigma: Double = 0.15) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private val idCol = SynthSource.idColFor(shape)
  private var required: StructType = SynthSource.schemaFor(shape)
  private var bounds: (Long, Long) = (0L, rows) // [lo, hi) on the id col
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Consume id-column comparisons into the [lo, hi) id window;
    * anything else stays with Spark. Consumed filters are FULLY
    * handled here (partition pruning + residual row filtering), so
    * they are reported via `pushedFilters` and Spark drops its own
    * copy. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (take, keep) = filters.partition {
      case EqualTo(c, _: Number) if c == idCol => true
      case GreaterThan(c, _: Number) if c == idCol => true
      case GreaterThanOrEqual(c, _: Number) if c == idCol => true
      case LessThan(c, _: Number) if c == idCol => true
      case LessThanOrEqual(c, _: Number) if c == idCol => true
      case _ => false
    }
    take.foreach {
      case EqualTo(_, v: Number) =>
        val x = v.longValue()
        bounds = (math.max(bounds._1, x), math.min(bounds._2, x + 1))
      case GreaterThan(_, v: Number) =>
        bounds = (math.max(bounds._1, v.longValue() + 1), bounds._2)
      case GreaterThanOrEqual(_, v: Number) =>
        bounds = (math.max(bounds._1, v.longValue()), bounds._2)
      case LessThan(_, v: Number) =>
        bounds = (bounds._1, math.min(bounds._2, v.longValue()))
      case LessThanOrEqual(_, v: Number) =>
        bounds = (bounds._1, math.min(bounds._2, v.longValue() + 1))
      case _ =>
    }
    pushed = take
    keep
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SynthScan(shape, rows, parts, seed, required, bounds._1, bounds._2,
      rowsPerBatch, centers, sigma)
}

final case class SynthPartition(shape: String, start: Long, end: Long,
    seed: Long, centers: Int = 0, sigma: Double = 0.15)
    extends InputPartition

final class SynthScan(shape: String, rows: Long, parts: Int, seed: Long,
    required: StructType, lo: Long, hi: Long,
    rowsPerBatch: Long = Long.MaxValue, centers: Int = 0,
    sigma: Double = 0.15) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Streaming read: the same deterministic id space delivered as
    * micro-batches of `rowsPerBatch` ids — a zero-storage stream for
    * scale-testing the stateful operators (ids arrive in id order;
    * the EVENTS shape's timestamps are hash-scattered across the
    * 30-day window, so event-time disorder across batches is heavy —
    * exactly what watermark/state logic needs exercising against). */
  override def toMicroBatchStream(checkpointLocation: String):
      MicroBatchStream =
    new SynthMicroBatchStream(shape, rows, parts, seed, required,
      rowsPerBatch)
  override def description(): String =
    s"graft-synth shape=$shape rows=$rows window=[$lo,$hi) cols=" +
      required.fieldNames.mkString(",")

  /** Partition planning WITH pruning: the id space splits into
    * `parts` even ranges; ranges disjoint from the pushed [lo, hi)
    * window are never planned — the explain's partition count is the
    * pruning evidence. */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0 until parts).iterator
      .map(i => (i * per, math.min(rows, (i + 1) * per)))
      .filter { case (s, e) => s < e && e > lo && s < hi }
      .map { case (s, e) =>
        SynthPartition(shape, math.max(s, lo), math.min(e, hi), seed,
          centers, sigma)
      }
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

/** DSv2 micro-batch stream over the synthetic id space. Offsets are
  * plain id watermarks; `latestOffset` advances one batch per call
  * until the declared row count, and AvailableNow runs the stream to
  * completion. */
final class SynthMicroBatchStream(shape: String, rows: Long, parts: Int,
    seed: Long, required: StructType, rowsPerBatch: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  final case class SynthOffset(n: Long) extends Offset {
    override def json(): String = n.toString
  }

  @volatile private var available = 0L

  override def prepareForTriggerAvailableNow(): Unit = ()

  override def initialOffset(): Offset = SynthOffset(0L)

  // SupportsAdmissionControl entry point (what Spark actually calls):
  // advance one batch of ids per trigger, up to the declared rows.
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    available = math.min(rows, available + rowsPerBatch)
    SynthOffset(available)
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control entry point")

  override def reportLatestOffset(): Offset = SynthOffset(available)

  override def deserializeOffset(json: String): Offset =
    SynthOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset):
      Array[InputPartition] = {
    val s = start.asInstanceOf[SynthOffset].n
    val e = end.asInstanceOf[SynthOffset].n
    if (s >= e) Array.empty
    else {
      val per = math.max(1L, (e - s + parts - 1) / parts)
      (0 until parts).iterator
        .map(i => (s + i * per, math.min(e, s + (i + 1) * per)))
        .filter { case (a, b) => a < b }
        .map { case (a, b) => SynthPartition(shape, a, b, seed) }
        .toArray[InputPartition]
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final class SynthReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SynthReader(p.asInstanceOf[SynthPartition], required)
}

/** Generates only the REQUIRED columns for its id range — text /
  * embedding (the expensive columns) are never rendered unless
  * requested. */
final class SynthReader(p: SynthPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  import SynthSource._

  private var id = p.start - 1
  private val fields = required.fieldNames

  override def next(): Boolean = { id += 1; id < p.end }

  private def u01(x: Long): Double =
    (mix(x) >>> 11).toDouble / (1L << 53).toDouble

  /** Deterministic center assignment for the clustered embedding
    * mixture (uniform over the `centers` option). */
  private def centerOf(id: Long): Long =
    java.lang.Long.remainderUnsigned(
      mix(id ^ 0xce47e25L ^ mix(p.seed)), p.centers.toLong)

  override def get(): InternalRow = {
    // Rendered at most once per row even when both text and n_chars
    // are projected (and not at all when neither is).
    lazy val text = textFor(id, p.seed)
    val vals = fields.map {
      // documents
      case "doc_id" => id
      case "text" => UTF8String.fromString(text)
      case "lang" =>
        UTF8String.fromString(Langs(
          java.lang.Long.remainderUnsigned(mix(id ^ 0x1a2b3cL ^ mix(p.seed)),
            Langs.length.toLong).toInt))
      case "source" =>
        UTF8String.fromString(
          "src" + java.lang.Long.remainderUnsigned(mix(id + 17 + p.seed), 20L))
      case "n_chars" => text.length.toLong
      // embeddings: isotropic by default; with centers = C > 0 the
      // vectors are a C-component mixture (center + uniform noise of
      // half-width sigma) and `label` becomes the center id — the
      // cluster-structured manifold real embedding models produce,
      // which is what gives an LSH/IVF index a realistic operating
      // point (near-isotropic vectors have no structure to exploit).
      case "vec_id" => id
      case "label" =>
        if (p.centers > 0) centerOf(id)
        else java.lang.Long.remainderUnsigned(mix(id ^ 0x5eedL ^ mix(p.seed)), 10L)
      case "embedding" =>
        val a = new Array[Double](EmbDim)
        var j = 0
        if (p.centers > 0) {
          val c = centerOf(id)
          while (j < EmbDim) {
            val ctr = u01((c * EmbDim + j) ^ mix(p.seed ^ 0x5ca1eL)) * 2.0 - 1.0
            val noise = u01(id * EmbDim + j + mix(p.seed)) * 2.0 - 1.0
            a(j) = ctr + noise * p.sigma
            j += 1
          }
        } else {
          while (j < EmbDim) {
            a(j) = u01(id * EmbDim + j + mix(p.seed)) * 2.0 - 1.0
            j += 1
          }
        }
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a)
      // events (micro timestamps over a 30-day window from epoch day
      // 19700; id order is NOT time order — realistic disorder)
      case "event_id" => id
      case "ts" =>
        1700000000000000L + java.lang.Long.remainderUnsigned(
          mix(id ^ 0x7e5L ^ mix(p.seed)), 30L * 86400L * 1000000L)
      case "user_id" =>
        java.lang.Long.remainderUnsigned(mix(id + 31 + p.seed), 1500L)
      case "event_type" =>
        UTF8String.fromString(EventTypes(
          java.lang.Long.remainderUnsigned(mix(id ^ 0xe7L ^ mix(p.seed)),
            EventTypes.length.toLong).toInt))
      case "value" => u01(id ^ 0xfaceL ^ mix(p.seed)) * 100.0
      case "props" =>
        UTF8String.fromString("{\"k\": " + java.lang.Long
          .remainderUnsigned(mix(id ^ 0x9L ^ mix(p.seed)), 100L) + "}")
      case other => throw new IllegalArgumentException(other)
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = ()
}

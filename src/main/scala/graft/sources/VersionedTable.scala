package graft.sources

import java.io.File
import java.nio.file.{Files, Paths, StandardOpenOption}

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
  * (`version=`/`parent=`/`rows=`/`schema_md5=`) followed by the
  * table-relative data-file paths of the FULL snapshot at that
  * version. Readers resolve a version by parsing its manifest and
  * reading EXACTLY the listed files — never by listing data
  * directories — so a reader can never observe a half-written
  * commit, and old versions stay readable forever (time travel is
  * `read(s, table, Some(v))`).
  *
  * Commit discipline (the AuditSink/IndexCache protocol applied to a
  * multi-version store):
  *  - data files are written to a commit-private directory first
  *    (pid+tid-suffixed, so concurrent writers never collide on
  *    files);
  *  - the manifest is staged under a private name and PUBLISHED by
  *    one atomic rename — the rename IS the commit;
  *  - versions are claimed optimistically: if v<N> already exists
  *    when the rename lands, the commit FAILS LOUDLY (optimistic
  *    concurrency — the caller re-reads the new latest and retries
  *    its merge, exactly the Delta/Iceberg contract) and the orphan
  *    data directory is removed.
  *
  * At 100 TB the same protocol holds with the local rename swapped
  * for the object store's atomic put-if-absent and the manifest
  * carrying per-file stats for pruning; nothing in the reader
  * changes. */
object VersionedTable {

  private def manifestFile(table: String, v: Int): File =
    new File(table, s"v$v.manifest")

  /** Highest committed version, if any (atomic-rename publish means
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

  /** Commit `df` as the next full snapshot version of `table`;
    * returns the committed version number. Fails loudly on a lost
    * commit race (see object doc). */
  def commit(df: DataFrame, table: String): Int =
    commitMode(df, table, append = false, batchId = None)

  /** Commit `df` as an APPEND version: the manifest lists only the
    * NEW files plus `mode=append`; readers resolve the version by
    * unioning the parent chain down to the last snapshot. This is
    * the O(batch) ingest shape (a micro-batch lands without
    * rewriting the table); `commit` (full snapshot) is the
    * compaction that periodically collapses the chain — together
    * they are the LSM rhythm the text index's append/compact pair
    * already grades, applied to table storage. */
  def commitAppend(df: DataFrame, table: String): Int =
    commitMode(df, table, append = true, batchId = None)

  /** EXACTLY-ONCE streaming-sink commit: land micro-batch `batchId`
    * as one table version (batch 0 = the base snapshot, later
    * batches = appends), recording the batch id in the manifest —
    * and make the commit IDEMPOTENT on it: a replayed batch whose id
    * is already committed is a no-op (returns the existing version).
    * This is the transaction-log rule every lakehouse streaming sink
    * runs (version-per-batchId); with it, micro-batch retries after
    * a crash land each batch exactly once, which is what
    * `foreachBatch` alone does NOT guarantee. Returns the version
    * holding the batch. */
  def commitBatch(df: DataFrame, table: String, batchId: Long): Int =
    committedBatch(table, batchId).getOrElse(
      commitMode(df, table, append = batchId > 0, batchId = Some(batchId)))

  /** The version holding streaming batch `batchId`, if committed. */
  def committedBatch(table: String, batchId: Long): Option[Int] = {
    import scala.jdk.CollectionConverters._
    (1 to latestVersion(table).getOrElse(0)).find { v =>
      Files.readAllLines(manifestFile(table, v).toPath).asScala
        .contains(s"batch_id=$batchId")
    }
  }

  private def commitMode(df: DataFrame, table: String,
      append: Boolean, batchId: Option[Long]): Int = {
    new File(table).mkdirs()
    val v = latestVersion(table).getOrElse(0) + 1
    require(!append || v > 1, "append needs a base snapshot commit")
    commitAt(df, table, v, append, batchId)
  }

  /** The version-CLAIM step of a commit: write data + staged
    * manifest, publish by atomic rename of `v`'s manifest. Package-
    * private so the spec can drive the lost-race path directly (two
    * writers that both read latest = v−1 race on the same v; only
    * one rename can land). */
  private[graft] def commitAt(df: DataFrame, table: String, v: Int,
      append: Boolean, batchId: Option[Long] = None): Int = {
    val rel = s"data/v${v}_${ProcessHandle.current().pid()}_" +
      s"${Thread.currentThread().getId}"
    val dataDir = new File(table, rel)
    df.write.mode("errorifexists").parquet(dataDir.getPath)
    val parts = Option(dataDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
    val rows = df.sparkSession.read.parquet(dataDir.getPath).count()
    val schemaMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(df.schema.toDDL.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val body = (Seq(
      s"version=$v", s"parent=${v - 1}", s"rows=$rows",
      s"mode=${if (append) "append" else "snapshot"}",
      s"schema_md5=$schemaMd5") ++
      batchId.map(b => s"batch_id=$b").toSeq ++
      parts.map(p => s"$rel/$p"))
      .mkString("", "\n", "\n")
    val staged = new File(table, s"_staged_v${v}_" +
      s"${ProcessHandle.current().pid()}_${Thread.currentThread().getId}")
    Files.write(staged.toPath, body.getBytes("UTF-8"),
      StandardOpenOption.CREATE_NEW)
    val target = manifestFile(table, v)
    // CREATE_NEW + rename: the only way two writers both "succeed" on
    // one version is a non-atomic filesystem — rename-onto-existing
    // succeeds on POSIX, so check-then-rename plus the loud re-check
    // below is the local stand-in for put-if-absent.
    if (target.exists() || !staged.renameTo(target)) {
      staged.delete()
      rm(dataDir)
      throw new IllegalStateException(
        s"commit race lost: version $v of $table already exists — " +
          "re-read latest and retry the merge")
    }
    v
  }

  /** Read a committed version (default: latest). Resolves exactly
    * the manifest's file list — for an append version, the union of
    * its parent chain down to (and including) the nearest snapshot
    * manifest. */
  def read(s: SparkSession, table: String,
      version: Option[Int] = None): DataFrame = {
    val v0 = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed version in $table"))
    import scala.jdk.CollectionConverters._
    def filesOf(v: Int): Seq[String] = {
      val lines = Files.readAllLines(manifestFile(table, v).toPath)
        .asScala.toSeq
      val own = lines.filterNot(_.contains("=")).filter(_.nonEmpty)
        .map(rel => new File(table, rel).getPath)
      val isAppend = lines.contains("mode=append")
      if (isAppend) filesOf(v - 1) ++ own else own
    }
    s.read.parquet(filesOf(v0): _*)
  }

  /** Manifest-declared row count — the metadata a planner prunes by;
    * [[graft.operators.Ingest.tableVersion]] grades it against the
    * read-back count so the manifest can never drift from the data. */
  def manifestRows(table: String, v: Int): Long = {
    import scala.jdk.CollectionConverters._
    Files.readAllLines(manifestFile(table, v).toPath).asScala
      .find(_.startsWith("rows=")).map(_.stripPrefix("rows=").toLong)
      .getOrElse(-1L)
  }

  private def rm(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
  }
}

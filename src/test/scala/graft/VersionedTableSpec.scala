package graft

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** The committed-table protocol in isolation (q_table_version grades
  * the composed row; these pin the commit/read contract itself). */
class VersionedTableSpec extends SparkSuite
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val tmpDirs = scala.collection.mutable.ArrayBuffer[String]()
  override def afterAll(): Unit = {
    import scala.reflect.io.Directory
    tmpDirs.foreach(d =>
      new Directory(new java.io.File(d)).deleteRecursively())
    super.afterAll()
  }

  private def freshTable(): String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_vtab_spec").toString
    tmpDirs += d
    s"$d/t"
  }

  test("commit → read-back round-trips both versions; old versions " +
      "stay readable after new commits (snapshot isolation)") {
    val t = freshTable()
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "h")
    val v2 = Seq((1L, "a"), (2L, "B2"), (3L, "c")).toDF("doc_id", "h")
    assert(VersionedTable.commit(v1, t) === 1)
    assert(VersionedTable.commit(v2, t) === 2)
    assert(VersionedTable.latestVersion(t).contains(2))
    def rows(v: Int) = VersionedTable.read(spark, t, Some(v))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(1) === Set((1L, "a"), (2L, "b")))
    assert(rows(2) === Set((1L, "a"), (2L, "B2"), (3L, "c")))
    // Default read = latest.
    assert(VersionedTable.read(spark, t).count() === 3L)
    // Manifest metadata honest.
    assert(VersionedTable.manifestRows(t, 1) === 2L)
    assert(VersionedTable.manifestRows(t, 2) === 3L)
  }

  test("a lost commit race fails loudly and leaves no orphan data") {
    val t = freshTable()
    VersionedTable.commit(Seq((1L, "a")).toDF("doc_id", "h"), t)
    // Two writers both read latest = 1 and race on version 2; the
    // first claim lands, the second (driven through the claim step
    // directly — the race window is between latestVersion and the
    // rename) must fail loudly.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(t, "v2.manifest"),
      "version=2\nparent=1\nrows=0\nmode=snapshot\nschema_md5=x\n")
    val ex = intercept[IllegalStateException] {
      VersionedTable.commitAt(
        Seq((2L, "b")).toDF("doc_id", "h"), t, 2, append = false)
    }
    assert(ex.getMessage.contains("commit race"))
    // The loser's private data directory was removed — only the
    // winner-side artifacts remain under data/.
    val dirs = Option(new java.io.File(t, "data").listFiles())
      .getOrElse(Array.empty).map(_.getName)
    assert(dirs.count(_.startsWith("v2_")) === 0,
      s"orphan commit dirs left: ${dirs.mkString(",")}")
    // v1 is untouched; the winner's manifest still resolves.
    assert(VersionedTable.read(spark, t, Some(1)).count() === 1L)
    assert(VersionedTable.latestVersion(t).contains(2))
  }

  test("append commits resolve through the parent chain down to the " +
      "nearest snapshot; a later snapshot collapses the chain") {
    val t = freshTable()
    VersionedTable.commit(Seq((1L, "a")).toDF("doc_id", "h"), t)
    VersionedTable.commitAppend(Seq((2L, "b")).toDF("doc_id", "h"), t)
    VersionedTable.commitAppend(Seq((3L, "c")).toDF("doc_id", "h"), t)
    def ids(v: Int) = VersionedTable.read(spark, t, Some(v))
      .collect().map(_.getLong(0)).toSet
    assert(ids(1) === Set(1L))
    assert(ids(2) === Set(1L, 2L))
    assert(ids(3) === Set(1L, 2L, 3L))
    // Compaction: a full snapshot at v4 ends the chain — v4 reads
    // only its own files, and the appends stay readable behind it.
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "h"), t)
    assert(ids(4) === Set(1L, 2L, 3L))
    assert(ids(2) === Set(1L, 2L))
    // Appends need a base snapshot.
    val t2 = freshTable()
    intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(Seq((1L, "x")).toDF("doc_id", "h"), t2)
    }
  }

  test("commitBatch is idempotent on the batch id — a replayed " +
      "micro-batch lands exactly once") {
    val t = freshTable()
    val b0 = Seq((1L, "a")).toDF("doc_id", "h")
    val b1 = Seq((2L, "b")).toDF("doc_id", "h")
    assert(VersionedTable.commitBatch(b0, t, 0L) === 1)
    assert(VersionedTable.commitBatch(b1, t, 1L) === 2)
    // Retry of batch 1 (the at-least-once delivery case): no new
    // version, no duplicate rows, the existing version is returned.
    assert(VersionedTable.commitBatch(b1, t, 1L) === 2)
    assert(VersionedTable.latestVersion(t).contains(2))
    assert(VersionedTable.read(spark, t).count() === 2L)
    assert(VersionedTable.committedBatch(t, 1L).contains(2))
    assert(VersionedTable.committedBatch(t, 7L).isEmpty)
  }

  test("200-version chain: batch lookup is one manifest read, read " +
      "cost and chain depth stay flat (auto-compaction), all batches " +
      "idempotent") {
    val t = freshTable()
    val n = 200
    (0 until n).foreach { b =>
      VersionedTable.commitBatch(
        Seq((b.toLong, s"h$b")).toDF("doc_id", "h"), t, b.toLong)
    }
    assert(VersionedTable.latestVersion(t).contains(n))
    // Auto-compaction: EVERY version's append-chain depth is bounded
    // by the dial — a reader never unions more than AutoCompactEvery
    // append manifests, however long the table lives.
    (1 to n).foreach { v =>
      assert(VersionedTable.chainDepth(t, v) <=
        VersionedTable.AutoCompactEvery, s"chain too deep at v$v")
    }
    // ...and compaction actually fired (some snapshot beyond v1).
    assert((2 to n).exists(VersionedTable.chainDepth(t, _) === 0))
    // O(1) batch lookup: the registry in the LATEST manifest resolves
    // every batch id — one file read each, no manifest walk. (The
    // implementation only opens latestVersion's manifest; correctness
    // of the full map is the observable contract.)
    Seq(0L, 1L, 77L, (n - 1).toLong).foreach { b =>
      val v = VersionedTable.committedBatch(t, b)
      assert(v.nonEmpty && v.get <= n, s"batch $b unresolved")
    }
    assert(VersionedTable.committedBatch(t, 9999L).isEmpty)
    // Replay of an OLD batch (crash-recovery case) is still a no-op
    // even though its version is deep in the chain.
    val before = VersionedTable.latestVersion(t)
    VersionedTable.commitBatch(
      Seq((77L, "h77")).toDF("doc_id", "h"), t, 77L)
    assert(VersionedTable.latestVersion(t) === before)
    // Content survived the compactions: every batch's row is present
    // exactly once in the latest version.
    val ids = VersionedTable.read(spark, t).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids === (0 until n).map(_.toLong))
  }

  test("commitWithRetry replays the merge on a lost race — the " +
      "winner's commit is incorporated, not overwritten") {
    val t = freshTable()
    VersionedTable.commit(Seq((1L, "a")).toDF("doc_id", "h"), t)
    // First merge attempt races: simulate the winner landing between
    // the loser's read and its commit by committing from INSIDE the
    // loser's merge function on attempt 1.
    var attempts = 0
    val v = VersionedTable.commitWithRetry(spark, t, { base =>
      attempts += 1
      if (attempts == 1) // the interleaved winner (full snapshot)
        VersionedTable.commit(
          Seq((1L, "a"), (9L, "w")).toDF("doc_id", "h"), t)
      base.get.unionByName(
        Seq((attempts.toLong + 100L, "m")).toDF("doc_id", "h"))
    })
    assert(attempts === 2, "merge must be REPLAYED after the lost race")
    assert(v === 3) // v1 base, v2 winner, the replay lands v3
    // The final snapshot holds the winner's row AND the replayed
    // merge (which re-read v2's content) — nothing silently dropped.
    val ids = VersionedTable.read(spark, t).collect()
      .map(_.getLong(0)).toSet
    assert(ids === Set(1L, 9L, 102L))
    // Exhaustion path: a merge that always loses gives up loudly.
    val ex = intercept[IllegalStateException] {
      VersionedTable.commitWithRetry(spark, t, { base =>
        VersionedTable.commit(base.get, t) // somebody always wins first
        base.get
      }, maxAttempts = 2)
    }
    assert(ex.getMessage.contains("lost 2 races"))
  }

  test("manifests are relocation-safe (relative paths — the atomic-" +
      "publish rename of the fingerprint store cannot break reads)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_vtab_mv").toString
    tmpDirs += root
    val t = s"$root/a"
    VersionedTable.commit(
      Seq((1L, "x"), (2L, "y")).toDF("doc_id", "h"), t)
    assert(new java.io.File(t).renameTo(new java.io.File(s"$root/b")))
    val back = VersionedTable.read(spark, s"$root/b", Some(1))
    assert(back.orderBy(col("doc_id")).collect()
      .map(_.getString(1)).toSeq === Seq("x", "y"))
  }

  test("add-only schema evolution: appended column reads back null " +
      "for pre-evolution files; drift/drop/retype/non-nullable refused") {
    val t = freshTable()
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "source"), t)
    val v2 = Seq((3L, "c", "en")).toDF("doc_id", "source", "lang")
    // Schema drift without the flag is refused loudly.
    intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(v2, t)
    }
    assert(VersionedTable.commitAppend(v2, t, evolveSchema = true) === 2)
    val back = VersionedTable.read(spark, t).orderBy(col("doc_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(back.toSeq === Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some("en"))))
    // Time travel keeps the OLD version's own schema.
    assert(VersionedTable.read(spark, t, Some(1)).schema.fieldNames
      .toSeq === Seq("doc_id", "source"))
    // Dropping a column is refused even with the flag (add-only).
    intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(
        Seq((4L, "d")).toDF("doc_id", "source"), t, evolveSchema = true)
    }
    // Re-typing a column is refused (doc_id int vs long).
    intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(
        Seq((5, "e", "fr")).toDF("doc_id", "source", "lang"), t,
        evolveSchema = true)
    }
    // A non-nullable added column is refused — pre-evolution files
    // would read back null in it.
    intercept[IllegalArgumentException] {
      VersionedTable.commitAppend(
        Seq((6L, "f", "de", 1L))
          .toDF("doc_id", "source", "lang", "rank"), t,
        evolveSchema = true)
    }
    // Compaction across the evolved chain lands the union schema
    // with history intact (allowMissingColumns union).
    (1 to VersionedTable.AutoCompactEvery).foreach { i =>
      VersionedTable.commitAppend(
        Seq((100L + i, "z", "xx")).toDF("doc_id", "source", "lang"), t)
    }
    val latest = VersionedTable.latestVersion(t).get
    assert(VersionedTable.chainDepth(t, latest) === 0) // compacted
    val all = VersionedTable.read(spark, t)
    assert(all.count() === 3L + VersionedTable.AutoCompactEvery)
    assert(all.where(col("lang").isNull).count() === 2L) // v1 rows
  }

  test("per-file stats prune a range read to the intersecting files " +
      "only, and pruned ≡ unpruned-filtered") {
    val t = freshTable()
    // 8 range-partitioned files over ids 0..799 → tight per-file
    // id ranges the manifest stats codec must capture.
    val df = spark.range(0, 800).toDF("doc_id")
      .withColumn("v", (col("doc_id") * 7 % 100).cast("long"))
      .repartitionByRange(8, col("doc_id"))
    assert(VersionedTable.commit(df, t, statsCol = Some("doc_id")) === 1)
    assert(VersionedTable.statsRange(t, 1) === (0L, 799L))
    val all = VersionedTable.resolveFiles(t, 1)
    assert(all.size === 8 && all.forall(_._2.isDefined))
    // Every row is accounted for by the stats codec.
    assert(all.flatMap(_._2).map(_._1).sum === 800L)
    // The middle quarter of the id space must keep a strict subset
    // of files (range partitioning puts ~200 ids in ~2-3 files).
    val (lo, hi) = (200L, 399L)
    val kept = all.collect {
      case (p, Some((_, mn, mx))) if mx >= lo && mn <= hi => p }
    assert(kept.nonEmpty && kept.size <= all.size / 2,
      s"expected pruning, kept ${kept.size}/${all.size}")
    val pruned = VersionedTable.readWhere(spark, t, "doc_id", lo, hi)
    val full = VersionedTable.read(spark, t)
      .where(col("doc_id") >= lo && col("doc_id") <= hi)
    assert(pruned.orderBy(col("doc_id")).collect().toSeq ===
      full.orderBy(col("doc_id")).collect().toSeq)
    // And the pruned plan's scan really reads fewer files.
    val scanned = pruned.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution
          .FileSourceScanExec => f.relation.location.inputFiles.length }
      .sum
    assert(scanned === kept.size)
    // A mismatched stats column is refused, not silently mis-pruned.
    intercept[IllegalArgumentException] {
      VersionedTable.readWhere(spark, t, "v", 0L, 10L)
    }
    // Stats-less commits stay readable and un-pruned (conservative).
    val t2 = freshTable()
    VersionedTable.commit(df, t2)
    assert(VersionedTable.resolveFiles(t2, 1).forall(_._2.isEmpty))
    intercept[IllegalArgumentException] {
      VersionedTable.statsRange(t2, 1)
    }
  }

  test("readChanges: an all-append window resolves to ONLY the " +
      "appended files; a compaction in the window falls back to the " +
      "exact bag diff; edge versions behave") {
    val t = freshTable()
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "h"), t)
    VersionedTable.commitAppend(Seq((3L, "c")).toDF("doc_id", "h"), t)
    VersionedTable.commitAppend(
      Seq((4L, "d"), (5L, "e")).toDF("doc_id", "h"), t)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSet
    val chg = VersionedTable.readChanges(spark, t, fromV = 1)
    assert(ids(chg) === Set(3L, 4L, 5L))
    // FAST path: the change read opens no v1 file — its inputs are
    // exactly the two append manifests' own files.
    val v1Files = VersionedTable.resolveFiles(t, 1).map(_._1).toSet
    assert(chg.inputFiles.nonEmpty &&
      chg.inputFiles.forall(f => !v1Files.exists(f.endsWith)))
    assert(ids(VersionedTable.readChanges(spark, t, 2, Some(3)))
      === Set(4L, 5L))
    // Edges: fromV == toV is empty (schema kept); fromV = 0 is the
    // full snapshot.
    val empty = VersionedTable.readChanges(spark, t, 3)
    assert(empty.count() === 0L &&
      empty.columns.toSeq === Seq("doc_id", "h"))
    assert(ids(VersionedTable.readChanges(spark, t, 0))
      === Set(1L, 2L, 3L, 4L, 5L))
    // FALLBACK: a snapshot rewrite inside the window (here a merge
    // that also updates a standing row) → bag diff of the contents.
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d"), (5L, "e"),
        (6L, "f")).toDF("doc_id", "h"), t)
    val across = VersionedTable.readChanges(spark, t, 1)
    assert(across.collect().map(r =>
      (r.getLong(0), r.getString(1))).toSet ===
      Set((2L, "B2"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f")))
    // Out-of-range fromV refused.
    intercept[IllegalArgumentException] {
      VersionedTable.readChanges(spark, t, 9)
    }
  }

  test("deleteWhere rewrites ONLY the intersecting files — disjoint " +
      "files carry forward by reference with their stats; content, " +
      "metadata, and time travel stay exact; nulls are kept") {
    val t = freshTable()
    val df = spark.range(0, 800).toDF("doc_id")
      .withColumn("v", (col("doc_id") * 7 % 100).cast("long"))
      .repartitionByRange(8, col("doc_id"))
    VersionedTable.commit(df, t, statsCol = Some("doc_id"))
    val before = VersionedTable.resolveFiles(t, 1)
    assert(VersionedTable.deleteWhere(spark, t, "doc_id", 200L, 399L)
      === 2)
    val after = VersionedTable.resolveFiles(t, 2)
    val beforeByPath = before.toMap
    val (carried, rewritten) =
      after.partition(f => beforeByPath.contains(f._1))
    // 8 tight range files over 0..799 → [200, 399] touches ~2-3;
    // the rest must be REFERENCED, not rewritten — stats verbatim.
    assert(rewritten.nonEmpty && carried.size >= 5,
      s"carried ${carried.size}, rewritten ${rewritten.size}")
    carried.foreach { case (p, st) =>
      assert(st === beforeByPath(p), s"stats drifted for $p") }
    // Content = the filtered v1, exactly.
    val got = VersionedTable.read(spark, t, Some(2))
      .orderBy(col("doc_id")).collect().toSeq
    val want = VersionedTable.read(spark, t, Some(1))
      .where(col("doc_id") < 200 || col("doc_id") > 399)
      .orderBy(col("doc_id")).collect().toSeq
    assert(got === want)
    // Manifest row count honest; global stats exclude the range.
    assert(VersionedTable.manifestRows(t, 2) === 600L)
    // Time travel: the pre-delete version is untouched.
    assert(VersionedTable.read(spark, t, Some(1)).count() === 800L)
    // The post-delete version still prunes range reads.
    assert(VersionedTable.readWhere(spark, t, "doc_id", 0L, 100L)
      .count() === 101L)
    // NULL stats-column rows never match a range delete.
    val t2 = freshTable()
    VersionedTable.commit(
      Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (null, "n"))
        .toDF("doc_id", "h"), t2, statsCol = Some("doc_id"))
    VersionedTable.deleteWhere(spark, t2, "doc_id", 1L, 1L)
    assert(VersionedTable.read(spark, t2).collect()
      .map(_.getString(1)).toSet === Set("b", "n"))
    // A stats-less table is refused, not silently mis-deleted.
    val t3 = freshTable()
    VersionedTable.commit(df, t3)
    intercept[IllegalArgumentException] {
      VersionedTable.deleteWhere(spark, t3, "doc_id", 0L, 10L)
    }
  }

  test("vacuum expires versions below the floor and GCs exactly the " +
      "unreferenced data files — carried-forward files survive, " +
      "append chains are never broken") {
    val t = freshTable()
    val df = spark.range(0, 800).toDF("doc_id")
      .withColumn("v", (col("doc_id") * 7 % 100).cast("long"))
      .repartitionByRange(8, col("doc_id"))
    VersionedTable.commit(df, t, statsCol = Some("doc_id"))
    // v2: copy-on-write delete — rewrites the middle files, CARRIES
    // the rest by reference out of v1's data directory.
    VersionedTable.deleteWhere(spark, t, "doc_id", 200L, 399L)
    // v3: an append on top of the delete snapshot.
    VersionedTable.commitAppend(
      spark.range(800, 810).toDF("doc_id")
        .withColumn("v", lit(1L)), t)
    def allParquet() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(t, "data"))
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSet
    }
    val filesBefore = allParquet()
    val referenced = (2 to 3)
      .flatMap(v => VersionedTable.resolveFiles(t, v)).map(_._1).toSet
    val (expired, deleted) = VersionedTable.vacuum(t, 2)
    assert(expired === 1)
    // Exactly the unreferenced v1 files went; every referenced file
    // (including the carried-forward ones in v1's directory) stayed.
    assert(allParquet() === referenced)
    assert(deleted === (filesBefore -- referenced).size && deleted > 0)
    // Kept versions read exactly as before the vacuum.
    assert(VersionedTable.read(spark, t, Some(2)).count() === 600L)
    assert(VersionedTable.read(spark, t, Some(3)).count() === 610L)
    // The expired version is gone — loudly, not wrongly.
    intercept[java.nio.file.NoSuchFileException] {
      VersionedTable.read(spark, t, Some(1)).count()
    }
    // A floor on an APPEND version drops to its chain's snapshot:
    // nothing else expires and the chain still resolves.
    val (expired2, deleted2) = VersionedTable.vacuum(t, 3)
    assert(expired2 === 0 && deleted2 === 0)
    assert(VersionedTable.read(spark, t, Some(3)).count() === 610L)
    // Out-of-range floors refused.
    intercept[IllegalArgumentException] { VersionedTable.vacuum(t, 9) }
  }
}

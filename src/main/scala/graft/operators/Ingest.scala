package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Ingestion / text-prep pipeline — the reference's entire write
  * path, re-expressed as Spark transforms: embedding-text
  * construction (reference: db/ingest_cards.py:97-108
  * create_card_embedding_text — concatenate name/type/text fields,
  * strip markup), ingest-time duplicate collapse by content id
  * (reference: db/ingest_cards.py:95-105 scryfallOracleId upsert
  * key), and corpus statistics (reference: db/query_example.py:142-171
  * "database statistics").
  *
  * Scale design: embed-text is a map-only projection; the dedup
  * collapse is a hash-agg on a uniformly distributed md5 key (no
  * skew); stats aggregate on the bounded source key with map-side
  * combine. No joins, no windows.
  */
object Ingest extends graft.QueryGroup {

  /** Normalized content: lowercase, strip non-alnum "markup",
    * collapse whitespace — the cleanCardJson.py semantics. */
  private def normText(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Embedding-text construction: `name | lang | normalized body`
    * truncated to a fixed prefix — the shape the reference feeds its
    * embedding model. */
  def embedText(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat_ws(" | ", docName(col("text")), col("lang"),
          substring(normText(col("text")), 1, 120)).as("embed_text"))
      .select(col("doc_id"), col("embed_text"),
        length(col("embed_text")).as("embed_len"))
      .orderBy(col("doc_id").asc)

  /** Retry budget of the batch-embed protocol (reference
    * max_retries). */
  private[graft] val EmbedAttempts = 3
  /** Planted deterministic failure dials: ~1% of docs fail
    * PERMANENTLY (the model rejects them on every attempt), ~20% of
    * (doc, attempt) calls fail TRANSIENTLY (the timeout/5xx class a
    * retry absorbs). md5-derived, so the oracle replants them
    * exactly. */
  private[graft] val EmbedPermMod = 97L
  private[graft] val EmbedTransMod = 5L

  /** q_embed_batch — the batch-embed FAILURE-ACCOUNTING protocol
    * (reference: db/db_utils.py:100-169 `generate_embedding` retries
    * each doc up to max_retries with backoff and returns None after
    * the last failure; `generate_embeddings_batch` keeps going past
    * per-doc failures — the batch completes PARTIALLY — and closes
    * with a successful/total census). The embedding service is a
    * deterministic stub (this sandbox has no model — the q_multimodal
    * decodeStub discipline): a (doc, attempt) call fails iff a
    * planted md5 rule fires ([[EmbedPermMod]] permanent /
    * [[EmbedTransMod]] transient), so the whole retry ladder is
    * replayable and the row grades hash-exact. Emits ONE ROW PER DOC
    * — attempts consumed, final status, progress-batch id, embedded
    * text length (0 on error) — the per-doc error accounting the
    * reference prints; a real deployment swaps the failure rule for
    * the service call and keeps every column.
    *
    * Scale: map-only — the retry ladder is a per-row CASE over
    * [[EmbedAttempts]] md5 evaluations; no shuffle, no state, no
    * driver loop (the reference's sequential for-loop becomes
    * embarrassingly parallel; per-doc isolation is exactly what makes
    * that safe). */
  def embedBatch(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.MinHash
    val perm = MinHash.hash60(
      concat(lit("embp:"), col("doc_id").cast("string")))
      .%(EmbedPermMod) === 0
    def trans(a: Int) = MinHash.hash60(
      concat(lit("embt:"), col("doc_id").cast("string"), lit(s":$a")))
      .%(EmbedTransMod) === 0
    def fails(a: Int) = perm || trans(a)
    // attempts = first non-failing attempt (capped); status errs when
    // the last attempt also failed — the reference's "after
    // max_retries" give-up.
    val attempts = when(!fails(1), 1)
      .when(!fails(2), 2).otherwise(EmbedAttempts)
    val ok = !fails(1) || !fails(2) || !fails(EmbedAttempts)
    Tables.documents(s, dir)
      .select(col("doc_id"), expr("doc_id DIV 10").as("batch_id"),
        concat_ws(" | ", docName(col("text")), col("lang"),
          substring(normText(col("text")), 1, 120)).as("embed_text"))
      .select(col("doc_id"), col("batch_id"),
        attempts.cast("long").as("attempts"),
        when(ok, lit("ok")).otherwise(lit("error")).as("status"),
        when(ok, length(col("embed_text"))).otherwise(lit(0))
          .cast("long").as("embed_len"))
      .orderBy(col("doc_id").asc)
  }

  /** Ingest-time duplicate collapse: group by content id (md5 of the
    * normalized text = the oracle_id role), keep the lowest doc_id as
    * canonical winner, count collapsed copies. */
  def ingestDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(md5(normText(col("text"))).as("content_id"), col("doc_id"))
      .groupBy(col("content_id"))
      .agg(min(col("doc_id")).as("canonical_doc"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("content_id").asc)

  /** Per-source corpus statistics: doc count, distinct languages,
    * char totals/extremes — query_example.py's "database statistics"
    * panel as one aggregation. */
  def docStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
          .as("avg_chars"))
      .orderBy(col("source").asc)

  /** Cross-table coverage statistics — the second half of
    * query_example.py's "database statistics" panel (reference:
    * db/query_example.py:142-171 counts each document table NEXT TO
    * its embedding table; the interesting number is the gap). Per
    * source: document count, how many have an embedding row, and the
    * missing count — the audit every ingest run ends with.
    *
    * Scale: equi-join on the uniformly distributed doc_id key (at
    * 100 TB both sides shuffle-partition on the key; no skew, no
    * window), then a bounded-key aggregate with map-side combine. */
  def sourceStats(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val embs = Tables.embeddings(s, dir).select(col("vec_id"))
    docs.join(embs, docs("doc_id") === embs("vec_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("vec_id")).as("n_embedded"),
        (count(lit(1)) - count(col("vec_id"))).as("n_missing"))
      .orderBy(col("source").asc)
  }

  /** Pre-ingest JSON cleaning — the reference's cardsCleaning stage
    * (reference: cardsCleaning/cleanCardJson.py:3-16 pops a fixed
    * denylist of keys from every card object; :19-44 rewrites the
    * corpus). Re-expressed schema-free: build the card-shaped JSON
    * doc, strip the denylist with the native [[graft.plans
    * .JsonStripKeys]] kernel (one Jackson pass, codegen), then audit
    * the result per brand — surviving key count, denylist leaks
    * (must be 0), and two kept-value integrity sums proving the
    * cleaner touched nothing else. Numbers-only output so the
    * oracle compares semantics, not serializer whitespace.
    *
    * Scale: map-only projection + bounded-key hash-agg. */
  def jsonClean(s: SparkSession, dir: String): DataFrame = {
    val denylist = Seq("p_retailprice", "p_type")
    val raw = to_json(struct(col("p_partkey"), col("p_name"),
      col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")))
    Tables.part(s, dir)
      .select(col("p_brand"), col("p_name"), col("p_size"),
        graft.plans.JsonStripKeys(raw, denylist).as("cleaned"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(size(json_object_keys(col("cleaned")))).as("kept_keys"),
        sum(when(get_json_object(col("cleaned"), "$.p_retailprice")
          .isNotNull, 1).otherwise(0)).as("leaked"),
        sum(get_json_object(col("cleaned"), "$.p_size").cast("long"))
          .as("sum_size"),
        sum(when(get_json_object(col("cleaned"), "$.p_name")
          === col("p_name"), 1).otherwise(0)).as("names_intact"))
      .orderBy(col("p_brand").asc)
  }

  /** Schema-free JSON attribute containment — the reference's
    * `card_data @> '{...}'` capability (reference: db/init.sql:37
    * `idx_cards_data GIN (card_data)` over the raw JSONB column):
    * filter by ANY attribute of a schema-free JSON document —
    * scalar equality, numeric range, array-element containment —
    * without a schema migration. The card-shaped doc is built from
    * `part` exactly as [[jsonClean]] does; the predicate then reads
    * ONLY the JSON column through `get_json_object`/`from_json`
    * (codegen'd path expressions, no UDF), never the source columns,
    * and the output fields are themselves extracted from the JSON —
    * proving the whole schema-free read path.
    *
    * Scale: map-only scan+filter (the one exchange is the output
    *-order sort, plan-asserted in PlanSpec); at 100 TB the predicate
    * runs inside whole-stage codegen next to the parquet reader, and
    * a deployment that needs index-grade selectivity materializes the
    * hot keys into columns/partitions — which this operator's
    * extraction expressions make a one-line `withColumn` away. */
  def jsonFilter(s: SparkSession, dir: String): DataFrame = {
    val cardData = to_json(struct(
      col("p_partkey").as("id"), col("p_name").as("name"),
      col("p_brand").as("brand"), col("p_type").as("type"),
      col("p_size").as("size"), split(col("p_name"), " ").as("tags")))
    def attr(k: String) = get_json_object(col("card_data"), s"$$.$k")
    Tables.part(s, dir)
      .select(cardData.as("card_data"))
      .where(attr("type") === "ECONOMY" &&
        attr("size").cast("int") <= 25 &&
        array_contains(
          from_json(attr("tags"), org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)), "red"))
      .select(attr("id").cast("bigint").as("part_id"),
        attr("brand").as("brand"), attr("size").cast("int").as("size"),
        attr("name").as("name"))
      .orderBy(col("part_id").asc)
  }

  /** Divisor for the demo forget-request list: ids with
    * hash60('del:'||doc_id) % 13 == 0 (content-independent, so the
    * oracle replicates the list exactly). */
  private[graft] val ForgetMod = 13

  /** Right-to-be-forgotten DELETE pass — the governance op every
    * 100 TB corpus must run (GDPR/CCPA erasure; the reference's
    * DELETE-by-key write path generalized to batch): a bounded
    * delete-request list is removed from the corpus by BROADCAST
    * anti-join, and the pass emits the per-source audit a compliance
    * run must produce — docs/chars kept vs forgotten, plus an
    * ORDER-INVARIANT manifest digest of exactly which doc ids were
    * erased (the deletion receipt; re-running the pass must
    * reproduce it bit for bit). The digest is sum(hash60(doc_id)) on
    * DECIMAL(38,0) — commutative and shard-mergeable with O(1) agg
    * state (the r11 md5-of-collect_list buffered every forgotten id
    * of a source in ONE task: the unbounded-buffer class the
    * PlanSpec collect sweep now rejects).
    *
    * Scale: the request list is tiny (requests, not corpus) →
    * broadcast left-anti + broadcast semi probes, never a corpus
    * shuffle on the join; the audit is a bounded source-key agg with
    * map-side combine. Plan-asserted in PlanSpec: both probes
    * broadcast, no SortMergeJoin. */
  def forget(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val requests = docs
      .where(pmod(graft.functions.MinHash.hash60(
        concat(lit("del:"), col("doc_id").cast("string"))), lit(ForgetMod))
        === 0)
      .select(col("doc_id"))
    val kept = docs.join(broadcast(requests), Seq("doc_id"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("chars_kept"))
    val gone = docs.join(broadcast(requests), Seq("doc_id"), "left_semi")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_forgotten"),
        sum(col("n_chars")).as("chars_forgotten"),
        sum(graft.functions.MinHash.hash60(col("doc_id").cast("string"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("string").as("manifest_digest"))
    kept.join(gone, Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("chars_kept"), lit(0L)).as("chars_kept"),
        coalesce(col("n_forgotten"), lit(0L)).as("n_forgotten"),
        coalesce(col("chars_forgotten"), lit(0L)).as("chars_forgotten"),
        coalesce(col("manifest_digest"), lit("")).as("manifest_digest"))
      .orderBy(col("source").asc)
  }

  /** Keyed MERGE/upsert — the reference's batch write path
    * (db/ingest_cards.py:120-152 `ON CONFLICT (oracle_id) DO
    * UPDATE`, db/init.sql:88-116 upsert functions) as one relational
    * pass: full-outer-join the current snapshot with an incoming
    * batch on the key, classify every key as insert (batch-only) /
    * update (both, content differs) / unchanged (both, identical) /
    * carryover (snapshot-only), and emit the labeled new snapshot —
    * the shape every incremental corpus refresh runs.
    *
    * The demo snapshot/batch derive deterministically from
    * `documents` so the oracle can replicate them: snapshot = ids
    * not divisible by 10, batch = ids divisible by 3 with revised
    * text for ids divisible by 6 — all four classes populated.
    *
    * Scale: ONE shuffle of each side on the uniformly distributed
    * key (no skew), map-side md5, no windows. At 100 TB the
    * snapshot is stored bucketed by key, which turns this into a
    * storage-partitioned join that shuffles only the (much smaller)
    * batch; the classification itself is unchanged. */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val snap = docs.where(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("h_old"))
    val batch = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 6 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text"))).as("h_new"))
    snap.join(batch, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, lit("insert"))
          .when(col("h_new").isNull, lit("carryover"))
          .when(col("h_old") =!= col("h_new"), lit("update"))
          .otherwise(lit("unchanged")).as("action"),
        coalesce(col("h_new"), col("h_old")).as("content_hash"))
      .orderBy(col("doc_id").asc)
  }

  /** Layout fingerprint of the q_table_version store — names every
    * rule the committed bytes depend on (bump-on-any-change). */
  private[graft] val VTabLayout = "vtab-v3:snap=mod10:batch=mod3:rev=mod6"

  /** q_table_version — the COMMITTED write path (reference:
    * db/ingest_cards.py:95-152 — the upsert lands in a durable store
    * a second session reads back; q_merge_upsert grades the merge
    * CLASSIFICATION, this row grades the merge LANDING): version 1
    * commits the base snapshot, version 2 commits the post-merge
    * snapshot (insert/update applied, carryover kept — the same
    * deterministic snap/batch derivation as q_merge_upsert), both
    * through [[graft.sources.VersionedTable]]'s atomic-manifest
    * protocol into a fingerprint-keyed build-once store (the
    * writeResIvfPqIndex discipline). The GRADED output is computed
    * entirely from the READ-BACK versions — per version: row count,
    * the manifest's own declared row count (metadata honesty),
    * an ORDER-INVARIANT content digest over the (doc_id, hash)
    * pairs, and the changed-key count of v2 vs v1 computed by
    * JOINING THE TWO READ-BACK versions (time travel exercised, not
    * simulated). The oracle recomputes every value from `documents`
    * directly, so a lossy commit, a manifest drift, or a broken
    * version resolve all surface as a hash mismatch.
    *
    * The digest is sum(hash60(doc_id || ':' || h)) on DECIMAL(38,0):
    * commutative + associative, so the aggregate is shard-mergeable
    * with O(1) state per task — the r11 formulation collect_list'd
    * the ENTIRE snapshot into one final-merge task's buffer (the
    * unbounded-buffer sibling of the global-window class), which is
    * a driver-OOM at 100 TB. A single changed pair moves the sum by
    * a ~60-bit hash delta, so corruption detection is retained;
    * 38 digits of headroom means no overflow before ~1e19 rows.
    *
    * Scale: commits write through the normal parquet path (file
    * count = input partitions); readers resolve the manifest —
    * never a directory listing — so snapshot isolation costs one
    * tiny file read; the diff join keys on the unique doc_id. */
  def tableVersion(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.VersionedTable
    val table = graft.IndexCache.ensure(
      graft.IndexCache.path("graft_vtab", dir, Seq("documents.parquet"),
        VTabLayout)) { out =>
      val docs = Tables.documents(s, dir)
      val snap = docs.where(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), md5(col("text")).as("h"))
      VersionedTable.commit(snap, out)
      val batch = docs.where(col("doc_id") % 3 === 0)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 6 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text"))).as("h_new"))
      val v2 = snap.withColumnRenamed("h", "h_old")
        .join(batch, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), coalesce(col("h_new"), col("h_old")).as("h"))
      VersionedTable.commit(v2, out)
    }
    def census(r: DataFrame) = r.agg(count(lit(1)).as("n_rows"),
      sum(graft.functions.MinHash.hash60(
        concat_ws(":", col("doc_id"), col("h")))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .cast("string").as("snapshot_digest"))
    val r1 = VersionedTable.read(s, table, Some(1))
    val r2 = VersionedTable.read(s, table, Some(2))
    val m1 = census(r1).select(lit(1L).as("version"), col("n_rows"),
      lit(VersionedTable.manifestRows(table, 1)).as("manifest_rows"),
      lit(-1L).as("n_changed"), col("snapshot_digest"))
    val chg = r2.select(col("doc_id"), col("h").as("h2"))
      .join(r1.select(col("doc_id"), col("h").as("h1")),
        Seq("doc_id"), "left")
      .agg(sum(when(col("h1").isNull || col("h1") =!= col("h2"), 1L)
        .otherwise(0L)).as("n_changed"))
    val m2 = census(r2).crossJoin(chg)
      .select(lit(2L).as("version"), col("n_rows"),
        lit(VersionedTable.manifestRows(table, 2)).as("manifest_rows"),
        col("n_changed"), col("snapshot_digest"))
    m1.unionByName(m2).orderBy(col("version").asc)
  }

  /** Layout fingerprint of the q_table_prune store. */
  private[graft] val VPruneLayout = "vprune-v1:files=8:stats=doc_id"

  /** q_table_prune — MANIFEST-LEVEL FILE SKIPPING, the data-skipping
    * half of the lakehouse write path q_table_version grades
    * (reference intent: db/init.sql's indexed lookups — the store is
    * organized so a keyed predicate touches a fraction of it): the
    * documents table is committed as ONE [[graft.sources
    * .VersionedTable]] version of 8 range-partitioned files whose
    * per-file (rows, min, max) doc_id stats land in the manifest at
    * commit time, and the graded read resolves a doc_id range
    * predicate (the middle quarter of the id space, bounds derived
    * from the manifest's own global stats at ZERO data reads) to
    * only the intersecting files before scanning. The census —
    * per-source counts, id extremes, char volume and an
    * order-invariant digest — is computed entirely from the PRUNED
    * read; the oracle recomputes it from `documents` with the same
    * predicate, so a file wrongly skipped (rows lost) or stats drift
    * (wrong bounds) surfaces as a hash mismatch. PruneSpec
    * additionally pins the I/O claim itself: the predicate keeps a
    * strict subset of files and pruned ≡ unpruned-filtered.
    *
    * Scale: this is THE mechanism that makes a keyed read of a
    * 100 TB table O(matching files) instead of O(table) — stats ride
    * the manifest (one tiny file), the planner never lists
    * directories or opens non-matching footers. */
  def tablePrune(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.VersionedTable
    val table = graft.IndexCache.ensure(
      graft.IndexCache.path("graft_vprune", dir,
        Seq("documents.parquet"), VPruneLayout)) { out =>
      VersionedTable.commit(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("lang"),
            col("n_chars"))
          .repartitionByRange(8, col("doc_id")),
        out, statsCol = Some("doc_id"))
    }
    val (_, mx) = VersionedTable.statsRange(table, 1)
    val pruned = VersionedTable.readWhere(s, table, "doc_id",
      mx / 4, mx / 2, Some(1))
    pruned.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        sum(graft.functions.MinHash.hash60(
          concat_ws(":", col("doc_id"), col("lang")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("string").as("digest"))
      .orderBy(col("source").asc)
  }

  /** q_table_mview — INCREMENTAL MATERIALIZED VIEW maintained from
    * the change feed (the reason [[graft.sources.VersionedTable
    * .readChanges]] exists; reference intent: the reference's
    * per-source statistics views are recomputed per run —
    * query_example.py's "database statistics" — where a deployment
    * maintains them): the per-source census (row count + mergeable
    * content digest) is computed ONCE over the base version, then
    * advanced version-by-version by folding ONLY each append's
    * change set — counts and the order-invariant sum-digest are
    * ADDITIVE, so refresh cost is O(batch) per version while the
    * graded result is provably the full recompute (the oracle IS
    * the full recompute over all three id classes; any drift
    * between "base + Σ deltas" and "recompute" breaks the hash).
    * Reuses the q_table_cdf store (v1 base + two appends).
    *
    * Scale: this is the materialized-view maintenance rhythm at
    * 100 TB — the standing aggregate is never recomputed from the
    * table; each micro-batch folds its own delta in, exactly the
    * shard-mergeable-digest contract q_table_version introduced. */
  def tableMview(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.VersionedTable
    val table = graft.IndexCache.ensure(
      graft.IndexCache.path("graft_vcdf", dir,
        Seq("documents.parquet"), VCdfLayout)) { out =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("lang"))
      VersionedTable.commit(docs.where(col("doc_id") % 4 === 1), out)
      VersionedTable.commitAppend(docs.where(col("doc_id") % 4 === 2), out)
      VersionedTable.commitAppend(docs.where(col("doc_id") % 4 === 3), out)
    }
    def census(r: DataFrame) = r.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.MinHash.hash60(
          concat_ws(":", col("doc_id"), col("lang")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .as("dig"))
    // Base view at v1, then one O(batch) fold per committed version.
    val base = census(VersionedTable.read(s, table, Some(1)))
    val deltas = (2 to VersionedTable.latestVersion(table).get).map(v =>
      census(VersionedTable.readChanges(s, table, v - 1, Some(v))))
    deltas.foldLeft(base)(_ unionByName _)
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("dig")).cast(
          org.apache.spark.sql.types.DecimalType(38, 0))
          .cast("string").as("digest"))
      .orderBy(col("source").asc)
  }

  /** Layout fingerprint of the q_table_delete store. */
  private[graft] val VDeleteLayout = "vdel-v1:files=8:stats=doc_id:mid-quarter"

  /** q_table_delete — COPY-ON-WRITE RANGE DELETE with manifest-stats
    * file pruning, the mutation half of the lakehouse contract
    * (q_table_prune is the read half; reference intent: the
    * reference deletes and re-ingests cards by id — a durable store
    * must purge a key range without rewriting itself): the documents
    * table is committed as 8 range-partitioned files with per-file
    * doc_id stats, then [[graft.sources.VersionedTable.deleteWhere]]
    * removes the middle quarter of the id space (bounds derived from
    * the manifest's own global stats at zero data reads) — REWRITING
    * ONLY the files whose [min, max] intersects the range; every
    * disjoint file is carried forward by reference, byte-identical,
    * never opened (VersionedTableSpec pins path identity, the
    * rewritten-file count, time travel to the pre-delete version,
    * and NULL-keep semantics). The graded census reads the
    * post-delete LATEST; the oracle recomputes it from `documents`
    * with the complementary predicate, so a row wrongly kept (delete
    * missed), wrongly dropped (over-delete), or a stale carried file
    * all break the hash.
    *
    * Scale: a targeted purge of one id range on a 100 TB table
    * rewrites the handful of files that hold it — O(matching files),
    * the Delta/Iceberg copy-on-write DELETE, pruned from the
    * manifest alone. */
  def tableDelete(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.VersionedTable
    val table = graft.IndexCache.ensure(
      graft.IndexCache.path("graft_vdelete", dir,
        Seq("documents.parquet"), VDeleteLayout)) { out =>
      VersionedTable.commit(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("lang"),
            col("n_chars"))
          .repartitionByRange(8, col("doc_id")),
        out, statsCol = Some("doc_id"))
      val (_, mx) = VersionedTable.statsRange(out, 1)
      VersionedTable.deleteWhere(s, out, "doc_id", mx / 4, mx / 2)
      ()
    }
    VersionedTable.read(s, table)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        sum(graft.functions.MinHash.hash60(
          concat_ws(":", col("doc_id"), col("lang")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("string").as("digest"))
      .orderBy(col("source").asc)
  }

  /** Layout fingerprint of the q_table_evolve store. */
  private[graft] val VEvolveLayout = "vevolve-v1:snap=mod3eq1:add=lang"

  /** q_table_evolve — ADD-ONLY SCHEMA EVOLUTION under the commit
    * protocol (reference intent: cardsCleaning's schema grew fields
    * release over release; a durable store must absorb that without
    * rewriting history): v1 commits (doc_id, source) for one id
    * class, v2 APPENDS (doc_id, source, lang) for another with
    * `evolveSchema = true` — the manifest's authoritative schema
    * advances, and the graded read of the LATEST version returns
    * the v1 rows with NULL lang (name-based parquet resolution
    * against the manifest schema; no footer merge, no history
    * rewrite). The census buckets every row by
    * coalesce(lang,'‹pre›') per source with an order-invariant
    * digest, so a reader that drops pre-evolution rows, resurrects
    * the old schema, or mis-nulls the new column breaks the hash.
    * VersionedTableSpec pins the refusal arms (drifted schema
    * without the flag; dropped / re-typed / non-nullable columns)
    * and compaction to the union schema. */
  def tableEvolve(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.VersionedTable
    val table = graft.IndexCache.ensure(
      graft.IndexCache.path("graft_vevolve", dir,
        Seq("documents.parquet"), VEvolveLayout)) { out =>
      val docs = Tables.documents(s, dir)
      VersionedTable.commit(
        docs.where(col("doc_id") % 3 === 1)
          .select(col("doc_id"), col("source")), out)
      VersionedTable.commitAppend(
        docs.where(col("doc_id") % 3 === 2)
          .select(col("doc_id"), col("source"), col("lang")), out,
        evolveSchema = true)
    }
    VersionedTable.read(s, table)
      .groupBy(col("source"),
        coalesce(col("lang"), lit("<pre>")).as("lang_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.MinHash.hash60(
          concat_ws(":", col("doc_id"), coalesce(col("lang"), lit(""))))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("string").as("digest"))
      .orderBy(col("source").asc, col("lang_bucket").asc)
  }

  /** Layout fingerprint of the q_table_cdf store. */
  private[graft] val VCdfLayout = "vcdf-v1:snap=mod4eq1:app=mod4eq2,mod4eq3"

  /** q_table_cdf — CHANGE-DATA-FEED read under the commit protocol
    * (reference intent: db/ingest_cards.py re-embeds only what a new
    * ingest landed, not the standing corpus — the incremental-
    * consumer rhythm): v1 commits a base snapshot of the documents
    * table for one id class, v2 and v3 each APPEND another class,
    * and the graded read is [[graft.sources.VersionedTable
    * .readChanges]] from v1 — the rows the two appends introduced,
    * resolved from the MANIFESTS' OWN FILE LINES (O(changed data)
    * I/O; the standing v1 files are never opened — pinned by
    * VersionedTableSpec via `inputFiles` disjointness, along with
    * the fallback arm: a compaction in the window degrades to the
    * exact `exceptAll` bag diff, same rows). The census buckets the
    * change set per source with an order-invariant digest; the
    * oracle recomputes it from `documents` with the same id-class
    * predicates, so a change set that leaks standing rows, drops a
    * batch, or double-reads one breaks the hash.
    *
    * Scale: this is the contract that keeps a 100 TB table's
    * downstream consumers O(micro-batch) — embed/index/dedup jobs
    * chain off readChanges(lastProcessed) and never rescan the
    * table. */
  def tableCdf(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.VersionedTable
    val table = graft.IndexCache.ensure(
      graft.IndexCache.path("graft_vcdf", dir,
        Seq("documents.parquet"), VCdfLayout)) { out =>
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("lang"))
      VersionedTable.commit(docs.where(col("doc_id") % 4 === 1), out)
      VersionedTable.commitAppend(docs.where(col("doc_id") % 4 === 2), out)
      VersionedTable.commitAppend(docs.where(col("doc_id") % 4 === 3), out)
    }
    VersionedTable.readChanges(s, table, fromV = 1)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(graft.functions.MinHash.hash60(
          concat_ws(":", col("doc_id"), col("lang")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("string").as("digest"))
      .orderBy(col("source").asc)
  }

  /** The INGESTION CAPSTONE — the reference's master flow
    * (db/ingest_all.py runs glossary → rules → cards, each script
    * cleaning, constructing embedding text, deduping by content id,
    * and upserting) composed as ONE relational pass, the ingest-side
    * twin of q_pipeline: content-id dedup winners → embedding-text
    * construction over the winners → keyed upsert classification vs
    * the standing snapshot → the per-source ingest report every run
    * ends with (raw vs canonical counts, insert/update/unchanged
    * split, embed-text volume). Snapshot/revision derive
    * deterministically exactly as in [[mergeUpsert]] (snapshot =
    * winner ids not divisible by 10; revised text for ids divisible
    * by 6) so the oracle replicates them.
    *
    * Scale: the dedup agg keys on uniform md5 (map-side combine);
    * the winner→fields join keys on the unique doc_id; the canonical
    * relation is then materialized (Checkpoints.cut) so the
    * snapshot/batch classification derives from it without re-running
    * the scan+dedup lineage per side; final rollup is a bounded
    * source-key agg.
    * Every stage is a separately-graded operator (q_ingest_dedup,
    * q_embed_text, q_merge_upsert, q_doc_stats) composing through
    * Catalyst. */
  def ingestAll(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val winners = docs
      .select(md5(normText(col("text"))).as("content_id"), col("doc_id"))
      .groupBy(col("content_id"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
    // Materialized (lineage cut): snap and inc below both derive from
    // canon — without the cut each side re-ran the whole
    // scan+dedup+join lineage (measured with broadcasts off: 4 corpus
    // scans / 7 exchanges; with the cut the scan+dedup+join runs ONCE
    // and the downstream plan is 3 exchanges over the cached canon
    // blocks).
    val canon = winners.join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_copies"),
        concat_ws(" | ", docName(col("text")), col("lang"),
          substring(normText(col("text")), 1, 120)).as("embed_text"))
      .transform(graft.Checkpoints.cut)
    val snap = canon.where(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), md5(col("embed_text")).as("h_old"))
    val inc = canon.select(col("doc_id"), col("source"), col("n_copies"),
      length(col("embed_text")).as("el"),
      md5(concat(col("embed_text"),
        when(col("doc_id") % 6 === 0, lit(" v2")).otherwise(lit(""))))
        .as("h_new"))
    inc.join(snap, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_canon"),
        sum(col("n_copies")).as("n_raw"),
        sum(when(col("h_old").isNull, 1L).otherwise(0L)).as("n_insert"),
        sum(when(col("h_old").isNotNull && col("h_old") =!= col("h_new"),
          1L).otherwise(0L)).as("n_update"),
        sum(when(col("h_old") === col("h_new"), 1L).otherwise(0L))
          .as("n_unchanged"),
        sum(col("el")).as("embed_chars"))
      .orderBy(col("source").asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_text" -> ((s, d) => embedText(s, d)),
    "q_embed_batch" -> ((s, d) => embedBatch(s, d)),
    "q_ingest_dedup" -> ((s, d) => ingestDedup(s, d)),
    "q_doc_stats" -> ((s, d) => docStats(s, d)),
    "q_source_stats" -> ((s, d) => sourceStats(s, d)),
    "q_json_clean" -> ((s, d) => jsonClean(s, d)),
    "q_json_filter" -> ((s, d) => jsonFilter(s, d)),
    "q_forget" -> ((s, d) => forget(s, d)),
    "q_merge_upsert" -> ((s, d) => mergeUpsert(s, d)),
    "q_table_version" -> ((s, d) => tableVersion(s, d)),
    "q_table_prune" -> ((s, d) => tablePrune(s, d)),
    "q_table_evolve" -> ((s, d) => tableEvolve(s, d)),
    "q_table_cdf" -> ((s, d) => tableCdf(s, d)),
    "q_table_delete" -> ((s, d) => tableDelete(s, d)),
    "q_table_mview" -> ((s, d) => tableMview(s, d)),
    "q_ingest_all" -> ((s, d) => ingestAll(s, d)),
  )

  private val normSql =
    """trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      | ' +', ' ', 'g'))""".stripMargin.replace("\n", "")

  val oracles: Map[String, String] = Map(
    "q_embed_text" ->
      s"""WITH e AS (
         |  SELECT doc_id,
         |         lower(substr(text, 1, 24)) || ' | ' || lang || ' | ' ||
         |           substr($normSql, 1, 120) AS embed_text
         |  FROM documents)
         |SELECT doc_id, embed_text, len(embed_text) AS embed_len
         |FROM e ORDER BY doc_id ASC""".stripMargin,
    "q_ingest_dedup" ->
      s"""SELECT md5($normSql) AS content_id,
         |       min(doc_id) AS canonical_doc,
         |       count(*) AS n_copies
         |FROM documents GROUP BY content_id
         |ORDER BY content_id ASC""".stripMargin,
    "q_embed_batch" -> {
      def h(e: String) = graft.functions.MinHash.hash60Sql(e)
      val perm = s"${h("'embp:' || CAST(doc_id AS VARCHAR)")} % $EmbedPermMod = 0"
      def trans(a: Int) =
        s"${h(s"'embt:' || CAST(doc_id AS VARCHAR) || ':$a'")} % $EmbedTransMod = 0"
      s"""WITH e AS (
         |  SELECT doc_id,
         |         lower(substr(text, 1, 24)) || ' | ' || lang || ' | ' ||
         |           substr($normSql, 1, 120) AS embed_text,
         |         ($perm) OR (${trans(1)}) AS f1,
         |         ($perm) OR (${trans(2)}) AS f2,
         |         ($perm) OR (${trans(3)}) AS f3
         |  FROM documents)
         |SELECT doc_id, doc_id // 10 AS batch_id,
         |       CAST(CASE WHEN NOT f1 THEN 1 WHEN NOT f2 THEN 2
         |                 ELSE $EmbedAttempts END AS BIGINT) AS attempts,
         |       CASE WHEN NOT f1 OR NOT f2 OR NOT f3 THEN 'ok'
         |            ELSE 'error' END AS status,
         |       CAST(CASE WHEN NOT f1 OR NOT f2 OR NOT f3
         |                 THEN len(embed_text) ELSE 0 END AS BIGINT)
         |         AS embed_len
         |FROM e ORDER BY doc_id ASC""".stripMargin
    },
    "q_table_version" -> {
      val dig = graft.functions.MinHash.hash60Sql(
        "CAST(doc_id AS VARCHAR) || ':' || h")
      s"""WITH snap AS (
        |  SELECT doc_id, md5(text) AS h FROM documents
        |  WHERE doc_id % 10 <> 0),
        |batch AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 6 = 0 THEN text || ' v2'
        |                  ELSE text END) AS h_new
        |  FROM documents WHERE doc_id % 3 = 0),
        |v2 AS (
        |  SELECT coalesce(s.doc_id, b.doc_id) AS doc_id,
        |         coalesce(b.h_new, s.h) AS h
        |  FROM snap s FULL OUTER JOIN batch b ON s.doc_id = b.doc_id),
        |m1 AS (SELECT count(*) AS n,
        |         CAST(sum(CAST($dig AS DECIMAL(38,0))) AS VARCHAR) AS md
        |       FROM snap),
        |m2 AS (SELECT count(*) AS n,
        |         CAST(sum(CAST($dig AS DECIMAL(38,0))) AS VARCHAR) AS md
        |       FROM v2),
        |chg AS (SELECT CAST(sum(CASE WHEN s.h IS NULL OR s.h <> v.h
        |                   THEN 1 ELSE 0 END) AS BIGINT) AS c
        |        FROM v2 v LEFT JOIN snap s ON v.doc_id = s.doc_id)
        |SELECT CAST(1 AS BIGINT) AS version, n AS n_rows,
        |       n AS manifest_rows, CAST(-1 AS BIGINT) AS n_changed,
        |       md AS snapshot_digest
        |FROM m1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), n, n, c, md FROM m2, chg
        |ORDER BY version ASC""".stripMargin
    },
    "q_table_evolve" -> {
      val dig = graft.functions.MinHash.hash60Sql(
        "CAST(doc_id AS VARCHAR) || ':' || coalesce(lang, '')")
      s"""WITH t AS (
         |  SELECT doc_id, source, CAST(NULL AS VARCHAR) AS lang
         |  FROM documents WHERE doc_id % 3 = 1
         |  UNION ALL
         |  SELECT doc_id, source, lang
         |  FROM documents WHERE doc_id % 3 = 2)
         |SELECT source, coalesce(lang, '<pre>') AS lang_bucket,
         |       count(*) AS n_docs,
         |       CAST(sum(CAST($dig AS DECIMAL(38,0))) AS VARCHAR)
         |         AS digest
         |FROM t GROUP BY source, lang_bucket
         |ORDER BY source ASC, lang_bucket ASC""".stripMargin
    },
    "q_table_cdf" -> {
      val dig = graft.functions.MinHash.hash60Sql(
        "CAST(doc_id AS VARCHAR) || ':' || lang")
      s"""SELECT source, count(*) AS n_docs,
         |       min(doc_id) AS min_id, max(doc_id) AS max_id,
         |       CAST(sum(CAST($dig AS DECIMAL(38,0))) AS VARCHAR)
         |         AS digest
         |FROM documents
         |WHERE doc_id % 4 = 2 OR doc_id % 4 = 3
         |GROUP BY source ORDER BY source ASC""".stripMargin
    },
    "q_table_mview" -> {
      val dig = graft.functions.MinHash.hash60Sql(
        "CAST(doc_id AS VARCHAR) || ':' || lang")
      s"""SELECT source, count(*) AS n_docs,
         |       CAST(sum(CAST($dig AS DECIMAL(38,0))) AS VARCHAR)
         |         AS digest
         |FROM documents
         |WHERE doc_id % 4 IN (1, 2, 3)
         |GROUP BY source ORDER BY source ASC""".stripMargin
    },
    "q_table_delete" -> {
      val dig = graft.functions.MinHash.hash60Sql(
        "CAST(doc_id AS VARCHAR) || ':' || lang")
      s"""WITH b AS (SELECT max(doc_id) // 4 AS lo,
         |                  max(doc_id) // 2 AS hi FROM documents)
         |SELECT source, count(*) AS n_docs,
         |       min(doc_id) AS min_id, max(doc_id) AS max_id,
         |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |       CAST(sum(CAST($dig AS DECIMAL(38,0))) AS VARCHAR)
         |         AS digest
         |FROM documents, b
         |WHERE doc_id < lo OR doc_id > hi
         |GROUP BY source ORDER BY source ASC""".stripMargin
    },
    "q_table_prune" -> {
      val dig = graft.functions.MinHash.hash60Sql(
        "CAST(doc_id AS VARCHAR) || ':' || lang")
      s"""WITH b AS (SELECT max(doc_id) // 4 AS lo,
         |                  max(doc_id) // 2 AS hi FROM documents)
         |SELECT source, count(*) AS n_docs,
         |       min(doc_id) AS min_id, max(doc_id) AS max_id,
         |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |       CAST(sum(CAST($dig AS DECIMAL(38,0))) AS VARCHAR)
         |         AS digest
         |FROM documents, b
         |WHERE doc_id >= lo AND doc_id <= hi
         |GROUP BY source ORDER BY source ASC""".stripMargin
    },
    "q_merge_upsert" ->
      """WITH snap AS (
        |  SELECT doc_id, md5(text) AS h_old FROM documents
        |  WHERE doc_id % 10 <> 0),
        |batch AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 6 = 0 THEN text || ' v2'
        |                  ELSE text END) AS h_new
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT coalesce(s.doc_id, b.doc_id) AS doc_id,
        |       CASE WHEN s.doc_id IS NULL THEN 'insert'
        |            WHEN b.doc_id IS NULL THEN 'carryover'
        |            WHEN s.h_old <> b.h_new THEN 'update'
        |            ELSE 'unchanged' END AS action,
        |       coalesce(b.h_new, s.h_old) AS content_hash
        |FROM snap s FULL OUTER JOIN batch b ON s.doc_id = b.doc_id
        |ORDER BY doc_id ASC""".stripMargin,
    "q_ingest_all" ->
      s"""WITH c0 AS (
         |  SELECT md5($normSql) AS content_id, min(doc_id) AS doc_id,
         |         count(*) AS n_copies
         |  FROM documents GROUP BY content_id),
         |w AS (
         |  SELECT c0.doc_id, c0.n_copies, d.source,
         |         lower(substr(d.text, 1, 24)) || ' | ' || d.lang || ' | ' ||
         |           substr($normSql, 1, 120) AS embed_text
         |  FROM c0 JOIN documents d ON c0.doc_id = d.doc_id),
         |snap AS (SELECT doc_id, md5(embed_text) AS h_old
         |         FROM w WHERE doc_id % 10 <> 0),
         |inc AS (SELECT doc_id, source, n_copies,
         |               len(embed_text) AS el,
         |               md5(embed_text ||
         |                   CASE WHEN doc_id % 6 = 0 THEN ' v2' ELSE '' END)
         |                 AS h_new
         |        FROM w)
         |SELECT source, count(*) AS n_canon,
         |       CAST(sum(n_copies) AS BIGINT) AS n_raw,
         |       CAST(sum(CASE WHEN s.h_old IS NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_insert,
         |       CAST(sum(CASE WHEN s.h_old IS NOT NULL
         |                      AND s.h_old <> i.h_new THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_update,
         |       CAST(sum(CASE WHEN s.h_old = i.h_new THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_unchanged,
         |       CAST(sum(el) AS BIGINT) AS embed_chars
         |FROM inc i LEFT JOIN snap s ON i.doc_id = s.doc_id
         |GROUP BY source ORDER BY source ASC""".stripMargin,
    "q_doc_stats" ->
      """SELECT source, count(*) AS n_docs,
        |       count(DISTINCT lang) AS n_langs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       min(n_chars) AS min_chars,
        |       max(n_chars) AS max_chars,
        |       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
        |FROM documents GROUP BY source ORDER BY source ASC""".stripMargin,
    "q_source_stats" ->
      """SELECT d.source, count(*) AS n_docs,
        |       count(e.vec_id) AS n_embedded,
        |       count(*) - count(e.vec_id) AS n_missing
        |FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY d.source ORDER BY d.source ASC""".stripMargin,
    "q_json_clean" ->
      """WITH j AS (
        |  SELECT p_brand, p_name,
        |         json_merge_patch(
        |           to_json(struct_pack(p_partkey := p_partkey,
        |                               p_name := p_name, p_brand := p_brand,
        |                               p_type := p_type, p_size := p_size,
        |                               p_retailprice := p_retailprice)),
        |           '{"p_retailprice":null,"p_type":null}') AS cleaned
        |  FROM part)
        |SELECT p_brand, count(*) AS n,
        |       CAST(sum(len(json_keys(cleaned))) AS BIGINT) AS kept_keys,
        |       CAST(sum(CASE WHEN json_extract(cleaned, '$.p_retailprice')
        |                     IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS leaked,
        |       CAST(sum(CAST(json_extract_string(cleaned, '$.p_size')
        |                     AS BIGINT)) AS BIGINT) AS sum_size,
        |       CAST(sum(CASE WHEN json_extract_string(cleaned, '$.p_name')
        |                     = p_name THEN 1 ELSE 0 END) AS BIGINT)
        |         AS names_intact
        |FROM j GROUP BY p_brand ORDER BY p_brand ASC""".stripMargin,
    "q_json_filter" ->
      """WITH j AS (
        |  SELECT to_json(struct_pack(id := p_partkey, name := p_name,
        |                             brand := p_brand, type := p_type,
        |                             size := p_size,
        |                             tags := str_split(p_name, ' ')))
        |           AS card_data
        |  FROM part)
        |SELECT CAST(json_extract_string(card_data, '$.id') AS BIGINT)
        |         AS part_id,
        |       json_extract_string(card_data, '$.brand') AS brand,
        |       CAST(json_extract_string(card_data, '$.size') AS INT)
        |         AS size,
        |       json_extract_string(card_data, '$.name') AS name
        |FROM j
        |WHERE json_extract_string(card_data, '$.type') = 'ECONOMY'
        |  AND CAST(json_extract_string(card_data, '$.size') AS INT) <= 25
        |  AND list_contains(CAST(json_extract(card_data, '$.tags')
        |                         AS VARCHAR[]), 'red')
        |ORDER BY part_id ASC""".stripMargin,
    "q_forget" -> {
      val h = graft.functions.MinHash.hash60Sql("'del:' || doc_id")
      s"""WITH req AS (SELECT doc_id FROM documents WHERE $h % $ForgetMod = 0),
         |k AS (SELECT source, count(*) AS n_kept,
         |             CAST(sum(n_chars) AS BIGINT) AS chars_kept
         |      FROM documents
         |      WHERE doc_id NOT IN (SELECT doc_id FROM req)
         |      GROUP BY source),
         |g AS (SELECT source, count(*) AS n_forgotten,
         |             CAST(sum(n_chars) AS BIGINT) AS chars_forgotten,
         |             CAST(sum(CAST(${graft.functions.MinHash.hash60Sql(
                         "CAST(doc_id AS VARCHAR)")}
         |               AS DECIMAL(38,0))) AS VARCHAR) AS manifest_digest
         |      FROM documents
         |      WHERE doc_id IN (SELECT doc_id FROM req)
         |      GROUP BY source)
         |SELECT coalesce(k.source, g.source) AS source,
         |       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
         |       CAST(coalesce(k.chars_kept, 0) AS BIGINT) AS chars_kept,
         |       CAST(coalesce(g.n_forgotten, 0) AS BIGINT) AS n_forgotten,
         |       CAST(coalesce(g.chars_forgotten, 0) AS BIGINT)
         |         AS chars_forgotten,
         |       coalesce(g.manifest_digest, '') AS manifest_digest
         |FROM k FULL OUTER JOIN g ON k.source = g.source
         |ORDER BY source ASC""".stripMargin
    },
  )
}

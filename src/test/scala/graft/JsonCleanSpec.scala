package graft

import org.apache.spark.sql.functions._

import graft.operators.Ingest
import graft.plans.JsonStripKeys

/** The cardsCleaning tier (reference: cardsCleaning/cleanCardJson.py)
  * and the ingest coverage audit (query_example.py:142-171). */
class JsonCleanSpec extends SparkSuite {
  import spark.implicits._

  test("json_strip_keys removes denylist keys, keeps order and values") {
    val in = """{"a":1,"edhrecRank":5,"b":"x y","purchaseUrls":{"u":"z"},"c":[1,2]}"""
    val out = Seq(in).toDF("js")
      .select(JsonStripKeys(col("js"),
        Seq("edhrecRank", "purchaseUrls")).as("c"))
      .as[String].head()
    assert(out === """{"a":1,"b":"x y","c":[1,2]}""")
  }

  test("json_strip_keys: missing keys no-op, non-object passthrough, malformed null") {
    val df = Seq(
      ("""{"a":1}""", "miss"),
      ("""[1,2,3]""", "arr"),
      ("""{"a": oops""", "bad")).toDF("js", "tag")
      .select(col("tag"), JsonStripKeys(col("js"), Seq("zzz")).as("c"))
      .as[(String, String)].collect().toMap
    assert(df("miss") === """{"a":1}""")
    assert(df("arr") === """[1,2,3]""")
    assert(df("bad") === null)
  }

  test("json_strip_keys matches interpreted eval (codegen parity)") {
    val docs = Tables.documents(spark, sfDir)
      .select(to_json(struct(col("doc_id"), col("lang"), col("source"),
        col("n_chars"))).as("js"))
    def run() = docs
      .select(JsonStripKeys(col("js"), Seq("source", "n_chars")).as("c"))
      .as[String].collect().toSeq
    val gen = run()
    val interp = withCodegenOff(run())
    assert(gen === interp)
    assert(gen.head.contains("doc_id") && !gen.head.contains("n_chars"))
  }

  test("json_strip_keys is SQL-exposed via GraftExtensions") {
    val r = spark.sql(
      """SELECT json_strip_keys('{"k":1,"drop":2}', 'drop') AS c""")
      .as[String].head()
    assert(r === """{"k":1}""")
  }

  test("q_json_clean: zero denylist leaks, every kept field intact") {
    val rows = Ingest.jsonClean(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("leaked") === 0L)
      // 4 surviving keys per doc (6 built - 2 denylisted).
      assert(r.getAs[Long]("kept_keys") === 4 * n)
      assert(r.getAs[Long]("names_intact") === n)
    }
  }

  test("q_json_filter: JSON-path containment ≡ direct column predicate") {
    // The schema-free read path must select exactly the rows the
    // typed columns would (oracle-independent: the oracle proves
    // cross-engine equality, this proves the JSON detour is lossless
    // against the source of truth).
    val viaJson = Ingest.jsonFilter(spark, sfDir)
      .select(col("part_id")).as[Long].collect().toSet
    val direct = Tables.part(spark, sfDir)
      .where(col("p_type") === "ECONOMY" && col("p_size") <= 25 &&
        array_contains(split(col("p_name"), " "), "red"))
      .select(col("p_partkey")).as[Long].collect().toSet
    assert(viaJson === direct)
    assert(viaJson.nonEmpty)
  }

  test("q_forget: erasure is total, disjoint, and receipt-reproducible") {
    val rows = Ingest.forget(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // Kept + forgotten partitions the corpus exactly, docs and chars.
    val docs = Tables.documents(spark, sfDir)
    assert(rows.map(r => r.getAs[Long]("n_kept") +
      r.getAs[Long]("n_forgotten")).sum === docs.count())
    val totalChars = docs.agg(sum(col("n_chars"))).as[Long].head()
    assert(rows.map(r => r.getAs[Long]("chars_kept") +
      r.getAs[Long]("chars_forgotten")).sum === totalChars)
    assert(rows.exists(_.getAs[Long]("n_forgotten") > 0))
    // The deletion receipt must be bit-reproducible — a compliance
    // rerun has to produce the same manifest.
    val again = Ingest.forget(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("manifest_digest")).toSeq ===
      again.map(_.getAs[String]("manifest_digest")).toSeq)
  }

  test("q_source_stats: coverage counts are consistent") {
    val rows = Ingest.sourceStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === totalDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_embedded") + r.getAs[Long]("n_missing")
        === r.getAs[Long]("n_docs"))
    }
  }

  test("q_ingest_all: the composed report is conservation-consistent " +
    "with its stage operators") {
    val rows = Ingest.ingestAll(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // Raw volume: every source doc is attributed to exactly one
    // canonical winner.
    assert(rows.map(_.getAs[Long]("n_raw")).sum ===
      Tables.documents(spark, sfDir).count())
    // Canonical volume: matches the standalone ingest-dedup stage.
    assert(rows.map(_.getAs[Long]("n_canon")).sum ===
      Ingest.ingestDedup(spark, sfDir).count())
    rows.foreach { r =>
      // The upsert classification partitions the canon set.
      assert(r.getAs[Long]("n_insert") + r.getAs[Long]("n_update") +
        r.getAs[Long]("n_unchanged") === r.getAs[Long]("n_canon"))
      assert(r.getAs[Long]("embed_chars") > 0L)
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{CsvDocs, JsonDocs, OrcDocs}

class SourcesSpec extends SparkSuite {

  test("JSONL round-trip preserves the document corpus") {
    val out = Files.createTempDirectory("graft_jsonl").toString + "/docs"
    try {
      val orig = Tables.documents(spark, sfDir)
      JsonDocs.writeDocuments(orig, out)
      val back = JsonDocs.readDocuments(spark, out)
      assert(back.count() === orig.count())
      // The corpus is already clean (single-space, lowercase lang),
      // so cleaning is identity here and the round-trip is exact.
      val a = orig.orderBy(col("doc_id")).collect().toSeq
      val b = back.orderBy(col("doc_id")).collect().toSeq
      assert(a === b)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out).getParentFile).deleteRecursively()
    }
  }

  test("CSV round-trip preserves the corpus incl. quoted delimiters") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_csv").toString + "/docs"
    try {
      val orig = Tables.documents(spark, sfDir)
      CsvDocs.writeDocuments(orig, out)
      val back = CsvDocs.readDocuments(spark, out)
      val a = orig.orderBy(col("doc_id")).collect().toSeq
      val b = back.orderBy(col("doc_id")).collect().toSeq
      assert(a === b)

      // Adversarial delimiters: commas and quotes inside text survive.
      val tricky = Seq((99000L, "a, \"quoted\" value, with commas", "en",
        "src0", 30L)).toDF("doc_id", "text", "lang", "source", "n_chars")
      CsvDocs.writeDocuments(tricky, out)
      val row = CsvDocs.readDocuments(spark, out).head()
      assert(row.getString(1) === "a, \"quoted\" value, with commas")

      // Embedded newlines (LF and CRLF): the sink's control-separator
      // translation keeps files splittable AND round-trips the
      // newlines losslessly through the line-based reader.
      val nl = Seq(
        (99001L, "line one\nline two\nline three", "en", "src0", 28L),
        (99002L, "crlf\r\nstyle, \"quoted\"\r\ntail", "en", "src0", 27L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      CsvDocs.writeDocuments(nl, out)
      val backNl = CsvDocs.readDocuments(spark, out)
        .orderBy(col("doc_id")).collect()
      assert(backNl.length === 2)
      assert(backNl(0).getString(1) === "line one\nline two\nline three")
      assert(backNl(1).getString(1) === "crlf\r\nstyle, \"quoted\"\r\ntail")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out).getParentFile).deleteRecursively()
    }
  }

  test("ORC round-trip preserves the corpus with pushdown-capable files") {
    val out = Files.createTempDirectory("graft_orc").toString + "/docs"
    try {
      val orig = Tables.documents(spark, sfDir)
      OrcDocs.writeDocuments(orig, out)
      val back = OrcDocs.readDocuments(spark, out)
      assert(back.orderBy(col("doc_id")).collect().toSeq ===
        orig.orderBy(col("doc_id")).collect().toSeq)
      // Columnar contract: a filtered two-column projection reaches
      // the ORC scan with a pushed filter.
      val q = spark.read.orc(out).where(col("doc_id") === 3)
        .select(col("doc_id"), col("source"))
      val plan = q.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
        s"expected ORC pushdown:\n$plan")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out).getParentFile).deleteRecursively()
    }
  }

  test("readDocuments drops null-id / empty-text records and normalizes") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_jsonl2").toString + "/docs"
    try {
      Seq(
        """{"doc_id": 1, "text": "  a   b  ", "lang": "EN", "source": "s", "n_chars": 9}""",
        """{"doc_id": null, "text": "x", "lang": "en", "source": "s", "n_chars": 1}""",
        """{"doc_id": 2, "text": "", "lang": "en", "source": "s", "n_chars": 0}""",
      ).toDF("value").coalesce(1).write.mode("overwrite").text(out)
      val rows = JsonDocs.readDocuments(spark, out).collect()
      assert(rows.length === 1)
      assert(rows(0).getLong(0) === 1L)
      assert(rows(0).getString(1) === "a b") // trimmed + collapsed
      assert(rows(0).getString(2) === "en") // lowercased
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(out).getParentFile).deleteRecursively()
    }
  }

  test("registerAll enables the pure-SQL surface over the schema") {
    Tables.registerAll(spark, sfDir)
    val n = spark.sql(
      """SELECT count(*) FROM documents d
        |JOIN embeddings e ON d.doc_id = e.vec_id""".stripMargin)
      .head().getLong(0)
    assert(n > 0)
    // Injected function + registered view together:
    val top = spark.sql(
      """SELECT e.vec_id,
        |       cosine_sim(e.embedding,
        |                  (SELECT embedding FROM embeddings WHERE vec_id = 0))
        |         AS sim
        |FROM embeddings e WHERE e.vec_id <> 0
        |ORDER BY sim DESC, vec_id ASC LIMIT 5""".stripMargin).collect()
    assert(top.length === 5)
    assert(top.forall(r => r.getDouble(1) <= 1.000001))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.functions.Lsh

/** The SQL surface injected by GraftExtensions must resolve and agree
  * with the Column-facing constructors. */
class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("cosine_sim resolves in SQL and matches the Column API") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d, 3.0d), array(3.0d, 2.0d, 1.0d))")
      .head().getDouble(0)
    val c = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)))
      .toDF("a", "b")
      .select(graft.functions.VectorFunctions.cosineSim(col("a"), col("b")))
      .head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(r) ===
      java.lang.Double.doubleToLongBits(c))
  }

  test("top_k_by_score usable as a SQL aggregate") {
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_ext")
    val rows = spark.sql(
      """SELECT label, top_k_by_score(CAST(vec_id AS DOUBLE), vec_id, 2) AS tk
        |FROM emb_ext GROUP BY label""".stripMargin)
      .selectExpr("label", "tk[0].id AS top1")
      .collect()
    assert(rows.nonEmpty)
    // top-by-score with score = vec_id → top1 is the max vec_id per label
    val expect = Tables.embeddings(spark, sfDir)
      .groupBy(col("label")).agg(max(col("vec_id")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) === expect(r.getInt(0))))
  }

  test("trigram_sim resolves in SQL and matches the Column API") {
    val r = spark.sql("SELECT trigram_sim('lightning bolt', 'lightning balt')")
      .head().getDouble(0)
    val c = Seq(("lightning bolt", "lightning balt")).toDF("a", "b")
      .select(graft.functions.TextFunctions.trigramSim(col("a"), col("b")))
      .head().getDouble(0)
    assert(java.lang.Double.doubleToLongBits(r) ===
      java.lang.Double.doubleToLongBits(c))
  }

  test("word_shingles resolves in SQL and matches the Column API") {
    val r = spark.sql("SELECT word_shingles('one two three two one', 3)")
      .head().getSeq[String](0)
    val c = Seq("one two three two one").toDF("t")
      .select(graft.functions.TextFunctions.wordShingles(col("t"), 3))
      .head().getSeq[String](0)
    assert(r === c)
    assert(r === Seq("one two three", "two three two", "three two one"))
  }

  test("nearest_cell resolves in SQL and matches the Column API") {
    val r = spark.sql(
      """SELECT nearest_cell(array(0.9d, 0.1d),
        |  array(struct(CAST(1 AS BIGINT) AS cid, array(1.0d, 0.0d) AS cvec),
        |        struct(CAST(2 AS BIGINT) AS cid, array(0.0d, 1.0d) AS cvec)))
        |""".stripMargin).head().getLong(0)
    assert(r === 1L)
  }

  test("hyperplane_code in SQL matches the Column API") {
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_ext2")
    val viaSql = spark.sql(
      "SELECT vec_id, hyperplane_code(embedding, 8, 64) AS c FROM emb_ext2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Lsh.bucketCode(col("embedding"), Lsh.planes(8, 64)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === viaCol)
  }
}

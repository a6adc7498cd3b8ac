package graft

/** The SQL serving surface (graft.SqlSurface): `spark.sql` alone must
  * run the reference-shaped searches, producing exactly what the
  * Scala entry points produce — the interface-parity contract the
  * reference sets with `SELECT * FROM search_similar_cards(...)`
  * (db/init.sql:162-254). */
class SqlSurfaceSpec extends SparkSuite {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.toJSON.collect().toSeq

  test("q_search_e2e runs through spark.sql ONLY, hash-equal to the " +
      "Scala row (the r11 verdict's Done criterion)") {
    val viaSql = rows(spark.sql(
      s"SELECT * FROM graft_query('q_search_e2e', '$sfDir')"))
    val viaScala = rows(operators.Rerank.searchE2e(spark, sfDir))
    assert(viaSql.nonEmpty)
    assert(viaSql === viaScala)
  }

  test("graft_query exposes ANY registry row; unknown names fail " +
      "loudly at analysis") {
    val viaSql = rows(spark.sql(
      s"SELECT * FROM graft_query('q_name_tiered', '$sfDir')"))
    assert(viaSql === rows(operators.Lexical.nameTiered(spark, sfDir)))
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_query('q_no_such', '$sfDir')")
    }
    assert(ex.getMessage.contains("q_no_such"))
  }

  test("graft_vec_topk / graft_vec_topk_threshold carry the " +
      "search_similar_cards signatures, parameterized from SQL") {
    assert(rows(spark.sql(
      s"SELECT * FROM graft_vec_topk('$sfDir', 3, 7)")) ===
      rows(operators.VectorSearch.topK(spark, sfDir, 3L, 7)))
    assert(rows(spark.sql(
      s"SELECT * FROM graft_vec_topk_threshold('$sfDir', 3, 0.25, 9)"))
      === rows(operators.VectorSearch
        .topKThreshold(spark, sfDir, 3L, 0.25, 9)))
  }

  test("graft_search_name runs the tiered name search for an " +
      "arbitrary SQL-supplied query string") {
    val q = Tables.documents(spark, sfDir)
      .selectExpr("lower(substr(text, 1, 12)) AS q")
      .orderBy(org.apache.spark.sql.functions.col("q"))
      .limit(1).collect().head.getString(0)
    val esc = q.replace("'", "''")
    assert(rows(spark.sql(
      s"SELECT * FROM graft_search_name('$sfDir', '$esc', 5)")) ===
      rows(operators.Lexical.nameTieredFor(spark, sfDir, q, 5)))
  }

  test("the TVF splice is a DECLARATIVE plan: an outer filter prunes " +
      "into the spliced subtree (no materialization barrier)") {
    // Catalyst must see through the TVF exactly as through a view —
    // the outer predicate lands in the spliced plan's scan.
    val df = spark.sql(
      s"SELECT * FROM graft_query('q_name_tiered', '$sfDir') " +
        "WHERE doc_id = 1")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("doc_id"), opt)
    assert(df.collect().forall(_.getAs[Long]("doc_id") == 1L))
  }
}

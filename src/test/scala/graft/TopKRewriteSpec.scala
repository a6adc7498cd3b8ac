package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** The TopKWindowRewrite optimizer rule must (a) fire on the
  * row_number-filter shape and eliminate the Window, (b) produce
  * exactly the rows the window plan produces — including null
  * ordering and multi-key ties — and (c) stay inert when excluded.
  */
class TopKRewriteSpec extends SparkSuite {
  import spark.implicits._

  private val RuleName = "graft.plans.TopKWindowRewrite"

  private def withRuleExcluded[T](body: => T): T = {
    val prev = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules", RuleName)
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("rewrite eliminates the Window and plans the bounded aggregate") {
    val p = Relational.topNWindow(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"window must be rewritten away:\n$p")
    assert(p.contains("top_k_rows"), s"expected bounded aggregate:\n$p")
    assert(p.contains("partial_top_k_rows"),
      s"expected map-side partial aggregation:\n$p")
  }

  test("excluded rule leaves the window plan intact, same answer") {
    val rewritten = Relational.topNWindow(spark, sfDir).collect().toSeq
    val (windowPlan, windowRows) = withRuleExcluded {
      val df = Relational.topNWindow(spark, sfDir)
      (df.queryExecution.executedPlan.toString, df.collect().toSeq)
    }
    assert(windowPlan.contains("Window"), "exclusion must disable the rule")
    assert(rewritten === windowRows)
  }

  test("null ordering and multi-key ties match the window semantics") {
    val df = Seq[(String, Option[Int], Long)](
      ("a", Some(3), 1L), ("a", Some(3), 2L), ("a", None, 3L),
      ("a", Some(1), 4L), ("b", None, 5L), ("b", None, 6L),
      ("b", Some(9), 7L), ("c", Some(2), 8L))
      .toDF("g", "v", "id")
    def q(asc: Boolean) = {
      val ord = if (asc) Seq(col("v").asc_nulls_last, col("id").asc)
        else Seq(col("v").desc_nulls_first, col("id").desc)
      df.withColumn("rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(ord: _*)))
        .where(col("rn") <= 2)
        .orderBy(col("g"), col("rn"))
    }
    for (asc <- Seq(true, false)) {
      val rewritten = q(asc)
      assert(!rewritten.queryExecution.executedPlan.toString.contains("Window"))
      val expected = withRuleExcluded(q(asc).collect().toSeq)
      assert(rewritten.collect().toSeq === expected, s"asc=$asc")
    }
  }

  test("rn = 1 (keep-first-per-group) is rewritten and exact") {
    val df = Seq((0, 2.0, 1L), (0, 3.0, 2L), (1, 1.0, 3L), (1, 1.0, 4L))
      .toDF("g", "score", "id")
    val q = df.withColumn("rn", row_number().over(
        Window.partitionBy(col("g"))
          .orderBy(col("score").desc, col("id").asc)))
      .where(col("rn") === 1)
      .orderBy(col("g"))
    assert(!q.queryExecution.executedPlan.toString.contains("Window"))
    val rows = q.collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(rows.toSeq === Seq((0, 2L), (1, 3L)))
  }

  test("rank column is usable downstream of the rewrite") {
    val rows = Relational.topNWindow(spark, sfDir)
      .select(col("rnk"), col("o_orderpriority")).collect()
    assert(rows.map(_.getInt(0)).forall(r => r >= 1 && r <= 3))
  }

  test("runtime conf gate disables the rewrite per-query, same answer") {
    val key = graft.plans.TopKWindowRewrite.EnabledKey
    val rewritten = Relational.topNWindow(spark, sfDir).collect().toSeq
    spark.conf.set(key, "false")
    try {
      val df = Relational.topNWindow(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("Window"),
        s"conf gate off must restore the window plan:\n$plan")
      assert(df.collect().toSeq === rewritten)
    } finally spark.conf.unset(key)
    // back on without touching the conf: default is enabled
    assert(!Relational.topNWindow(spark, sfDir)
      .queryExecution.executedPlan.toString.contains("Window"))
  }
}

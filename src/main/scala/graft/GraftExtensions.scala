package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.Lsh
import graft.plans.{CosineSimilarity, HyperplaneCode, NearestCell, TopKByScore, TopKWindowRewrite, TrigramSim}

/** SQL-surface registration: injects the native graft expressions
  * into the session catalog so pure-SQL users get them too —
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")
  * spark.sql("SELECT qid, top_k_by_score(sim, vec_id, 5) ... GROUP BY qid")
  * spark.sql("SELECT hyperplane_code(embedding, 32, 64) AS bucket ...")
  * }}}
  *
  * This is the reference's "plain SQL next to the search functions"
  * usage (reference: README.md "Direct SQL Queries", db/init.sql
  * CREATE FUNCTION search_similar_*) made first-class in Spark SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Plan rewrite: row_number()-window top-N-per-group → bounded
    // TopKRows aggregate (see TopKWindowRewrite). CAVEAT: when the
    // window's ORDER BY is not a total order, tied rows are kept
    // arbitrarily by BOTH plans, but possibly DIFFERENT arbitrary
    // rows — add a unique tiebreak column for determinism. Disable
    // per-query with SET spark.graft.topkWindowRewrite.enabled=false,
    // or per-session via
    // spark.sql.optimizer.excludedRules=graft.plans.TopKWindowRewrite.
    ext.injectOptimizerRule(_ => TopKWindowRewrite)

    // Whole-operator tier: the native sort-merge as-of join
    // (AsofJoinNode → AsofJoinExec).
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)

    // SQL-invocable TABLE functions over the registry + the
    // reference-shaped parameterized search entry points (the
    // `SELECT * FROM search_similar_cards(...)` serving surface;
    // see graft.SqlSurface).
    SqlSurface.register(ext)

    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(vec, vec)")
        CosineSimilarity(args(0), args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("trigram_sim"),
      new ExpressionInfo(classOf[TrigramSim].getName, "trigram_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "trigram_sim(string, string)")
        TrigramSim(args(0), args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[graft.plans.WordShingles].getName,
        "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2 && args(1).isInstanceOf[Literal],
          "word_shingles(string, n literal)")
        graft.plans.WordShingles(args(0),
          args(1).eval().asInstanceOf[Int])
      }))

    ext.injectFunction((
      FunctionIdentifier("json_strip_keys"),
      new ExpressionInfo(classOf[graft.plans.JsonStripKeys].getName,
        "json_strip_keys"),
      (args: Seq[Expression]) => {
        require(args.length >= 2 && args.tail.forall(_.isInstanceOf[Literal]),
          "json_strip_keys(json, key literals...)")
        graft.plans.JsonStripKeys(args.head,
          args.tail.map(_.eval().toString))
      }))

    ext.injectFunction((
      FunctionIdentifier("nearest_cell"),
      new ExpressionInfo(classOf[NearestCell].getName, "nearest_cell"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "nearest_cell(vec, cents)")
        NearestCell(args(0), args(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by_score"),
      (args: Seq[Expression]) => args match {
        case Seq(score, id, Literal(k: Int, _)) => TopKByScore(score, id, k)
        case _ => throw new IllegalArgumentException(
          "top_k_by_score(score, id, k) with literal k")
      }))

    ext.injectFunction((
      FunctionIdentifier("hyperplane_code"),
      new ExpressionInfo(classOf[HyperplaneCode].getName, "hyperplane_code"),
      (args: Seq[Expression]) => args match {
        case Seq(v, Literal(n: Int, _), Literal(d: Int, _)) =>
          HyperplaneCode(v, Lsh.planes(n, d).flatten.toIndexedSeq, d)
        case _ => throw new IllegalArgumentException(
          "hyperplane_code(vec, nPlanes, dim) with literal nPlanes/dim")
      }))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Lexical, Rerank}

/** Semantic invariants of the rerank/fusion and tiered-search
  * control flow — the reference's headline behaviors (these are
  * oracle-gated for values; here we pin the SHAPE of the answers). */
class RerankLexicalSpec extends SparkSuite {

  test("rerank score is the documented blend and descending") {
    val rows = Rerank.rerank(spark, sfDir).collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3 - 1e-9)
      case _ =>
    }
    // score ≈ 0.7·sim + 0.2·tri + 0.1·sr with sr ∈ [0,1] — bound it
    rows.foreach { case (sim, tri, score) =>
      val base = 0.7 * sim + 0.2 * tri
      assert(score >= base - 1e-4 && score <= base + 0.1 + 1e-4,
        s"score $score outside blend bounds for sim=$sim tri=$tri")
    }
  }

  test("fusion emits at most finalK docs with at least one modality rank") {
    val rows = Rerank.fusion(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    rows.foreach { r =>
      val ranks = Seq(1, 2, 3).map(i =>
        if (r.isNullAt(i)) None else Some(r.getInt(i)))
      assert(ranks.exists(_.isDefined), s"row with no modality rank: $r")
      assert(ranks.flatten.forall(x => x >= 1 && x <= 20))
    }
    // RRF descending with doc_id tiebreak
    val rrf = rows.map(_.getDouble(4))
    rrf.sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 1e-12)
      case _ =>
    }
  }

  test("tiered search: all returned rows come from ONE tier (first non-empty)") {
    val rows = Lexical.nameTiered(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val tiers = rows.map(_.getInt(3)).distinct
    assert(tiers.length === 1, s"rows from multiple tiers: ${tiers.toSeq}")
  }

  test("trigram prefilter is lossless vs brute force, incl. degenerate queries") {
    // The r6 weak-plan fix: candidates = names sharing >= 1 trigram,
    // exact verify on candidates, sim-0 fill for the rest. Must equal
    // the full scan for ANY query — including one overlapping nothing
    // (pure fill path) and one too short to have trigrams at all.
    import graft.functions.TextFunctions.{docName, trigramSim}
    val n = Tables.documents(spark, sfDir)
      .select(col("doc_id"), docName(col("text")).as("name"))
    def brute(q: String) = n
      .select(col("doc_id"), col("name"),
        trigramSim(col("name"), lit(q)).as("sim"))
      .orderBy(col("sim").desc, col("doc_id").asc).limit(10)
      .select(col("doc_id"), col("name"), round(col("sim"), 6).as("sim"))
      .collect().toSeq
    for (q <- Seq(Lexical.trigramQuery, "zzzqqqvvv", "zz", "")) {
      val got = Lexical.trgPrefilterTopK(n, q, 10)
        .select(col("doc_id"), col("name"), round(col("sim"), 6).as("sim"))
        .collect().toSeq
      assert(got === brute(q), s"prefilter diverges from full scan for '$q'")
    }
  }

  test("tier-1 exact hit short-circuits the fallback") {
    // Build a tiered query for a name that exists verbatim: tier must be 1.
    val name = Tables.documents(spark, sfDir)
      .select(graft.functions.TextFunctions.docName(col("text")).as("n"))
      .head().getString(0)
    val rows = Lexical.nameTieredFor(spark, sfDir, name).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(3) === 1),
      s"exact name '$name' must resolve in tier 1")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.RulesParse

/** The rulesCleaning tier: hierarchical parse, combined assembly,
  * reference extraction (parse_rules_both_versions.py /
  * glossary_parser.py semantics). The DuckDB hash gate proves
  * cross-engine equality; these specs pin the SEMANTICS against
  * independent driver-side recomputation, and the plan shapes. */
class RulesParseSpec extends SparkSuite {

  test("q_rule_hierarchy: parse fields reconstruct the line, types consistent") {
    val rows = RulesParse.ruleHierarchy(spark, sfDir).collect()
    assert(rows.length == 500)
    for (r <- rows) {
      val num = r.getAs[String]("rule_number")
      val typ = r.getAs[String]("rule_type")
      val parent = r.getAs[String]("parent_rule")
      val secPar = r.getAs[String]("section_parent")
      // classification == letter suffix, parent strips exactly it
      if (num.last.isLetter) {
        assert(typ == "subrule" && parent == num.dropRight(1), num)
      } else {
        assert(typ == "main_rule" && parent == null, num)
      }
      // section parent is the before-dot prefix; number is its digit
      assert(secPar == num.takeWhile(_ != '.'))
      assert(r.getAs[String]("section_number") == secPar.take(1))
      // embed text renders every derived field
      val et = r.getAs[String]("embed_text")
      assert(et.startsWith(s"Rule $num\nType: $typ\nSection: "))
      assert(et.contains(s"\nParent: ${if (parent == null) "None" else parent}\n"))
    }
    // the synthetic render produces both classes
    assert(rows.count(_.getAs[String]("rule_type") == "subrule") > 100)
    assert(rows.count(_.getAs[String]("rule_type") == "main_rule") > 50)
  }

  test("q_rule_combined: ordered assembly matches a driver-side regroup") {
    val indiv = RulesParse.ruleHierarchy(spark, sfDir).collect()
    val combined = RulesParse.ruleCombined(spark, sfDir).collect()
    // independent reimplementation of create_combined_rules over the
    // individual parse: group subs by parent, keep min-doc main,
    // sort subs by (rule_number, doc_id)
    val mains = indiv.filter(_.getAs[String]("rule_type") == "main_rule")
      .groupBy(_.getAs[String]("rule_number"))
      .map { case (num, rs) => num -> rs.minBy(_.getAs[Long]("doc_id")) }
    val subs = indiv.filter(_.getAs[String]("rule_type") == "subrule")
      .groupBy(_.getAs[String]("parent_rule"))
    assert(combined.length == mains.size,
      "one output row per distinct main rule, sub-only groups dropped")
    for (c <- combined) {
      val num = c.getAs[String]("rule_number")
      val main = mains(num)
      assert(c.getAs[Long]("main_doc") == main.getAs[Long]("doc_id"))
      val expectSubs = subs.getOrElse(num, Array.empty)
        .sortBy(r => (r.getAs[String]("rule_number"), r.getAs[Long]("doc_id")))
      assert(c.getAs[Long]("n_subrules") == expectSubs.length)
      val expectText = s"Rule $num\nSection: ${main.getAs[String]("section_name")}" +
        s"\nText: ${main.getAs[String]("rule_text")}" +
        (if (expectSubs.isEmpty) ""
         else "\nSubrules:\n" + expectSubs.map(r =>
           s"${r.getAs[String]("rule_number")}: ${r.getAs[String]("rule_text")}")
           .mkString("\n"))
      assert(c.getAs[String]("combined_text") == expectText, num)
    }
  }

  test("q_rule_incremental: refresh == rebuild restricted to affected groups") {
    val combined = RulesParse.ruleCombined(spark, sfDir).collect()
      .map(r => r.getAs[String]("rule_number") -> r).toMap
    val indiv = RulesParse.ruleHierarchy(spark, sfDir).collect()
    // affected keys: the parent group of every batch doc
    val affected = indiv
      .filter(_.getAs[Long]("doc_id") % graft.operators.Dedup.IncrMod == 0)
      .map(r => Option(r.getAs[String]("parent_rule"))
        .getOrElse(r.getAs[String]("rule_number")))
    val expectKeys = affected.distinct.filter(combined.contains).sorted
    val inc = RulesParse.ruleIncremental(spark, sfDir).collect()
    assert(inc.map(_.getAs[String]("rule_number")).sorted.toSeq
      === expectKeys.toSeq,
      "refresh must cover exactly the batch-touched groups with a main")
    val batchPerKey = affected.groupBy(identity).view.mapValues(_.length)
    for (r <- inc) {
      val num = r.getAs[String]("rule_number")
      val full = combined(num)
      // whole groups in, whole rows out: every column equals the rebuild
      assert(r.getAs[String]("combined_text") ==
        full.getAs[String]("combined_text"), num)
      assert(r.getAs[Long]("n_subrules") == full.getAs[Long]("n_subrules"))
      assert(r.getAs[Long]("main_doc") == full.getAs[Long]("main_doc"))
      assert(r.getAs[Long]("n_batch_docs") == batchPerKey(num).toLong, num)
    }
  }

  test("q_rule_incremental plan: the key filter sits BELOW both grouping " +
      "aggregations") {
    // The production property: the refresh shuffles only affected
    // groups' lines, so the broadcast semi-join on the batch keys
    // must be under the mains/subs aggregates, not over their output.
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val plan = RulesParse.ruleIncremental(spark, sfDir)
      .queryExecution.optimizedPlan
    val groupAggs = plan.collect {
      case a: Aggregate if a.groupingExpressions.nonEmpty => a
    }
    // mains, subs, and the batch-count agg itself
    assert(groupAggs.size >= 3, s"expected 3 grouping aggs:\n$plan")
    val withSemiBelow = groupAggs.count(a =>
      a.child.collect { case j: Join if j.joinType == LeftSemi => j }.nonEmpty)
    assert(withSemiBelow >= 2,
      s"mains+subs aggs must sit above the semi key filter:\n$plan")
  }

  test("q_glossary_refs: extraction matches hash60Local recomputation") {
    import graft.functions.MinHash.hash60Local
    val rows = RulesParse.glossaryRefs(spark, sfDir).collect()
    assert(rows.length == 500)
    var empties = 0
    // shared constants, not literals (the r6 IncrMod lesson): if the
    // derivation moduli change, query and expectation move together
    val (nSec, offMod, noRef) =
      (RulesParse.NumSections, RulesParse.RefOffMod, RulesParse.NoRefMod)
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      def h(tag: String) = hash60Local(s"$tag$id")
      // r8: related_rules is a comma-joined STRING (the driver's
      // comparator cannot sort array cells); split it back for the
      // set comparison. The refs contain no commas by construction.
      val gotStr = r.getAs[String]("related_rules")
      val got: Seq[String] =
        if (gotStr.isEmpty) Nil else gotStr.split(",").toSeq
      if (h("has:") % noRef == 0) { empties += 1; assert(got.isEmpty, s"doc $id") }
      else {
        val r1 = ((h("r1:") % nSec + 1) * 100 + h("r1b:") % offMod).toString
        val r2 = s"${(h("r2:") % nSec + 1) * 100 + h("r2b:") % offMod}.${h("r2c:") % 10}"
        val ltr = "abc".charAt((h("r3l:") % 3).toInt)
        val r3 = s"${(h("r3:") % nSec + 1) * 100 + h("r3b:") % offMod}.${h("r3c:") % 10}$ltr"
        val s1 = (h("s1:") % nSec + 1).toString
        val expect = (Seq(r1, r2, r3) ++
          (if (h("hasS:") % 2 == 1) Seq(s1) else Nil)).distinct.sorted
        assert(got == expect, s"doc $id: $got vs $expect")
      }
      assert(r.getAs[Int]("n_refs") == got.length)
    }
    // the no-reference path is actually exercised
    assert(empties > 20, s"expected ~1/8 empty ref lists, got $empties")
  }

  test("combined assembly scale smoke: 1M docs, ~10k groups, conservation") {
    // The size where a serialized concat or an all-pairs regression
    // would show (the q_pipeline 10M smoke's assembly sibling):
    // zero-storage synth corpus rendered at a realistic fanout
    // (9 sections x 1200 sub-numbers ~ 10.8k groups, ~90 docs each),
    // parsed and assembled. Asserts completion + conservation:
    // every subrule of a surviving group is in exactly one Subrules
    // block, group count bounded by the key space.
    val docs = spark.read.format("graft-synth")
      .option("rows", 1000000).option("parts", 32).option("seed", 13)
      .load().select(col("doc_id"), col("text"))
    val p = RulesParse.parsedOver(RulesParse.ruleLinesOver(docs, 1200))
    val out = RulesParse.assembled(p)
      .agg(count(lit(1)).as("groups"), sum(col("n_subrules")).as("subs"))
      .head()
    val groups = out.getLong(0)
    assert(groups > 9000 && groups <= 9L * 1200,
      s"group count $groups outside the key space")
    // subs attached = subrules whose parent has >=1 main; with ~90
    // docs per group every group has one, so ALL subrules attach
    val totalSubs = p.filter(col("rule_type") === "subrule").count()
    assert(out.getLong(1) == totalSubs,
      s"attached ${out.getLong(1)} of $totalSubs subrules")
  }

  test("parse and extraction plans are map-only; assembly is equi-join only") {
    val ph = RulesParse.ruleHierarchy(spark, sfDir)
      .queryExecution.executedPlan.toString
    // orderBy is presentation; the parse itself must add no shuffle
    // beyond that single output sort
    assert(!ph.contains("HashAggregate") && !ph.contains("Join"),
      s"hierarchy parse must be a single scan:\n$ph")
    val pg = RulesParse.glossaryRefs(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!pg.contains("HashAggregate") && !pg.contains("Join"),
      s"reference extraction must be a single scan:\n$pg")
    val pc = RulesParse.ruleCombined(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!pc.contains("CartesianProduct"),
      "assembly joins group-level sides on the rule key")
    assert(!pc.contains("Window"),
      "assembly orders inside the agg buffer, not via a window")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Link analysis over the derived cross-reference graph: the exact
  * integer power iteration must match a from-scratch driver-side
  * recomputation (oracle-independent), and the BSP shape must hold
  * at a size where anything quadratic would show. */
class GraphSpec extends SparkSuite {

  test("q_rank_refs: exact driver-side power-iteration recomputation") {
    val got = Graph.rankRefs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_ppm"),
        r.getAs[Long]("n_in"), r.getAs[Long]("n_out"))).toSeq
    assert(got.size === 20)

    // Recompute the whole algorithm from the raw edge list in plain
    // Scala — same integer rules (r DIV outdeg, 150000 + 17·S DIV 20).
    val e = Graph.edges(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSeq
    val nodes = Tables.documents(spark, sfDir).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val out = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to Graph.RankIters) {
      val contrib = e.groupBy(_._2).map { case (d, xs) =>
        d -> xs.map { case (s, _) => r(s) / out(s) }.sum
      }
      r = nodes.map(n => n -> (150000L + 17 * contrib.getOrElse(n, 0L) / 20))
        .toMap
    }
    val in = e.groupBy(_._2).map { case (d, xs) => d -> xs.size.toLong }
    val want = nodes.map(n => (n, r(n), in.getOrElse(n, 0L),
        out.getOrElse(n, 0L)))
      .sortBy { case (id, rp, _, _) => (-rp, id) }.take(20)
    assert(got === want)

    // Sanity: damping floor holds and hubs (high in-degree) lead.
    assert(got.forall(_._2 >= 150000L))
    assert(got.head._3 > 0)
  }

  test("q_graph_triangles: exact driver-side triangle recomputation") {
    val got = Graph.graphTriangles(spark, sfDir).collect()
    assert(got.length === 1)
    val r = got.head
    val (nn, ne, nw, nt, cp) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))

    // Brute-force recomputation from the raw edge list.
    val ue = Graph.edges(spark, sfDir).collect()
      .map(x => (math.min(x.getLong(0), x.getLong(1)),
        math.max(x.getLong(0), x.getLong(1))))
      .distinct
    val es = ue.toSet
    val adj = (ue ++ ue.map(_.swap)).groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).toSeq }
    val wantNodes = adj.size.toLong
    val wantWedges = adj.values.map(n => n.size.toLong * (n.size - 1) / 2).sum
    val wantTri = ue.map { case (u, v) =>
      adj(v).count(w => w > v && es.contains((u, w))).toLong
    }.sum
    assert(nn === wantNodes)
    assert(ne === ue.length.toLong)
    assert(nw === wantWedges)
    assert(nt === wantTri, s"triangles $nt vs brute $wantTri")
    assert(cp === 3000000L * wantTri / math.max(wantWedges, 1L))
    // The hashed-ref graph must actually contain triangles at this
    // SF, or the census is vacuous.
    assert(nt > 0, "corpus graph has no triangles — census vacuous")
  }

  test("q_graph_degree_dist: exact driver-side histogram recomputation; " +
      "the hub tail is visible") {
    val got = Graph.graphDegreeDist(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    val ue = Graph.edges(spark, sfDir).collect()
      .map(x => (math.min(x.getLong(0), x.getLong(1)),
        math.max(x.getLong(0), x.getLong(1)))).distinct
    val deg = (ue ++ ue.map(_.swap)).groupBy(_._1)
      .map { case (_, xs) => xs.map(_._2).length.toLong }
    val want = deg.groupBy(d => java.lang.Long.toBinaryString(d).length.toLong)
      .map { case (b, ds) => b -> ((ds.size.toLong, ds.min, ds.max)) }
      .toSeq.sortBy(_._1)
    assert(got.toSeq === want)
    // Bucket sanity: min/max inside [2^(b-1), 2^b).
    got.foreach { case (b, (_, lo, hi)) =>
      assert(lo >= (1L << (b - 1)) && hi < (1L << b), s"bucket $b: $lo..$hi")
    }
    // The hash-hub tail must be real: some vertex's degree is >= 8x
    // the minimum bucket (the topology q_graph_triangles' degree
    // orientation exists for).
    assert(got.map(_._1).max >= got.map(_._1).min + 3,
      "expected a multi-decade degree distribution")
  }

  test("q_graph_cn: exact driver-side recomputation; candidates are " +
      "non-edges with hub-capped evidence") {
    val got = Graph.graphCommonNeighbors(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ue = Graph.edges(spark, sfDir).collect()
      .map(x => (math.min(x.getLong(0), x.getLong(1)),
        math.max(x.getLong(0), x.getLong(1)))).distinct
    val adj = (ue ++ ue.map(_.swap)).groupBy(_._1)
      .map { case (c, xs) => c -> xs.map(_._2).toSet }
    val ctr = adj.filter(_._2.size <= 32).keySet
    val cn = scala.collection.mutable.Map[(Long, Long), Long]()
    for (c <- ctr; xs = adj(c).toSeq.sorted;
         i <- xs.indices; j <- (i + 1) until xs.length)
      cn((xs(i), xs(j))) = cn.getOrElse((xs(i), xs(j)), 0L) + 1L
    val edgeSet = ue.toSet
    val want = cn.toSeq.filterNot(p => edgeSet.contains(p._1))
      .map { case ((u, v), n) => (u, v, n) }
      .sortBy(x => (-x._3, x._1, x._2)).take(15)
    assert(got.toSeq === want)
    // Every candidate is a genuine NON-edge with real shared evidence.
    got.foreach { case (u, v, n) =>
      assert(u < v && n >= 1 && !edgeSet.contains((u, v)))
    }
    assert(got.head._3 > 1L, "top candidate should share >1 neighbor")
  }

  test("scale smoke: 1M synthetic docs through the triangle census, " +
      "zero storage (hub-safe by degree orientation)") {
    // The synth ref graph concentrates popular tokens onto hash-hub
    // vertices with five-figure degrees — exactly the topology where
    // an id-ordered path join goes quadratic in hub degree. Degree
    // orientation caps per-vertex path work at C(outdeg, 2) with
    // outdeg = O(sqrt(edges)); completing at 1M docs IS the
    // structural evidence (the wedge count also certifies the hubs
    // are really there).
    val docs = spark.read.format("graft-synth")
      .option("rows", 1000000).option("parts", 32).option("seed", 47)
      .load().select(col("doc_id"), col("text"))
    val r = Graph.graphTrianglesOver(docs).collect().head
    val (nn, ne, nw, nt) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nn > 500000 && ne > nn / 2, s"degenerate graph: $nn/$ne")
    assert(nw > 100L * ne,
      s"wedges $nw vs edges $ne — expected hub concentration")
    assert(nt >= 0 && r.getLong(4) >= 0)
    info(s"$nn nodes, $ne edges, $nw wedges, $nt triangles")
  }

  test("scale smoke: 1M synthetic docs through the rank iteration, " +
      "zero storage") {
    // The BSP shape at a size where an accidental all-pairs edge
    // derivation or a per-iteration lineage blowup would show: 1M
    // docs → ≤3M edges → 3 iterations. Asserts completion + the
    // mass-conservation bound (total rank can only LOSE mass to
    // dangling nodes, never gain).
    val docs = spark.read.format("graft-synth")
      .option("rows", 1000000).option("parts", 32).option("seed", 31)
      .load().select(col("doc_id"), col("text"))
    val top = Graph.rankRefsOver(docs, 5).collect()
    assert(top.length === 5)
    assert(top.forall(_.getAs[Long]("rank_ppm") >= 150000L))
    info(s"top rank_ppm = ${top.head.getAs[Long]("rank_ppm")}")
  }

  test("q_graph_incr: delta-merge equals the rebuild; affected-center " +
      "semi-join prunes below the wedge join+agg") {
    // Semantics: the standing+delta merge must equal the one-pass
    // full rebuild (q_graph_cn) row for row — the same equality the
    // gate grades via the shared oracle, asserted here without DuckDB.
    val inc = Graph.graphIncremental(spark, sfDir).collect().toSeq
    val full = Graph.graphCommonNeighbors(spark, sfDir).collect().toSeq
    assert(inc === full, "incremental CN diverged from the rebuild")
    assert(inc.nonEmpty)
    // Plan: the fused wedge enumeration must be pruned to the
    // affected centers BEFORE the self-join + aggregation — the
    // O(batch) property. The prune is the broadcast eligibility-flags
    // join (r12 fused the former two-arm LeftSemi shape into one
    // tagged self-join); it must appear below the top HashAggregate,
    // and it must be a BROADCAST join — a shuffled center join would
    // re-exchange the corpus adjacency per refresh.
    val p = Graph.incrDeltaWedges(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"affected-center prune must be a broadcast join:\n$p")
    val aggIdx = p.indexOf("HashAggregate")
    val bcIdx = p.lastIndexOf("BroadcastHashJoin")
    assert(aggIdx >= 0 && bcIdx > aggIdx,
      s"center prune must sit BELOW the wedge aggregation:\n$p")
    // The SERVE merge must be broadcast-only: the corpus-scale
    // standing tables (cn, edges) are probed map-only, never
    // re-shuffled per refresh — no sort-merge/shuffled-hash join
    // anywhere in the graded row's plan (the only exchanges are the
    // batch-scale delta agg and the final TakeOrdered).
    val sp = Graph.graphIncremental(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!sp.contains("SortMergeJoin") && !sp.contains("ShuffledHashJoin"),
      s"the serve merge must not shuffle the standing store:\n$sp")
  }

  test("q_rank_converged: tolerance fixpoint — stop rule exact, " +
      "converged ranks equal the unrolled iteration, trace decays") {
    val (ranks, t, trace) = Graph.convergeRanks(
      Tables.documents(spark, sfDir))
    // The stop rule: FIRST iteration at or under the tolerance —
    // every earlier delta above it, the last one under.
    assert(t === trace.length)
    assert(trace.last <= Graph.RankTol, s"stopped above tol: $trace")
    assert(trace.init.forall(_ > Graph.RankTol),
      s"stopped late — an earlier iteration was already under: $trace")
    assert(t <= Graph.RankMaxIters)
    // Geometric decay at damping 17/20: by iteration 5 the max move
    // must have fallen ≥10× from iteration 1 (measured 37×/39×/686×
    // at the three SFs — this is the loose structural bound, not a
    // tuned constant).
    assert(trace.length >= 5 && trace(4) * 10 <= trace.head,
      s"delta trace not decaying: $trace")
    // Converged ranks ≡ the plain iteration unrolled to exactly t
    // steps, recomputed driver-side with the same integer rules.
    val e = Graph.edges(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSeq
    val nodes = Tables.documents(spark, sfDir).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val out = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to t) {
      val contrib = e.groupBy(_._2).map { case (d, xs) =>
        d -> xs.map { case (s, _) => r(s) / out(s) }.sum
      }
      r = nodes.map(n => n -> (150000L + 17 * contrib.getOrElse(n, 0L) / 20))
        .toMap
    }
    val got = ranks.collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("r")).toMap
    assert(got === r, "converged ranks diverge from the t-step unroll")
    // conv_iter surfaces in the graded row and matches the loop's t.
    val row = Graph.rankConverged(spark, sfDir).collect()
    assert(row.forall(_.getAs[Long]("conv_iter") === t.toLong))
  }

  test("q_rank_personalized: exact driver-side recomputation; rank " +
      "reaches non-seeds only through seed paths") {
    val got = Graph.rankPersonalized(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank_ppm"),
        r.getAs[Long]("is_seed"), r.getAs[Long]("n_in"),
        r.getAs[Long]("n_out"))).toSeq
    assert(got.size === 20)
    val e = Graph.edges(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSeq
    val nodes = Tables.documents(spark, sfDir).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val out = e.groupBy(_._1).map { case (s, xs) => s -> xs.size.toLong }
    def seed(n: Long) = n % Graph.PprSeedMod == 0
    var r = nodes.map(n => n -> (if (seed(n)) 1000000L else 0L)).toMap
    for (_ <- 1 to Graph.RankIters) {
      val contrib = e.groupBy(_._2).map { case (d, xs) =>
        d -> xs.map { case (s, _) => r(s) / out(s) }.sum
      }
      r = nodes.map(n => n -> ((if (seed(n)) Graph.PprBase else 0L) +
        17 * contrib.getOrElse(n, 0L) / 20)).toMap
    }
    val in = e.groupBy(_._2).map { case (d, xs) => d -> xs.size.toLong }
    val want = nodes.map(n => (n, r(n), if (seed(n)) 1L else 0L,
        in.getOrElse(n, 0L), out.getOrElse(n, 0L)))
      .sortBy { case (id, rp, _, _, _) => (-rp, id) }.take(20)
    assert(got === want)
    // Personalization structure: every positive-rank non-seed is
    // reachable from the seed set (mass flows only along seed
    // paths); a non-seed with rank but no in-edges is impossible.
    assert(got.filter(_._3 == 0L).forall(x => x._2 == 0L || x._4 > 0))
  }

  test("q_graph_cc: exact fixpoint — labels equal a union-find " +
      "recomputation, stop rule exact, rollup conserves nodes") {
    val docs = Tables.documents(spark, sfDir)
    val (lab, t, trace) = Graph.convergeComponents(docs)
    // Stop rule: the monotone update terminates at EXACT quiet —
    // every earlier superstep moved some label, the last moved none.
    assert(t === trace.length)
    assert(trace.last === 0L, s"stopped while moving: $trace")
    assert(trace.init.forall(_ > 0L), s"stopped late: $trace")
    // Components via union-find over the strong edges — a DIFFERENT
    // algorithm, so agreement is the algorithm-independence proof
    // (component id = min doc_id of the class).
    val ue = Graph.strongEdges(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = docs.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSeq
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    ue.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(ru) = rv
    }
    val want = nodes.groupBy(find).flatMap { case (_, xs) =>
      val m = xs.min; xs.map(_ -> m)
    }
    val got = lab.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component"))
      .toMap
    assert(got === want, "labels diverge from union-find components")
    // The graded histogram conserves nodes and carries the stop step.
    val rows = Graph.graphComponents(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum === nodes.size.toLong)
    assert(rows.forall(_.getAs[Long]("conv_iter") === t.toLong))
    assert(rows.map(_.getAs[Long]("n_components")).sum ===
      want.values.toSet.size.toLong)
    info(s"conv at $t, trace=$trace")
  }

  test("q_graph_cc_incr: contraction delta-merge lands on exactly " +
      "the rebuild's labels") {
    val docs = Tables.documents(spark, sfDir)
    // Label-level equality — stronger than the graded histogram:
    // every doc's component id must match the full rebuild.
    val incr = Graph.incrComponentLabels(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component"))
      .toMap
    val full = Graph.convergeComponents(docs)._1.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component"))
      .toMap
    assert(incr === full, "contraction merge diverged from rebuild")
    // Stored ≡ inline (the AnnIndexSpec pattern): the graded row
    // reads the standing labels/strong-edges from the fingerprinted
    // store; its labels must equal the inline form's exactly.
    val stored = Graph.ccIncrLabelsStored(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component"))
      .toMap
    assert(stored === full, "stored-serve labels diverged from rebuild")
    // And the graded rows agree with q_graph_cc's (minus conv).
    val got = Graph.graphCcIncremental(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val want = Graph.graphComponents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("BspKernel is partitioning-invariant: 1, 3 and default state " +
      "partitions produce identical labels, stop and trace") {
    // The distributed-correctness property: results must not depend
    // on how state is sharded (a partition-sensitive combine or a
    // lost-message bug shows up as divergence here).
    val docs = Tables.documents(spark, sfDir)
    val key = graft.plans.BspKernel.PartitionsKey
    def run(): (Map[Long, Long], Int, Seq[Long]) = {
      val (lab, t, tr) = Graph.convergeComponents(docs)
      (lab.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
        t, tr)
    }
    val base = run()
    for (p <- Seq("1", "3")) {
      spark.conf.set(key, p)
      try assert(run() === base, s"diverged at $p state partitions")
      finally spark.conf.unset(key)
    }
  }

  test("scale smoke: 1M synthetic docs through component propagation, " +
      "zero storage") {
    // The fixpoint loop at a size where a per-superstep lineage
    // blowup or an all-pairs candidate derivation would show; the
    // thresholded graph keeps its hash hubs, so distances stay short
    // and the superstep count stays well under the cap.
    val docs = spark.read.format("graft-synth")
      .option("rows", 1000000).option("parts", 32).option("seed", 59)
      .load().select(col("doc_id"), col("text"))
    val rows = Graph.graphComponentsOver(docs).collect()
    val nNodes = rows.map(_.getAs[Long]("n_nodes")).sum
    assert(nNodes === 1000000L, s"lost nodes: $nNodes")
    val giant = rows.map(_.getAs[Long]("max_size")).max
    // The synth token mix fragments harder than the ref corpus
    // (measured giant ≈ 57k of 1M at keep ¼) — the structural claim
    // is a dominant component orders beyond the island tail, not a
    // majority one.
    assert(giant > 10000L, s"no dominant component: $giant")
    val conv = rows.head.getAs[Long]("conv_iter")
    assert(conv <= Graph.CcMaxIters.toLong)
    info(s"${rows.map(_.getAs[Long]("n_components")).sum} components, " +
      s"giant=$giant, conv=$conv")
  }
}

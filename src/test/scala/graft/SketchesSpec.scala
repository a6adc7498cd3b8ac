package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Relational, Sketches}

/** Sketch correctness properties (error bounds, one-sided-ness, no
  * false negatives) plus plan-shape audits for the round-4 additions
  * (pivot, exact percentile, outlier audit). The DuckDB oracle
  * proves cross-engine hash equality; these tests prove the
  * STATISTICAL contracts the sketches advertise.
  */
class SketchesSpec extends SparkSuite {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("HLL estimate lands within the m=256 error envelope") {
    val rows = Sketches.hllDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("est")
      val regs = r.getAs[Long]("regs_hit")
      assert(regs >= 1 && regs <= 256)
      // standard error 1.04/sqrt(256) = 6.5%; 30% is a generous
      // deterministic bound for a single fixed hash draw.
      assert(math.abs(est - exact) / exact < 0.30,
        s"flag=${r.getString(0)} exact=$exact est=$est")
    }
  }

  test("HLL registers merge across shards to the whole-corpus sketch") {
    // The 100 TB claim: sketch per shard, merge registers (max m,
    // sum nd), estimate once — identical to sketching the union.
    val li = Tables.lineitem(spark, sfDir)
    val g = col("l_returnflag")
    val k = col("l_orderkey")
    val whole = Sketches.hllEstimate(
      Sketches.hllRegisters(li, g, k)).orderBy("g").collect().toSeq
    val shardA = Sketches.hllRegisters(li.where(k % 2 === 0), g, k)
    val shardB = Sketches.hllRegisters(li.where(k % 2 === 1), g, k)
    // Merge: keys are disjoint across shards (split BY key), so nd
    // sums and m maxes per (g, bucket).
    val merged = shardA.unionAll(shardB)
      .groupBy(col("g"), col("bucket"))
      .agg(max(col("m")).as("m"), sum(col("nd")).as("nd"))
    val viaMerge = Sketches.hllEstimate(merged).orderBy("g").collect().toSeq
    assert(viaMerge === whole)
  }

  test("CMS never underestimates; the absent probe has zero truth") {
    val rows = Sketches.cmsFreq(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq.contains("zebra"))
    rows.foreach { r =>
      val truth = r.getAs[Long]("true_cnt")
      val est = r.getAs[Long]("cms_est")
      assert(est >= truth,
        s"token=${r.getString(0)} CMS must be one-sided: $est < $truth")
      if (r.getString(0) == "zebra") assert(truth === 0L)
      else assert(truth > 0L, s"probe ${r.getString(0)} missing from corpus")
    }
  }

  test("bloom filter has no false negatives and a broadcast bit set") {
    val r = Sketches.bloomSemi(spark, sfDir).head()
    val pass = r.getAs[Long]("keys_pass")
    val truth = r.getAs[Long]("keys_true")
    val fp = r.getAs[Long]("keys_fp")
    // pass = fp + (members that passed); equality with keys_true
    // means EVERY member passed — the no-false-negative guarantee.
    assert(pass - fp === truth)
    assert(r.getAs[Long]("rows_pass") >= r.getAs[Long]("rows_true"))
    assert(truth > 0L)
    val p = plan(Sketches.bloomSemi(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"bloom bit set must broadcast:\n$p")
  }

  test("HDR quantile sketch: shard cells merge by addition to the full build") {
    val o = Tables.orders(spark, sfDir).select(
      col("o_orderpriority").as("prio"),
      round(col("o_totalprice") * 100).cast("long").as("v"),
      col("o_orderkey"))
    val full = Sketches.hdrCells(o.select(col("prio"), col("v")))
    val shardA = Sketches.hdrCells(
      o.where(col("o_orderkey") % 2 === 0).select(col("prio"), col("v")))
    val shardB = Sketches.hdrCells(
      o.where(col("o_orderkey") % 2 =!= 0).select(col("prio"), col("v")))
    val merged = shardA.unionAll(shardB)
      .groupBy(col("prio"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
    assert(merged.unionAll(full).distinct().count() === full.count(),
      "summed shard cells must equal the single-pass cells exactly")
  }

  test("q_hdr_quantile: realized rank within the quantile bucket's mass") {
    // The sketch bounds VALUE error by construction (1/32 of the
    // octave); the RANK deviation is bounded by the mass fraction of
    // the bucket the quantile lands in — assert the data-derived
    // bound (max bucket mass per priority), not a constant.
    val o = Tables.orders(spark, sfDir).select(
      col("o_orderpriority").as("prio"),
      round(col("o_totalprice") * 100).cast("long").as("v"))
    val maxFrac = Sketches.hdrCells(o)
      .groupBy(col("prio"))
      .agg((max(col("cnt")).cast("double") / sum(col("cnt"))).as("mf"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rows = Sketches.hdrQuantile(spark, sfDir).collect()
    assert(rows.length === 15) // 5 priorities × 3 quantiles
    rows.foreach { r =>
      val (prio, q, n, frac) =
        (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(4))
      val bound = maxFrac(prio) + 1.0 / n + 1e-9
      assert(math.abs(frac - q) <= bound,
        s"$prio q=$q realized rank $frac — outside bucket-mass bound $bound")
    }
  }

  test("q_theta_sketch: exact driver-side recomputation of sketch " +
      "and audit columns") {
    import graft.functions.MinHash.hash60Local
    val got = Sketches.thetaSketch(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))
    val ut = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val cut = (1L << 60) / Sketches.ThetaRate
    def smp(u: Long): Long =
      if (hash60Local("tsk:" + u.toString) < cut) 1L else 0L
    val byType = ut.groupBy(_._1)
    val types = byType.keys.toSeq.sorted
    val want = (for {
      (ta, i) <- types.zipWithIndex; tb <- types.drop(i + 1)
      ua = byType(ta).map(_._2).toSet; ub = byType(tb).map(_._2).toSet
      inter = ua & ub
      sa = ua.toSeq.map(smp).sum; sb = ub.toSeq.map(smp).sum
      ism = inter.toSeq.map(smp).sum
      // Mirror the query exactly: the pair relation is an inner
      // self-join on u, so a zero-intersection pair emits NO row.
      if inter.nonEmpty
    } yield (ta, tb, ua.size.toLong, ub.size.toLong, inter.size.toLong,
      (ua | ub).size.toLong, ism * Sketches.ThetaRate,
      (sa + sb - ism) * Sketches.ThetaRate,
      ism * 1000000L / math.max(sa + sb - ism, 1L))).toSeq
    assert(got.toSeq.sortBy(x => (x._1, x._2)) ===
      want.sortBy(x => (x._1, x._2)))
    assert(got.nonEmpty)
  }

  test("theta sketch accuracy at 1M keys, zero storage: estimates " +
      "within 3% of exact on overlapping segments") {
    // Two segments over 1M keys: A = [0, 700k), B = [300k, 1M) —
    // exact intersection 400k, union 1M. At rate 1/8 the sample is
    // ~125k keys, so relative error ~1/sqrt(50k) ≈ 0.5%; 3% is the
    // loose structural bound.
    val n = 1000000L
    val a = spark.range(0L, 700000L).select(lit("A").as("t"),
      col("id").as("u"))
    val b = spark.range(300000L, n).select(lit("B").as("t"),
      col("id").as("u"))
    val r = Sketches.thetaSketchOver(a.unionAll(b)).collect()(0)
    val interEst = r.getAs[Long]("inter_est").toDouble
    val unionEst = r.getAs[Long]("union_est").toDouble
    assert(math.abs(interEst - 400000.0) <= 12000.0,
      s"intersection estimate off: $interEst")
    assert(math.abs(unionEst - 1000000.0) <= 30000.0,
      s"union estimate off: $unionEst")
    assert(r.getAs[Long]("inter_exact") === 400000L)
    info(f"inter est $interEst%.0f vs 400000, union est $unionEst%.0f " +
      f"vs 1000000, jaccard ${r.getAs[Long]("jaccard_est_ppm")} ppm " +
      "(exact 400000 ppm)")
  }

  test("q_pivot: declared values mean ONE scan and no discovery job") {
    val df = Relational.pivotAgg(spark, sfDir)
    val p = plan(df)
    assert("Scan parquet".r.findAllIn(p).size === 1,
      s"pivot must not re-scan to discover values:\n$p")
    assert(df.columns.toSeq === Seq("o_orderpriority",
      "F_cnt", "F_cents", "O_cnt", "O_cents", "P_cnt", "P_cents"))
  }

  test("q_percentile matches a driver-side type-7 quantile") {
    val got = Relational.percentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    val flags = got.keySet
    val byFlag = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def q7(xs: Seq[Double], p: Double): Double = {
      val h = p * (xs.length - 1)
      val lo = h.toInt
      val g = h - lo
      if (g == 0) xs(lo) else xs(lo) + g * (xs(lo + 1) - xs(lo))
    }
    flags.foreach { f =>
      val xs = byFlag(f)
      assert(got(f) === ((q7(xs, 0.25), q7(xs, 0.5), q7(xs, 0.75))),
        s"flag $f")
    }
  }

  test("q_outliers: counts consistent, z threshold honored") {
    val rows = Curation.outliers(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val nOut = r.getAs[Long]("n_out")
      val maxZ = Option(r.get(3)).map(_.asInstanceOf[Double])
      assert(nOut >= 0 && nOut <= r.getAs[Long]("n_docs"))
      // outliers exist exactly when the most extreme z exceeds 2
      assert(maxZ.exists(_ > 2.0) === (nOut > 0),
        s"source=${r.getString(0)} max_z=$maxZ n_out=$nOut")
    }
    val p = plan(Curation.outliers(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"),
      s"per-source moments must broadcast back:\n$p")
  }
}

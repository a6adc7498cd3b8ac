package graft

import graft.operators.Relational

/** Oracle-independent checks for the event-analytics rows
  * (q_event_funnel, q_retention): exact driver-side recomputation
  * from the raw events plus structural invariants.
  */
class EventsSpec extends SparkSuite {

  private lazy val raw: Seq[(Long, String, Long)] =
    Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "unix_micros(ts)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("q_event_funnel: exact driver-side recomputation; monotone counts") {
    val got = Relational.eventFunnel(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byUser = raw.groupBy(_._1)
    def stepMin(prev: Map[Long, Long], typ: String): Map[Long, Long] =
      prev.flatMap { case (u, t0) =>
        val nxt = byUser(u).collect { case (_, t, us) if t == typ && us > t0 => us }
        if (nxt.isEmpty) None else Some(u -> nxt.min)
      }
    val t1 = raw.collect { case (u, "view", us) => (u, us) }
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val t2 = stepMin(t1, "click")
    val t3 = stepMin(t2, "purchase")
    val n1 = math.max(t1.size.toLong, 1L)
    def ppm(n: Long): Long = (2L * 1000000L * n + n1) / (2L * n1)
    val want = Seq(
      ("1_view", t1.size.toLong, ppm(t1.size)),
      ("2_click", t2.size.toLong, ppm(t2.size)),
      ("3_purchase", t3.size.toLong, ppm(t3.size)))
    assert(got.toSeq === want)
    // Funnel counts can only shrink down the steps; step 1 is 1e6 ppm.
    assert(got(0)._2 >= got(1)._2 && got(1)._2 >= got(2)._2)
    assert(got(0)._3 == 1000000L && got(0)._2 > 0)
  }

  test("q_retention: exact driver-side recomputation; week-0 is total") {
    val got = Relational.retention(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    val wkUs = 7L * 86400L * 1000000L
    val act = raw.map { case (u, _, us) => (u, us / wkUs) }.distinct
    val first = act.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val cells = act.map { case (u, wk) => (first(u), wk - first(u)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val want = cells.map { case ((cwk, off), n) =>
      val n0 = cells((cwk, 0L))
      ((cwk, off), (n, (2L * 1000000L * n + n0) / (2L * n0)))
    }.toSeq.sortBy(_._1)
    assert(got.toSeq === want)
    // Each cohort's week-0 cell covers the whole cohort (ppm = 1e6)
    // and later cells never exceed it.
    val z = got.filter(_._1._2 == 0L)
    assert(z.nonEmpty && z.forall(_._2._2 == 1000000L))
    got.foreach { case ((cwk, _), (n, _)) =>
      assert(n <= z.find(_._1._1 == cwk).get._2._1)
    }
  }

  test("q_time_decay: exact driver-side recomputation; decay strictly " +
      "discounts vs the undecayed rollup") {
    val got = Relational.timeDecay(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_type", "unix_micros(ts)",
        "cast(round(value * 1e6) as long)").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ref = ev.map(_._2).max
    val wkUs = 7L * 86400L * 1000000L
    val want = ev.groupBy(_._1).map { case (t, xs) =>
      val ws = xs.map { case (_, us, m) =>
        val w = 1000000L >> math.min((ref - us) / wkUs, 62L).toInt
        (w, BigInt(m) * w)
      }
      (t, xs.length.toLong, ws.map(_._1).sum, (ws.map(_._2).sum / 1000000).toLong)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq === want)
    got.foreach { case (t, n, sw, dv) =>
      // Weights are a true discount: 0 < Σw < n·1e6 (the span covers
      // multiple weeks, so full weight for everything is impossible).
      assert(sw > 0 && sw < n * 1000000L, s"$t: degenerate decay mass $sw")
      assert(dv >= 0)
    }
  }

  test("q_anomaly: integer 3-sigma rule == float z-score recomputation; " +
      "every flagged bucket is above its type's mean") {
    val got = Relational.anomalyHours(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
    // Driver-side float recomputation: per-type population stddev over
    // hourly counts; flag c > mu + 3*sigma. The integer form must
    // select the exact same set (counts are small enough that the
    // float math is exact here; the integer form is what holds up at
    // scale without rounding hazards).
    val hourUs = 3600L * 1000000L
    val buckets = raw.groupBy(t => (t._2, t._3 / hourUs * hourUs / 1000))
      .map { case ((typ, hourMs), xs) => (typ, hourMs, xs.size.toLong) }
      .toSeq
    val want = buckets.groupBy(_._1).flatMap { case (_, bs) =>
      val n = bs.size.toDouble
      val mu = bs.map(_._3).sum / n
      val sigma = math.sqrt(bs.map(b => (b._3 - mu) * (b._3 - mu)).sum / n)
      bs.filter(b => b._3 > mu + 3 * sigma)
    }.toSet
    assert(got.nonEmpty, "fixture must flag at least one bucket")
    assert(got.toSet === want,
      s"integer rule drifted from float z-score: got ${got.toSet} want $want")
    val means = buckets.groupBy(_._1).map { case (t, bs) =>
      t -> bs.map(_._3).sum.toDouble / bs.size }
    for ((typ, _, c) <- got)
      assert(c > means(typ), s"flagged bucket at/below mean for $typ")
  }

  test("q_changepoint: exact driver-side split-scan recomputation; " +
      "argmax is the true max-gap boundary") {
    val got = Relational.changepoint(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // Driver-side recomputation of the whole scan: hourly counts per
    // type, every split's integer mean gap, argmax with the (gap
    // desc, bucket asc) tiebreak.
    val hourUs = 3600L * 1000000L
    val buckets = raw.groupBy(t => (t._2, t._3 / hourUs * hourUs / 1000))
      .map { case ((typ, hourMs), xs) => (typ, hourMs, xs.size.toLong) }
      .toSeq
    val want = buckets.groupBy(_._1).map { case (typ, bs0) =>
      val bs = bs0.sortBy(_._2)
      val total = bs.map(_._3).sum
      val m = bs.size.toLong
      val splits = bs.init.zipWithIndex.map { case ((_, bMs, _), i) =>
        val k = i + 1L
        val s1 = bs.take(i + 1).map(_._3).sum
        val (n2, s2) = (m - k, total - s1)
        val gap = (BigInt(s1) * n2 - BigInt(s2) * k).abs * 1000000 /
          (BigInt(k) * n2)
        (bMs, k, n2, s1, s2, gap.toLong)
      }
      val (bMs, k, n2, s1, s2, gap) =
        splits.maxBy { case (ms, _, _, _, _, g) => (g, -ms) }
      (typ, bMs, k, n2, s1 * 1000000L / k, s2 * 1000000L / n2, gap)
    }.toSet
    assert(got.nonEmpty && got.toSet === want,
      s"split scan drifted: got ${got.toSet}\nwant $want")
    // The reported gap really is mean_after − mean_before (up to the
    // two DIV truncations), and every type with ≥2 buckets reports.
    for ((_, _, _, _, mb, ma, gap) <- got)
      assert((ma - mb).abs - gap <= 2, "gap inconsistent with means")
    assert(got.length ===
      buckets.groupBy(_._1).count { case (_, bs) => bs.size >= 2 })
  }

  test("event rows: plans stay equi-join + hash-agg (no cartesian), " +
      "props pruned from the scan") {
    for ((n, df) <- Seq(
        "funnel" -> Relational.eventFunnel(spark, sfDir),
        "retention" -> Relational.retention(spark, sfDir),
        "changepoint" -> Relational.changepoint(spark, sfDir),
        "anomaly" -> Relational.anomalyHours(spark, sfDir))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$n: cartesian in plan:\n$p")
      assert(!p.contains("props"), s"$n: events.props must be pruned")
      assert(p.contains("HashAggregate"), s"$n: expected hash aggregation")
    }
  }
}

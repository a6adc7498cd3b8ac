package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, TimeSeries}

/** Driver-side recomputations + independent-formulation equalities
  * for the time-series tier (and the grouping-sets marginals). */
class TimeSeriesSpec extends SparkSuite {

  private case class Ev(user: Long, us: Long, id: Long, tpe: String,
    m: Long)

  private lazy val events: Seq[Ev] =
    Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")),
        col("event_id"), col("event_type"),
        round(col("value") * 1e6).cast("long"))
      .collect()
      .map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
      .toSeq

  private val HourUs = 3600000000L

  test("q_gap_fill matches an exact driver-side LOCF recomputation") {
    val got = TimeSeries.gapFill(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    val want = events.groupBy(_.user).toSeq.sortBy(_._1).map {
      case (u, evs) =>
        // last observation per hour by (us, id)
        val byHour = evs.groupBy(e => e.us / HourUs)
          .map { case (h, es) => h -> es.maxBy(e => (e.us, e.id)).m }
        val lo = byHour.keys.min
        val hi = byHour.keys.max
        var lastM = 0L
        var fillSum = 0L
        var nObs = 0L
        (lo to hi).foreach { h =>
          byHour.get(h) match {
            case Some(m) => lastM = m; nObs += 1
            case None =>
          }
          fillSum += lastM
        }
        val nGrid = hi - lo + 1
        (u, nGrid, nObs, nGrid - nObs, fillSum)
    }
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("q_ohlc matches an exact driver-side candle recomputation") {
    val got = TimeSeries.ohlc(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSeq
    val DayUs = 86400000000L
    val want = events.groupBy(e => (e.tpe, e.us / DayUs)).toSeq
      .sortBy(_._1).map { case ((t, d), es) =>
        val open = es.minBy(e => (e.us, e.id)).m
        val close = es.maxBy(e => (e.us, e.id)).m
        (t, d, open, es.map(_.m).max, es.map(_.m).min, close,
          es.size.toLong, es.map(_.m).sum)
      }
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("q_concurrency segmented prefix == naive global sweep " +
      "(driver recomputation)") {
    val IntervalUs = 1800000000L
    val got = TimeSeries.concurrency(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val want = events.groupBy(_.tpe).toSeq.sortBy(_._1).map {
      case (t, es) =>
        val deltas = es.map(e => (e.us, 1L, e.id)) ++
          es.map(e => (e.us + IntervalUs, -1L, e.id))
        var conc = 0L
        var best = Long.MinValue
        var peakT = 0L
        deltas.sortBy(d => (d._1, d._2, d._3)).foreach { case (tt, d, _) =>
          conc += d
          if (conc > best) { best = conc; peakT = tt }
        }
        (t, es.size.toLong, best, peakT)
    }
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("q_grouping_sets == the hand-written UNION ALL of the two " +
      "marginal group-bys") {
    val gs = Relational.groupingSetsAgg(spark, sfDir).collect().toSeq
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(4,2)") -
            col("l_discount").cast("decimal(4,2)"))).as("dp"))
    def marginal(keep: String, gid: Int) = {
      val other = if (keep == "l_returnflag") "l_linestatus"
        else "l_returnflag"
      li.groupBy(col(keep))
        .agg(count(lit(1)).as("n_items"),
          expr("CAST(round(sum(dp) * 100) AS BIGINT)").as("revenue_cents"))
        .withColumn(other, lit(null).cast("string"))
        .withColumn("gid", lit(gid).cast("long"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("n_items"), col("revenue_cents"))
    }
    val want = marginal("l_returnflag", 1)
      .unionByName(marginal("l_linestatus", 2))
      .orderBy(col("gid").asc, col("l_returnflag").asc_nulls_last,
        col("l_linestatus").asc_nulls_last)
      .collect().toSeq
    assert(gs.nonEmpty)
    assert(gs.map(_.toSeq) === want.map(_.toSeq))
  }
}

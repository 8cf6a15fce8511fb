package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the time-series wave. */
class SeriesSpec extends SparkSpec {

  private lazy val dailyTotals: Map[java.sql.Date, Long] =
    Tables.t(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => r.getDate(0) -> r.getLong(1)).toMap

  test("q_autocorr: ACF bounded, pair counts follow the calendar") {
    val rows = q("q_autocorr").collect()
    assert(rows.map(_.getAs[Int]("lag")).toSeq == (1 to 7))
    val nDays = dailyTotals.size
    for (r <- rows) {
      val (lag, nPairs) = (r.getAs[Int]("lag"), r.getAs[Long]("n_pairs"))
      // a contiguous daily calendar yields exactly n-k pairs at lag k
      assert(nPairs <= nDays - lag, s"lag $lag: $nPairs pairs > ${nDays - lag}")
      assert(nPairs > 0, s"lag $lag: no pairs")
      val acf = r.getAs[Double]("acf")
      assert(acf >= -1.0 - 1e-9 && acf <= 1.0 + 1e-9, s"lag $lag: acf $acf")
    }
  }

  test("q_holt_forecast matches a driver-side fold") {
    val daily = Tables.t(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    val expected = daily.groupBy(_._2).flatMap { case (et, rows) =>
      val xs = rows.sortBy(_._1).map(_._3.toDouble)
      if (xs.length < 2) None
      else {
        var l = xs(1); var b = xs(1) - xs(0)
        for (x <- xs.drop(2)) {
          val l2 = 0.5 * x + 0.5 * (l + b)
          b = 0.3 * (l2 - l) + 0.7 * b
          l = l2
        }
        Some(et -> ((xs.length, l, b)))
      }
    }
    val got = q("q_holt_forecast").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == expected.keySet)
    for ((et, (n, l, b)) <- expected) {
      val r = got(et)
      assert(r.getInt(1) == n, s"$et: n")
      // outputs are round(x, 4): allow the half-ulp of that rounding
      def close(a: Double, e: Double, what: String) =
        assert(math.abs(a - e) <= 5e-5 + 1e-9, s"$et $what: $a vs $e")
      close(r.getDouble(2), l, "level")
      close(r.getDouble(3), b, "trend")
      close(r.getDouble(4), l + 1 * b, "f1")
      close(r.getDouble(5), l + 2 * b, "f2")
      close(r.getDouble(6), l + 3 * b, "f3")
    }
  }

  test("q_burst_detect matches a driver-side integer Viterbi") {
    val daily = Tables.t(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    val expected = daily.groupBy(_._2).flatMap { case (et, rows) =>
      val xs = rows.sortBy(_._1).map(r => (r._1, r._3))
      val n = xs.length
      val byC = rows.map(r => (r._3, r._1)).sorted
      val mu0 = byC((n + 1) / 2 - 1)._1
      val mu1 = byC(n - n / 4 - 1)._1
      val k = mu1 - mu0 + 1
      var c0 = math.abs(xs(0)._2 - mu0); var c1 = math.abs(xs(0)._2 - mu1)
      val bp = Array.newBuilder[(Int, Int)]
      for ((_, x) <- xs.drop(1)) {
        val (s0, p0) = if (c0 <= c1 + k) (c0, 0) else (c1 + k, 1)
        val (s1, p1) = if (c1 <= c0 + k) (c1, 1) else (c0 + k, 0)
        bp += ((p0, p1))
        c0 = math.abs(x - mu0) + s0; c1 = math.abs(x - mu1) + s1
      }
      val codes = bp.result()
      var cur = if (c0 <= c1) 0 else 1
      val states = Array.fill(n)(0)
      states(n - 1) = cur
      for (t <- n - 2 to 0 by -1) {
        cur = if (cur == 0) codes(t)._1 else codes(t)._2
        states(t) = cur
      }
      xs.zipWithIndex.toSeq.map { case ((day, x), i) =>
        (et, day) -> ((x, states(i)))
      }
    }
    val got = q("q_burst_detect").collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    assert(got == expected.toMap && got.nonEmpty)
  }

  test("q_theil_sen matches a driver-side pairwise-slope selection") {
    val daily = Tables.t(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    val expected = daily.groupBy(_._2).flatMap { case (et, rows) =>
      val xs = rows.sortBy(_._1).map(_._3).zipWithIndex
        .map { case (c, i) => (i + 1, c) } // t is 1-based
      val slopes = for {
        (i, ci) <- xs; (j, cj) <- xs if j > i
      } yield (((cj - ci).toDouble / (j - i).toDouble), i, j)
      if (slopes.isEmpty) None
      else {
        val sorted = slopes.sortBy(t => (t._1, t._2, t._3))
        val pick = sorted((slopes.length + 1) / 2 - 1)._1
        Some(et -> ((xs.length, slopes.length.toLong, pick)))
      }
    }
    val got = q("q_theil_sen").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    for ((et, (n, m, slope)) <- expected) {
      val r = got(et)
      assert(r.getInt(1) == n && r.getLong(2) == m, s"$et counts")
      assert(math.abs(r.getDouble(3) - slope) <= 5e-7 + 1e-12,
        s"$et slope ${r.getDouble(3)} vs $slope")
    }
  }

  test("q_ewma_smooth: smoother stays inside its input envelope") {
    val rows = q("q_ewma_smooth").collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    for ((t, rs) <- byType) {
      val byDay = rs.map(r => r.getDate(r.fieldIndex("day")).toLocalDate ->
        (r.getAs[Long]("c"), r.getAs[Double]("ewma"))).toMap
      for ((day, (_, ewma)) <- byDay) {
        // the normalized EWMA is a convex combination of the counts in
        // its 14-day support — it can never escape their min/max
        val support = (0 until 14).flatMap(j => byDay.get(day.minusDays(j)))
          .map(_._1)
        assert(ewma >= support.min - 1e-6 && ewma <= support.max + 1e-6,
          s"$t $day: ewma $ewma outside [${support.min}, ${support.max}]")
      }
      // first day of the series: the only support term is itself
      val first = byDay.keys.min[java.time.LocalDate](_ compareTo _)
      assert(math.abs(byDay(first)._2 - byDay(first)._1) < 1e-6,
        s"$t: first-day ewma ${byDay(first)._2} != count ${byDay(first)._1}")
    }
  }

  test("q_cusum_change matches an independent scan computation") {
    val rows = q("q_cusum_change").collect()
    val daily = Tables.t(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getDate(0), r.getLong(2)))
    for (r <- rows) {
      val t = r.getAs[String]("event_type")
      val series = daily.filter(_._1 == t).sortBy(_._2.getTime)
      val n = series.length
      assert(r.getAs[Long]("n_days") == n)
      val sc = series.map(_._3).sum
      var p = 0L
      val sAbs = series.zipWithIndex.map { case ((_, day, c), i) =>
        p += c; (day, math.abs(n * p - (i + 1) * sc))
      }
      val m = sAbs.map(_._2).max
      val expectDay = sAbs.filter(_._2 == m).map(_._1).minBy(_.getTime)
      assert(r.getDate(r.fieldIndex("change_day")) == expectDay,
        s"$t: change_day ${r.getDate(r.fieldIndex("change_day"))} != $expectDay")
      assert(math.abs(r.getAs[Double]("max_cusum") - m.toDouble / n) < 1e-3)
    }
  }

  test("q_stl_decompose: components recompose, seasonal is centered") {
    val rows = q("q_stl_decompose").collect()
    assert(rows.length == dailyTotals.size)
    val withTrend = rows.filter(!_.isNullAt(2))
    assert(withTrend.nonEmpty, "every trend NULL — window never filled")
    for (r <- withTrend) {
      val (c, tr, se, res) = (r.getAs[Long]("c"), r.getAs[Double]("trend"),
        r.getAs[Double]("seasonal"), r.getAs[Double]("residual"))
      // rounding each component to 4dp can misalign the identity by at
      // most 1.5e-4
      assert(math.abs(c - tr - se - res) < 5e-4,
        s"${r.getDate(0)}: $c != $tr + $se + $res")
    }
    // seasonal offsets are recentered: their mean over the distinct
    // weekdays present is ~0
    val perDow = withTrend.map(r =>
      r.getDate(0).toLocalDate.getDayOfWeek -> r.getAs[Double]("seasonal"))
      .groupBy(_._1).map(_._2.head._2)
    assert(math.abs(perDow.sum / perDow.size) < 1e-3,
      s"seasonal not centered: ${perDow.mkString(",")}")
    // edge days (incomplete centered window) carry NULLs by contract
    assert(rows.exists(_.isNullAt(2)), "expected NULL-trend edge days")
  }

  test("q_seasonal_anomaly: z standardized, flags consistent, non-vacuous") {
    val rows = q("q_seasonal_anomaly").collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Boolean]("is_anomaly") ==
        (math.abs(r.getAs[Double]("z")) > 1.5) ||
        math.abs(math.abs(r.getAs[Double]("z")) - 1.5) < 0.01)
    // z-scores are standardized: mean ~0, spread ~1
    val zs = rows.map(_.getAs[Double]("z"))
    assert(math.abs(zs.sum / zs.length) < 0.1)
    val sd = math.sqrt(zs.map(z => z * z).sum / zs.length)
    assert(sd > 0.8 && sd < 1.2, s"z spread $sd not standardized")
  }

  test("q_rolling_wau matches brute-force 7-day distinct unions") {
    val rows = q("q_rolling_wau").collect()
    val du = Tables.t(spark, sf, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1))
    val byDay = du.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    assert(rows.length == byDay.size)
    for (r <- rows) {
      val d = r.getDate(0).toLocalDate
      val expect = (0 until 7).flatMap(j => byDay.get(d.minusDays(j)))
        .foldLeft(Set.empty[Long])(_ ++ _)
      assert(r.getAs[Long]("wau") == expect.size,
        s"$d: wau ${r.getAs[Long]("wau")} != ${expect.size}")
      assert(r.getAs[Long]("dau") == byDay(d).size)
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"))
    }
  }

  test("q_freshness_sla: lags non-negative, volumes conserved, flag consistent") {
    val rows = q("q_freshness_sla").collect()
    val total = Tables.t(spark, sf, "events").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    for (r <- rows) {
      val lag = r.getAs[Long]("lag_min")
      assert(lag >= 0)
      assert(r.getAs[Boolean]("sla_breach") == (lag > 60))
      assert(r.getAs[Long]("last_day") <= r.getAs[Long]("n"))
      assert(r.getAs[Double]("vs_daily_mean") >= 0)
    }
    // at least one type is fresh on this fixture (events run to the horizon)
    assert(rows.exists(!_.getAs[Boolean]("sla_breach")))
  }
}

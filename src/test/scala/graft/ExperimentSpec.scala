package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the experimentation wave. */
class ExperimentSpec extends SparkSpec {

  test("q_ab_ttest: counts partition each type, t finite, Welch df bounded") {
    val rows = q("q_ab_ttest").collect()
    assert(rows.nonEmpty)
    val typeCounts = Tables.t(spark, sf, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows) {
      val (t, na, nb) = (r.getAs[String]("event_type"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(na + nb == typeCounts(t), s"$t: $na+$nb != ${typeCounts(t)}")
      assert(na > 1 && nb > 1, s"$t: degenerate variant size")
      // degenerate cells carry NULL t/df by contract — current fixtures
      // must produce real statistics, so NULL here is a failure
      assert(!r.isNullAt(r.fieldIndex("t_stat")), s"$t: NULL t_stat")
      val tStat = r.getAs[Double]("t_stat")
      assert(!tStat.isNaN && !tStat.isInfinite)
      // Welch df ∈ [min(n)-1, n_a+n_b-2]
      val df = r.getAs[Double]("df")
      assert(df >= math.min(na, nb) - 1 - 0.01 && df <= na + nb - 2 + 0.01,
        s"$t: df $df outside [${math.min(na, nb) - 1}, ${na + nb - 2}]")
    }
  }

  test("q_cuped: adjustment is variance-reducing and mean-preserving-ish") {
    val rows = q("q_cuped").collect()
      .map(r => (r.getAs[String]("variant"), r.getAs[Long]("n_users"),
        r.getAs[Double]("mean_raw"), r.getAs[Double]("mean_adj"),
        r.getAs[Double]("var_reduction")))
    assert(rows.map(_._1).sorted.toSeq == Seq("A", "B"))
    val users = Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum == users)
    // both rows report the same pooled reduction; the covariate (pre-
    // period activity) genuinely correlates with the outcome here, so
    // the reduction must be positive — a vacuous covariate would make
    // this gate meaningless
    assert(rows.map(_._5).distinct.length == 1)
    val red = rows.head._5
    assert(red > 0.0 && red < 1.0, s"variance reduction $red out of range")
    // θ-adjustment recenters around the pooled mean: the GLOBAL mean of
    // adjusted outcomes equals the global raw mean (exactly, pre-round);
    // per-variant means move toward each other but need not be equal
    val (wRaw, wAdj) = rows.foldLeft((0.0, 0.0)) {
      case ((r0, a0), (_, n, mr, ma, _)) => (r0 + mr * n, a0 + ma * n)
    }
    assert(math.abs(wRaw - wAdj) / math.max(1.0, math.abs(wRaw)) < 1e-3,
      s"adjustment shifted the global mean: $wRaw vs $wAdj")
  }

  test("q_trend_ols: r2 bounded, day counts match, slope cross-checked") {
    val rows = q("q_trend_ols").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("slope"),
          r.getAs[Double]("intercept"), r.getAs[Double]("r2")))
      .toMap
    assert(rows.nonEmpty)
    val daily = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date](1), r.getLong(2)))
    val minDay = daily.map(_._2.toLocalDate).min(
      Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    for ((t, (n, slope, intercept, r2)) <- rows) {
      val pts = daily.filter(_._1 == t).map { case (_, d, y) =>
        (java.time.temporal.ChronoUnit.DAYS.between(minDay, d.toLocalDate)
          .toDouble, y.toDouble)
      }
      assert(n == pts.length, s"$t: n=$n but ${pts.length} days")
      assert(r2 >= 0.0 && r2 <= 1.0, s"$t: r2=$r2")
      // recompute OLS independently
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val m = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(slope - m) < 1e-3, s"$t: slope $slope vs $m")
      assert(math.abs(intercept - (sy - m * sx) / n) < 1e-3, s"$t intercept")
    }
  }

  test("q_markov_transitions: rows are a stochastic matrix over real transitions") {
    val rows = q("q_markov_transitions").collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
        r.getAs[Long]("n"), r.getAs[Double]("p")))
    assert(rows.nonEmpty)
    for ((from, ps) <- rows.groupBy(_._1)) {
      val total = ps.map(_._4).sum
      assert(math.abs(total - 1.0) < 1e-2, s"$from rows sum to $total")
    }
    // total transitions = total events - one per user (no predecessor)
    val ev = Tables.t(spark, sf, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == expected,
      s"${rows.map(_._3).sum} transitions != $expected")
  }

  test("q_basket_lift: rule arithmetic is internally consistent") {
    val rows = q("q_basket_lift").collect()
      .map(r => (r.getAs[String]("brand_a"), r.getAs[String]("brand_b"),
        r.getAs[Long]("n_ab"), r.getAs[Double]("support"),
        r.getAs[Double]("confidence"), r.getAs[Double]("lift")))
    assert(rows.nonEmpty)
    for ((a, b, nAb, sup, conf, lift) <- rows) {
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(nAb >= 50)
      assert(sup > 0.0 && sup <= 1.0 && conf > 0.0 && conf <= 1.0)
      // confidence = n_ab/n_a >= n_ab/N = support (n_a <= N)
      assert(conf >= sup - 1e-9, s"($a,$b): conf $conf < support $sup")
      assert(lift > 0.0)
    }
  }

  test("q_kaplan_meier: survival is a proper non-increasing step curve") {
    val rows = q("q_kaplan_meier").collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("d"),
        r.getAs[Long]("n_risk"), r.getAs[Double]("survival")))
      .sortBy(_._1)
    assert(rows.nonEmpty, "no death times — curve is vacuous")
    for ((t, d, nRisk, s) <- rows) {
      assert(d > 0 && d <= nRisk, s"t=$t: d=$d n_risk=$nRisk")
      assert(s >= 0.0 && s < 1.0, s"t=$t: survival $s out of (0,1)")
    }
    // risk sets shrink and survival never increases as t grows
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 < a._3, s"n_risk grew: ${a._3} -> ${b._3} at t=${b._1}")
      assert(b._4 <= a._4 + 1e-9, s"survival rose at t=${b._1}")
    }
    // the curve must reflect real censoring: total deaths < total spells
    val spells = rows.head._3 // n_risk at the smallest death time is ≤ total
    assert(rows.map(_._2).sum <= spells)
  }

  test("q_time_to_convert: rates and delay quantiles are coherent") {
    val r = q("q_time_to_convert").collect().head
    val (nc, nv, cvr) = (r.getAs[Long]("n_clickers"),
      r.getAs[Long]("n_converted"), r.getAs[Double]("cvr"))
    assert(nc > 0 && nv > 0 && nv <= nc)
    assert(math.abs(cvr - nv.toDouble / nc) < 1e-3)
    val (p50, p90) = (r.getAs[Double]("p50_min"), r.getAs[Double]("p90_min"))
    assert(p50 >= 0.0 && p90 >= p50, s"p50=$p50 p90=$p90")
  }

  test("q_gini_value matches an independent Gini computation") {
    val r = q("q_gini_value").collect().head
    val (n, total, gini) = (r.getAs[Long]("n_users"),
      r.getAs[Long]("total_cents"), r.getAs[Double]("gini"))
    assert(gini >= 0.0 && gini < 1.0, s"gini=$gini")
    // recompute from per-user cents, sorted ascending
    val ys = Tables.t(spark, sf, "events")
      .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("c"))
      .groupBy("user_id").agg(sum("c").as("y"))
      .collect().map(_.getLong(1)).sorted
    assert(ys.length == n && ys.sum == total)
    val siy = ys.zipWithIndex.map { case (y, i) => (i + 1).toLong * y }.sum
    val expect = (2.0 * siy - (n + 1) * ys.sum) / (n.toDouble * ys.sum)
    assert(math.abs(gini - expect) < 1e-4, s"$gini vs $expect")
  }

  test("q_srm_check: user counts conserved, flag consistent with chi2") {
    val r = q("q_srm_check").collect().head
    val (na, nb, chi2, flag) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Double]("chi2"), r.getAs[Boolean]("srm_flag"))
    val users = Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(na + nb == users)
    assert(chi2 >= 0.0)
    assert(flag == (chi2 > 3.841) ||
      math.abs(chi2 - 3.841) < 1e-3, s"flag $flag vs chi2 $chi2")
    // a healthy sha-bucket split must NOT trip the guardrail
    assert(!flag, s"deterministic 50/50 split flagged SRM: chi2=$chi2")
  }

  test("q_diff_in_diff: internally consistent, null effect on a sha split") {
    val r = q("q_diff_in_diff").collect().head
    assert(r.getAs[Long]("n") == Tables.t(spark, sf, "events").count())
    val (da, db, did) = (r.getAs[Double]("delta_a"),
      r.getAs[Double]("delta_b"), r.getAs[Double]("did"))
    assert(math.abs(did - (db - da)) < 2e-4, s"did $did != $db - $da")
    val (se, z) = (r.getAs[Double]("se"), r.getAs[Double]("z_stat"))
    assert(se > 0)
    assert(math.abs(z - did / se) < 0.01)
    // a deterministic hash split has no treatment effect — z must not
    // scream significance
    assert(math.abs(z) < 3.5, s"phantom effect: z=$z")
  }

  test("q_power_analysis reproduces the closed-form sample size") {
    val r = q("q_power_analysis").collect().head
    val u = Tables.t(spark, sf, "events")
      .groupBy("user_id").agg(sum("value").as("y"))
    val m = u.agg(count(lit(1)), avg("y"), var_samp(col("y"))).head
    val (n, mu, v) = (m.getLong(0), m.getDouble(1), m.getDouble(2))
    assert(r.getAs[Long]("n_users") == n)
    val delta = mu * 0.05
    val zsum = 1.959964 + 0.841621
    val expect = math.ceil(2 * v * zsum * zsum / (delta * delta)).toLong
    assert(r.getAs[Long]("n_per_arm") == expect)
    assert(math.abs(r.getAs[Double]("mde") - delta) < 1e-3)
    assert(r.getAs[Double]("arms_of_corpus") > 0)
  }

  test("q_jackknife_ci brackets the mean with a plausible standard error") {
    val r = q("q_jackknife_ci").collect().head
    val ev = Tables.t(spark, sf, "events")
    assert(r.getAs[Long]("n") == ev.count())
    val stats = ev.agg(avg("value"), stddev_samp(col("value")), count(lit(1)))
      .head
    val (mean, sd, n) = (stats.getDouble(0), stats.getDouble(1),
      stats.getLong(2))
    assert(math.abs(r.getAs[Double]("mean") - mean) < 1e-3)
    val (lo, hi, se) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"),
      r.getAs[Double]("se"))
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] must bracket $mean")
    assert(se > 0)
    // user-level jackknife SE should sit in the same decade as the naive
    // iid SE (users here aren't strongly clustered)
    val naive = sd / math.sqrt(n.toDouble)
    assert(se > naive / 3 && se < naive * 3, s"se $se vs naive $naive")
  }

  test("q_hhi_concentration matches a driver-side HHI computation") {
    val r = q("q_hhi_concentration").collect().head
    val cells = Tables.t(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
          .cast("long").as("c"))
      .groupBy("l_partkey", "l_suppkey").agg(sum("c").as("rev"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val hhis = cells.groupBy(_._1).map { case (_, sup) =>
      val tot = sup.map(_._3).sum.toDouble
      sup.map(s => math.pow(s._3 / tot, 2)).sum
    }.toSeq
    assert(r.getAs[Long]("n_parts") == hhis.size)
    assert(math.abs(r.getAs[Double]("mean_hhi") - hhis.sum / hhis.size)
      < 1e-3)
    assert(math.abs(r.getAs[Double]("concentrated_share") -
      hhis.count(_ > 0.25).toDouble / hhis.size) < 1e-3)
    // every HHI obeys 1/n_sup <= h <= 1, so the mean does too
    assert(r.getAs[Double]("mean_hhi") >= 1.0 / r.getAs[Double]("mean_suppliers") - 0.05)
    assert(r.getAs[Double]("mean_hhi") <= 1.0)
  }

  test("q_funnel_windowed: steps shrink, the 24h box actually bites") {
    val rows = q("q_funnel_windowed").collect().sortBy(_.getAs[Int]("step"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("signup", "view_24h", "purchase_24h"))
    val users = rows.map(_.getAs[Long]("users"))
    assert(users(0) >= users(1) && users(1) >= users(2),
      s"funnel not monotone: ${users.mkString(",")}")
    for (r <- rows.drop(1) if !r.isNullAt(r.fieldIndex("mean_delay_min")))
      assert(r.getAs[Double]("mean_delay_min") <= 1440.0 + 1e-6,
        "mean step delay exceeds the 24h box")
    // the box must be tighter than the unbounded funnel at step 2
    val unbounded = q("q_funnel").collect()
      .count(r => !r.isNullAt(r.fieldIndex("v_ts")))
    assert(users(1) <= unbounded,
      s"windowed step-2 ${users(1)} exceeds unbounded $unbounded")
  }

  test("q_cohort_ltv: curves monotone, money conserved across cohorts") {
    val rows = q("q_cohort_ltv").collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getDate(0))
    var finalTotal = 0L
    for ((c, rs) <- byCohort) {
      val sorted = rs.sortBy(_.getAs[Long]("age"))
      val cums = sorted.map(_.getAs[Long]("cum_cents"))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b },
        s"cohort $c: LTV curve not monotone")
      assert(sorted.forall(r => math.abs(r.getAs[Double]("ltv_cents") -
        r.getAs[Long]("cum_cents").toDouble / r.getAs[Long]("cohort_users"))
        < 0.51))
      finalTotal += cums.last
    }
    val total = Tables.t(spark, sf, "events")
      .select(round(col("value") * 100, 0).cast("long").as("c"))
      .agg(sum("c")).head.getLong(0)
    assert(finalTotal == total,
      s"cohort-final cum $finalTotal != corpus cents $total")
  }

  test("q_attribution: both methods conserve revenue and conversions") {
    val rows = q("q_attribution").collect()
    val purchases = Tables.t(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(round(col("value") * 100, 0).cast("long").as("c"))
    val (nConv, cents) = (purchases.count(),
      purchases.agg(sum("c")).head.getLong(0))
    assert(rows.map(_.getAs[Long]("conversions")).sum == nConv)
    assert(rows.map(_.getAs[Long]("last_touch_cents")).sum == cents)
    assert(rows.map(_.getAs[Long]("first_touch_cents")).sum == cents)
    assert(math.abs(rows.map(_.getAs[Double]("last_share")).sum - 1) < 0.01)
    assert(math.abs(rows.map(_.getAs[Double]("first_share")).sum - 1) < 0.01)
    // purchase can never be a touch channel
    assert(!rows.exists(_.getAs[String]("channel") == "purchase"))
  }

  test("q_mannwhitney matches an independent pairwise U computation") {
    val rows = q("q_mannwhitney").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("u_stat"))).toMap
    assert(rows.nonEmpty)
    // same deterministic variant assignment as the query
    val ev = Tables.t(spark, sf, "events")
      .withColumn("variant",
        when(graft.ops.Sampling.hashBucket(col("user_id")) < 50, "A")
          .otherwise("B"))
      .select("event_type", "value", "variant").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    for ((t, (na, nb, u)) <- rows) {
      val as = ev.collect { case (`t`, v, "A") => v }
      val bs = ev.collect { case (`t`, v, "B") => v }
      assert(as.length == na && bs.length == nb, s"$t: count mismatch")
      // U_A by brute-force pair counting (wins + half-ties) — the
      // definition the rank formula must reproduce exactly
      val uPairs = (for (a <- as; b <- bs)
        yield if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
      assert(math.abs(u - uPairs) < 0.06, s"$t: U $u vs pairwise $uPairs")
      assert(u >= 0.0 && u <= na.toDouble * nb, s"$t: U out of range")
    }
  }

  test("q_chi_square: dof from the real grid, chi2 non-negative") {
    val r = q("q_chi_square").collect().head
    val (n, dof, chi2) = (r.getAs[Long]("n_events"), r.getAs[Long]("dof"),
      r.getAs[Double]("chi2"))
    val ev = Tables.t(spark, sf, "events")
    assert(n == ev.count())
    val types = ev.select("event_type").distinct().count()
    assert(dof == (types - 1) * (2 - 1))
    assert(chi2 >= -1e-9, s"chi2 $chi2 negative")
  }

  test("q_prop_ztest: counts conserved, z sign follows the rate gap") {
    val r = q("q_prop_ztest").collect().head
    val (na, nb, xa, xb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("x_a"), r.getAs[Long]("x_b"))
    val users = Tables.t(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(na + nb == users)
    assert(xa <= na && xb <= nb)
    val (pa, pb) = (r.getAs[Double]("p_a"), r.getAs[Double]("p_b"))
    assert(pa >= 0 && pa <= 1 && pb >= 0 && pb <= 1)
    if (!r.isNullAt(r.fieldIndex("z_stat"))) {
      val z = r.getAs[Double]("z_stat")
      assert(z.sign == (pa - pb).sign || math.abs(pa - pb) < 1e-4,
        s"z $z vs gap ${pa - pb}")
    }
  }

  test("q_msprt: always-valid p is monotone non-increasing, flags consistent") {
    val rows = q("q_msprt").collect().sortBy(_.getDate(0).toString)
    assert(rows.nonEmpty)
    var prev = Double.MaxValue
    for (r <- rows) {
      val p = r.getDouble(5)
      assert(p > 0 && p <= 1.0 + 1e-9, s"p $p out of range")
      assert(p <= prev + 5e-7, s"p increased: $prev -> $p")
      assert(r.getBoolean(6) == (p < 0.05) ||
        math.abs(p - 0.05) < 1e-6, "flag inconsistent with p")
      prev = p
      // cumulative arms only grow
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
    val ns = rows.map(r => (r.getLong(1), r.getLong(2)))
    assert(ns.sliding(2).forall(w =>
      w.length < 2 || (w(1)._1 >= w(0)._1 && w(1)._2 >= w(0)._2)))
  }

  test("q_bootstrap_ci: interval ordered and inside the data range") {
    val r = q("q_bootstrap_ci").collect().head
    val (n, mean, lo, hi) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n > 0 && lo <= hi)
    val cents = Tables.t(spark, sf, "events")
      .select(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("value") * 100, 0)
        .cast("long")).collect().map(_.getLong(0))
    // replicate means are convex combinations of data values
    assert(lo >= cents.min - 1e-6 && hi <= cents.max + 1e-6)
    assert(mean >= cents.min - 1e-6 && mean <= cents.max + 1e-6)
  }

  test("q_fs_linkage: score is the exact literal weight sum, decisions consistent") {
    val rows = q("q_fs_linkage").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val ws = Seq(
        if (r.getBoolean(2)) 9.8919 else -4.3205,
        if (r.getBoolean(3)) 4.5699 else -4.2630,
        if (r.getBoolean(4)) 2.1699 else -3.0,
        if (r.getBoolean(5)) 4.4919 else -3.2630)
      val score = ws.sum
      assert(math.abs(r.getDouble(6) - score) < 5e-5, s"score ${r.getDouble(6)} vs $score")
      val want = if (score >= 10) "link" else if (score >= 0) "possible" else "nonlink"
      assert(r.getString(7) == want, s"decision ${r.getString(7)} vs $want at $score")
    }
    // the fixture's sequential names guarantee at least one linked pair
    assert(rows.exists(_.getString(7) == "link"))
  }

  test("q_stream_topk: ranks dense 1..k, counts non-increasing within a window") {
    val rows = q("q_stream_topk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    assert(rows.nonEmpty)
    for ((win, grp) <- rows.groupBy(_._1)) {
      val byRank = grp.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1 to byRank.length),
        s"window $win ranks not dense")
      assert(byRank.length <= 3)
      assert(byRank.sliding(2).forall(w =>
        w.length < 2 || w(0)._3 >= w(1)._3), s"window $win counts not sorted")
    }
  }
}

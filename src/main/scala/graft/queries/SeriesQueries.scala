package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.Materialize._

/** TIME-SERIES analytics over the events stream's daily domain: the
  * autocorrelation / smoothing / changepoint / decomposition toolkit a
  * metrics warehouse runs on its daily counters.
  *
  * Reference behavior: the reference's marts materialize daily per-type
  * counters and its dashboards read trends off them (dags/ aggregate to
  * calendar grain before charting); these queries re-express the
  * downstream analysis itself as engine queries.
  *
  * Scale shape shared by all four: ONE corpus scan aggregates events to
  * the (day[, type]) grain — every window, self-join, and lag after that
  * runs on the day-domain table (|days| or |days|×|types| rows), never on
  * the corpus. That is the same aggregate-BEFORE-window contract as
  * q_kaplan_meier: frames stay bounded by the calendar, independent of
  * corpus scale.
  */
object SeriesQueries {

  /** Daily event counts per type: the shared 1-scan base relation. */
  private def daily(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("c"))

  private val dailySql =
    """SELECT CAST(ts AS DATE) AS day, event_type,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // SAMPLE AUTOCORRELATION of the daily total-event series at lags
    // 1..7: the "is there weekly structure" probe. r_k uses the standard
    // ACF form (global mean, lag-0 denominator); lagged pairs come from
    // an equi-join of the day table against itself shifted by k — the
    // |days|×7 frame is calendar-bounded, no window at all.
    QueryDef(
      "q_autocorr",
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1),
             |m AS (SELECT avg(c) AS mu,
             |    sum((c - (SELECT avg(c) FROM d))
             |      * (c - (SELECT avg(c) FROM d))) AS den
             |  FROM d),
             |k AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7))
             |  AS t(lag)),
             |p AS (SELECT k.lag,
             |    CAST(count(*) AS BIGINT) AS n_pairs,
             |    sum((a.c - m.mu) * (b.c - m.mu)) AS num
             |  FROM k JOIN d a ON TRUE
             |    JOIN d b ON b.day = a.day - k.lag, m
             |  GROUP BY 1)
             |SELECT p.lag, p.n_pairs,
             |  CASE WHEN m.den > 0 THEN round(p.num / m.den, 4) END AS acf
             |FROM p, m
             |ORDER BY p.lag""".stripMargin),
      (s, dir) => {
        val d = Tables.t(s, dir, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("c"))
        val m = d.agg(avg("c").as("mu")).collect().head.getDouble(0)
        val den = d.agg(sum((col("c") - m) * (col("c") - m)).as("den"))
        val lags = s.range(1, 8).select(col("id").cast("int").as("lag"))
        d.as("a").crossJoin(broadcast(lags))
          .join(d.as("b"),
            col("b.day") === date_sub(col("a.day"), col("lag")))
          .groupBy("lag")
          .agg(count(lit(1)).as("n_pairs"),
            sum((col("a.c") - m) * (col("b.c") - m)).as("num"))
          .crossJoin(broadcast(den))
          .select(col("lag"), col("n_pairs"),
            when(col("den") > 0, round(col("num") / col("den"), 4))
              .as("acf"))
          .orderBy("lag")
      }),

    // TRUNCATED EWMA (α=0.3, 14-day support) per event type, normalized
    // over the weights of the days that EXIST — series edges and calendar
    // gaps smooth over available history instead of decaying toward a
    // phantom zero. The recursion is unrolled into a days×offsets
    // equi-join (exact, not an approximation, because (1−α)^14 < 0.007 of
    // the mass is re-normalized away): calendar-bounded, shuffle-free
    // after the one daily aggregate.
    QueryDef(
      "q_ewma_smooth",
      Some(s"""WITH d AS ($dailySql),
             |j AS (SELECT * FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7),
             |  (8),(9),(10),(11),(12),(13)) AS t(off)),
             |w AS (SELECT a.event_type, a.day, any_value(a.c) AS c,
             |    sum(b.c * power(0.7, j.off)) AS num,
             |    sum(power(0.7, j.off)) AS den
             |  FROM d a JOIN j ON TRUE
             |    JOIN d b ON b.event_type = a.event_type
             |      AND b.day = a.day - j.off
             |  GROUP BY 1, 2)
             |SELECT event_type, day, c,
             |  round(num / den, 4) AS ewma
             |FROM w""".stripMargin),
      (s, dir) => {
        val d = daily(s, dir)
        val offs = s.range(0, 14).select(col("id").cast("int").as("off"))
        d.as("a").crossJoin(broadcast(offs))
          .join(d.as("b"),
            col("b.event_type") === col("a.event_type") &&
              col("b.day") === date_sub(col("a.day"), col("off")))
          .groupBy(col("a.event_type").as("event_type"),
            col("a.day").as("day"))
          .agg(first(col("a.c")).as("c"),
            sum(col("b.c") * pow(lit(0.7), col("off"))).as("num"),
            sum(pow(lit(0.7), col("off"))).as("den"))
          .select(col("event_type"), col("day"), col("c"),
            round(col("num") / col("den"), 4).as("ewma"))
      }),

    // HOLT LINEAR FORECAST per event type: double exponential smoothing
    // (level + trend, α=0.5, β=0.3) over the daily series, emitting the
    // final state and 1/2/3-step-ahead forecasts — the "where is this
    // counter heading" query a metrics warehouse runs nightly. The
    // recurrence is inherently sequential, but only WITHIN a series: each
    // type's day values collect into one calendar-bounded array (same
    // contract as q_stl_decompose) and the fold runs as a codegen'd
    // `aggregate` lambda — series parallelize across the cluster, state
    // is 2 doubles. Init (l,b)=(x₂, x₂−x₁) is exact integer arithmetic;
    // the recurrence is written with IDENTICAL operation order in both
    // engines (l' = 0.5·x + 0.5·(l+b); b' = 0.3·(l'−l) + 0.7·b, l'
    // inlined), so the doubles agree bitwise before the round(…,4).
    // The oracle replays the fold as a recursive CTE stepping rn.
    QueryDef(
      "q_holt_forecast",
      Some(s"""WITH RECURSIVE d AS ($dailySql),
             |r AS (SELECT event_type, CAST(c AS DOUBLE) AS x,
             |    row_number() OVER (PARTITION BY event_type ORDER BY day)
             |      AS rn
             |  FROM d),
             |nn AS (SELECT event_type, CAST(max(rn) AS INT) AS n
             |  FROM r GROUP BY 1),
             |hw(event_type, t, l, b) AS (
             |  SELECT a.event_type, 2, b2.x, b2.x - a.x
             |  FROM r a JOIN r b2 ON b2.event_type = a.event_type
             |    AND b2.rn = 2
             |  WHERE a.rn = 1
             |  UNION ALL
             |  SELECT hw.event_type, hw.t + 1,
             |    0.5 * r.x + 0.5 * (hw.l + hw.b),
             |    0.3 * ((0.5 * r.x + 0.5 * (hw.l + hw.b)) - hw.l)
             |      + 0.7 * hw.b
             |  FROM hw JOIN r ON r.event_type = hw.event_type
             |    AND r.rn = hw.t + 1)
             |SELECT hw.event_type, nn.n,
             |  round(hw.l, 4) AS level, round(hw.b, 4) AS trend,
             |  round(hw.l + 1 * hw.b, 4) AS f1,
             |  round(hw.l + 2 * hw.b, 4) AS f2,
             |  round(hw.l + 3 * hw.b, 4) AS f3
             |FROM hw JOIN nn ON nn.event_type = hw.event_type
             |  AND hw.t = nn.n""".stripMargin),
      (s, dir) => {
        val arr = daily(s, dir)
          .groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("day"), col("c"))))
            .as("dc"))
          .withColumn("xs",
            transform(col("dc"), e => e.getField("c").cast("double")))
          .filter(size(col("xs")) >= 2)
          .withColumn("n", size(col("xs")))
          .withColumn("rest",
            slice(col("xs"), lit(3), greatest(col("n") - 2, lit(0))))
        val init = struct(
          element_at(col("xs"), 2).as("l"),
          (element_at(col("xs"), 2) - element_at(col("xs"), 1)).as("b"))
        val st = aggregate(col("rest"), init, (acc, x) => {
          val l = acc.getField("l")
          val b = acc.getField("b")
          val l2 = lit(0.5) * x + lit(0.5) * (l + b)
          struct(l2.as("l"),
            (lit(0.3) * (l2 - l) + lit(0.7) * b).as("b"))
        })
        arr.withColumn("st", st)
          .select(col("event_type"), col("n").cast("int").as("n"),
            round(col("st.l"), 4).as("level"),
            round(col("st.b"), 4).as("trend"),
            round(col("st.l") + lit(1) * col("st.b"), 4).as("f1"),
            round(col("st.l") + lit(2) * col("st.b"), 4).as("f2"),
            round(col("st.l") + lit(3) * col("st.b"), 4).as("f3"))
      }),

    // FORECAST BACKTEST (MASE) per event type: hold out the last 7 days,
    // refit Holt (same α/β/init as q_holt_forecast) on the train prefix,
    // forecast the holdout, and score against the SEASONAL-NAIVE
    // baseline (x_{t−7}) — mase = MAE_holt / MAE_naive, the
    // scale-free "is the model better than last week's value" number a
    // metrics warehouse actually acts on. Series with <14 days are
    // skipped: the naive baseline reads x_{m+h−7}, so every one of the
    // 7 holdout days needs a lag-7 predecessor inside the series
    // (n ≥ 14 guarantees m+h−7 ≥ 1 for all h; shorter series would
    // index element_at at 0/negative — an ANSI error or a silent
    // read-from-the-end). Same calendar-bounded array-fold shape as
    // q_holt_forecast; the oracle replays the truncated recursion and
    // joins the naive lag under the same eligibility bound.
    QueryDef(
      "q_forecast_backtest",
      Some(s"""WITH RECURSIVE d AS ($dailySql),
             |r AS (SELECT event_type, CAST(c AS DOUBLE) AS x,
             |    row_number() OVER (PARTITION BY event_type ORDER BY day)
             |      AS rn
             |  FROM d),
             |nn AS (SELECT event_type, CAST(max(rn) AS INT) AS n
             |  FROM r GROUP BY 1),
             |tr AS (SELECT event_type, n, n - 7 AS m FROM nn
             |  WHERE n >= 14),
             |hw(event_type, t, l, b) AS (
             |  SELECT a.event_type, 2, b2.x, b2.x - a.x
             |  FROM r a JOIN r b2 ON b2.event_type = a.event_type
             |    AND b2.rn = 2
             |  JOIN tr ON tr.event_type = a.event_type
             |  WHERE a.rn = 1
             |  UNION ALL
             |  SELECT hw.event_type, hw.t + 1,
             |    0.5 * r.x + 0.5 * (hw.l + hw.b),
             |    0.3 * ((0.5 * r.x + 0.5 * (hw.l + hw.b)) - hw.l)
             |      + 0.7 * hw.b
             |  FROM hw JOIN r ON r.event_type = hw.event_type
             |    AND r.rn = hw.t + 1
             |  JOIN tr ON tr.event_type = hw.event_type
             |  WHERE hw.t + 1 <= tr.m),
             |st AS (SELECT hw.event_type, hw.l, hw.b
             |  FROM hw JOIN tr ON tr.event_type = hw.event_type
             |    AND hw.t = tr.m),
             |ev AS (SELECT r.event_type, r.rn - tr.m AS h, r.x,
             |    p.x AS x_naive
             |  FROM r JOIN tr USING (event_type)
             |  JOIN r p ON p.event_type = r.event_type
             |    AND p.rn = r.rn - 7
             |  WHERE r.rn > tr.m),
             |mm AS (SELECT ev.event_type,
             |    avg(abs(ev.x - (st.l + ev.h * st.b))) AS mae_holt,
             |    avg(abs(ev.x - ev.x_naive)) AS mae_naive
             |  FROM ev JOIN st USING (event_type) GROUP BY 1)
             |SELECT mm.event_type, tr.n,
             |  round(mm.mae_holt, 4) AS mae_holt,
             |  round(mm.mae_naive, 4) AS mae_naive,
             |  CASE WHEN mm.mae_naive > 0
             |    THEN round(mm.mae_holt / mm.mae_naive, 4) END AS mase
             |FROM mm JOIN tr USING (event_type)""".stripMargin),
      (s, dir) => {
        val arr = daily(s, dir)
          .groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("day"), col("c"))))
            .as("dc"))
          .withColumn("xs",
            transform(col("dc"), e => e.getField("c").cast("double")))
          .withColumn("n", size(col("xs")))
          .filter(col("n") >= 14)
          .withColumn("m", col("n") - 7)
        val init = struct(
          element_at(col("xs"), 2).as("l"),
          (element_at(col("xs"), 2) - element_at(col("xs"), 1)).as("b"))
        val st = aggregate(
          slice(col("xs"), lit(3), greatest(col("m") - 2, lit(0))),
          init, (acc, x) => {
            val l = acc.getField("l")
            val b = acc.getField("b")
            val l2 = lit(0.5) * x + lit(0.5) * (l + b)
            struct(l2.as("l"),
              (lit(0.3) * (l2 - l) + lit(0.7) * b).as("b"))
          })
        val withSt = arr.withColumn("st", st)
        def at(off: Int) =
          element_at(col("xs"), (col("m") + off).cast("int"))
        val maeHolt = (1 to 7).map(h =>
          abs(at(h) - (col("st.l") + lit(h) * col("st.b"))))
          .reduce(_ + _) / 7.0
        val maeNaive = (1 to 7).map(h => abs(at(h) - at(h - 7)))
          .reduce(_ + _) / 7.0
        withSt
          .withColumn("mae_holt", maeHolt)
          .withColumn("mae_naive", maeNaive)
          .select(col("event_type"), col("n").cast("int").as("n"),
            round(col("mae_holt"), 4).as("mae_holt"),
            round(col("mae_naive"), 4).as("mae_naive"),
            when(col("mae_naive") > 0,
              round(col("mae_holt") / col("mae_naive"), 4)).as("mase"))
      }),

    // SPLIT-CONFORMAL FORECAST INTERVAL per event type: the
    // distribution-free uncertainty wrapper around q_holt_forecast —
    // fit on days 1..n−14, calibrate the absolute residuals on the next
    // 7 days, take the ⌈(7+1)·0.7⌉ = 6th smallest residual as the 70%
    // conformal radius q (rank SELECTION, no interpolation), then score
    // empirical coverage on the final 7 held-out days: the guarantee
    // says ≥70% of them land within ±q of the (same-fit) forecast, and
    // the gate emits the measured rate. Series with <17 days skip.
    // Same calendar-bounded fold as the Holt family; the oracle replays
    // the truncated recursion, the rank pick, and the coverage count.
    QueryDef(
      "q_conformal_interval",
      Some(s"""WITH RECURSIVE d AS ($dailySql),
             |r AS (SELECT event_type, CAST(c AS DOUBLE) AS x,
             |    row_number() OVER (PARTITION BY event_type ORDER BY day)
             |      AS rn
             |  FROM d),
             |nn AS (SELECT event_type, CAST(max(rn) AS INT) AS n
             |  FROM r GROUP BY 1),
             |tr AS (SELECT event_type, n, n - 14 AS m FROM nn
             |  WHERE n >= 17),
             |hw(event_type, t, l, b) AS (
             |  SELECT a.event_type, 2, b2.x, b2.x - a.x
             |  FROM r a JOIN r b2 ON b2.event_type = a.event_type
             |    AND b2.rn = 2
             |  JOIN tr ON tr.event_type = a.event_type
             |  WHERE a.rn = 1
             |  UNION ALL
             |  SELECT hw.event_type, hw.t + 1,
             |    0.5 * r.x + 0.5 * (hw.l + hw.b),
             |    0.3 * ((0.5 * r.x + 0.5 * (hw.l + hw.b)) - hw.l)
             |      + 0.7 * hw.b
             |  FROM hw JOIN r ON r.event_type = hw.event_type
             |    AND r.rn = hw.t + 1
             |  JOIN tr ON tr.event_type = hw.event_type
             |  WHERE hw.t + 1 <= tr.m),
             |st AS (SELECT hw.event_type, hw.l, hw.b
             |  FROM hw JOIN tr ON tr.event_type = hw.event_type
             |    AND hw.t = tr.m),
             |cal AS (SELECT r.event_type, r.rn - tr.m AS h,
             |    abs(r.x - (st.l + (r.rn - tr.m) * st.b)) AS res
             |  FROM r JOIN tr USING (event_type)
             |  JOIN st USING (event_type)
             |  WHERE r.rn > tr.m AND r.rn <= tr.m + 7),
             |qq AS (SELECT event_type, res AS q FROM (
             |    SELECT event_type, res, row_number() OVER (
             |      PARTITION BY event_type ORDER BY res, h) AS rk
             |    FROM cal) WHERE rk = 6),
             |cov AS (SELECT r.event_type,
             |    CAST(sum(CASE WHEN
             |      abs(r.x - (st.l + (r.rn - tr.m) * st.b)) <= qq.q
             |      THEN 1 ELSE 0 END) AS INT) AS n_covered
             |  FROM r JOIN tr USING (event_type)
             |  JOIN st USING (event_type) JOIN qq USING (event_type)
             |  WHERE r.rn > tr.m + 7
             |  GROUP BY 1)
             |SELECT tr.event_type, tr.n, round(qq.q, 4) AS q_radius,
             |  cov.n_covered, round(cov.n_covered / 7.0, 4) AS coverage
             |FROM tr JOIN qq USING (event_type)
             |JOIN cov USING (event_type)""".stripMargin),
      (s, dir) => {
        val arr = daily(s, dir)
          .groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("day"), col("c"))))
            .as("dc"))
          .withColumn("xs",
            transform(col("dc"), e => e.getField("c").cast("double")))
          .withColumn("n", size(col("xs")))
          .filter(col("n") >= 17)
          .withColumn("m", col("n") - 14)
        val init = struct(
          element_at(col("xs"), 2).as("l"),
          (element_at(col("xs"), 2) - element_at(col("xs"), 1)).as("b"))
        val st = aggregate(
          slice(col("xs"), lit(3), greatest(col("m") - 2, lit(0))),
          init, (acc, x) => {
            val l = acc.getField("l")
            val b = acc.getField("b")
            val l2 = lit(0.5) * x + lit(0.5) * (l + b)
            struct(l2.as("l"),
              (lit(0.3) * (l2 - l) + lit(0.7) * b).as("b"))
          })
        val withSt = arr.withColumn("st", st)
        def at(off: Int) =
          element_at(col("xs"), (col("m") + off).cast("int"))
        def res(h: Int) =
          abs(at(h) - (col("st.l") + lit(h) * col("st.b")))
        val q = element_at(
          array_sort(array((1 to 7).map(res): _*)), 6)
        val withQ = withSt.withColumn("q", q)
        val covered = (8 to 14).map(h =>
          when(res(h) <= col("q"), 1).otherwise(0)).reduce(_ + _)
        withQ.withColumn("n_covered", covered.cast("int"))
          .select(col("event_type"), col("n").cast("int").as("n"),
            round(col("q"), 4).as("q_radius"), col("n_covered"),
            round(col("n_covered") / lit(7.0), 4).as("coverage"))
      }),

    // BURST DETECTION (Kleinberg-style 2-state Viterbi) per event type:
    // decode each daily series into baseline/burst states by exact
    // dynamic programming — emission cost |c−μ_s| against the series'
    // lower-median (μ₀) and 75th-rank (μ₁) levels, switch penalty
    // K = μ₁−μ₀+1, prefer-stay tie-break, final-state argmin with
    // state-0 tie-break. EVERYTHING IS INTEGER ARITHMETIC (costs are
    // sums of |BIGINT| diffs; level selection is rank-based, no
    // interpolation), so the decoded path is bit-identical on any
    // engine — no float HMM fragility. Scale: the recurrence is
    // sequential only WITHIN a series (the q_holt_forecast contract):
    // forward costs + backpointers accumulate in one calendar-bounded
    // array fold, the backtrack is a second fold over the reversed
    // codes, and series parallelize. The oracle replays forward and
    // backtrack as two recursive CTEs.
    QueryDef(
      "q_burst_detect",
      Some(s"""WITH RECURSIVE d AS ($dailySql),
             |r AS (SELECT event_type, day, c, row_number() OVER (
             |    PARTITION BY event_type ORDER BY day) AS t FROM d),
             |nn AS (SELECT event_type, CAST(max(t) AS INT) AS n
             |  FROM r GROUP BY 1),
             |srt AS (SELECT event_type, c, row_number() OVER (
             |    PARTITION BY event_type ORDER BY c, day) AS q FROM d),
             |mu AS (SELECT s0.event_type, s0.c AS mu0, s1.c AS mu1,
             |    s1.c - s0.c + 1 AS k
             |  FROM (SELECT srt.event_type, srt.c FROM srt
             |      JOIN nn USING (event_type)
             |      WHERE srt.q = (nn.n + 1) // 2) s0
             |  JOIN (SELECT srt.event_type, srt.c FROM srt
             |      JOIN nn USING (event_type)
             |      WHERE srt.q = nn.n - nn.n // 4) s1
             |    ON s1.event_type = s0.event_type),
             |fw(event_type, t, c0, c1, p0, p1) AS (
             |  SELECT r.event_type, 1, abs(r.c - mu.mu0),
             |    abs(r.c - mu.mu1), 0, 1
             |  FROM r JOIN mu USING (event_type) WHERE r.t = 1
             |  UNION ALL
             |  SELECT fw.event_type, fw.t + 1,
             |    abs(r.c - mu.mu0) + CASE WHEN fw.c0 <= fw.c1 + mu.k
             |      THEN fw.c0 ELSE fw.c1 + mu.k END,
             |    abs(r.c - mu.mu1) + CASE WHEN fw.c1 <= fw.c0 + mu.k
             |      THEN fw.c1 ELSE fw.c0 + mu.k END,
             |    CASE WHEN fw.c0 <= fw.c1 + mu.k THEN 0 ELSE 1 END,
             |    CASE WHEN fw.c1 <= fw.c0 + mu.k THEN 1 ELSE 0 END
             |  FROM fw JOIN r ON r.event_type = fw.event_type
             |    AND r.t = fw.t + 1
             |  JOIN mu ON mu.event_type = fw.event_type),
             |fin AS (SELECT fw.event_type,
             |    CASE WHEN fw.c0 <= fw.c1 THEN 0 ELSE 1 END AS cur
             |  FROM fw JOIN nn ON nn.event_type = fw.event_type
             |    AND fw.t = nn.n),
             |back(event_type, t, cur) AS (
             |  SELECT fin.event_type, nn.n, fin.cur
             |  FROM fin JOIN nn USING (event_type)
             |  UNION ALL
             |  SELECT back.event_type, back.t - 1,
             |    CASE WHEN back.cur = 0 THEN fw.p0 ELSE fw.p1 END
             |  FROM back JOIN fw ON fw.event_type = back.event_type
             |    AND fw.t = back.t
             |  WHERE back.t > 1)
             |SELECT r.event_type, r.day, r.c, CAST(back.cur AS INT) AS burst
             |FROM r JOIN back ON back.event_type = r.event_type
             |  AND back.t = r.t""".stripMargin),
      (s, dir) => {
        val base = daily(s, dir)
          .groupBy("event_type")
          .agg(array_sort(collect_list(struct(col("day"), col("c"))))
              .as("dc"),
            array_sort(collect_list(struct(col("c"), col("day"))))
              .as("cs"))
          .withColumn("xs", transform(col("dc"), e => e.getField("c")))
          .withColumn("n", size(col("xs")))
          .withColumn("mu0",
            element_at(col("cs"), expr("CAST((n + 1) div 2 AS INT)"))
              .getField("c"))
          .withColumn("mu1",
            element_at(col("cs"), expr("CAST(n - n div 4 AS INT)"))
              .getField("c"))
          .withColumn("k", col("mu1") - col("mu0") + 1)
        val init = struct(
          abs(element_at(col("xs"), 1) - col("mu0")).as("c0"),
          abs(element_at(col("xs"), 1) - col("mu1")).as("c1"),
          array().cast("array<int>").as("bp"))
        val fwd = aggregate(
          slice(col("xs"), lit(2), greatest(col("n") - 1, lit(0))),
          init, (acc, x) => {
            val s0 = when(acc.getField("c0") <=
                acc.getField("c1") + col("k"), acc.getField("c0"))
              .otherwise(acc.getField("c1") + col("k"))
            val s1 = when(acc.getField("c1") <=
                acc.getField("c0") + col("k"), acc.getField("c1"))
              .otherwise(acc.getField("c0") + col("k"))
            val p0 = when(acc.getField("c0") <=
              acc.getField("c1") + col("k"), 0).otherwise(1)
            val p1 = when(acc.getField("c1") <=
              acc.getField("c0") + col("k"), 1).otherwise(0)
            struct((abs(x - col("mu0")) + s0).as("c0"),
              (abs(x - col("mu1")) + s1).as("c1"),
              concat(acc.getField("bp"),
                array((p0 + p1 * 2).cast("int"))).as("bp"))
          })
        val withFwd = base.withColumn("fw", fwd)
          .withColumn("cur0", when(col("fw.c0") <= col("fw.c1"), 0)
            .otherwise(1).cast("int"))
        // backtrack: walk the backpointer codes last→first; state at
        // t−1 is bit0 (if cur=0) or bit1 (if cur=1) of the code at t
        val states = aggregate(reverse(col("fw.bp")),
          struct(col("cur0").as("cur"), array(col("cur0")).as("st")),
          (acc, code) => {
            val pred = when(acc.getField("cur") === 0,
                code.bitwiseAND(lit(1)))
              .otherwise(shiftright(code, 1)).cast("int")
            struct(pred.as("cur"),
              concat(acc.getField("st"), array(pred)).as("st"))
          })
        withFwd.withColumn("burst", reverse(states.getField("st")))
          .select(col("event_type"),
            posexplode(arrays_zip(col("dc"), col("burst"))))
          .select(col("event_type"),
            col("col.dc.day").as("day"), col("col.dc.c").as("c"),
            col("col.burst").cast("int").as("burst"))
      }),

    // THEIL–SEN robust trend per event type: the median of all pairwise
    // slopes (cⱼ−cᵢ)/(j−i) over the daily series — the outlier-immune
    // alternative to q_trend_ols (breakdown point 29% vs 0%). Median is
    // the LOWER middle element (rank ⌈m/2⌉ under slope,i,j order): a
    // pure selection, no interpolation arithmetic, so both engines pick
    // the IDENTICAL pair's slope and float rounding can't diverge on
    // even counts. Scale: pairs are |days|²-bounded per series
    // (calendar² — never corpus²) and every window is partitioned by
    // series; series parallelize.
    QueryDef(
      "q_theil_sen",
      Some(s"""WITH d AS ($dailySql),
             |r AS (SELECT event_type, c, row_number() OVER (
             |    PARTITION BY event_type ORDER BY day) AS t FROM d),
             |pr AS (SELECT a.event_type, a.t AS i, b.t AS j,
             |    (b.c - a.c) / CAST(b.t - a.t AS DOUBLE) AS s
             |  FROM r a JOIN r b ON b.event_type = a.event_type
             |    AND b.t > a.t),
             |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m
             |  FROM pr GROUP BY 1),
             |nd AS (SELECT event_type, CAST(max(t) AS INT) AS n
             |  FROM r GROUP BY 1),
             |rk AS (SELECT pr.*, row_number() OVER (
             |    PARTITION BY pr.event_type
             |    ORDER BY pr.s, pr.i, pr.j) AS rk FROM pr)
             |SELECT rk.event_type, nd.n AS n_days, m.m AS n_pairs,
             |  round(rk.s, 6) AS ts_slope
             |FROM rk JOIN m USING (event_type) JOIN nd USING (event_type)
             |WHERE rk.rk = (m.m + 1) // 2""".stripMargin),
      (s, dir) => {
        val wT = Window.partitionBy("event_type").orderBy("day")
        val r = daily(s, dir)
          .withColumn("t", row_number().over(wT))
          .graftCheckpoint() // self-joined for pairs, scanned for n_days
        val pr = r.as("a").join(r.as("b"),
            col("b.event_type") === col("a.event_type") &&
              col("b.t") > col("a.t"))
          .select(col("a.event_type").as("event_type"),
            col("a.t").as("i"), col("b.t").as("j"),
            ((col("b.c") - col("a.c")) /
              (col("b.t") - col("a.t")).cast("double")).as("s"))
        val m = pr.groupBy("event_type").agg(count(lit(1)).as("m"))
        val nd = r.groupBy("event_type")
          .agg(max("t").cast("int").as("n"))
        val rk = pr.withColumn("rk", row_number().over(
          Window.partitionBy("event_type")
            .orderBy(col("s"), col("i"), col("j"))))
        rk.join(m, "event_type").join(broadcast(nd), "event_type")
          .filter(col("rk") === expr("(m + 1) div 2"))
          .select(col("event_type"), col("n").as("n_days"),
            col("m").as("n_pairs"), round(col("s"), 6).as("ts_slope"))
      }),

    // CUSUM CHANGEPOINT per event type: the day where the cumulative
    // deviation from the series mean peaks — level-shift detection on
    // daily counts. The scan statistic is kept EXACT by scaling out the
    // float mean: S'_t = n·P_t − t·Σc (all BIGINT; P_t = prefix count
    // sum, t = day index), so argmax and its min-day tie-break are
    // deterministic on any engine; only the reported normalized stat
    // max|S|/(σ√n) is float, rounded. Windows: day-domain only.
    // (Overflow bound: n_days·daily_count < 2⁶³ — ~1e15 events/day over
    // a decade — before S' saturates.)
    QueryDef(
      "q_cusum_change",
      Some(s"""WITH d AS ($dailySql),
             |i AS (SELECT event_type, day, c,
             |    CAST(row_number() OVER (PARTITION BY event_type
             |      ORDER BY day) AS BIGINT) AS t,
             |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
             |  FROM d),
             |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(c) AS BIGINT) AS sc,
             |    sqrt(avg(c * c) - avg(c) * avg(c)) AS sd
             |  FROM d GROUP BY 1),
             |sc AS (SELECT i.event_type, i.day,
             |    abs(g.n * i.p - i.t * g.sc) AS s_abs
             |  FROM i JOIN g USING (event_type)),
             |mx AS (SELECT event_type, max(s_abs) AS m
             |  FROM sc GROUP BY 1)
             |SELECT g.event_type, g.n AS n_days,
             |  (SELECT min(day) FROM sc
             |    WHERE sc.event_type = g.event_type AND sc.s_abs = mx.m)
             |    AS change_day,
             |  round(mx.m / CAST(g.n AS DOUBLE), 4) AS max_cusum,
             |  CASE WHEN g.sd > 0
             |    THEN round(mx.m / (CAST(g.n AS DOUBLE) * g.sd * sqrt(g.n)), 4)
             |  END AS scan_stat
             |FROM g JOIN mx USING (event_type)""".stripMargin),
      (s, dir) => {
        val d = daily(s, dir)
        val wT = Window.partitionBy("event_type").orderBy("day")
        val i = d
          .withColumn("t", row_number().over(wT).cast("long"))
          .withColumn("p",
            sum("c").over(wT.rowsBetween(Window.unboundedPreceding, 0)))
        val g = d.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("c").as("sc"),
            sqrt(avg(col("c") * col("c")) - avg("c") * avg("c")).as("sd"))
        val sc = i.join(broadcast(g), "event_type")
          .withColumn("s_abs", abs(col("n") * col("p") - col("t") * col("sc")))
        val mx = sc.groupBy("event_type").agg(max("s_abs").as("m"))
        val change = sc.join(broadcast(mx), "event_type")
          .filter(col("s_abs") === col("m"))
          .groupBy("event_type").agg(min("day").as("change_day"))
        g.join(broadcast(mx), "event_type")
          .join(broadcast(change), "event_type")
          .select(col("event_type"), col("n").as("n_days"),
            col("change_day"),
            round(col("m") / col("n").cast("double"), 4).as("max_cusum"),
            when(col("sd") > 0,
              round(col("m") / (col("n").cast("double") * col("sd")
                * sqrt(col("n"))), 4)).as("scan_stat"))
      }),

    // ADDITIVE SEASONAL DECOMPOSITION of the daily total series:
    // trend = centered 7-day moving average (full windows only),
    // seasonal = per-ISO-weekday mean of the detrended series (recentered
    // to sum to zero over the 7 weekdays), residual = remainder. The
    // classic decompose() shape, all frames day-domain-bounded; edge days
    // (no full trend window) carry NULL trend/seasonal/residual by
    // contract.
    QueryDef(
      "q_stl_decompose",
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1),
             |tr AS (SELECT day, c,
             |    CASE WHEN count(*) OVER w = 7
             |      THEN sum(c) OVER w / 7.0 END AS trend
             |  FROM d
             |  WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 3 DAY
             |    PRECEDING AND INTERVAL 3 DAY FOLLOWING)),
             |sz AS (SELECT isodow(day) AS dow,
             |    avg(c - trend) AS raw_s
             |  FROM tr WHERE trend IS NOT NULL GROUP BY 1),
             |ctr AS (SELECT avg(raw_s) AS adj FROM sz),
             |se AS (SELECT dow, raw_s - adj AS seasonal FROM sz, ctr)
             |SELECT t.day, t.c, round(t.trend, 4) AS trend,
             |  CASE WHEN t.trend IS NOT NULL
             |    THEN round(se.seasonal, 4) END AS seasonal,
             |  CASE WHEN t.trend IS NOT NULL
             |    THEN round(t.c - t.trend - se.seasonal, 4) END AS residual
             |FROM tr t JOIN se ON se.dow = isodow(t.day)""".stripMargin),
      (s, dir) => {
        val d = Tables.t(s, dir, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("c"))
        // day-domain window (|days| rows, aggregated above) — the RANGE
        // frame tolerates calendar gaps identically to the oracle
        val w = Window.orderBy(col("day").cast("timestamp").cast("long"))
          .rangeBetween(-3L * 86400, 3L * 86400)
        val tr = d
          .withColumn("trend",
            when(count(lit(1)).over(w) === 7, sum("c").over(w) / 7.0))
        val sz = tr.filter(col("trend").isNotNull)
          .groupBy((weekday(col("day")) + 1).as("dow"))
          .agg(avg(col("c") - col("trend")).as("raw_s"))
        val ctr = sz.agg(avg("raw_s").as("adj"))
        val se = sz.crossJoin(broadcast(ctr))
          .select(col("dow"), (col("raw_s") - col("adj")).as("seasonal"))
        tr.join(broadcast(se), (weekday(col("day")) + 1) === se("dow"))
          .select(col("day"), col("c"),
            round(col("trend"), 4).as("trend"),
            when(col("trend").isNotNull, round(col("seasonal"), 4))
              .as("seasonal"),
            when(col("trend").isNotNull,
              round(col("c") - col("trend") - col("seasonal"), 4))
              .as("residual"))
      }),

    // SEASONAL ANOMALY DETECTION: the operational use of the STL split —
    // remove trend and weekday seasonality, z-score what remains, and
    // flag days beyond 1.5σ (where this fixture's genuine demand spikes
    // sit; the full z column is emitted so the threshold choice is
    // visible, not buried). Same calendar-bounded frames as
    // q_stl_decompose plus one 1-row moment broadcast.
    QueryDef(
      "q_seasonal_anomaly",
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1),
             |tr AS (SELECT day, c,
             |    CASE WHEN count(*) OVER w = 7
             |      THEN sum(c) OVER w / 7.0 END AS trend
             |  FROM d
             |  WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 3 DAY
             |    PRECEDING AND INTERVAL 3 DAY FOLLOWING)),
             |sz AS (SELECT isodow(day) AS dow, avg(c - trend) AS raw_s
             |  FROM tr WHERE trend IS NOT NULL GROUP BY 1),
             |ctr AS (SELECT avg(raw_s) AS adj FROM sz),
             |se AS (SELECT dow, raw_s - adj AS seasonal FROM sz, ctr),
             |res AS (SELECT t.day, t.c,
             |    t.c - t.trend - se.seasonal AS r
             |  FROM tr t JOIN se ON se.dow = isodow(t.day)
             |  WHERE t.trend IS NOT NULL),
             |st AS (SELECT avg(r) AS m, stddev_pop(r) AS s FROM res)
             |SELECT res.day, res.c, round(res.r, 2) AS residual,
             |  round((res.r - st.m) / st.s, 2) AS z,
             |  abs((res.r - st.m) / st.s) > 1.5 AS is_anomaly
             |FROM res, st""".stripMargin),
      (s, dir) => {
        val d = Tables.t(s, dir, "events")
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("c"))
        val w = Window.orderBy(col("day").cast("timestamp").cast("long"))
          .rangeBetween(-3L * 86400, 3L * 86400)
        val tr = d.withColumn("trend",
          when(count(lit(1)).over(w) === 7, sum("c").over(w) / 7.0))
        val sz = tr.filter(col("trend").isNotNull)
          .groupBy((weekday(col("day")) + 1).as("dow"))
          .agg(avg(col("c") - col("trend")).as("raw_s"))
        val ctr = sz.agg(avg("raw_s").as("adj"))
        val se = sz.crossJoin(broadcast(ctr))
          .select(col("dow"), (col("raw_s") - col("adj")).as("seasonal"))
        val res = tr.filter(col("trend").isNotNull)
          .join(broadcast(se), (weekday(col("day")) + 1) === se("dow"))
          .select(col("day"), col("c"),
            (col("c") - col("trend") - col("seasonal")).as("r"))
        val st = res.agg(avg("r").as("m"), stddev_pop(col("r")).as("s"))
        res.crossJoin(broadcast(st))
          .select(col("day"), col("c"), round(col("r"), 2).as("residual"),
            round((col("r") - col("m")) / col("s"), 2).as("z"),
            (abs((col("r") - col("m")) / col("s")) > 1.5).as("is_anomaly"))
      }),

    // ROLLING 7-DAY ACTIVE USERS (WAU) per calendar day, with DAU and
    // the DAU/WAU stickiness ratio. COUNT(DISTINCT) over a sliding
    // window has no partial-aggregable form, so the scale-safe plan is:
    // dedup to (day, user) once, fan each pair out to the ≤7 target days
    // it supports (a bounded ×7 explode, NOT a per-day rescan), and
    // dedup again per target day — two exact shuffles, both on
    // (day, user)-sized relations, no corpus window. Target days are
    // restricted to the observed calendar so the series has no phantom
    // tail past the horizon.
    QueryDef(
      "q_rolling_wau",
      Some("""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
             |  FROM events),
             |days AS (SELECT DISTINCT day FROM du),
             |fan AS (SELECT DISTINCT du.day + j.off AS day, du.user_id
             |  FROM du JOIN (SELECT * FROM (VALUES (0),(1),(2),(3),(4),
             |    (5),(6)) AS t(off)) j ON TRUE),
             |wau AS (SELECT fan.day, CAST(count(*) AS BIGINT) AS wau
             |  FROM fan JOIN days USING (day) GROUP BY 1),
             |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
             |  FROM du GROUP BY 1)
             |SELECT day, dau.dau, wau.wau,
             |  round(dau.dau / CAST(wau.wau AS DOUBLE), 4) AS stickiness
             |FROM dau JOIN wau USING (day)""".stripMargin),
      (s, dir) => {
        val du = Tables.t(s, dir, "events")
          .select(to_date(col("ts")).as("day"), col("user_id"))
          .distinct()
        val days = du.select("day").distinct()
        val offs = s.range(0, 7).select(col("id").cast("int").as("off"))
        val fan = du.crossJoin(broadcast(offs))
          .select(date_add(col("day"), col("off")).as("day"), col("user_id"))
          .distinct()
        val wau = fan.join(broadcast(days), "day")
          .groupBy("day").agg(count(lit(1)).as("wau"))
        val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
        dau.join(wau, "day")
          .select(col("day"), col("dau"), col("wau"),
            round(col("dau") / col("wau").cast("double"), 4).as("stickiness"))
      }),

    // FEED-FRESHNESS SLA audit per event type: staleness of the latest
    // arrival against the global horizon, last-24h volume against the
    // daily mean — the "is this feed degrading" monitor a warehouse runs
    // before trusting a downstream mart. Two tiny aggregates + broadcast
    // of the 1-row horizon; breach at >60 min staleness.
    QueryDef(
      "q_freshness_sla",
      Some("""WITH hz AS (SELECT max(ts) AS mx,
             |    (max(epoch_us(ts)) - min(epoch_us(ts)))
             |      / 86400000000.0 AS span_days
             |  FROM events),
             |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    max(ts) AS latest,
             |    CAST(sum(CASE WHEN epoch_us(ts) >=
             |        (SELECT max(epoch_us(ts)) FROM events) - 86400000000
             |      THEN 1 ELSE 0 END) AS BIGINT) AS last_day
             |  FROM events GROUP BY 1)
             |SELECT t.event_type, t.n, t.latest,
             |  CAST((epoch_us(hz.mx) - epoch_us(t.latest)) // 60000000
             |    AS BIGINT) AS lag_min,
             |  (epoch_us(hz.mx) - epoch_us(t.latest)) // 60000000 > 60
             |    AS sla_breach,
             |  t.last_day,
             |  round(t.last_day / (t.n / hz.span_days), 4) AS vs_daily_mean
             |FROM t, hz""".stripMargin),
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
        val hz = ev.agg(max("ts").as("mx"),
          ((max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            / 86400000000.0).as("span_days"),
          max(unix_micros(col("ts"))).as("mx_us"))
        val t = ev.crossJoin(broadcast(hz))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), max("ts").as("latest"),
            sum(when(unix_micros(col("ts")) >= col("mx_us") - 86400000000L,
              1).otherwise(0)).cast("long").as("last_day"),
            first("mx").as("mx"), first("span_days").as("span_days"))
        t.select(col("event_type"), col("n"), col("latest"),
          expr("(unix_micros(mx) - unix_micros(latest)) div 60000000")
            .as("lag_min"),
          (expr("(unix_micros(mx) - unix_micros(latest)) div 60000000")
            > 60).as("sla_breach"),
          col("last_day"),
          round(col("last_day") / (col("n") / col("span_days")), 4)
            .as("vs_daily_mean"))
      })
  )
}

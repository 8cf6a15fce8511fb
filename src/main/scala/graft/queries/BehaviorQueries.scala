package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.Temporal
import graft.Materialize._

/** Behavioral / event analytics (round 3): SCD Type-2 historization,
  * cohort retention, ordered funnels, and exact heavy hitters. These are
  * the product-analytics shapes the reference's BI layer computes in
  * BigQuery SQL (LTV / churn / retention DAGs); here each is a
  * shuffle-bounded DataFrame plan. All event timestamps compare as epoch
  * microseconds (`unix_micros` ↔ DuckDB `epoch_us` — see TemporalQueries).
  */
object BehaviorQueries {

  private def ev(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.t(s, dir, "events").select(
      col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))

  val defs: Seq[QueryDef] = Seq(

    // SCD2 over the orders change log: each customer's priority history as
    // [valid_from, valid_to) versions. Window partitioned by custkey — the
    // shuffle key is the dimension key, so the plan is one exchange
    // regardless of history depth.
    QueryDef(
      "q_scd2",
      Some("""WITH ch AS (SELECT o_custkey, o_orderkey, o_orderpriority,
             |    epoch_us(o_orderdate) AS ts_us FROM orders)
             |SELECT o_custkey, o_orderkey, o_orderpriority,
             |  ts_us AS valid_from,
             |  lead(ts_us) OVER (PARTITION BY o_custkey
             |    ORDER BY ts_us, o_orderkey) AS valid_to,
             |  CAST(lead(ts_us) OVER (PARTITION BY o_custkey
             |    ORDER BY ts_us, o_orderkey) IS NULL AS INT) AS is_current
             |FROM ch""".stripMargin),
      (s, dir) => Temporal.scd2(
        Tables.t(s, dir, "orders").select(
          col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us")),
        "o_custkey", "ts_us", "o_orderkey")
        .drop("ts_us")),

    // Cohort retention matrix: users grouped by first-seen day, counted on
    // each later active day. Cohort assignment and the distinct-activity
    // set both shuffle on user_id (one reusable partitioning); the final
    // matrix aggregation is tiny.
    QueryDef(
      "q_cohort_retention",
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day
             |    FROM events),
             |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
             |a AS (SELECT DISTINCT e.user_id, c.cohort_day,
             |    e.day - c.cohort_day AS day_offset
             |  FROM e JOIN c ON e.user_id = c.user_id)
             |SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_users
             |FROM a GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        val days = ev(s, dir)
          .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
        val cohorts = days.groupBy("user_id")
          .agg(min("day").as("cohort_day"))
        days.join(cohorts, "user_id")
          .select(col("user_id"), col("cohort_day"),
            (col("day") - col("cohort_day")).as("day_offset"))
          .distinct()
          .groupBy("cohort_day", "day_offset")
          .agg(count(lit(1)).as("n_users"))
      }),

    // Ordered funnel signup → view → purchase: per user, the first signup,
    // the first view strictly after it, the first purchase strictly after
    // that. Three filtered aggregations joined on user_id (the single
    // shuffle key); left joins keep drop-off users with null later steps.
    QueryDef(
      "q_funnel",
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
             |    FROM events),
             |s AS (SELECT user_id, min(ts_us) AS s_ts FROM e
             |  WHERE event_type = 'signup' GROUP BY 1),
             |v AS (SELECT e.user_id, min(e.ts_us) AS v_ts
             |  FROM e JOIN s ON e.user_id = s.user_id
             |  WHERE e.event_type = 'view' AND e.ts_us > s.s_ts
             |  GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(e.ts_us) AS p_ts
             |  FROM e JOIN v ON e.user_id = v.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts_us > v.v_ts
             |  GROUP BY e.user_id)
             |SELECT s.user_id, s.s_ts, v.v_ts, p.p_ts
             |FROM s LEFT JOIN v ON s.user_id = v.user_id
             |LEFT JOIN p ON s.user_id = p.user_id""".stripMargin),
      (s, dir) => {
        val e = ev(s, dir)
        val step1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts_us").as("s_ts"))
        val step2 = e.filter(col("event_type") === "view")
          .join(step1, "user_id").filter(col("ts_us") > col("s_ts"))
          .groupBy("user_id").agg(min("ts_us").as("v_ts"))
        val step3 = e.filter(col("event_type") === "purchase")
          .join(step2, "user_id").filter(col("ts_us") > col("v_ts"))
          .groupBy("user_id").agg(min("ts_us").as("p_ts"))
        step1.join(step2, Seq("user_id"), "left")
          .join(step3, Seq("user_id"), "left")
      }),

    // Exact heavy hitters: top 25 (user, event_type) pairs by frequency
    // with a total-order tie-break, planned as partial-agg → shuffle →
    // TakeOrderedAndProject (per-partition top-k, never a global sort).
    QueryDef(
      "q_heavy_hitters",
      Some("""SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
             |FROM events GROUP BY 1, 2
             |ORDER BY n DESC, user_id, event_type LIMIT 25""".stripMargin),
      (s, dir) => ev(s, dir)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("user_id"), col("event_type"))
        .limit(25))
,

    // Cumulative distinct users per day in the SCALE-CORRECT form: a
    // naive count(DISTINCT) over an expanding window re-scans history per
    // day; first-seen-day + running sum computes the same curve with two
    // bounded aggregations and a window over the tiny per-day table.
    // new_users/returning split falls out of the same first-seen table.
    QueryDef(
      "q_cumulative_distinct",
      Some("""WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
             |fs AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY 1),
             |daily AS (SELECT day, count(DISTINCT user_id) AS active FROM d GROUP BY 1),
             |news AS (SELECT first_day AS day, count(*) AS new_users
             |  FROM fs GROUP BY 1)
             |SELECT daily.day, CAST(daily.active AS BIGINT) AS active_users,
             |  CAST(coalesce(news.new_users, 0) AS BIGINT) AS new_users,
             |  CAST(daily.active - coalesce(news.new_users, 0) AS BIGINT) AS returning_users,
             |  CAST(sum(coalesce(news.new_users, 0)) OVER (ORDER BY daily.day
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
             |FROM daily LEFT JOIN news USING (day)""".stripMargin),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.orderBy("day")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val d = Tables.t(s, dir, "events")
          .select(col("user_id"), col("ts").cast("date").as("day"))
        val fs = d.groupBy("user_id").agg(min("day").as("first_day"))
        val daily = d.groupBy("day")
          .agg(countDistinct("user_id").as("active_users"))
        val news = fs.groupBy(col("first_day").as("day"))
          .agg(count(lit(1)).as("new_users"))
        // the global window runs over ONE ROW PER DAY — bounded state by
        // construction (the calendar), unlike a window over raw events
        daily.join(news, Seq("day"), "left")
          .select(col("day"), col("active_users"),
            coalesce(col("new_users"), lit(0L)).as("new_users"),
            (col("active_users") - coalesce(col("new_users"), lit(0L)))
              .as("returning_users"),
            sum(coalesce(col("new_users"), lit(0L))).over(w)
              .as("cumulative_users"))
      }),

    // Robust outlier detection via median absolute deviation (the
    // Hampel/MAD rule — immune to the outliers it hunts, unlike z-scores):
    // per event type, median and MAD from Spark's EXACT percentile
    // aggregate (same linear-interpolation definition as DuckDB's
    // quantile_cont/median), then count values beyond 3·1.4826·MAD.
    QueryDef(
      "q_mad_outliers",
      Some("""WITH med AS (SELECT event_type, median(value) AS med
             |  FROM events GROUP BY 1),
             |mad AS (SELECT e.event_type, med.med,
             |    median(abs(e.value - med.med)) AS mad
             |  FROM events e JOIN med USING (event_type)
             |  GROUP BY 1, 2)
             |SELECT e.event_type, round(mad.med, 4) AS med,
             |  round(mad.mad, 4) AS mad,
             |  CAST(sum(CASE WHEN abs(e.value - mad.med)
             |      > 3 * 1.4826::DOUBLE * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_outliers
             |FROM events e JOIN mad USING (event_type)
             |GROUP BY 1, 2, 3""".stripMargin),
      (s, dir) => {
        val e = Tables.t(s, dir, "events").select("event_type", "value")
        val med = e.groupBy("event_type")
          .agg(percentile(col("value"), lit(0.5)).as("med"))
        val mad = e.join(med, Seq("event_type"))
          .groupBy(col("event_type"), col("med"))
          .agg(percentile(abs(col("value") - col("med")), lit(0.5)).as("mad"))
        e.join(mad, Seq("event_type"))
          .groupBy(col("event_type"), col("med"), col("mad"))
          .agg(sum(when(abs(col("value") - col("med"))
              > lit(3) * lit(1.4826) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
          .select(col("event_type"), round(col("med"), 4).as("med"),
            round(col("mad"), 4).as("mad"), col("n_outliers"))
      }),

    // TIME-BOXED FUNNEL: signup → view → purchase where each step must
    // land within 24h of the previous one — the product-analytics
    // semantics (q_funnel is the unbounded variant; real funnels expire).
    // Same chained min-aggregate joins, each bounded by the window
    // predicate; output is the 3-row step report with conversion rates
    // and mean step delay. One scan + per-step co-partitioned joins.
    QueryDef(
      "q_funnel_windowed",
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
             |    FROM events),
             |s AS (SELECT user_id, min(ts_us) AS s_ts FROM e
             |  WHERE event_type = 'signup' GROUP BY 1),
             |v AS (SELECT e.user_id, min(e.ts_us) AS v_ts
             |  FROM e JOIN s ON e.user_id = s.user_id
             |  WHERE e.event_type = 'view' AND e.ts_us > s.s_ts
             |    AND e.ts_us <= s.s_ts + 86400000000
             |  GROUP BY e.user_id),
             |p AS (SELECT e.user_id, min(e.ts_us) AS p_ts
             |  FROM e JOIN v ON e.user_id = v.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts_us > v.v_ts
             |    AND e.ts_us <= v.v_ts + 86400000000
             |  GROUP BY e.user_id),
             |d AS (SELECT s.user_id, s.s_ts, v.v_ts, p.p_ts
             |  FROM s LEFT JOIN v USING (user_id)
             |  LEFT JOIN p USING (user_id)),
             |r AS (
             |  SELECT 1 AS step, 'signup' AS stage,
             |      CAST(count(*) AS BIGINT) AS users,
             |      CAST(NULL AS DOUBLE) AS mean_delay_min
             |    FROM d
             |  UNION ALL
             |  SELECT 2, 'view_24h', CAST(count(v_ts) AS BIGINT),
             |      round(avg((v_ts - s_ts) / 60000000.0), 2)
             |    FROM d
             |  UNION ALL
             |  SELECT 3, 'purchase_24h', CAST(count(p_ts) AS BIGINT),
             |      round(avg((p_ts - v_ts) / 60000000.0), 2)
             |    FROM d)
             |SELECT step, stage, users,
             |  round(users / CAST((SELECT max(users) FROM r) AS DOUBLE), 4)
             |    AS cvr_from_start,
             |  mean_delay_min
             |FROM r""".stripMargin),
      (s, dir) => {
        val e = ev(s, dir)
        val step1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts_us").as("s_ts"))
        val step2 = e.filter(col("event_type") === "view")
          .join(step1, "user_id")
          .filter(col("ts_us") > col("s_ts") &&
            col("ts_us") <= col("s_ts") + 86400000000L)
          .groupBy("user_id").agg(min("ts_us").as("v_ts"))
        val step3 = e.filter(col("event_type") === "purchase")
          .join(step2, "user_id")
          .filter(col("ts_us") > col("v_ts") &&
            col("ts_us") <= col("v_ts") + 86400000000L)
          .groupBy("user_id").agg(min("ts_us").as("p_ts"))
        val d = step1.join(step2, Seq("user_id"), "left_outer")
          .join(step3, Seq("user_id"), "left_outer")
          .graftCheckpoint() // three step aggregates read it
        val r1 = d.agg(count(lit(1)).as("users"))
          .select(lit(1).as("step"), lit("signup").as("stage"),
            col("users"), lit(null).cast("double").as("mean_delay_min"))
        val r2 = d.agg(count(col("v_ts")).as("users"),
          round(avg((col("v_ts") - col("s_ts")) / 60000000.0), 2).as("md"))
          .select(lit(2).as("step"), lit("view_24h").as("stage"),
            col("users"), col("md").as("mean_delay_min"))
        val r3 = d.agg(count(col("p_ts")).as("users"),
          round(avg((col("p_ts") - col("v_ts")) / 60000000.0), 2).as("md"))
          .select(lit(3).as("step"), lit("purchase_24h").as("stage"),
            col("users"), col("md").as("mean_delay_min"))
        val r = r1.unionByName(r2).unionByName(r3)
        val top = r.agg(max("users").as("mx"))
        r.crossJoin(broadcast(top))
          .select(col("step"), col("stage"), col("users"),
            round(col("users") / col("mx").cast("double"), 4)
              .as("cvr_from_start"),
            col("mean_delay_min"))
      }),

    // ABC REVENUE CLASSIFICATION of parts (the 80/95 Pareto carve every
    // inventory mart runs): per-part revenue in EXACT integer cents,
    // cumulative revenue via ops.PrefixSum's range-partitioned running
    // total over the (revenue desc, partkey) order — no global window —
    // and pure-integer threshold compares (cum·100 ≤ total·80), so the
    // class boundary can never flip on a float ulp. Output is the
    // 3-class summary; the per-part detail is the same relation un-
    // aggregated.
    QueryDef(
      "q_abc_parts",
      Some("""WITH r AS (SELECT l_partkey,
             |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
             |      * 100, 0) AS BIGINT)) AS BIGINT) AS rev
             |  FROM lineitem GROUP BY 1),
             |t AS (SELECT CAST(sum(rev) AS BIGINT) AS total FROM r),
             |c AS (SELECT l_partkey, rev,
             |    CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM r),
             |k AS (SELECT l_partkey, rev,
             |    CASE WHEN cum * 100 <= total * 80 THEN 'A'
             |      WHEN cum * 100 <= total * 95 THEN 'B'
             |      ELSE 'C' END AS abc_class
             |  FROM c, t)
             |SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
             |  CAST(sum(rev) AS BIGINT) AS revenue_cents,
             |  round(sum(rev) / (SELECT CAST(total AS DOUBLE) FROM t), 4)
             |    AS share
             |FROM k GROUP BY 1""".stripMargin),
      (s, dir) => {
        val r = Tables.t(s, dir, "lineitem")
          .select(col("l_partkey"),
            round(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * 100, 0).cast("long").as("cents"))
          .groupBy("l_partkey").agg(sum("cents").as("rev"))
          .withColumn("neg", -col("rev"))
        val cum = graft.ops.PrefixSum.runningTotal(
          r, Seq(col("neg"), col("l_partkey")), col("rev"), "cum")
          .graftCheckpoint() // consumed twice: total derivation + carve
        // the grand total IS the last inclusive prefix — no second
        // lineitem scan
        val t = cum.agg(max("cum").as("total"))
        val k = cum.crossJoin(broadcast(t))
          .withColumn("abc_class",
            when(col("cum") * 100 <= col("total") * 80, "A")
              .when(col("cum") * 100 <= col("total") * 95, "B")
              .otherwise("C"))
        k.groupBy("abc_class")
          .agg(count(lit(1)).as("n_parts"), sum("rev").as("revenue_cents"),
            round(sum("rev") / first(col("total")).cast("double"), 4)
              .as("share"))
      }),

    // SUPPLIER-CONCENTRATION HHI per part: Herfindahl–Hirschman index of
    // supplier revenue shares within each part's market — the antitrust-
    // style concentration screen (HHI > 0.25 ≈ "highly concentrated"),
    // the per-market complement of q_gini_value's global inequality.
    // Exact integer cents; shares and Σshare² are the only floats. One
    // scan → per-(part, supplier) cells → part-bounded frames; reported
    // as the corpus distribution (mean/median HHI, concentrated share).
    QueryDef(
      "q_hhi_concentration",
      Some("""WITH cell AS (SELECT l_partkey, l_suppkey,
             |    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
             |      * 100, 0) AS BIGINT)) AS BIGINT) AS rev
             |  FROM lineitem GROUP BY 1, 2),
             |mkt AS (SELECT l_partkey, CAST(sum(rev) AS BIGINT) AS tot,
             |    CAST(count(*) AS BIGINT) AS n_sup
             |  FROM cell GROUP BY 1),
             |hhi AS (SELECT cell.l_partkey, any_value(mkt.n_sup) AS n_sup,
             |    sum((cell.rev / CAST(mkt.tot AS DOUBLE))
             |      * (cell.rev / CAST(mkt.tot AS DOUBLE))) AS h
             |  FROM cell JOIN mkt USING (l_partkey)
             |  GROUP BY cell.l_partkey)
             |SELECT CAST(count(*) AS BIGINT) AS n_parts,
             |  round(avg(h), 4) AS mean_hhi,
             |  round(quantile_cont(h, 0.5), 4) AS p50_hhi,
             |  round(avg(CASE WHEN h > 0.25 THEN 1.0 ELSE 0.0 END), 4)
             |    AS concentrated_share,
             |  round(avg(n_sup), 2) AS mean_suppliers
             |FROM hhi""".stripMargin),
      (s, dir) => {
        val cell = Tables.t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            round(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * 100, 0).cast("long").as("cents"))
          .groupBy("l_partkey", "l_suppkey").agg(sum("cents").as("rev"))
        val mkt = cell.groupBy("l_partkey")
          .agg(sum("rev").as("tot"), count(lit(1)).as("n_sup"))
        val share = col("rev") / col("tot").cast("double")
        val hhi = cell.join(mkt, "l_partkey")
          .groupBy("l_partkey")
          .agg(first("n_sup").as("n_sup"), sum(share * share).as("h"))
          .graftCheckpoint() // consumed by moments + the exact median
        val med = graft.ops.Quantiles.groupQuantiles(
            hhi.withColumn("g", lit(1)), "g", "h", Seq("p50" -> 0.5))
          .select(round(col("p50"), 4).as("p50_hhi"))
        hhi.agg(count(lit(1)).as("n_parts"),
            round(avg("h"), 4).as("mean_hhi"),
            round(avg(when(col("h") > 0.25, 1.0).otherwise(0.0)), 4)
              .as("concentrated_share"),
            round(avg("n_sup"), 2).as("mean_suppliers"))
          .crossJoin(broadcast(med))
          .select(col("n_parts"), col("mean_hhi"), col("p50_hhi"),
            col("concentrated_share"), col("mean_suppliers"))
      }),

    // RFM SEGMENTATION: per-user Recency (days since last event),
    // Frequency (events), Monetary (value cents, exact), each scored 1–3
    // against its own tercile boundaries (ops.Quantiles — quantile_cont
    // parity with the oracle), concatenated into the classic 27-cell
    // segment grid with per-segment profiles. Terciles come from the
    // |users| table, aggregated before any quantile work.
    QueryDef(
      "q_rfm_segments",
      Some("""WITH hz AS (SELECT max(epoch_us(ts)) AS mx FROM events),
             |u AS (SELECT user_id,
             |    CAST((hz.mx - max(epoch_us(ts))) // 86400000000 AS BIGINT)
             |      AS r_days,
             |    CAST(count(*) AS BIGINT) AS f,
             |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             |      AS m
             |  FROM events, hz GROUP BY user_id, hz.mx),
             |q AS (SELECT
             |    quantile_cont(r_days, 1.0/3) AS r1,
             |    quantile_cont(r_days, 2.0/3) AS r2,
             |    quantile_cont(f, 1.0/3) AS f1, quantile_cont(f, 2.0/3) AS f2,
             |    quantile_cont(m, 1.0/3) AS m1, quantile_cont(m, 2.0/3) AS m2
             |  FROM u),
             |sc AS (SELECT user_id, r_days, f, m,
             |    CASE WHEN r_days <= q.r1 THEN 3
             |      WHEN r_days <= q.r2 THEN 2 ELSE 1 END AS rs,
             |    CASE WHEN f <= q.f1 THEN 1
             |      WHEN f <= q.f2 THEN 2 ELSE 3 END AS fs,
             |    CASE WHEN m <= q.m1 THEN 1
             |      WHEN m <= q.m2 THEN 2 ELSE 3 END AS ms
             |  FROM u, q)
             |SELECT rs || '' || fs || '' || ms AS segment,
             |  CAST(count(*) AS BIGINT) AS n_users,
             |  round(avg(r_days), 2) AS avg_r_days,
             |  round(avg(f), 2) AS avg_f,
             |  round(avg(m), 2) AS avg_m_cents
             |FROM sc GROUP BY 1""".stripMargin),
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
        val hz = ev.agg(max(unix_micros(col("ts"))).as("mx"))
        val u = ev.crossJoin(broadcast(hz))
          .groupBy("user_id")
          .agg(
            ((first("mx") - max(unix_micros(col("ts")))) / lit(86400000000L))
              .cast("long").as("r_days"),
            count(lit(1)).as("f"),
            sum(round(col("value") * 100, 0).cast("long")).as("m"))
          .graftCheckpoint() // reused by 3 quantile passes + the scoring
        def terciles(c: String) = graft.ops.Quantiles
          .groupQuantiles(u.withColumn("g", lit(1)), "g", c,
            Seq(s"${c}_q1" -> 1.0 / 3, s"${c}_q2" -> 2.0 / 3))
          .drop("g", "n")
        val q = terciles("r_days").crossJoin(terciles("f"))
          .crossJoin(terciles("m"))
        val sc = u.crossJoin(broadcast(q))
          .withColumn("rs", when(col("r_days") <= col("r_days_q1"), 3)
            .when(col("r_days") <= col("r_days_q2"), 2).otherwise(1))
          .withColumn("fs", when(col("f") <= col("f_q1"), 1)
            .when(col("f") <= col("f_q2"), 2).otherwise(3))
          .withColumn("ms", when(col("m") <= col("m_q1"), 1)
            .when(col("m") <= col("m_q2"), 2).otherwise(3))
        sc.groupBy(concat(col("rs"), col("fs"), col("ms")).as("segment"))
          .agg(count(lit(1)).as("n_users"),
            round(avg("r_days"), 2).as("avg_r_days"),
            round(avg("f"), 2).as("avg_f"),
            round(avg("m"), 2).as("avg_m_cents"))
      }),

    // COHORT LTV CURVES: users grouped by first-seen day, cumulative
    // revenue (exact cents) per cohort over account age in days, plus
    // the per-user LTV — the payback chart under every retention deck.
    // Per-user day revenue aggregates FIRST; the cumulative window is
    // partitioned by cohort over ≤|calendar| age rows.
    QueryDef(
      "q_cohort_ltv",
      Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
             |  FROM events GROUP BY 1),
             |cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
             |  FROM f GROUP BY 1),
             |r AS (SELECT f.cohort,
             |    CAST(CAST(e.ts AS DATE) - f.cohort AS BIGINT) AS age,
             |    CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT))
             |      AS BIGINT) AS cents
             |  FROM events e JOIN f ON f.user_id = e.user_id
             |  GROUP BY 1, 2),
             |c AS (SELECT cohort, age, cents,
             |    CAST(sum(cents) OVER (PARTITION BY cohort ORDER BY age
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
             |  FROM r)
             |SELECT c.cohort, c.age, cs.cohort_users, c.cum_cents,
             |  round(c.cum_cents / CAST(cs.cohort_users AS DOUBLE), 2)
             |    AS ltv_cents
             |FROM c JOIN cs USING (cohort)""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.t(s, dir, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"),
            round(col("value") * 100, 0).cast("long").as("cents"))
        val f = ev.groupBy("user_id").agg(min("day").as("cohort"))
        val cs = f.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
        val r = ev.join(f, "user_id")
          .groupBy(col("cohort"),
            datediff(col("day"), col("cohort")).cast("long").as("age"))
          .agg(sum("cents").as("cents"))
        // |calendar|-bounded frame per cohort, aggregated above
        val w = Window.partitionBy("cohort").orderBy("age")
          .rowsBetween(Window.unboundedPreceding, 0)
        r.withColumn("cum_cents", sum("cents").over(w))
          .join(broadcast(cs), "cohort")
          .select(col("cohort"), col("age"), col("cohort_users"),
            col("cum_cents"),
            round(col("cum_cents") / col("cohort_users").cast("double"), 2)
              .as("ltv_cents"))
      }),

    // REVENUE ATTRIBUTION per channel (event_type of the touch):
    // last-touch rides ops/Temporal.asofJoin (latest touch at-or-before
    // each purchase, one shuffle); first-touch is each user's earliest
    // touch via a min-struct aggregate (no window). Purchases with no
    // prior touch attribute to 'direct'. Cents exact; shares the only
    // floats.
    QueryDef(
      "q_attribution",
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |    event_type, CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |conv AS (SELECT event_id, user_id, ts_us, cents FROM e
             |  WHERE event_type = 'purchase'),
             |tch AS (SELECT user_id, ts_us, event_type AS channel,
             |    row_number() OVER (PARTITION BY user_id, ts_us
             |      ORDER BY event_id DESC) AS rn
             |  FROM e WHERE event_type <> 'purchase'),
             |t1 AS (SELECT user_id, ts_us, channel FROM tch WHERE rn = 1),
             |lt AS (SELECT conv.event_id, conv.cents,
             |    coalesce(t1.channel, 'direct') AS channel
             |  FROM conv ASOF LEFT JOIN t1
             |    ON conv.user_id = t1.user_id AND conv.ts_us >= t1.ts_us),
             |ft0 AS (SELECT user_id, channel,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts_us, channel) AS rn
             |  FROM t1),
             |ft AS (SELECT user_id, channel FROM ft0 WHERE rn = 1),
             |fa AS (SELECT coalesce(ft.channel, 'direct') AS channel,
             |    CAST(sum(conv.cents) AS BIGINT) AS first_cents
             |  FROM conv LEFT JOIN ft USING (user_id) GROUP BY 1),
             |la AS (SELECT channel, CAST(count(*) AS BIGINT) AS conversions,
             |    CAST(sum(cents) AS BIGINT) AS last_cents
             |  FROM lt GROUP BY 1),
             |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS t FROM conv)
             |SELECT coalesce(la.channel, fa.channel) AS channel,
             |  coalesce(la.conversions, 0) AS conversions,
             |  coalesce(la.last_cents, 0) AS last_touch_cents,
             |  round(coalesce(la.last_cents, 0) / CAST(tot.t AS DOUBLE), 4)
             |    AS last_share,
             |  coalesce(fa.first_cents, 0) AS first_touch_cents,
             |  round(coalesce(fa.first_cents, 0) / CAST(tot.t AS DOUBLE), 4)
             |    AS first_share
             |FROM la FULL OUTER JOIN fa USING (channel), tot""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("event_type"),
            round(col("value") * 100, 0).cast("long").as("cents"))
        val conv = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts_us", "cents")
        val t1 = e.filter(col("event_type") =!= "purchase")
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id", "ts_us")
              .orderBy(col("event_id").desc)))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("ts_us"), col("event_type").as("channel"))
        val lt = Temporal.asofJoin(conv, t1, "user_id", "ts_us", "ts_us")
          .select(col("cents"), coalesce(col("channel"), lit("direct"))
            .as("channel"))
        val la = lt.groupBy("channel")
          .agg(count(lit(1)).as("conversions"), sum("cents").as("last_cents"))
        val ft = t1
          .groupBy("user_id")
          .agg(min(struct(col("ts_us"), col("channel"))).as("first"))
          .select(col("user_id"), col("first.channel").as("channel"))
        val fa = conv.join(ft, Seq("user_id"), "left_outer")
          .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
          .agg(sum("cents").as("first_cents"))
        val tot = conv.agg(sum("cents").as("t"))
        la.join(fa, Seq("channel"), "full_outer")
          .crossJoin(broadcast(tot))
          .select(col("channel"),
            coalesce(col("conversions"), lit(0L)).as("conversions"),
            coalesce(col("last_cents"), lit(0L)).as("last_touch_cents"),
            round(coalesce(col("last_cents"), lit(0L))
              / col("t").cast("double"), 4).as("last_share"),
            coalesce(col("first_cents"), lit(0L)).as("first_touch_cents"),
            round(coalesce(col("first_cents"), lit(0L))
              / col("t").cast("double"), 4).as("first_share"))
      })
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.Temporal

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
      })
  )
}

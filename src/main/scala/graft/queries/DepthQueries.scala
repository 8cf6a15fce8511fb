package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Round-6 depth: approximate aggregates (the sketches that size a 100 TB
  * job before running it) and correlated-subquery decorrelation coverage.
  *
  * Approximate aggregates can't be hash-gated directly — HLL/KLL sketch
  * internals differ across engines — so each query gates a DETERMINISTIC
  * error-bound assertion instead: the Spark side emits the exact value
  * plus a boolean `approx_ok` (|approx − exact| within the documented
  * bound), and the oracle emits the same exact value plus literal TRUE.
  * Spark's sketches are hash-based and deterministic for fixed input, so
  * the boolean is reproducible, and a regression that degrades the sketch
  * past its bound turns the row red. ApproxSpec additionally measures the
  * observed error and documents the margin.
  */
object DepthQueries {

  val defs: Seq[QueryDef] = Seq(

    // approx_count_distinct (HyperLogLog++, rsd 2%) vs exact. At 100 TB
    // this is how a dedup/vocab job is sized before it runs: one pass, a
    // few KB of state per group, no exact-distinct shuffle. Bound: 5%
    // relative (2.5× the configured rsd).
    QueryDef(
      "q_approx_distinct",
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |  TRUE AS approx_ok
             |FROM events GROUP BY event_type""".stripMargin),
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), rsd = 0.02).as("__approx"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("__approx") - col("exact_users"))
            <= col("exact_users") * 0.05).as("approx_ok"))),

    // approx_percentile (KLL-style quantile summary, accuracy 10000) vs
    // exact interpolated percentile. Spark's exact `percentile` and
    // DuckDB's `quantile_cont` share the (1−f)·a[k] + f·a[k+1] definition,
    // so the exact values hash-gate bit-identically; the sketch result is
    // gated within 5% of exact + 1.0 absolute slack (rank error ≤ n/10000
    // at this accuracy, far inside the bound on the fixture's value
    // distribution).
    QueryDef(
      "q_approx_quantiles",
      Some("""SELECT event_type,
             |  round(quantile_cont(value, 0.5), 4) AS p50_exact,
             |  round(quantile_cont(value, 0.95), 4) AS p95_exact,
             |  TRUE AS approx_ok
             |FROM events GROUP BY event_type""".stripMargin),
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy("event_type")
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50_exact"),
          round(expr("percentile(value, 0.95)"), 4).as("p95_exact"),
          expr("approx_percentile(value, 0.5, 10000)").as("__a50"),
          expr("approx_percentile(value, 0.95, 10000)").as("__a95"))
        .select(col("event_type"), col("p50_exact"), col("p95_exact"),
          (abs(col("__a50") - col("p50_exact")) <= abs(col("p50_exact")) * 0.05 + 1.0 &&
            abs(col("__a95") - col("p95_exact")) <= abs(col("p95_exact")) * 0.05 + 1.0)
            .as("approx_ok"))),

    // NATIVE session_window sessionization (vs q_sessionize's
    // flatMapGroupsWithState): the built-in operator runs the same
    // gap-merge in batch AND streaming with zero custom state code — the
    // Spark-first default before reaching for mapGroupsWithState. Spark
    // opens a NEW session when the inter-event gap EQUALS the window gap
    // (next < prev + gap merges), so the oracle's break condition is >=.
    QueryDef(
      "q_session_native",
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
             |s AS (SELECT user_id, tsu,
             |    CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id
             |        ORDER BY tsu) >= 86400000000 THEN 1 ELSE 0 END AS brk
             |  FROM e),
             |g AS (SELECT user_id, tsu,
             |    sum(brk) OVER (PARTITION BY user_id ORDER BY tsu
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s)
             |SELECT user_id, min(tsu) AS session_start, max(tsu) AS session_end,
             |  CAST(count(*) AS INT) AS n_events
             |FROM g GROUP BY user_id, sid""".stripMargin),
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "24 hours"))
        .agg(min(unix_micros(col("ts"))).as("session_start"),
          max(unix_micros(col("ts"))).as("session_end"),
          count(lit(1)).cast("int").as("n_events"))
        .select("user_id", "session_start", "session_end", "n_events")),

    // ntile bucketing (feature binning / percentile cohorts): quartile of
    // each event within its type. The (value, event_id) order is unique,
    // so tile assignment is deterministic on both engines.
    //
    // SCALE NOTE: this is the EXACT exemplar, and its plan sorts each
    // event_type window in one task — fine at fixture cardinality (5
    // types), a ~20 TB single-task sort per type at 100 TB. The plan that
    // survives scale is q_quantile_bins below: cut points from an
    // aggregate + join/when bucketing, no global per-group sort.
    QueryDef(
      "q_ntile",
      Some("""SELECT event_id, event_type,
             |  CAST(ntile(4) OVER (PARTITION BY event_type
             |    ORDER BY value, event_id) AS INT) AS quartile
             |FROM events""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        Tables.t(s, dir, "events")
          .select(col("event_id"), col("event_type"),
            ntile(4).over(Window.partitionBy("event_type")
              .orderBy("value", "event_id")).as("quartile"))
      }),

    // Quantile BINNING at scale — the q_ntile sibling whose plan bins
    // 100 TB: per-group cut points from ONE aggregate (tiny result: one
    // row per event_type), broadcast back, `when` bucketing row-locally.
    // No window, no per-group global sort; the table is scanned twice and
    // shuffled once (for the agg). In production the cut points come from
    // approx_percentile (same plan shape, sketch-sized state); the gated
    // variant uses exact percentile because Spark's `percentile` and
    // DuckDB's `quantile_cont` share the (1−f)·a[k] + f·a[k+1]
    // interpolation, making the cuts — and therefore every bin — engine-
    // reproducible. Bin rule: value ≤ q1 → 1, ≤ q2 → 2, ≤ q3 → 3, else 4.
    QueryDef(
      "q_quantile_bins",
      Some("""WITH cuts AS (SELECT event_type,
             |    quantile_cont(value, 0.25) AS q1,
             |    quantile_cont(value, 0.5) AS q2,
             |    quantile_cont(value, 0.75) AS q3
             |  FROM events GROUP BY event_type)
             |SELECT e.event_id, e.event_type,
             |  CAST(CASE WHEN e.value <= c.q1 THEN 1
             |            WHEN e.value <= c.q2 THEN 2
             |            WHEN e.value <= c.q3 THEN 3 ELSE 4 END AS INT) AS bin
             |FROM events e JOIN cuts c USING (event_type)""".stripMargin),
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
        val cuts = ev.groupBy("event_type").agg(
          expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.5)").as("q2"),
          expr("percentile(value, 0.75)").as("q3"))
        ev.join(broadcast(cuts), Seq("event_type"))
          .select(col("event_id"), col("event_type"),
            when(col("value") <= col("q1"), 1)
              .when(col("value") <= col("q2"), 2)
              .when(col("value") <= col("q3"), 3)
              .otherwise(4).cast("int").as("bin"))
      }),

    // Correlated EXISTS (TPC-H Q4 shape): orders with at least one
    // returned line item, counted per priority. Catalyst must decorrelate
    // the per-row EXISTS into a left-semi join (PlanSpec asserts it) —
    // the rewrite that makes correlated SQL survive 100 TB instead of
    // running a subplan per outer row.
    QueryDef(
      "q_exists_corr",
      Some("""SELECT o_orderpriority, count(*) AS n
             |FROM orders o
             |WHERE EXISTS (SELECT 1 FROM lineitem l
             |  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
             |GROUP BY o_orderpriority""".stripMargin),
      (s, dir) => {
        Tables.t(s, dir, "orders").createOrReplaceTempView("orders")
        Tables.t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""SELECT o_orderpriority, count(*) AS n
                |FROM orders o
                |WHERE EXISTS (SELECT 1 FROM lineitem l
                |  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
                |GROUP BY o_orderpriority""".stripMargin)
      }),

    // LATERAL correlated subquery: top-2 orders per customer — the
    // per-outer-row ORDER BY + LIMIT shape. Catalyst rewrites the lateral
    // into a window/join plan rather than executing the subquery per
    // customer row.
    QueryDef(
      "q_lateral_topn",
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
             |FROM customer c,
             |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin),
      (s, dir) => {
        Tables.t(s, dir, "customer").createOrReplaceTempView("customer")
        Tables.t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
                |FROM customer c,
                |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                |  WHERE o.o_custkey = c.c_custkey
                |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin)
      }),

    // Correlated scalar subquery (TPC-H Q17 shape): line items below 20%
    // of their part's average quantity. Decorrelates into an aggregate
    // joined back on the correlation key — one shuffle over lineitem, not
    // an avg() per outer row.
    QueryDef(
      "q_scalar_corr",
      Some("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
             |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             |WHERE p.p_brand = 'Brand#19'
             |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
             |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin),
      (s, dir) => {
        Tables.t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        Tables.t(s, dir, "part").createOrReplaceTempView("part")
        s.sql("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
                |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                |WHERE p.p_brand = 'Brand#19'
                |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin)
      })
  )
}

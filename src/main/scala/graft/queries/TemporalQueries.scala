package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.Temporal
import graft.streaming.{IncrementalStream, Sessionize}

/** Temporal / window / analytical operators: as-of join, range join,
  * rolling windows, sessionization, deciles, a star-schema rollup, exact
  * group quantiles, and a real Structured Streaming windowed aggregation
  * under the oracle gate. Timestamps are compared as epoch microseconds
  * (`unix_micros` ↔ DuckDB `epoch_us`): whichever ts generation the
  * fixture ships (ns or µs — [[graft.Tables.normalizeEventTs]]), both
  * engines see the same µs values.
  */
object TemporalQueries {

  /** events projected to (event_id, user_id, ts_us, event_type, value). */
  private def ev(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.t(s, dir, "events").select(
      col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))

  val defs: Seq[QueryDef] = Seq(

    // Forward-fill (the gap-repair every sparse time series needs): value
    // is only observed on purchase rows; every other row carries the most
    // recent observation forward. last(ignoreNulls) over a per-key
    // running frame — one shuffle on user_id, window state bounded by a
    // key's rows. Rows before a user's first purchase stay NULL.
    QueryDef(
      "q_ffill",
      Some("""SELECT event_id, user_id,
             |  last_value(CASE WHEN event_type = 'purchase' THEN value END
             |      IGNORE NULLS)
             |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS filled_value
             |FROM events""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        ev(s, dir).select(col("event_id"), col("user_id"),
          last(when(col("event_type") === "purchase", col("value")),
            ignoreNulls = true).over(w).as("filled_value"))
      }),

    // Linear interpolation between sparse observations — ffill's smarter
    // sibling: rows between two purchases get the time-weighted blend,
    // rows before the first / after the last observation take the nearest
    // one. Four window expressions (prev/next value and timestamp) over
    // the same per-key frames; identical arithmetic order on both engines
    // keeps the doubles bit-close, round(4) absorbs the rest.
    QueryDef(
      "q_interpolate",
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |    CASE WHEN event_type = 'purchase' THEN value END AS obs
             |  FROM events),
             |w AS (SELECT event_id, user_id, ts_us,
             |    last_value(obs IGNORE NULLS) OVER (PARTITION BY user_id
             |      ORDER BY ts_us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             |    last_value(CASE WHEN obs IS NOT NULL THEN ts_us END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             |    first_value(obs IGNORE NULLS) OVER (PARTITION BY user_id
             |      ORDER BY ts_us, event_id
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             |    first_value(CASE WHEN obs IS NOT NULL THEN ts_us END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
             |  FROM e)
             |SELECT event_id, user_id,
             |  CASE WHEN pt IS NULL THEN nv
             |       WHEN nt IS NULL THEN pv
             |       WHEN nt = pt THEN pv
             |       ELSE round(pv + (nv - pv) * ((ts_us - pt) / (nt - pt)), 4)
             |  END AS interp_value
             |FROM w""".stripMargin),
      (s, dir) => {
        val past = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, 0)
        val future = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(0, Window.unboundedFollowing)
        val obs = when(col("event_type") === "purchase", col("value"))
        val obsTs = when(col("event_type") === "purchase", col("ts_us"))
        ev(s, dir)
          .withColumn("pv", last(obs, ignoreNulls = true).over(past))
          .withColumn("pt", last(obsTs, ignoreNulls = true).over(past))
          .withColumn("nv", first(obs, ignoreNulls = true).over(future))
          .withColumn("nt", first(obsTs, ignoreNulls = true).over(future))
          .select(col("event_id"), col("user_id"),
            when(col("pt").isNull, col("nv"))
              .when(col("nt").isNull, col("pv"))
              .when(col("nt") === col("pt"), col("pv"))
              .otherwise(round(col("pv") + (col("nv") - col("pv")) *
                ((col("ts_us") - col("pt")) / (col("nt") - col("pt"))), 4))
              .as("interp_value"))
      }),

    // As-of join: every event gets the most recent purchase (inclusive) by
    // the same user. The union-tag plan shuffles ONCE on user_id; the
    // oracle is DuckDB's native ASOF LEFT JOIN — an independent
    // formulation of the same semantics.
    QueryDef(
      "q_asof_join",
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |    event_type FROM events),
             |p AS (SELECT user_id, ts_us, max(event_id) AS purchase_id
             |  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, e.ts_us, e.event_type,
             |  p.purchase_id, p.ts_us AS purchase_ts_us
             |FROM e ASOF LEFT JOIN p
             |  ON e.user_id = p.user_id AND e.ts_us >= p.ts_us""".stripMargin),
      (s, dir) => {
        val e = ev(s, dir).drop("value")
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts_us")
          .agg(max("event_id").as("purchase_id"))
          .withColumn("purchase_ts_us", col("ts_us"))
        Temporal.asofJoin(e, purchases, "user_id", "ts_us", "ts_us")
      }),

    // Range join without an equi key: purchases landing inside 10-minute
    // windows opened by error events. Bucketed equi-join plan vs the
    // oracle's theta join.
    QueryDef(
      "q_range_join",
      Some("""WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, event_type
             |    FROM events),
             |p AS (SELECT event_id AS purchase_id, ts_us FROM e
             |  WHERE event_type = 'purchase'),
             |r AS (SELECT event_id AS error_id, ts_us AS start_us FROM e
             |  WHERE event_type = 'error')
             |SELECT purchase_id, error_id, p.ts_us - start_us AS lag_us
             |FROM p JOIN r
             |  ON p.ts_us >= start_us AND p.ts_us < start_us + 600000000""".stripMargin),
      (s, dir) => {
        val e = ev(s, dir)
        val points = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("ts_us"))
        val intervals = e.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"),
            col("ts_us").as("start_us"),
            (col("ts_us") + 600000000L).as("end_us"))
        Temporal.rangeJoin(points, "ts_us", intervals,
            "start_us", "end_us", bucketWidth = 600000000L)
          .select(col("purchase_id"), col("error_id"),
            (col("ts_us") - col("start_us")).as("lag_us"))
      }),

    // Rolling 5-event window per user (sum/max/count) — the per-key
    // sliding-frame shape (PARTITION BY keeps it parallel; total order by
    // (ts, id) makes the frame deterministic).
    QueryDef(
      "q_rolling_agg",
      Some("""SELECT event_id, user_id, ts_us,
             |  round(sum(value) OVER w, 2) AS roll_sum5,
             |  max(value) OVER w AS roll_max5,
             |  CAST(count(*) OVER w AS INT) AS roll_n5
             |FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
             |      FROM events)
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us"), col("event_id"))
          .rowsBetween(-4, Window.currentRow)
        ev(s, dir).select(
          col("event_id"), col("user_id"), col("ts_us"),
          round(sum("value").over(w), 2).as("roll_sum5"),
          max("value").over(w).as("roll_max5"),
          count(lit(1)).over(w).cast("int").as("roll_n5"))
      }),

    // Gap-based sessionization (30-min inactivity closes a session) via the
    // SAME flatMapGroupsWithState code the streaming path runs — batch
    // execution sees each key once and emits every session. Oracle: the
    // classic lag + cumulative-break-sum SQL formulation.
    QueryDef(
      "q_sessionize",
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_type
             |    FROM events),
             |s AS (SELECT user_id, tsu, event_type,
             |    CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id
             |        ORDER BY tsu) > 1800000000 THEN 1 ELSE 0 END AS brk
             |  FROM e),
             |g AS (SELECT user_id, tsu, event_type,
             |    sum(brk) OVER (PARTITION BY user_id ORDER BY tsu
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s)
             |SELECT user_id, min(tsu) AS session_start, max(tsu) AS session_end,
             |  CAST(count(*) AS INT) AS n_events,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |    AS INT) AS n_purchases
             |FROM g GROUP BY user_id, sid""".stripMargin),
      (s, dir) =>
        Sessionize.sessionizeBatch(s, dir, gapMicros = 1800000000L).toDF()),

    // Decile bucketing within each nation (ntile over a PARTITIONED window
    // — a global ntile would funnel the corpus through one task).
    QueryDef(
      "q_ntile_decile",
      Some("""SELECT c_custkey, c_nationkey, c_acctbal,
             |  CAST(ntile(10) OVER (PARTITION BY c_nationkey
             |    ORDER BY c_acctbal DESC, c_custkey) AS INT) AS decile
             |FROM customer""".stripMargin),
      (s, dir) => Tables.t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        .withColumn("decile", ntile(10).over(
          Window.partitionBy("c_nationkey")
            .orderBy(col("c_acctbal").desc, col("c_custkey"))))),

    // Star-schema rollup (TPC-H Q3/Q5 shape): revenue by nation for one
    // market segment. Dimensions broadcast; the one shuffle is the
    // lineitem↔orders join + final small aggregation. Revenue summed in
    // integer cents — micro-batch/partition order can never move the hash.
    QueryDef(
      "q_star_join",
      Some("""SELECT n.n_name,
             |  CAST(count(*) AS BIGINT) AS n_items,
             |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
             |    AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM lineitem l
             |JOIN orders o ON l.l_orderkey = o.o_orderkey
             |JOIN customer c ON o.o_custkey = c.c_custkey
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus <> 'F'
             |GROUP BY n.n_name""".stripMargin),
      (s, dir) => {
        val l = Tables.t(s, dir, "lineitem").select(col("l_orderkey"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100, 0)
            .cast("long").as("rev_cents"))
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_orderstatus") =!= "F")
          .select(col("o_orderkey"), col("o_custkey"))
        val c = Tables.t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"), col("c_nationkey"))
        val n = Tables.t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).as("n_items"),
            sum("rev_cents").as("revenue_cents"))
      }),

    // Exact group-wise quantiles (median / p90, linear interpolation,
    // the `quantile_cont` definition) — computed via graft's sort-based
    // window formulation, which spills instead of buffering whole groups
    // in executor memory like the `percentile` aggregate.
    QueryDef(
      "q_percentile",
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      (s, dir) => graft.ops.Quantiles.groupQuantiles(
          Tables.t(s, dir, "lineitem").select("l_returnflag", "l_extendedprice"),
          "l_returnflag", "l_extendedprice",
          Seq("p50" -> 0.5, "p90" -> 0.9))
        .select(col("l_returnflag"),
          round(col("p50"), 4).as("p50"),
          round(col("p90"), 4).as("p90"), col("n"))),

    // REAL Structured Streaming under the hash gate: watermarked hourly
    // windows over the events stream, AvailableNow, read back from the
    // checkpointed sink. Append mode withholds windows the final watermark
    // ( = max event time, delay 0) hasn't passed; the oracle applies the
    // same cutoff.
    QueryDef(
      "q_stream_window",
      Some("""WITH e AS (SELECT epoch_us(ts) AS tsu, event_type,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
             |w AS (SELECT (tsu // 3600000000) * 3600000000 AS win_start_us,
             |    event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(cents) AS BIGINT) AS value_cents
             |  FROM e GROUP BY 1, 2)
             |SELECT win_start_us, event_type, n, value_cents FROM w
             |WHERE win_start_us + 3600000000 <= (SELECT max(tsu) FROM e)""".stripMargin),
      (s, dir) => IncrementalStream.windowedCountsGated(s, dir)),

    // SLIDING-window streaming aggregate (2h windows, 1h slide): each
    // event feeds TWO overlapping open windows — the state-per-window
    // semantics tumbling never exercises. Same checkpointed AvailableNow
    // + append-mode watermark contract as q_stream_window; the oracle
    // fans each event into its two window starts in batch SQL and
    // applies the identical closed-window cutoff.
    QueryDef(
      "q_stream_sliding",
      Some("""WITH e AS (SELECT epoch_us(ts) AS tsu, event_type,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
             |x AS (SELECT tsu, event_type, cents,
             |    unnest([(tsu // 3600000000) * 3600000000,
             |      (tsu // 3600000000) * 3600000000 - 3600000000])
             |      AS win_start_us
             |  FROM e),
             |w AS (SELECT win_start_us, event_type,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(cents) AS BIGINT) AS value_cents
             |  FROM x GROUP BY 1, 2)
             |SELECT win_start_us, event_type, n, value_cents FROM w
             |WHERE win_start_us + 7200000000 <= (SELECT max(tsu) FROM e)"""
        .stripMargin),
      (s, dir) => IncrementalStream.slidingCountsGated(s, dir)),

    // STREAMING TOP-K: the stream maintains watermarked per-(window,
    // user) counts (the unbounded state); the k-bounded leaderboard
    // rank runs as a batch window over the checkpointed sink —
    // append-mode can't retract a leaderboard row when a late arrival
    // reorders it, so ranking stays out of the streaming graph. Oracle
    // replays counts + closed-window cutoff + rank in batch SQL.
    QueryDef(
      "q_stream_topk",
      Some("""WITH e AS (SELECT epoch_us(ts) AS tsu, user_id FROM events),
             |w AS (SELECT (tsu // 3600000000) * 3600000000 AS win_start_us,
             |    user_id, CAST(count(*) AS BIGINT) AS n
             |  FROM e GROUP BY 1, 2),
             |cl AS (SELECT * FROM w
             |  WHERE win_start_us + 3600000000 <= (SELECT max(tsu) FROM e)),
             |r AS (SELECT win_start_us, user_id, n,
             |    CAST(row_number() OVER (PARTITION BY win_start_us
             |      ORDER BY n DESC, user_id) AS INT) AS rk
             |  FROM cl)
             |SELECT win_start_us, rk, user_id, n FROM r
             |WHERE rk <= 3""".stripMargin),
      (s, dir) => IncrementalStream.topkPerWindowGated(s, dir)),

    // ROLLING MEDIAN (robust running statistic — outlier-resistant where
    // q_rolling_agg's mean is not): 7-row trailing frame per event type.
    // Spark has no windowed percentile, so the frame's values collect
    // row-locally (bounded: ≤7 elements) and the median is exact array
    // math — odd count takes the middle, even count averages the two
    // middles with the same single IEEE op DuckDB's quantile_cont uses.
    // The window is PARTITIONED (by event_type): parallel at any scale,
    // state bounded by the 7-row frame.
    QueryDef(
      "q_rolling_median",
      Some("""SELECT event_id, event_type,
             |  median(value) OVER (PARTITION BY event_type
             |    ORDER BY ts, event_id
             |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_median
             |FROM events""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("event_type")
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-6, 0)
        val sorted = array_sort(collect_list(col("value")).over(w))
        val n = size(sorted)
        val med = when(n % 2 === 1,
            element_at(sorted, ((n + lit(1)) / 2).cast("int")))
          .otherwise((element_at(sorted, (n / 2).cast("int"))
            + element_at(sorted, (n / 2 + 1).cast("int"))) / 2.0)
        Tables.t(s, dir, "events")
          .select(col("event_id"), col("event_type"), med.as("rolling_median"))
      }),

    // IANA-timezone bucketing (the reference schedules in German local
    // time — airflow.cfg crons, Berlin business days): UTC event time →
    // Europe/Berlin local day/hour, DST handled by the shared tz
    // database. DuckDB's two-hop `(ts AT TIME ZONE 'UTC') AT TIME ZONE
    // 'Europe/Berlin'` is the verified equivalent of Spark's
    // from_utc_timestamp (the one-hop timezone() call converts the WRONG
    // direction — it reads the naive timestamp as Berlin time).
    QueryDef(
      "q_tz_localize",
      Some("""WITH l AS (SELECT (ts::TIMESTAMP AT TIME ZONE 'UTC')
             |    AT TIME ZONE 'Europe/Berlin' AS lt FROM events)
             |SELECT CAST(lt AS DATE) AS berlin_day,
             |  CAST(EXTRACT(hour FROM lt) AS INT) AS berlin_hour,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM l GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        val lt = from_utc_timestamp(col("ts"), "Europe/Berlin")
        Tables.t(s, dir, "events")
          .select(to_date(lt).as("berlin_day"),
            hour(lt).as("berlin_hour"))
          .groupBy("berlin_day", "berlin_hour")
          .agg(count(lit(1)).as("n"))
      }),

    // Day-of-week seasonality profile + per-event deviation share — the
    // weekly-pattern decomposition a metrics pipeline baselines anomaly
    // detection on. dow convention pinned to ISO (Monday=1) on both
    // engines; means as exact-sum/count division.
    QueryDef(
      "q_dow_seasonality",
      Some("""WITH e AS (SELECT event_type, isodow(ts::TIMESTAMP) AS dow, value
             |  FROM events),
             |prof AS (SELECT event_type, dow,
             |    CAST(count(*) AS BIGINT) AS n,
             |    sum(value) / count(*) AS mean_value
             |  FROM e GROUP BY 1, 2),
             |tot AS (SELECT event_type, sum(value) / count(*) AS overall
             |  FROM e GROUP BY 1)
             |SELECT p.event_type, CAST(p.dow AS INT) AS dow, p.n,
             |  round(p.mean_value, 4) AS mean_value,
             |  round(p.mean_value - t.overall, 4) AS seasonal_delta
             |FROM prof p JOIN tot t USING (event_type)""".stripMargin),
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .select(col("event_type"), dayofweek(col("ts")).as("__dow"),
            col("value"))
          // Spark dayofweek: Sunday=1..Saturday=7 → ISO Monday=1..Sunday=7
          .withColumn("dow",
            when(col("__dow") === 1, 7).otherwise(col("__dow") - 1))
        val prof = e.groupBy("event_type", "dow")
          .agg(count(lit(1)).as("n"),
            (sum("value") / count(lit(1))).as("mean_value"))
        val tot = e.groupBy("event_type")
          .agg((sum("value") / count(lit(1))).as("overall"))
        prof.join(tot, Seq("event_type"))
          .select(col("event_type"), col("dow").cast("int").as("dow"),
            col("n"),
            round(col("mean_value"), 4).as("mean_value"),
            round(col("mean_value") - col("overall"), 4).as("seasonal_delta"))
      }),

    // NEAREST-in-time join: every event gets the temporally CLOSEST
    // purchase by the same user, in either direction (backward wins
    // ties). ops/Temporal.nearestJoin carries both the latest-prior and
    // earliest-later candidates through ONE sorted timeline pass — one
    // shuffle, where composing two as-of joins would pay two plus a
    // re-join. The oracle is the independent two-ASOF-join formulation.
    QueryDef(
      "q_asof_nearest",
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |    event_type FROM events),
             |p AS (SELECT user_id, ts_us, max(event_id) AS purchase_id
             |  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2),
             |b AS (SELECT e.event_id, p.purchase_id AS b_id, p.ts_us AS b_ts
             |  FROM e ASOF LEFT JOIN p
             |    ON e.user_id = p.user_id AND e.ts_us >= p.ts_us),
             |f AS (SELECT e.event_id, p.purchase_id AS f_id, p.ts_us AS f_ts
             |  FROM e ASOF LEFT JOIN p
             |    ON e.user_id = p.user_id AND e.ts_us <= p.ts_us)
             |SELECT e.event_id, e.user_id, e.ts_us, e.event_type,
             |  CASE WHEN f_ts IS NULL OR (b_ts IS NOT NULL
             |      AND e.ts_us - b_ts <= f_ts - e.ts_us)
             |    THEN b_id ELSE f_id END AS purchase_id,
             |  CASE WHEN f_ts IS NULL OR (b_ts IS NOT NULL
             |      AND e.ts_us - b_ts <= f_ts - e.ts_us)
             |    THEN b_ts ELSE f_ts END - e.ts_us AS delta_us
             |FROM e JOIN b USING (event_id) JOIN f USING (event_id)"""
        .stripMargin),
      (s, dir) => {
        val e = ev(s, dir).drop("value")
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts_us")
          .agg(max("event_id").as("purchase_id"))
        Temporal.nearestJoin(e, purchases, "user_id", "ts_us", "ts_us")
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("event_type"), col("purchase_id"),
            (col("__near_ts") - col("ts_us")).as("delta_us"))
      })
  )
}

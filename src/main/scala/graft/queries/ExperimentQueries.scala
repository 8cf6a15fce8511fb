package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.Materialize._

/** EXPERIMENTATION analytics: the A/B-testing primitives a BI warehouse
  * runs daily — Welch's t, CUPED variance reduction, and the
  * sample-ratio-mismatch guardrail.
  *
  * Reference behavior: the reference's BigQuery marts feed exactly this
  * kind of per-variant metric comparison (its dashboards aggregate
  * revenue/engagement per cohort); re-expressed as self-contained
  * deterministic queries over the events fixture.
  *
  * Variant assignment is the deterministic sha-bucket split
  * (ops.Sampling.hashBucket — reproducible on any engine, never rand()),
  * exactly the q_split_sample contract. Every statistic reduces to
  * map-side-combinable sums (n, Σy, Σy², Σxy) — one corpus scan per
  * query, |variants|- or |types|-sized frames after, no windows.
  */
object ExperimentQueries {

  /** events + deterministic 50/50 variant on user_id (buckets 0-49 = A). */
  private def assigned(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.t(s, dir, "events")
      .withColumn("variant",
        when(graft.ops.Sampling.hashBucket(col("user_id")) < 50, "A")
          .otherwise("B"))

  // the ONE cross-engine hash contract (Hashing.sha60Sql) — never a
  // hand-rolled copy that could drift from the Spark-side sha60
  private val bucketSql =
    graft.expressions.Hashing.sha60Sql("CAST(user_id AS VARCHAR)") + " % 100"

  val defs: Seq[QueryDef] = Seq(

    // WELCH's t per event type: unequal-variance two-sample t statistic
    // between the deterministic A/B halves, with the Welch–Satterthwaite
    // degrees of freedom. var_samp/means come from partial-aggregable
    // sums; the only float work is the final ratio — round(4) absorbs
    // last-ulp libm differences like every scored gate here.
    QueryDef(
      "q_ab_ttest",
      Some(s"""WITH a AS (SELECT event_type,
             |    CASE WHEN $bucketSql < 50 THEN 'A' ELSE 'B' END AS variant,
             |    value
             |  FROM events),
             |g AS (SELECT event_type, variant,
             |    CAST(count(*) AS BIGINT) AS n,
             |    avg(value) AS m, var_samp(value) AS v
             |  FROM a GROUP BY 1, 2),
             |w AS (SELECT x.event_type,
             |    x.n AS n_a, y.n AS n_b,
             |    round(x.m, 4) AS mean_a, round(y.m, 4) AS mean_b,
             |    CASE WHEN x.n > 1 AND y.n > 1
             |        AND x.v / x.n + y.v / y.n > 0
             |      THEN (x.m - y.m) / sqrt(x.v / x.n + y.v / y.n) END AS t,
             |    CASE WHEN x.n > 1 AND y.n > 1
             |        AND x.v / x.n + y.v / y.n > 0
             |      THEN (x.v / x.n + y.v / y.n) * (x.v / x.n + y.v / y.n)
             |        / ((x.v / x.n) * (x.v / x.n) / (x.n - 1)
             |          + (y.v / y.n) * (y.v / y.n) / (y.n - 1)) END AS df
             |  FROM g x JOIN g y USING (event_type)
             |  WHERE x.variant = 'A' AND y.variant = 'B')
             |SELECT event_type, n_a, n_b, mean_a, mean_b,
             |  round(t, 4) AS t_stat, round(df, 2) AS df
             |FROM w""".stripMargin),
      (s, dir) => {
        val g = assigned(s, dir)
          .groupBy("event_type", "variant")
          .agg(count(lit(1)).as("n"), avg("value").as("m"),
            var_samp("value").as("v"))
        val a = g.filter(col("variant") === "A")
          .select(col("event_type"), col("n").as("n_a"),
            col("m").as("m_a"), col("v").as("v_a"))
        val b = g.filter(col("variant") === "B")
          .select(col("event_type"), col("n").as("n_b"),
            col("m").as("m_b"), col("v").as("v_b"))
        val se2a = col("v_a") / col("n_a")
        val se2b = col("v_b") / col("n_b")
        // degenerate cells (n=1 → var_samp NULL; zero variance both
        // sides) yield NULL — identically in both engines — instead of
        // an engine-version-dependent NaN/NULL divergence
        val ok = col("n_a") > 1 && col("n_b") > 1 && (se2a + se2b) > 0
        a.join(b, "event_type")
          .select(col("event_type"), col("n_a"), col("n_b"),
            round(col("m_a"), 4).as("mean_a"),
            round(col("m_b"), 4).as("mean_b"),
            when(ok, round((col("m_a") - col("m_b")) / sqrt(se2a + se2b), 4))
              .as("t_stat"),
            when(ok, round((se2a + se2b) * (se2a + se2b)
              / (se2a * se2a / (col("n_a") - 1)
                + se2b * se2b / (col("n_b") - 1)), 2)).as("df"))
      }),

    // POISSON BOOTSTRAP CI — the distributed bootstrap: classic
    // resampling needs N draws per replicate from one urn (a shuffle
    // nightmare); the Poisson trick gives each (row, replicate) an
    // INDEPENDENT Poisson(1) multiplicity, so the whole B=100-replicate
    // bootstrap is one row-local explode + one aggregation, map-side
    // combinable at any scale. Multiplicities are DETERMINISTIC here:
    // sha60(event_id:b) mod 1000 against literal Poisson(1) CDF cuts
    // (368/736/920/981 → 0..4+, the ≤0.1% tail mass collapsed into 4 —
    // documented approximation), so both engines draw the same
    // resamples. The 95% CI is rank-SELECTED from the 100 replicate
    // means (ranks 3 and 98 under (mean, b) order — no interpolation,
    // no float risk); replicate means divide exact integer-cents sums.
    QueryDef(
      "q_bootstrap_ci",
      Some(s"""WITH e AS (SELECT event_id,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |x AS (SELECT e.cents, t.b,
             |    ${graft.expressions.Hashing.sha60Sql(
                    "CAST(event_id AS VARCHAR) || ':' || CAST(t.b AS VARCHAR)")}
             |      % 1000 AS h
             |  FROM e CROSS JOIN unnest(range(0, 100)) AS t(b)),
             |m AS (SELECT b,
             |    CAST(sum(CASE WHEN h < 368 THEN 0 WHEN h < 736 THEN 1
             |      WHEN h < 920 THEN 2 WHEN h < 981 THEN 3 ELSE 4 END
             |      * cents) AS BIGINT) AS s,
             |    CAST(sum(CASE WHEN h < 368 THEN 0 WHEN h < 736 THEN 1
             |      WHEN h < 920 THEN 2 WHEN h < 981 THEN 3 ELSE 4 END)
             |      AS BIGINT) AS w
             |  FROM x GROUP BY b),
             |mm AS (SELECT b, CAST(s AS DOUBLE) / w AS mean_b FROM m
             |  WHERE w > 0),
             |r AS (SELECT mean_b, row_number() OVER (ORDER BY mean_b, b)
             |    AS rk FROM mm),
             |base AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(cents) AS DOUBLE) / count(*) AS mean_cents
             |  FROM e)
             |SELECT base.n, round(base.mean_cents, 4) AS mean_cents,
             |  round(lo.mean_b, 4) AS ci_lo, round(hi.mean_b, 4) AS ci_hi
             |FROM base
             |CROSS JOIN (SELECT mean_b FROM r WHERE rk = 3) lo
             |CROSS JOIN (SELECT mean_b FROM r WHERE rk = 98) hi""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.t(s, dir, "events")
          .select(col("event_id"),
            round(col("value") * 100, 0).cast("long").as("cents"))
          .graftCheckpoint() // feeds the replicate fan-out AND the base
        val x = e.withColumn("b", explode(sequence(lit(0), lit(99))))
          .withColumn("h", graft.expressions.Hashing.sha60(
            concat(col("event_id").cast("string"), lit(":"),
              col("b").cast("string"))) % 1000)
          .withColumn("mult",
            when(col("h") < 368, 0).when(col("h") < 736, 1)
              .when(col("h") < 920, 2).when(col("h") < 981, 3)
              .otherwise(4))
        val m = x.groupBy("b")
          .agg(sum(col("mult") * col("cents")).as("s"),
            sum("mult").as("w"))
          .filter(col("w") > 0)
          .withColumn("mean_b", col("s").cast("double") / col("w"))
        // 100-row replicate table: the rank window is bounded by B
        val r = m.withColumn("rk",
          row_number().over(Window.orderBy(col("mean_b"), col("b"))))
        val base = e.agg(count(lit(1)).as("n"),
          (sum("cents").cast("double") / count(lit(1))).as("mean_cents"))
        base.crossJoin(broadcast(r.filter(col("rk") === 3)
            .select(col("mean_b").as("lo"))))
          .crossJoin(broadcast(r.filter(col("rk") === 98)
            .select(col("mean_b").as("hi"))))
          .select(col("n"), round(col("mean_cents"), 4).as("mean_cents"),
            round(col("lo"), 4).as("ci_lo"),
            round(col("hi"), 4).as("ci_hi"))
      }),

    // mSPRT SEQUENTIAL MONITORING (always-valid inference): the daily
    // peeking dashboard the fixed-horizon q_ab_ttest can't legally
    // power. Per day, cumulative per-arm counts/sums accumulate in
    // EXACT INTEGER CENTS (day-partitioned prefix sums — only the
    // final likelihood is float, computed with identical op order),
    // the mixture likelihood ratio Λ_t = √(V/(V+τ²))·
    // exp(δ²τ²/(2V(V+τ²))) uses the full-period pooled σ² (cents²,
    // documented simplification) and a fixed τ=50-cent mixing prior,
    // and the always-valid p is the running min of 1/Λ — monotone, so
    // stopping any day keeps the guarantee. All windows run on the
    // day-domain table (≤|days| rows), never the corpus.
    QueryDef(
      "q_msprt",
      Some(s"""WITH e AS (SELECT CAST(ts AS DATE) AS day,
             |    CASE WHEN $bucketSql < 50 THEN 'A' ELSE 'B' END
             |      AS variant,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |g AS (SELECT day, variant, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(cents) AS BIGINT) AS s,
             |    CAST(sum(cents * cents) AS BIGINT) AS s2
             |  FROM e GROUP BY 1, 2),
             |cum AS (SELECT day, variant,
             |    CAST(sum(n) OVER w AS BIGINT) AS cn,
             |    CAST(sum(s) OVER w AS BIGINT) AS cs
             |  FROM g WINDOW w AS (PARTITION BY variant ORDER BY day
             |    ROWS UNBOUNDED PRECEDING)),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
             |    CAST(sum(s) AS BIGINT) AS ss,
             |    CAST(sum(s2) AS BIGINT) AS ss2 FROM g),
             |sg AS (SELECT (CAST(ss2 AS DOUBLE) - CAST(ss AS DOUBLE)
             |      * ss / nn) / (nn - 1) AS sigma2 FROM tot),
             |pv AS (SELECT a.day, a.cn AS n_a, b.cn AS n_b,
             |    CAST(b.cs AS DOUBLE) / b.cn
             |      - CAST(a.cs AS DOUBLE) / a.cn AS delta,
             |    sg.sigma2 * (1.0 / a.cn + 1.0 / b.cn) AS va
             |  FROM cum a JOIN cum b ON b.day = a.day
             |    AND a.variant = 'A' AND b.variant = 'B'
             |  CROSS JOIN sg),
             |lm AS (SELECT day, n_a, n_b, delta,
             |    sqrt(va / (va + 2500.0))
             |      * exp(delta * delta * 2500.0
             |        / (2 * va * (va + 2500.0))) AS lam
             |  FROM pv),
             |ap AS (SELECT day, n_a, n_b, delta, lam,
             |    min(least(1.0, 1.0 / lam)) OVER (ORDER BY day
             |      ROWS UNBOUNDED PRECEDING) AS p_av
             |  FROM lm)
             |SELECT day, n_a, n_b, round(delta, 4) AS delta_cents,
             |  round(lam, 4) AS lambda,
             |  round(p_av, 6) AS p_always_valid,
             |  p_av < 0.05 AS significant
             |FROM ap""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = assigned(s, dir)
          .select(to_date(col("ts")).as("day"), col("variant"),
            round(col("value") * 100, 0).cast("long").as("cents"))
        val g = e.groupBy("day", "variant")
          .agg(count(lit(1)).as("n"), sum("cents").as("s"),
            sum(col("cents") * col("cents")).as("s2"))
          .graftCheckpoint() // feeds cum, tot
        val w = Window.partitionBy("variant").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = g.select(col("day"), col("variant"),
          sum("n").over(w).as("cn"), sum("s").over(w).as("cs"))
        val tot = g.agg(sum("n").as("nn"), sum("s").as("ss"),
          sum("s2").as("ss2"))
          .select(((col("ss2").cast("double")
            - col("ss").cast("double") * col("ss") / col("nn"))
            / (col("nn") - 1)).as("sigma2"))
        val pv = cum.filter(col("variant") === "A")
          .select(col("day"), col("cn").as("na"), col("cs").as("csa"))
          .join(cum.filter(col("variant") === "B")
            .select(col("day"), col("cn").as("nb"), col("cs").as("csb")),
            Seq("day"))
          .crossJoin(broadcast(tot))
          .withColumn("delta", col("csb").cast("double") / col("nb")
            - col("csa").cast("double") / col("na"))
          .withColumn("va",
            col("sigma2") * (lit(1.0) / col("na") + lit(1.0) / col("nb")))
        val lam = sqrt(col("va") / (col("va") + lit(2500.0))) *
          exp(col("delta") * col("delta") * lit(2500.0) /
            (lit(2) * col("va") * (col("va") + lit(2500.0))))
        // the running-min window is over the ≤|days| per-day table — a
        // one-partition frame by design, bounded by the calendar
        val wd = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)
        pv.withColumn("lam", lam)
          .withColumn("p_av",
            min(least(lit(1.0), lit(1.0) / col("lam"))).over(wd))
          .select(col("day"), col("na").as("n_a"), col("nb").as("n_b"),
            round(col("delta"), 4).as("delta_cents"),
            round(col("lam"), 4).as("lambda"),
            round(col("p_av"), 6).as("p_always_valid"),
            (col("p_av") < 0.05).as("significant"))
      }),

    // CUPED variance reduction: per-user pre-period covariate x (event
    // count before the ts midpoint) against post-period outcome y (value
    // sum after it); θ = cov(x,y)/var(x) over ALL users (pooled — θ must
    // not be fit per variant), adjusted outcome y − θ·(x − x̄). Reports
    // per-variant raw vs adjusted means and the variance-reduction ratio
    // 1 − var(adj)/var(y) — the number that justifies running CUPED at
    // all. Two corpus scans (pre/post split by the deterministic global
    // ts midpoint), then user-level frames only.
    QueryDef(
      "q_cuped",
      Some(s"""WITH bnd AS (SELECT min(epoch_us(ts)) +
             |    (max(epoch_us(ts)) - min(epoch_us(ts))) // 2 AS cut
             |  FROM events),
             |u AS (SELECT user_id,
             |    CASE WHEN $bucketSql < 50 THEN 'A' ELSE 'B' END AS variant,
             |    CAST(sum(CASE WHEN epoch_us(ts) < cut THEN 1 ELSE 0 END)
             |      AS DOUBLE) AS x,
             |    sum(CASE WHEN epoch_us(ts) >= cut THEN value ELSE 0.0 END) AS y
             |  FROM events, bnd GROUP BY 1, 2),
             |th AS (SELECT CASE WHEN var_samp(x) > 0
             |      THEN covar_samp(x, y) / var_samp(x) ELSE 0.0 END AS theta,
             |    avg(x) AS mx FROM u),
             |adj AS (SELECT variant, y, y - theta * (x - mx) AS ya FROM u, th),
             |vr AS (SELECT CASE WHEN var_samp(y) > 0
             |    THEN 1.0 - var_samp(ya) / var_samp(y) ELSE 0.0 END AS red
             |  FROM adj)
             |SELECT variant,
             |  CAST(count(*) AS BIGINT) AS n_users,
             |  round(avg(y), 4) AS mean_raw,
             |  round(avg(ya), 4) AS mean_adj,
             |  round(any_value(vr.red), 4) AS var_reduction
             |FROM adj, vr GROUP BY variant""".stripMargin),
      (s, dir) => {
        val ev = assigned(s, dir)
        val bnd = ev.agg((min(unix_micros(col("ts"))) +
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))) / 2)
          .cast("long").as("cut"))
        val u = ev.crossJoin(broadcast(bnd))
          .groupBy("user_id", "variant")
          .agg(
            sum(when(unix_micros(col("ts")) < col("cut"), 1).otherwise(0))
              .cast("double").as("x"),
            sum(when(unix_micros(col("ts")) >= col("cut"), col("value"))
              .otherwise(lit(0.0))).as("y"))
        // constant covariate (no pre-period) → θ=0: adjustment becomes a
        // no-op instead of a NULL/NaN cascade that diverges by engine
        val th = u.agg(
          when(var_samp(col("x")) > 0,
            covar_samp(col("x"), col("y")) / var_samp(col("x")))
            .otherwise(lit(0.0)).as("theta"),
          avg("x").as("mx"))
        val adj = u.crossJoin(broadcast(th))
          .withColumn("ya", col("y") - col("theta") * (col("x") - col("mx")))
        val vr = adj.agg(
          when(var_samp(col("y")) > 0,
            lit(1.0) - var_samp(col("ya")) / var_samp(col("y")))
            .otherwise(lit(0.0)).as("red"))
        adj.crossJoin(broadcast(vr))
          .groupBy("variant")
          .agg(count(lit(1)).as("n_users"),
            round(avg("y"), 4).as("mean_raw"),
            round(avg("ya"), 4).as("mean_adj"),
            round(first("red"), 4).as("var_reduction"))
      }),

    // KAPLAN–MEIER survival curve over SESSION lifetimes (24h-gap
    // sessions; duration in whole hours): a session "dies" at its end
    // unless it ends within 24h of the global horizon, where it is
    // right-CENSORED — the standard estimator that handles still-open
    // spells correctly instead of counting them as ended. (User-level
    // churn is vacuous on this fixture — every user is active at the
    // horizon — so the spell unit is the session, the thing that
    // actually ends.) Survival(t) = Π(1 − d_s/n_s) over death times
    // s ≤ t via a cumulative ln-sum; the ordered windows run over the
    // DISTINCT-DURATION table (aggregated BEFORE any window — bounded
    // by the duration domain, never corpus-sized). A time where everyone
    // remaining dies makes a factor 0: Spark's log returns NULL there
    // while DuckDB's ln gives -inf, so zeroing rides an explicit
    // cumulative flag computed identically in both engines.
    QueryDef(
      "q_kaplan_meier",
      Some("""WITH hz AS (SELECT max(ts) AS mx FROM events),
             |s AS (SELECT user_id, ts, CASE WHEN epoch_us(ts) -
             |      lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
             |      >= 86400000000 THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |g AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id
             |    ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s),
             |ses AS (SELECT user_id, sid, min(ts) AS st, max(ts) AS en
             |  FROM g GROUP BY 1, 2),
             |u AS (SELECT
             |    (epoch_us(en) - epoch_us(st)) // 3600000000 AS life,
             |    en <= mx - INTERVAL 24 HOUR AS died
             |  FROM ses, hz),
             |t AS (SELECT life AS t,
             |    CAST(sum(CASE WHEN died THEN 1 ELSE 0 END) AS BIGINT) AS d,
             |    CAST(count(*) AS BIGINT) AS ended
             |  FROM u GROUP BY 1),
             |r AS (SELECT t, d,
             |    CAST(sum(ended) OVER (ORDER BY t DESC
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk
             |  FROM t),
             |k AS (SELECT t, d, n_risk,
             |    sum(CASE WHEN d < n_risk AND d > 0
             |        THEN ln(1.0 - d::DOUBLE / n_risk) ELSE 0.0 END)
             |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lsum,
             |    max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END)
             |      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS zeroed
             |  FROM r WHERE d > 0)
             |SELECT CAST(t AS BIGINT) AS t, d, n_risk,
             |  CASE WHEN zeroed = 1 THEN 0.0
             |    ELSE round(exp(lsum), 4) END AS survival
             |FROM k""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.t(s, dir, "events")
        val hz = ev.agg(max("ts").as("mx"))
        val wU = Window.partitionBy("user_id").orderBy(col("ts"))
        val ses = ev.select(col("user_id"), col("ts"))
          .withColumn("brk",
            when(unix_micros(col("ts")) -
              lag(unix_micros(col("ts")), 1).over(wU) >= 86400000000L, 1)
              .otherwise(0))
          .withColumn("sid",
            sum("brk").over(wU.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sid")
          .agg(min("ts").as("st"), max("ts").as("en"))
        val u = ses.crossJoin(broadcast(hz))
          .select(expr("(unix_micros(en) - unix_micros(st)) div 3600000000")
            .as("life"),
            (col("en") <= col("mx") - expr("INTERVAL 24 HOURS")).as("died"))
        val t = u.groupBy(col("life").as("t"))
          .agg(sum(when(col("died"), 1).otherwise(0)).cast("long").as("d"),
            count(lit(1)).as("ended"))
        // the windows below run over the |distinct lifetimes| frame
        // (already aggregated) — bounded by days, never corpus-sized
        val wDesc = Window.orderBy(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val wAsc = Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, 0)
        t.withColumn("n_risk", sum("ended").over(wDesc))
          .filter(col("d") > 0)
          .withColumn("lsum",
            sum(when(col("d") < col("n_risk") && col("d") > 0,
              log(lit(1.0) - col("d").cast("double") / col("n_risk")))
              .otherwise(lit(0.0))).over(wAsc))
          .withColumn("zeroed",
            max(when(col("d") >= col("n_risk"), 1).otherwise(0)).over(wAsc))
          .select(col("t"), col("d"), col("n_risk"),
            when(col("zeroed") === 1, lit(0.0))
              .otherwise(round(exp(col("lsum")), 4)).as("survival"))
      }),

    // TIME-TO-CONVERT: minutes from a user's FIRST click to their first
    // purchase at-or-after it — conversion count, rate, and exact
    // p50/p90 delay (ops.Quantiles rank arithmetic, quantile_cont
    // parity). The funnel's "how long does conversion take" companion:
    // two per-user aggregates and a |users|-frame quantile, no corpus
    // window.
    QueryDef(
      "q_time_to_convert",
      Some("""WITH c AS (SELECT user_id, min(ts) AS fc FROM events
             |  WHERE event_type = 'click' GROUP BY 1),
             |p AS (SELECT c.user_id, fc, min(e.ts) AS fp
             |  FROM c JOIN events e ON e.user_id = c.user_id
             |    AND e.event_type = 'purchase' AND e.ts >= c.fc
             |  GROUP BY 1, 2),
             |d AS (SELECT (epoch_us(fp) - epoch_us(fc)) // 60000000
             |    AS delay_min FROM p),
             |qn AS (SELECT CAST(count(*) AS BIGINT) AS n_converted,
             |    round(quantile_cont(delay_min, 0.5), 4) AS p50_min,
             |    round(quantile_cont(delay_min, 0.9), 4) AS p90_min
             |  FROM d),
             |ck AS (SELECT CAST(count(*) AS BIGINT) AS n_clickers FROM c)
             |SELECT n_clickers, n_converted,
             |  round(n_converted::DOUBLE / n_clickers, 4) AS cvr,
             |  p50_min, p90_min
             |FROM qn, ck""".stripMargin),
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
        val c = ev.filter(col("event_type") === "click")
          .groupBy("user_id").agg(min("ts").as("fc"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"))
          .join(c, "user_id")
          .filter(col("ts") >= col("fc"))
          .groupBy("user_id", "fc").agg(min("ts").as("fp"))
        val d = p.select(
          expr("(unix_micros(fp) - unix_micros(fc)) div 60000000")
            .as("delay_min"), lit(1).as("g"))
        val qn = graft.ops.Quantiles.groupQuantiles(
            d, "g", "delay_min", Seq("p50_min" -> 0.5, "p90_min" -> 0.9))
          .select(col("n").as("n_converted"),
            round(col("p50_min"), 4).as("p50_min"),
            round(col("p90_min"), 4).as("p90_min"))
        val ck = c.agg(count(lit(1)).as("n_clickers"))
        qn.crossJoin(broadcast(ck))
          .select(col("n_clickers"), col("n_converted"),
            round(col("n_converted").cast("double") / col("n_clickers"), 4)
              .as("cvr"),
            col("p50_min"), col("p90_min"))
      }),

    // GINI CONCENTRATION of per-user spend: "is 1% of users driving all
    // the volume" — the inequality audit behind rate-limit and skew
    // decisions. Per-user totals in EXACT integer cents; ranks come from
    // ops.PrefixSum's range-partitioned running count (no global
    // row_number window over users); the closed-form
    // G = (2·Σi·yᵢ − (n+1)·Σy) / (n·Σy) is computed from exact BIGINT
    // sums — the only float op is the final division.
    QueryDef(
      "q_gini_value",
      Some("""WITH u AS (SELECT user_id,
             |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |r AS (SELECT y, row_number() OVER (ORDER BY y, user_id) AS i
             |  FROM u),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(i * y) AS BIGINT) AS siy
             |  FROM r)
             |SELECT n AS n_users, sy AS total_cents,
             |  CASE WHEN sy > 0
             |    THEN round((2.0 * siy - (n + 1) * sy) / (CAST(n AS DOUBLE) * sy), 6)
             |  END AS gini
             |FROM a""".stripMargin),
      (s, dir) => {
        val u = Tables.t(s, dir, "events")
          .select(col("user_id"),
            round(col("value") * 100, 0).cast("long").as("cents"))
          .groupBy("user_id").agg(sum("cents").as("y"))
        val ranked = graft.ops.PrefixSum.runningTotal(
          u, Seq(col("y"), col("user_id")), lit(1L), "i")
        val a = ranked.agg(count(lit(1)).as("n"), sum("y").as("sy"),
          sum(col("i") * col("y")).as("siy"))
        a.select(col("n").as("n_users"), col("sy").as("total_cents"),
          when(col("sy") > 0,
            round((lit(2.0) * col("siy") - (col("n") + 1) * col("sy"))
              / (col("n").cast("double") * col("sy")), 6)).as("gini"))
      }),

    // SAMPLE-RATIO MISMATCH guardrail: χ² of the observed per-variant
    // USER counts against the designed 50/50 split — the first sanity
    // check before reading any experiment metric (assignment bugs show
    // up here, not in the metrics). One distinct-user aggregate;
    // srm_flag fires at the p<0.05 critical value (χ²₁ = 3.841).
    QueryDef(
      "q_srm_check",
      Some(s"""WITH v AS (SELECT DISTINCT user_id,
             |    CASE WHEN $bucketSql < 50 THEN 'A' ELSE 'B' END AS variant
             |  FROM events),
             |c AS (SELECT
             |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_a,
             |    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_b
             |  FROM v)
             |SELECT n_a, n_b,
             |  round((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
             |      / ((n_a + n_b) / 2.0)
             |    + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
             |      / ((n_a + n_b) / 2.0), 4) AS chi2,
             |  ((n_a - (n_a + n_b) / 2.0) * (n_a - (n_a + n_b) / 2.0)
             |      / ((n_a + n_b) / 2.0)
             |    + (n_b - (n_a + n_b) / 2.0) * (n_b - (n_a + n_b) / 2.0)
             |      / ((n_a + n_b) / 2.0)) > 3.841 AS srm_flag
             |FROM c""".stripMargin),
      (s, dir) => {
        val c = assigned(s, dir)
          .select("user_id", "variant").distinct()
          .agg(
            sum(when(col("variant") === "A", 1).otherwise(0)).cast("long")
              .as("n_a"),
            sum(when(col("variant") === "B", 1).otherwise(0)).cast("long")
              .as("n_b"))
        val exp = (col("n_a") + col("n_b")) / 2.0
        val chi2 = (col("n_a") - exp) * (col("n_a") - exp) / exp +
          (col("n_b") - exp) * (col("n_b") - exp) / exp
        c.select(col("n_a"), col("n_b"),
          round(chi2, 4).as("chi2"), (chi2 > 3.841).as("srm_flag"))
      }),

    // DIFFERENCE-IN-DIFFERENCES: the 2×2 (variant × pre/post) interaction
    // estimate — the causal workhorse when assignment isn't randomized
    // per-exposure. Periods split at the deterministic global ts midpoint
    // (the q_cuped cut); DID = (B̄post−B̄pre) − (Āpost−Āpre) with the
    // pooled-variance normal SE over the four cell variances. One corpus
    // scan → four cells.
    QueryDef(
      "q_diff_in_diff",
      Some(s"""WITH bnd AS (SELECT min(epoch_us(ts)) +
             |    (max(epoch_us(ts)) - min(epoch_us(ts))) // 2 AS cut
             |  FROM events),
             |a AS (SELECT value,
             |    CASE WHEN $bucketSql < 50 THEN 'A' ELSE 'B' END AS variant,
             |    CASE WHEN epoch_us(ts) >= cut THEN 'post' ELSE 'pre' END
             |      AS period
             |  FROM events, bnd),
             |c AS (SELECT variant, period,
             |    CAST(count(*) AS BIGINT) AS n,
             |    avg(value) AS m, var_samp(value) AS v
             |  FROM a GROUP BY 1, 2),
             |w AS (SELECT
             |    max(CASE WHEN variant='A' AND period='pre' THEN m END) AS ap,
             |    max(CASE WHEN variant='A' AND period='post' THEN m END) AS aq,
             |    max(CASE WHEN variant='B' AND period='pre' THEN m END) AS bp,
             |    max(CASE WHEN variant='B' AND period='post' THEN m END) AS bq,
             |    sum(v / n) AS se2,
             |    CAST(sum(n) AS BIGINT) AS n
             |  FROM c)
             |SELECT n, round(aq - ap, 4) AS delta_a,
             |  round(bq - bp, 4) AS delta_b,
             |  round((bq - bp) - (aq - ap), 4) AS did,
             |  round(sqrt(se2), 6) AS se,
             |  round(((bq - bp) - (aq - ap)) / sqrt(se2), 4) AS z_stat
             |FROM w""".stripMargin),
      (s, dir) => {
        val ev = assigned(s, dir)
        val bnd = ev.agg((min(unix_micros(col("ts"))) +
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))) / 2)
          .cast("long").as("cut"))
        val c = ev.crossJoin(broadcast(bnd))
          .withColumn("period",
            when(unix_micros(col("ts")) >= col("cut"), "post")
              .otherwise("pre"))
          .groupBy("variant", "period")
          .agg(count(lit(1)).as("n"), avg("value").as("m"),
            var_samp(col("value")).as("v"))
        def cell(vr: String, p: String) =
          max(when(col("variant") === vr && col("period") === p, col("m")))
        val w = c.agg(
          cell("A", "pre").as("ap"), cell("A", "post").as("aq"),
          cell("B", "pre").as("bp"), cell("B", "post").as("bq"),
          sum(col("v") / col("n")).as("se2"), sum("n").as("n"))
        val did = (col("bq") - col("bp")) - (col("aq") - col("ap"))
        w.select(col("n"),
          round(col("aq") - col("ap"), 4).as("delta_a"),
          round(col("bq") - col("bp"), 4).as("delta_b"),
          round(did, 4).as("did"),
          round(sqrt(col("se2")), 6).as("se"),
          round(did / sqrt(col("se2")), 4).as("z_stat"))
      }),

    // POWER ANALYSIS / sample-size calculator from the corpus's own
    // moments: users-per-arm needed to detect a 5% lift of the mean
    // outcome at α=0.05 (two-sided), power 80% — n = 2σ²(z_{α/2}+z_β)²/δ²
    // over USER-level outcomes (the randomization unit). The experiment-
    // design query every platform runs before launching; one per-user
    // aggregate then one moment frame.
    QueryDef(
      "q_power_analysis",
      Some("""WITH u AS (SELECT user_id, sum(value) AS y
             |  FROM events GROUP BY 1),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             |    avg(y) AS mu, var_samp(y) AS v
             |  FROM u)
             |SELECT n_users, round(mu, 4) AS mean_outcome,
             |  round(sqrt(v), 4) AS sd,
             |  round(mu * 0.05, 4) AS mde,
             |  CAST(ceil(2 * v * (1.959964 + 0.841621) * (1.959964 + 0.841621)
             |    / (mu * 0.05 * mu * 0.05)) AS BIGINT) AS n_per_arm,
             |  round(2 * v * (1.959964 + 0.841621) * (1.959964 + 0.841621)
             |    / (mu * 0.05 * mu * 0.05) / n_users, 4) AS arms_of_corpus
             |FROM m""".stripMargin),
      (s, dir) => {
        val u = Tables.t(s, dir, "events")
          .groupBy("user_id").agg(sum("value").as("y"))
        val m = u.agg(count(lit(1)).as("n_users"), avg("y").as("mu"),
          var_samp(col("y")).as("v"))
        val zsum = lit(1.959964 + 0.841621)
        val delta = col("mu") * 0.05
        val nArm = lit(2) * col("v") * zsum * zsum / (delta * delta)
        m.select(col("n_users"),
          round(col("mu"), 4).as("mean_outcome"),
          round(sqrt(col("v")), 4).as("sd"),
          round(delta, 4).as("mde"),
          ceil(nArm).cast("long").as("n_per_arm"),
          round(nArm / col("n_users"), 4).as("arms_of_corpus"))
      }),

    // JACKKNIFE confidence interval for the mean outcome: 20 user-level
    // delete-one-group pseudo-replicates (users hash-bucketed so the
    // dependence unit — the user — leaves whole), leave-one-out means
    // from per-bucket sums, variance (B−1)/B·Σ(m_b−m̄)², normal CI.
    // The resampling-free way to put an error bar on any engine
    // statistic: ONE corpus scan, then 20-row frames; every engine
    // replays the identical bucketing via sha60.
    QueryDef(
      "q_jackknife_ci",
      Some(s"""WITH e AS (SELECT value,
             |    ${graft.expressions.Hashing.sha60Sql(
                     "CAST(user_id AS VARCHAR)")} % 20 AS b
             |  FROM events),
             |g AS (SELECT b, CAST(count(*) AS BIGINT) AS n, sum(value) AS s
             |  FROM e GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS n, sum(s) AS s,
             |    CAST(count(*) AS BIGINT) AS nb
             |  FROM g),
             |loo AS (SELECT g.b, (t.s - g.s) / (t.n - g.n) AS m
             |  FROM g, t),
             |v AS (SELECT avg(m) AS mbar,
             |    sum((m - (SELECT avg(m) FROM loo))
             |      * (m - (SELECT avg(m) FROM loo))) AS ss,
             |    CAST(count(*) AS BIGINT) AS nb
             |  FROM loo)
             |SELECT t.n, round(t.s / t.n, 4) AS mean,
             |  round(sqrt((v.nb - 1.0) / v.nb * v.ss), 6) AS se,
             |  round(t.s / t.n - 1.96 * sqrt((v.nb - 1.0) / v.nb * v.ss), 4)
             |    AS ci_lo,
             |  round(t.s / t.n + 1.96 * sqrt((v.nb - 1.0) / v.nb * v.ss), 4)
             |    AS ci_hi
             |FROM t, v""".stripMargin),
      (s, dir) => {
        val g = Tables.t(s, dir, "events")
          .withColumn("b",
            graft.expressions.Hashing.sha60(col("user_id").cast("string"))
              % 20)
          .groupBy("b")
          .agg(count(lit(1)).as("n"), sum("value").as("s"))
        val t = g.agg(sum("n").as("tn"), sum("s").as("ts"))
        val loo = g.crossJoin(broadcast(t))
          .select(((col("ts") - col("s")) / (col("tn") - col("n"))).as("m"))
        val mbar = loo.agg(avg("m").as("mbar"))
        val v = loo.crossJoin(broadcast(mbar))
          .agg(sum((col("m") - col("mbar")) * (col("m") - col("mbar")))
            .as("ss"), count(lit(1)).as("nb"))
        val se = sqrt((col("nb") - 1.0) / col("nb") * col("ss"))
        t.crossJoin(broadcast(v))
          .select(col("tn").as("n"),
            round(col("ts") / col("tn"), 4).as("mean"),
            round(se, 6).as("se"),
            round(col("ts") / col("tn") - lit(1.96) * se, 4).as("ci_lo"),
            round(col("ts") / col("tn") + lit(1.96) * se, 4).as("ci_hi"))
      }),

    // CHI-SQUARE INDEPENDENCE of event_type × variant over event counts —
    // "does the assignment skew what people do". Uses the grid-complete
    // identity χ² = Σ o²/e − N (cells with o=0 contribute nothing), so
    // absent cells need no outer-join scaffolding; every input is an
    // exact BIGINT count and the only float work is the final Σ o²/e.
    // One corpus scan, then |R×C|-sized frames and broadcast joins.
    QueryDef(
      "q_chi_square",
      Some(s"""WITH a AS (SELECT event_type,
             |    CASE WHEN $bucketSql < 50 THEN 'A' ELSE 'B' END AS variant
             |  FROM events),
             |o AS (SELECT event_type, variant,
             |    CAST(count(*) AS BIGINT) AS o
             |  FROM a GROUP BY 1, 2),
             |rt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
             |  FROM o GROUP BY 1),
             |ct AS (SELECT variant, CAST(sum(o) AS BIGINT) AS ct
             |  FROM o GROUP BY 1),
             |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
             |s AS (SELECT
             |    CAST(count(DISTINCT o.event_type) AS BIGINT) AS r,
             |    CAST(count(DISTINCT o.variant) AS BIGINT) AS c,
             |    sum(o.o * o.o * n / (CAST(rt.rt AS DOUBLE) * ct.ct)) AS so2e,
             |    any_value(n) AS n
             |  FROM o JOIN rt USING (event_type) JOIN ct USING (variant), tot)
             |SELECT n AS n_events, (r - 1) * (c - 1) AS dof,
             |  round(so2e - n, 4) AS chi2
             |FROM s""".stripMargin),
      (s, dir) => {
        val o = assigned(s, dir)
          .groupBy("event_type", "variant")
          .agg(count(lit(1)).as("o"))
        val rt = o.groupBy("event_type").agg(sum("o").as("rt"))
        val ct = o.groupBy("variant").agg(sum("o").as("ct"))
        val tot = o.agg(sum("o").as("n"))
        o.join(broadcast(rt), "event_type")
          .join(broadcast(ct), "variant")
          .crossJoin(broadcast(tot))
          .agg(
            countDistinct("event_type").as("r"),
            countDistinct("variant").as("c"),
            sum(col("o") * col("o") * col("n")
              / (col("rt").cast("double") * col("ct"))).as("so2e"),
            first("n").as("n"))
          .select(col("n").as("n_events"),
            ((col("r") - 1) * (col("c") - 1)).as("dof"),
            round(col("so2e") - col("n"), 4).as("chi2"))
      }),

    // MANN–WHITNEY U per event type: the rank-based (distribution-free)
    // A/B comparison with average-rank tie handling and the tie-corrected
    // normal approximation. Ranks come WITHOUT any corpus-sized window:
    // values are first aggregated per (type, value) — ties collapse to
    // one row — then ops.PrefixSum's range-partitioned running count over
    // the global (type, value) order gives cumulative counts, and the
    // per-type rank is recovered by subtracting the earlier-types offset
    // (a |types|² self-join, window-free). avg_rank is a multiple of ½
    // and every sum of them is exact in double (< 2⁵³), so u_stat is
    // deterministic cross-engine; only z rides a rounded float.
    QueryDef(
      "q_mannwhitney",
      Some(s"""WITH a AS (SELECT event_type, value,
             |    CASE WHEN $bucketSql < 50 THEN 'A' ELSE 'B' END AS variant
             |  FROM events),
             |g AS (SELECT event_type, value,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS na
             |  FROM a GROUP BY 1, 2),
             |r AS (SELECT event_type, n, na,
             |    sum(n) OVER (PARTITION BY event_type ORDER BY value
             |      ROWS UNBOUNDED PRECEDING) - (n - 1) / 2.0 AS avg_rank
             |  FROM g),
             |t AS (SELECT event_type,
             |    CAST(sum(na) AS BIGINT) AS n_a,
             |    CAST(sum(n - na) AS BIGINT) AS n_b,
             |    sum(na * avg_rank) AS r_a,
             |    CAST(sum(n * n * n - n) AS BIGINT) AS ties3
             |  FROM r GROUP BY 1)
             |SELECT event_type, n_a, n_b,
             |  round(r_a - n_a * (n_a + 1) / 2.0, 1) AS u_stat,
             |  CASE WHEN n_a > 0 AND n_b > 0
             |      AND (n_a + n_b + 1) - ties3
             |        / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)) > 0
             |    THEN round((r_a - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
             |      / sqrt(n_a * n_b / 12.0 * ((n_a + n_b + 1) - ties3
             |        / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1)))), 4)
             |  END AS z_stat
             |FROM t""".stripMargin),
      (s, dir) => {
        val g = assigned(s, dir)
          .groupBy("event_type", "value")
          .agg(count(lit(1)).as("n"),
            sum(when(col("variant") === "A", 1).otherwise(0)).cast("long")
              .as("na"))
        val ranked = graft.ops.PrefixSum.runningTotal(
          g, Seq(col("event_type"), col("value")), col("n"), "cum")
        // earlier-types count offset: |types|² triangle join, no window
        val tot = g.groupBy("event_type").agg(sum("n").as("tot"))
        val off = tot.as("x")
          .join(tot.as("y"), col("y.event_type") < col("x.event_type"),
            "left")
          .groupBy(col("x.event_type").as("event_type"))
          .agg(coalesce(sum(col("y.tot")), lit(0L)).as("off"))
        val t = ranked.join(broadcast(off), "event_type")
          .withColumn("avg_rank",
            (col("cum") - col("off")) - (col("n") - 1) / 2.0)
          .groupBy("event_type")
          .agg(sum("na").as("n_a"),
            sum(col("n") - col("na")).as("n_b"),
            sum(col("na") * col("avg_rank")).as("r_a"),
            sum(col("n") * col("n") * col("n") - col("n")).as("ties3"))
        val nT = col("n_a") + col("n_b")
        val tieAdj = (nT + 1) - col("ties3") /
          (nT.cast("double") * (nT - 1))
        val uA = col("r_a") - col("n_a") * (col("n_a") + 1) / 2.0
        val ok = col("n_a") > 0 && col("n_b") > 0 && tieAdj > 0
        t.select(col("event_type"), col("n_a"), col("n_b"),
          round(uA, 1).as("u_stat"),
          when(ok, round((uA - col("n_a") * col("n_b") / 2.0)
            / sqrt(col("n_a") * col("n_b") / 12.0 * tieAdj), 4))
            .as("z_stat"))
      }),

    // TWO-PROPORTION z-TEST on user-level conversion (≥1 purchase):
    // the binary-outcome companion to Welch's t — pooled-variance z on
    // the A/B conversion rates. One per-user aggregate, then a single
    // 4-count frame; all counts exact BIGINT, z the only rounded float.
    QueryDef(
      "q_prop_ztest",
      Some(s"""WITH u AS (SELECT user_id,
             |    CASE WHEN $bucketSql < 50 THEN 'A' ELSE 'B' END AS variant,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      AS conv
             |  FROM events GROUP BY 1, 2),
             |c AS (SELECT
             |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_a,
             |    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_b,
             |    CAST(sum(CASE WHEN variant = 'A' THEN conv ELSE 0 END)
             |      AS BIGINT) AS x_a,
             |    CAST(sum(CASE WHEN variant = 'B' THEN conv ELSE 0 END)
             |      AS BIGINT) AS x_b
             |  FROM u),
             |z AS (SELECT n_a, n_b, x_a, x_b,
             |    (x_a + x_b) / CAST(n_a + n_b AS DOUBLE) AS p
             |  FROM c)
             |SELECT n_a, n_b, x_a, x_b,
             |  round(x_a / CAST(n_a AS DOUBLE), 4) AS p_a,
             |  round(x_b / CAST(n_b AS DOUBLE), 4) AS p_b,
             |  CASE WHEN n_a > 0 AND n_b > 0 AND p > 0 AND p < 1
             |    THEN round((x_a / CAST(n_a AS DOUBLE)
             |        - x_b / CAST(n_b AS DOUBLE))
             |      / sqrt(p * (1 - p) * (1.0 / n_a + 1.0 / n_b)), 4)
             |  END AS z_stat
             |FROM z""".stripMargin),
      (s, dir) => {
        val u = assigned(s, dir)
          .groupBy("user_id", "variant")
          .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("conv"))
        val c = u.agg(
          sum(when(col("variant") === "A", 1).otherwise(0)).cast("long")
            .as("n_a"),
          sum(when(col("variant") === "B", 1).otherwise(0)).cast("long")
            .as("n_b"),
          sum(when(col("variant") === "A", col("conv")).otherwise(0))
            .cast("long").as("x_a"),
          sum(when(col("variant") === "B", col("conv")).otherwise(0))
            .cast("long").as("x_b"))
        val p = (col("x_a") + col("x_b")) /
          (col("n_a") + col("n_b")).cast("double")
        val pa = col("x_a") / col("n_a").cast("double")
        val pb = col("x_b") / col("n_b").cast("double")
        val ok = col("n_a") > 0 && col("n_b") > 0 && p > 0 && p < 1
        c.select(col("n_a"), col("n_b"), col("x_a"), col("x_b"),
          round(pa, 4).as("p_a"), round(pb, 4).as("p_b"),
          when(ok, round((pa - pb)
            / sqrt(p * (lit(1) - p) * (lit(1.0) / col("n_a")
              + lit(1.0) / col("n_b"))), 4)).as("z_stat"))
      })
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.Fuzzy
import graft.Materialize._

/** Analytic / reshaping operators round 3b: unpivot (wide→long melt),
  * ROLLUP subtotals, semi-structured JSON extraction, and fuzzy
  * (edit-distance) matching. Money/ints summed exactly; JSON scalars
  * extracted with the same path expressions both engines.
  */
object AnalyticQueries {

  val defs: Seq[QueryDef] = Seq(

    // Wide→long melt of the four lineitem measures (the inverse of the
    // conditional-sum pivot) via Spark's native unpivot — one generator,
    // zero shuffle.
    QueryDef(
      "q_unpivot",
      Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
             |       l_quantity AS val FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
             |FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
             |FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
             |FROM lineitem""".stripMargin),
      (s, dir) => Tables.t(s, dir, "lineitem").unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "measure", "val")),

    // ROLLUP subtotal hierarchy over returnflag×linestatus with grouping
    // flags (the reporting shape BI layers ask of a warehouse). Counts and
    // integer-cents sums — exact under any grouping-set evaluation order.
    QueryDef(
      "q_rollup",
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(grouping(l_returnflag) AS INT) AS g_flag,
             |  CAST(grouping(l_linestatus) AS INT) AS g_status,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
             |    AS BIGINT) AS price_cents
             |FROM lineitem
             |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin),
      (s, dir) => Tables.t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          count(lit(1)).as("n"),
          sum(col("cents")).as("price_cents"))),

    // Semi-structured extraction: pull a typed scalar out of the events
    // JSON props column and aggregate it — the schema-on-read step every
    // event pipeline starts with.
    QueryDef(
      "q_json_props",
      Some("""SELECT event_type,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
             |    AS sum_k,
             |  round(sum(CAST(json_extract(props, '$.k') AS INT))::DOUBLE
             |    / count(*), 4) AS avg_k
             |FROM events GROUP BY event_type""".stripMargin),
      (s, dir) => Tables.t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("k").cast("long")).as("sum_k"),
          round(sum(col("k").cast("long")).cast("double") / count(lit(1)), 4)
            .as("avg_k"))),

    // Fuzzy identity matching: customer-name pairs within edit distance 1
    // on a bounded slice. Candidates are length-blocked equi-join (the
    // oracle is the unblocked theta join — same result, quadratic plan).
    QueryDef(
      "q_fuzzy_match",
      Some("""WITH c AS (SELECT c_custkey, c_name FROM customer
             |  WHERE c_custkey < 200)
             |SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             |  CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
             |FROM c a JOIN c b ON a.c_custkey < b.c_custkey
             |WHERE levenshtein(a.c_name, b.c_name) <= 1""".stripMargin),
      (s, dir) => Fuzzy.editDistancePairs(
        Tables.t(s, dir, "customer").filter(col("c_custkey") < 200)
          .select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name", maxDist = 1))
,

    // GOLDEN-RECORD entity resolution — the full MDM composition the
    // reference needs for HubSpot identity hygiene: fuzzy-match pairs
    // (edit distance ≤ 1, BLOCKED on same nation — without the block the
    // sequential fixture names chain transitively into one giant
    // cluster) → connected components (large-star contraction) → one
    // survivor row per cluster (min-key member's name, member count,
    // summed balances). Every stage is independently gated
    // (q_fuzzy_match, q_cc_star); this gates their composition plus the
    // golden-row join-back.
    QueryDef(
      "q_golden_record",
      Some("""WITH RECURSIVE c AS (SELECT c_custkey, c_name, c_acctbal, c_nationkey
             |  FROM customer WHERE c_custkey < 200),
             |p AS (SELECT a.c_custkey AS s, b.c_custkey AS d
             |  FROM c a JOIN c b ON a.c_custkey < b.c_custkey
             |  WHERE levenshtein(a.c_name, b.c_name) <= 1
             |    AND a.c_nationkey = b.c_nationkey),
             |e AS (SELECT s, d FROM p UNION SELECT d, s FROM p),
             |walk(n, l) AS (SELECT DISTINCT s, s FROM e
             |  UNION SELECT e.d, walk.l FROM walk JOIN e ON e.s = walk.n),
             |cc AS (SELECT n AS c_custkey, min(l) AS cluster_id
             |  FROM walk GROUP BY n),
             |m AS (SELECT c.c_custkey,
             |    coalesce(cc.cluster_id, c.c_custkey) AS cluster_id,
             |    c.c_name, c.c_acctbal
             |  FROM c LEFT JOIN cc USING (c_custkey))
             |SELECT m.cluster_id, CAST(count(*) AS INT) AS n_members,
             |  g.c_name AS golden_name,
             |  round(sum(m.c_acctbal), 2) AS total_acctbal
             |FROM m JOIN c g ON g.c_custkey = m.cluster_id
             |GROUP BY m.cluster_id, g.c_name""".stripMargin),
      (s, dir) => {
        val cs = Tables.t(s, dir, "customer")
          .filter(col("c_custkey") < 200)
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
        val nat = cs.select(col("c_custkey"), col("c_nationkey"))
        val pairs = Fuzzy.editDistancePairs(
            cs.select("c_custkey", "c_name"), "c_custkey", "c_name", maxDist = 1)
          .join(nat.select(col("c_custkey").as("id_a"),
            col("c_nationkey").as("__na")), Seq("id_a"))
          .join(nat.select(col("c_custkey").as("id_b"),
            col("c_nationkey").as("__nb")), Seq("id_b"))
          .filter(col("__na") === col("__nb"))
        val labels = graft.dedup.ConnectedComponents.labels(
          pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
        val m = cs.join(labels, col("c_custkey") === col("node"), "left")
          .select(col("c_custkey"),
            coalesce(col("cluster_id"), col("c_custkey")).as("cluster_id"),
            col("c_acctbal"))
        m.groupBy("cluster_id")
          .agg(count(lit(1)).cast("int").as("n_members"),
            round(sum("c_acctbal"), 2).as("total_acctbal"))
          .join(cs.select(col("c_custkey").as("cluster_id"),
            col("c_name").as("golden_name")), Seq("cluster_id"))
          .select("cluster_id", "n_members", "golden_name", "total_acctbal")
      }),

    // FELLEGI–SUNTER probabilistic record linkage over the same blocked
    // candidate space as q_golden_record: per-field agreement indicators
    // (name within edit distance 1, nation, segment, 1000-unit account
    // balance band in exact integer cents), a
    // log₂(m/u)-style weight per indicator — fixed LITERAL weights, the
    // production shape where m/u come from an offline EM fit; literals
    // also remove any cross-engine log() ulp risk — and a total match
    // score classified link / possible / nonlink. Every decision
    // threshold sits ≥0.6 from any reachable score (16 combos,
    // verified), so float comparisons can't straddle engines. Scale:
    // candidates come from Fuzzy.editDistancePairs' q-gram+length
    // blocking (exact for the edit bound, never all-pairs); scoring is
    // one codegen'd projection per candidate.
    QueryDef(
      "q_fs_linkage",
      Some("""WITH c AS (SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
             |    c_nationkey FROM customer WHERE c_custkey < 500),
             |p AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             |    levenshtein(a.c_name, b.c_name) AS dist,
             |    a.c_nationkey = b.c_nationkey AS agr_nation,
             |    a.c_mktsegment = b.c_mktsegment AS agr_segment,
             |    CAST(round(a.c_acctbal * 100, 0) AS BIGINT) // 100000 =
             |      CAST(round(b.c_acctbal * 100, 0) AS BIGINT) // 100000
             |      AS agr_band
             |  FROM c a JOIN c b ON a.c_custkey < b.c_custkey
             |  WHERE levenshtein(a.c_name, b.c_name) <= 2),
             |s AS (SELECT id_a, id_b, dist <= 1 AS agr_name,
             |    agr_nation, agr_segment, agr_band,
             |    (CASE WHEN dist <= 1 THEN 9.8919::DOUBLE
             |       ELSE -4.3205::DOUBLE END
             |     + CASE WHEN agr_nation THEN 4.5699::DOUBLE
             |       ELSE -4.2630::DOUBLE END
             |     + CASE WHEN agr_segment THEN 2.1699::DOUBLE
             |       ELSE -3.0::DOUBLE END
             |     + CASE WHEN agr_band THEN 4.4919::DOUBLE
             |       ELSE -3.2630::DOUBLE END) AS score
             |  FROM p)
             |SELECT id_a, id_b, agr_name, agr_nation, agr_segment,
             |  agr_band, round(score, 4) AS score,
             |  CASE WHEN score >= 10 THEN 'link'
             |    WHEN score >= 0 THEN 'possible'
             |    ELSE 'nonlink' END AS decision
             |FROM s""".stripMargin),
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
          .filter(col("c_custkey") < 500)
          .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment",
            "c_nationkey")
        val cand = graft.ops.Fuzzy.editDistancePairs(
          c.select("c_custkey", "c_name"), "c_custkey", "c_name",
          maxDist = 2)
        val fields = c.select(col("c_custkey"),
          expr("CAST(round(c_acctbal * 100, 0) AS BIGINT) div 100000")
            .as("ph"),
          col("c_mktsegment").as("sg"), col("c_nationkey").as("na"))
        val p = cand
          .join(fields.select(col("c_custkey").as("id_a"),
            col("ph").as("ph_a"), col("sg").as("sg_a"),
            col("na").as("na_a")), Seq("id_a"))
          .join(fields.select(col("c_custkey").as("id_b"),
            col("ph").as("ph_b"), col("sg").as("sg_b"),
            col("na").as("na_b")), Seq("id_b"))
          .withColumn("agr_name", col("dist") <= 1)
          .withColumn("agr_nation", col("na_a") === col("na_b"))
          .withColumn("agr_segment", col("sg_a") === col("sg_b"))
          .withColumn("agr_band", col("ph_a") === col("ph_b"))
        val score =
          when(col("agr_name"), lit(9.8919)).otherwise(lit(-4.3205)) +
          when(col("agr_nation"), lit(4.5699)).otherwise(lit(-4.2630)) +
          when(col("agr_segment"), lit(2.1699)).otherwise(lit(-3.0)) +
          when(col("agr_band"), lit(4.4919)).otherwise(lit(-3.2630))
        p.withColumn("score", score)
          .select(col("id_a"), col("id_b"), col("agr_name"),
            col("agr_nation"), col("agr_segment"), col("agr_band"),
            round(col("score"), 4).as("score"),
            when(col("score") >= 10, "link")
              .when(col("score") >= 0, "possible")
              .otherwise("nonlink").as("decision"))
      }),

    // PageRank (5 power iterations, d = 0.85) over the symmetrized
    // customer↔supplier purchase graph — iterative graph centrality as a
    // first-class batch op. Node ids are disjoint by parity (customer·2,
    // supplier·2+1). The oracle replays the identical recursion in a
    // recursive CTE with per-round GROUP BY; both engines start uniform
    // and drop dangling mass, so the 6-decimal round compares the same
    // quantity.
    QueryDef(
      "q_pagerank",
      Some("""WITH RECURSIVE
             |e0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
             |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
             |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
             |deg AS (SELECT src, count(*) AS d FROM e GROUP BY 1),
             |nn AS (SELECT count(*)::DOUBLE AS n FROM deg),
             |pr(iter, node, r) AS (
             |  SELECT 0, src, 1.0::DOUBLE / n FROM deg CROSS JOIN nn
             |  UNION ALL
             |  SELECT pr.iter + 1, e.dst,
             |    0.15::DOUBLE / nn.n + 0.85::DOUBLE * sum(pr.r / deg.d)
             |  FROM pr JOIN e ON e.src = pr.node
             |  JOIN deg ON deg.src = e.src
             |  CROSS JOIN nn
             |  WHERE pr.iter < 5
             |  GROUP BY pr.iter, e.dst, nn.n)
             |SELECT node, round(r, 6) AS rank
             |FROM pr WHERE iter = 5""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val l = Tables.t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        val fwd = o.join(l, col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
          // materialize before the symmetrize: the swapped union branch
          // otherwise re-runs the scan→join→distinct derivation (the
          // TraversalQueries.edges() lesson — two ~0.55 s jobs measured)
          .graftCheckpoint()
        val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        graft.ops.PageRank.ranks(edges, iters = 5)
          .select(col("node"), round(col("rank"), 6).as("rank"))
      }),

    // 2-D SKYLINE (Pareto front: cheapest-and-smallest parts — no other
    // part is <= on both axes with < on one). In 2-D the skyline reduces
    // to a lexicographic sort + strict prefix-min: a point survives iff
    // every strictly-prior point (price, then size order) has larger
    // size. The prefix-min runs on ops/PrefixSum's range-partitioned
    // two-phase scan (per-partition strict-prefix window + broadcast
    // exclusive carry, the q_pack_sequences machinery) — never a global
    // empty-partition-spec Window; the oracle expresses the same strict
    // prefix-min with a plain global window, which DuckDB can afford at
    // oracle scale. PlanSpec asserts the executed plan has no global
    // Window node.
    QueryDef(
      "q_skyline",
      Some("""WITH p AS (SELECT DISTINCT p_retailprice AS price,
             |    CAST(p_size AS BIGINT) AS psize FROM part)
             |SELECT price, psize FROM (
             |  SELECT price, psize, min(psize) OVER (ORDER BY price, psize
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
             |  FROM p)
             |WHERE pm IS NULL OR pm > psize""".stripMargin),
      (s, dir) => {
        val distinctPoints = Tables.t(s, dir, "part")
          .select(col("p_retailprice").as("price"),
            col("p_size").cast("long").as("psize"))
          .distinct()
        graft.ops.PrefixSum
          .runningMinExclusive(distinctPoints,
            Seq(col("price"), col("psize")), col("psize"), "pm")
          .filter(col("pm").isNull || col("pm") > col("psize"))
          .select("price", "psize")
      }),

    // SESSION PATH ANALYSIS: the event-type transition matrix — per user,
    // consecutive events (by ts, event_id) form (from → to) transitions;
    // counts roll up with P(to|from). The Markov view of user journeys
    // every product-analytics suite draws. The lag window is partitioned
    // per user (bounded state); row counts collapse map-side.
    QueryDef(
      "q_markov_transitions",
      Some("""WITH s AS (SELECT user_id, event_type, ts, event_id,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev
             |  FROM events),
             |t AS (SELECT prev AS from_type, event_type AS to_type,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
             |f AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
             |  FROM t GROUP BY 1)
             |SELECT from_type, to_type, n,
             |  round(n::DOUBLE / n_from, 4) AS p
             |FROM t JOIN f USING (from_type)""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val t = Tables.t(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev").as("from_type"),
            col("event_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val f = t.groupBy("from_type").agg(sum("n").as("n_from"))
        t.join(broadcast(f), "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            round(col("n").cast("double") / col("n_from"), 4).as("p"))
      }),

    // MARKET-BASKET association rules at the brand level:
    // support/confidence/lift for brand pairs co-purchased in one order —
    // the cross-sell report of the reference's commerce marts. Baskets
    // are DISTINCT (order, brand) with the 25-brand dim broadcast; the
    // pair join is an equi-join on the order key (never a cross join),
    // and the n_ab ≥ 50 floor bounds the output like any support
    // threshold does at scale.
    QueryDef(
      "q_basket_lift",
      Some("""WITH b AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS brand
             |  FROM lineitem JOIN part ON p_partkey = l_partkey),
             |nn AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM b),
             |s AS (SELECT brand, CAST(count(*) AS BIGINT) AS n1 FROM b GROUP BY 1),
             |p AS (SELECT x.brand AS brand_a, y.brand AS brand_b,
             |    CAST(count(*) AS BIGINT) AS n_ab
             |  FROM b x JOIN b y ON x.ok = y.ok AND x.brand < y.brand
             |  GROUP BY 1, 2 HAVING count(*) >= 50)
             |SELECT brand_a, brand_b, n_ab,
             |  round(n_ab::DOUBLE / nn.n, 4) AS support,
             |  round(n_ab::DOUBLE / sa.n1, 4) AS confidence,
             |  round(n_ab::DOUBLE * nn.n / (sa.n1 * sb.n1), 4) AS lift
             |FROM p
             |JOIN s sa ON sa.brand = brand_a
             |JOIN s sb ON sb.brand = brand_b
             |CROSS JOIN nn""".stripMargin),
      (s, dir) => {
        val b = Tables.t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
          .join(broadcast(Tables.t(s, dir, "part")
            .select("p_partkey", "p_brand")),
            col("p_partkey") === col("l_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
          .distinct()
          // four consumers (N, supports, both pair sides) — materialize
          // once; column pruning pushes distinct projections below each
          // exchange, so ReuseExchange alone does not unify the scans
          .graftCheckpoint()
        val nn = b.agg(countDistinct("ok").as("n"))
        val sup = b.groupBy("brand").agg(count(lit(1)).as("n1"))
        val pairs = b.select(col("ok"), col("brand").as("brand_a"))
          .join(b.select(col("ok"), col("brand").as("brand_b")), "ok")
          .filter(col("brand_a") < col("brand_b"))
          .groupBy("brand_a", "brand_b")
          .agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 50)
        pairs
          .join(broadcast(sup.select(col("brand").as("brand_a"),
            col("n1").as("na"))), "brand_a")
          .join(broadcast(sup.select(col("brand").as("brand_b"),
            col("n1").as("nb"))), "brand_b")
          .crossJoin(broadcast(nn))
          .select(col("brand_a"), col("brand_b"), col("n_ab"),
            round(col("n_ab").cast("double") / col("n"), 4).as("support"),
            round(col("n_ab").cast("double") / col("na"), 4).as("confidence"),
            round(col("n_ab").cast("double") * col("n")
              / (col("na") * col("nb")), 4).as("lift"))
      }),

    // PER-TYPE METRIC TREND: OLS slope/intercept/R2 of daily event counts
    // against the day index - the "is this metric growing" line every BI
    // dashboard fits. All five moments (n, Sx, Sy, Sxy, Sxx, Syy) are
    // EXACT integer sums over a |types|x|days| frame (map-side partial,
    // two stacked aggregates); the only float work is the three final
    // ratios - round(4) absorbs last-ulp division differences. The day
    // index is anchored on the GLOBAL min day (one-row broadcast), so
    // intercepts are comparable across types.
    QueryDef(
      "q_trend_ols",
      Some("""WITH d AS (SELECT event_type, date_trunc('day', ts) AS day,
             |    CAST(count(*) AS BIGINT) AS y
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT min(day) AS mind FROM d),
             |xy AS (SELECT event_type,
             |    CAST(date_diff('day', mind, day) AS BIGINT) AS x, y
             |  FROM d, m),
             |g AS (SELECT event_type,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx,
             |    CAST(sum(y * y) AS BIGINT) AS syy
             |  FROM xy GROUP BY 1)
             |SELECT event_type, n,
             |  CASE WHEN dd > 0 THEN round(nm / dd, 4) END AS slope,
             |  CASE WHEN dd > 0 THEN round((sy - nm / dd * sx) / n, 4) END
             |    AS intercept,
             |  CASE WHEN dd > 0 AND dy > 0
             |    THEN round(nm * nm / (dd * dy), 4) END AS r2
             |FROM (SELECT *,
             |    CAST(n AS DOUBLE) * sxx - sx * sx AS dd,
             |    CAST(n AS DOUBLE) * syy - sy * sy AS dy,
             |    CAST(n AS DOUBLE) * sxy - sx * sy AS nm
             |  FROM g)""".stripMargin),
      (s, dir) => {
        val d = Tables.t(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("y"))
        val m = d.agg(min("day").as("mind"))
        val xy = d.crossJoin(broadcast(m))
          .select(col("event_type"),
            datediff(col("day"), col("mind")).cast("long").as("x"),
            col("y"))
        val g = xy.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        // degenerate fits are NULL in BOTH engines (one-day types → zero
        // x-variance; constant counts → zero y-variance), never a NaN
        // whose NULL-vs-NaN rendering moved across DuckDB versions
        val den = col("n").cast("double") * col("sxx") - col("sx") * col("sx")
        val dy = col("n").cast("double") * col("syy") - col("sy") * col("sy")
        val num = col("n").cast("double") * col("sxy") - col("sx") * col("sy")
        g.select(col("event_type"), col("n"),
          when(den > 0, round(num / den, 4)).as("slope"),
          when(den > 0,
            round((col("sy") - num / den * col("sx")) / col("n"), 4))
            .as("intercept"),
          when(den > 0 && dy > 0, round(num * num / (den * dy), 4)).as("r2"))
      })
  )
}

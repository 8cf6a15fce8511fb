package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.Materialize._

/** Iterative-traversal and sweep-line operators: BFS shortest path,
  * pointer-doubling hierarchy closure, interval union, global concurrency
  * peak, and per-source corpus caps. These are the shapes a warehouse
  * usually punts to a graph engine or a driver loop; here each one is a
  * bounded number of co-partitioned joins/windows, oracle-verified against
  * DuckDB's recursive CTEs.
  *
  * Scale designs:
  *   - BFS/doubling rounds shuffle only the frontier/ancestor table
  *     (|V| rows), never the edge set per round beyond the equi-join;
  *     `localCheckpoint` per round truncates the exploding lineage exactly
  *     like ConnectedComponents (dedup/ConnectedComponents.scala).
  *   - the interval/window queries keep every window PARTITIONED (by user
  *     or by physical range partition via ops/PrefixSum) — no empty
  *     partition spec anywhere (PlanSpec guards).
  */
object TraversalQueries {

  /** Bipartite customer↔supplier graph, same node encoding as q_pagerank
    * (customer c → 2c, supplier s → 2s+1): undirected via both directions.
    */
  private def edges(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.t(s, dir, "orders").select("o_orderkey", "o_custkey")
    val l = Tables.t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val e0 = o.join(l, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      .distinct()
      // materialize BEFORE symmetrizing: the two union branches project
      // different column orders, so column pruning pushes distinct
      // physical plans below each branch and ReuseExchange unifies
      // nothing — without this the scan→join→distinct derivation runs
      // TWICE (measured as two ~0.55 s jobs in every consumer query)
      .graftCheckpoint()
    e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  val defs: Seq[QueryDef] = Seq(

    // Multi-source BFS shortest path (hop count) from three seed
    // customers, depth-capped at 4 (the bipartite graph's diameter at any
    // fixture SF is ≤ 4 — dense customer↔supplier incidence). Per round:
    // frontier ⨝ edges on src, then a min-dist combine — the frontier
    // (≤ seeds × |V| rows) is the only thing that reshuffles, and newly
    // settled nodes leave the frontier, so late rounds are near-empty.
    QueryDef(
      "q_shortest_path",
      Some("""WITH RECURSIVE
             |e0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
             |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
             |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
             |bfs(seed, node, d) AS (
             |  SELECT DISTINCT src, src, 0 FROM e WHERE src IN (0, 2, 4)
             |  UNION
             |  SELECT bfs.seed, e.dst, bfs.d + 1
             |  FROM bfs JOIN e ON e.src = bfs.node WHERE bfs.d < 4)
             |SELECT seed, node, CAST(min(d) AS INT) AS dist
             |FROM bfs GROUP BY seed, node""".stripMargin),
      (s, dir) => {
        val e = edges(s, dir).graftCheckpoint()
        val seeds = Seq(0L, 2L, 4L)
        // semi-join the literal seed list against the edge sources: the
        // oracle seeds FROM e WHERE src IN (...), so a seed customer with
        // no orders must NOT contribute a (seed, seed, 0) row (r9 advice)
        var dist = s.createDataFrame(seeds.map(x => (x, x)))
          .toDF("seed", "node")
          .join(e.select(col("src").as("node")).distinct(), Seq("node"),
            "left_semi")
          .withColumn("dist", lit(0).cast("int"))
        for (i <- 1 to 4) {
          val frontier = dist.filter(col("dist") === i - 1)
          val next = frontier
            .join(e, col("node") === col("src"))
            .select(col("seed"), col("dst").as("node"),
              lit(i).cast("int").as("dist"))
          dist = dist.unionByName(next)
            .groupBy("seed", "node")
            .agg(min("dist").as("dist"))
            .graftCheckpoint()
        }
        dist
      }),

    // DEGREE ASSORTATIVITY of the customer↔supplier graph: the Pearson
    // correlation of endpoint degrees over the symmetrized edge list —
    // do hubs attach to hubs (r>0) or to leaves (r<0)? The one-number
    // graph-science diagnostic that decides whether degree-based
    // partitioning/salting will see skew amplification. One scan of the
    // edge list joined to the node-degree table; every Σd/Σd²/Σdadb is
    // an exact integer, only the final r is float (identical op order
    // both engines). Bipartite graphs are disassortative by
    // construction when degree distributions differ across sides.
    QueryDef(
      "q_assortativity",
      Some("""WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
             |    l_suppkey * 2 + 1 AS dst
             |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
             |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
             |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
             |  FROM e GROUP BY 1),
             |j AS (SELECT da.d AS x, db.d AS y
             |  FROM e JOIN deg da ON da.node = e.src
             |  JOIN deg db ON db.node = e.dst),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x*x) AS BIGINT) AS sxx,
             |    CAST(sum(y*y) AS BIGINT) AS syy,
             |    CAST(sum(x*y) AS BIGINT) AS sxy
             |  FROM j)
             |SELECT n AS n_dir_edges,
             |  round((CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
             |    / (sqrt(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)
             |      * sqrt(CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)),
             |    6) AS assortativity
             |FROM s""".stripMargin),
      (s, dir) => {
        val e = edges(s, dir).graftCheckpoint() // degree agg + 2 probes
        val deg = e.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("d"))
        val j = e
          .join(deg.select(col("node").as("src"), col("d").as("x")), "src")
          .join(deg.select(col("node").as("dst"), col("d").as("y")), "dst")
        val st = j.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        val nD = col("n").cast("double")
        st.select(col("n").as("n_dir_edges"),
          round((nD * col("sxy") - col("sx").cast("double") * col("sy"))
            / (sqrt(nD * col("sxx") - col("sx").cast("double") * col("sx"))
              * sqrt(nD * col("syy")
                - col("sy").cast("double") * col("sy"))), 6)
            .as("assortativity"))
      }),

    // WEIGHTED shortest path (hop-bounded Bellman-Ford) from the same
    // three seeds: edge weight = (min linking quantity) % 9 + 1 — a
    // deterministic 1..9 integer toll — and the answer is the cheapest
    // cost reachable in ≤ 3 edges (bounded-hop routing: the semantics a
    // "within k legs" itinerary query wants, and the bound that makes
    // both engines' work finite without a convergence test). Per round
    // the ONLY thing that reshuffles is the |seeds|·|V| best-cost table
    // (relax = equi-join on src + min-combine = textbook Bellman-Ford
    // round, each round's result localCheckpoint-truncated); the oracle
    // replays every ≤3-edge walk in a recursive CTE and takes the min.
    // Costs stay in the integer domain end to end — no float path sums.
    QueryDef(
      "q_weighted_path",
      Some("""WITH RECURSIVE
             |e0 AS (SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
             |    CAST(min(l_quantity) AS BIGINT) % 9 + 1 AS w
             |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
             |  GROUP BY 1, 2),
             |e AS (SELECT src, dst, w FROM e0
             |  UNION ALL SELECT dst, src, w FROM e0),
             |walk(seed, node, cost, d) AS (
             |  SELECT DISTINCT src, src, CAST(0 AS BIGINT), 0
             |  FROM e WHERE src IN (0, 2, 4)
             |  UNION
             |  SELECT walk.seed, e.dst, walk.cost + e.w, walk.d + 1
             |  FROM walk JOIN e ON e.src = walk.node WHERE walk.d < 3)
             |SELECT seed, node, min(cost) AS cost
             |FROM walk GROUP BY seed, node""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val l = Tables.t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_quantity")
        val fwd = o.join(l, col("l_orderkey") === col("o_orderkey"))
          .groupBy((col("o_custkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
          .agg((min("l_quantity").cast("long") % 9 + 1).as("w"))
          // checkpoint BEFORE the symmetrize (see edges()): the swapped
          // branch otherwise re-runs the whole scan→join→agg derivation
          .graftCheckpoint()
        val e = fwd.unionByName(fwd.select(col("dst").as("src"),
          col("src").as("dst"), col("w"))).graftCheckpoint()
        val seeds = Seq(0L, 2L, 4L)
        var best = s.createDataFrame(seeds.map(x => (x, x)))
          .toDF("seed", "node")
          .join(e.select(col("src").as("node")).distinct(), Seq("node"),
            "left_semi")
          .withColumn("cost", lit(0L))
        for (_ <- 1 to 3) {
          val relaxed = best.join(e, col("node") === col("src"))
            .select(col("seed"), col("dst").as("node"),
              (col("cost") + col("w")).as("cost"))
          best = best.unionByName(relaxed)
            .groupBy("seed", "node").agg(min("cost").as("cost"))
            .graftCheckpoint()
        }
        best
      }),

    // Hierarchy closure for the decimal-digit hierarchy parent(n) =
    // n div 10 over customer keys (single-digit keys are roots): root
    // ancestor + depth, CLOSED FORM — the parent function is arithmetic,
    // so the full chain is derivable from the key itself: root = leading
    // digit (exact string op, no float log10 edge), depth = digits − 1.
    // One map-only scan, zero joins, zero shuffles — scale-independent.
    //
    // r14 REWRITE (found by the sf1 oracle widening): the previous
    // implementation pointer-doubled through a LEFT JOIN against the node
    // table, which silently STALLS when an interior ancestor is not
    // itself a row — true for every non-contiguous key space, e.g. the
    // ScaleUp-strided sf1 keys (node 100000001's ancestor 10000000 is no
    // customer), where it reported depth 1 / root 10000000 against the
    // oracle's depth 8 / root 1. Contiguous driver fixtures masked it at
    // every sf ≤ 0.1. Table-backed ITERATIVE closure over genuinely
    // relational parent pointers stays demonstrated by q_shortest_path /
    // q_weighted_path / q_cc_star; for an arithmetic hierarchy the
    // closed form is both the correct and the faster plan.
    QueryDef(
      "q_hierarchy_closure",
      Some("""WITH RECURSIVE walk(node, cur, d) AS (
             |  SELECT c_custkey, c_custkey, 0 FROM customer
             |  UNION ALL
             |  SELECT node, cur // 10, d + 1 FROM walk WHERE cur >= 10)
             |SELECT node AS c_custkey, cur AS root_key, CAST(d AS INT) AS depth
             |FROM walk WHERE cur < 10""".stripMargin),
      (s, dir) => {
        val c = Tables.t(s, dir, "customer").select("c_custkey")
        val ks = col("c_custkey").cast("string")
        c.select(col("c_custkey"),
          substring(ks, 1, 1).cast("long").as("root_key"),
          (length(ks) - 1).cast("int").as("depth"))
      }),

    // Interval union (merge-overlaps): each event spans
    // [ts, ts + value·1s) in ms; per user, overlapping spans merge into
    // islands, reporting covered time and island count. The island flag is
    // `start > max(end) over preceding rows` — both windows PARTITIONED by
    // user, so state is per-user-bounded and users parallelize. Durations
    // go through round(value·1000) → BIGINT: exact integer ms in both
    // engines, immune to float summation drift.
    QueryDef(
      "q_interval_union",
      Some("""WITH iv AS (SELECT user_id, event_id,
             |    epoch_us(ts) // 1000 AS st,
             |    epoch_us(ts) // 1000 + CAST(round(value * 1000) AS BIGINT) AS en
             |  FROM events),
             |m AS (SELECT *, max(en) OVER (PARTITION BY user_id
             |    ORDER BY st, en, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM iv),
             |fl AS (SELECT *, CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END
             |    AS is_new FROM m),
             |isl AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
             |    ORDER BY st, en, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM fl),
             |g AS (SELECT user_id, island, max(en) - min(st) AS ilen
             |  FROM isl GROUP BY user_id, island)
             |SELECT user_id, CAST(sum(ilen) AS BIGINT) AS covered_ms,
             |  CAST(count(*) AS BIGINT) AS n_islands
             |FROM g GROUP BY user_id""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val iv = Tables.t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            (unix_micros(col("ts")) / 1000).cast("long").as("st"),
            round(col("value") * 1000).cast("long").as("dur"))
          .withColumn("en", col("st") + col("dur"))
        val ord = Window.partitionBy("user_id")
          .orderBy(col("st"), col("en"), col("event_id"))
        val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
        val upto = ord.rowsBetween(Window.unboundedPreceding, 0)
        iv.withColumn("pmax", max("en").over(prev))
          .withColumn("is_new",
            when(col("pmax").isNull || col("st") > col("pmax"), 1).otherwise(0))
          .withColumn("island", sum("is_new").over(upto))
          .groupBy("user_id", "island")
          .agg((max("en") - min("st")).as("ilen"))
          .groupBy("user_id")
          .agg(sum("ilen").as("covered_ms"), count(lit(1)).as("n_islands"))
      }),

    // Global concurrency peak: max number of simultaneously-open event
    // intervals, and the earliest ms it is reached. The sweep line is a
    // GLOBAL running sum over (+1 at start, −1 at end) deltas — the shape
    // that naively plans an empty-partition-spec window. It rides
    // ops/PrefixSum's range-partitioned two-phase scan instead (same
    // machinery as q_pack_sequences); ends sort before starts at equal t
    // (delta −1 < +1), closing [st, en) intervals before opening new ones.
    QueryDef(
      "q_concurrency_peak",
      Some("""WITH iv AS (SELECT event_id,
             |    epoch_us(ts) // 1000 AS st,
             |    epoch_us(ts) // 1000 + CAST(round(value * 1000) AS BIGINT) AS en
             |  FROM events),
             |pts AS (
             |  SELECT st AS t, 1 AS delta, event_id FROM iv
             |  UNION ALL
             |  SELECT en AS t, -1 AS delta, event_id FROM iv),
             |rs AS (SELECT t, sum(delta) OVER (ORDER BY t, delta, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
             |  FROM pts)
             |SELECT CAST(conc AS BIGINT) AS peak, t AS at_ms
             |FROM rs ORDER BY conc DESC, t LIMIT 1""".stripMargin),
      (s, dir) => {
        val iv = Tables.t(s, dir, "events")
          .select(col("event_id"),
            (unix_micros(col("ts")) / 1000).cast("long").as("st"),
            ((unix_micros(col("ts")) / 1000).cast("long") +
              round(col("value") * 1000).cast("long")).as("en"))
        val pts = iv.select(col("st").as("t"), lit(1L).as("delta"),
            col("event_id"))
          .unionByName(iv.select(col("en").as("t"), lit(-1L).as("delta"),
            col("event_id")))
        graft.ops.PrefixSum
          .runningTotal(pts, Seq(col("t"), col("delta"), col("event_id")),
            col("delta"), "conc")
          .orderBy(col("conc").desc, col("t"))
          .limit(1)
          .select(col("conc").as("peak"), col("t").as("at_ms"))
      }),

    // Per-source corpus cap: keep the top-50 documents per source by
    // length (the per-domain cap every web-corpus pipeline applies so one
    // crawl host can't dominate the training mix), then report what
    // survives. row_number is PARTITIONED by source — each source's heap
    // is independent, skewed sources cost only their own partition.
    QueryDef(
      "q_source_cap",
      Some("""WITH r AS (SELECT source, doc_id, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id) AS rk
             |  FROM documents)
             |SELECT source, CAST(count(*) AS BIGINT) AS kept,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM r WHERE rk <= 50 GROUP BY source""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("source")
          .orderBy(col("n_chars").desc, col("doc_id"))
        Tables.t(s, dir, "documents")
          .select("source", "doc_id", "n_chars")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 50)
          .groupBy("source")
          .agg(count(lit(1)).as("kept"), sum("n_chars").as("total_chars"))
      }),

    // HITS hub/authority scores over the DIRECTED customer→supplier
    // purchase graph, 2 full mutual-reinforcement iterations. The
    // iterates are kept as EXACT path counts (h₀=1; every step is a
    // BIGINT sum over neighbors — no per-round float normalization to
    // drift cross-engine); one normalization at the very end turns each
    // side into a distribution. Overflow bound: counts grow like
    // deg^(2·iters) ≈ deg⁴ — < 2⁵³ through ~50k-degree graphs, far past
    // any fixture SF. Per round: one equi-join + partial-agg sum; the
    // score table (|V| rows) is the only thing that reshuffles.
    QueryDef(
      "q_hits",
      Some("""WITH e AS (SELECT DISTINCT o_custkey * 2 AS src,
             |    l_suppkey * 2 + 1 AS dst
             |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
             |h0 AS (SELECT DISTINCT src AS node, CAST(1 AS BIGINT) AS s
             |  FROM e),
             |a1 AS (SELECT e.dst AS node, CAST(sum(h0.s) AS BIGINT) AS s
             |  FROM e JOIN h0 ON h0.node = e.src GROUP BY 1),
             |h1 AS (SELECT e.src AS node, CAST(sum(a1.s) AS BIGINT) AS s
             |  FROM e JOIN a1 ON a1.node = e.dst GROUP BY 1),
             |a2 AS (SELECT e.dst AS node, CAST(sum(h1.s) AS BIGINT) AS s
             |  FROM e JOIN h1 ON h1.node = e.src GROUP BY 1),
             |h2 AS (SELECT e.src AS node, CAST(sum(a2.s) AS BIGINT) AS s
             |  FROM e JOIN a2 ON a2.node = e.dst GROUP BY 1),
             |u AS (SELECT 'auth' AS side, node, s FROM a2
             |  UNION ALL SELECT 'hub', node, s FROM h2),
             |t AS (SELECT side, CAST(sum(s) AS BIGINT) AS tot
             |  FROM u GROUP BY 1)
             |SELECT u.side, u.node,
             |  round(u.s / CAST(t.tot AS DOUBLE), 6) AS score
             |FROM u JOIN t USING (side)""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val l = Tables.t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        val e = o.join(l, col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).cast("long").as("src"),
            (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
          .distinct().graftCheckpoint()
        var h = e.select(col("src").as("node")).distinct()
          .withColumn("s", lit(1L))
        var a: org.apache.spark.sql.DataFrame = null
        for (_ <- 1 to 2) {
          a = e.join(h.withColumnRenamed("node", "hn"),
              col("hn") === col("src"))
            .groupBy(col("dst").as("node")).agg(sum("s").as("s"))
          h = e.join(a.withColumnRenamed("node", "an"),
              col("an") === col("dst"))
            .groupBy(col("src").as("node")).agg(sum("s").as("s"))
        }
        val u = a.withColumn("side", lit("auth"))
          .unionByName(h.withColumn("side", lit("hub")))
        val t = u.groupBy("side").agg(sum("s").as("tot"))
        u.join(broadcast(t), "side")
          .select(col("side"), col("node"),
            round(col("s") / col("tot").cast("double"), 6).as("score"))
      }),

    // K-CORE of the symmetrized purchase graph at k = ⌊median degree⌋
    // (data-adaptive, so the carve is meaningful at every fixture SF).
    // Iterative peel: drop sub-k nodes, restrict edges to survivors,
    // recompute — to FIXPOINT, asserted within the same 4 rounds the
    // oracle unrolls (a future fixture needing more peels fails loudly
    // on both sides instead of silently diverging). Per round: one
    // degree aggregate + two semi-joins on the shrinking edge set;
    // localCheckpoint truncates the loop lineage like ConnectedComponents.
    QueryDef(
      "q_kcore",
      Some("""WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
             |    l_suppkey * 2 + 1 AS dst
             |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
             |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
             |dg AS (SELECT src, CAST(count(*) AS BIGINT) AS d
             |  FROM e GROUP BY 1),
             |kk AS (SELECT CAST(floor(quantile_cont(d, 0.5)) AS BIGINT) AS k
             |  FROM dg),
             |n1 AS (SELECT src FROM dg, kk WHERE d >= k),
             |e1 AS (SELECT e.src, e.dst FROM e
             |  JOIN n1 a ON a.src = e.src JOIN n1 b ON b.src = e.dst),
             |d1 AS (SELECT src, CAST(count(*) AS BIGINT) AS d
             |  FROM e1 GROUP BY 1),
             |n2 AS (SELECT src FROM d1, kk WHERE d >= k),
             |e2 AS (SELECT e1.src, e1.dst FROM e1
             |  JOIN n2 a ON a.src = e1.src JOIN n2 b ON b.src = e1.dst),
             |d2 AS (SELECT src, CAST(count(*) AS BIGINT) AS d
             |  FROM e2 GROUP BY 1),
             |n3 AS (SELECT src FROM d2, kk WHERE d >= k),
             |e3 AS (SELECT e2.src, e2.dst FROM e2
             |  JOIN n3 a ON a.src = e2.src JOIN n3 b ON b.src = e2.dst),
             |d3 AS (SELECT src, CAST(count(*) AS BIGINT) AS d
             |  FROM e3 GROUP BY 1),
             |n4 AS (SELECT src FROM d3, kk WHERE d >= k),
             |e4 AS (SELECT e3.src, e3.dst FROM e3
             |  JOIN n4 a ON a.src = e3.src JOIN n4 b ON b.src = e3.dst)
             |SELECT e4.src AS node,
             |  CASE WHEN e4.src % 2 = 0 THEN 'customer' ELSE 'supplier' END
             |    AS side,
             |  CAST(count(*) AS BIGINT) AS core_degree,
             |  any_value(kk.k) AS k
             |FROM e4, kk GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        val e0 = edges(s, dir)
        var cur = e0.graftCheckpoint()
        val dg = cur.groupBy("src").agg(count(lit(1)).as("d"))
        val k = graft.ops.Quantiles
          .groupQuantiles(dg.withColumn("g", lit(1)), "g", "d",
            Seq("med" -> 0.5))
          .select(floor(col("med")).cast("long")).collect().head.getLong(0)
        var converged = false
        var round = 0
        while (!converged && round < 4) {
          // ONE action per round (r21; was two): the degree table is
          // node-bounded — checkpoint it, read node count and surviving
          // count from a single aggregate (count(*) over groups ==
          // distinct src count), and derive the keep set by a cheap
          // filter over the same materialization
          val dg2 = cur.groupBy("src").agg(count(lit(1)).as("d"))
            .graftCheckpoint()
          val cnts = dg2.agg(count(lit(1)).as("nodes"),
            coalesce(sum(when(col("d") >= k, 1L).otherwise(0L)), lit(0L))
              .as("keepn")).first()
          if (cnts.getLong(1) == cnts.getLong(0)) converged = true
          else {
            val keep = dg2.filter(col("d") >= k).select("src")
            cur = cur
              .join(keep.withColumnRenamed("src", "ka"),
                col("src") === col("ka"))
              .join(keep.withColumnRenamed("src", "kb"),
                col("dst") === col("kb"))
              .select("src", "dst").graftCheckpoint()
            round += 1
          }
        }
        require(converged,
          s"k-core ($k) did not reach fixpoint within 4 peel rounds — " +
            "extend the oracle's unrolled rounds to match")
        cur.groupBy("src")
          .agg(count(lit(1)).as("core_degree"))
          .select(col("src").as("node"),
            when(col("src") % 2 === 0, "customer").otherwise("supplier")
              .as("side"),
            col("core_degree"), lit(k).as("k"))
      }),

    // DETERMINISTIC RANDOM WALKS over the purchase graph — the walk-
    // corpus generator feeding node-embedding training (DeepWalk/
    // node2vec's sampling stage), with the "randomness" sha60-derived
    // from (start, step, node) so any engine replays the walks exactly.
    // Neighbor lists are indexed once (per-node frames, degree-bounded);
    // each of the 3 steps is one equi-join picking index
    // hash % degree. Walks from every customer node; output is the walk
    // table itself — (start, step, node) — the training corpus shape.
    QueryDef(
      "q_random_walks",
      Some {
        val h = (e: String) => graft.expressions.Hashing.sha60Sql(e)
        def step(i: Int) =
          s"""w$i AS (SELECT w.start_id, e.dst AS node
             |  FROM w${i - 1} w
             |  JOIN d ON d.src = w.node
             |  JOIN e ON e.src = w.node AND e.idx =
             |    ${h(s"CAST(w.start_id AS VARCHAR) || ':$i:' || CAST(w.node AS VARCHAR)")}
             |      % d.deg)""".stripMargin
        s"""WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
           |    l_suppkey * 2 + 1 AS dst
           |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
           |eu AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
           |e AS (SELECT src, dst,
           |    row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
           |  FROM eu),
           |d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
           |  FROM eu GROUP BY 1),
           |w0 AS (SELECT DISTINCT src AS start_id, src AS node FROM eu
           |  WHERE src % 2 = 0),
           |${(1 to 3).map(step).mkString(",\n")}
           |SELECT start_id, 0 AS step, node FROM w0
           |UNION ALL SELECT start_id, 1, node FROM w1
           |UNION ALL SELECT start_id, 2, node FROM w2
           |UNION ALL SELECT start_id, 3, node FROM w3""".stripMargin
      },
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val eu = edges(s, dir).graftCheckpoint()
        // NOT checkpointed (r21, measured): the window/degree subtrees
        // recur in every step's plan, but their exchanges canonicalize
        // identically and ReuseExchange shares them inside the one action;
        // eager per-step checkpoints serialized the walk into extra jobs
        // and measured 1.14× SLOWER.
        val e = eu.withColumn("idx",
          row_number().over(Window.partitionBy("src").orderBy("dst")) - 1)
        val d = eu.groupBy("src").agg(count(lit(1)).as("deg"))
        var walks = Seq(
          eu.filter(col("src") % 2 === 0).select(col("src").as("start_id"))
            .distinct().withColumn("node", col("start_id"))
            .withColumn("step", lit(0)))
        for (i <- 1 to 3) {
          val prev = walks.last.select("start_id", "node")
          val idx = graft.expressions.Hashing.sha60(
            concat(col("start_id").cast("string"), lit(s":$i:"),
              col("node").cast("string"))) % col("deg")
          val next = prev
            .join(d.withColumnRenamed("src", "dn"), col("dn") === col("node"))
            .join(e.withColumnRenamed("src", "en")
                .withColumnRenamed("dst", "nxt"),
              col("en") === col("node") && col("idx") === idx)
            .select(col("start_id"), col("nxt").as("node"),
              lit(i).as("step"))
          walks = walks :+ next
        }
        walks.map(_.select("start_id", "step", "node"))
          .reduce(_ unionByName _)
      })
  )
}

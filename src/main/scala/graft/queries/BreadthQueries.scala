package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.Skew
import graft.tables.Warehouse
import graft.Materialize._

/** Round-4 breadth: warehouse time travel / CDC, bucketed (shuffle-free)
  * joins, native pivot, window-function and grouping-set coverage, set
  * operations, null-safe joins, scalar subqueries, array/string/regex
  * functions, salted-join equivalence, and a typed Dataset Aggregator.
  * Every query carries a DuckDB oracle.
  */
object BreadthQueries {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  val defs: Seq[QueryDef] = Seq(

    // Warehouse TIME TRAVEL: manifests are retained (latest + prior), so
    // reading "the table as of the previous commit" is a metadata-only
    // operation — the same mechanism as Iceberg/Delta VERSION AS OF. The
    // gate reads the PRE-append snapshot after an append landed.
    QueryDef(
      "q_time_travel",
      Some("SELECT o_orderkey, o_totalprice FROM orders"),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders").select("o_orderkey", "o_totalprice")
        val wh = new Warehouse(s, tmp("graft-q-tt"))
        wh.overwrite("t", o)
        wh.append("t", o.filter(col("o_orderkey") % 7 === 0))
        wh.readSnapshot("t", wh.snapshots("t").head)
      }),

    // Warehouse CDC: full-row diff between two retained snapshots —
    // updates surface as delete+insert, untouched rows do not appear.
    // The table carries a NULL-bearing column (`maybe_null`): with default
    // (null-unsafe) equality every UNCHANGED row holding a NULL would
    // surface as a spurious delete+insert pair — the gate now covers
    // snapshotDiff's per-column `<=>` fix.
    QueryDef(
      "q_snapshot_diff",
      Some("""SELECT o_orderkey, o_totalprice + 100.0 AS o_totalprice,
             |  'R' AS o_orderstatus, nullif(o_orderstatus, 'O') AS maybe_null,
             |  'insert' AS change
             |FROM orders WHERE o_orderkey % 5 = 0
             |UNION ALL
             |SELECT o_orderkey, o_totalprice, o_orderstatus,
             |  nullif(o_orderstatus, 'O') AS maybe_null, 'delete' AS change
             |FROM orders WHERE o_orderkey % 5 = 0""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
          .withColumn("maybe_null", nullif(col("o_orderstatus"), lit("O")))
        val batch = o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
          .withColumn("o_orderstatus", lit("R"))
        val wh = new Warehouse(s, tmp("graft-q-cdc"))
        wh.overwrite("t", o)
        wh.upsert("t", batch, Seq("o_orderkey"))
        val snaps = wh.snapshots("t")
        wh.snapshotDiff("t", snaps.head, snaps.last)
      }),

    // Partitioned APPEND lifecycle: overwritePartitioned → append (which
    // must route through the recorded partition column — including a
    // BRAND-NEW partition value — keeping every manifest line partition-
    // scoped) → partition-local upsert. The upsert doubles purchase
    // values but must NOT touch the appended synthetic partition even
    // where event_ids collide: partition-scoped means exactly that.
    QueryDef(
      "q_partitioned_append",
      Some("""SELECT event_id, event_type,
             |  CASE WHEN event_type = 'purchase' THEN value * 2 ELSE value END AS value
             |FROM events
             |UNION ALL
             |SELECT event_id, 'synthetic' AS event_type, value
             |FROM events WHERE event_id % 97 = 0""".stripMargin),
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
          .select("event_id", "event_type", "value")
        val wh = new Warehouse(s, tmp("graft-q-pappend"))
        wh.overwritePartitioned("t", ev, "event_type")
        wh.append("t", ev.filter(col("event_id") % 97 === 0)
          .withColumn("event_type", lit("synthetic")))
        wh.upsertPartitioned("t",
          ev.filter(col("event_type") === "purchase")
            .withColumn("value", col("value") * 2),
          Seq("event_id"), "event_type")
        wh.read("t")
      }),

    // Z-ORDER clustering index (Delta/Iceberg OPTIMIZE ZORDER BY): Morton
    // bit-interleave of user_id and the integer value bucket — the layout
    // key that gives BOTH dimensions min/max-pruning locality when the
    // table is range-partitioned and sorted by it (LayoutSpec measures the
    // per-file bounding-box shrinkage vs a one-column sort). The gate
    // covers the index computation; pure bit arithmetic, engine-identical.
    QueryDef(
      "q_zorder",
      Some(s"""SELECT event_id,
              |  ${graft.ops.Layout.zIndexSql("user_id",
                   "CAST(floor(value) AS BIGINT)")} AS z
              |FROM events""".stripMargin),
      (s, dir) => Tables.t(s, dir, "events")
        .select(col("event_id"),
          graft.ops.Layout.zIndex(col("user_id"), floor(col("value")))
            .as("z"))),

    // BUCKETED co-located join: both sides written bucketBy(8) on the join
    // key — the scan itself reports hash partitioning, so the sort-merge
    // join runs WITHOUT a shuffle on either side (PlanSpec asserts no
    // Exchange below the join). This is the 100 TB pattern for repeated
    // fact-dim joins: pay the partitioning once at write time.
    QueryDef(
      "q_bucketed_join",
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin),
      (s, dir) => {
        val base = tmp("graft-q-bkt")
        Tables.t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
          .write.mode("overwrite").option("path", s"$base/o")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .saveAsTable("graft_bkt_orders")
        Tables.t(s, dir, "customer").select("c_custkey", "c_mktsegment")
          .write.mode("overwrite").option("path", s"$base/c")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .saveAsTable("graft_bkt_cust")
        s.table("graft_bkt_orders")
          // merge hint: without it the small dim side would broadcast and
          // the bucketing demonstration would be vacuous
          .join(s.table("graft_bkt_cust").hint("merge"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            round(sum(col("o_totalprice")), 2).as("revenue"))
      }),

    // Native pivot with an explicit value list (deterministic columns).
    QueryDef(
      "q_pivot_native",
      Some("""SELECT user_id,
             |  round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
             |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
             |  round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view
             |FROM events GROUP BY user_id""".stripMargin),
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "purchase", "view"))
        .agg(round(sum(col("value")), 2))),

    // Window-function breadth: lag/lead + distribution ranks over a
    // UNIQUE per-user order (ties would make percent_rank nondeterministic).
    QueryDef(
      "q_window_funcs",
      Some("""SELECT event_id, user_id, value,
             |  lag(value) OVER w AS prev_value,
             |  lead(value) OVER w AS next_value,
             |  round(percent_rank() OVER w, 6) AS pr,
             |  round(cume_dist() OVER w, 6) AS cd
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        Tables.t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"),
            lag(col("value"), 1).over(w).as("prev_value"),
            lead(col("value"), 1).over(w).as("next_value"),
            round(percent_rank().over(w), 6).as("pr"),
            round(cume_dist().over(w), 6).as("cd"))
      }),

    // GROUPING SETS with grouping flags (the reference's subtotal reports).
    QueryDef(
      "q_grouping_sets",
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
             |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin),
      (s, dir) => {
        Tables.t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gsets")
        s.sql("""SELECT l_returnflag, l_linestatus,
                |  round(sum(l_quantity), 2) AS sum_qty,
                |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
                |  CAST(grouping(l_linestatus) AS INT) AS g_ls
                |FROM lineitem_gsets
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
      }),

    // Set operations: INTERSECT / EXCEPT (distinct set semantics in both
    // engines).
    QueryDef(
      "q_intersect_except",
      Some("""(SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             | INTERSECT
             | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        def ck(st: String) =
          o.filter(col("o_orderstatus") === st).select("o_custkey")
        ck("O").intersect(ck("F")).except(ck("P"))
      }),

    // Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    // each other, unlike plain `=`.
    QueryDef(
      "q_nullsafe_join",
      Some("""SELECT k, count(*) AS n FROM
             |  (SELECT nullif(c_nationkey % 5, 2) AS k FROM customer) a
             |  JOIN (SELECT DISTINCT nullif(s_nationkey % 5, 2) AS kb
             |        FROM supplier) b
             |  ON a.k IS NOT DISTINCT FROM b.kb
             |GROUP BY k""".stripMargin),
      (s, dir) => {
        val a = Tables.t(s, dir, "customer")
          .select(expr("nullif(c_nationkey % 5, 2)").as("k"))
        val b = Tables.t(s, dir, "supplier")
          .select(expr("nullif(s_nationkey % 5, 2)").as("kb")).distinct()
        a.join(b, col("k") <=> col("kb"))
          .groupBy("k").agg(count(lit(1)).as("n"))
      }),

    // Scalar subquery in a filter (above-average carve).
    QueryDef(
      "q_above_avg",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""".stripMargin),
      (s, dir) => {
        Tables.t(s, dir, "orders").createOrReplaceTempView("orders_scalar_sq")
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders_scalar_sq
                |WHERE o_totalprice >
                |  (SELECT avg(o_totalprice) FROM orders_scalar_sq)""".stripMargin)
      }),

    // Array function breadth: per-vector top-3 dimensions via
    // sort+reverse+slice, exploded to scalar rows for the gate.
    QueryDef(
      "q_array_ops",
      Some("""WITH e AS (SELECT vec_id,
             |    list_sort(embedding::DOUBLE[], 'DESC') AS l FROM embeddings)
             |SELECT vec_id, CAST(unnest(range(0, 3)) AS INT) AS i,
             |  round(unnest(l[1:3]), 4) AS v
             |FROM e""".stripMargin),
      (s, dir) => Tables.t(s, dir, "embeddings")
        .select(col("vec_id"), posexplode(
          slice(reverse(array_sort(transform(col("embedding"), _.cast("double")))),
            1, 3)).as(Seq("i", "v")))
        .select(col("vec_id"), col("i").cast("int").as("i"),
          round(col("v"), 4).as("v"))),

    // String function breadth (lpad / reverse / replace / split_part).
    QueryDef(
      "q_string_funcs",
      Some("""SELECT c_custkey,
             |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
             |  reverse(c_name) AS rev_name,
             |  replace(c_name, 'Customer', 'C') AS short_name,
             |  split_part(c_name, '#', 2) AS name_num,
             |  CAST(length(c_mktsegment) AS INT) AS seg_len
             |FROM customer""".stripMargin),
      (s, dir) => Tables.t(s, dir, "customer")
        .select(col("c_custkey"),
          lpad(col("c_custkey").cast("string"), 12, "0").as("padded"),
          reverse(col("c_name")).as("rev_name"),
          expr("replace(c_name, 'Customer', 'C')").as("short_name"),
          expr("split_part(c_name, '#', 2)").as("name_num"),
          length(col("c_mktsegment")).as("seg_len"))),

    // Regex extraction breadth: leftmost capture group + match count.
    // Both engines return '' for a no-match extract. The match-count
    // regex has NO capture group, so Spark's regexp_extract_all needs an
    // explicit idx=0 (whole match — DuckDB's default): its own default of
    // idx=1 throws REGEX_GROUP_INDEX on the first row that actually
    // matches — a latent bug for as long as the fixture text was
    // digit-free, found the moment the sf1 corpus contained digits (r12).
    QueryDef(
      "q_regex_extract",
      Some("""SELECT doc_id,
             |  regexp_extract(lower(text), '(s[a-z]+)', 1) AS first_s_word,
             |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers
             |FROM documents""".stripMargin),
      (s, dir) => Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(lower(col("text")), "(s[a-z]+)", 1).as("first_s_word"),
          size(expr("regexp_extract_all(text, '[0-9]+', 0)")).as("n_numbers"))),

    // Fixed-width histogram binning (capped top bucket).
    QueryDef(
      "q_histogram",
      Some("""SELECT CAST(least(floor(value / 50), 6) AS INT) AS bucket,
             |  count(*) AS n, round(sum(value), 2) AS total
             |FROM events GROUP BY 1""".stripMargin),
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy(least(floor(col("value") / 50), lit(6)).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))),

    // Salted equi-join must be indistinguishable from the plain join (the
    // oracle IS the unsalted SQL): hot l_suppkey rows spread across 8
    // salts, the dim side replicates 8×.
    QueryDef(
      "q_salted_join",
      Some("""SELECT s_nationkey, count(*) AS n,
             |  round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey""".stripMargin),
      (s, dir) => Skew.saltedJoin(
          Tables.t(s, dir, "lineitem").select("l_suppkey", "l_quantity"),
          Tables.t(s, dir, "supplier")
            .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
          Seq("l_suppkey"), salts = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))),

    // PROFILE-DRIVEN salted join (r15): same plain-join oracle — the 1%
    // sampled hot-key profile, InSet salting of only the profiled-hot
    // keys, and the no-heat plain-join short-circuit are all invisible in
    // the RESULT by construction. `hotKeyMinRows` is set low enough that
    // the fixture's keys profile as hot, so the salted path (not the
    // short-circuit) is what the hash gate exercises; SkewSpec covers the
    // short-circuit and SkewProbe measures both regimes at sf10.
    QueryDef(
      "q_adaptive_salted_join",
      Some("""SELECT s_nationkey, count(*) AS n,
             |  round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey""".stripMargin),
      (s, dir) => Skew.adaptiveSaltedJoin(
          Tables.t(s, dir, "lineitem").select("l_suppkey", "l_quantity"),
          Tables.t(s, dir, "supplier")
            .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey")),
          Seq("l_suppkey"), salts = 8,
          sampleFraction = 0.05, hotKeyMinRows = 20L)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))),

    // Gaps-and-islands: consecutive event_id runs per user via the
    // row_number-difference trick — one partitioned window + one
    // aggregation, the classic sessionless run detector.
    QueryDef(
      "q_gaps_islands",
      Some("""WITH s AS (SELECT user_id, event_id,
             |  event_id - row_number() OVER (PARTITION BY user_id
             |    ORDER BY event_id) AS grp
             |FROM events)
             |SELECT user_id, min(event_id) AS run_start,
             |  max(event_id) AS run_end, count(*) AS run_len
             |FROM s GROUP BY user_id, grp""".stripMargin),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
        Tables.t(s, dir, "events")
          .select(col("user_id"), col("event_id"),
            (col("event_id") - row_number().over(w)).as("grp"))
          .groupBy("user_id", "grp")
          .agg(min(col("event_id")).as("run_start"),
            max(col("event_id")).as("run_end"),
            count(lit(1)).as("run_len"))
          .drop("grp")
      }),

    // Statistical aggregates: correlation / covariance / stddev / variance
    // (population forms — identical definitions in both engines), rounded
    // to absorb summation-order float drift.
    QueryDef(
      "q_stats_aggs",
      Some("""SELECT l_returnflag,
             |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
             |  round(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_cov,
             |  round(stddev_pop(l_extendedprice), 4) AS price_sd,
             |  round(var_pop(l_quantity), 4) AS qty_var
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      (s, dir) => Tables.t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_cov"),
          round(stddev_pop(col("l_extendedprice")), 4).as("price_sd"),
          round(var_pop(col("l_quantity")), 4).as("qty_var"))),

    // Bitwise aggregates (flag-set folding).
    QueryDef(
      "q_bit_aggs",
      Some("""SELECT user_id,
             |  bit_and(event_id) AS band, bit_or(event_id) AS bor,
             |  bit_xor(event_id) AS bxor
             |FROM events GROUP BY user_id""".stripMargin),
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy("user_id")
        .agg(bit_and(col("event_id")).as("band"),
          bit_or(col("event_id")).as("bor"),
          bit_xor(col("event_id")).as("bxor"))),

    // Ordered string aggregation: deterministic via an explicit sort of
    // the collected list (collect_list order is partition-dependent; the
    // sort restores engine-independence).
    QueryDef(
      "q_string_agg",
      Some("""SELECT c_nationkey,
             |  string_agg(c_mktsegment, ',' ORDER BY c_mktsegment) AS segs
             |FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
             |GROUP BY c_nationkey""".stripMargin),
      (s, dir) => Tables.t(s, dir, "customer")
        .select("c_nationkey", "c_mktsegment").distinct()
        .groupBy("c_nationkey")
        .agg(array_join(array_sort(collect_list(col("c_mktsegment"))), ",")
          .as("segs"))),

    // Running total: unbounded-preceding frame over a unique per-user
    // order (cumulative revenue per user over time).
    QueryDef(
      "q_running_total",
      Some("""SELECT event_id, user_id,
             |  round(sum(value) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             |    AS running_value
             |FROM events""".stripMargin),
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        Tables.t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            round(sum(col("value")).over(w), 2).as("running_value"))
      }),

    // UNION with DISTINCT semantics (vs the UNION ALL used everywhere
    // else): duplicates across the two arms collapse.
    QueryDef(
      "q_union_distinct",
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |UNION
             |SELECT o_custkey FROM orders WHERE o_totalprice > 100000""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select("o_custkey")
          .union(o.filter(col("o_totalprice") > 100000).select("o_custkey"))
          .distinct()
      }),

    // INTENTIONAL cross join: the dimension-grid shape (every region ×
    // every market segment) that zero-filled reports build on — tiny ×
    // tiny, the one place a cartesian product is the right plan.
    QueryDef(
      "q_dim_grid",
      Some("""SELECT r.r_name, m.seg
             |FROM region r CROSS JOIN
             |  (SELECT DISTINCT c_mktsegment AS seg FROM customer) m""".stripMargin),
      (s, dir) => Tables.t(s, dir, "region").select("r_name")
        .crossJoin(Tables.t(s, dir, "customer")
          .select(col("c_mktsegment").as("seg")).distinct())),

    // Selector aggregates: max_by/min_by (DuckDB arg_max/arg_min) over a
    // UNIQUE ordering column, so the selection is deterministic.
    QueryDef(
      "q_arg_minmax",
      Some("""SELECT user_id,
             |  arg_max(event_type, event_id) AS latest_type,
             |  arg_min(event_type, event_id) AS first_type,
             |  max(event_id) AS max_id
             |FROM events GROUP BY user_id""".stripMargin),
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy("user_id")
        .agg(max_by(col("event_type"), col("event_id")).as("latest_type"),
          min_by(col("event_type"), col("event_id")).as("first_type"),
          max(col("event_id")).as("max_id"))),

    // Conditional / boolean aggregates: count_if, bool_or, bool_and.
    QueryDef(
      "q_bool_aggs",
      Some("""SELECT user_id,
             |  CAST(count_if(value > 100) AS BIGINT) AS n_big,
             |  bool_or(event_type = 'error') AS any_error,
             |  bool_and(value >= 0) AS all_nonneg
             |FROM events GROUP BY user_id""".stripMargin),
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy("user_id")
        .agg(count_if(col("value") > 100).as("n_big"),
          bool_or(col("event_type") === "error").as("any_error"),
          bool_and(col("value") >= 0).as("all_nonneg"))),

    // CUBE: all grouping-key combinations + grouping flags (completes the
    // rollup / grouping-sets family).
    QueryDef(
      "q_cube",
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
             |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
             |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin),
      (s, dir) => Tables.t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"))),

    // Full outer join with a compound join condition — both sides produce
    // NULL-padded unmatched rows.
    QueryDef(
      "q_outer_join",
      Some("""SELECT n.n_nationkey, n.n_name, s.s_suppkey
             |FROM nation n FULL JOIN supplier s
             |  ON n.n_nationkey = s.s_nationkey AND s.s_suppkey % 3 = 0""".stripMargin),
      (s, dir) => {
        val n = Tables.t(s, dir, "nation").select("n_nationkey", "n_name")
        val sup = Tables.t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        n.join(sup,
            n("n_nationkey") === sup("s_nationkey") && sup("s_suppkey") % 3 === 0,
            "full")
          .select(n("n_nationkey"), n("n_name"), sup("s_suppkey"))
      }),

    // Calendar date spine (the BI zero-filling pattern): generated day
    // sequence LEFT JOIN daily counts, missing days surface as 0.
    QueryDef(
      "q_date_spine",
      Some("""WITH spine AS (SELECT unnest(generate_series(
             |    DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY))::DATE AS d),
             |o AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n
             |  FROM orders
             |  WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-04-01'
             |  GROUP BY 1)
             |SELECT spine.d, COALESCE(o.n, 0) AS n
             |FROM spine LEFT JOIN o USING (d)""".stripMargin),
      (s, dir) => {
        val spine = s.range(1).select(explode(sequence(
          to_date(lit("1995-01-01")), to_date(lit("1995-03-31")))).as("d"))
        val daily = Tables.t(s, dir, "orders")
          .filter(col("o_orderdate") >= "1995-01-01" &&
            col("o_orderdate") < "1995-04-01")
          .groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(count(lit(1)).as("n"))
        spine.join(daily, Seq("d"), "left")
          .select(col("d"), coalesce(col("n"), lit(0L)).as("n"))
      }),

    // Vocabulary build + token-id mapping (the tokenizer-prep step): the
    // global top-20 vocabulary ranked (count DESC, word), every token
    // mapped to its id, OOV → -1. The vocab is collected to the driver
    // (20 rows by construction) and joined as a LITERAL MAP — a codegen'd
    // lookup, zero extra shuffle, the right plan whenever the vocab fits
    // the driver.
    QueryDef(
      "q_vocab_ids",
      Some("""WITH d AS (SELECT doc_id, regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |  FROM documents),
             |tok AS (SELECT doc_id, CAST(unnest(range(1, len(toks) + 1)) AS INT) AS pos,
             |    unnest(toks) AS w FROM d),
             |vc AS (SELECT w, count(*) AS n FROM tok GROUP BY 1),
             |vocab AS (SELECT w, CAST(row_number() OVER (ORDER BY n DESC, w) AS INT)
             |    AS token_id
             |  FROM vc ORDER BY n DESC, w LIMIT 20)
             |SELECT tok.doc_id, tok.pos, COALESCE(vocab.token_id, -1) AS token_id
             |FROM tok LEFT JOIN vocab USING (w)""".stripMargin),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val toksCol = split(graft.dedup.Dedup.normalized(col("text")), " ")
        val tok = docs.withColumn("__toks", toksCol)
          .select(col("doc_id"), posexplode(col("__toks")).as(Seq("pos0", "w")))
          .select(col("doc_id"), (col("pos0") + 1).cast("int").as("pos"), col("w"))
        val top = tok.groupBy("w").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("w")).limit(20)
          .collect().map(_.getString(0))
        val vocabMap: Map[String, Int] = top.zipWithIndex
          .map { case (w, i) => w -> (i + 1) }.toMap
        tok.select(col("doc_id"), col("pos"),
          coalesce(element_at(typedlit(vocabMap), col("w")), lit(-1))
            .as("token_id"))
      }),

    // JOIN-BASED variant of q_vocab_ids (same output contract, same
    // oracle): the vocab stays a DataFrame and token ids come from a
    // broadcast LEFT JOIN instead of a collected literal map — the plan
    // for vocabularies beyond driver size (>1M tokens: drop the limit,
    // let AQE pick broadcast vs shuffle join; the id assignment stays a
    // sort of VOCAB rows only, never of the token stream). The window
    // ranks the already-LIMITed 20-row frame, bounded by construction.
    QueryDef(
      "q_vocab_ids_join",
      Some("""WITH d AS (SELECT doc_id, regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |  FROM documents),
             |tok AS (SELECT doc_id, CAST(unnest(range(1, len(toks) + 1)) AS INT) AS pos,
             |    unnest(toks) AS w FROM d),
             |vc AS (SELECT w, count(*) AS n FROM tok GROUP BY 1),
             |vocab AS (SELECT w, CAST(row_number() OVER (ORDER BY n DESC, w) AS INT)
             |    AS token_id
             |  FROM vc ORDER BY n DESC, w LIMIT 20)
             |SELECT tok.doc_id, tok.pos, COALESCE(vocab.token_id, -1) AS token_id
             |FROM tok LEFT JOIN vocab USING (w)""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.t(s, dir, "documents")
        val toksCol = split(graft.dedup.Dedup.normalized(col("text")), " ")
        val tok = docs.withColumn("__toks", toksCol)
          .select(col("doc_id"), posexplode(col("__toks")).as(Seq("pos0", "w")))
          .select(col("doc_id"), (col("pos0") + 1).cast("int").as("pos"), col("w"))
        val vocab = tok.groupBy("w").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("w")).limit(20)
          .withColumn("token_id",
            row_number().over(Window.orderBy(col("n").desc, col("w"))).cast("int"))
          .select("w", "token_id")
        tok.join(broadcast(vocab), Seq("w"), "left")
          .select(col("doc_id"), col("pos"),
            coalesce(col("token_id"), lit(-1)).as("token_id"))
      }),

    // Class-rebalancing stratified downsample: per-class keep percentages
    // via the deterministic sha bucket (reproducible on any engine, zero
    // shuffle, no count pass).
    QueryDef(
      "q_stratified_sample",
      Some("""SELECT event_id, event_type FROM events
             |WHERE ('0x' || substr(sha256(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 100 <
             |  CASE event_type WHEN 'purchase' THEN 100 WHEN 'click' THEN 25
             |       WHEN 'view' THEN 10 ELSE 50 END""".stripMargin),
      (s, dir) => graft.ops.Sampling.stratifiedHash(
        Tables.t(s, dir, "events").select("event_id", "event_type"),
        "event_id", "event_type",
        Seq("purchase" -> 100, "click" -> 25, "view" -> 10),
        defaultPct = 50)),

    // Bloom-pruned semi-join: the probe side is filtered by a distributed
    // Bloom filter INSIDE its scan stage before any shuffle; the trailing
    // exact semi-join removes false positives, so the result equals the
    // plain semi-join (which is the oracle).
    QueryDef(
      "q_bloom_prune",
      Some("""SELECT l_orderkey, l_suppkey, l_quantity FROM lineitem l
             |WHERE EXISTS (SELECT 1 FROM supplier s
             |  WHERE s.s_suppkey % 10 = 3 AND s.s_suppkey = l.l_suppkey)""".stripMargin),
      (s, dir) => graft.ops.BloomPrune.semiJoin(
        Tables.t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_quantity"), "l_suppkey",
        Tables.t(s, dir, "supplier")
          .filter(col("s_suppkey") % 10 === 3), "s_suppkey")),

    // Repetition detection (Gopher-style quality rule): most-repeated
    // trigram count + its share of all trigrams, per document.
    QueryDef(
      "q_repetition",
      Some("""WITH t AS (SELECT doc_id, regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |  FROM documents),
             |g AS (SELECT doc_id, unnest(list_transform(
             |    range(1, len(toks) - 1),
             |    i -> array_to_string(toks[i:i+2], ' '))) AS tri
             |  FROM t WHERE len(toks) >= 3),
             |c AS (SELECT doc_id, tri, count(*) AS n FROM g GROUP BY 1, 2)
             |SELECT doc_id, max(n) AS max_rep,
             |  round(max(n)::DOUBLE / sum(n), 4) AS rep_ratio
             |FROM c GROUP BY doc_id""".stripMargin),
      (s, dir) => graft.text.TextStats.repetition(
        Tables.t(s, dir, "documents").select("doc_id", "text"),
        "doc_id", "text")),

    // Symmetric int8 embedding quantization (the storage/serving step for
    // vector indexes): per-vector scale = 127/max|v|, values rounded into
    // [-127, 127], exploded to scalar rows for the gate.
    QueryDef(
      "q_quantize_int8",
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |s AS (SELECT vec_id, v,
             |    list_max(list_transform(v, x -> abs(x))) AS m FROM e)
             |SELECT vec_id, round(127.0 / m, 6) AS scale,
             |  CAST(unnest(range(0, len(v))) AS INT) AS dim,
             |  CAST(unnest(list_transform(v, x -> round(x * 127.0 / m))) AS INT) AS q
             |FROM s""".stripMargin),
      (s, dir) => Tables.t(s, dir, "embeddings")
        .withColumn("v", transform(col("embedding"), _.cast("double")))
        .withColumn("m", array_max(transform(col("v"), x => abs(x))))
        .select(col("vec_id"), round(lit(127.0) / col("m"), 6).as("scale"),
          posexplode(transform(col("v"),
            x => round(x * lit(127.0) / col("m")).cast("int"))).as(Seq("dim", "q")))),

    // NDJSON round trip (the reference's chunked NDJSON landing format,
    // billwerk_invoices-style): write line-delimited JSON, re-read with an
    // explicit schema, gate the values — JSON string escaping and numeric
    // round-trip are what is verified.
    QueryDef(
      "q_ndjson_scan",
      Some("SELECT doc_id, lang, n_chars, text FROM documents"),
      (s, dir) => {
        val out = tmp("graft-q-ndjson")
        Tables.t(s, dir, "documents")
          .select("doc_id", "lang", "n_chars", "text")
          .write.mode("overwrite").json(out)
        s.read
          .schema("doc_id LONG, lang STRING, n_chars LONG, text STRING")
          .json(out)
      }),

    // Corrupt-record quarantine (the error channel every real ingest
    // needs): deterministic NDJSON feed where every 10th record is
    // malformed; PERMISSIVE parsing routes bad lines to a corrupt-record
    // column instead of failing the job, and the gate checks the
    // good/quarantined split.
    QueryDef(
      "q_corrupt_quarantine",
      Some("""SELECT count(CASE WHEN doc_id % 10 <> 0 THEN 1 END) AS n_good,
             |  count(CASE WHEN doc_id % 10 = 0 THEN 1 END) AS n_quarantined
             |FROM documents""".stripMargin),
      (s, dir) => {
        val out = tmp("graft-q-corrupt")
        Tables.t(s, dir, "documents")
          .select(when(col("doc_id") % 10 === 0,
              concat(lit("{\"doc_id\":"), col("doc_id"), lit(",\"n_chars\":")))
            .otherwise(to_json(struct(col("doc_id"), col("n_chars"))))
            .as("value"))
          .write.mode("overwrite").text(out)
        // localCheckpoint: Spark disallows filtering on the corrupt-record
        // column of a lazily-parsed JSON scan without materializing first
        val parsed = s.read
          .schema("doc_id LONG, n_chars LONG, _corrupt STRING")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(out)
          .graftCheckpoint()
        parsed.agg(
          count(when(col("_corrupt").isNull, lit(1))).as("n_good"),
          count(when(col("_corrupt").isNotNull, lit(1))).as("n_quarantined"))
      }),

    // The native Catalyst expressions exposed as SQL functions
    // (GraftFunctions / SparkSessionExtensions): graft_sha60 callable from
    // spark.sql, recomputed by the oracle from the shared definition.
    QueryDef(
      "q_native_fn_sql",
      Some("""SELECT doc_id,
             |  ('0x' || substr(sha256(text), 1, 15))::BIGINT % 1000000 AS h
             |FROM documents""".stripMargin),
      (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        Tables.t(s, dir, "documents").createOrReplaceTempView("documents_fn")
        s.sql("SELECT doc_id, graft_sha60(text) % 1000000 AS h FROM documents_fn")
      }),

    // Typed Dataset Aggregator (case-class encoders, map-side partials):
    // weighted mean price per returnflag.
    QueryDef(
      "q_typed_agg",
      Some("""SELECT l_returnflag,
             |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
             |    AS wavg_price
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      (s, dir) => {
        import s.implicits._
        val ds = Tables.t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
          .as[(String, Double, Double)]
        ds.groupByKey(_._1)
          .agg(new graft.ops.Typed.WeightedMean().toColumn.name("wavg_price"))
          .toDF("l_returnflag", "wavg_price")
          .select(col("l_returnflag"), round(col("wavg_price"), 4).as("wavg_price"))
      })
  )
}

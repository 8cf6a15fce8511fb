package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.Relational

/** SURVEY.md §2.4–2.7 shapes as verifiable queries over the fixtures
  * (FIXTURES.md maps each reference operator to its stand-in table).
  * Every query is deterministic (no uuid()/now()) and every computed
  * column is aliased identically in the Spark code and the DuckDB oracle.
  */
object RelationalQueries {

  /** Typed-API cogroup reconciliation — see q_cogroup_reconcile. */
  private def cogroupReconcile(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val o = Tables.t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Double)]
    val l = Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("p"))
      .as[(Long, Double)]
    o.groupByKey(_._1).cogroup(l.groupByKey(_._1)) { (k, os, ls) =>
      val orderRows = os.toSeq
      if (orderRows.isEmpty) Iterator.empty
      else {
        var n = 0; var lt = 0.0
        ls.foreach { r => n += 1; lt += r._2 }
        Iterator((k, n, orderRows.head._2, lt))
      }
    }.toDF("order_key", "n_lines", "order_total", "lines_total")
      .select(col("order_key"), col("n_lines"),
        round(col("order_total"), 2).as("order_total"),
        round(col("lines_total"), 4).as("lines_total"))
  }

  val defs: Seq[QueryDef] = Seq(

    // TPC-H-Q1-style flagship aggregation (G3/P13 conditional math on the
    // lineitem stand-in). Filter is pushed to the parquet scan; one shuffle
    // with map-side partial aggregation on 2 low-cardinality keys.
    QueryDef(
      "q1_agg",
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      (s, dir) => Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // U1 — two-tenant UNION ALL consolidation with provenance literals
    // (shore_bexio_all.py:53-58); tenants carved from orders by key parity.
    QueryDef(
      "q_union_tenants",
      Some("""SELECT o_orderkey, o_totalprice, o_orderstatus,
             |       'bexio_de' AS source, 'blank' AS status
             |FROM orders WHERE o_orderkey % 2 = 0
             |UNION ALL
             |SELECT o_orderkey, o_totalprice, o_orderstatus,
             |       'bexio_ch' AS source, 'blank' AS status
             |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
        Relational.consolidate(Seq(
          "bexio_de" -> o.filter(col("o_orderkey") % 2 === 0),
          "bexio_ch" -> o.filter(col("o_orderkey") % 2 === 1)))
          .withColumn("status", lit("blank"))
      }),

    // J1/W6 — status-history anti-join delta
    // (execute_bexio_and_stripe_sql_queries.py:44-57): new
    // (invoice_id, status) pairs not yet in the seeded history.
    QueryDef(
      "q_history_delta",
      Some("""SELECT s.o_orderkey AS invoice_id, s.o_orderstatus AS status,
             |       CAST(s.o_orderdate AS DATE) AS date
             |FROM orders s
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM orders h
             |  WHERE h.o_orderkey % 3 = 0
             |    AND h.o_orderkey = s.o_orderkey
             |    AND h.o_orderstatus = s.o_orderstatus)""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        val src = o.select(
          col("o_orderkey").as("invoice_id"),
          col("o_orderstatus").as("status"),
          col("o_orderdate").cast("date").as("date"))
        val hist = o.filter(col("o_orderkey") % 3 === 0).select(
          col("o_orderkey").as("invoice_id"),
          col("o_orderstatus").as("status"))
        Relational.historyDelta(src, hist, Seq("invoice_id", "status"))
      }),

    // J2 — NOT EXISTS insert-if-absent on a 4-column composite key
    // (stripe_dispute.py:32-45) over the events stand-in.
    QueryDef(
      "q_notexists_insert",
      Some("""SELECT t.event_id, t.user_id, t.event_type, t.ts, t.value
             |FROM events t
             |WHERE t.event_id % 4 = 0
             |  AND NOT EXISTS (
             |    SELECT 1 FROM events m
             |    WHERE m.event_id % 3 = 0
             |      AND m.event_id = t.event_id AND m.user_id = t.user_id
             |      AND m.event_type = t.event_type AND m.ts = t.ts)""".stripMargin),
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .select("event_id", "user_id", "event_type", "ts", "value")
        Relational.notExistsInsert(
          e.filter(col("event_id") % 4 === 0),
          e.filter(col("event_id") % 3 === 0),
          Seq("event_id", "user_id", "event_type", "ts"))
      }),

    // J5 — DELETE ... WHERE key IN (batch) as the keep-rows anti-join
    // (bexio_orders_de.py:133-135).
    QueryDef(
      "q_delete_semijoin",
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
             |FROM orders t
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM orders b
             |  WHERE b.o_orderkey % 10 = 0 AND b.o_orderkey = t.o_orderkey)""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        Relational.historyDelta(
          o, o.filter(col("o_orderkey") % 10 === 0), Seq("o_orderkey"))
      }),

    // W3 — full delete+insert upsert as a transform: batch rows replace
    // target rows with the same natural key (bexio_orders_de.py:122-161).
    QueryDef(
      "q_upsert",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             |FROM orders t
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM orders b
             |  WHERE b.o_orderkey % 5 = 0 AND b.o_orderkey = t.o_orderkey)
             |UNION ALL
             |SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice,
             |       'R' AS o_orderstatus
             |FROM orders WHERE o_orderkey % 5 = 0""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        val target = o
        val batch = o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
          .withColumn("o_orderstatus", lit("R"))
        Relational.deleteInsert(target, batch, Seq("o_orderkey"))
      }),

    // W3/W5 under the driver gate end-to-end: the SAME upsert but through
    // the Warehouse WRITE PATH (overwrite → manifest swap → read-back), so
    // the storage layer itself is hash-verified, not just the transform.
    QueryDef(
      "q_warehouse_upsert",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             |FROM orders t
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM orders b
             |  WHERE b.o_orderkey % 5 = 0 AND b.o_orderkey = t.o_orderkey)
             |UNION ALL
             |SELECT o_orderkey, o_custkey, o_totalprice + 100.0 AS o_totalprice,
             |       'R' AS o_orderstatus
             |FROM orders WHERE o_orderkey % 5 = 0""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        val batch = o.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
          .withColumn("o_orderstatus", lit("R"))
        val wh = new graft.tables.Warehouse(s,
          java.nio.file.Files.createTempDirectory("graft-q-wh").toString)
        wh.overwrite("orders", o)
        wh.upsert("orders", batch, Seq("o_orderkey"))
        wh.read("orders")
      }),

    // W2 under the gate end-to-end: manifest-append two batches onto a base
    // snapshot and read the union back — the multi-data-dir manifest read
    // itself is what gets hash-verified.
    QueryDef(
      "q_warehouse_append",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |UNION ALL
             |SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 = 0
             |UNION ALL
             |SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 11 = 0""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders").select("o_orderkey", "o_totalprice")
        val wh = new graft.tables.Warehouse(s,
          java.nio.file.Files.createTempDirectory("graft-q-wha").toString)
        wh.overwrite("orders", o)
        wh.append("orders", o.filter(col("o_orderkey") % 7 === 0))
        wh.append("orders", o.filter(col("o_orderkey") % 11 === 0))
        wh.read("orders")
      }),

    // Skew-salted two-phase aggregation — must be indistinguishable from
    // the plain GROUP BY (the oracle IS the unsalted SQL): the hot
    // returnflag keys split across 8 salts map-side, partials recombine.
    QueryDef(
      "q_salted_agg",
      Some("""SELECT l_returnflag,
             |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin),
      (s, dir) => graft.ops.Skew.saltedAgg(
        Tables.t(s, dir, "lineitem"),
        keys = Seq("l_returnflag"), salts = 8,
        partials = Seq(sum(col("l_quantity")).as("ps"), count(lit(1)).as("pn")),
        combine = Seq(round(sum(col("ps")), 2).as("sum_qty"), sum(col("pn")).as("n")))),

    // G1 — SELECT DISTINCT projection (hubspot_pos_company_status_v2.py:138).
    QueryDef(
      "q_distinct",
      Some("SELECT DISTINCT c_mktsegment, c_nationkey FROM customer"),
      (s, dir) => Tables.t(s, dir, "customer")
        .select("c_mktsegment", "c_nationkey").distinct()),

    // G2 — GROUP BY 1..5 composite-key dedup (hubspot_bm_contact_role.py:136-141).
    QueryDef(
      "q_dedup_composite",
      Some("""SELECT DISTINCT l_suppkey, l_returnflag, l_linestatus, l_tax, l_discount
             |FROM lineitem""".stripMargin),
      (s, dir) => Tables.t(s, dir, "lineitem")
        .select("l_suppkey", "l_returnflag", "l_linestatus", "l_tax", "l_discount")
        .distinct()),

    // G3/A5 — conditional-sum pivot per key (stripe/account.py:39-76):
    // one pass, map-side partial aggs, no per-bucket scans.
    QueryDef(
      "q_condsum_pivot",
      Some("""SELECT user_id,
             |  round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase_amount,
             |  round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 2) AS click_amount,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count,
             |  count(*) AS n_events
             |FROM events GROUP BY user_id""".stripMargin),
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy("user_id")
        .agg(
          round(sum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0))), 2).as("purchase_amount"),
          round(sum(when(col("event_type") === "click", col("value")).otherwise(lit(0.0))), 2).as("click_amount"),
          sum(when(col("event_type") === "error", lit(1L)).otherwise(lit(0L))).as("error_count"),
          count(lit(1)).as("n_events"))),

    // G4 — last-value-per-key reduce (hubspot_bm_contact.py:134-144),
    // expressed as row_number over a unique (ts desc, event_id desc) order.
    QueryDef(
      "q_latest_per_key",
      Some("""SELECT user_id, event_id AS last_event_id,
             |       event_type AS last_event_type, value AS last_value
             |FROM events
             |QUALIFY row_number() OVER (
             |  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin),
      (s, dir) => Relational.latestPerKey(
          Tables.t(s, dir, "events"),
          Seq("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        .select(
          col("user_id"),
          col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"),
          col("value").as("last_value"))),

    // G5/G6 — cursor advance: max id + batch count (billwerk_invoices.py:93).
    QueryDef(
      "q_cursor_max",
      Some("SELECT max(event_id) AS max_id, count(*) AS n FROM events"),
      (s, dir) => Tables.t(s, dir, "events")
        .agg(max(col("event_id")).as("max_id"), count(lit(1)).as("n"))),

    // L1 — ORDER BY + LIMIT/OFFSET work-shard carve
    // (lex_office_payments.py:56-61); unique sort key ⇒ deterministic page.
    QueryDef(
      "q_carve",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_orderkey LIMIT 500 OFFSET 3000""".stripMargin),
      (s, dir) => Relational.carve(
        Tables.t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        Seq("o_orderkey"), offset = 3000, limit = 500)),

    // J4/G1 — identity-resolution equi-join + distinct
    // (hubspot_bm_contact_role.py:135-159); dim side broadcast.
    QueryDef(
      "q_identity_join",
      Some("""SELECT DISTINCT c.c_custkey AS company_id, c.c_name AS name,
             |       c.c_mktsegment AS segment
             |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
             |WHERE o.o_orderstatus = 'O'""".stripMargin),
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        val o = Tables.t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        o.join(broadcast(c), c("c_custkey") === o("o_custkey"))
          .select(
            col("c_custkey").as("company_id"),
            col("c_name").as("name"),
            col("c_mktsegment").as("segment"))
          .distinct()
      }),

    // P18 — schema alignment: union of two differently-shaped projections,
    // missing columns padded with typed NULLs (biilwerk_customers.py:152-161).
    QueryDef(
      "q_schema_align",
      Some("""SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
             |FROM orders WHERE o_orderkey % 2 = 0
             |UNION ALL
             |SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderpriority
             |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        val a = o.filter(col("o_orderkey") % 2 === 0).select("o_orderkey", "o_totalprice")
        val b = o.filter(col("o_orderkey") % 2 === 1).select("o_orderkey", "o_orderpriority")
        val req = Seq("o_orderkey" -> "bigint", "o_totalprice" -> "double",
          "o_orderpriority" -> "string")
        Relational.alignSchema(a, req).unionByName(Relational.alignSchema(b, req))
      }),

    // TPC-H Q1 (pricing summary) — the full aggregate battery (q1_agg is
    // the slim two-column flagship): one scan, one partial-aggregated
    // groupBy, every money metric summed in full precision and rounded at
    // 4 (product grain), means as exact-sum/count division.
    QueryDef(
      "q_tpch_q1",
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 4) AS sum_qty,
             |  round(sum(l_extendedprice), 4) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
             |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
             |  round(sum(l_quantity) / count(*), 4) AS avg_qty,
             |  round(sum(l_extendedprice) / count(*), 4) AS avg_price,
             |  round(sum(l_discount) / count(*), 4) AS avg_disc,
             |  CAST(count(*) AS BIGINT) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin),
      (s, dir) => Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") <=
          lit(java.sql.Timestamp.valueOf("2001-09-01 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 4).as("sum_qty"),
          round(sum("l_extendedprice"), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
          round(sum("l_quantity") / count(lit(1)), 4).as("avg_qty"),
          round(sum("l_extendedprice") / count(lit(1)), 4).as("avg_price"),
          round(sum("l_discount") / count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    // TPC-H Q3 (shipping priority), adapted to the fixture's columns —
    // the canonical three-way join + filtered aggregate + top-k that
    // every optimizer benchmark starts from. The plan wants: both date
    // filters pushed to the scans, the filtered customer side broadcast,
    // and TakeOrderedAndProject for the top 10 (selection on unrounded
    // revenue; float noise ~1e-10 against O(1) revenue gaps).
    QueryDef(
      "q_tpch_q3",
      Some("""SELECT l_orderkey,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             |  o_orderdate, o_orderpriority
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-06-01'
             |  AND l_shipdate > TIMESTAMP '1998-06-01'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC,
             |  o_orderdate, l_orderkey
             |LIMIT 10""".stripMargin),
      (s, dir) => {
        val cut = lit(java.sql.Timestamp.valueOf("1998-06-01 00:00:00"))
        val c = Tables.t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_orderdate") < cut)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val l = Tables.t(s, dir, "lineitem")
          .filter(col("l_shipdate") > cut)
          .select("l_orderkey", "l_extendedprice", "l_discount")
        broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("__rev"))
          .orderBy(col("__rev").desc, col("o_orderdate"), col("l_orderkey"))
          .limit(10)
          .select(col("l_orderkey"), round(col("__rev"), 4).as("revenue"),
            col("o_orderdate"), col("o_orderpriority"))
      }),

    // TYPED cogroup (KeyValueGroupedDataset.cogroup): per-order
    // reconciliation of the header total vs its line items in ONE
    // co-partitioned pass — the typed-API shape for custom two-sided
    // per-key logic that doesn't fit a join+agg (here it does, which is
    // exactly what lets the oracle verify the cogroup machinery).
    // lines_total rounds at 4 (the exact grain of price×(1−discount):
    // 2+2 decimal digits) — never at 2, where a genuine half-tie meets
    // engine-specific double rounding.
    QueryDef(
      "q_cogroup_reconcile",
      Some("""WITH ls AS (SELECT l_orderkey, count(*) AS n_lines,
             |    sum(l_extendedprice * (1 - l_discount)) AS lt
             |  FROM lineitem GROUP BY 1)
             |SELECT o.o_orderkey AS order_key,
             |  CAST(coalesce(ls.n_lines, 0) AS INT) AS n_lines,
             |  round(o.o_totalprice, 2) AS order_total,
             |  round(coalesce(ls.lt, 0.0), 4) AS lines_total
             |FROM orders o LEFT JOIN ls ON ls.l_orderkey = o.o_orderkey""".stripMargin),
      (s, dir) => cogroupReconcile(s, dir))
  )
}

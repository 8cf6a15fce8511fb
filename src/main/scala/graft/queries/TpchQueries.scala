package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Adapted TPC-H decision-support battery — the FULL 22-query suite over
  * the fixture warehouse: the canonical multi-join / selective-filter /
  * top-k shapes a relational engine must plan well at scale. Q1/Q3 live in
  * RelationalQueries; this file covers the other twenty. Queries whose
  * schema the fixture lacks (no partsupp table; no l_commitdate /
  * l_receiptdate / l_shipmode columns) are adapted to equivalent plan
  * shapes on existing columns, noted per query.
  *
  * Scale discipline shared by the battery:
  *   - every dimension join (nation, region, part, supplier, filtered
  *     customer) is broadcast — dims stay small while facts grow;
  *   - date/brand/flag predicates sit directly on the scan so parquet
  *     pushdown + column pruning apply (PlanSpec asserts the shapes);
  *   - money sums round at 4 (the exact grain of price×(1−discount):
  *     2+2 decimal digits) — never at 2 where half-ties meet
  *     engine-specific double rounding;
  *   - quantity comparisons (Q17/Q18) are exact: integral quantities sum
  *     without float error, so HAVING/threshold predicates cannot straddle
  *     a last-bit boundary between engines.
  */
object TpchQueries {

  private def ts(d: String): Column =
    lit(java.sql.Timestamp.valueOf(d + " 00:00:00"))

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q4 (order priority checking), adapted: the fixture has no
    // l_commitdate/l_receiptdate, so the EXISTS probes for a returned line
    // (l_returnflag = 'R') instead of a late one — same plan shape: a
    // selective fact filter, a left-semi join against a second fact scan,
    // and a tiny grouped count.
    QueryDef(
      "q_tpch_q4",
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
             |GROUP BY o_orderpriority""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1997-01-01") &&
            col("o_orderdate") < ts("1997-04-01"))
          .select("o_orderkey", "o_orderpriority")
        val l = Tables.t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey")
        o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      }),

    // TPC-H Q5 (local supplier volume): revenue per nation where the
    // customer and supplier share a nation, scoped to one region + one
    // order year. The three dims (supplier⨝nation⨝region) broadcast as one
    // pre-joined side keyed (s_suppkey, s_nationkey); the fact side is the
    // orders⨝lineitem⨝customer shuffle chain.
    QueryDef(
      "q_tpch_q5",
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name""".stripMargin),
      (s, dir) => {
        val dims = Tables.t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
          .join(Tables.t(s, dir, "nation"),
            col("s_nationkey") === col("n_nationkey"))
          .join(Tables.t(s, dir, "region").filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_nationkey", "n_name")
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1997-01-01"))
          .select("o_orderkey", "o_custkey")
        val l = Tables.t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        val c = Tables.t(s, dir, "customer").select("c_custkey", "c_nationkey")
        o.join(l, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("c_custkey") === col("o_custkey"))
          .join(broadcast(dims), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
      }),

    // TPC-H Q6 (forecasting revenue change): the pure scan-side query —
    // all three predicates must reach the parquet reader (PlanSpec asserts
    // PushedFilters), one partial-agg sum, no shuffle beyond the final
    // single-row combine.
    QueryDef(
      "q_tpch_q6",
      Some("""SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin),
      (s, dir) => Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4)
          .as("revenue"))),

    // TPC-H Q7 (volume shipping): revenue flowing between two specific
    // nations (either direction), by supplier-nation / customer-nation /
    // ship year. Both nation joins broadcast; the disjunctive nation-pair
    // predicate applies after the broadcast joins, where it touches two
    // already-resolved dim columns rather than the fact scan.
    QueryDef(
      "q_tpch_q7",
      Some("""SELECT supp_nation, cust_nation, l_year,
             |  round(sum(volume), 4) AS revenue
             |FROM (
             |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |    CAST(year(l_shipdate) AS INT) AS l_year,
             |    l_extendedprice * (1 - l_discount) AS volume
             |  FROM supplier
             |  JOIN lineitem ON s_suppkey = l_suppkey
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
             |    AND l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1998-01-01') shipping
             |GROUP BY supp_nation, cust_nation, l_year""".stripMargin),
      (s, dir) => {
        val nation = Tables.t(s, dir, "nation")
        val n1 = nation.select(col("n_nationkey").as("n1_key"),
          col("n_name").as("supp_nation"))
        val n2 = nation.select(col("n_nationkey").as("n2_key"),
          col("n_name").as("cust_nation"))
        val sup = Tables.t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val l = Tables.t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1998-01-01"))
          .select("l_orderkey", "l_suppkey", "l_shipdate",
            "l_extendedprice", "l_discount")
        val o = Tables.t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val c = Tables.t(s, dir, "customer").select("c_custkey", "c_nationkey")
        l.join(o, col("o_orderkey") === col("l_orderkey"))
          .join(c, col("c_custkey") === col("o_custkey"))
          .join(broadcast(sup), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
          .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
          .filter((col("supp_nation") === "NATION_1" &&
              col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" &&
              col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
      }),

    // TPC-H Q8 (national market share): NATION_3's share of ECONOMY-part
    // revenue sold into ASIA-region customers, per order year. The widest
    // join in the suite (7 tables); part/supplier/nation×2/region all
    // broadcast, facts shuffle once on orderkey and once on custkey.
    QueryDef(
      "q_tpch_q8",
      Some("""SELECT o_year,
             |  round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END)
             |        / sum(volume), 4) AS mkt_share
             |FROM (
             |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             |    l_extendedprice * (1 - l_discount) AS volume,
             |    n2.n_name AS nation
             |  FROM part
             |  JOIN lineitem ON p_partkey = l_partkey
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |  JOIN region ON n1.n_regionkey = r_regionkey
             |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
             |    AND o_orderdate >= TIMESTAMP '1996-01-01'
             |    AND o_orderdate < TIMESTAMP '1998-01-01') all_nations
             |GROUP BY o_year""".stripMargin),
      (s, dir) => {
        val nation = Tables.t(s, dir, "nation")
        val p = Tables.t(s, dir, "part")
          .filter(col("p_type") === "ECONOMY").select("p_partkey")
        val custDim = Tables.t(s, dir, "customer").select("c_custkey", "c_nationkey")
          .join(broadcast(nation.select(col("n_nationkey").as("n1_key"),
            col("n_regionkey"))), col("c_nationkey") === col("n1_key"))
          .join(broadcast(Tables.t(s, dir, "region")
            .filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey")
        val suppDim = Tables.t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
          .join(broadcast(nation.select(col("n_nationkey").as("n2_key"),
            col("n_name").as("nation"))), col("s_nationkey") === col("n2_key"))
          .select("s_suppkey", "nation")
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1998-01-01"))
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val l = Tables.t(s, dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount")
        l.join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(custDim, col("o_custkey") === col("c_custkey"))
          .join(broadcast(suppDim), col("s_suppkey") === col("l_suppkey"))
          .withColumn("volume",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(round(
            sum(when(col("nation") === "NATION_3", col("volume"))
              .otherwise(lit(0.0))) / sum(col("volume")), 4).as("mkt_share"))
      }),

    // TPC-H Q10 (returned-item reporting): top 20 customers by revenue
    // lost to returns in one quarter. Filtered orders ⨝ returned lines on
    // the fact side; customer⨝nation broadcast; TakeOrderedAndProject for
    // the top-k (c_custkey tie-break keeps it deterministic).
    QueryDef(
      "q_tpch_q10",
      Some("""SELECT c_custkey, c_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             |  c_acctbal, n_name
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-04-01'
             |  AND l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, c_custkey
             |LIMIT 20""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1997-01-01") &&
            col("o_orderdate") < ts("1997-04-01"))
          .select("o_orderkey", "o_custkey")
        val l = Tables.t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        val c = Tables.t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
          .join(broadcast(Tables.t(s, dir, "nation")
            .select("n_nationkey", "n_name")),
            col("c_nationkey") === col("n_nationkey"))
        o.join(l, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("c_custkey") === col("o_custkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("__rev"))
          .orderBy(col("__rev").desc, col("c_custkey"))
          .limit(20)
          .select(col("c_custkey"), col("c_name"),
            round(col("__rev"), 4).as("revenue"), col("c_acctbal"),
            col("n_name"))
      }),

    // TPC-H Q13 (customer order-count distribution): left outer join with
    // an extra join-condition predicate (priority filter lives IN the join,
    // not a WHERE — unmatched customers must still count as 0), then a
    // second aggregation over the first's output.
    QueryDef(
      "q_tpch_q13",
      Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
             |FROM (
             |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey) c_orders
             |GROUP BY c_count""".stripMargin),
      (s, dir) => {
        val c = Tables.t(s, dir, "customer").select("c_custkey")
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_orderkey", "o_custkey")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
      }),

    // TPC-H Q14 (promo revenue): the fixture's p_type is a bare class
    // ('PROMO'), so the LIKE 'PROMO%' collapses to equality. Part
    // broadcast into the month-filtered lineitem scan; one conditional-sum
    // ratio.
    QueryDef(
      "q_tpch_q14",
      Some("""SELECT round(
             |    100.0 * sum(CASE WHEN p_type = 'PROMO'
             |                THEN l_extendedprice * (1 - l_discount)
             |                ELSE 0.0 END)
             |    / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
             |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin),
      (s, dir) => {
        val l = Tables.t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-09-01") &&
            col("l_shipdate") < ts("1996-10-01"))
          .select("l_partkey", "l_extendedprice", "l_discount")
        val p = Tables.t(s, dir, "part").select("p_partkey", "p_type")
        l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .withColumn("disc_price",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
          .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", col("disc_price"))
              .otherwise(lit(0.0))) / sum(col("disc_price")), 4)
            .as("promo_revenue"))
      }),

    // TPC-H Q15 (top supplier): revenue-per-supplier CTE reused twice —
    // once as the join input, once reduced to its max — without any
    // driver-side collect: the single-row max broadcasts back onto the CTE.
    // Within-engine argmax means cross-engine float noise cannot flip the
    // winner unless two suppliers tie to ~1e-10 (revenue gaps are O(1)).
    QueryDef(
      "q_tpch_q15",
      // revenue is rounded to CENTS before the max-tie comparison: the
      // spec's revenue is exact DECIMAL, and comparing raw double sums
      // breaks the moment two suppliers genuinely tie — each engine's
      // summation order perturbs a different tie member's last ulp (the
      // sf1 replicated fixture, where every replica's top supplier ties,
      // caught Spark emitting 6 rows vs DuckDB's 4). Cent-rounding makes
      // the tie set identical on both engines; at tie-free SFs it
      // changes nothing.
      Some("""WITH revenue AS (
             |  SELECT l_suppkey AS supplier_no,
             |    round(sum(l_extendedprice * (1 - l_discount)), 2)
             |      AS total_revenue
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-04-01'
             |  GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name,
             |  round(total_revenue, 4) AS total_revenue
             |FROM supplier JOIN revenue ON s_suppkey = supplier_no
             |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin),
      (s, dir) => {
        val rev = Tables.t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1996-04-01"))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("total_revenue"))
        val mx = rev.agg(max(col("total_revenue")).as("__mx"))
        val sup = Tables.t(s, dir, "supplier").select("s_suppkey", "s_name")
        rev.join(broadcast(mx), col("total_revenue") === col("__mx"))
          .join(broadcast(sup), col("s_suppkey") === col("supplier_no"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("total_revenue"), 4).as("total_revenue"))
      }),

    // TPC-H Q16 (parts/supplier relationship), adapted: no partsupp table,
    // so the part↔supplier incidence comes from lineitem; the NOT IN
    // supplier-complaint subfilter has no comment column to probe and is
    // dropped. Exercises count(DISTINCT) over a broadcast-joined dim
    // attribute set.
    QueryDef(
      "q_tpch_q16",
      Some("""SELECT p_brand, p_type, p_size,
             |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#5'
             |  AND p_size IN (1, 5, 9, 14, 20, 23, 36, 49)
             |GROUP BY p_brand, p_type, p_size""".stripMargin),
      (s, dir) => {
        val p = Tables.t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#5" &&
            col("p_size").isin(1, 5, 9, 14, 20, 23, 36, 49))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        Tables.t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
          .join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      }),

    // TPC-H Q17 (small-quantity-order revenue): the correlated
    // avg-per-part subquery, decorrelated into a grouped side. The
    // threshold predicate is algebraically exact: quantities are integral
    // doubles, so `l_quantity < 0.2 * avg(qty)` is rewritten as
    // `5 * qty * cnt < qsum` — pure integer-valued arithmetic that both
    // engines evaluate identically regardless of summation order (a
    // division-form threshold could straddle a last-bit boundary).
    QueryDef(
      "q_tpch_q17",
      Some("""WITH pq AS (
             |  SELECT l_partkey AS a_partkey, CAST(count(*) AS BIGINT) AS cnt,
             |    sum(l_quantity) AS qsum
             |  FROM lineitem GROUP BY l_partkey)
             |SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |JOIN pq ON a_partkey = l_partkey
             |WHERE p_brand = 'Brand#23'
             |  AND 5.0 * l_quantity * cnt < qsum""".stripMargin),
      (s, dir) => {
        val l = Tables.t(s, dir, "lineitem")
        val pq = l.groupBy(col("l_partkey").as("a_partkey"))
          .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("qsum"))
        val p = Tables.t(s, dir, "part")
          .filter(col("p_brand") === "Brand#23").select("p_partkey")
        l.select("l_partkey", "l_quantity", "l_extendedprice")
          .join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .join(pq, col("a_partkey") === col("l_partkey"))
          .filter(lit(5.0) * col("l_quantity") * col("cnt") < col("qsum"))
          .agg(round(sum("l_extendedprice") / 7.0, 4).as("avg_yearly"))
      }),

    // TPC-H Q18 (large-volume customers): aggregate lineitem FIRST, keep
    // only orders whose total quantity clears the threshold (46 of ~15k at
    // sf0.01 — selectivity holds at scale, it's a fixed quantile of the
    // order-size distribution), then join the small survivor set to
    // orders/customer. Joining before aggregating would drag full
    // lineitem through two joins for nothing. Integral quantities make
    // the HAVING exact in both engines.
    QueryDef(
      "q_tpch_q18",
      Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             |  sum(l_quantity) AS total_qty
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
             |HAVING sum(l_quantity) > 300
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 100""".stripMargin),
      (s, dir) => {
        val big = Tables.t(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum("l_quantity").as("total_qty"))
          .filter(col("total_qty") > 300)
        val o = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        val c = Tables.t(s, dir, "customer").select("c_custkey", "c_name")
        big.join(o, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(c), col("c_custkey") === col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
          .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty")
      }),

    // TPC-H Q19 (discounted revenue, disjunctive predicates): three
    // brand×size×quantity conjunction arms OR'd together — the shape that
    // tests whether the planner pushes the common part-side predicate into
    // the broadcast build and keeps the residual disjunction as one
    // codegen'd filter instead of a union of three scans.
    QueryDef(
      "q_tpch_q19",
      Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             |       AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             |       AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
             |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin),
      (s, dir) => {
        val p = Tables.t(s, dir, "part")
          .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#24") &&
            col("p_size").between(1, 15))
          .select("p_partkey", "p_brand", "p_size")
        Tables.t(s, dir, "lineitem")
          .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
          .join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30)))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
      }),

    // TPC-H Q22 (global sales opportunity), adapted: the fixture has no
    // phone column and every customer has at least one order, so the
    // country-code carve becomes a nationkey set and the NOT EXISTS
    // probes for *recent* orders (none since 2000-07-01) — same shape:
    // scalar-subquery threshold (positive-balance average) + anti-join +
    // grouped rollup.
    QueryDef(
      "q_tpch_q22",
      Some("""SELECT c_nationkey AS cntrycode,
             |  CAST(count(*) AS BIGINT) AS numcust,
             |  round(sum(c_acctbal), 4) AS totacctbal
             |FROM customer
             |WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
             |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
             |                   WHERE c_acctbal > 0.0
             |                     AND c_nationkey IN (0, 1, 2, 3, 4, 5, 6))
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderdate >= TIMESTAMP '2000-07-01')
             |GROUP BY c_nationkey""".stripMargin),
      (s, dir) => {
        val nk = Seq(0, 1, 2, 3, 4, 5, 6)
        val c = Tables.t(s, dir, "customer")
          .filter(col("c_nationkey").isin(nk: _*))
          .select("c_custkey", "c_nationkey", "c_acctbal")
        val avgBal = c.filter(col("c_acctbal") > 0.0)
          .agg(avg("c_acctbal").as("__avg"))
        val recent = Tables.t(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("2000-07-01"))
          .select("o_custkey")
        c.join(broadcast(avgBal), col("c_acctbal") > col("__avg"))
          .join(recent, col("o_custkey") === col("c_custkey"), "left_anti")
          .groupBy(col("c_nationkey").as("cntrycode"))
          .agg(count(lit(1)).as("numcust"),
            round(sum("c_acctbal"), 4).as("totacctbal"))
      }),

    // TPC-H Q2 (minimum-cost supplier), adapted: no partsupp, so the
    // observed unit cost min(l_extendedprice / l_quantity) per
    // (part, supplier) stands in for ps_supplycost. The correlated min
    // subquery decorrelates into a grouped min joined back on exact
    // equality — safe across engines because both pick the min of the
    // SAME per-row doubles (no summation; IEEE division is
    // deterministic). Dims (supplier⨝nation⨝region, filtered part)
    // broadcast; the only fact-sized shuffle is the (part,supp) cost agg.
    QueryDef(
      "q_tpch_q2",
      Some("""WITH cost AS (
             |  SELECT l_partkey, l_suppkey,
             |    min(l_extendedprice / l_quantity) AS unit_cost
             |  FROM lineitem GROUP BY 1, 2),
             |eligible AS (
             |  SELECT c.l_partkey AS e_partkey, c.unit_cost,
             |    s_name, s_acctbal, n_name
             |  FROM cost c
             |  JOIN supplier ON s_suppkey = c.l_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'EUROPE'),
             |best AS (SELECT e_partkey AS b_partkey, min(unit_cost) AS best_cost
             |  FROM eligible GROUP BY 1)
             |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
             |  round(unit_cost, 4) AS unit_cost
             |FROM eligible
             |JOIN best ON b_partkey = e_partkey AND unit_cost = best_cost
             |JOIN part ON p_partkey = e_partkey
             |WHERE p_type = 'STANDARD' AND p_size <= 10
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
             |LIMIT 100""".stripMargin),
      (s, dir) => {
        val p = Tables.t(s, dir, "part")
          .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
          .select("p_partkey", "p_name")
        val supGeo = Tables.t(s, dir, "supplier")
          .join(broadcast(Tables.t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.t(s, dir, "region")
              .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name")
        val eligible = Tables.t(s, dir, "lineitem")
          .join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .groupBy("p_partkey", "p_name", "l_suppkey")
          .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
          .join(broadcast(supGeo), col("s_suppkey") === col("l_suppkey"))
        val best = eligible.groupBy(col("p_partkey").as("b_partkey"))
          .agg(min("unit_cost").as("best_cost"))
        eligible
          .join(best, col("b_partkey") === col("p_partkey") &&
            col("unit_cost") === col("best_cost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_name"),
            round(col("unit_cost"), 4).as("unit_cost"))
      }),

    // TPC-H Q9 (product-type profit), adapted: no ps_supplycost, so cost
    // is the deterministic proxy 0.6 × p_retailprice per unit (the
    // standard TPC-H supplycost is itself retailprice-derived). Part and
    // supplier⨝nation broadcast; the orders join carries only
    // (o_orderkey, o_orderdate).
    QueryDef(
      "q_tpch_q9",
      Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             |  round(sum(l_extendedprice * (1 - l_discount)
             |    - 0.6 * p_retailprice * l_quantity), 4) AS profit
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey AND p_name LIKE '%bolt%'
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN orders ON o_orderkey = l_orderkey
             |GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        val p = Tables.t(s, dir, "part")
          .filter(col("p_name").like("%bolt%"))
          .select("p_partkey", "p_retailprice")
        val sn = Tables.t(s, dir, "supplier")
          .join(broadcast(Tables.t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "n_name")
        Tables.t(s, dir, "lineitem")
          .select("l_partkey", "l_suppkey", "l_orderkey", "l_quantity",
            "l_extendedprice", "l_discount")
          .join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .join(broadcast(sn), col("s_suppkey") === col("l_suppkey"))
          .join(Tables.t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).as("o_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
            - lit(0.6) * col("p_retailprice") * col("l_quantity")), 4)
            .as("profit"))
      }),

    // TPC-H Q11 (important stock), adapted: part value = discounted
    // revenue shipped by the scoped nations' suppliers, aggregated in
    // INTEGER CENTS (the q_rollup idiom) so the `share > 0.1%-of-total`
    // HAVING is exact integer arithmetic — a double-sum threshold could
    // flip rows near the boundary between engines. cents×1000 stays
    // far inside int64 up to ~9×10^15 cents (~$90T) total.
    QueryDef(
      "q_tpch_q11",
      Some("""WITH v AS (
             |  SELECT l_partkey,
             |    CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
             |      AS cents
             |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  WHERE n_name IN ('NATION_7', 'NATION_8')),
             |pv AS (SELECT l_partkey AS p_partkey,
             |    CAST(sum(cents) AS BIGINT) AS part_cents
             |  FROM v GROUP BY 1),
             |tot AS (SELECT CAST(sum(part_cents) AS BIGINT) AS total_cents
             |  FROM pv)
             |SELECT p_partkey, round(part_cents / 100.0, 2) AS value
             |FROM pv, tot WHERE part_cents * 1000 > total_cents""".stripMargin),
      (s, dir) => {
        val sn = Tables.t(s, dir, "supplier")
          .join(broadcast(Tables.t(s, dir, "nation")
              .filter(col("n_name").isin("NATION_7", "NATION_8"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey")
        val pv = Tables.t(s, dir, "lineitem")
          .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
          .join(broadcast(sn), col("s_suppkey") === col("l_suppkey"))
          .groupBy(col("l_partkey").as("p_partkey"))
          .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * 100).cast("long")).as("part_cents"))
        val tot = pv.agg(sum("part_cents").as("total_cents"))
        pv.join(broadcast(tot), col("part_cents") * 1000 > col("total_cents"))
          .select(col("p_partkey"),
            round(col("part_cents") / 100.0, 2).as("value"))
      }),

    // TPC-H Q12 (shipping modes / order priority), adapted: no l_shipmode
    // column, so the two-mode carve uses the returnflag classes R/A —
    // same plan shape: selective fact filter + fact⨝fact join + two
    // conditional counts per group.
    QueryDef(
      "q_tpch_q12",
      Some("""SELECT l_returnflag,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_returnflag IN ('R', 'A')
             |  AND l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |GROUP BY l_returnflag""".stripMargin),
      (s, dir) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        val l = Tables.t(s, dir, "lineitem")
          .filter(col("l_returnflag").isin("R", "A") &&
            col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1997-01-01"))
          .select("l_orderkey", "l_returnflag")
        Tables.t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy("l_returnflag")
          .agg(sum(when(hi, 1).otherwise(0)).as("high_line_count"),
            sum(when(!hi, 1).otherwise(0)).as("low_line_count"))
      }),

    // TPC-H Q20 (potential part promotion), adapted: no partsupp availqty,
    // so a supplier qualifies by having shipped > 40 units of some 'red%'
    // part inside the year — the same nested semi-join shape (supplier ⋉
    // (lineitem⨝part grouped HAVING)). Quantities are integral doubles:
    // the HAVING threshold is exact in both engines.
    QueryDef(
      "q_tpch_q20",
      Some("""SELECT s_suppkey, s_name
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_name IN ('NATION_3', 'NATION_4', 'NATION_5', 'NATION_6')
             |  AND s_suppkey IN (
             |    SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
             |    WHERE p_name LIKE 'red%'
             |      AND l_shipdate >= TIMESTAMP '1996-01-01'
             |      AND l_shipdate < TIMESTAMP '1997-01-01'
             |    GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 40)""".stripMargin),
      (s, dir) => {
        val p = Tables.t(s, dir, "part")
          .filter(col("p_name").like("red%")).select("p_partkey")
        val qualified = Tables.t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1997-01-01"))
          .select("l_partkey", "l_suppkey", "l_quantity")
          .join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .groupBy("l_suppkey", "l_partkey")
          .agg(sum("l_quantity").as("__q"))
          .filter(col("__q") > 40)
          .select("l_suppkey")
        Tables.t(s, dir, "supplier")
          .join(broadcast(Tables.t(s, dir, "nation")
              .filter(col("n_name").isin(
                "NATION_3", "NATION_4", "NATION_5", "NATION_6"))),
            col("s_nationkey") === col("n_nationkey"))
          .select("s_suppkey", "s_name")
          .join(qualified, col("l_suppkey") === col("s_suppkey"), "left_semi")
      }),

    // TPC-H Q21 (suppliers who kept orders waiting), adapted: "late line"
    // := returned line (the Q4 proxy — no receipt/commit dates). The
    // correlated EXISTS / NOT EXISTS pair decorrelates into ONE per-order
    // aggregate: n_supp>1 ⇔ "another supplier shipped on this order",
    // n_ret=1 ⇔ "no OTHER supplier's line was returned" (this line is
    // returned, so its supplier is the one). One extra fact-side agg
    // replaces two correlated probes — at scale that's one shuffle
    // instead of two fact⨝fact semi-joins.
    QueryDef(
      "q_tpch_q21",
      Some("""WITH os AS (
             |  SELECT l_orderkey AS a_orderkey,
             |    count(DISTINCT l_suppkey) AS n_supp,
             |    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
             |      AS n_ret
             |  FROM lineitem GROUP BY 1)
             |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
             |FROM lineitem l1
             |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
             |JOIN os ON a_orderkey = l1.l_orderkey
             |JOIN supplier ON s_suppkey = l1.l_suppkey
             |WHERE l1.l_returnflag = 'R' AND n_supp > 1 AND n_ret = 1
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin),
      (s, dir) => {
        val l = Tables.t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_returnflag")
        val os = l.groupBy(col("l_orderkey").as("a_orderkey"))
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(when(col("l_returnflag") === "R", col("l_suppkey")))
              .as("n_ret"))
          .filter(col("n_supp") > 1 && col("n_ret") === 1)
          .select("a_orderkey")
        val fOrders = Tables.t(s, dir, "orders")
          .filter(col("o_orderstatus") === "F").select("o_orderkey")
        l.filter(col("l_returnflag") === "R")
          .join(fOrders, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .join(os, col("a_orderkey") === col("l_orderkey"), "left_semi")
          .join(broadcast(Tables.t(s, dir, "supplier")
            .select("s_suppkey", "s_name")),
            col("s_suppkey") === col("l_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      })
  )
}

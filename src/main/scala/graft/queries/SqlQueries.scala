package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Remaining SURVEY.md §2 surface: S10 (warehouse SQL scan) and the
  * P3/P5/P7 projection/filter idioms.
  */
object SqlQueries {

  val defs: Seq[QueryDef] = Seq(

    // S10 — SQL string against warehouse tables (BigQueryHook.query
    // analogue, hubspot_bm_contact.py:146-160): temp views + spark.sql.
    // The SQL text is identical to what the reference would ship to BQ.
    QueryDef(
      "q_sql_scan",
      Some("""SELECT c.c_mktsegment AS segment, count(*) AS n_orders,
             |       round(sum(o.o_totalprice), 2) AS revenue
             |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |WHERE o.o_orderstatus <> 'F'
             |GROUP BY c.c_mktsegment""".stripMargin),
      (s, dir) => {
        Tables.t(s, dir, "orders").createOrReplaceTempView("orders")
        Tables.t(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql("""SELECT c.c_mktsegment AS segment, count(*) AS n_orders,
                |       round(sum(o.o_totalprice), 2) AS revenue
                |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                |WHERE o.o_orderstatus <> 'F'
                |GROUP BY c.c_mktsegment""".stripMargin)
      }),

    // P3/P5/P7 — bulk rename (df.rename columns= analogue,
    // churn_reasons.py:73-98), set-membership row filter
    // (churn_reasons.py:71), and the string predicates of
    // hubspot_pos_contact_role.py:161-164 (non-empty + upper() <> 'X').
    QueryDef(
      "q_rename_filter",
      Some("""SELECT o_orderkey AS order_id, o_orderpriority AS priority,
             |       o_orderstatus AS status
             |FROM orders
             |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
             |  AND o_orderstatus <> '' AND upper(o_orderstatus) <> 'X'""".stripMargin),
      (s, dir) => Tables.t(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .filter(col("o_orderstatus") =!= "" && upper(col("o_orderstatus")) =!= "X")
        .withColumnsRenamed(Map(
          "o_orderkey" -> "order_id",
          "o_orderpriority" -> "priority",
          "o_orderstatus" -> "status"))
        .select("order_id", "priority", "status"))
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.{Nested, Relational}

/** SURVEY.md §2.3 (A1–A5) + §2.4 J3, exercised through the synthesized
  * nested form of lineitem (FIXTURES.md: collect_list(struct) per l_orderkey,
  * then exploded back — self-verifying against the flat oracle).
  */
object NestedQueries {

  private val itemCols = Seq("l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")

  val defs: Seq[QueryDef] = Seq(

    // A1 — nest then explode: child rows re-emerge with the parent key
    // (extract_positions_from_order, bexio_orders_de.py:195-208). The
    // oracle is simply the flat table — nest∘explode must be the identity.
    QueryDef(
      "q_explode_items",
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice
             |FROM lineitem""".stripMargin),
      (s, dir) => {
        val nested = Nested.nest(
          Tables.t(s, dir, "lineitem"), "l_orderkey", itemCols, sorted = false)
        Nested.explodeChild(nested, Seq("l_orderkey"), "items")
      }),

    // A2 — explode with MULTIPLE parent fields broadcast onto every child
    // row (lex_office_invoice_items.py:212-249 copies invoice-level fields
    // into each line item). Parent attributes join the nested form first;
    // the oracle is the equivalent flat join.
    QueryDef(
      "q_explode_parent",
      Some("""SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
             |       l.l_linenumber, l.l_quantity
             |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey""".stripMargin),
      (s, dir) => {
        val nested = Nested.nest(
          Tables.t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
          "l_orderkey", Seq("l_linenumber", "l_quantity"), sorted = false)
        val parents = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus")
          .join(nested, col("o_orderkey") === col("l_orderkey"))
          .drop("l_orderkey")
        Nested.explodeChild(parents,
          Seq("o_orderkey", "o_custkey", "o_orderstatus"), "items")
      }),

    // A3 — first-element pluck from the sorted array (first line item per
    // order; `taxs[0]['percentage']` shape).
    QueryDef(
      "q_first_element",
      Some("""SELECT l_orderkey, l_linenumber AS first_linenumber,
             |       l_partkey AS first_partkey, l_quantity AS first_quantity
             |FROM lineitem
             |QUALIFY row_number() OVER (
             |  PARTITION BY l_orderkey
             |  ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice) = 1""".stripMargin),
      (s, dir) => {
        val nested = Nested.nest(
          Tables.t(s, dir, "lineitem"), "l_orderkey", itemCols)
        nested.select(
          col("l_orderkey"),
          Nested.firstElement(col("items")).getField("l_linenumber").as("first_linenumber"),
          Nested.firstElement(col("items")).getField("l_partkey").as("first_partkey"),
          Nested.firstElement(col("items")).getField("l_quantity").as("first_quantity"))
      }),

    // A5 — aggregate over the nested array without exploding (the Stripe
    // balance loop, stripe/account.py:39-76): row-local higher-order
    // aggregate, so the only shuffle is the nest itself.
    QueryDef(
      "q_nested_agg",
      Some("""SELECT l_orderkey,
             |  CAST(count(*) AS INT) AS n_items,
             |  round(sum(l_quantity), 2) AS total_qty
             |FROM lineitem GROUP BY l_orderkey""".stripMargin),
      (s, dir) => {
        val nested = Nested.nest(
          Tables.t(s, dir, "lineitem"), "l_orderkey", itemCols, sorted = false)
        nested.select(
          col("l_orderkey"),
          size(col("items")).as("n_items"),
          round(Nested.sumField(col("items"), "l_quantity"), 2).as("total_qty"))
      }),

    // J3 — key-preserving lookup join (bexio_orders_de.py:137-144): rows
    // already known keep their surrogate id and created_at; new rows get
    // deterministic sha2-derived ids (FIXTURES.md bans uuid()/now() in
    // verified outputs).
    QueryDef(
      "q_lookup_preserve",
      Some("""SELECT i.o_orderkey,
             |  CASE WHEN e.o_orderkey IS NOT NULL
             |       THEN sha256(concat('u', CAST(i.o_orderkey AS VARCHAR)))
             |       ELSE sha256(concat('new', CAST(i.o_orderkey AS VARCHAR))) END AS u_id,
             |  CASE WHEN e.o_orderkey IS NOT NULL
             |       THEN CAST(i.o_orderdate AS DATE)
             |       ELSE DATE '2026-01-01' END AS created_at
             |FROM orders i
             |LEFT JOIN (SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0) e
             |  ON i.o_orderkey = e.o_orderkey""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        val incoming = o.select("o_orderkey", "o_orderdate")
        val existing = o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"),
            sha2(concat(lit("u"), col("o_orderkey").cast("string")), 256).as("u_id"),
            col("o_orderdate").cast("date").as("created_at"))
        Relational.lookupPreserve(
          incoming, existing, "o_orderkey",
          preserve = Seq("u_id", "created_at"),
          fresh = Map(
            "u_id" -> sha2(concat(lit("new"), col("o_orderkey").cast("string")), 256),
            "created_at" -> lit(java.sql.Date.valueOf("2026-01-01"))))
          .select("o_orderkey", "u_id", "created_at")
      })
  )
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Array-of-struct operators (SURVEY.md §2.3, A1–A5). The reference iterates
  * Python lists per parent row (`extract_positions_from_order`,
  * bexio_orders_de.py:195-208); here nesting is `collect_list(struct(...))`
  * and un-nesting is the codegen'd `explode` Generator — both distributed,
  * one shuffle for the nest, zero for the explode.
  */
object Nested {

  /** Build the nested parent→items form: one row per parent with an array of
    * item structs. With `sorted` (default), `sort_array` pins element order
    * (collect_list order is partition-dependent) so downstream first-element
    * plucks are deterministic; pass sorted=false when downstream consumers
    * are order-insensitive (aggregations, re-explosion) to skip the per-row
    * sort. One shuffle on the parent key either way.
    */
  def nest(df: DataFrame, parentKey: String, itemCols: Seq[String],
      as: String = "items", sorted: Boolean = true): DataFrame = {
    val arr = collect_list(struct(itemCols.map(col): _*))
    df.groupBy(parentKey)
      .agg((if (sorted) sort_array(arr) else arr).as(as))
  }

  /** A1/A2 — explode array-of-struct to child rows carrying parent columns
    * (bexio_orders_de.py:195-208; lex_office_invoice_items.py:212-249).
    * explode drops parents with empty arrays — matching the reference's
    * `for item in positions` loop semantics; use explode_outer to keep them.
    */
  def explodeChild(df: DataFrame, parentCols: Seq[String], arrayCol: String,
      outer: Boolean = false): DataFrame = {
    val ex = if (outer) explode_outer(col(arrayCol)) else explode(col(arrayCol))
    df.select(parentCols.map(col) :+ ex.as("__item"): _*)
      .select(parentCols.map(col) :+ col("__item.*"): _*)
  }

  /** A3 — first-element pluck with NULL on empty
    * (`taxs[0]['percentage'] if tax_list else None`,
    * bexio_invoice_and_line_items_de.py:164). try_element_at is 1-based and
    * NULL-safe on out-of-range (plain element_at throws under ANSI mode,
    * which is Spark 4's default).
    */
  def firstElement(arrayCol: Column): Column = try_element_at(arrayCol, lit(1))

  /** A5 — aggregate over the nested array without exploding: sum of a
    * numeric field via higher-order `aggregate` (stripe/account.py:39-76
    * computes balances by looping the nested list client-side). Stays
    * row-local — no shuffle at all.
    */
  def sumField(arrayCol: Column, field: String): Column =
    aggregate(arrayCol, lit(0.0d), (acc, x) => acc + x.getField(field))
}

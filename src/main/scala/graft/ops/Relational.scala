package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational shapes of the reference (SURVEY.md §2.4–2.7), expressed as
  * DataFrame→DataFrame combinators so Catalyst keeps the whole plan
  * declarative (pushdown, pruning, AQE join selection all apply).
  */
object Relational {

  /** J1 — anti-join change detection: rows of `src` whose key tuple is not
    * yet in `hist` (reference execute_bexio_and_stripe_sql_queries.py:44-57:
    * `LEFT JOIN history ... WHERE history.id IS NULL`). left_anti shuffles
    * both sides on the key unless the history side is broadcastable — at
    * 100 TB the history table is large, so this stays a shuffle join on the
    * natural key; AQE picks broadcast when `hist` is small.
    */
  def historyDelta(src: DataFrame, hist: DataFrame, keys: Seq[String]): DataFrame =
    src.join(hist.select(keys.map(col): _*).dropDuplicates(keys), keys, "left_anti")

  /** J2 — NOT EXISTS dedup-insert on a composite key
    * (stripe_dispute.py:32-45): batch rows whose full key is absent from
    * `existing`. In-batch duplicates are also collapsed, mirroring the
    * idempotent at-least-once semantics of the reference.
    */
  def notExistsInsert(batch: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    batch.dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*).dropDuplicates(keys), keys, "left_anti")

  /** J5 + W3 — delete+insert upsert as a pure transform: target rows whose
    * key appears in `batch` are dropped (the DELETE ... WHERE key IN (...) of
    * bexio_orders_de.py:133-135), then the batch is appended.
    */
  def deleteInsert(target: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame =
    target.join(batch.select(keys.map(col): _*).dropDuplicates(keys), keys, "left_anti")
      .unionByName(batch, allowMissingColumns = true)

  /** J3 — key-preserving lookup join (bexio_orders_de.py:137-144): incoming
    * rows keep the `preserve` columns of a pre-existing row with the same
    * key; otherwise fall back to `fresh(colName)`. The reference's pandas
    * loop takes the FIRST match, so the lookup side is de-duplicated on the
    * key before joining (SURVEY.md §7.4) — this also prevents row explosion.
    */
  def lookupPreserve(
      incoming: DataFrame,
      existing: DataFrame,
      key: String,
      preserve: Seq[String],
      fresh: Map[String, Column]): DataFrame = {
    val lookup = existing.select((key +: preserve).map(col): _*).dropDuplicates(Seq(key))
    val renamed = preserve.foldLeft(lookup)((d, c) => d.withColumnRenamed(c, s"__ex_$c"))
    val joined = incoming.join(renamed, Seq(key), "left")
    preserve.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(s"__ex_$c"), fresh(c))).drop(s"__ex_$c")
    }
  }

  /** U1 — union-all consolidation across tenant tables with a provenance
    * literal (shore_bexio_all.py:53-58). unionByName keeps this robust to
    * column-order drift between tenants.
    */
  def consolidate(tenants: Seq[(String, DataFrame)], sourceCol: String = "source"): DataFrame =
    tenants.map { case (name, df) => df.withColumn(sourceCol, lit(name)) }
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** P18 — schema alignment: add any of `required` missing as typed NULLs
    * (biilwerk_customers.py:152-161), then project in declared order.
    */
  def alignSchema(df: DataFrame, required: Seq[(String, String)]): DataFrame = {
    val present = df.columns.toSet
    val padded = required.foldLeft(df) { case (d, (name, tpe)) =>
      if (present(name)) d else d.withColumn(name, lit(null).cast(tpe))
    }
    padded.select(required.map { case (n, _) => col(n) }: _*)
  }

  /** L1 — ORDER BY + LIMIT/OFFSET page carve (lex_office_payments.py:56-61).
    * Requires a unique sort key for deterministic pages. Spark plans this as
    * a global sort + CollectLimit; fine for the carve sizes the reference
    * uses (hundreds of rows), not meant for carving billions.
    */
  def carve(df: DataFrame, sortKeys: Seq[String], offset: Int, limit: Int): DataFrame =
    df.orderBy(sortKeys.map(col): _*).offset(offset).limit(limit)

  /** G4-adjacent — latest row per key by a total ordering (ties broken by
    * `tieBreak`, which must make the ordering unique for determinism).
    * One shuffle on the key; window + filter stays in whole-stage codegen.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}

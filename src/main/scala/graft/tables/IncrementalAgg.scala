package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate-view maintenance: a warehouse table of ALGEBRAIC
  * partial aggregates (sums/counts) that each batch merges into, so the
  * "materialized view" stays current without ever rescanning history —
  * the O(batch) replacement for the reference's recompute-the-report jobs.
  *
  * Only sum-combinable partials qualify (sum, count, sum-of-squares…);
  * avg/min/max must be derived from them at READ time, not stored.
  */
object IncrementalAgg {

  /** Merge a batch of partials (`keys` + sum-combinable value columns)
    * into `table`: existing partials ∪ batch, re-summed per key, swapped
    * atomically. Work is O(|table keys| + |batch|), not O(history).
    */
  def mergePartials(wh: Warehouse, table: String, batch: DataFrame,
      keys: Seq[String]): Unit = {
    val merged =
      if (!wh.exists(table)) batch
      else {
        val valueCols = batch.columns.filterNot(keys.contains).toSeq
        wh.read(table).unionByName(batch)
          .groupBy(keys.map(col): _*)
          .agg(sum(col(valueCols.head)).as(valueCols.head),
            valueCols.tail.map(c => sum(col(c)).as(c)): _*)
      }
    wh.overwrite(table, merged)
  }
}

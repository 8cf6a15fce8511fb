package graft.reverse

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** W7/G4 — reverse ETL (warehouse → CRM batch updates,
  * hubspot_bm_contact.py:101-132 + 57-64). The reference reduces query rows
  * to `{entity_id: {property: value}}` with first-write-wins, re-batches
  * into groups of 10/100, and POSTs each batch.
  *
  * Spark-first shape: the property-map reduce is a groupBy aggregation
  * (map_from_entries over deduplicated (property, value) pairs — NOT a
  * driver-side dict loop), and the POST fan-out is foreachPartition so each
  * executor streams its own batches. Only batch-sized buffers ever
  * materialize; nothing collects to the driver.
  */
object BatchSink {

  /** G4 — fold (entityId, property, value) rows into one property-map row
    * per entity. First-write-wins per (entity, property) replicated
    * deterministically: the kept value is the MIN by (value) for stability
    * regardless of partitioning — the reference's dict insertion order is
    * arrival order, which Spark must not depend on.
    */
  def propertyMaps(df: DataFrame, entityCol: String, propCol: String,
      valueCol: String): DataFrame =
    df.groupBy(col(entityCol), col(propCol))
      .agg(min(col(valueCol)).as("__v"))
      .groupBy(col(entityCol))
      .agg(map_from_entries(
        sort_array(collect_list(struct(col(propCol), col("__v")))))
        .as("properties"))

  /** W7 — stream batches of `batchSize` entity-updates to `post` from each
    * partition. `post` receives (batchIndexWithinPartition, rows). Returns
    * the number of batches posted (accumulated on the driver for
    * observability, like the reference's logging).
    */
  def postBatches(df: DataFrame, batchSize: Int,
      post: Seq[Row] => Unit): Long = {
    val acc = df.sparkSession.sparkContext.longAccumulator("graft.batchesPosted")
    df.foreachPartition { it: Iterator[Row] =>
      it.grouped(batchSize).foreach { g =>
        post(g)
        acc.add(1)
      }
    }
    acc.value
  }
}

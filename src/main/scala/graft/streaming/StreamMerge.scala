package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.Column
import org.apache.spark.sql.streaming.Trigger

import graft.ops.Relational
import graft.tables.Warehouse

/** foreachBatch merge sink — the production streaming-upsert pattern: each
  * micro-batch MERGES into a warehouse table instead of blind-appending.
  *
  * The merge rule is keep-latest-by-`order` per `keys` (applied to
  * currentTable ∪ batch), which makes the final table a pure function of
  * the event SET — independent of micro-batch boundaries, file arrival
  * order, and re-delivery. A plain last-write-wins upsert would instead
  * depend on processing order; at-least-once redelivery is also absorbed
  * (merging the same rows twice is a no-op). Combined with the warehouse's
  * atomic manifest swap, a crash mid-batch leaves the previous table state
  * fully intact and the restarted query re-merges idempotently.
  */
object StreamMerge {

  /** Run `stream` to completion (AvailableNow) merging every micro-batch
    * into `wh`/`table` with keep-latest semantics.
    */
  def runMergeLatest(
      stream: DataFrame,
      checkpoint: String,
      wh: Warehouse,
      table: String,
      keys: Seq[String],
      order: Seq[Column],
      maxFilesPerTrigger: Option[Int] = None): Unit = {
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val merged =
          if (wh.exists(table))
            Relational.latestPerKey(
              wh.read(table).unionByName(batch.toDF()), keys, order)
          else Relational.latestPerKey(batch.toDF(), keys, order)
        // self-overwrite is safe: the warehouse materializes the new data
        // dir BEFORE the manifest swap, so the read side of the merge
        // still resolves the old snapshot
        wh.overwrite(table, merged)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}

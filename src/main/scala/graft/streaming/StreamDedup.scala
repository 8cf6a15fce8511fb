package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.dedup.Dedup

/** Streaming exact deduplication — the streaming face of
  * [[graft.dedup.Dedup.exact]] for a continuously-arriving document feed
  * (the shape an always-on training-data intake runs): each document is
  * keyed by the sha-256 of its normalized text and only the FIRST
  * occurrence within the watermark horizon passes through.
  *
  * `dropDuplicatesWithinWatermark` keeps state per key only until the
  * watermark passes it — state is bounded by arrival-rate × delay, not by
  * corpus size, so this runs indefinitely on an unbounded stream. Exact
  * cross-horizon dedup (forever-uniqueness) is the batch layer's job:
  * `Warehouse.appendIfAbsent` on the same content hash downstream makes
  * the pipeline end-to-end exactly-once on content.
  */
object StreamDedup {

  /** Add the dedup key and drop in-horizon duplicates. `df` must be a
    * streaming DataFrame with an event-time column.
    */
  def dedupStream(stream: DataFrame, textCol: String, eventTimeCol: String,
      watermarkDelay: String = "1 hour"): DataFrame =
    stream
      .withColumn("content_hash", sha2(Dedup.normalized(col(textCol)), 256))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Drain an AvailableNow pass of the deduped stream into parquet. */
  def runAvailableNow(deduped: DataFrame, checkpoint: String,
      outPath: String): Unit = {
    val q = deduped.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}

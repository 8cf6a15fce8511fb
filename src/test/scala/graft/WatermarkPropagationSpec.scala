package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Pins Spark's per-microbatch watermark propagation — the rule
  * q_stream_late's oracle encodes. A batch LATE-FILTERS input with the
  * PREVIOUS batch's watermark and EVICTS state with the current one (both
  * derived from data seen before the batch):
  *
  *   batch0: f0 = {10:00}             lateW −∞     evictW −∞
  *   batch1: f1 = {20:00, 13:00}      lateW −∞     evictW 10:00
  *   batch2: f2 = {13:30, 23:00}      lateW 10:00  evictW 20:00
  *   batch3: (finalize)               lateW 20:00  evictW 23:00
  *
  * With δ = 0: the 13:00–14:00 window must emit count 2 — the 13:30 row
  * arrives when the LATE watermark is still 10:00 (not dropped) while the
  * same batch's EVICTION watermark (20:00) closes the window; an engine
  * filtering with the current watermark would emit count 1, and one
  * re-opening evicted windows would emit the key twice. The 23:00–24:00
  * window stays withheld (end > final watermark, exclusive above).
  * If a Spark upgrade flips this, q_stream_late's oracle must move with
  * it — this spec failing is the early warning.
  */
class WatermarkPropagationSpec extends SparkSpec {

  test("late filter uses previous watermark; eviction uses current") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-wmprop").toString
    def write(name: String, mtime: Long, rows: Seq[(Long, String)]): Unit = {
      val dir = s"$base/$name"
      rows.toDF("tsu", "k")
        .select(timestamp_micros(col("tsu")).as("ts"), col("k"))
        .coalesce(1).write.parquet(dir)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
      val dest = java.nio.file.Paths.get(s"$base/in/$name.parquet")
      java.nio.file.Files.copy(part, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val H = 3600000000L
    write("f0", 1000L, Seq((10 * H, "a")))
    write("f1", 2000L, Seq((20 * H, "a"), (13 * H, "a")))
    write("f2", 3000L, Seq((13 * H + H / 2, "a"), (23 * H, "a")))
    val schema = spark.read.parquet(s"$base/in/f0.parquet").schema
    val agg = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$base/in")
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("parquet")
      .option("checkpointLocation", s"$base/chk")
      .option("path", s"$base/out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$base/out")
      .select(unix_micros(col("window.start")).as("ws"), col("n"))
      .collect().map(r => (r.getLong(0) / H, r.getLong(1))).sorted.toSeq
    // 13-window count 2 (late row MERGED), no duplicates, 23-window withheld
    assert(out == Seq((10L, 1L), (13L, 2L), (20L, 1L)), out.toString)
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.state.Cursor
import graft.tables.Warehouse

/** §2.9 — incremental ingestion, two Spark-native forms.
  *
  * 1. `availableNowWindowed`: Structured Streaming with
  *    Trigger.AvailableNow over a parquet directory — the engine's own
  *    checkpointed exactly-once replacement for the reference's
  *    Variable-based cursor (billwerk_invoices.py:86-99). Watermark +
  *    tumbling-window aggregation; state is bounded by the watermark delay,
  *    so this runs unchanged on an unbounded 100 TB stream.
  *
  * 2. `batchIncrement`: the literal reference protocol — read rows above
  *    the watermark, sink idempotently, THEN advance the cursor
  *    (at-least-once fetch + idempotent sink = exactly-once effect).
  */
object IncrementalStream {

  /** Session clone with fewer shuffle partitions for STATEFUL stream
    * queries. Every shuffle partition materializes one state-store
    * instance per stateful operator (and per join side) — a two-sided
    * join at 32 partitions spins up and checkpoints 64+ stores, pure
    * overhead when a micro-batch carries thousands of rows, and the
    * count is pinned into the checkpoint for the query's lifetime. This
    * is the capacity knob a deployment sizes to state volume (raise it
    * for 100 TB state); correctness is partition-count-independent,
    * which the oracle gate re-proves every run. `newSession` shares the
    * SparkContext but isolates the conf, so concurrent batch queries
    * keep the session default.
    */
  def statefulSession(s: SparkSession, partitions: Int = 8): SparkSession = {
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    ss
  }

  /** Windowed event counts/sums with a watermark, AvailableNow trigger.
    * Caller supplies checkpoint + output sink via the returned writer.
    */
  def availableNowWindowed(
      spark: SparkSession,
      srcGlob: String,
      checkpoint: String,
      window_ : String = "1 hour",
      watermarkDelay: String = "2 hours"): (DataFrame, String) = {
    val schema = spark.read.parquet(srcGlob).schema
    // normalize ts for whichever fixture generation landed (ns-long or
    // µs-NTZ) — the helper dispatches on the schema, so it works on the
    // streaming DataFrame directly
    val stream = graft.Tables.normalizeEventTs(
        spark.readStream.schema(schema).parquet(srcGlob))
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))
    (stream, checkpoint)
  }

  /** Run the AvailableNow stream to completion into an in-memory/parquet
    * sink and return when drained.
    */
  def runAvailableNow(agg: DataFrame, checkpoint: String, outPath: String): Unit = {
    val q: StreamingQuery = agg.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Watermarked tumbling-window aggregation run as a REAL Structured
    * Streaming job (AvailableNow trigger, checkpointed, append mode) and
    * read back — the form the driver's oracle gate can hash-compare
    * against a batch SQL twin. Append mode only emits windows the final
    * watermark (max event time − delay) has passed; the batch oracle
    * applies the same cutoff. Money is summed in integer cents so the
    * result is invariant to micro-batch boundaries and aggregation order.
    */
  def windowedCountsGated(spark: SparkSession, sfDir: String): DataFrame = {
    val src = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(src).schema
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-").toString
    // FileStreamSource wants a landing DIRECTORY (the deployment shape:
    // files arrive in a dir); the fixture is a single file — stage it.
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    graft.Tables.stageFixture(src, s"$tmp/in/events")
    val agg = graft.Tables.normalizeEventTs(
        statefulSession(spark).readStream.schema(schema).parquet(s"$tmp/in"))
      .withColumn("value_cents", round(col("value") * 100, 0).cast("long"))
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value_cents").as("value_cents"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("value_cents"))
    runAvailableNow(agg, s"$tmp/chk", s"$tmp/out")
    spark.read.parquet(s"$tmp/out")
  }

  /** Streaming TOP-K (continuous leaderboard): the STREAM maintains the
    * watermarked per-(window, user) counts — the unbounded, stateful
    * part — and the k-bounded rank runs as a batch window over the
    * checkpointed sink at read time (partitioned by window, so state is
    * one window's user set, never the stream). This is the standard
    * split for top-k over streams: append-mode can't re-emit a
    * leaderboard row when a later arrival reorders it, so the ranking
    * stays out of the streaming graph and the sink stays incrementally
    * maintainable. Same staged landing dir + AvailableNow + append-mode
    * watermark cutoff as [[windowedCountsGated]].
    */
  def topkPerWindowGated(spark: SparkSession, sfDir: String): DataFrame = {
    val src = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(src).schema
    val tmp = java.nio.file.Files.createTempDirectory("graft-topk-").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    graft.Tables.stageFixture(src, s"$tmp/in/events")
    val agg = graft.Tables.normalizeEventTs(
        statefulSession(spark).readStream.schema(schema).parquet(s"$tmp/in"))
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("user_id"), col("n"))
    runAvailableNow(agg, s"$tmp/chk", s"$tmp/out")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("win_start_us").orderBy(col("n").desc, col("user_id"))
    spark.read.parquet(s"$tmp/out")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("win_start_us"), col("rk").cast("int").as("rk"),
        col("user_id"), col("n"))
  }

  /** Sliding-window sibling of [[windowedCountsGated]]: 2-hour windows
    * advancing every hour, so each event lands in TWO overlapping
    * windows — the overlap semantics (state per open window, twice the
    * window count) that tumbling windows don't exercise. Same staged
    * landing dir, checkpointed AvailableNow run, and append-mode
    * watermark cutoff; the oracle replays the two-window fan-out in
    * batch SQL.
    */
  def slidingCountsGated(spark: SparkSession, sfDir: String): DataFrame = {
    val src = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(src).schema
    val tmp = java.nio.file.Files.createTempDirectory("graft-slide-").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    graft.Tables.stageFixture(src, s"$tmp/in/events")
    val agg = graft.Tables.normalizeEventTs(
        statefulSession(spark).readStream.schema(schema).parquet(s"$tmp/in"))
      .withColumn("value_cents", round(col("value") * 100, 0).cast("long"))
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value_cents").as("value_cents"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("value_cents"))
    runAvailableNow(agg, s"$tmp/chk", s"$tmp/out")
    spark.read.parquet(s"$tmp/out")
  }

  /** Batch incremental with explicit watermark state: fetch rows with
    * `idCol` above the cursor, append-if-absent into the warehouse table,
    * advance the cursor to the batch max only after the write succeeds.
    * Returns rows ingested. Re-running after a crash between sink and
    * advance is a no-op thanks to the idempotent sink.
    */
  def batchIncrement(
      src: DataFrame,
      idCol: String,
      wh: Warehouse,
      table: String,
      cursor: Cursor): Long = {
    val from = cursor.value()
    // cast the cursor comparison and the max to long so any integral id
    // type works (Row.getLong on an INT column would ClassCastException)
    val batch = src.filter(col(idCol).cast("long") > lit(from))
    val stats = batch.agg(count(lit(1)), max(col(idCol).cast("long"))).first()
    val n = stats.getLong(0)
    if (n > 0) {
      // the batch plan is evaluated again inside the sink — deliberate:
      // it is a pushed-down parquet filter read, and persisting it here
      // would pin batch-sized state for a marginal saving
      wh.appendIfAbsent(table, batch, Seq(idCol))
      cursor.advance(stats.getLong(1))
    }
    n
  }
}

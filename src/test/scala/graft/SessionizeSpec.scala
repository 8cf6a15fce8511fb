package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class SessionizeSpec extends SparkSpec {
  import graft.streaming.Sessionize

  test("batch sessionization matches the window-function formulation") {
    val gap = 30L * 60 * 1000000 // 30 minutes in µs
    val got = Sessionize.sessionizeBatch(spark, sf, gap)
    // window formulation: session breaks where the gap to the previous
    // event exceeds the threshold; open (= last) session per user is kept
    // by flatMapGroupsWithState in batch mode, so compare closed+open
    val w = Window.partitionBy("user_id").orderBy("ts_micros", "event_type")
    val expected = Tables.t(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_micros"),
        col("event_type"))
      .withColumn("prev", lag("ts_micros", 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("ts_micros") - col("prev") > gap, 1)
          .otherwise(0))
      .withColumn("sess", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess")
      .agg(min("ts_micros").as("session_start"),
        max("ts_micros").as("session_end"),
        count(lit(1)).cast("int").as("n_events"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .cast("int").as("n_purchases"))
      .drop("sess")
    val g = got.select("user_id", "session_start", "session_end",
      "n_events", "n_purchases")
    val e = expected.select("user_id", "session_start", "session_end",
      "n_events", "n_purchases")
    assert(g.exceptAll(e).isEmpty && e.exceptAll(g).isEmpty,
      s"got=${g.count()} expected=${e.count()}")
    assert(g.count() > 0)
  }

  test("append-mode session eviction boundary: windowEnd == watermark tie, pinned") {
    // q_stream_session's oracle keeps a session iff
    // session_end + gap <= global max event time (inclusive at equality).
    // This pins Spark's side of that boundary EMPIRICALLY: user 1's only
    // event is exactly `gap` before the corpus max, so its session window
    // end equals the final watermark to the microsecond. If Spark's
    // append-mode eviction were exclusive (<), user 1 would be withheld
    // here and a real-data tie would flip a CORRECTNESS row.
    import spark.implicits._
    import org.apache.spark.sql.types._
    val gapUs = 24L * 3600 * 1000000
    val t0 = 86400L * 1000000 // 1 day past epoch, clear of the init watermark
    val base = java.nio.file.Files.createTempDirectory("graft-evict").toString
    Seq((1L, t0), (2L, t0 + gapUs)).toDF("user_id", "tsu")
      .withColumn("ts", timestamp_micros(col("tsu"))).drop("tsu")
      .coalesce(1).write.parquet(s"$base/in")
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampType)))
    val sessions = spark.readStream.schema(schema).parquet(s"$base/in")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "24 hours"))
      .agg(count(lit(1)).cast("int").as("n_events"))
      .select("user_id", "n_events")
    graft.streaming.IncrementalStream.runAvailableNow(
      sessions, s"$base/chk", s"$base/out")
    val emitted = spark.read.parquet(s"$base/out")
      .select("user_id").as[Long].collect().toSet
    // inclusive eviction: the tied session IS emitted; user 2's session
    // (window end past the watermark) stays open and is withheld
    assert(emitted == Set(1L),
      s"eviction inclusivity changed — update q_stream_session's oracle bound: $emitted")
  }

  test("outer-join null emission: millisecond state watermark, tie and 1µs-below withheld") {
    // The asymmetric twin of the session test above: session eviction is
    // INCLUSIVE at windowEnd == watermark, but a stream-stream outer
    // join's unmatched NULL only emits once its window end sits at least
    // 1 MILLISECOND below the global watermark (join state watermarks are
    // ms-granular). Ladder: click 10 ends exactly AT the watermark
    // (withheld), click 12 ends 1 µs below (withheld — sub-ms), click 13
    // ends 1 ms below (EMITTED). q_stream_outer_join's oracle bound is
    // `window_end <= wm - 1ms` because of this test; a Spark upgrade
    // changing the granularity or inclusivity turns this red first.
    // Click 11 matches its same-timestamp purchase (emitted as matched;
    // also pins the left-side watermark at the stream tail).
    import spark.implicits._
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("graft-oje").toString
    val t0 = 86400L * 1000000 // µs; clear of the init watermark
    val win = 30L * 60 * 1000000
    val delay = 3600L * 1000000
    // both side watermarks end at (t0 + win + delay) - delay = t0 + win
    Seq(("click", 1L, 10L, t0),
        ("click", 3L, 12L, t0 - 1),
        ("click", 4L, 13L, t0 - 1000),
        ("purchase", 2L, 20L, t0 + win + delay),
        ("click", 2L, 11L, t0 + win + delay))
      .toDF("event_type", "user_id", "event_id", "tsu")
      .withColumn("ts", timestamp_micros(col("tsu"))).drop("tsu")
      .coalesce(1).write.parquet(s"$base/in")
    val schema = StructType(Seq(StructField("event_type", StringType),
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", TimestampType)))
    def side(tpe: String, idAs: String, tsAs: String) =
      spark.readStream.schema(schema).parquet(s"$base/in")
        .filter(col("event_type") === tpe)
        .select(col("user_id"), col("event_id").as(idAs), col("ts").as(tsAs))
        .withWatermark(tsAs, "1 hour")
    val joined = side("click", "click_id", "click_ts")
      .join(side("purchase", "purchase_id", "purchase_ts")
          .withColumnRenamed("user_id", "p_user_id"),
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
        "leftOuter")
      .select("user_id", "click_id", "purchase_id")
    graft.streaming.IncrementalStream.runAvailableNow(
      joined, s"$base/chk", s"$base/out")
    val rows = spark.read.parquet(s"$base/out")
      .collect().map(r => (r.getLong(1), r.isNullAt(2))).toMap
    // 1 ms below the watermark: NULL row emitted
    assert(rows.get(13L) == Some(true), s"1ms-below click not emitted: $rows")
    // exact tie and 1 µs below: withheld (ms-granular state watermark);
    // if these start emitting, tighten q_stream_outer_join's oracle bound
    assert(!rows.contains(10L), s"tied click emitted: $rows")
    assert(!rows.contains(12L), s"1µs-below click emitted: $rows")
    // same-timestamp match emits a matched row
    assert(rows.get(11L) == Some(false), s"tail matched click missing: $rows")
  }

  test("session stats are sane") {
    val got = Sessionize.sessionizeBatch(spark, sf, 30L * 60 * 1000000)
    val rows = got.collect()
    assert(rows.forall(r => r.session_end >= r.session_start))
    assert(rows.forall(_.n_events > 0))
  }
}

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

  test("session stats are sane") {
    val got = Sessionize.sessionizeBatch(spark, sf, 30L * 60 * 1000000)
    val rows = got.collect()
    assert(rows.forall(r => r.session_end >= r.session_start))
    assert(rows.forall(_.n_events > 0))
  }
}

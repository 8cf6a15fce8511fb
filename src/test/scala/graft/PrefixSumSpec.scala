package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.PrefixSum

class PrefixSumSpec extends SparkSpec {

  test("runningTotal equals the global-window reference across many partitions") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), (col("event_id") % 7).cast("long").as("v"))
    val got = PrefixSum.runningTotal(ev, Seq(col("event_id")), col("v"), "run")
    val exp = ev.withColumn("run", sum(col("v")).over(
      Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)))
    assert(got.count() == exp.count())
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("runningTotal is exact on a tiny frame spanning empty partitions") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    val got = PrefixSum.runningTotal(df, Seq(col("id")), col("v"), "run")
      .orderBy("id").select("run").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L, 30L, 60L), got.toString)
  }
}

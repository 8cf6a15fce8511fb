package graft

import org.apache.spark.sql.functions._

/** Error-bound evidence for the approximate-aggregate gates: the gated
  * queries assert |approx − exact| within a bound; this spec measures the
  * OBSERVED error on the fixture so the bound's margin is documented, and
  * re-runs the sketch to show the result is deterministic (what makes the
  * gated boolean reproducible at all).
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct at rsd 2% lands well inside the 5% gate bound") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val r = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx"))
      .collect()
    r.foreach { row =>
      val exact = row.getLong(1).toDouble
      val err = math.abs(row.getLong(2) - exact) / exact
      assert(err <= 0.025, s"${row.getString(0)}: observed rel err $err")
    }
  }

  test("approx sketches are deterministic across runs (gate reproducibility)") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    def once() = ev.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("acd"),
        expr("approx_percentile(value, 0.5, 10000)").as("ap"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(once() == once())
  }

  test("approx_percentile rank error stays inside the 5%+1.0 gate bound") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val r = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.95)").as("exact"),
        expr("approx_percentile(value, 0.95, 10000)").as("approx"))
      .collect()
    r.foreach { row =>
      val exact = row.getDouble(1)
      val diff = math.abs(row.getDouble(2) - exact)
      assert(diff <= 0.05 * math.abs(exact) + 1.0,
        s"${row.getString(0)}: |approx-exact|=$diff exact=$exact")
    }
  }
}

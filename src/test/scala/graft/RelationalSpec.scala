package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import graft.ops.Relational

  test("every registered query runs and every oracle key exists") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("q1_agg groups are complete and counts add up") {
    val rows = q("q1_agg").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total == expected)
  }

  test("union_tenants covers all orders exactly once") {
    val n = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(q("q_union_tenants").count() == n)
    assert(q("q_union_tenants").select("source").distinct().count() == 2)
  }

  test("historyDelta + semi-join partition the source") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val hist = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"))
    val delta = Relational.historyDelta(
      o.select(col("o_orderkey"), col("o_orderstatus")), hist,
      Seq("o_orderkey", "o_orderstatus"))
    assert(delta.count() + hist.count() == o.count())
  }

  test("deleteInsert is idempotent") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val batch = o.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val once = Relational.deleteInsert(o, batch, Seq("o_orderkey"))
    val twice = Relational.deleteInsert(once, batch, Seq("o_orderkey"))
    assert(once.count() == o.count())
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("latestPerKey yields one row per key") {
    val e = spark.read.parquet(s"$sf/events.parquet")
    val latest = Relational.latestPerKey(e, Seq("user_id"),
      Seq(col("ts").desc, col("event_id").desc))
    assert(latest.count() == e.select("user_id").distinct().count())
  }

  test("carve returns the requested window") {
    val page = q("q_carve").collect()
    // sf0.001 has 1500 orders → offset 3000 is past the end
    assert(page.length == 0)
    val p2 = Relational.carve(
      spark.read.parquet(s"$sf/orders.parquet"), Seq("o_orderkey"), 10, 5)
      .collect()
    assert(p2.length == 5)
    val all = spark.read.parquet(s"$sf/orders.parquet")
      .orderBy("o_orderkey").limit(15).collect().drop(10)
    assert(p2.map(_.getAs[Long]("o_orderkey")).toSeq ==
      all.map(_.getAs[Long]("o_orderkey")).toSeq)
  }

  test("alignSchema pads missing columns with typed nulls") {
    val o = spark.read.parquet(s"$sf/orders.parquet").select("o_orderkey")
    val aligned = Relational.alignSchema(o,
      Seq("o_orderkey" -> "bigint", "missing_col" -> "double"))
    assert(aligned.columns.toSeq == Seq("o_orderkey", "missing_col"))
    assert(aligned.filter(col("missing_col").isNotNull).count() == 0)
  }
}

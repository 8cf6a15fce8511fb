package graft

import org.apache.spark.sql.functions._

class NestedSpec extends SparkSpec {
  import graft.ops.Nested

  test("nest ∘ explode is the multiset identity on lineitem") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
    val round = q("q_explode_items")
    assert(round.count() == li.count())
    assert(round.exceptAll(li).isEmpty && li.exceptAll(round).isEmpty)
  }

  test("explode_outer keeps empty parents, explode drops them") {
    import spark.implicits._
    val df = Seq((1L, Seq(("a", 1.0)), "p"), (2L, Seq.empty[(String, Double)], "q"))
      .toDF("id", "items_raw", "tag")
      .withColumn("items", expr("transform(items_raw, x -> struct(x._1 as name, x._2 as v))"))
    val inner = Nested.explodeChild(df, Seq("id", "tag"), "items")
    val outer = Nested.explodeChild(df, Seq("id", "tag"), "items", outer = true)
    assert(inner.count() == 1)
    assert(outer.count() == 2)
    assert(outer.filter(col("id") === 2 && col("name").isNull).count() == 1)
  }

  test("firstElement is null-safe on empty arrays") {
    import spark.implicits._
    val df = Seq(Seq(5, 3), Seq.empty[Int]).toDF("a")
    val out = df.select(Nested.firstElement(sort_array(col("a"))).as("f")).collect()
    assert(out(0).getInt(0) == 3)
    assert(out(1).isNullAt(0))
  }

  test("lookup_preserve keeps existing surrogates and mints fresh ones") {
    val rows = q("q_lookup_preserve").collect()
    val (kept, fresh) = rows.partition(_.getAs[Long]("o_orderkey") % 2 == 0)
    assert(kept.nonEmpty && fresh.nonEmpty)
    assert(fresh.forall(_.getAs[java.sql.Date]("created_at").toString == "2026-01-01"))
    assert(kept.forall(_.getAs[java.sql.Date]("created_at").toString != "2026-01-01"))
  }
}

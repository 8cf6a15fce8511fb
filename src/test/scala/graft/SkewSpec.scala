package graft

import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import graft.ops.Skew

  test("saltedAgg equals plain aggregation on skewed data") {
    // lineitem keyed by returnflag is heavily skewed (3 values, 6k rows)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val plain = li.groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("s"), count(lit(1)).as("n"))
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), salts = 8,
      partials = Seq(sum("l_quantity").as("ps"), count(lit(1)).as("pn")),
      combine = Seq(round(sum("ps"), 2).as("s"), sum("pn").as("n")))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin equals plain join, including unmatched keys") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"), "inner")
    val salted = Skew.saltedJoin(li, o, Seq("l_orderkey"), salts = 4)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // left join keeps unmatched large-side rows exactly once
    val plainLeft = li.join(o, Seq("l_orderkey"), "left")
    val saltedLeft = Skew.saltedJoin(li, o, Seq("l_orderkey"), 4, "left")
    assert(saltedLeft.count() == plainLeft.count())
  }
}

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

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the executed plan)") {
    // Spark's own skew mitigation: AQE detects an oversized shuffle
    // partition AFTER the map stage and splits it across tasks, rewriting
    // the SMJ with skew=true. Thresholds are production-sized (256 MB), so
    // the fixture lowers them to make a ~MB-scale skew observable. This is
    // the FIRST line of defense at 100 TB; manual salting (ops/Skew,
    // asserted equal-results above) remains for the cases AQE cannot
    // touch: skewed AGGREGATIONS (AQE only splits join partitions),
    // broadcast-ineligible skew under stream-static joins, and engines/
    // modes with AQE off.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // one key carries 150k of 200k left rows — a single hot shuffle
      // partition several× the median
      val left = spark.range(200000)
        .select(when(col("id") < 150000, 0L).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val right = spark.range(2000).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val joined = left.join(right.hint("merge"), Seq("k"))
      // collect() (not count()) so THIS plan executes and AQE finalizes it
      // — count() plans a separate query and leaves joined un-executed.
      // Only k=0 matches: 150000 hot-key rows × one right row.
      assert(joined.collect().length == 150000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"AQE did not mark the skewed join:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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

  test("adaptiveSaltedJoin equals plain join across hot, cold and unmatched keys") {
    import spark.implicits._
    // one hot key (80% of rows), a cold tail, and keys missing from the
    // small side — with a threshold that makes exactly the hot key salted
    val large = spark.range(100000)
      .select(when(col("id") < 80000, 7L).otherwise(col("id") % 500).as("k"),
        col("id").as("v"))
    val small = spark.range(300).select(col("id").as("k"),
      (col("id") * 10).as("w"))
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = large.join(small, Seq("k"), jt)
      val ad = Skew.adaptiveSaltedJoin(large, small, Seq("k"), salts = 8,
        joinType = jt, sampleFraction = 0.05, hotKeyMinRows = 10000L)
      assert(ad.exceptAll(plain).isEmpty && plain.exceptAll(ad).isEmpty, jt)
    }
  }

  test("adaptiveSaltedJoin with a 3-column composite key at the maxHotKeys cap") {
    import spark.implicits._
    // many distinct hot composite keys so the profile saturates maxHotKeys:
    // the hot flag must come from the broadcast hot-key join (an OR of
    // 50·3 literal conjunctions would be the codegen blowup the r15
    // verdict flagged at the 1000-key cap) and results must still equal
    // the plain join — including composite keys absent from the small side
    val large = spark.range(120000)
      .select((col("id") % 100).as("k1"), (col("id") % 10).as("k2"),
        lit("t").as("k3"), col("id").as("v"))
    val small = spark.range(600)
      .select((col("id") % 120).as("k1"), (col("id") % 10).as("k2"),
        lit("t").as("k3"), (col("id") * 3).as("w"))
    for (jt <- Seq("inner", "left", "left_anti")) {
      val plain = large.join(small, Seq("k1", "k2", "k3"), jt)
      val ad = Skew.adaptiveSaltedJoin(large, small, Seq("k1", "k2", "k3"),
        salts = 4, joinType = jt, sampleFraction = 0.5,
        hotKeyMinRows = 100L, maxHotKeys = 50)
      assert(ad.exceptAll(plain).isEmpty && plain.exceptAll(ad).isEmpty, jt)
    }
  }

  test("salted operators reject salts < 1 instead of silently dropping rows") {
    import spark.implicits._
    val df = spark.range(10).select(col("id").as("k"), col("id").as("v"))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, Seq("k"), salts = 0)
    }
    intercept[IllegalArgumentException] {
      Skew.adaptiveSaltedJoin(df, df, Seq("k"), salts = 0)
    }
    intercept[IllegalArgumentException] {
      Skew.saltedAgg(df, Seq("k"), salts = 0,
        partials = Seq(sum("v").as("s")), combine = Seq(sum("s").as("s")))
    }
  }

  test("adaptiveSaltedJoin on uniform data leaves the small side unreplicated") {
    import spark.implicits._
    // no key reaches the threshold → every row rides the salt=0 path; the
    // joined cardinality must equal the plain join's (nothing replicated,
    // nothing dropped), and the profile finds zero hot keys
    val large = spark.range(50000).select((col("id") % 1000).as("k"),
      col("id").as("v"))
    val small = spark.range(1000).select(col("id").as("k"),
      (col("id") * 2).as("w"))
    val plain = large.join(small, Seq("k"))
    val ad = Skew.adaptiveSaltedJoin(large, small, Seq("k"), salts = 8,
      sampleFraction = 0.1, hotKeyMinRows = 5000L)
    assert(ad.count() == plain.count())
    assert(ad.exceptAll(plain).isEmpty && plain.exceptAll(ad).isEmpty)
  }
}

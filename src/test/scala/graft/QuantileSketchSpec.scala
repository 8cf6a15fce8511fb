package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.QuantileSketch

/** Property specs for the mergeable quantile sketch: exact mergeability
  * (the property that makes it a SKETCH — partial sketches combine into
  * the whole-data sketch), associativity/commutativity of merge, the
  * ≤1/32 relative error bound, and the midpoint monotonicity the
  * estimator's min(rep2x) relies on.
  */
class QuantileSketchSpec extends SparkSpec {

  private def ev = Tables.t(spark, sf, "events")
    .select(col("event_type").as("source"),
      round(col("value") * 100, 0).cast("long").as("c"))

  private def same(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("sketch of the union equals the merge of partial sketches") {
    val parts = (0 to 2).map(m => ev.filter(col("c") % 3 === m))
    val whole = QuantileSketch.build(ev)
    val merged = QuantileSketch.merge(parts.map(QuantileSketch.build): _*)
    assert(same(whole, merged), "merge(partials) != build(whole)")
  }

  test("merge is associative and commutative") {
    val Seq(a, b, c) = (0 to 2).map(m =>
      QuantileSketch.build(ev.filter(col("c") % 3 === m)).localCheckpoint())
    val leftAssoc = QuantileSketch.merge(QuantileSketch.merge(a, b), c)
    val rightAssoc = QuantileSketch.merge(a, QuantileSketch.merge(b, c))
    val reversed = QuantileSketch.merge(c, b, a)
    assert(same(leftAssoc, rightAssoc), "merge not associative")
    assert(same(leftAssoc, reversed), "merge not commutative")
  }

  test("estimates stay within the 1/32 relative error bound of exact") {
    val sk = QuantileSketch.build(ev)
    val pcts = Seq((50, 1, 2), (90, 9, 10), (99, 99, 100), (25, 1, 4),
      (75, 3, 4), (999, 999, 1000))
    val est = QuantileSketch.estimate(sk, pcts).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // exact via per-source sorted cents on the driver (fixture-sized)
    val bySource = ev.collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for {
      (src, vals) <- bySource
      (pct, num, den) <- pcts
    } {
      val r = ((vals.length.toLong * num + den - 1) / den).toInt
      val exact = vals(r - 1).toDouble
      val e = est((src, pct))
      val bound = if (exact < 32) 0.5 else exact / 32.0 + 1e-9
      assert(math.abs(e - exact) <= bound,
        s"$src p$pct: est $e vs exact $exact exceeds bound $bound")
    }
  }

  test("bucket midpoints are strictly monotone in bucket index") {
    // the estimator takes min(rep2x) of qualifying buckets as "first
    // bucket's midpoint" — valid only if rep2x orders like ix
    val domain = spark.range(1, 200000)
      .select(lit("d").as("source"), col("id").as("c"))
    val sk = QuantileSketch.build(domain)
    val rows = sk.select("ix", "rep2x").distinct()
      .orderBy("ix").collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.sliding(2).forall {
      case Array((i1, m1), (i2, m2)) => i1 < i2 && m1 < m2
      case _ => true
    }, "rep2x not strictly increasing with ix")
    // and the bucket count is the fixed footprint, not the value count
    assert(rows.length < 400, s"footprint ${rows.length} not fixed-size")
  }
}

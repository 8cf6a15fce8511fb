package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch — the distribution-shaped sibling of the KMV
  * set sketch (queries/SketchQueries.scala): fixed-footprint per-source
  * percentile summaries that MERGE exactly (integer bucket-count sums),
  * for "did this feed's value distribution drift" questions at corpus
  * scale.
  *
  * Family choice: an HdrHistogram-style LOG-BUCKETED histogram, not a
  * randomized KLL/t-digest. Deterministic bucketing is what buys
  *   (a) exact mergeability — merge = groupBy(bucket).sum(cnt), which is
  *       associative and commutative by construction (property-spec'd),
  *   (b) bit-identical replay by the DuckDB oracle (a sampled sketch
  *       can't be cross-engine-gated), and
  *   (c) a provable error bound: 16 sub-buckets per octave → any
  *       estimate is within 1/32 relative error of the true quantile
  *       (exact below 32, where buckets are unit-width).
  * The memory footprint is ≤ 32 + 16·59 buckets per source — fixed, like
  * KMV's k, regardless of corpus size.
  *
  * Input convention: a DataFrame with `source` (string) and `c` (BIGINT
  * ≥ 0 — integer cents/counts; the money-safe domain every gated oracle
  * uses). All bucket arithmetic is integer and shared with the oracle
  * via the *Sql strings.
  */
object QuantileSketch {

  /** Bucket index of `c`: exact unit buckets below 32; above, 16 equal
    * sub-ranges per octave [2^e, 2^(e+1)). `length(bin(c))-1` is an
    * exact floor(log2) — no float boundary risk at powers of two.
    */
  val ixSql: String =
    "CASE WHEN c < 32 THEN c ELSE 32 + (length(bin(c))-6)*16 " +
      "+ ((c >> (length(bin(c))-5)) & 15) END"

  /** TWICE the bucket midpoint (kept integer: 2·lo + width), so the only
    * float in an estimate is one final ÷2.
    */
  val rep2xSql: String =
    "CASE WHEN c < 32 THEN 2*c ELSE " +
      "((16 + ((c >> (length(bin(c))-5)) & 15))*2 + 1) " +
      "<< (length(bin(c))-5) END"

  /** Spark-side twins (shiftright/shiftleft: Spark has no >>/<< operator
    * in all dialects; semantics identical for non-negative values).
    */
  private val ixSpark =
    "CASE WHEN c < 32 THEN c ELSE 32 + (length(bin(c))-6)*16 " +
      "+ (shiftright(c, length(bin(c))-5) & 15) END"
  private val rep2xSpark =
    "CASE WHEN c < 32 THEN 2*c ELSE " +
      "shiftleft((16 + (shiftright(c, length(bin(c))-5) & 15))*2 + 1, " +
      "length(bin(c))-5) END"

  /** Build the sketch: (source, ix, rep2x, cnt). One corpus-sized
    * aggregate — the same scale shape as any groupBy count; everything
    * downstream is bucket-dimension sized.
    */
  def build(df: DataFrame): DataFrame = df
    .withColumn("ix", expr(ixSpark))
    .withColumn("rep2x", expr(rep2xSpark))
    .groupBy("source", "ix", "rep2x")
    .agg(count(lit(1)).as("cnt"))

  /** Merge any number of sketches — bucket-count sums. Associative and
    * commutative because longs under + are; re-labels nothing.
    */
  def merge(sketches: DataFrame*): DataFrame = sketches
    .reduce(_ unionByName _)
    .groupBy("source", "ix", "rep2x")
    .agg(sum("cnt").as("cnt"))

  /** Percentile estimates from a sketch, one row per (source, pct):
    * rank r = ceil(n·num/den) in INTEGER arithmetic, then the first
    * bucket whose cumulative count reaches r; estimate = its midpoint.
    * The cumulative window is per-source over ≤ ~1000 bucket rows —
    * never corpus-sized.
    */
  def estimate(sketch: DataFrame,
      pcts: Seq[(Int, Int, Int)]): DataFrame = {
    val s = sketch.sparkSession
    import org.apache.spark.sql.expressions.Window
    val qs = s.createDataFrame(pcts).toDF("pct", "num", "den")
    val n = sketch.groupBy("source").agg(sum("cnt").as("n"))
    val tgt = n.crossJoin(broadcast(qs))
      .withColumn("r", expr("(n * num + den - 1) div den"))
      .select("source", "pct", "r")
    val cum = sketch.withColumn("cum",
      sum("cnt").over(Window.partitionBy("source").orderBy("ix")))
    cum.join(tgt, Seq("source"))
      .filter(col("cum") >= col("r"))
      .groupBy("source", "pct")
      .agg((min("rep2x") / 2.0).as("est"))
  }
}

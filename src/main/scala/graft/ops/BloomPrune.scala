package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expressions.BloomMightContain

/** Bloom-pruned semi-join: filter a huge probe side down to probable
  * matches BEFORE it shuffles, then confirm with an exact left-semi join.
  *
  * The build side's distinct keys feed a distributed Bloom-filter
  * aggregation (`df.stat.bloomFilter` — a treeAggregate, no key collect);
  * the probe side then evaluates `graft_bloom_contains` inside its scan
  * stage, so rows that cannot match never reach the exchange. At 100 TB
  * this is the difference between shuffling the full fact table and
  * shuffling `selectivity + fpp` of it; the trailing exact semi-join
  * removes the false positives, so the RESULT is identical to a plain
  * semi-join — the filter only moves bytes, never answers.
  */
object BloomPrune {

  /** Rows of `big` whose `bigKey` appears in `small.smallKey` (exact
    * semantics; bloom is a prune). Keys must be integral (hashed as
    * longs). `fpp` trades filter size for prune precision.
    */
  def semiJoin(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String, fpp: Double = 0.01): DataFrame = {
    val spark = big.sparkSession
    val keys = small.select(col(smallKey).cast("long").as(smallKey))
      .na.drop().distinct()
    val expected = math.max(keys.count(), 1L)
    val bf = keys.stat.bloomFilter(smallKey, expected, fpp)
    big.filter(BloomMightContain.mightContain(
        spark, col(bigKey).cast("long"), bf))
      .join(keys.withColumnRenamed(smallKey, "__bloom_k"),
        col(bigKey).cast("long") === col("__bloom_k"), "left_semi")
  }
}

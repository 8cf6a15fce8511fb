package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys. AQE's skew-join handling covers sort-merge
  * joins automatically; these utilities cover the cases it doesn't — skewed
  * aggregations and broadcast-side replication joins — using the classic
  * salting construction. Both are semantics-preserving rewrites.
  */
object Skew {

  /** Two-phase salted aggregation: a hot grouping key is split across
    * `salts` sub-groups (phase 1 partial aggregation on (key, salt)), then
    * the partials combine per key (phase 2). Use for algebraic aggregates
    * (sum/count/min/max) when one key dominates the shuffle.
    *
    * `partials`: per-subgroup aggregate columns (e.g. sum(x) as "s").
    * `combine`: how to merge the named partials per key (e.g. sum("s")).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      partials: Seq[Column],
      combine: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }

  /** Salted equi-join: the large (skewed) side gets a random salt in
    * [0, salts), the small side is replicated `salts` times so every
    * (key, salt) combination finds its match. Join cardinality is
    * unchanged; the hot key's rows spread across `salts` tasks. Use when
    * the small side is too big to broadcast but a few keys dominate.
    *
    * Valid for inner/left/left_semi/left_anti (the large side carries one
    * salt per row). right/full would multiply unmatched small-side rows by
    * `salts` — not supported.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedLarge
      .join(replicatedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}

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
    require(salts >= 1, s"salts must be >= 1, got $salts")
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
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val saltedLarge = large.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedLarge
      .join(replicatedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** PROFILE-DRIVEN salted equi-join — the r14 SkewProbe playbook encoded
    * as an operator. Blanket salting ([[saltedJoin]]) is skew-INVARIANT
    * but costs ~1.5× on uniform data (measured, COVERAGE §r14): the small
    * side is replicated ×`salts` for EVERY key whether or not it is hot.
    * This variant first profiles the large side with a cheap sampled scan
    * (`sampleFraction`, default 1 %), salts ONLY the keys whose estimated
    * row count exceeds `hotKeyMinRows`, and leaves the rest of the data on
    * the plain (salt = 0) path — so on a uniform input it degenerates to
    * the plain shuffle join plus one sampled aggregation, and under skew
    * the hot keys' rows spread across `salts` tasks exactly as in
    * [[saltedJoin]].
    *
    * Fully declarative — the hot-key set stays a (≤ `maxHotKeys`-row)
    * DataFrame broadcast to both sides, never collected to the driver.
    * The sampled profile is seeded, so the plan is deterministic; sampling
    * noise can only mis-route a borderline key to the wrong PATH (a
    * performance effect), never change the join result.
    *
    * Same join-type domain as [[saltedJoin]]: inner/left/left_semi/
    * left_anti (the large side carries exactly one salt per row, so
    * salting multiplies nothing on its side; right/full would multiply
    * unmatched small-side rows).
    */
  def adaptiveSaltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner",
      sampleFraction: Double = 0.01,
      hotKeyMinRows: Long = 1000000L,
      maxHotKeys: Int = 1000,
      seed: Long = 42L): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(Seq("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType), s"unsupported joinType $joinType")
    val minSampled = math.max(1L,
      math.ceil(hotKeyMinRows * sampleFraction).toLong)
    // NULL keys never equi-join, so they can't be usefully hot
    val hotRows = large
      .select(keys.map(col): _*)
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .sample(withReplacement = false, sampleFraction, seed)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__hc"))
      .filter(col("__hc") >= minSampled)
      .orderBy(col("__hc").desc)
      .limit(maxHotKeys)
      .select(keys.map(col): _*)
      .collect() // k-bounded (≤ maxHotKeys) driver state, like PrefixSum's
                 // per-partition offsets or IVF's centroids
    if (hotRows.isEmpty)
      // uniform data: the plan IS the plain join — the profile is the
      // only cost, and no replication/salting overhead is paid
      return large.join(small, keys, joinType)
    // how each side learns whether its row's key is hot:
    //  * single key — an InSet projection; no extra join pass over either
    //    side, and the membership test is pure codegen
    //  * composite key — a literal OR-of-conjunctions would generate a
    //    boolean tree of up to maxHotKeys·|keys| codegen terms evaluated
    //    on EVERY row of both sides (at the 1000-key cap that's a 3000-node
    //    expression for a 3-column key); instead the hot set stays a
    //    ≤ maxHotKeys-row broadcast table and each side derives a __hotf
    //    flag via one BroadcastHashJoin — O(1) per row regardless of cap
    val tagHot: DataFrame => (DataFrame, Column) =
      if (keys.size == 1) {
        val isHot = col(keys.head)
          .isin(hotRows.map(_.get(0)).toIndexedSeq: _*)
        df => (df, isHot)
      } else {
        val spark = large.sparkSession
        val keyFields = large.select(keys.map(col): _*).schema.fields
        val hotSchema = org.apache.spark.sql.types.StructType(
          keyFields.zipWithIndex.map { case (f, i) =>
            f.copy(name = s"__hk$i", nullable = false) })
        val hotDf = broadcast(spark.createDataFrame(
          java.util.Arrays.asList(hotRows: _*), hotSchema)
          .withColumn("__hotf", lit(true)))
        // hot keys are non-null (profiled post-isNotNull) and unique
        // (groupBy output), so plain equality never multiplies rows
        val cond = keys.zipWithIndex.map { case (k, i) =>
          col(k) === col(s"__hk$i") }.reduce(_ && _)
        df => (df.join(hotDf, cond, "left")
          .drop(keys.indices.map(i => s"__hk$i"): _*),
          coalesce(col("__hotf"), lit(false)))
      }
    val (largeTagged, largeHot) = tagHot(large)
    val saltedLarge = largeTagged.withColumn("__salt",
      when(largeHot,
        pmod(spark_partition_id() + monotonically_increasing_id(),
          lit(salts)))
        .otherwise(lit(0)).cast("int"))
      .drop("__hotf")
    val (smallTagged, smallHot) = tagHot(small)
    val replicatedSmall = smallTagged
      .withColumn("__ns", when(smallHot, lit(salts - 1)).otherwise(lit(0)))
      .withColumn("__salt", explode(sequence(lit(0), col("__ns"))))
      .withColumn("__salt", col("__salt").cast("int"))
      .drop("__ns", "__hotf")
    saltedLarge
      .join(replicatedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.Hashing

/** Deterministic sampling / split assignment for training-data pipelines.
  * Hash-based, not `rand()`-based: the same row lands in the same split on
  * every run, on any cluster, at any partitioning — the property that makes
  * train/val/test assignment reproducible and joins between split manifests
  * and the corpus stable. Row-local (zero shuffle).
  */
object Sampling {

  /** 0..99 bucket from the sha256-derived 60-bit key hash. sha60 (not
    * xxhash64) so external engines can reproduce the assignment — split
    * manifests outlive any one engine.
    */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    (Hashing.sha60(key.cast("string")) % buckets).cast("int")

  /** Assign each row to a named split by cumulative bucket cut-points:
    * e.g. `Seq("train" -> 80, "val" -> 90, "test" -> 100)` ⇒ 80/10/10.
    * Cut-points are upper bounds over [[hashBucket]] (exclusive).
    */
  def hashSplit(df: DataFrame, keyCol: String,
      cuts: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 90, "test" -> 100),
      buckets: Int = 100): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == buckets,
      s"last cut must equal bucket count $buckets")
    val b = hashBucket(col(keyCol), buckets)
    val split = cuts.init.foldRight(lit(cuts.last._1): Column) {
      case ((name, upper), rest) => when(b < upper, name).otherwise(rest)
    }
    df.withColumn("bucket", b).withColumn("split", split)
  }

  /** Keep a deterministic `rate` fraction (per stratum if `strataCols` is
    * non-empty — the hash is over key + stratum so strata sample
    * independently). `rate` is in bucket units: rate=0.1 keeps buckets 0-9.
    */
  def sampleHash(df: DataFrame, keyCol: String, rate: Double,
      strataCols: Seq[String] = Nil, buckets: Int = 100): DataFrame = {
    val key = concat_ws("\u0000",
      (keyCol +: strataCols).map(c => col(c).cast("string")): _*)
    df.filter(hashBucket(key, buckets) < (rate * buckets).toInt)
  }

  /** Class-rebalancing downsample: keep a different deterministic
    * percentage per class (the "too many web pages, keep all books"
    * training-mix lever). Same hash-bucket mechanism as [[sampleHash]],
    * so membership is reproducible on any engine; row-local, zero
    * shuffle, no count pass.
    */
  def stratifiedHash(df: DataFrame, keyCol: String, classCol: String,
      pctByClass: Seq[(String, Int)], defaultPct: Int = 100): DataFrame = {
    val pct = pctByClass.foldRight(lit(defaultPct): Column) {
      case ((cls, p), rest) => when(col(classCol) === cls, lit(p)).otherwise(rest)
    }
    df.filter(hashBucket(col(keyCol)) < pct)
  }

  /** Deterministic FIXED-SIZE uniform sample: the k rows with the smallest
    * sha-derived priorities. `sampleHash` keeps a fixed RATE; this keeps a
    * fixed COUNT — the "exactly 10k eval docs" contract. Spark executes
    * orderBy+limit as TakeOrderedAndProject: a k-element heap per
    * partition, then a k·P-row merge — never a global sort shuffle, so
    * the plan holds at any corpus size. Ties impossible (priority is a
    * 60-bit hash; the key column breaks the residual 2⁻⁶⁰).
    *
    * The output EXPOSES the `priority` column (callers gate and re-sort
    * on it); a pre-existing column of that name would be silently
    * overwritten, so it is rejected loudly instead.
    */
  def prioritySample(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(!df.columns.contains("priority"),
      "input already has a 'priority' column - rename it before prioritySample")
    df.withColumn("priority", Hashing.sha60(col(keyCol)))
      .orderBy(col("priority"), col(keyCol))
      .limit(k)
  }

  /** Efraimidis–Spirakis fixed-size weighted sample without replacement,
    * in the exponential-race form: each row draws the deterministic
    * uniform u ∈ (0,1] from its key hash and races with variate
    * e = −ln(u)/w; the k smallest win. Inclusion probability is
    * proportional-to-weight without replacement — the mixture-sampling
    * primitive when the quota is a COUNT, not a rate. Same
    * TakeOrderedAndProject plan as [[prioritySample]].
    *
    * u is quantized to 10⁻⁶ (sha60 mod 10⁶, +1 to stay positive): with
    * probability 10⁻⁶ a row draws u = 1 exactly and races with e = 0
    * regardless of weight — acceptable for corpus sampling; narrow the
    * quantization if not.
    *
    * Rows with weight ≤ 0 (or NULL) are EXCLUDED before the race: a
    * zero/negative weight would draw a −Inf/negative variate and
    * deterministically win the sample, which is never the intent.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(!df.columns.contains("__es"),
      "input already has a '__es' column - rename it before weightedSample")
    val u = (Hashing.sha60(col(keyCol)) % 1000000 + 1).cast("double") / 1000000.0
    df.filter(col(weightCol).cast("double") > 0.0)
      .withColumn("__es", -log(u) / col(weightCol).cast("double"))
      .orderBy(col("__es"), col(keyCol))
      .limit(k)
      .drop("__es")
  }
}

package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine is the correctness baseline; the
  * random-hyperplane LSH variant is the scale path — queries only compare
  * against their bucket instead of the full corpus.
  */
object Knn {

  /** Dot product of two double arrays, sequential fold (deterministic
    * evaluation order → reproducible floats).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Exact top-k by cosine: broadcast the (small) query side against the
    * corpus, rank per query. Ties broken by corpus id — deterministic.
    * Corpus-side scan stays embarrassingly parallel; the only shuffle is
    * the per-query top-k window.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank"), round(col("cos"), 4).as("cos"))
  }

  /** Deterministic random hyperplanes (fixed-seed PRNG, embedded as
    * literals — no runtime randomness, resumable plans).
    */
  private def planes(numPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id for each vector: bit p = [v · plane_p > 0].
    * Cosine-similar vectors collide with high probability.
    */
  def lshBucket(vecCol: Column, numPlanes: Int, dim: Int, seed: Long = 42L): Column =
    planes(numPlanes, dim, seed).zipWithIndex
      .map { case (p, i) =>
        when(dot(asDouble(vecCol), typedlit(p.toSeq)) > 0, lit(1L << i)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** ANN top-k: bucket-join then rank within bucket. Recall < 1 by design;
    * raise `numPlanes` ↓bucket size / ↑precision, or probe neighboring
    * buckets for higher recall. Shuffle is bounded by bucket co-location
    * instead of the full cross join.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, numPlanes: Int, dim: Int,
      seed: Long = 42L): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"),
      lshBucket(col(vecCol), numPlanes, dim, seed).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"),
      lshBucket(col(vecCol), numPlanes, dim, seed).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold. Brute force here;
    * at scale feed [[lshBucket]] groups instead of the cross join.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("va"))
    val b = df.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}

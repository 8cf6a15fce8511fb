package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.DotProduct

/** Approximate/exact nearest-neighbor search over an embedding column
  * (array<float>). Brute-force cosine is the correctness baseline; the
  * random-hyperplane LSH variant is the scale path — queries only compare
  * against their bucket instead of the full corpus.
  *
  * Norms are precomputed per side BEFORE any join (one traversal per row,
  * not per pair) and the per-pair dot product is the codegen'd
  * [[DotProduct]] expression — the two decisions that keep pairwise scoring
  * join-bound instead of expression-bound.
  */
object Knn {

  /** Interpreted dot (higher-order functions) — fine for per-row use;
    * never use in a pairwise join (see [[DotProduct]]).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** (id, vec as double, norm) projection for one join side. */
  private def side(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String, normAs: String): DataFrame =
    df.select(col(idCol).as(idAs), asDouble(col(vecCol)).as(vecAs))
      .withColumn(normAs, norm(col(vecAs)))

  /** Exact top-k by cosine: broadcast the (small) query side against the
    * corpus, rank per query. Ties broken by corpus id — deterministic.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val spark = queries.sparkSession
    val q = side(queries, idCol, vecCol, "query_id", "qv", "qn")
    val c = side(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        DotProduct.dot(spark, col("qv"), col("cv")) / (col("qn") * col("cn")))
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
    * Cosine-similar vectors collide with high probability. Per-row (not
    * per-pair) work, so the interpreted dot is acceptable here.
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
    val spark = queries.sparkSession
    val q = side(queries, idCol, vecCol, "query_id", "qv", "qn")
      .withColumn("bucket", lshBucket(col("qv"), numPlanes, dim, seed))
    val c = side(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
      .withColumn("bucket", lshBucket(col("cv"), numPlanes, dim, seed))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        DotProduct.dot(spark, col("qv"), col("cv")) / (col("qn") * col("cn")))
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
    val spark = df.sparkSession
    val a = side(df, idCol, vecCol, "id_a", "va", "na_")
    val b = side(df, idCol, vecCol, "id_b", "vb", "nb_")
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        DotProduct.dot(spark, col("va"), col("vb")) / (col("na_") * col("nb_")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }
}

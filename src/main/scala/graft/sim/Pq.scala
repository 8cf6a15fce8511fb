package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.DotProduct

/** Product quantization (PQ) — the compression layer of billion-vector
  * ANN (FAISS's IVF-PQ): each vector splits into M subvectors; each
  * subspace gets its own small codebook (ksub centroids); a vector is
  * stored as M small codes (M bytes at ksub ≤ 256 — a 64-dim float vector
  * compresses 32×). Search is ADC (asymmetric distance computation): the
  * UNCOMPRESSED query dots against each subspace codebook once (an
  * M·ksub lookup table), then every database vector's score is the sum of
  * M table lookups — no decompression, no full-dimension math per pair.
  *
  * Scale shape: codebooks are tiny and broadcast; encoding is one
  * broadcast join + map-side argmin (`min_by`) — the shuffle carries one
  * row per (vector, subspace), never per (vector, subspace, code); ADC
  * reuses the codes table (built once, persisted) against a per-query LUT
  * that is queries × M × ksub rows — independent of corpus size.
  *
  * Determinism contract (what lets the DuckDB oracle replay this): the
  * GATED path uses seed codebooks — subvectors of the ksub lowest-id
  * vectors (`iters = 0`, the [[Ivf]] convention) — so centroid values are
  * exact copies of stored data; distances/scores go through
  * [[DotProduct]]'s sequential fold (= DuckDB's `list_dot_product`), ADC
  * sums fold in subspace order, and every argmin/rank breaks ties on the
  * integer id. Lloyd-TRAINED codebooks (iters > 0, driver-held state like
  * [[Ivf.buildCentroids]]) are spec-checked by quantization-error
  * improvement instead — iterative float averaging is not cross-engine
  * reproducible, and pretending otherwise would gate on luck.
  */
object Pq {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** (subspace, code, cvec) codebooks. iters = 0 → subvectors of the ksub
    * lowest-id vectors. iters > 0 → Lloyd refinement with driver-held
    * state: assignment is a broadcast argmin join, update one aggregation
    * collecting M·ksub rows.
    */
  def codebooks(df: DataFrame, idCol: String, vecCol: String, m: Int,
      subDim: Int, ksub: Int, iters: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val seeds = df.select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v"))
      .orderBy("__id").limit(ksub).collect()
    var state: Seq[(Int, Int, Seq[Double])] = for {
      (r, code) <- seeds.zipWithIndex.toSeq
      s <- 0 until m
    } yield (s, code, r.getSeq[Double](1).slice(s * subDim, (s + 1) * subDim))
    (1 to iters).foreach { _ =>
      val cb = state.toDF("s", "code", "cvec")
      val means = assignCodes(subvectors(df, idCol, vecCol, m, subDim), cb)
        .join(subvectors(df, idCol, vecCol, m, subDim), Seq("__id", "s"))
        .select(col("s"), col("code"), posexplode(col("__sub")).as(Seq("dim", "x")))
        .groupBy("s", "code", "dim").agg(avg(col("x")).as("mu"))
        .groupBy("s", "code")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("mu")))),
          e => e.getField("mu")).as("cvec"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      // codes that lost every member keep their previous centroid
      val got = means.map(x => (x._1, x._2)).toSet
      state = means.toSeq ++ state.filterNot(x => got((x._1, x._2)))
    }
    state.toDF("s", "code", "cvec")
  }

  /** One row per (vector, subspace): (__id, s, __sub). */
  private[sim] def subvectors(df: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame =
    df.select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v"))
      .select(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("__id"), col("s"),
        slice(col("__v"), col("s") * subDim + 1, lit(subDim)).as("__sub"))

  /** Argmin code per (vector, subspace). Distance ordering uses
    * d(x,c) ∝ dot(c,c) − 2·dot(x,c) (the ‖x‖² term is constant per row
    * and cannot change the argmin); ties break on the smaller code.
    * min_by keeps the collapse map-side — the [[Ivf.assign]] argument.
    */
  private def assignCodes(subs: DataFrame, cb: DataFrame): DataFrame = {
    val spark = subs.sparkSession
    subs.join(broadcast(cb), Seq("s"))
      .withColumn("__d",
        DotProduct.dot(spark, col("cvec"), col("cvec")) -
          lit(2.0) * DotProduct.dot(spark, col("__sub"), col("cvec")))
      .groupBy("__id", "s")
      .agg(min_by(col("code"), struct(col("__d"), col("code"))).as("code"))
  }

  /** PQ-encode: (id, subspace, code) — M small integers per vector. */
  def encode(df: DataFrame, idCol: String, vecCol: String, m: Int,
      subDim: Int, cb: DataFrame): DataFrame =
    assignCodes(subvectors(df, idCol, vecCol, m, subDim), cb)
      .select(col("__id").as(idCol), col("s").as("subspace"), col("code"))

  /** ADC top-k: every query (uncompressed) against the encoded corpus.
    * LUT = queries × codebook (dot of query subvector with every
    * centroid); a database vector's score is the LUT sum over its M
    * codes, folded in subspace order (deterministic float). Rank by
    * (score desc, neighbor asc), top k per query.
    */
  def adcTopK(queries: DataFrame, codes: DataFrame, cb: DataFrame,
      idCol: String, vecCol: String, m: Int, subDim: Int,
      k: Int): DataFrame = {
    val spark = queries.sparkSession
    val lut = subvectors(queries, idCol, vecCol, m, subDim)
      .withColumnRenamed("__id", "query_id")
      .join(broadcast(cb), Seq("s"))
      .withColumn("__part", DotProduct.dot(spark, col("__sub"), col("cvec")))
      .select("query_id", "s", "code", "__part")
    val scored = codes
      .select(col(idCol).as("neighbor_id"), col("subspace").as("s"), col("code"))
      .join(lut, Seq("s", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("s"), col("__part")))),
          e => e.getField("__part")),
        lit(0.0), (acc, x) => acc + x).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 4).as("adc_score"))
  }

  /** Mean quantization error (per-row sum of subspace ‖x − c(code)‖²) —
    * the quantity Lloyd training must reduce; spec-checked.
    */
  def quantizationError(df: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int, cb: DataFrame): Double = {
    val spark = df.sparkSession
    subvectors(df, idCol, vecCol, m, subDim)
      .join(assignCodes(subvectors(df, idCol, vecCol, m, subDim), cb)
        .select(col("__id"), col("s"), col("code")), Seq("__id", "s"))
      .join(broadcast(cb), Seq("s", "code"))
      .withColumn("__e",
        DotProduct.dot(spark, col("__sub"), col("__sub")) -
          lit(2.0) * DotProduct.dot(spark, col("__sub"), col("cvec")) +
          DotProduct.dot(spark, col("cvec"), col("cvec")))
      .agg(avg(col("__e"))).collect()(0).getDouble(0)
  }
}

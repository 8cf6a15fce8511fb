package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.DotProduct

/** IVF (inverted-file) approximate nearest neighbor: a coarse quantizer
  * (k-means centroids) partitions the corpus into cells; a query scores
  * only the `nprobe` nearest cells instead of the whole corpus. The
  * centroid set is tiny and broadcast; the corpus is shuffled ONCE by cell
  * id at build time — at 100 TB this is the classic "cluster then search
  * within cluster" layout, with per-cell data co-located.
  *
  * Training is Lloyd's algorithm expressed relationally: assignment is a
  * broadcast argmax join, the update step is an elementwise mean via
  * posexplode + groupBy(cell, dim). Deterministic: seeds are the lowest
  * ids, ties break by centroid id.
  */
object Ivf {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Nearest-centroid assignment: broadcast the K centroids, keep the
    * argmax-dot row per input id (ties by centroid id → deterministic).
    */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__score").desc, col("centroid_id"))
    vecs.crossJoin(broadcast(centroids))
      .withColumn("__score", DotProduct.dot(spark, col("__v"), col("cvec")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__score", "cvec")
  }

  /** Train K centroids with `iters` Lloyd iterations. Input vectors are
    * assumed L2-comparable (the fixture embeddings are unit vectors, so
    * max-dot == max-cosine).
    */
  def buildCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2): DataFrame = {
    val vecs = df.select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v"))
    val w = Window.orderBy(col("__id"))
    var centroids = vecs
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select((col("__rn") - 1).as("centroid_id"), col("__v").as("cvec"))
    (1 to iters).foreach { _ =>
      val assigned = assign(vecs, centroids)
      centroids = assigned
        .select(col("centroid_id"), posexplode(col("__v")).as(Seq("dim", "x")))
        .groupBy("centroid_id", "dim")
        .agg(avg(col("x")).as("m"))
        .groupBy("centroid_id")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s.getField("m")).as("cvec"))
    }
    centroids
  }

  /** Index the corpus: one shuffle by cell id. */
  def index(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    assign(
      corpus.select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v")),
      centroids)
      .select(col("__id").as("neighbor_id"), col("__v").as("cv"),
        col("centroid_id"))
      .repartition(col("centroid_id"))

  /** Search: route each query to its `nprobe` nearest cells, score only
    * those cells' vectors, return top-k per query (ties by neighbor id).
    */
  def search(queries: DataFrame, indexed: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__cs").desc, col("centroid_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__cs", DotProduct.dot(spark, col("qv"), col("cvec")))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(indexed, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        DotProduct.dot(spark, col("qv"), col("cv"))
          / (sqrt(DotProduct.dot(spark, col("qv"), col("qv")))
            * sqrt(DotProduct.dot(spark, col("cv"), col("cv")))))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /** Convenience end-to-end: train, index, search. */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, numCells: Int, nprobe: Int,
      iters: Int = 2): DataFrame = {
    val centroids = buildCentroids(corpus, idCol, vecCol, numCells, iters)
    search(queries, index(corpus, idCol, vecCol, centroids), centroids,
      idCol, vecCol, k, nprobe)
  }
}

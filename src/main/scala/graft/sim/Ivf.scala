package graft.sim

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.DotProduct
import graft.tables.Warehouse

/** IVF (inverted-file) approximate nearest neighbor: a coarse quantizer
  * (k-means centroids) partitions the corpus into cells; a query scores
  * only the `nprobe` nearest cells instead of the whole corpus. The
  * centroid set is tiny and broadcast; the corpus is shuffled ONCE by cell
  * id at build time — at 100 TB this is the classic "cluster then search
  * within cluster" layout, with per-cell data co-located.
  *
  * Training is Lloyd's algorithm with the centroid state held on the
  * driver between iterations (k·dim doubles — the same structure Spark
  * MLlib's KMeans uses): each assignment is a broadcast argmax join over
  * the corpus, each update is one distributed aggregation collecting k
  * rows. Keeping the k centroids driver-side resets the lineage every
  * iteration (no re-running prior Lloyd rounds per action) and avoids the
  * global-window seeding that previously funneled the whole corpus through
  * a single partition. Centroids are L2-normalized after every update
  * (spherical k-means) so the max-dot assignment remains a true
  * nearest-by-cosine rule.
  */
object Ivf {

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  private def centroidDf(spark: SparkSession,
      cs: Seq[(Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    cs.map { case (i, v) => (i, v.toSeq) }.toDF("centroid_id", "cvec")
  }

  /** Nearest-centroid assignment: broadcast the K centroids, keep the
    * argmax-dot row per input id (ties by smaller centroid id →
    * deterministic, via max over (score, −centroid_id)).
    *
    * max_by instead of a row_number window: the broadcast join expands
    * every corpus row to K candidates INSIDE its partition, and the
    * partial (map-side) aggregate collapses them back to one row before
    * anything shuffles — the shuffle carries |corpus| rows, not
    * K·|corpus| as the window formulation did. On the corpus-wide
    * operation of the index build, that factor is the difference at scale.
    */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    vecs.crossJoin(broadcast(centroids))
      .withColumn("__score", DotProduct.dot(spark, col("__v"), col("cvec")))
      .groupBy("__id")
      .agg(max_by(
        struct(col("centroid_id"), col("__v")),
        struct(col("__score"), (-col("centroid_id")).as("__nc"))).as("__best"))
      .select(col("__id"), col("__best.__v").as("__v"),
        col("__best.centroid_id").as("centroid_id"))
  }

  /** Train K centroids with `iters` Lloyd iterations (iters = 0 → the
    * seeds themselves: the k lowest-id vectors, which plans as
    * TakeOrderedAndProject — fully parallel, no global window).
    */
  def buildCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    val vecs = df.select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v"))
    // k seed rows to the driver: centroids are driver-side state between
    // iterations anyway (they get broadcast into every assignment join).
    var state: Seq[(Int, Array[Double])] = vecs.orderBy("__id").limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
      .toSeq
    (1 to iters).foreach { _ =>
      val means = assign(vecs, centroidDf(spark, state))
        .select(col("centroid_id"), posexplode(col("__v")).as(Seq("dim", "x")))
        .groupBy("centroid_id", "dim")
        .agg(avg(col("x")).as("m"))
        .groupBy("centroid_id")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s.getField("m")).as("cvec"))
        .collect()
      state = means.map { r: Row =>
        val raw = r.getSeq[Double](1).toArray
        val norm = math.sqrt(raw.map(x => x * x).sum)
        (r.getInt(0), if (norm == 0.0) raw else raw.map(_ / norm))
      }.toSeq.sortBy(_._1)
    }
    centroidDf(spark, state)
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

  /** TWO-LEVEL (coarse-quantized) index — same output shape as [[index]],
    * different assignment cost. Flat argmax is n·k dot products; with
    * k = ⌈√n⌉ cells that is n^1.5 — embarrassingly parallel scan work,
    * but the dominant FLOP term of the whole pipeline once the pairwise
    * stage is capped. The FAISS IMI/coarse-quantizer answer: argmax over
    * `coarseCount` ≈ √k coarse centroids first (n·√k), then argmax only
    * among the fine seeds OF that coarse cell (n·k/√k expected) —
    * n·2√k total, a ~√k/2 reduction (~10× per decade at k = √n).
    *
    * Determinism: coarse centroids are the first `coarseCount` fine
    * seeds; each fine seed joins its argmax coarse cell EXCEPT a seed
    * that is itself a coarse centroid, which anchors its own cell (so no
    * coarse cell can be empty and every vector finds fine candidates —
    * without the anchor, non-normalized seeds could leave a cell
    * fine-seed-free and its vectors would silently vanish from the
    * index). All argmaxes tie toward the lower id — the same rule the
    * oracle SQL replays. The trade vs flat: a vector near a coarse-cell
    * boundary may land in a different fine cell (recall, never
    * precision — identical to nprobe semantics).
    */
  def indexHierarchical(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, coarseCount: Int): DataFrame = {
    val spark = corpus.sparkSession
    val coarse = centroids.filter(col("centroid_id") < coarseCount)
      .select(col("centroid_id").as("coarse_id"), col("cvec").as("wvec"))
    // fine seed -> coarse cell (k·coarseCount pairs, map-side collapsed)
    val sa = centroids.crossJoin(broadcast(coarse))
      .withColumn("__cs", DotProduct.dot(spark, col("cvec"), col("wvec")))
      .groupBy("centroid_id")
      .agg(max_by(col("coarse_id"),
        struct(col("__cs"), (-col("coarse_id")).as("__nc"))).as("__bc"))
      .select(col("centroid_id"),
        when(col("centroid_id") < coarseCount, col("centroid_id"))
          .otherwise(col("__bc")).as("coarse_id"))
    val vecs = corpus.select(col(idCol).as("__id"), asDouble(col(vecCol)).as("__v"))
    // corpus -> coarse cell (n·coarseCount)
    val vc = vecs.crossJoin(broadcast(coarse))
      .withColumn("__cs", DotProduct.dot(spark, col("__v"), col("wvec")))
      .groupBy("__id")
      .agg(max_by(struct(col("coarse_id"), col("__v")),
        struct(col("__cs"), (-col("coarse_id")).as("__nc"))).as("__b"))
      .select(col("__id"), col("__b.__v").as("__v"),
        col("__b.coarse_id").as("coarse_id"))
    // corpus -> fine cell among the coarse cell's seeds (n·k/√k expected);
    // the (fine seed, coarse) map rides inside the same k-row broadcast
    val fineByCoarse = sa.join(centroids, Seq("centroid_id"))
    vc.join(broadcast(fineByCoarse), Seq("coarse_id"))
      .withColumn("__fs", DotProduct.dot(spark, col("__v"), col("cvec")))
      .groupBy("__id")
      .agg(max_by(struct(col("centroid_id"), col("__v")),
        struct(col("__fs"), (-col("centroid_id")).as("__nf"))).as("__b"))
      .select(col("__id").as("neighbor_id"), col("__b.__v").as("cv"),
        col("__b.centroid_id").as("centroid_id"))
      .repartition(col("centroid_id"))
  }

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

  /** Convenience end-to-end: train, index, search. For search-many use
    * [[buildIndex]]/[[searchIndex]] instead of retraining per call.
    */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, numCells: Int, nprobe: Int,
      iters: Int = 2): DataFrame = {
    val centroids = buildCentroids(corpus, idCol, vecCol, numCells, iters)
    search(queries, index(corpus, idCol, vecCol, centroids), centroids,
      idCol, vecCol, k, nprobe)
  }

  /** Build-once: persist trained centroids + the cell-partitioned corpus
    * as warehouse tables (crash-safe snapshot swap). Search-many then reads
    * the index instead of re-clustering the corpus per query batch.
    */
  def buildIndex(wh: Warehouse, name: String, corpus: DataFrame,
      idCol: String, vecCol: String, numCells: Int, iters: Int = 2): Unit = {
    val centroids = buildCentroids(corpus, idCol, vecCol, numCells, iters)
    wh.overwrite(s"${name}_centroids", centroids)
    wh.overwrite(s"${name}_index", index(corpus, idCol, vecCol, centroids))
  }

  /** Search a persisted index built by [[buildIndex]]. */
  def searchIndex(wh: Warehouse, name: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame =
    search(queries, wh.read(s"${name}_index"), wh.read(s"${name}_centroids"),
      idCol, vecCol, k, nprobe)
}

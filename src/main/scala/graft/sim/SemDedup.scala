package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.DotProduct

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540 — "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication"): cluster the embedding space, then
  * within each cluster drop every item that is near-identical (cosine ≥
  * threshold) to a kept representative. Exact near-dup pairs (MinHash,
  * sign-LSH) catch REWORDINGS of the same surface text; semantic dedup
  * catches the same MEANING in different words — the pretraining-corpus
  * redundancy that survives lexical dedup.
  *
  * Spark shape: cells come from [[Ivf.buildCentroids]] (broadcast argmax
  * assignment — one corpus-linear pass), the pairwise stage self-joins
  * WITHIN cells only (equi-join on centroid_id — Σ|cell|² work, never the
  * corpus square), and the keep rule is deterministic: a vector is
  * dropped iff a LOWER-ID member of its cell matches it at ≥ threshold,
  * so the minimum id of every semantic group survives — same canonical
  * rule as [[graft.dedup.Dedup.exact]], and order-independent under
  * retries. `numCells` is the scale lever: the paper runs ~50k clusters
  * on web corpora, keeping cells small enough that the in-cell square is
  * the cheap part; a degenerate-cell cap (keep-lowest, as in
  * `Knn.nearDupPairsBanded`) composes on top if an embedding collapse
  * ever concentrates a cell.
  *
  * `iters = 0` keeps the centroids at the k lowest-id seed vectors —
  * fully deterministic float math both engines reproduce bit-identically
  * (the q_ann_ivf oracle precedent); Lloyd-trained cells (iters > 0)
  * change only WHICH pairs share a cell, i.e. recall, never precision.
  */
object SemDedup {

  /** One row per input vector: (idCol, cell, keep). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      numCells: Int, threshold: Double, iters: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val cents = Ivf.buildCentroids(df, idCol, vecCol, numCells, iters)
    // (neighbor_id, cv, centroid_id), partitioned by cell
    val idx = Ivf.index(df, idCol, vecCol, cents)
      .withColumn("nrm", Knn.norm(col("cv")))
    val a = idx.select(col("centroid_id"), col("neighbor_id").as("__ida"),
      col("cv").as("__va"), col("nrm").as("__na"))
    val b = idx.select(col("centroid_id"), col("neighbor_id").as("__idb"),
      col("cv").as("__vb"), col("nrm").as("__nb"))
    val drops = a.join(b, Seq("centroid_id"))
      .filter(col("__idb") < col("__ida"))
      .filter(DotProduct.dot(spark, col("__va"), col("__vb")) /
        (col("__na") * col("__nb")) >= threshold)
      .select(col("__ida").as("__drop")).distinct()
    idx.select(col("neighbor_id").as(idCol), col("centroid_id").as("cell"))
      .join(drops, col(idCol) === col("__drop"), "left")
      .select(col(idCol), col("cell"),
        col("__drop").isNull.as("keep"))
  }

  /** DuckDB SQL computing exactly [[semanticDedup]] at iters = 0 — same
    * lowest-id seeds, same argmax-dot/lowest-centroid tie rule, same
    * lower-id-wins keep rule.
    */
  def oracleSql(numCells: Int, threshold: Double,
      table: String = "embeddings", idCol: String = "vec_id",
      vecCol: String = "embedding"): String =
    s"""WITH e AS (SELECT $idCol AS id, $vecCol::DOUBLE[] AS v FROM $table),
       |cent AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS centroid_id,
       |    v AS cvec
       |  FROM (SELECT id, v FROM e ORDER BY id LIMIT $numCells)),
       |asn AS (SELECT id, v, centroid_id FROM (
       |    SELECT e.id, e.v, c.centroid_id,
       |      row_number() OVER (PARTITION BY e.id
       |        ORDER BY list_dot_product(e.v, c.cvec) DESC, c.centroid_id) AS rn
       |    FROM e CROSS JOIN cent c) WHERE rn = 1),
       |drops AS (SELECT DISTINCT a.id FROM asn a JOIN asn b
       |  ON a.centroid_id = b.centroid_id AND b.id < a.id
       |  WHERE list_dot_product(a.v, b.v)
       |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
       |    >= $threshold)
       |SELECT asn.id AS $idCol, asn.centroid_id AS cell,
       |  (drops.id IS NULL) AS keep
       |FROM asn LEFT JOIN drops ON drops.id = asn.id""".stripMargin
}

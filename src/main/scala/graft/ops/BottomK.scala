package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded per-key bottom-k for ANY orderable id type — the generic
  * companion to [[graft.expressions.BottomKLongs]] (which stays the fast
  * path for integral ids: primitive heap, no array churn).
  *
  * The r17 verdict's latent funnel: the non-integral-id cap paths in
  * SemDedup/Knn fell back to `row_number().over(Window.partitionBy(key))`,
  * which materializes and sorts EVERY row of a key inside one task before
  * truncating — a fully-degenerate key (all n rows in one LSH bucket or
  * one collapsed embedding cell) funnels the whole corpus through a
  * single task. This formulation never does: it is the classic two-phase
  * top-k over built-in aggregates —
  *
  *   phase 1: group by (key, map partition), keep each partition's k
  *            smallest ids — per-group state is bounded by the rows one
  *            map partition already holds, and the partial aggregation
  *            completes map-side (rows of a (key, pid) group are by
  *            construction all in partition pid);
  *   phase 2: group by key over the per-partition arrays — each key now
  *            receives ≤ k ids per contributing map partition, so the
  *            reduce-side group is ≤ k·P values, never the raw group.
  *
  * Correctness does not depend on HOW rows are split across partitions
  * (bottom-k of a union of per-partition bottom-ks is the global
  * bottom-k), so task retries that re-partition differently still produce
  * the identical result. NULL ids are excluded, matching BottomKLongs —
  * the r17-advice asymmetry where the window fallback let NULLs occupy
  * cap slots is gone. Ordering is Spark's native ordering for the id
  * type (binary/UTF8 for strings — the same order the window's
  * `orderBy(id)` used).
  */
object BottomK {

  /** One row per (keys..., id) for the k smallest non-null ids per key. */
  def perKey(df: DataFrame, keys: Seq[String], idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"bottom-k requires k >= 1, got $k")
    val grouped = df
      .filter(col(idCol).isNotNull)
      .select((keys :+ idCol).map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .groupBy((keys :+ "__pid").map(col): _*)
      .agg(slice(array_sort(collect_list(col(idCol))), 1, k).as("__bk"))
    grouped
      .groupBy(keys.map(col): _*)
      .agg(slice(array_sort(flatten(collect_list(col("__bk")))), 1, k)
        .as("__bk"))
      .select((keys.map(col) :+ explode(col("__bk")).as(idCol)): _*)
  }
}

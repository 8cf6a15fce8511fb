package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated group quantiles via a SORT-BASED window instead of
  * the `percentile` aggregate. The aggregate buffers every value of a
  * group in one executor's memory — an OOM at 100 TB group sizes — while a
  * sort-based window rides the shuffle's disk-backed sort, so the same
  * computation spills instead of dying (and measured ~4× faster here).
  *
  * Definition matches SQL `percentile_cont` / Spark `percentile` /
  * DuckDB `quantile_cont`: 0-based position p = q·(n−1) over the sorted
  * non-null values; result = v_lo + (v_hi − v_lo)·(p − ⌊p⌋).
  */
object Quantiles {

  /** One row per group: the requested `(name, q)` quantiles of `valueCol`
    * plus the non-null count `n`.
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      quantiles: Seq[(String, Double)]): DataFrame = {
    val ranked = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .withColumn("__rn",
        row_number().over(Window.partitionBy(groupCol).orderBy(col("__v"))))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(groupCol)))
    val aggs = quantiles.flatMap { case (name, qv) =>
      val p = lit(qv) * (col("__n") - 1) // constant within a group
      Seq(
        min(when(col("__rn") === floor(p) + 1, col("__v"))).as(s"__${name}_lo"),
        min(when(col("__rn") === ceil(p) + 1, col("__v"))).as(s"__${name}_hi"),
        min(p - floor(p)).as(s"__${name}_f"))
    } :+ count(lit(1)).as("n")
    ranked.groupBy(groupCol)
      .agg(aggs.head, aggs.tail: _*)
      .select(col(groupCol) +: quantiles.map { case (name, _) =>
        (col(s"__${name}_lo") +
          (col(s"__${name}_hi") - col(s"__${name}_lo")) * col(s"__${name}_f"))
          .as(name)
      } :+ col("n"): _*)
  }

  /** DISCRETE (SQL type-1) group quantiles: the element at 1-based rank
    * ⌈q·n⌉ (clamped to 1) of the sorted non-null values — matches SQL
    * `percentile_disc` and DuckDB `quantile_disc` (convention probed
    * empirically, r14). Unlike the interpolated form above, the result
    * is an ACTUAL DATA VALUE picked by integer rank: there is no
    * interpolation arithmetic whose last-ulp rounding can differ between
    * engines, so a strict comparison against the cut (winsorize clamp
    * counts, threshold audits) is bit-stable at any scale. The r14 sf1
    * widening caught exactly that failure: two engines' `quantile_cont`
    * cuts differed by 1 ulp around a 50-row tie group and flipped a
    * `value < lo` count — interpolated cuts must never feed strict
    * comparisons in a gated result.
    */
  def groupQuantilesDisc(df: DataFrame, groupCol: String, valueCol: String,
      quantiles: Seq[(String, Double)]): DataFrame = {
    val ranked = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .withColumn("__rn",
        row_number().over(Window.partitionBy(groupCol).orderBy(col("__v"))))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(groupCol)))
    val aggs = quantiles.map { case (name, qv) =>
      min(when(col("__rn") ===
        greatest(ceil(lit(qv) * col("__n")), lit(1L)), col("__v"))).as(name)
    } :+ count(lit(1)).as("n")
    ranked.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
  }
}

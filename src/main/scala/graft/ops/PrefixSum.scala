package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize._

/** Distributed global prefix sum — running totals over a TOTAL order
  * without `Window.orderBy(...)`'s empty partition spec, which funnels the
  * entire dataset through one task (the global-window scale killer PlanSpec
  * hunts elsewhere).
  *
  * The classic two-phase scan, kept inside the DataFrame API:
  *
  *   1. range-partition on the order key (`repartitionByRange`) — rows are
  *      globally ordered ACROSS partitions, window state stays bounded by
  *      one partition's rows;
  *   2. per-partition running sums via a window PARTITIONED BY the physical
  *      partition id;
  *   3. per-partition totals (one tiny aggregation, rows = #partitions) are
  *      collected, turned into cumulative offsets on the driver — bounded
  *      by partition count, like IVF's k centroids — and broadcast-joined
  *      back;
  *   4. running = offset(partition) + local running.
  *
  * The result is partitioning-INDEPENDENT (each row's running total is the
  * sum over all rows ordered before it), so an external oracle can verify
  * with a plain global window. `localCheckpoint` pins the sampled range
  * boundaries: steps 2 and 3 must observe the SAME physical partitioning,
  * and `repartitionByRange` re-samples per execution. On a cluster the
  * equivalent is materializing the ranged table once (a bucketed write) —
  * the same one-materialization cost this pays.
  */
object PrefixSum {

  /** `as` = running total of `valueCol` (LongType) over the total order
    * `orderCols` (must be unique for a deterministic result), computed
    * with per-partition-bounded state. Adds no other columns.
    */
  def runningTotal(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
      as: String): DataFrame =
    runningTotals(df, orderCols, Seq(valueCol -> as))

  /** Several running totals over ONE shared total order, paying the
    * range-repartition, checkpoint, and totals collect exactly once —
    * the multi-value form of [[runningTotal]] (e.g. rank = running 1s
    * AND cumulative frequency over the same (count desc, word) order).
    */
  def runningTotals(df: DataFrame, orderCols: Seq[Column],
      values: Seq[(Column, String)]): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .graftCheckpoint()
    val aggExprs = values.map { case (c, a) => sum(c).as(s"__t_$a") }
    val totalsRows = ranged.groupBy("__pid")
      .agg(aggExprs.head, aggExprs.tail: _*)
      .collect()
    val totals = totalsRows.map { r =>
      r.getInt(0) -> values.indices.map(i => r.getLong(i + 1))
    }.toMap
    // cumulative offsets per partition id; pids with no rows contribute 0
    val zero = values.indices.map(_ => 0L)
    val offsets = (0 until parts).scanLeft(zero) { (acc, pid) =>
      val t = totals.getOrElse(pid, zero)
      acc.zip(t).map { case (a, b) => a + b }
    }
    val offsetsDf = spark.createDataFrame(
      java.util.Arrays.asList(
        (0 until parts).map(pid =>
          org.apache.spark.sql.Row(
            (pid +: offsets(pid)): _*)): _*),
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType) +:
        values.map { case (_, a) =>
          org.apache.spark.sql.types.StructField(s"__off_$a",
            org.apache.spark.sql.types.LongType) }))
    val local = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    values.foldLeft(
      ranged.join(broadcast(offsetsDf), Seq("__pid"))) {
        case (d, (c, a)) =>
          d.withColumn(a, col(s"__off_$a") + sum(c).over(local))
      }
      .drop(("__pid" +: values.map { case (_, a) => s"__off_$a" }): _*)
  }

  /** `as` = running MIN of `valueCol` (LongType) over all rows STRICTLY
    * before the row in the total order `orderCols` — NULL for the globally
    * first row. Same two-phase shape as [[runningTotal]], but the
    * per-partition carry is a min, and the carry into partition p is the
    * min over partitions < p (exclusive scan), combined with the local
    * strict-prefix window via `least` (which skips NULLs). This is the
    * range-partitioned form of
    * `min(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`
    * without the empty-partition-spec Window that funnels everything
    * through one task.
    */
  def runningMinExclusive(df: DataFrame, orderCols: Seq[Column],
      valueCol: Column, as: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(parts, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .graftCheckpoint()
    val mins = ranged.groupBy("__pid")
      .agg(min(valueCol).as("__m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exclusive prefix-min per partition id: min over all earlier pids
    val carries = new Array[java.lang.Long](parts)
    var acc: java.lang.Long = null
    for (pid <- 0 until parts) {
      carries(pid) = acc
      mins.get(pid).foreach { m =>
        acc = if (acc == null || m < acc) java.lang.Long.valueOf(m) else acc
      }
    }
    val carryDf = spark.createDataFrame(
      java.util.Arrays.asList(
        (0 until parts).map(pid =>
          org.apache.spark.sql.Row(pid, carries(pid))): _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("__carry",
          org.apache.spark.sql.types.LongType))))
    val local = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .join(broadcast(carryDf), Seq("__pid"))
      .withColumn(as, least(col("__carry"), min(valueCol).over(local)))
      .drop("__pid", "__carry")
  }
}

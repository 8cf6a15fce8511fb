package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Morton (Z-order) indexing — Delta/
  * Iceberg `OPTIMIZE ZORDER BY` re-expressed as a plain column expression
  * plus Spark's own range repartitioning.
  *
  * Sorting a 100 TB table on ONE column makes min/max file skipping
  * perfect for that column and useless for every other; interleaving the
  * bits of two (or more) columns gives every interleaved column locality
  * within each file, so parquet row-group stats prune scans filtered on
  * EITHER dimension. `repartitionByRange(zIndex).sortWithinPartitions` is
  * the whole write-side recipe; LayoutSpec measures the bounding-box
  * shrinkage that makes the pruning real.
  */
object Layout {

  /** Morton z-index interleaving the low `bits` bits of `x` (even
    * positions) and `y` (odd positions). Pure integer bit arithmetic —
    * codegen'd, row-local, reproducible by any engine.
    */
  def zIndex(x: Column, y: Column, bits: Int = 16): Column = {
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The DuckDB expression computing exactly [[zIndex]] over SQL
    * sub-expressions `x`, `y` (must already be BIGINT).
    */
  def zIndexSql(x: String, y: String, bits: Int = 16): String = {
    val mask = (1L << bits) - 1
    // every term fully parenthesized: DuckDB (like Postgres) gives <<, >>
    // and | EQUAL precedence with left associativity, so an unwrapped
    // `a << 2 | b << 3` chain reassociates into ((a << 2) | b) << 3
    (0 until bits).flatMap { i =>
      Seq(s"((((($x) & $mask) >> $i) & 1) << ${2 * i})",
        s"((((($y) & $mask) >> $i) & 1) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")
  }
}

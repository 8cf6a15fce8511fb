package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8 — spreadsheet-range ingestion (key_accounts/active_orgs.py:25-40,
  * price-increase/import_bi_dev_ltv.py:35-44). Sheets arrive as header row +
  * all-string value rows; the reference slices sub-ranges by row position
  * (`records[376:]`, `records[157:191]`).
  *
  * Spark has no stable row order, so positional carving needs an explicit
  * index. For the single-file sheet-sized CSVs this models (≤ tens of
  * thousands of rows), the file is read as ONE partition so line order is
  * the file order, and the index is minted before any shuffle. This is a
  * deliberate non-distributed read — sheets are small by nature; large data
  * never goes through this path.
  */
object SheetCsv {

  /** Read a sheet-export CSV: header=true, every column StringType
    * (`dtype=str` in the reference). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(path)

  /** Read with a positional `__row` index (0 = first data row). */
  def readIndexed(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .coalesce(1)
      .withColumn("__row", monotonically_increasing_id())

  /** Carve `records[fromRow:untilRow)` by position and keep a subset of
    * columns — the reference's slice `records[157:191]` cols `[0:7]`.
    */
  def carve(indexed: DataFrame, fromRow: Long, untilRow: Long,
      cols: Seq[String]): DataFrame =
    indexed
      .filter(col("__row") >= fromRow && col("__row") < untilRow)
      .select(cols.map(col): _*)
}

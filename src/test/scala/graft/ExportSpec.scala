package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** W8 — pipe-delimited CSV export with quote control
  * (biilwerk_invoices_v3.py:141 `to_csv(sep='|', quotechar='"')`).
  */
class ExportSpec extends SparkSpec {

  test("pipe-delimited csv export round-trips") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val src = spark.read.parquet(s"$sf/nation.parquet")
    src.coalesce(1).write
      .option("header", "true")
      .option("delimiter", "|")
      .option("quote", "\"")
      .mode("overwrite")
      .csv(s"$dir/out")
    val back = spark.read
      .option("header", "true")
      .option("delimiter", "|")
      .option("inferSchema", "true")
      .csv(s"$dir/out")
    assert(back.count() == src.count())
    assert(back.columns.toSeq == src.columns.toSeq)
    val a = src.select(col("n_nationkey").cast("int"), col("n_name")).collect().toSet
    val b = back.select(col("n_nationkey").cast("int"), col("n_name")).collect().toSet
    assert(a == b)
  }

  test("q_sql_scan and q_rename_filter run with expected shapes") {
    assert(q("q_sql_scan").count() > 0)
    val rf = q("q_rename_filter").collect()
    assert(rf.nonEmpty)
    assert(rf.forall(r => Set("1-URGENT", "2-HIGH")(r.getAs[String]("priority"))))
  }
}

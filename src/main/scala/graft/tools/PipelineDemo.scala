package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ingest.Paginator
import graft.pipelines.Pipelines
import graft.tables.Warehouse

/** Runnable example of the three composed pipelines (SURVEY.md §3) against
  * the fixtures with stub transports. Usage: runMain graft.tools.PipelineDemo <sfDir>
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val b = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = new Warehouse(spark, Files.createTempDirectory("graft-demo").toString)

    // §3.1 full-refresh ingest via paginated stub transport
    val src = Tables.t(spark, sfDir, "events").limit(300)
      .select("event_id", "event_type", "value")
    val pages = src.orderBy("event_id").toJSON.collect().grouped(100).toSeq
    def fetch(c: Option[String]): Paginator.Page = {
      val i = c.map(_.toInt).getOrElse(0)
      if (i >= pages.size) Paginator.Page(Nil, None)
      else Paginator.Page(pages(i).toSeq, Some((i + 1).toString))
    }
    val n1 = Pipelines.ingestFullRefresh(spark, wh, "subs", fetch,
      df => df.select(col("event_id").cast("long"), col("event_type")), "demo")
    println(s"[demo] ingestFullRefresh rows=$n1")

    // §3.2 upsert + dependent item fan-out (run twice to show idempotence)
    val orders = Tables.t(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice").limit(200)
    def detail(key: String) =
      s"""[{"line":1,"amount":${key.toLong % 97}},{"line":2,"amount":5}]"""
    val r1 = Pipelines.upsertWithItems(spark, wh, "orders", "items",
      orders, "o_orderkey", detail, "line int, amount double")
    val r2 = Pipelines.upsertWithItems(spark, wh, "orders", "items",
      orders, "o_orderkey", detail, "line int, amount double")
    println(s"[demo] upsertWithItems run1=$r1 run2=$r2 (idempotent=${r1 == r2})")

    // §3.3 reverse ETL into a counting stub sink
    Tables.t(spark, sfDir, "events").createOrReplaceTempView("events")
    val batches = Pipelines.reverseEtl(spark,
      "SELECT user_id, event_type AS prop, CAST(value AS STRING) AS v FROM events",
      "user_id", "prop", "v", batchSize = 10, rows => ())
    println(s"[demo] reverseEtl batches=$batches")
    spark.stop()
  }
}

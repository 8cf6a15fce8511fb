package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.ingest.Paginator
import graft.pipelines.Pipelines
import graft.tables.Warehouse

/** End-to-end runs of the reference's three job shapes (SURVEY.md §3)
  * against fixtures + stub transports.
  */
class PipelineSpec extends SparkSpec {

  test("§3.1 ingest: paginated fetch → transform → full refresh") {
    val wh = new Warehouse(spark, Files.createTempDirectory("p31").toString)
    val src = Tables.t(spark, sf, "events").limit(300)
      .select("event_id", "event_type", "value")
    val pages = src.orderBy("event_id").toJSON.collect().grouped(100).toSeq
    def fetch(c: Option[String]): Paginator.Page = {
      val i = c.map(_.toInt).getOrElse(0)
      if (i >= pages.size) Paginator.Page(Nil, None)
      else Paginator.Page(pages(i).toSeq, Some((i + 1).toString))
    }
    val n = Pipelines.ingestFullRefresh(spark, wh, "subs", fetch,
      df => df.select(col("event_id").cast("long"), col("event_type")),
      auditTag = "stub_source")
    assert(n == 300)
    assert(wh.read("subs").columns.contains("ingest_source"))
    // WRITE_TRUNCATE semantics: second run replaces, not appends
    Pipelines.ingestFullRefresh(spark, wh, "subs", fetch,
      df => df.select(col("event_id").cast("long"), col("event_type")),
      auditTag = "stub_source")
    assert(wh.read("subs").count() == 300)
  }

  test("§3.2 upsert with audit preservation + item fan-out is idempotent") {
    val wh = new Warehouse(spark, Files.createTempDirectory("p32").toString)
    val orders = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice").limit(200)
    def detail(key: String) =
      s"""[{"line":1,"amount":${key.toLong % 97}},{"line":2,"amount":5}]"""
    val (np1, ni1) = Pipelines.upsertWithItems(spark, wh, "orders", "items",
      orders, "o_orderkey", detail, "line int, amount double")
    assert(np1 == 200 && ni1 == 400)
    val keptUids = wh.read("orders").select("o_orderkey", "u_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // re-run same batch: counts unchanged, u_ids preserved
    val (np2, ni2) = Pipelines.upsertWithItems(spark, wh, "orders", "items",
      orders, "o_orderkey", detail, "line int, amount double")
    assert(np2 == 200 && ni2 == 400)
    val uidsAfter = wh.read("orders").select("o_orderkey", "u_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(uidsAfter == keptUids)
  }

  test("§3.3 reverse ETL: sql → property maps → batches") {
    Tables.t(spark, sf, "events").createOrReplaceTempView("events")
    val posted = new java.util.concurrent.atomic.AtomicInteger(0)
    val batches = Pipelines.reverseEtl(spark,
      """SELECT user_id, event_type AS prop, CAST(value AS STRING) AS v
        |FROM events WHERE value IS NOT NULL""".stripMargin,
      "user_id", "prop", "v", batchSize = 10,
      rows => { require(rows.nonEmpty && rows.size <= 10); posted.incrementAndGet() })
    assert(batches > 0)
  }
}

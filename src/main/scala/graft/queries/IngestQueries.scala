package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ingest.{Enrich, Paginator}

/** SURVEY.md §2.1 ingestion shapes wired to fixture-backed stub transports
  * so they verify offline. Network I/O is behind `String => String` /
  * `Page`-returning functions (SURVEY.md §7.1).
  */
object IngestQueries {

  val defs: Seq[QueryDef] = Seq(

    // S1 — keyset-cursor paginated ingest (billwerk_invoices.py:49-82).
    // The stub pages a bounded slice of events (REST pagination is
    // inherently sequential; bulk data never takes this path) and the
    // result must equal the table slice it paged.
    QueryDef(
      "q_paginate",
      Some("""SELECT event_id, event_type, value FROM events
             |WHERE event_id < 2000""".stripMargin),
      (s, dir) => {
        val src = Tables.t(s, dir, "events")
          .filter(col("event_id") < 2000)
          .select("event_id", "event_type", "value")
        val pages = src.orderBy("event_id").toJSON.collect().grouped(500).toSeq
        def fetch(cursor: Option[String]): Paginator.Page = {
          val i = cursor.map(_.toInt).getOrElse(0)
          if (i >= pages.size) Paginator.Page(Nil, None)
          else Paginator.Page(pages(i), Some((i + 1).toString))
        }
        Paginator.toDf(s, Paginator.keysetCursor(fetch))
          .select(col("event_id").cast("long"),
            col("event_type"), col("value").cast("double"))
      }),

    // S6 — per-key detail fan-out via mapPartitions with a deterministic
    // stub "API" (bexio_orders_de.py:165-192): detail JSON parsed back with
    // an explicit schema.
    QueryDef(
      "q_enrich",
      Some("""SELECT o_orderkey, CAST(o_orderkey % 3 AS INT) AS flag
             |FROM orders""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders").select("o_orderkey")
        val enriched = Enrich.perKeyFetch(
          o, "o_orderkey",
          key => s"""{"flag":${key.toLong % 3}}""",
          partitions = 8)
        enriched
          .withColumn("flag", expr("from_json(detail, 'flag int').flag"))
          .select("o_orderkey", "flag")
      }),

    // §2.9 — incremental fetch above a high watermark
    // (billwerk_invoices.py:86-99); the watermark is derived in-plan (no
    // driver collect) and broadcast into the filter.
    QueryDef(
      "q_incremental",
      Some("""SELECT event_id, event_type, value FROM events
             |WHERE event_id > (SELECT max(event_id) / 2.0 FROM events)""".stripMargin),
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
        val th = e.agg((max(col("event_id")) / lit(2.0)).as("__th"))
        e.select("event_id", "event_type", "value")
          .crossJoin(broadcast(th))
          .filter(col("event_id") > col("__th"))
          .drop("__th")
      })
  )
}

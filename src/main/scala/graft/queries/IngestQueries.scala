package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ingest.{Enrich, Paginator}

/** SURVEY.md §2.1 ingestion shapes wired to fixture-backed stub transports
  * so they verify offline. Network I/O is behind `String => String` /
  * `Page`-returning functions (SURVEY.md §7.1).
  */
object IngestQueries {

  /** Test transport for S7: deterministically fails the FIRST attempt for
    * every 13th key, succeeds on retry. Executor-local attempt memory —
    * exactly the shape of a transient upstream 5xx.
    */
  private val attempted = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[queries] val flakyOnce: String => String = { key =>
    if (key.toLong % 13 == 0 && attempted.add(key))
      throw new RuntimeException(s"transient failure for $key")
    s"""{"flag":${key.toLong % 3}}"""
  }

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
          else Paginator.Page(pages(i).toSeq, Some((i + 1).toString))
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
        // partitions IS the reference's MAX_WORKERS knob; a fixed 8 left
        // 3/4 of the machine idle at sf1 (the r12 scaling table's only
        // non-structural outlier) — size it to the session like a real
        // deployment would
        val enriched = Enrich.perKeyFetch(
          o, "o_orderkey",
          key => s"""{"flag":${key.toLong % 3}}""",
          partitions = s.sparkContext.defaultParallelism)
        enriched
          .withColumn("flag", expr("from_json(detail, 'flag int').flag"))
          .select("o_orderkey", "flag")
      }),

    // S2 — page-number loop until the transport reports the last page
    // (lex_office_invoices.py:50-91). Bounded slice; REST pagination is
    // inherently driver-sequential (see q_paginate note).
    QueryDef(
      "q_page_number",
      Some("""SELECT event_id, event_type FROM events
             |WHERE event_id < 1200""".stripMargin),
      (s, dir) => {
        val src = Tables.t(s, dir, "events")
          .filter(col("event_id") < 1200)
          .select("event_id", "event_type")
        val pages = src.orderBy("event_id").toJSON.collect().grouped(300).toSeq
        def fetch(i: Int): Paginator.Page =
          if (i >= pages.size) Paginator.Page(Nil, None)
          else Paginator.Page(pages(i).toSeq,
            if (i == pages.size - 1) None else Some((i + 1).toString))
        Paginator.toDf(s, Paginator.pageNumber(fetch))
          .select(col("event_id").cast("long"), col("event_type"))
      }),

    // S3 — next-link follow with opaque URL cursors
    // (hubspot get_tickets_v2.py:43-58).
    QueryDef(
      "q_next_link",
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey < 900""".stripMargin),
      (s, dir) => {
        val src = Tables.t(s, dir, "customer")
          .filter(col("c_custkey") < 900)
          .select("c_custkey", "c_name")
        val pages = src.orderBy("c_custkey").toJSON.collect().grouped(250).toSeq
        def fetch(link: Option[String]): Paginator.Page = {
          val i = link.map(_.stripPrefix("/tickets?page=").toInt).getOrElse(0)
          if (i >= pages.size) Paginator.Page(Nil, None)
          else Paginator.Page(pages(i).toSeq,
            if (i == pages.size - 1) None else Some(s"/tickets?page=${i + 1}"))
        }
        Paginator.toDf(s, Paginator.nextLink(fetch))
          .select(col("c_custkey").cast("long"), col("c_name"))
      }),

    // S4 — single offset/limit window carve
    // (bexio_invoice_and_line_items_de.py:62-75).
    QueryDef(
      "q_offset_window",
      Some("""SELECT s_suppkey, s_name FROM supplier
             |ORDER BY s_suppkey LIMIT 4 OFFSET 3""".stripMargin),
      (s, dir) => {
        val src = Tables.t(s, dir, "supplier").select("s_suppkey", "s_name")
        val rows = src.orderBy("s_suppkey").toJSON.collect()
        def fetch(offset: Int, limit: Int): Paginator.Page =
          Paginator.Page(rows.slice(offset, offset + limit).toSeq, None)
        Paginator.toDf(s, Paginator.offsetWindow(fetch, offset = 3, limit = 4))
          .select(col("s_suppkey").cast("long"), col("s_name"))
      }),

    // S5 — starting_after cursor: the cursor is the id of the last element
    // of the previous page (stripe_charges.py:40-60).
    QueryDef(
      "q_starting_after",
      Some("""SELECT p_partkey, p_name FROM part
             |WHERE p_partkey < 1000""".stripMargin),
      (s, dir) => {
        val src = Tables.t(s, dir, "part")
          .filter(col("p_partkey") < 1000)
          .select("p_partkey", "p_name")
        val all = src
          .select(col("p_partkey"),
            to_json(struct(col("p_partkey"), col("p_name"))).as("j"))
          .orderBy("p_partkey").collect()
        def fetch(after: Option[String]): Paginator.Page = {
          val from = after.map(_.toLong).getOrElse(Long.MinValue)
          val page = all.filter(_.getLong(0) > from).take(200)
          if (page.isEmpty) Paginator.Page(Nil, None)
          else Paginator.Page(page.map(_.getString(1)).toSeq,
            Some(page.last.getLong(0).toString))
        }
        Paginator.toDf(s, Paginator.startingAfter(fetch))
          .select(col("p_partkey").cast("long"), col("p_name"))
      }),

    // S7 — retry + error channel UNDER the hash gate: the stub transport
    // fails the first attempt for every 13th key (per-JVM attempt memory),
    // the per-partition retry loop recovers, and the final output must be
    // byte-identical to the never-failing oracle. Keys ending the run in
    // the quarantine column would surface as a hash mismatch.
    QueryDef(
      "q_enrich_retry",
      Some("""SELECT o_orderkey, CAST(o_orderkey % 3 AS INT) AS flag
             |FROM orders""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders").select("o_orderkey")
        val enriched = Enrich.perKeyFetch(
          o, "o_orderkey", IngestQueries.flakyOnce, partitions = 8,
          policy = Enrich.Policy(maxRetries = 3))
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

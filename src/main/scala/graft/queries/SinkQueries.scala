package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryDef, Tables}
import graft.tables.Warehouse

/** Round-4 sink gating: the side-effecting write paths that were
  * ScalaTest-only (W1 full refresh, W5 staging merge, W7 reverse-ETL
  * property maps, W8 CSV export, streaming dedup) re-expressed as
  * read-back queries so the driver's DuckDB hash gate verifies the
  * STORAGE layer end-to-end, not just the transform. Pattern follows
  * q_warehouse_append / q_warehouse_upsert: run the real write machinery
  * into a temp warehouse/dir, read the result back, hash that.
  */
object SinkQueries {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  val defs: Seq[QueryDef] = Seq(

    // W1 — full refresh (reference biilwerk_subscriptions.py:110-118:
    // truncate-and-reload snapshot swap). Two overwrites; the read-back
    // must see ONLY the second snapshot — stale data dirs must be
    // unreachable through the new manifest.
    QueryDef(
      "q_warehouse_refresh",
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE c_mktsegment = 'BUILDING'""".stripMargin),
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
        val wh = new Warehouse(s, tmp("graft-q-whr"))
        wh.overwrite("cust", c.drop("c_mktsegment")) // stale snapshot
        wh.overwrite("cust", c.filter(col("c_mktsegment") === "BUILDING")
          .drop("c_mktsegment")) // the refresh
        wh.read("cust")
      }),

    // W5 — staging-table merge (reference stripe_charges.py:123-132: load
    // the batch into a staging table, then MERGE into the target). The
    // staging table itself goes through the warehouse — the merge reads it
    // BACK from storage, so both tables' round-trips are under the gate.
    QueryDef(
      "q_staging_merge",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             |FROM orders t
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM orders b
             |  WHERE b.o_orderkey % 3 = 0 AND b.o_orderkey = t.o_orderkey)
             |UNION ALL
             |SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice,
             |       'M' AS o_orderstatus
             |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        val batch = o.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2)
          .withColumn("o_orderstatus", lit("M"))
        val wh = new Warehouse(s, tmp("graft-q-whm"))
        wh.overwrite("target", o)
        wh.overwrite("staging", batch)
        wh.upsert("target", wh.read("staging"), Seq("o_orderkey"))
        wh.read("target")
      }),

    // Conditional three-way MERGE (Delta/Iceberg MERGE INTO semantics the
    // plain delete+insert upsert can't express): matched+delete-cond rows
    // vanish, matched+update-cond rows take the batch version, other
    // matched rows keep the target version, unmatched batch rows insert.
    // The fixture drives all four outcomes ('O' rows update, 'F' rows
    // with s.custkey%10=0 delete, other matched keep, %3=0 keys insert);
    // the oracle replays the clause set over one full outer join.
    QueryDef(
      "q_merge_conditional",
      Some("""WITH t AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
             |  FROM orders WHERE o_orderkey % 3 <> 0),
             |s AS (SELECT o_orderkey, o_custkey,
             |    o_totalprice + 10.0::DOUBLE AS o_totalprice, o_orderstatus
             |  FROM orders WHERE o_orderkey % 2 = 0),
             |j AS (SELECT t.o_orderkey AS tk, s.o_orderkey AS sk,
             |    t.o_custkey AS tc, s.o_custkey AS sc,
             |    t.o_totalprice AS tp, s.o_totalprice AS sp,
             |    t.o_orderstatus AS tst, s.o_orderstatus AS sst
             |  FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey),
             |c AS (SELECT *,
             |    tk IS NOT NULL AND sk IS NOT NULL AS m,
             |    (tk IS NOT NULL AND sk IS NOT NULL AND tst = 'O')
             |      OR tk IS NULL AS use_s
             |  FROM j)
             |SELECT CASE WHEN use_s THEN sk ELSE tk END AS o_orderkey,
             |  CASE WHEN use_s THEN sc ELSE tc END AS o_custkey,
             |  CASE WHEN use_s THEN sp ELSE tp END AS o_totalprice,
             |  CASE WHEN use_s THEN sst ELSE tst END AS o_orderstatus
             |FROM c
             |WHERE NOT (m AND tst = 'F' AND sc % 10 = 0)""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        val wh = new Warehouse(s, tmp("graft-q-whmc"))
        wh.overwrite("target", o.filter(col("o_orderkey") % 3 =!= 0))
        wh.overwrite("batch", o.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(10.0)))
        wh.mergeConditional("target", wh.read("batch"), Seq("o_orderkey"),
          updateWhen = expr("t.o_orderstatus = 'O'"),
          deleteWhen = expr("t.o_orderstatus = 'F' AND s.o_custkey % 10 = 0"))
        wh.read("target")
      }),

    // df.observe() metrics — the zero-extra-pass DQ counters a production
    // pipeline attaches to its writes (row counts, money totals, status
    // tallies ride the SAME job as the write, no second scan). The query
    // materializes through a noop sink and returns the OBSERVED values;
    // the oracle recomputes them relationally, so a metrics API that
    // under- or over-counts reddens the row.
    QueryDef(
      "q_observe",
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  round(sum(o_totalprice), 2) AS total,
             |  CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_open
             |FROM orders""".stripMargin),
      (s, dir) => {
        val obs = org.apache.spark.sql.Observation("graft_dq")
        Tables.t(s, dir, "orders")
          .observe(obs,
            count(lit(1)).as("n_rows"),
            round(sum("o_totalprice"), 2).as("total"),
            count(when(col("o_orderstatus") === "O", 1)).as("n_open"))
          .write.format("noop").mode("overwrite").save()
        val m = obs.get
        import s.implicits._
        Seq((m("n_rows").asInstanceOf[Long],
          m("total").asInstanceOf[Double],
          m("n_open").asInstanceOf[Long]))
          .toDF("n_rows", "total", "n_open")
      }),

    // Column-level CDC summary: which columns changed between two table
    // versions, and how often — the drift report a warehouse migration
    // reviews before merging (row-level diff is snapshotDiff's job; this
    // is the per-COLUMN rollup). One join, one aggregate, unpivoted to
    // (column_name, n_changed) via stack.
    QueryDef(
      "q_cdc_columns",
      Some("""WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
             |s AS (SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS st,
             |    CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 5.0::DOUBLE
             |         ELSE o_totalprice END AS pr
             |  FROM orders)
             |SELECT 'o_orderstatus' AS column_name,
             |  CAST(sum(CASE WHEN t.o_orderstatus <> s.st THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
             |FROM t JOIN s USING (o_orderkey)
             |UNION ALL
             |SELECT 'o_totalprice',
             |  CAST(sum(CASE WHEN t.o_totalprice <> s.pr THEN 1 ELSE 0 END) AS BIGINT)
             |FROM t JOIN s USING (o_orderkey)""".stripMargin),
      (s, dir) => {
        val t = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val n = t.select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, "X")
            .otherwise(col("o_orderstatus")).as("st"),
          when(col("o_orderkey") % 11 === 0, col("o_totalprice") + lit(5.0))
            .otherwise(col("o_totalprice")).as("pr"))
        t.join(n, Seq("o_orderkey"))
          .agg(
            sum(when(col("o_orderstatus") =!= col("st"), 1L).otherwise(0L))
              .as("c_status"),
            sum(when(col("o_totalprice") =!= col("pr"), 1L).otherwise(0L))
              .as("c_price"))
          .select(expr(
            "stack(2, 'o_orderstatus', c_status, 'o_totalprice', c_price)" +
              " AS (column_name, n_changed)"))
      }),

    // ORC round-trip — the second columnar format a lake speaks: write
    // the projected table as ORC (zlib), read it back, aggregate with a
    // pushed-down filter. The oracle computes the same aggregate from the
    // parquet fixture, so a lossy or reordered round-trip (dropped rows,
    // mangled decimals/strings, broken predicate pushdown) reddens it.
    QueryDef(
      "q_orc_roundtrip",
      Some("""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
             |  sum(o_totalprice) AS total
             |FROM orders WHERE o_custkey % 10 <> 3
             |GROUP BY 1""".stripMargin),
      (s, dir) => {
        val base = tmp("graft-q-orc")
        Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .write.option("compression", "zlib").orc(s"$base/orders_orc")
        s.read.orc(s"$base/orders_orc")
          .filter(col("o_custkey") % 10 =!= 3)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
      }),

    // W7/G4 — reverse ETL: fold (entity, property, value) rows into
    // first-write-wins property maps (the {id: {prop: val}} dict the
    // reference POSTs, hubspot_bm_contact.py:101-132), assign each entity
    // a deterministic batch (sha-bucket — batch membership must not depend
    // on partitioning, unlike the reference's arrival-order batches),
    // persist through the warehouse, and gate the exploded read-back.
    QueryDef(
      "q_reverse_etl",
      Some("""SELECT user_id,
             |  ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 32
             |    AS batch_id,
             |  event_type AS property, min(value) AS value
             |FROM events GROUP BY user_id, event_type""".stripMargin),
      (s, dir) => {
        val maps = graft.reverse.BatchSink.propertyMaps(
          Tables.t(s, dir, "events"), "user_id", "event_type", "value")
        val rows = maps.select(col("user_id"),
            (graft.expressions.Hashing.sha60(col("user_id")) % 32).as("batch_id"),
            explode(col("properties")).as(Seq("property", "value")))
        val wh = new Warehouse(s, tmp("graft-q-whp"))
        wh.overwrite("props", rows)
        wh.read("props")
      }),

    // W8 — CSV export (pipe delimiter, quote-on-need) and RE-READ with an
    // explicit schema: delimiter/quoting/type round-trip is what is
    // verified. The injected `note` column forces quoting (embedded pipe,
    // comma and double-quote).
    QueryDef(
      "q_csv_export",
      Some("""SELECT c_custkey, c_name, CAST(c_nationkey AS INT) AS c_nationkey,
             |  c_acctbal, c_mktsegment || '|x,"y"' AS note
             |FROM customer""".stripMargin),
      (s, dir) => {
        val out = tmp("graft-q-csv")
        Tables.t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            col("c_acctbal"),
            concat(col("c_mktsegment"), lit("|x,\"y\"")).as("note"))
          .write.mode("overwrite")
          .option("sep", "|").option("quote", "\"").option("header", "true")
          .csv(out)
        s.read
          .schema(StructType(Seq(
            StructField("c_custkey", LongType),
            StructField("c_name", StringType),
            StructField("c_nationkey", IntegerType),
            StructField("c_acctbal", DoubleType),
            StructField("note", StringType))))
          .option("sep", "|").option("quote", "\"").option("header", "true")
          .csv(out)
      }),

    // Streaming exact dedup under the gate: the duplicate feed (the same
    // document file landing twice) drains through a REAL checkpointed
    // AvailableNow stream with dropDuplicatesWithinWatermark, and the
    // sink's read-back must equal DISTINCT content hashes — one row per
    // distinct content regardless of how many times it arrived. Only the
    // hash is gated: which duplicate row survives is arrival order.
    QueryDef(
      "q_stream_dedup",
      Some("""SELECT DISTINCT
             |  sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
             |    AS content_hash
             |FROM documents""".stripMargin),
      (s, dir) => {
        val src = s"$dir/documents.parquet"
        val base = tmp("graft-q-sdd")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
        Tables.stageFixture(src, s"$base/in/docs-1")
        Tables.stageFixture(src, s"$base/in/docs-2")
        val schema = s.read.parquet(src).schema
        val stream = graft.streaming.IncrementalStream.statefulSession(s)
          .readStream.schema(schema).parquet(s"$base/in")
          // deterministic synthetic event time — documents carry none.
          // Offset a day past the epoch: the watermark initializes at
          // 1970-01-01T00:00:00, and a row AT the initial watermark
          // (doc_id 0) would be discarded as late before ever reaching
          // the dedup state.
          .withColumn("ts",
            timestamp_micros((col("doc_id") + 86400L) * 1000000L))
        val deduped = graft.streaming.StreamDedup
          .dedupStream(stream, "text", "ts")
          .select("content_hash")
        graft.streaming.StreamDedup.runAvailableNow(
          deduped, s"$base/chk", s"$base/out")
        s.read.parquet(s"$base/out")
      }),

    // Compaction (Delta/Iceberg OPTIMIZE): three appends fragment the
    // table into three data dirs; compact rewrites them into one behind
    // the atomic swap. The gate proves values are untouched; WarehouseSpec
    // asserts the dir count actually dropped to 1.
    QueryDef(
      "q_compact",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |UNION ALL
             |SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 = 0
             |UNION ALL
             |SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 11 = 0""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders").select("o_orderkey", "o_totalprice")
        val wh = new Warehouse(s, tmp("graft-q-cmp"))
        wh.overwrite("t", o)
        wh.append("t", o.filter(col("o_orderkey") % 7 === 0))
        wh.append("t", o.filter(col("o_orderkey") % 11 === 0))
        wh.compact("t")
        wh.read("t")
      }),

    // Schema evolution on append (BigQuery schema relaxation): a later
    // batch carries an extra column; mergeSchema surfaces the superset
    // with NULLs for the rows that predate it.
    QueryDef(
      "q_schema_evolution",
      Some("""SELECT o_orderkey, o_totalprice,
             |       CAST(NULL AS VARCHAR) AS o_orderstatus
             |FROM orders
             |UNION ALL
             |SELECT o_orderkey, o_totalprice, o_orderstatus
             |FROM orders WHERE o_orderkey % 9 = 0""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
        val wh = new Warehouse(s, tmp("graft-q-sev"))
        wh.overwrite("t", o.select("o_orderkey", "o_totalprice"))
        wh.append("t", o.filter(col("o_orderkey") % 9 === 0)
          .select("o_orderkey", "o_totalprice", "o_orderstatus"))
        wh.read("t")
      }),

    // Incremental aggregate-view maintenance: two batches of partial
    // (sum, count) aggregates merged into a warehouse table; the final
    // read must equal the full-history aggregation without ever having
    // scanned full history in one job.
    QueryDef(
      "q_incr_agg",
      Some("""SELECT user_id, round(sum(value), 2) AS total, count(*) AS n
             |FROM events GROUP BY user_id""".stripMargin),
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
        def partial(p: org.apache.spark.sql.Column) = ev.filter(p)
          .groupBy("user_id")
          .agg(sum(col("value")).as("total"), count(lit(1)).as("n"))
        val wh = new Warehouse(s, tmp("graft-q-iagg"))
        graft.tables.IncrementalAgg.mergePartials(
          wh, "agg", partial(col("event_id") % 2 === 0), Seq("user_id"))
        graft.tables.IncrementalAgg.mergePartials(
          wh, "agg", partial(col("event_id") % 2 === 1), Seq("user_id"))
        wh.read("agg")
          .select(col("user_id"), round(col("total"), 2).as("total"), col("n"))
      }),

    // MERGEABLE-SKETCH rollup — the incremental distinct-count pattern at
    // 100 TB: per-day HLL sketches (a few KB each, Datasketches binary)
    // persist as a warehouse table; the rollup UNIONS sketches read back
    // from storage instead of ever rescanning history. Estimates aren't
    // bit-portable across engines, so the gate follows the
    // q_approx_distinct pattern: bit-identical exact values beside a
    // deterministic error-bound boolean (HLL lgK=12 ⇒ rsd ≈ 1.6%; bound
    // 5%). The sketch → parquet → union round-trip is what is verified.
    QueryDef(
      "q_hll_union",
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |  TRUE AS approx_ok
             |FROM events GROUP BY event_type""".stripMargin),
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
        val daily = ev
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(hll_sketch_agg(col("user_id")).as("sketch"))
        val wh = new Warehouse(s, tmp("graft-q-hll"))
        wh.overwrite("daily_sketches", daily)
        val rolled = wh.read("daily_sketches")
          .groupBy("event_type")
          .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("__approx"))
        ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("exact_users"))
          .join(rolled, Seq("event_type"))
          .select(col("event_type"), col("exact_users"),
            (abs(col("__approx") - col("exact_users"))
              <= col("exact_users") * 0.05).as("approx_ok"))
      }),

    // Data-quality checks (the dbt-test pass an ELT pipeline runs after
    // every load): row rules evaluate in ONE aggregate pass — a
    // sum(when(violation)) per rule, never one scan per rule — and
    // uniqueness aggregates separately on the key. The checked relation
    // engineers known violations: a duplicated key slice (% 97) and a
    // NULL-bearing column; two rules pass with zero violations, which is
    // equally load-bearing (a broken rule that always fires 0 would slip
    // through a gate that only checked failing rules).
    QueryDef(
      "q_dq_checks",
      Some("""WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
             |    nullif(o_orderstatus, 'O') AS maybe_null
             |  FROM orders
             |  UNION ALL
             |  SELECT o_orderkey, o_orderstatus, o_totalprice,
             |    nullif(o_orderstatus, 'O') AS maybe_null
             |  FROM orders WHERE o_orderkey % 97 = 0)
             |SELECT 'status_accepted' AS rule, CAST(count(*) FILTER (
             |  WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT)
             |  AS n_violations FROM t
             |UNION ALL
             |SELECT 'price_positive', CAST(count(*) FILTER (
             |  WHERE o_totalprice <= 0) AS BIGINT) FROM t
             |UNION ALL
             |SELECT 'status_not_null', CAST(count(*) FILTER (
             |  WHERE maybe_null IS NULL) AS BIGINT) FROM t
             |UNION ALL
             |SELECT 'pk_unique', CAST(count(*) - count(DISTINCT o_orderkey)
             |  AS BIGINT) FROM t""".stripMargin),
      (s, dir) => {
        import graft.ops.Dq
        val o = Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val t = o.unionByName(o.filter(col("o_orderkey") % 97 === 0))
          .withColumn("maybe_null", nullif(col("o_orderstatus"), lit("O")))
        Dq.rowViolations(t, Seq(
            Dq.Rule("status_accepted",
              !col("o_orderstatus").isin("O", "F", "P")),
            Dq.Rule("price_positive", col("o_totalprice") <= 0),
            Dq.Rule("status_not_null", col("maybe_null").isNull)))
          .unionByName(Dq.uniquenessViolations(t, "pk_unique",
            Seq("o_orderkey")))
      }),

    // SCD2 point-in-time lookup: the dimension version current as of a
    // fixed timestamp — at most one row per key; a pure pushed-down filter.
    QueryDef(
      "q_scd2_asof",
      Some("""WITH ch AS (SELECT o_custkey, o_orderkey, o_orderpriority,
             |    epoch_us(o_orderdate) AS ts_us FROM orders),
             |dim AS (SELECT o_custkey, o_orderkey, o_orderpriority,
             |  ts_us AS valid_from,
             |  lead(ts_us) OVER (PARTITION BY o_custkey
             |    ORDER BY ts_us, o_orderkey) AS valid_to
             |FROM ch)
             |SELECT o_custkey, o_orderkey, o_orderpriority, valid_from, valid_to
             |FROM dim
             |WHERE valid_from <= epoch_us(TIMESTAMP '1995-06-01 00:00:00')
             |  AND (valid_to IS NULL
             |       OR valid_to > epoch_us(TIMESTAMP '1995-06-01 00:00:00'))""".stripMargin),
      (s, dir) => {
        val dim = graft.ops.Temporal.scd2(
          Tables.t(s, dir, "orders").select(
            col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us")),
          "o_custkey", "ts_us", "o_orderkey")
        graft.ops.Temporal.scd2AsOf(dim,
          unix_micros(lit("1995-06-01 00:00:00").cast("timestamp")))
          .select("o_custkey", "o_orderkey", "o_orderpriority",
            "valid_from", "valid_to")
      }),

    // Partition-local upsert: the batch touches only the 'purchase'
    // partition, so only that partition is rewritten — every other
    // partition survives as a manifest line referencing the original
    // immutable dir (WarehouseSpec asserts the files are byte-identical).
    // The O(affected partitions) upsert a daily 100 TB load needs.
    QueryDef(
      "q_partitioned_upsert",
      Some("""SELECT event_id, user_id, event_type,
             |  CASE WHEN event_type = 'purchase' THEN value * 2
             |       ELSE value END AS value
             |FROM events""".stripMargin),
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
          .select("event_id", "user_id", "event_type", "value")
        val batch = ev.filter(col("event_type") === "purchase")
          .withColumn("value", col("value") * 2)
        val wh = new Warehouse(s, tmp("graft-q-pup"))
        wh.overwritePartitioned("ev", ev, "event_type")
        wh.upsertPartitioned("ev", batch, Seq("event_id"), "event_type")
        wh.read("ev")
      }),

    // Partitioned lifecycle UNDER schema evolution: an evolving append
    // adds a `note` column (fresh ids, all partitions), then an OLD-schema
    // batch upserts into the 'purchase' partition. The rewrite of that
    // partition must preserve the evolved values of KEPT rows —
    // upsertPartitioned may not project the merged read down to the
    // batch's narrower schema (the silent-data-loss edge the r6 verdict
    // found: affected partitions losing evolved columns while untouched
    // ones keep them).
    QueryDef(
      "q_partitioned_evolve",
      Some("""SELECT event_id, event_type, value, CAST(NULL AS VARCHAR) AS note
             |FROM events WHERE event_type <> 'purchase'
             |UNION ALL
             |SELECT event_id, event_type, value * 2 AS value,
             |       CAST(NULL AS VARCHAR) AS note
             |FROM events WHERE event_type = 'purchase'
             |UNION ALL
             |SELECT event_id + 1000000 AS event_id, event_type, value,
             |       'evolved' AS note
             |FROM events WHERE event_id % 13 = 0""".stripMargin),
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
          .select("event_id", "event_type", "value")
        val wh = new Warehouse(s, tmp("graft-q-pevo"))
        wh.overwritePartitioned("t", ev, "event_type")
        // schema-evolving append: new ids (no key collisions), new column
        wh.append("t", ev.filter(col("event_id") % 13 === 0)
          .withColumn("event_id", col("event_id") + 1000000L)
          .withColumn("note", lit("evolved")))
        // old-schema batch: rewrites ONLY the purchase partition; the
        // evolved rows kept there must retain `note`
        wh.upsertPartitioned("t",
          ev.filter(col("event_type") === "purchase")
            .withColumn("value", col("value") * 2),
          Seq("event_id"), "event_type")
        wh.read("t").select("event_id", "event_type", "value", "note")
      }),

    // Partition-local DELETE (right-to-be-forgotten): remove a key set
    // touching only the 'purchase' partition; all other partitions keep
    // their immutable dirs.
    QueryDef(
      "q_partitioned_delete",
      Some("""SELECT event_id, user_id, event_type, value FROM events
             |WHERE NOT (event_type = 'purchase' AND user_id % 2 = 0)""".stripMargin),
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
          .select("event_id", "user_id", "event_type", "value")
        val wh = new Warehouse(s, tmp("graft-q-pdel"))
        wh.overwritePartitioned("ev", ev, "event_type")
        wh.deletePartitioned("ev",
          ev.filter(col("event_type") === "purchase" && col("user_id") % 2 === 0)
            .select("event_id", "event_type"),
          Seq("event_id"), "event_type")
        wh.read("ev")
      }),

    // Hive-partitioned layout + partition pruning: data written
    // partitionBy(event_type), the filter resolves AT THE FILE LISTING —
    // non-matching partitions are never opened (PlanSpec asserts the
    // PartitionFilters entry). The layout decision that turns a 100 TB
    // scan into a 1-partition scan.
    QueryDef(
      "q_partition_pruning",
      Some("""SELECT event_id, user_id, value FROM events
             |WHERE event_type = 'purchase'""".stripMargin),
      (s, dir) => {
        val out = tmp("graft-q-part")
        Tables.t(s, dir, "events")
          .select("event_id", "user_id", "value", "event_type")
          .write.mode("overwrite").partitionBy("event_type").parquet(out)
        s.read.parquet(out)
          .filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "value")
      }),

    // S9 — column-pruned scan + deterministic carve (reference
    // bexio_orders_de.py:312-318: SELECT cols FROM table LIMIT n). The
    // projection must reach the parquet scan (PlanSpec asserts ReadSchema);
    // this row puts the same shape under the value gate.
    QueryDef(
      "q_sql_pruned",
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_orderkey LIMIT 100""".stripMargin),
      (s, dir) => Tables.t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100))
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.tables.Warehouse

/** Round-4 streaming depth, both under the hash gate like q_stream_window:
  * a foreachBatch MERGE sink (the production streaming-upsert pattern) and
  * a stream-static enrichment join. Each stages the fixture into a landing
  * dir, runs a real checkpointed AvailableNow query, and gates the sink's
  * read-back.
  */
object StreamQueries {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** See [[graft.streaming.IncrementalStream.statefulSession]]: fewer
    * state-store instances for fixture-scale stateful streams.
    */
  private def streamSession(s: org.apache.spark.sql.SparkSession) =
    graft.streaming.IncrementalStream.statefulSession(s)

  val defs: Seq[QueryDef] = Seq(

    // foreachBatch merge: events land as TWO files processed as separate
    // micro-batches (maxFilesPerTrigger=1); each batch merges
    // keep-latest-per-user into the warehouse. The final table must equal
    // the batch QUALIFY row_number()=1 — regardless of which batch ran
    // first, because the merge rule is order-independent.
    QueryDef(
      "q_stream_upsert",
      Some("""SELECT user_id, event_id AS last_event_id,
             |       event_type AS last_event_type, value AS last_value
             |FROM events
             |QUALIFY row_number() OVER (
             |  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin),
      (s, dir) => {
        val base = tmp("graft-q-smerge")
        // ts stays in its raw fixture type through the stage/land hop;
        // Tables.normalizeEventTs on the STREAM handles either generation
        val raw = s.read.parquet(s"$dir/events.parquet")
        raw.filter(col("event_id") % 2 === 0)
          .coalesce(1).write.parquet(s"$base/s0")
        raw.filter(col("event_id") % 2 === 1)
          .coalesce(1).write.parquet(s"$base/s1")
        // flatten each slice's single part file into the landing dir (a
        // flat dir of plain files — no partition-discovery surprises)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
        Seq("s0", "s1").foreach { sl =>
          val part = java.nio.file.Files.list(
              java.nio.file.Paths.get(s"$base/$sl"))
            .filter(p => p.getFileName.toString.startsWith("part-") &&
              p.getFileName.toString.endsWith(".parquet"))
            .findFirst().get()
          java.nio.file.Files.copy(part,
            java.nio.file.Paths.get(s"$base/in/$sl.parquet"))
        }
        val stream = Tables.normalizeEventTs(
            s.readStream.schema(raw.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(s"$base/in"))
          .select("user_id", "event_id", "event_type", "value", "ts")
        val wh = new Warehouse(s, s"$base/wh")
        graft.streaming.StreamMerge.runMergeLatest(
          stream, s"$base/chk", wh, "latest",
          keys = Seq("user_id"),
          order = Seq(col("ts").desc, col("event_id").desc))
        wh.read("latest")
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_event_type"),
            col("value").as("last_value"))
      }),

    // STREAM-STREAM inner join with watermarks + an event-time range
    // constraint (purchase within 30 min after a click, per user) — the
    // state-cleanup contract Structured Streaming requires. Inner joins
    // emit matches eagerly, so the AvailableNow drain produces exactly the
    // batch-join result the oracle computes.
    QueryDef(
      "q_stream_join",
      Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
             |FROM events c JOIN events p
             |  ON c.user_id = p.user_id
             | AND c.event_type = 'click' AND p.event_type = 'purchase'
             | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""".stripMargin),
      (s, dir) => {
        val base = tmp("graft-q-ssj")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
        Tables.stageFixture(s"$dir/events.parquet", s"$base/in/events")
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val ss = streamSession(s)
        def side(tpe: String, idAs: String, tsAs: String) =
          Tables.normalizeEventTs(
              ss.readStream.schema(schema).parquet(s"$base/in"))
            .filter(col("event_type") === tpe)
            .select(col("user_id"), col("event_id").as(idAs), col("ts").as(tsAs))
            .withWatermark(tsAs, "1 hour")
        val joined = side("click", "click_id", "click_ts")
          .join(side("purchase", "purchase_id", "purchase_ts")
              .withColumnRenamed("user_id", "p_user_id"),
            col("user_id") === col("p_user_id") &&
              col("purchase_ts") >= col("click_ts") &&
              col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
          .select("user_id", "click_id", "purchase_id")
        graft.streaming.IncrementalStream.runAvailableNow(
          joined, s"$base/chk", s"$base/out")
        s.read.parquet(s"$base/out")
      }),

    // Stream-stream LEFT OUTER join — the semantics inner joins don't
    // exercise: an unmatched click may only emit its NULL row once no
    // future purchase could match it, i.e. once the GLOBAL watermark
    // (min of both sides' max event time, minus the 1 h delay) passes the
    // end of its 30-minute join window. The oracle encodes exactly that
    // emission rule: matched rows unconditionally, NULL rows only for
    // clicks whose window end sits at least ONE MILLISECOND below the
    // watermark. Unlike session eviction (inclusive at equality —
    // SessionizeSpec), join state eviction tracks its state watermark at
    // millisecond granularity: SessionizeSpec's ladder test pins that a
    // window end 1 µs below the watermark is withheld while 1 ms below
    // emits. Clicks near the stream's tail stay withheld — correct, not
    // missing.
    QueryDef(
      "q_stream_outer_join",
      Some("""WITH c AS (SELECT user_id, event_id, ts FROM events
             |    WHERE event_type = 'click'),
             |p AS (SELECT user_id, event_id, ts FROM events
             |    WHERE event_type = 'purchase'),
             |wm AS (SELECT least((SELECT max(ts) FROM c),
             |    (SELECT max(ts) FROM p)) - INTERVAL 1 HOUR AS w),
             |m AS (SELECT c.user_id, c.event_id AS click_id,
             |    p.event_id AS purchase_id
             |  FROM c JOIN p ON c.user_id = p.user_id
             |    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE),
             |u AS (SELECT c.user_id, c.event_id AS click_id,
             |    CAST(NULL AS BIGINT) AS purchase_id
             |  FROM c, wm
             |  WHERE NOT EXISTS (SELECT 1 FROM p
             |      WHERE p.user_id = c.user_id
             |        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
             |    AND c.ts + INTERVAL 30 MINUTE <= wm.w - INTERVAL 1 MILLISECOND)
             |SELECT * FROM m UNION ALL SELECT * FROM u""".stripMargin),
      (s, dir) => {
        val base = tmp("graft-q-ssoj")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
        Tables.stageFixture(s"$dir/events.parquet", s"$base/in/events")
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val ss = streamSession(s)
        def side(tpe: String, idAs: String, tsAs: String) =
          Tables.normalizeEventTs(
              ss.readStream.schema(schema).parquet(s"$base/in"))
            .filter(col("event_type") === tpe)
            .select(col("user_id"), col("event_id").as(idAs), col("ts").as(tsAs))
            .withWatermark(tsAs, "1 hour")
        val joined = side("click", "click_id", "click_ts")
          .join(side("purchase", "purchase_id", "purchase_ts")
              .withColumnRenamed("user_id", "p_user_id"),
            col("user_id") === col("p_user_id") &&
              col("purchase_ts") >= col("click_ts") &&
              col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"),
            "leftOuter")
          .select("user_id", "click_id", "purchase_id")
        graft.streaming.IncrementalStream.runAvailableNow(
          joined, s"$base/chk", s"$base/out")
        s.read.parquet(s"$base/out")
      }),

    // STREAMING session_window with a watermark (the native-operator twin
    // of q_session_native, run as a real checkpointed AvailableNow
    // stream). Append mode only emits a session once the watermark passes
    // its end (= last event + gap), so each user's final, still-open
    // session is correctly WITHHELD — the oracle encodes exactly that
    // emission rule with a HAVING against the global max event time.
    QueryDef(
      "q_stream_session",
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
             |s AS (SELECT user_id, tsu,
             |    CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id
             |        ORDER BY tsu) >= 86400000000 THEN 1 ELSE 0 END AS brk
             |  FROM e),
             |g AS (SELECT user_id, tsu,
             |    sum(brk) OVER (PARTITION BY user_id ORDER BY tsu
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM s)
             |SELECT user_id, min(tsu) AS session_start, max(tsu) AS session_end,
             |  CAST(count(*) AS INT) AS n_events
             |FROM g GROUP BY user_id, sid
             |HAVING max(tsu) + 86400000000 <= (SELECT max(epoch_us(ts)) FROM events)""".stripMargin),
      // The HAVING bound's `<=` is a RECORDED DECISION, not an accident:
      // Spark's append-mode eviction emits a session whose window end
      // EQUALS the watermark (inclusive at equality) — pinned empirically
      // by SessionizeSpec's windowEnd==watermark tie test, which turns red
      // if an upgrade flips the inclusivity, telling us to shift this
      // bound rather than debug a one-row hash mismatch.
      (s, dir) => {
        val base = tmp("graft-q-ssession")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
        Tables.stageFixture(s"$dir/events.parquet", s"$base/in/events")
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val sessions = Tables.normalizeEventTs(
            streamSession(s).readStream.schema(schema).parquet(s"$base/in"))
          .withWatermark("ts", "0 seconds")
          .groupBy(col("user_id"), session_window(col("ts"), "24 hours"))
          .agg(min(unix_micros(col("ts"))).as("session_start"),
            max(unix_micros(col("ts"))).as("session_end"),
            count(lit(1)).cast("int").as("n_events"))
          .select("user_id", "session_start", "session_end", "n_events")
        graft.streaming.IncrementalStream.runAvailableNow(
          sessions, s"$base/chk", s"$base/out")
        s.read.parquet(s"$base/out")
      }),

    // CHECKPOINT RECOVERY / exactly-once across RESTARTS: three
    // sequential AvailableNow runs share one checkpoint — run 1 sees
    // file 1, run 2 starts after file 2 lands (must process ONLY the new
    // file), run 3 has nothing new (must no-op). The sink must equal the
    // source exactly: a restart that re-reads file 1 duplicates rows, a
    // checkpoint that over-advances loses file 2 — either reddens the
    // hash.
    QueryDef(
      "q_checkpoint_recovery",
      Some("""SELECT event_id, user_id, event_type, value FROM events""".stripMargin),
      (s, dir) => {
        val base = tmp("graft-q-ckpt")
        val raw = s.read.parquet(s"$dir/events.parquet")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
        def land(name: String, flt: org.apache.spark.sql.Column): Unit = {
          raw.filter(flt).coalesce(1).write.parquet(s"$base/$name")
          val part = java.nio.file.Files.list(
              java.nio.file.Paths.get(s"$base/$name"))
            .filter(p => p.getFileName.toString.startsWith("part-") &&
              p.getFileName.toString.endsWith(".parquet"))
            .findFirst().get()
          java.nio.file.Files.copy(part,
            java.nio.file.Paths.get(s"$base/in/$name.parquet"))
        }
        def drain(): Unit = graft.streaming.IncrementalStream.runAvailableNow(
          s.readStream.schema(raw.schema).parquet(s"$base/in")
            .select("event_id", "user_id", "event_type", "value"),
          s"$base/chk", s"$base/out")
        land("f1", col("event_id") % 2 === 0)
        drain()                                   // run 1: file 1 only
        land("f2", col("event_id") % 2 === 1)
        drain()                                   // run 2 (restart): only f2 is new
        drain()                                   // run 3: nothing new, must no-op
        s.read.parquet(s"$base/out")
      }),

    // UPDATE output mode, gated: every append-mode gate emits a key once;
    // update mode re-emits a key's CURRENT aggregate in every batch that
    // changes it. Two mtime-ordered batches (evens then odds) over a
    // running count per event type ⇒ exactly two emissions per type:
    // the even-only count tagged batch 0, the full count tagged batch 1.
    // foreachBatch appends each update set with its batch id; an engine
    // that emitted finals only, or re-emitted unchanged keys, breaks the
    // row set.
    QueryDef(
      "q_stream_update",
      Some("""SELECT event_type, CAST(0 AS BIGINT) AS batch_id,
             |  CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n
             |FROM events GROUP BY event_type
             |UNION ALL
             |SELECT event_type, CAST(1 AS BIGINT) AS batch_id,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM events GROUP BY event_type""".stripMargin),
      (s, dir) => {
        val base = tmp("graft-q-supd")
        val raw = s.read.parquet(s"$dir/events.parquet")
        raw.filter(col("event_id") % 2 === 0)
          .coalesce(1).write.parquet(s"$base/s0")
        raw.filter(col("event_id") % 2 === 1)
          .coalesce(1).write.parquet(s"$base/s1")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
        Seq(("s0", 1000L), ("s1", 2000L)).foreach { case (sl, mtime) =>
          val part = java.nio.file.Files.list(
              java.nio.file.Paths.get(s"$base/$sl"))
            .filter(p => p.getFileName.toString.startsWith("part-") &&
              p.getFileName.toString.endsWith(".parquet"))
            .findFirst().get()
          val dest = java.nio.file.Paths.get(s"$base/in/$sl.parquet")
          java.nio.file.Files.copy(part, dest)
          java.nio.file.Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(mtime))
        }
        val counts = streamSession(s).readStream.schema(raw.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$base/in")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
        val q = counts.writeStream
          .outputMode("update")
          .option("checkpointLocation", s"$base/chk")
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
            df.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(s"$base/out")
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(s"$base/out")
          .select("event_type", "batch_id", "n")
      }),

    // LATE-DATA DROP rule, gated explicitly. Three mtime-ordered files
    // (FileStreamSource processes by (mtime, path)) become three
    // micro-batches: A = id%4==0, B = id%4==2, C = odd ids. Spark's
    // watermark propagation (pinned empirically by a micro-fixture this
    // round): a batch LATE-FILTERS with the PREVIOUS batch's watermark
    // and EVICTS with the current one — both derived from data seen
    // BEFORE the batch. So B (batch 1, late-filter watermark −∞) always
    // merges; C (batch 2, late-filter watermark = max(A)−30min) is
    // dropped exactly where its window end <= that; emission keeps the
    // pinned inclusive end <= final-watermark rule. A wrong engine —
    // filtering with the current watermark, or re-opening evicted
    // windows (duplicate emission) — reddens this row.
    QueryDef(
      "q_stream_late",
      Some("""WITH e AS (SELECT event_id, event_type, epoch_us(ts) AS tsu FROM events),
             |ev AS (SELECT *, tsu - tsu % 3600000000 AS win_start FROM e),
             |wa AS (SELECT max(tsu) - 1800000000 AS w FROM ev WHERE event_id % 4 = 0),
             |wmf AS (SELECT max(tsu) - 1800000000 AS w FROM ev),
             |acc AS (SELECT ev.* FROM ev, wa
             |  WHERE event_id % 2 = 0 OR win_start + 3600000000 > wa.w),
             |agg AS (SELECT win_start, event_type, CAST(count(*) AS BIGINT) AS n
             |  FROM acc GROUP BY 1, 2)
             |SELECT win_start AS win_start_us, event_type, n
             |FROM agg, wmf WHERE win_start + 3600000000 <= wmf.w""".stripMargin),
      (s, dir) => {
        val base = tmp("graft-q-slate")
        val raw = s.read.parquet(s"$dir/events.parquet")
        raw.filter(col("event_id") % 4 === 0)
          .coalesce(1).write.parquet(s"$base/s0")
        raw.filter(col("event_id") % 4 === 2)
          .coalesce(1).write.parquet(s"$base/s1")
        raw.filter(col("event_id") % 2 === 1)
          .coalesce(1).write.parquet(s"$base/s2")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
        Seq(("s0", 1000L), ("s1", 2000L), ("s2", 3000L)).foreach { case (sl, mtime) =>
          val part = java.nio.file.Files.list(
              java.nio.file.Paths.get(s"$base/$sl"))
            .filter(p => p.getFileName.toString.startsWith("part-") &&
              p.getFileName.toString.endsWith(".parquet"))
            .findFirst().get()
          val dest = java.nio.file.Paths.get(s"$base/in/$sl.parquet")
          java.nio.file.Files.copy(part, dest)
          // batch ORDER is the experiment: pin it via mtime
          java.nio.file.Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(mtime))
        }
        val agg = Tables.normalizeEventTs(
            streamSession(s).readStream.schema(raw.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(s"$base/in"))
          .withWatermark("ts", "30 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(unix_micros(col("window.start")).as("win_start_us"),
            col("event_type"), col("n"))
        graft.streaming.IncrementalStream.runAvailableNow(
          agg, s"$base/chk", s"$base/out")
        s.read.parquet(s"$base/out")
      }),

    // CUSTOM CROSS-BATCH STATE under the hash gate: a per-(user, day)
    // admission cap via flatMapGroupsWithState — admit the first 2 events
    // per key in event-time order, with the admitted count carried across
    // micro-batches in the state store. Staging puts every key's FIRST
    // event in file 1 and the rest in file 2 (per-key event-time order
    // preserved — the arrival shape of a pipeline draining one
    // rank-ordered landing file per run), so EVERY multi-event key spans
    // the batch boundary: batch 2 can only admit the correct second event
    // if batch 1's admission count survived the checkpoint. Oracle = the
    // batch row_number()<=2 twin, which only matches if that state works.
    QueryDef(
      "q_stream_ratelimit",
      Some("""SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM (
             |  SELECT event_id, user_id, ts, row_number() OVER (
             |    PARTITION BY user_id, date_trunc('day', ts)
             |    ORDER BY ts, event_id) AS rn
             |  FROM events) WHERE rn <= 2""".stripMargin),
      (s, dir) => {
        val base = tmp("graft-q-srate")
        // normalize BEFORE staging: slices carry a plain TIMESTAMP ts, so
        // the stream side needs no generation dispatch of its own
        val rn = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), to_date(col("ts")))
          .orderBy(col("ts"), col("event_id"))
        val norm = Tables.t(s, dir, "events")
          .select("event_id", "user_id", "ts")
          .withColumn("__rn", row_number().over(rn))
        norm.filter(col("__rn") === 1).drop("__rn")
          .coalesce(1).write.parquet(s"$base/s0")
        norm.filter(col("__rn") > 1).drop("__rn")
          .coalesce(1).write.parquet(s"$base/s1")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
        Seq(("s0", 1000L), ("s1", 2000L)).foreach { case (sl, mtime) =>
          val part = java.nio.file.Files.list(
              java.nio.file.Paths.get(s"$base/$sl"))
            .filter(p => p.getFileName.toString.startsWith("part-") &&
              p.getFileName.toString.endsWith(".parquet"))
            .findFirst().get()
          val dest = java.nio.file.Paths.get(s"$base/in/$sl.parquet")
          java.nio.file.Files.copy(part, dest)
          java.nio.file.Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(mtime))
        }
        val ss = streamSession(s)
        import ss.implicits._
        val stream = ss.readStream.schema(norm.drop("__rn").schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$base/in")
          .select(col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"),
            unix_micros(col("ts")).as("ts_us"), col("event_id"))
          .as[graft.streaming.RateLimit.Ev]
        val admitted = graft.streaming.RateLimit.admitFirstN(stream, 2)
        graft.streaming.IncrementalStream.runAvailableNow(
          admitted.toDF(), s"$base/chk", s"$base/out")
        s.read.parquet(s"$base/out")
          .select("event_id", "user_id", "ts_us")
      }),

    // Stream-static enrichment: the event stream joins a static broadcast
    // dimension mid-flight (the reference's per-row lookup enrich, done as
    // a join). Append mode, no aggregation — rows flow through enriched.
    QueryDef(
      "q_stream_enrich",
      Some("""SELECT e.event_id, e.user_id, c.c_mktsegment, e.value
             |FROM events e JOIN customer c ON e.user_id = c.c_custkey""".stripMargin),
      (s, dir) => {
        val base = tmp("graft-q-senrich")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
        Tables.stageFixture(s"$dir/events.parquet", s"$base/in/events")
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val dim = Tables.t(s, dir, "customer").select("c_custkey", "c_mktsegment")
        val enriched = s.readStream.schema(schema).parquet(s"$base/in")
          .join(broadcast(dim), col("user_id") === col("c_custkey"))
          .select("event_id", "user_id", "c_mktsegment", "value")
        graft.streaming.IncrementalStream.runAvailableNow(
          enriched, s"$base/chk", s"$base/out")
        s.read.parquet(s"$base/out")
      })
  )
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import graft.state.Cursor
  import graft.streaming.IncrementalStream
  import graft.tables.Warehouse

  test("StreamMerge absorbs redelivery: the same file landing twice changes nothing") {
    val base = Files.createTempDirectory("graft-smerge-re").toString
    val raw = spark.read.parquet(s"$sf/events.parquet")
    raw.limit(200).coalesce(1).write.parquet(s"$base/s0")
    Files.createDirectories(java.nio.file.Paths.get(s"$base/in"))
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$base/s0"))
      .filter(p => p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    // the SAME content delivered twice (two distinct files = two batches)
    Files.copy(part, java.nio.file.Paths.get(s"$base/in/a.parquet"))
    Files.copy(part, java.nio.file.Paths.get(s"$base/in/b.parquet"))
    val stream = Tables.normalizeEventTs(
        spark.readStream.schema(raw.schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$base/in"))
      .select("user_id", "event_id", "event_type", "value", "ts")
    val wh = new Warehouse(spark, s"$base/wh")
    graft.streaming.StreamMerge.runMergeLatest(stream, s"$base/chk", wh,
      "latest", Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
    val got = wh.read("latest")
    val expect = graft.ops.Relational.latestPerKey(
      Tables.normalizeEventTs(spark.read.parquet(s"$base/in/a.parquet"))
        .select("user_id", "event_id", "event_type", "value", "ts"),
      Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
    assert(got.count() == expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("IncrementalAgg: three partial merges equal the full-history aggregation") {
    val wh = new Warehouse(spark, Files.createTempDirectory("graft-iagg").toString)
    val ev = spark.read.parquet(s"$sf/events.parquet")
    def partial(m: Int) = ev.filter(col("event_id") % 3 === m)
      .groupBy("user_id")
      .agg(sum(col("value")).as("total"), count(lit(1)).as("n"))
    (0 to 2).foreach(m =>
      graft.tables.IncrementalAgg.mergePartials(wh, "agg", partial(m), Seq("user_id")))
    val got = wh.read("agg")
      .select(col("user_id"), round(col("total"), 2).as("total"), col("n"))
    val expect = ev.groupBy("user_id")
      .agg(round(sum(col("value")), 2).as("total"), count(lit(1)).as("n"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("cursor round-trips and advances atomically") {
    val dir = Files.createTempDirectory("graft-cur").toString
    val c = new Cursor(spark, s"$dir/wm")
    assert(c.value(-1L) == -1L)
    c.advance(42L)
    assert(c.value() == 42L)
    c.advance(99L)
    assert(c.value() == 99L)
  }

  test("batchIncrement ingests once, re-run is a no-op, new data flows") {
    val dir = Files.createTempDirectory("graft-inc").toString
    val wh = new Warehouse(spark, s"$dir/wh")
    val cur = new Cursor(spark, s"$dir/wm")
    val e = Tables.t(spark, sf, "events").select("event_id", "event_type", "value")
    val half = e.filter(col("event_id") < 500)
    assert(IncrementalStream.batchIncrement(half, "event_id", wh, "ev", cur) == 500)
    assert(IncrementalStream.batchIncrement(half, "event_id", wh, "ev", cur) == 0)
    assert(IncrementalStream.batchIncrement(e, "event_id", wh, "ev", cur) == 500)
    assert(wh.read("ev").count() == 1000)
    assert(cur.value() == 999L)
  }

  test("streaming dedup keeps one row per content hash within the horizon") {
    import graft.streaming.StreamDedup
    val dir = Files.createTempDirectory("graft-sdd").toString
    // duplicate every doc: same text, shifted event time within the horizon
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"),
        timestamp_seconds(lit(1700000000L) + col("doc_id")).as("ts"))
    docs.union(docs.withColumn("doc_id", col("doc_id") + 1000000L))
      .write.parquet(s"$dir/src")
    val schema = spark.read.parquet(s"$dir/src").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/src")
    val deduped = StreamDedup.dedupStream(stream, "text", "ts")
    StreamDedup.runAvailableNow(deduped, s"$dir/cp", s"$dir/out")
    val out = spark.read.parquet(s"$dir/out")
    val distinctHashes = docs
      .select(sha2(graft.dedup.Dedup.normalized(col("text")), 256)).distinct().count()
    assert(out.count() == distinctHashes,
      s"expected $distinctHashes unique docs, got ${out.count()}")
    assert(out.select("content_hash").distinct().count() == out.count())
  }

  test("availableNow streaming drains the events table into windowed aggs") {
    val dir = Files.createTempDirectory("graft-stream").toString
    // FileStreamSource requires a directory — stage the single-file fixture
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/src"))
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$dir/src/events.parquet"))
    val (agg, cp) = IncrementalStream.availableNowWindowed(
      spark, s"$dir/src", s"$dir/cp")
    IncrementalStream.runAvailableNow(agg, cp, s"$dir/out")
    val out = spark.read.parquet(s"$dir/out")
    assert(out.columns.toSet ==
      Set("window_start", "event_type", "n", "total_value"))
    // append mode emits only watermark-closed windows; the tail window
    // (≤ watermark delay of data) legitimately stays open
    val streamed = out.agg(sum("n")).first().getLong(0)
    assert(streamed > 900L && streamed <= 1000L, s"streamed=$streamed")
    // exactly-once: re-running against the same checkpoint adds nothing
    val (agg2, _) = IncrementalStream.availableNowWindowed(
      spark, s"$dir/src", s"$dir/cp")
    IncrementalStream.runAvailableNow(agg2, cp, s"$dir/out")
    val streamed2 = spark.read.parquet(s"$dir/out").agg(sum("n")).first().getLong(0)
    assert(streamed2 == streamed)
  }

  test("q_stream_ratelimit: caps hold and multi-event keys span both batches") {
    val out = q("q_stream_ratelimit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // never more than 2 admitted per (user, utc-day)
    val byKey = out.groupBy { case (_, uid, tsUs) =>
      (uid, tsUs / 86400000000L)
    }
    assert(byKey.values.forall(_.length <= 2), "cap exceeded")
    // staging puts rank-1 events in batch 1 and the rest in batch 2, so
    // every key with 2 admitted events crossed the batch boundary — there
    // must be MANY of them or cross-batch state went untested
    val spanned = byKey.values.count(_.length == 2)
    assert(spanned > 0,
      "no (user, day) admitted 2 events — cross-batch state untested")
    // and those keys' second event must be the true rank-2 event: the
    // raw twin says how many events each key really has
    val raw = Tables.t(spark, sf, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .count().filter(col("count") >= 2).count()
    assert(spanned == raw,
      s"$spanned keys admitted 2 events but $raw keys have >=2 raw events")
  }

  test("reverse-ETL property maps reduce deterministically and batch out") {
    import graft.reverse.BatchSink
    val e = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_type").as("prop"),
        col("value").cast("string").as("v"))
    val maps = BatchSink.propertyMaps(e, "user_id", "prop", "v")
    assert(maps.count() == e.select("user_id").distinct().count())
    val posted = new java.util.concurrent.atomic.AtomicInteger(0)
    val nBatches = BatchSink.postBatches(maps, 10,
      rows => { assert(rows.nonEmpty && rows.size <= 10); posted.incrementAndGet() })
    assert(nBatches >= (maps.count() / 10))
  }

  test("incremental dedup: batch re-run is idempotent (index + pair set unchanged)") {
    import graft.dedup.IncrementalDedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val wh = new Warehouse(spark, Files.createTempDirectory("graft-incdd").toString)
    IncrementalDedup.seedIndex(wh, "dd",
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
    val batch = docs.filter(col("doc_id") % 10 === 0)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val run1 = pairSet(IncrementalDedup.processBatch(wh, "dd", batch, "doc_id", "text"))
    val sigN = wh.read("dd_sig").count()
    val bandN = wh.read("dd_bands").count()
    // at-least-once redelivery: the SAME batch lands again
    val run2 = pairSet(IncrementalDedup.processBatch(wh, "dd", batch, "doc_id", "text"))
    assert(wh.read("dd_sig").count() == sigN, "re-run grew the signature index")
    assert(wh.read("dd_bands").count() == bandN, "re-run grew the band index")
    assert(run1 == run2, s"re-run changed the pair set: ${run1.diff(run2)} / ${run2.diff(run1)}")
    assert(run1.nonEmpty, "fixture produced no near-dup pairs — test is vacuous")
    // every emitted pair has at least one batch side and is canonical
    assert(run1.forall { case (a, b, _) => a < b && (a % 10 == 0 || b % 10 == 0) })
  }

  test("incremental dedup small batch: index side never shuffles; equals the shuffle plan") {
    import graft.dedup.IncrementalDedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // floor 0 engages the broadcast path on the tiny fixture index (the
    // default 1 GB floor correctly keeps toy indexes on the shuffle
    // plan): the emitted-pairs plan must probe the index with broadcast
    // joins only — zero index-side shuffle (r19 verdict #2)
    val whA = new Warehouse(spark,
      Files.createTempDirectory("graft-incdd-bc").toString)
    IncrementalDedup.seedIndex(whA, "dd", corpus, "doc_id", "text")
    spark.conf.set(IncrementalDedup.BroadcastMinIndexBytesConf, "0")
    val small = try IncrementalDedup.processBatch(whA, "dd", batch,
      "doc_id", "text")
    finally spark.conf.unset(IncrementalDedup.BroadcastMinIndexBytesConf)
    val plan = small.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"),
      s"small-batch probe must not shuffle the index:\n$plan")
    // key bound 0 forces the bulk shuffle plan — identical pair set
    val whB = new Warehouse(spark,
      Files.createTempDirectory("graft-incdd-sh").toString)
    IncrementalDedup.seedIndex(whB, "dd", corpus, "doc_id", "text")
    spark.conf.set(IncrementalDedup.BroadcastKeysConf, "0")
    try {
      // (no SortMergeJoin assertion on the bulk path: at fixture scale
      // the optimizer auto-broadcasts the tiny index, which is correct —
      // the flag only STOPS forcing broadcasts, it doesn't forbid them)
      val bulk = IncrementalDedup.processBatch(whB, "dd", batch,
        "doc_id", "text")
      assert(pairSet(bulk) == pairSet(small),
        "broadcast and shuffle paths must emit identical pairs")
    } finally spark.conf.unset(IncrementalDedup.BroadcastKeysConf)
  }

  test("incremental dedup: fused bootstrap equals seedIndex-then-processBatch") {
    import graft.dedup.IncrementalDedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val whA = new Warehouse(spark,
      Files.createTempDirectory("graft-incdd-a").toString)
    IncrementalDedup.seedIndex(whA, "dd", corpus, "doc_id", "text")
    val twoStep = pairSet(
      IncrementalDedup.processBatch(whA, "dd", batch, "doc_id", "text"))
    val whB = new Warehouse(spark,
      Files.createTempDirectory("graft-incdd-b").toString)
    val fused = pairSet(
      IncrementalDedup.bootstrap(whB, "dd", corpus, batch, "doc_id", "text"))
    assert(fused == twoStep,
      s"bootstrap diverged: ${fused.diff(twoStep)} / ${twoStep.diff(fused)}")
    assert(fused.nonEmpty, "fixture produced no near-dup pairs — vacuous")
    // the fused path leaves the SAME persisted index behind
    for (t <- Seq("dd_sig", "dd_bands")) {
      val a = whA.read(t); val b = whB.read(t)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$t differs between fused and two-step")
    }
  }

  test("sliding windows contain their aligned tumbling windows") {
    val slide = q("q_stream_sliding").collect()
      .map(r => (r.getAs[Long]("win_start_us"), r.getAs[String]("event_type"))
        -> r.getAs[Long]("n")).toMap
    val tumble = q("q_stream_window").collect()
      .map(r => (r.getAs[Long]("win_start_us"), r.getAs[String]("event_type"))
        -> r.getAs[Long]("n")).toMap
    assert(slide.nonEmpty && tumble.nonEmpty)
    // a 2h window starting at w covers the 1h tumbling window at w, so
    // wherever both were emitted the sliding count dominates
    val both = slide.keySet intersect tumble.keySet
    assert(both.nonEmpty, "no aligned windows emitted by both queries")
    for (k <- both)
      assert(slide(k) >= tumble(k), s"$k: sliding ${slide(k)} < tumbling ${tumble(k)}")
    // overlap factor: each event lands in exactly two sliding windows,
    // so total mass is ≤ 2× the event count (strictly less: tail cutoff)
    val events = Tables.t(spark, sf, "events").count()
    assert(slide.values.sum <= 2 * events)
  }
}

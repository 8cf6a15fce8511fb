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

  test("daily curation composes: cursor → paragraph-incr → semantic-incr → reassemble → idempotent append") {
    import graft.dedup.ParagraphDedup
    import graft.pipelines.Curation
    import graft.sim.SemDedup
    import graft.state.Cursor
    // documents with a deterministic embedding per doc (doc_id % nVec →
    // fixture vector, so docs sharing a vector are exact semantic dups —
    // both stages get exercised)
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val nv = emb.count()
    val src = docs.join(
        emb.select(col("vec_id").as("k"), col("embedding")),
        docs("doc_id") % nv === col("k"))
      .select("doc_id", "text", "embedding").localCheckpoint()
    val maxId = src.agg(max("doc_id")).first().getLong(0)
    val (w0, w1) = (maxId * 3 / 5, maxId * 4 / 5)
    val root = Files.createTempDirectory("graft-cure2e").toString
    val wh = new Warehouse(spark, root)
    val cur = new Cursor(spark, s"$root/c.cursor")
    val c = new Curation(spark, wh, cur, "cur", "doc_id", "text",
      sepRegex = " the ", joinSep = " | ",
      vecCol = Some("embedding"), semThreshold = 0.3, semCap = 8)
    assert(c.bootstrap(src.filter(col("doc_id") <= w0)) == cur.value())
    val n1 = c.runDay(src.filter(col("doc_id") <= w1))
    val n2 = c.runDay(src)
    assert(n1 > 0 && n2 > 0 && cur.value() == maxId)
    // a third run after success is a no-op (empty batch, nothing written)
    val cleanBefore = c.clean.count()
    assert(c.runDay(src) == 0 && c.clean.count() == cleanBefore)
    // hash assertions vs the DIRECT operators, replayed day by day
    def vs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
      .toSet
    val wh2 = new Warehouse(spark, Files.createTempDirectory("cure2d").toString)
    val corpus = src.filter(col("doc_id") <= w0)
    ParagraphDedup.seedIndex(wh2, "d", corpus, "doc_id", "text", " the ")
    SemDedup.seedIndex(wh2, "d", corpus.select("doc_id", "embedding"),
      "doc_id", "embedding", cap = 8)
    def day(batch: org.apache.spark.sql.DataFrame) = {
      val v = ParagraphDedup.processBatch(wh2, "d", batch, "doc_id",
        "text", " the ")
      val clean = ParagraphDedup.reassembleWith(batch, v, "doc_id",
        "text", " the ", " | ")
      val keep = SemDedup.processBatch(wh2, "d",
          batch.select("doc_id", "embedding"), "doc_id", "embedding",
          threshold = 0.3, cap = 8)
        .filter(col("keep")).select("doc_id")
      clean.join(keep, Seq("doc_id"), "left_semi").localCheckpoint()
    }
    val d1 = day(src.filter(col("doc_id") > w0 && col("doc_id") <= w1))
    val d2 = day(src.filter(col("doc_id") > w1))
    val expected = vs(d1.unionByName(d2))
    assert(vs(c.clean) == expected,
      "pipeline clean table must equal the direct per-day operator replay")
    assert(expected.size < n1 + n2,
      "semantic stage must drop at least one duplicate document")
    // crash replay: cursor rolled back to the day-1 watermark (crash
    // between append and advance) — the batch reprocesses, the
    // idempotent-by-key writes leave every table unchanged
    cur.advance(w1)
    assert(c.runDay(src) == n2)
    assert(vs(c.clean) == expected, "crash replay must be a no-op by key")
  }

  test("curation routes the coarse bootstrap and the compaction cadence (r19 verdict #1)") {
    import graft.dedup.ParagraphDedup
    import graft.pipelines.Curation
    import graft.sim.SemDedup
    import graft.state.Cursor
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val nv = emb.count()
    val src = docs.join(
        emb.select(col("vec_id").as("k"), col("embedding")),
        docs("doc_id") % nv === col("k"))
      .select("doc_id", "text", "embedding").localCheckpoint()
    val maxId = src.agg(max("doc_id")).first().getLong(0)
    val (w0, w1) = (maxId * 3 / 5, maxId * 4 / 5)
    // pipeline: semCoarseSeedAbove = 0 forces the fourth-decade bootstrap
    // (seedIndexCoarse); semCompactEvery = 1 compacts after every day
    val root = Files.createTempDirectory("graft-cureC").toString
    val wh = new Warehouse(spark, root)
    val cur = new Cursor(spark, s"$root/c.cursor")
    val c = new Curation(spark, wh, cur, "cur", "doc_id", "text",
      sepRegex = " the ", joinSep = " | ",
      vecCol = Some("embedding"), semThreshold = 0.3, semCap = 8,
      semCoarseSeedAbove = 0L, semCompactEvery = 1)
    c.bootstrap(src.filter(col("doc_id") <= w0))
    val n1 = c.runDay(src.filter(col("doc_id") <= w1))
    val n2 = c.runDay(src)
    assert(n1 > 0 && n2 > 0)
    // direct-operator replay: seedIndexCoarse-bootstrapped, NO compaction
    // — equality is both claims at once (coarse-bootstrapped runDay
    // verdicts match the direct replay; interleaved compaction is
    // verdict-invariant)
    def vs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
      .toSet
    val wh2 = new Warehouse(spark, Files.createTempDirectory("cureCd").toString)
    val corpus = src.filter(col("doc_id") <= w0)
    ParagraphDedup.seedIndex(wh2, "d", corpus, "doc_id", "text", " the ")
    SemDedup.seedIndexCoarse(wh2, "d", corpus.select("doc_id", "embedding"),
      "doc_id", "embedding", cap = 8)
    def day(batch: org.apache.spark.sql.DataFrame) = {
      val v = ParagraphDedup.processBatch(wh2, "d", batch, "doc_id",
        "text", " the ")
      val clean = ParagraphDedup.reassembleWith(batch, v, "doc_id",
        "text", " the ", " | ")
      val keep = SemDedup.processBatch(wh2, "d",
          batch.select("doc_id", "embedding"), "doc_id", "embedding",
          threshold = 0.3, cap = 8)
        .filter(col("keep")).select("doc_id")
      clean.join(keep, Seq("doc_id"), "left_semi").localCheckpoint()
    }
    val d1 = day(src.filter(col("doc_id") > w0 && col("doc_id") <= w1))
    val d2 = day(src.filter(col("doc_id") > w1))
    assert(vs(c.clean) == vs(d1.unionByName(d2)),
      "coarse-bootstrapped + compacting pipeline must equal the direct replay")
    // the cadence actually ran: reps bound restored after the final day
    val cells = wh.read("cur_centroids").count()
    assert(wh.read("cur_reps").count() <= 8L * cells,
      "compaction cadence must restore the cap*cells reps bound")
    // id-type contract (r19 advice #2): a non-integral id fails fast
    val bad = new Curation(spark,
      new Warehouse(spark, Files.createTempDirectory("cureBad").toString),
      new Cursor(spark, s"$root/bad.cursor"), "b", "doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      bad.bootstrap(src.withColumn("doc_id", col("doc_id").cast("string")))
    }
    assert(err.getMessage.contains("integral"))
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

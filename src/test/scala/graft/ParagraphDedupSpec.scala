package graft

import org.apache.spark.sql.functions._

import graft.dedup.ParagraphDedup

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  test("lowest (doc, idx) occurrence of each normalized paragraph is the one kept") {
    val docs = Seq(
      (1L, "Hello  world\n\nsecond para\n\nhello world"),
      (2L, "second para\n\nunique two"),
      (3L, "HELLO WORLD")).toDF("doc_id", "text")
    val out = ParagraphDedup.paragraphDedup(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getBoolean(2))
      .toMap
    // "hello world" normalizes identically in (1,0), (1,2), (3,0) —
    // only the lowest (doc, idx) survives
    assert(out((1L, 0)) && !out((1L, 2)) && !out((3L, 0)))
    // "second para" first occurs at (1,1); (2,0) is a cross-document dup
    assert(out((1L, 1)) && !out((2L, 0)))
    assert(out((2L, 1)), "unique paragraphs are kept")
    assert(out.size == 6, "one row per non-empty paragraph")
  }

  test("whitespace-only paragraphs are dropped but still consume an index") {
    val docs = Seq((7L, "a\n\n   \n\na")).toDF("doc_id", "text")
    val out = ParagraphDedup.paragraphDedup(docs, "doc_id", "text")
      .collect().map(r => (r.getInt(1), r.getBoolean(2))).toMap
    // the blank middle paragraph yields no row, and the trailing dup of
    // "a" sits at ORIGINAL index 2 (indices address the raw split)
    assert(out == Map(0 -> true, 2 -> false))
  }

  test("reassemble: kept paragraphs rejoin in order; fully-dropped docs emit empty text") {
    val docs = Seq(
      (1L, "alpha one\n\nbeta two\n\nalpha one"),
      (2L, "beta two"),
      (3L, "gamma three\n\nalpha one")).toDF("doc_id", "text")
    val out = ParagraphDedup.reassemble(docs, "doc_id", "text",
        joinSep = " | ")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getString(3)))).toMap
    def h(s: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 1 keeps both firsts; its trailing dup of "alpha one" is dropped
    assert(out(1L) == ((2L, "alpha one | beta two".length,
      h("alpha one | beta two"))))
    // doc 2's only paragraph is a cross-doc dup → empty clean text
    assert(out(2L) == ((0L, 0, h(""))))
    // doc 3 keeps only its unique paragraph
    assert(out(3L) == ((1L, "gamma three".length, h("gamma three"))))
  }

  test("incremental index: corpus owners win, batch re-run is idempotent") {
    import graft.tables.Warehouse
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-pincr").toString)
    ParagraphDedup.seedIndex(wh, "pd",
      docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", " the ")
    val batch = docs.filter(col("doc_id") % 10 === 0)
    def verdictSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    val run1 = verdictSet(
      ParagraphDedup.processBatch(wh, "pd", batch, "doc_id", "text", " the "))
    val idxN = wh.read("pd_paras").count()
    val run2 = verdictSet(
      ParagraphDedup.processBatch(wh, "pd", batch, "doc_id", "text", " the "))
    assert(wh.read("pd_paras").count() == idxN, "re-run grew the index")
    assert(run1 == run2, "re-run changed the verdict set")
    assert(run1.exists(!_._3) && run1.exists(_._3),
      "fixture must exercise both keep and drop verdicts")
    // independent corpus-FIRST reference (arrival order beats global id
    // order: an already-indexed corpus owner wins even against a
    // lower-(doc,idx) batch occurrence — the defining incremental rule,
    // and exactly what the oracle SQL ranks)
    import org.apache.spark.sql.expressions.Window
    val paras = docs.select(col("doc_id"),
        posexplode(split(col("text"), " the ")).as(Seq("para_idx", "p")))
      .withColumn("np", graft.dedup.Dedup.normalized(col("p")))
      .filter(length(col("np")) > 0)
    val w = Window.partitionBy("np")
      .orderBy((col("doc_id") % 10 === 0).asc, col("doc_id"), col("para_idx"))
    val expected = verdictSet(paras
      .withColumn("rn", row_number().over(w))
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("para_idx"), (col("rn") === 1).as("keep")))
    assert(run1 == expected,
      "incremental verdicts must equal the corpus-first rank")
  }

  test("sequenced batches compose: day 2 respects day-1 owners; epoch order is observable") {
    import graft.tables.Warehouse
    // "shared" appears in BOTH batches; "b1only"/"b2only" in one each;
    // "corp" is pre-owned by the corpus
    val corpus = Seq((1L, "corp")).toDF("doc_id", "text")
    val b1 = Seq((5L, "b1only\n\nshared\n\ncorp")).toDF("doc_id", "text")
    val b2 = Seq((10L, "shared\n\nb2only")).toDF("doc_id", "text")
    def runSeq(first: org.apache.spark.sql.DataFrame,
        second: org.apache.spark.sql.DataFrame) = {
      val wh = new Warehouse(spark,
        java.nio.file.Files.createTempDirectory("graft-pseq").toString)
      ParagraphDedup.seedIndex(wh, "pd", corpus, "doc_id", "text")
      def vs(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getBoolean(2)).toMap
      (vs(ParagraphDedup.processBatch(wh, "pd", first, "doc_id", "text")),
        vs(ParagraphDedup.processBatch(wh, "pd", second, "doc_id", "text")))
    }
    val (v1, v2) = runSeq(b1, b2)
    // day 1: owns its new digests, loses to the corpus on "corp"
    assert(v1 == Map((5L, 0) -> true, (5L, 1) -> true, (5L, 2) -> false))
    // day 2: "shared" was claimed by B1 YESTERDAY — the composition rule
    assert(v2 == Map((10L, 0) -> false, (10L, 1) -> true))
    // swapped epochs: ownership of "shared" moves to B2's occurrence and
    // nothing else changes — epoch order is observable exactly there
    val (w1, w2) = runSeq(b2, b1)
    assert(w1 == Map((10L, 0) -> true, (10L, 1) -> true))
    assert(w2 == Map((5L, 0) -> true, (5L, 1) -> false, (5L, 2) -> false))
  }

  test("dedup is corpus-linear in plan shape: one hash aggregate, no window, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sp = ParagraphDedup.paragraphDedup(docs, "doc_id", "text", " the ")
      .queryExecution.sparkPlan
    val s = sp.toString
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"), s)
    val windows = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s)
  }
}

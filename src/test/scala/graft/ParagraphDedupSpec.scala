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

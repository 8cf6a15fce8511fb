package graft

import graft.dedup.ExactSubstr

/** ExactSubstr on hand-built docs where the duplicated spans are known by
  * construction: cross-doc repeats, within-doc repeats, clean docs.
  */
class SubstrSpec extends SparkSpec {
  import spark.implicits._

  private val S = "abcdefghijklmnopqrstuvwxyz0123" // 30 chars, no self-repeat

  test("cross-doc repeated substring produces one maximal span per side") {
    val docs = Seq(
      (1L, "1111111111" + S + "2222222222"),
      (2L, "3333333333" + S + "4444444444"),
      (3L, "this text appears nowhere else at all !!")).toDF("doc_id", "text")
    val out = ExactSubstr.spanStats(docs, "doc_id", "text", minMatch = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    // S sits at chars 11..40 of each padded doc; its interior 20-grams are
    // the shared ones (pad-straddling grams are unique per doc) → exactly
    // the 30 chars of S are covered, merged into ONE span of 11 positions
    assert(out(1L) == ((11L, 1, 30L, 20L)), out(1L).toString)
    assert(out(2L) == ((11L, 1, 30L, 20L)), out(2L).toString)
    assert(out(3L)._2 == 0 && out(3L)._3 == 0L, out(3L).toString)
  }

  test("within-doc repeats count (as in Lee et al.) and merge per occurrence") {
    val t = "qwertyuiopasdfghjklzxcvbn" // 25 chars
    val docs = Seq((1L, t + "0000000000" + t)).toDF("doc_id", "text")
    val out = ExactSubstr.spanStats(docs, "doc_id", "text", minMatch = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    // each T occurrence contributes 6 repeated positions (25−20+1) merged
    // into one 25-char span → 2 spans, 50 covered chars, 12 dup positions
    assert(out(1L) == ((12L, 2, 50L, 10L)), out(1L).toString)
  }

  test("docs shorter than minMatch report zeros, not errors") {
    val docs = Seq((1L, "short"), (2L, "")).toDF("doc_id", "text")
    val out = ExactSubstr.spanStats(docs, "doc_id", "text", minMatch = 20)
      .collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getInt(2) == 0 && r.getLong(3) == 0L))
  }
}

package graft

import graft.text.Bpe

/** BPE learn/apply on a hand-built corpus with KNOWN merges — the oracle
  * gate proves engine parity on the fixture; this pins the semantics on
  * inputs where the right answer is computable by hand: frequency-ordered
  * merge selection, greedy left-to-right non-overlapping application, and
  * rank-ordered replay.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learn picks the heaviest pair; application is greedy left-to-right") {
    val docs = Seq((1L, "aaaa aaaa aaaa ab")).toDF("doc_id", "text")
    val merges = Bpe.learn(Bpe.wordTable(docs, "text"), 2)
    // pair (a,a) occurs 3× inside each "aaaa" (greedy counting of the
    // 4-symbol word) × 3 words = 9; (a,b) once
    assert(merges(0).pair == "|a| |a|" && merges(0).merged == "|aa|" &&
      merges(0).weight == 9L, merges(0).toString)
    // after merge 1, "aaaa" is |aa| |aa| (non-overlapping application:
    // 4 a's collapse to TWO aa symbols, not three overlapping ones)
    assert(merges(1).pair == "|aa| |aa|" && merges(1).merged == "|aaaa|" &&
      merges(1).weight == 3L, merges(1).toString)
    val enc = Bpe.encode(docs, "doc_id", "text", merges).collect()
    assert(enc.length == 1)
    // aaaa → 1 token ×3 words, ab → |a| |b| = 2 tokens
    assert(enc(0).getLong(1) == 4L && enc(0).getLong(2) == 5L, enc(0).toString)
  }

  test("deterministic tie-break: equal-weight pairs resolve by pair string") {
    // "bc" and "ab" each occur once → pairs (b,c) and (a,b) tie at 1;
    // "|a| |b|" < "|b| |c|" in ASCII, so (a,b) must win every run
    val docs = Seq((1L, "ab bc")).toDF("doc_id", "text")
    val merges = Bpe.learn(Bpe.wordTable(docs, "text"), 1)
    assert(merges.head.pair == "|a| |b|", merges.head.toString)
  }

  test("learn stops when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(Bpe.learn(Bpe.wordTable(docs, "text"), 5).isEmpty)
  }

  test("batched learn equals the sequential reference, in fewer rounds") {
    // A corpus with several symbol-disjoint frequent pairs (so batching
    // has something to batch) AND overlapping-pair traps: "th"/"he"
    // share |h| — the batch must stop there, not take both, because
    // merging (t,h) births (th,e) whose weight can outrank later picks.
    val docs = Seq(
      (1L, "the the the then hen queen queen quick quick quick brown fox"),
      (2L, "jumps over over over the lazy lazy dog dog dog dog end"),
      (3L, "zw zw zw zw zw yx yx yx yx vu vu vu the queen of dogs")
    ).toDF("doc_id", "text")
    val words = Bpe.wordTable(docs, "text")
    val seq16 = Bpe.learnSequential(words, 16)
    val (bat16, rounds) = Bpe.learnBatched(words, 16)
    assert(bat16 == seq16,
      s"batched diverged:\n  seq=$seq16\n  bat=$bat16")
    assert(rounds < seq16.size,
      s"batching saved nothing: $rounds rounds for ${seq16.size} merges")
    // tiny probe window still has to be exact — the horizon w_stop path
    val (bat3, _) = Bpe.learnBatched(words, 16, probe = 3)
    assert(bat3 == seq16, s"probe=3 diverged:\n  seq=$seq16\n  bat=$bat3")
  }
}

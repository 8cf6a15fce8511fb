package graft

import graft.text.{TextStats, Tfidf}

/** Hand-computed fixtures for the retrieval/quality scorers — catches
  * formula regressions without the DuckDB oracle in the loop.
  */
class TextScoreSpec extends SparkSpec {

  test("bm25 matches a hand-computed two-doc corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cat dog cat"),          // dl=3, tf(cat)=2
      (2L, "dog bird bird bird")    // dl=4, tf(cat)=0
    ).toDF("doc_id", "text")
    val got = Tfidf.bm25(docs, "doc_id", "text", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=2, df=1, avgdl=3.5, idf=ln(1+(2-1+0.5)/1.5)=ln(2)
    // doc1: ln(2)*(2*2.2)/(2+1.2*(0.25+0.75*3/3.5)) = ln2*4.4/3.0714285714...
    val expected = math.log(2.0) * 4.4 / (2 + 1.2 * (0.25 + 0.75 * 3 / 3.5))
    assert(math.abs(got(1L) - expected) < 5e-5)
    assert(got(2L) == 0.0)
  }

  test("jsDivergence: identical slices at 0, disjoint slices emit no row") {
    import spark.implicits._
    val docs = Seq(
      ("a", "x y z"), ("b", "x y z"),      // identical distributions
      ("c", "p q r")                        // disjoint from both
    ).toDF("src", "text")
    val got = graft.text.DistShift.jsDivergence(docs, "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("a", "b")) == 0.0)
    // disjoint pairs (JS = exactly 1 bit) are documented as absent
    assert(!got.contains(("a", "c")) && !got.contains(("b", "c")))
  }

  test("charEntropy: uniform, degenerate and empty cases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcd"),   // 4 distinct, uniform -> 2 bits
      (2L, "aaaa"),   // 1 char -> 0 bits
      (3L, "  ")      // normalizes to empty -> dropped
    ).toDF("doc_id", "text")
    val got = TextStats.charEntropy(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got(1L) == ((4, 2.0)))
    assert(got(2L) == ((1, 0.0)))
    assert(!got.contains(3L))
  }
}

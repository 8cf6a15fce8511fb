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

  test("q_textrank: conserved positive distribution over the bigram vocab") {
    import org.apache.spark.sql.functions._
    val rows = q("q_textrank").collect()
    assert(rows.nonEmpty)
    // teleport conserves rank mass exactly (every node has out-edges in
    // the symmetrized graph): Σr stays 1 through every iteration; the
    // only slack is the round(…,6) on output
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < rows.length * 5e-7 + 1e-9,
      s"rank mass $total")
    assert(rows.forall(_.getDouble(1) > 0), "non-positive rank")
    // node set == words that appear in at least one bigram, recomputed
    // driver-side from the raw text
    val nodes = Tables.t(spark, sf, "documents")
      .select(split(graft.dedup.Dedup.normalized(col("text")), " ")
        .as("toks")).collect()
      .flatMap(_.getSeq[String](0).sliding(2).filter(p =>
        p.length == 2 && p(0).nonEmpty && p(1).nonEmpty))
      .flatten.toSet
    assert(rows.map(_.getString(0)).toSet == nodes)
  }

  test("q_kneser_ney matches a driver-side recompute; mass bounded by 1") {
    val rows = q("q_kneser_ney").collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2),
        r.getDouble(3)))).toMap
    assert(rows.nonEmpty)
    val counts = rows.map { case ((w1, w2), (c, _)) => (w1, w2, c) }.toSeq
    val tw = counts.groupBy(_._1).map { case (k, v) =>
      k -> (v.map(_._3).sum, v.size) }
    val n1b = counts.groupBy(_._2).map { case (k, v) => k -> v.size }
    val bb = counts.size.toDouble
    for (((w1, w2), (c, got)) <- rows) {
      val (t, n1f) = tw(w1)
      val exp = math.max(c - 0.75, 0.0) / t +
        (0.75 / t) * n1f * (n1b(w2) / bb)
      assert(math.abs(got - exp) <= 5e-7 + 1e-12, s"($w1,$w2): $got vs $exp")
    }
    // observed-bigram mass per w1 never exceeds 1 (the remainder is the
    // smoothing mass KN reserves for unseen continuations)
    for ((w1, group) <- rows.groupBy(_._1._1)) {
      val mass = group.values.map(_._2).sum
      assert(mass <= 1.0 + group.size * 5e-7, s"$w1 mass $mass")
    }
  }
}

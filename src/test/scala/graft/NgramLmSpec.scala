package graft

import org.apache.spark.sql.functions._

import graft.text.NgramLm

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("bigram perplexity matches a driver-side exact reference") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the cat"),
      (3L, "dogs bark dogs bark dogs"),
      (4L, "the mat sat")).toDF("doc_id", "text")
    val k = 0.5
    // reference model built exactly as documented
    val toksOf = (s: String) => s.toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ").toSeq
    val corpus = Seq(1L -> "the cat sat on the mat",
      2L -> "the cat sat on the cat", 3L -> "dogs bark dogs bark dogs",
      4L -> "the mat sat")
    val bigrams = corpus.flatMap { case (id, t) =>
      val w = toksOf(t); w.indices.dropRight(1).map(i => (id, i, w(i), w(i + 1)))
    }
    val c12 = bigrams.groupBy(b => (b._3, b._4)).view.mapValues(_.size).toMap
    val c1 = bigrams.groupBy(_._3).view.mapValues(_.size).toMap
    val v = bigrams.map(_._4).distinct.size
    val expected = corpus.map { case (id, t) =>
      val bs = bigrams.filter(_._1 == id).sortBy(_._2)
      val lps = bs.map { case (_, _, w1, w2) =>
        math.log((c12((w1, w2)) + k) / (c1(w1) + k * v)) }
      val sum = lps.foldLeft(0.0)(_ + _)
      id -> BigDecimal(math.exp(-sum / lps.size))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = NgramLm.bigramPerplexity(docs, "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.get(2))).toMap
    for ((id, ppl) <- expected) {
      val (n, gp) = got(id)
      assert(n == toksOf(corpus.find(_._1 == id).get._2).size - 1)
      assert(math.abs(gp.asInstanceOf[Double] - ppl) < 1e-9, s"doc $id: $gp vs $ppl")
    }
  }

  test("documents with fewer than two tokens stay in the domain with NULL ppl") {
    val docs = Seq((1L, "one"), (2L, ""), (3L, "two words here"))
      .toDF("doc_id", "text")
    val got = NgramLm.bigramPerplexity(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.length == 3)
    assert(got(0).getLong(1) == 0 && got(0).isNullAt(2))
    assert(got(1).getLong(1) == 0 && got(1).isNullAt(2))
    assert(got(2).getLong(1) == 2 && !got(2).isNullAt(2))
  }

  test("in-distribution repetition scores lower perplexity than out-of-vocab noise") {
    val base = (1 to 30).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val noise = Seq((100L, "zq xv qqj wkp zzv mrg hhx bbn vvk ljq"))
    val docs = (base ++ noise).toDF("doc_id", "text")
    val got = NgramLm.bigramPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) < got(100L),
      s"repeated prose ${got(1L)} must beat gibberish ${got(100L)}")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.text.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("importance weights match a driver-side exact reference") {
    val corpus = Seq(
      (1L, "alpha beta alpha", true),
      (2L, "alpha beta gamma", true),
      (3L, "delta epsilon zeta", false),
      (4L, "alpha delta beta", false))
    val docs = corpus.toDF("doc_id", "text", "tgt")
    val B = 64
    def sha60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(15), 16)
    }
    val toks = corpus.map { case (id, t, g) =>
      (id, g, t.split(" ").toSeq.map(w => sha60(w) % B)) }
    val ct = toks.filter(_._2).flatMap(_._3).groupBy(identity)
      .view.mapValues(_.size).toMap
    val cs = toks.flatMap(_._3).groupBy(identity)
      .view.mapValues(_.size).toMap
    val nt = toks.filter(_._2).map(_._3.size).sum
    val ns = toks.map(_._3.size).sum
    val expected = toks.map { case (id, _, bs) =>
      val lw = bs.map(b => math.log((ct.getOrElse(b, 0) + 1.0) / (nt + B))
        - math.log((cs(b) + 1.0) / (ns + B))).foldLeft(0.0)(_ + _)
      id -> BigDecimal(lw).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }.toMap
    val got = Dsir.importanceWeights(docs, "doc_id", "text", col("tgt"), B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    for ((id, lw) <- expected) {
      assert(got(id)._1 == 3)
      assert(math.abs(got(id)._2 - lw) < 1e-9, s"doc $id: ${got(id)._2} vs $lw")
    }
  }

  test("target-slice documents score higher than off-distribution ones on the fixture") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en")
    val byLang = docs.select("doc_id", "lang").join(w, "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("logw") / col("n_tokens")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byLang(true) > byLang(false),
      s"en mean per-token logw ${byLang(true)} must exceed non-en ${byLang(false)}")
  }
}

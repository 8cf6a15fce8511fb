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

  test("Gumbel top-k select: exactly the k largest keyed scores, reproducibly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val k = 50
    val sel = Dsir.select(docs, "doc_id", "text", col("lang") === "en", k)
      .collect()
    assert(sel.length == k)
    // driver-side reference: recompute gkey for EVERY doc from the
    // weights and assert the selected set is the top-k by (gkey, id)
    val w = Dsir.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en")
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    def sha60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(15), 16)
    }
    val keyed = w.map { case (id, lw) =>
      // low 52 bits only — the exact-IEEE keying (see Dsir.TwoPow52)
      val u = (sha60(id.toString) % 4503599627370496L + 0.5) /
        4503599627370496.0d
      val gk = BigDecimal(lw - math.log(-math.log(u)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, gk)
    }
    val expectTop = keyed.sortBy { case (id, gk) => (-gk, id) }.take(k)
      .map(_._1).toSet
    assert(sel.map(_.getLong(0)).toSet == expectTop)
    // selection is deterministic: a second run picks the identical set
    val again = Dsir.select(docs, "doc_id", "text", col("lang") === "en", k)
      .collect().map(_.getLong(0)).toSet
    assert(again == expectTop)
    // gkey column matches the driver formula
    val gkMap = keyed.toMap
    sel.foreach { r =>
      assert(math.abs(r.getDouble(3) - gkMap(r.getLong(0))) < 1e-9)
    }
  }

  test("select plans a TakeOrdered top-k, not a global sort or window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sp = Dsir.select(docs, "doc_id", "text", col("lang") === "en", 10)
      .queryExecution.sparkPlan
    assert(sp.toString.contains("TakeOrderedAndProject"), sp.toString)
    val globalWindows = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, sp.toString)
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

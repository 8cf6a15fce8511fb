package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the KMV sketch wave. */
class SketchSpec extends SparkSpec {

  private def shingleSets: Map[String, Set[String]] =
    Tables.t(spark, sf, "documents")
      .select(col("source"),
        graft.dedup.Dedup.normalized(col("text")).as("t"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> rows.flatMap(_.getString(1).sliding(8, 1).filter(_.length == 8))
          .toSet
      }

  test("q_kmv_distinct: exact column is truly exact, estimate within KMV error") {
    val rows = q("q_kmv_distinct").collect()
    val truth = shingleSets
    assert(rows.map(_.getAs[String]("source")).toSet == truth.keySet)
    for (r <- rows) {
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("exact") == truth(src).size,
        s"$src: exact ${r.getAs[Long]("exact")} != ${truth(src).size}")
      val skSize = r.getAs[Long]("sk_size")
      assert(skSize <= 256)
      if (skSize < 256) // exact branch: sketch holds the whole set
        assert(math.abs(r.getAs[Double]("est") - truth(src).size) < 0.01)
      // k=256 → σ ≈ 6.3%; this is deterministic data, 35% is ~5σ slack
      assert(r.getAs[Double]("rel_err") < 0.35,
        s"$src: rel_err ${r.getAs[Double]("rel_err")}")
    }
  }

  test("q_kmv_jaccard tracks the exact shingle Jaccard") {
    val rows = q("q_kmv_jaccard").collect()
    val truth = shingleSets
    val nSrc = truth.size
    assert(rows.length == nSrc * (nSrc - 1) / 2, "pair grid incomplete")
    for (r <- rows) {
      val (sa, sb) = (r.getAs[String]("sa"), r.getAs[String]("sb"))
      assert(sa < sb)
      val (kUsed, nBoth) = (r.getAs[Long]("k_used"), r.getAs[Long]("n_both"))
      assert(nBoth <= kUsed && kUsed <= 256)
      val est = r.getAs[Double]("jaccard_est")
      assert(est >= 0 && est <= 1)
      val (a, b) = (truth(sa), truth(sb))
      val exact = (a & b).size.toDouble / (a | b).size
      // σ ≈ sqrt(J(1−J)/k) ≈ 0.031 at J≈0.45 — 0.2 is generous determinism slack
      assert(math.abs(est - exact) < 0.2,
        s"$sa×$sb: est $est vs exact $exact")
    }
  }

  test("q_mmr_rerank: greedy invariants hold and diversity actually binds") {
    val rows = q("q_mmr_rerank").collect().sortBy(_.getAs[Int]("rank"))
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    // rank 1 is the pure-relevance argmax: its mmr equals its relevance
    assert(rows.head.getAs[Double]("mmr") ==
      rows.head.getAs[Double]("relevance"))
    // greedy MMR scores are non-increasing (penalty only grows)
    val mmrs = rows.map(_.getAs[Double]("mmr"))
    assert(mmrs.zip(mmrs.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"mmr not non-increasing: ${mmrs.mkString(",")}")
    // diversification is real on this fixture: some later pick has
    // HIGHER relevance than an earlier one (pure top-k would be sorted)
    val rels = rows.map(_.getAs[Double]("relevance"))
    assert(rels.zip(rels.tail).exists { case (a, b) => b > a },
      s"selection degenerated to pure top-k: ${rels.mkString(",")}")
  }

  test("q_spatial_join matches brute-force haversine (grid cover complete)") {
    val rows = q("q_spatial_join").collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("dist_m")).toMap
    assert(rows.nonEmpty)
    assert(rows.forall { case ((a, b), d) => a < b && d <= 5000.05 })
    // brute force over every pair — the grid must have NO false negatives
    def u(id: Long, salt: String): Double = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s"$id:$salt".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 1000000L) / 1000000.0
    }
    val pts = Tables.t(spark, sf, "customer").select("c_custkey")
      .collect().map(_.getLong(0))
      .map(id => (id, 50.0 + u(id, "lat"), 8.0 + 2 * u(id, "lon")))
    def hav(a: (Long, Double, Double), b: (Long, Double, Double)): Double = {
      val dLat = math.toRadians(b._2 - a._2) / 2
      val dLon = math.toRadians(b._3 - a._3) / 2
      2 * 6371000.0 * math.asin(math.sqrt(
        math.sin(dLat) * math.sin(dLat) +
          math.cos(math.toRadians(a._2)) * math.cos(math.toRadians(b._2)) *
            math.sin(dLon) * math.sin(dLon)))
    }
    val expect = (for {
      i <- pts.indices; j <- (i + 1) until pts.length
      (a, b) = if (pts(i)._1 < pts(j)._1) (pts(i), pts(j))
               else (pts(j), pts(i))
      d = hav(a, b) if d <= 5000
    } yield (a._1, b._1) -> d).toMap
    assert(rows.keySet == expect.keySet,
      s"pair sets differ: ${rows.size} vs ${expect.size} " +
        s"(missing: ${(expect.keySet -- rows.keySet).take(3)})")
    for ((k, d) <- expect)
      assert(math.abs(rows(k) - d) < 0.2, s"$k: ${rows(k)} vs $d")
  }

  test("q_spatial_cluster matches a driver-side DBSCAN reference") {
    val rows = q("q_spatial_cluster").collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[String]("role"),
        if (r.isNullAt(r.fieldIndex("cluster_id"))) None
        else Some(r.getAs[Long]("cluster_id")))).toMap
    // same synthesized coordinates as the query
    def u(id: Long, salt: String): Double = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s"$id:$salt".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 1000000L) / 1000000.0
    }
    val pts = Tables.t(spark, sf, "customer").select("c_custkey")
      .collect().map(_.getLong(0))
      .map(id => (id, 50.0 + u(id, "lat"), 8.0 + 2 * u(id, "lon")))
    assert(rows.size == pts.length)
    def hav(a: (Long, Double, Double), b: (Long, Double, Double)): Double = {
      val dLat = math.toRadians(b._2 - a._2) / 2
      val dLon = math.toRadians(b._3 - a._3) / 2
      2 * 6371000.0 * math.asin(math.sqrt(
        math.sin(dLat) * math.sin(dLat) +
          math.cos(math.toRadians(a._2)) * math.cos(math.toRadians(b._2)) *
            math.sin(dLon) * math.sin(dLon)))
    }
    val nbrs = pts.map(a => a._1 ->
      pts.filter(b => b._1 != a._1 && hav(a, b) <= 5000).map(_._1).toSet)
      .toMap
    val core = nbrs.filter(_._2.size >= 4).keySet
    // components of the core-core graph, min-id labels
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (c <- core; d <- nbrs(c) if core(d)) {
      val (ra, rb) = (find(c), find(d))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    for ((id, (role, cl)) <- rows) {
      if (core(id)) {
        assert(role == "core", s"$id: $role should be core")
        assert(cl.contains(find(id)), s"$id: cluster $cl != ${find(id)}")
      } else if (nbrs(id).exists(core)) {
        assert(role == "border", s"$id: $role should be border")
        assert(cl.contains(nbrs(id).filter(core).map(find).min),
          s"$id: border cluster $cl wrong")
      } else {
        assert(role == "noise" && cl.isEmpty, s"$id: $role/$cl should be noise")
      }
    }
  }

  test("q_entropy_rate: bounds of information theory hold") {
    val r = q("q_entropy_rate").collect().head
    val (hu, hc, red) = (r.getAs[Double]("h_unigram"),
      r.getAs[Double]("h_cond"), r.getAs[Double]("redundancy"))
    val vocab = r.getAs[Long]("vocab")
    // 0 <= H(W2|W1) <= H(W) <= log2 |V|  (conditioning never adds entropy)
    assert(hc >= 0 && hc <= hu + 1e-6, s"H_cond $hc > H_uni $hu")
    assert(hu <= math.log(vocab.toDouble) / math.log(2) + 1e-6,
      s"H_uni $hu exceeds log2($vocab)")
    assert(math.abs(red - (1 - hc / hu)) < 1e-3)
  }

  test("q_beam_search: beams scored exactly by their bigram chain") {
    val rows = q("q_beam_search").collect().sortBy(_.getAs[Int]("rank"))
    assert(rows.length == 3)
    val scores = rows.map(_.getAs[Double]("logprob"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b - 1e-9 })
    // independent bigram LM from the corpus
    val toks = Tables.t(spark, sf, "documents")
      .select(graft.dedup.Dedup.normalized(col("text"))).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty)
        .sliding(2).collect { case Array(a, b) => (a, b) })
    val bg = toks.groupBy(identity).view.mapValues(_.length).toMap
    val tw = toks.groupBy(_._1).view.mapValues(_.length).toMap
    val start = tw.toSeq.minBy { case (w, c) => (-c, w) }._1
    for (r <- rows) {
      val path = r.getAs[String]("path").split(" ")
      assert(path.length == 4 && path.head == start,
        s"path ${path.mkString(" ")} malformed")
      val expect = path.sliding(2).map { case Array(a, b) =>
        math.log(bg((a, b)).toDouble / tw(a)) }.sum
      assert(math.abs(r.getAs[Double]("logprob") - expect) < 1e-3,
        s"${r.getAs[String]("path")}: ${r.getAs[Double]("logprob")} vs $expect")
    }
  }

  test("q_top_p: nucleus is minimal, covering, and renormalized") {
    val rows = q("q_top_p").collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c"), r.getAs[Int]("rnk"), r.getAs[Double]("p_renorm")))
    assert(rows.nonEmpty)
    // full successor mass per context, computed independently
    val toks = Tables.t(spark, sf, "documents")
      .select(graft.dedup.Dedup.normalized(col("text"))).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty)
        .sliding(2).collect { case Array(a, b) => (a, b) })
    val totals = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    for ((w1, grp) <- rows.groupBy(_._1)) {
      val sorted = grp.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to grp.length), s"$w1: rank gap")
      assert(math.abs(grp.map(_._5).sum - 1.0) < 0.01,
        s"$w1: renormalized mass ${grp.map(_._5).sum}")
      val kept = grp.map(_._3).sum
      val total = totals(w1)
      assert(10 * kept >= 9 * total, s"$w1: nucleus covers ${kept}/$total")
      // minimality: removing the LAST kept successor drops below 90%
      val withoutLast = kept - sorted.last._3
      assert(10 * withoutLast < 9 * total,
        s"$w1: nucleus not minimal ($withoutLast/$total without last)")
    }
  }

  test("q_phrase_search resolves the true top bigram with exact counts") {
    val rows = q("q_phrase_search").collect()
    assert(rows.nonEmpty)
    val docs = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        graft.dedup.Dedup.normalized(col("text")).as("t"))
      .collect().map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty))
    val bigrams = docs.flatMap { case (_, ws) => ws.sliding(2).collect {
      case Array(a, b) => (a, b) } }
    val counts = bigrams.groupBy(identity).view.mapValues(_.length)
    val top = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
    assert(rows.forall(r => (r.getAs[String]("w1"),
      r.getAs[String]("w2")) == top), s"phrase mismatch vs $top")
    val expect = docs.map { case (id, ws) =>
      id -> ws.sliding(2).count {
        case Array(a, b) => (a, b) == top; case _ => false }
    }.filter(_._2 > 0).toMap
    val got = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("n_occ")).toMap
    assert(got == expect.view.mapValues(_.toLong).toMap,
      s"posting intersection diverges: ${got.size} vs ${expect.size} docs")
  }
}

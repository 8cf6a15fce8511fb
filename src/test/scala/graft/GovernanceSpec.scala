package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the governance wave. */
class GovernanceSpec extends SparkSpec {

  test("q_filter_funnel: monotone attrition, conserved drops, real bite") {
    val rows = q("q_filter_funnel").collect()
      .map(r => (r.getAs[Int]("stage"), r.getAs[Long]("n_pass"),
        r.getAs[Long]("n_dropped"), r.getAs[Double]("pass_rate")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
    val all = rows.head._2
    assert(rows.head._3 == 0 && rows.head._4 == 1.0)
    // each stage passes no more than the previous; drops are conserved
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur._2 <= prev._2, s"stage ${cur._1} grew the corpus")
      assert(cur._3 == prev._2 - cur._2, s"stage ${cur._1} drop mismatch")
    }
    assert(rows.map(_._3).sum == all - rows.last._2)
    assert(rows.last._2 < all, "no filter dropped anything — funnel is vacuous")
    assert(rows.last._2 > 0, "funnel dropped everything — thresholds wrong")
  }

  test("q_dedup_impact: kept+removed conserved, keeper totals match clusters") {
    val rows = q("q_dedup_impact").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed"),
        r.getAs[Double]("dup_rate")))
    assert(rows.nonEmpty)
    for ((src, n, kept, rem, rate) <- rows) {
      assert(kept + rem == n, s"$src loses docs")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // Σ kept across sources == distinct global fingerprints
    val fps = Tables.t(spark, sf, "documents")
      .select(substring(lower(trim(regexp_replace(col("text"), "\\s+", " "))),
        1, 50).as("fp"))
      .distinct().count()
    assert(rows.map(_._3).sum == fps,
      s"keepers ${rows.map(_._3).sum} != global clusters $fps")
    assert(rows.map(_._2).sum ==
      Tables.t(spark, sf, "documents").count())
  }

  test("q_k_anon: suppression bookkeeping is internally consistent") {
    val rows = q("q_k_anon").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_groups"),
        r.getAs[Long]("n_risky"), r.getAs[Long]("rows_suppressed"),
        r.getAs[Double]("suppression_cost")))
    assert(rows.nonEmpty)
    for ((t, groups, risky, supp, cost) <- rows) {
      assert(risky <= groups, s"$t: more risky groups than groups")
      // a risky group has 1..4 users; rows ≥ users ≥ 1 per risky group
      assert(supp >= risky, s"$t: fewer suppressed rows than risky groups")
      assert(cost >= 0.0 && cost <= 1.0)
    }
    val totalRows = rows.map(_._4).sum
    assert(totalRows <= Tables.t(spark, sf, "events").count())
    assert(rows.exists(_._3 > 0),
      "no risky quasi-group at this sf — the audit is vacuous here")
  }

  test("q_split_leakage: leaked docs are test docs with a cross-split twin") {
    val r = q("q_split_leakage").collect().head
    val (nTest, nLeaked, rate) =
      (r.getAs[Long]("n_test"), r.getAs[Long]("n_leaked"),
        r.getAs[Double]("leak_rate"))
    assert(nTest > 0 && nLeaked <= nTest)
    assert(math.abs(rate - nLeaked.toDouble / nTest) < 1e-3)
    // the template corpus is highly self-similar (q_word_jaccard finds
    // thousands of ≥0.9 pairs) — zero leakage would mean the join broke
    assert(nLeaked > 0, "no leakage found on a corpus full of near-dups")
    // split sizes must match the deterministic hash split
    val split = graft.ops.Sampling.hashSplit(
      Tables.t(spark, sf, "documents").select("doc_id"), "doc_id")
    assert(split.filter(col("split") === "test").count() == nTest)
  }

  test("q_winsorize: clamp counts sit at the 5% tails, mean is finite") {
    val rows = q("q_winsorize").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("n_lo"), r.getAs[Long]("n_hi"),
        r.getAs[Double]("mean_w")))
    assert(rows.nonEmpty)
    for ((t, n, lo, hi, mean) <- rows) {
      // exact p05/p95 cuts on a continuous value: strictly-outside counts
      // land within a whisker of 5% each side
      assert(lo <= 0.07 * n + 2 && lo >= 0.03 * n - 2, s"$t n_lo=$lo of $n")
      assert(hi <= 0.07 * n + 2 && hi >= 0.03 * n - 2, s"$t n_hi=$hi of $n")
      assert(lo + hi < n, s"$t clamped everything")
      assert(!mean.isNaN && !mean.isInfinite)
    }
  }

  test("q_hard_negatives: negatives really cross labels, ranks well-formed") {
    val labels = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = q("q_hard_negatives").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("cos")))
    assert(rows.nonEmpty)
    for ((qid, nid, _, _) <- rows)
      assert(labels(qid) != labels(nid),
        s"negative $nid shares label ${labels(qid)} with query $qid")
    for ((qid, rs) <- rows.groupBy(_._1)) {
      assert(rs.map(_._3).sorted.toSeq == Seq(1, 2, 3), s"query $qid ranks")
      val byRank = rs.sortBy(_._3).map(_._4).toSeq
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"query $qid cos not descending: ${byRank.mkString(",")}")
    }
  }

  test("q_source_overlap: canonical source pairs, mass equals the pair set") {
    val rows = q("q_source_overlap").collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"),
        r.getAs[Long]("n_pairs")))
    assert(rows.nonEmpty)
    for ((a, b, n) <- rows) {
      assert(a <= b, s"pair ($a,$b) not canonical")
      assert(n > 0)
    }
    // cross-query consistency: the matrix is a rollup of exactly the
    // q_word_jaccard pair set (same threshold, same strategy)
    val pairCount = q("q_word_jaccard").count()
    assert(rows.map(_._3).sum == pairCount,
      s"matrix mass ${rows.map(_._3).sum} != pair set $pairCount")
  }

  test("q_centroid_cos: one row per unordered label pair, cosine bounded") {
    val rows = q("q_centroid_cos").collect()
      .map(r => (r.getAs[Int]("label_a"), r.getAs[Int]("label_b"),
        r.getAs[Double]("cos")))
    val k = Tables.t(spark, sf, "embeddings")
      .select("label").distinct().count().toInt
    assert(rows.length == k * (k - 1) / 2,
      s"${rows.length} pairs for $k labels")
    for ((a, b, c) <- rows) {
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(c >= -1.0001 && c <= 1.0001, s"cos($a,$b)=$c out of range")
    }
    assert(rows.map(_._3).distinct.length > 1,
      "all centroid cosines identical — degenerate embedding fixture")
  }

  test("q_table_diff statuses follow the modular snapshot construction") {
    val rows = q("q_table_diff").collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[String]("status"),
        r.getAs[String]("changed_cols")))
    assert(rows.nonEmpty)
    for ((k, st, cols) <- rows) st match {
      case "added" => // in v2 only: key joined v2 (%5!=0) but not v1 (%7==0)
        assert(k % 7 == 0 && k % 5 != 0, s"$k wrongly added")
        assert(cols == "")
      case "removed" =>
        assert(k % 5 == 0 && k % 7 != 0, s"$k wrongly removed")
        assert(cols == "")
      case "changed" =>
        assert(k % 7 != 0 && k % 5 != 0, s"$k not in both snapshots")
        assert(cols.nonEmpty, s"$k changed with empty column list")
        val parts = cols.split(",").toSet
        assert(parts.subsetOf(Set("o_orderstatus", "price_cents")),
          s"$k: unexpected changed cols $cols — custkey never changes")
        if (parts("price_cents")) assert(k % 3 == 0, s"$k price not re-priced")
      case other => fail(s"unknown status $other")
    }
    // every modified key with a REAL value change is reported: %4 keys in
    // both snapshots flip status (unless it was already 'X' — it never is)
    val changedKeys = rows.filter(_._2 == "changed").map(_._1).toSet
    val orders = Tables.t(spark, sf, "orders").select("o_orderkey")
      .collect().map(_.getLong(0))
    for (k <- orders if k % 7 != 0 && k % 5 != 0 && k % 4 == 0)
      assert(changedKeys(k), s"status-flipped $k missing from the diff")
  }

  test("q_vocab_coverage: shares telescope to exactly one") {
    val rows = q("q_vocab_coverage").collect().sortBy(_.getAs[Int]("k"))
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("k")).toSeq == (1 to rows.length))
    // counts are rank-ordered and cum_share telescopes the shares
    val cs = rows.map(_.getAs[Long]("c"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    var cum = 0L
    val total = cs.sum
    for (r <- rows) {
      cum += r.getAs[Long]("c")
      assert(math.abs(r.getAs[Double]("cum_share") - cum.toDouble / total)
        < 1e-3)
    }
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-3)
  }

  test("q_data_card: datasheet numbers agree with first-principles counts") {
    val r = q("q_data_card").collect().head
    val d = Tables.t(spark, sf, "documents")
    assert(r.getAs[Long]("n_docs") == d.count())
    assert(r.getAs[Long]("n_sources") ==
      d.select("source").distinct().count())
    assert(r.getAs[Long]("n_langs") == d.select("lang").distinct().count())
    val dup = r.getAs[Double]("dup_rate")
    assert(dup >= 0 && dup < 1)
    // lang entropy bounded by log2(n_langs)
    val le = r.getAs[Double]("lang_entropy")
    assert(le >= 0 &&
      le <= math.log(r.getAs[Long]("n_langs").toDouble) / math.log(2) + 1e-6)
    assert(r.getAs[Double]("mean_tokens") > 0)
    assert(r.getAs[Double]("p50_tokens") > 0)
  }

  test("q_benford: digit grid complete, shares are distributions") {
    val rows = q("q_benford").collect()
    assert(rows.map(_.getAs[Long]("digit")).sorted.toSeq.forall(d =>
      d >= 1 && d <= 9))
    assert(math.abs(rows.map(_.getAs[Double]("obs_share")).sum - 1) < 0.01)
    // Benford reference shares themselves sum to 1 over the full grid
    val benford = (1 to 9).map(d => math.log10(1 + 1.0 / d))
    assert(math.abs(benford.sum - 1.0) < 1e-9)
    for (r <- rows) {
      val d = r.getAs[Long]("digit").toInt
      assert(math.abs(r.getAs[Double]("benford_share") - benford(d - 1))
        < 1e-3)
    }
    assert(rows.map(_.getAs[Double]("chi2")).distinct.length == 1)
    assert(rows.head.getAs[Double]("chi2") >= 0)
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.t(spark, sf, "orders").filter(col("o_totalprice") > 0).count())
  }

  test("q_dp_counts: noise bounded, reproducible, counts intact") {
    val rows = q("q_dp_counts").collect()
    val truth = Tables.t(spark, sf, "events")
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getAs[String]("event_type")).toSet == truth.keySet)
    for (r <- rows) {
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n") == truth(t))
      val noise = r.getAs[Double]("noisy_n") - truth(t)
      // Laplace(1): |noise| beyond ~28 means ln(1e-12) guard fired or
      // the inverse-CDF is wrong
      assert(math.abs(noise) < 28, s"$t: noise $noise implausible")
      assert(noise != 0.0, s"$t: zero noise — mechanism degenerate")
    }
    // determinism: a second evaluation returns identical draws
    val again = q("q_dp_counts").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("noisy_n"))
      .toMap
    for (r <- rows)
      assert(again(r.getAs[String]("event_type")) == r.getAs[Double]("noisy_n"))
  }
}

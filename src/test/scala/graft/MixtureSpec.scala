package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the data-mixture wave that oracle equivalence
  * alone doesn't pin (both engines could share a wrong convention).
  */
class MixtureSpec extends SparkSpec {

  test("q_mix_weights: weights are a distribution, smoothing flattens") {
    val rows = q("q_mix_weights").collect()
    assert(rows.nonEmpty)
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum to $wSum")
    val shSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shSum - 1.0) < 1e-4, s"shares sum to $shSum")
    // α=0.5 smoothing boosts sources below the TRUE pivot share
    // (1/Σ√share)² and shrinks those above it — the pivot is the average
    // share only for uniform mixtures, so compute it from the data
    val pivot = {
      val s = rows.map(r => math.sqrt(r.getAs[Double]("share"))).sum
      1.0 / (s * s)
    }
    for (r <- rows) {
      val (share, boost) = (r.getAs[Double]("share"), r.getAs[Double]("boost"))
      if (share < pivot * 0.95) assert(boost > 1.0, s"tail source not boosted: $r")
      if (share > pivot * 1.05) assert(boost < 1.0, s"head source not shrunk: $r")
    }
  }

  test("q_token_budget: allocations exhaust the budget and respect caps") {
    val rows = q("q_token_budget").collect()
    assert(rows.nonEmpty)
    var total = 0.0
    for (r <- rows) {
      val (avail, capped, alloc) =
        (r.getAs[Long]("avail"), r.getAs[Boolean]("capped"),
          r.getAs[Double]("alloc"))
      assert(alloc <= avail + 1e-6, s"over-allocated: $r")
      if (capped) assert(math.abs(alloc - avail) < 1e-6,
        s"capped source not at its cap: $r")
      total += alloc
    }
    // the one redistribution round settles: leftovers land on uncapped
    // sources, so the full budget (95% of corpus tokens) is spent
    val corpusTokens = Tables.t(spark, sf, "documents")
      .select(size(split(trim(col("text")), "\\s+")).as("n"))
      .agg(sum("n")).first().getLong(0)
    val budget = 0.95 * corpusTokens
    assert(math.abs(total - budget) < 1.0, s"spent $total of budget $budget")
    assert(rows.exists(_.getAs[Boolean]("capped")) &&
      rows.exists(!_.getAs[Boolean]("capped")),
      "fixture regime is no longer mixed capped/uncapped — test is weak")
  }

  test("q_ngram_novelty: first doc fully novel, counts bounded, saturation") {
    val rows = q("q_ngram_novelty").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_novel"), r.getAs[Double]("novelty")))
    assert(rows.nonEmpty)
    val first = rows.minBy(_._1)
    assert(first._4 == 1.0, s"earliest doc must be all-novel: $first")
    for ((id, n, novel, frac) <- rows) {
      assert(novel >= 0 && novel <= n, s"doc $id: $novel of $n")
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // template corpus with a tiny vocabulary: novelty must decay — late
    // docs see mostly seen grams
    val (early, late) = (rows.sortBy(_._1).take(50), rows.sortBy(_._1).takeRight(50))
    assert(early.map(_._4).sum > late.map(_._4).sum,
      "novelty did not decay over doc order")
  }

  test("q_shard_assign: shards are contiguous, ordered, and budget-bounded") {
    val rows = q("q_shard_assign").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("running"), r.getAs[Long]("shard_id")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    // running totals really accumulate in doc order
    rows.foldLeft(0L) { case (acc, (id, n, run, _)) =>
      assert(run == acc + n, s"doc $id running $run != ${acc + n}")
      run
    }
    // shard ids start at 0, are monotone, and equal the start-offset
    // formula exactly (an over-budget doc may legitimately SKIP shard
    // ids — its successor starts several budgets later — so "no gaps"
    // would misfire on a fixture with one huge doc)
    assert(rows.head._4 == 0L)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4, s"shard not monotone at doc ${b._1}")
    }
    for ((id, n, run, sid) <- rows)
      assert(sid == (run - n) / 4000L, s"doc $id shard $sid != formula")
    // greedy start-based placement: a shard holds < budget + its last
    // doc's tokens (a doc is never split, so only the final doc overflows)
    val maxDoc = rows.map(_._2).max
    for ((sid, docs) <- rows.groupBy(_._4))
      assert(docs.map(_._2).sum < 4000L + maxDoc, s"shard $sid over budget")
    assert(rows.map(_._4).distinct.length > 1, "single shard — raise corpus")
  }

  test("q_cluster_size_hist: doc mass conserved, cluster arithmetic holds") {
    val rows = q("q_cluster_size_hist").collect()
      .map(r => (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs")))
    val corpus = Tables.t(spark, sf, "documents").count()
    assert(rows.map(_._3).sum == corpus,
      s"histogram loses docs: ${rows.map(_._3).sum} != $corpus")
    for ((size, nc, nd) <- rows)
      assert(nd == size * nc, s"size $size: $nc clusters but $nd docs")
  }
}

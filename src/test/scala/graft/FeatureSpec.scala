package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the feature-engineering wave. */
class FeatureSpec extends SparkSpec {

  test("q_feature_scale: full dim grid, coherent order statistics") {
    val rows = q("q_feature_scale").collect()
    assert(rows.map(_.getAs[Int]("dim")).sorted.toSeq == (0 until 64))
    val nVecs = Tables.t(spark, sf, "embeddings").count()
    for (r <- rows) {
      assert(r.getAs[Long]("n") == nVecs)
      val (mean, mn, mx) = (r.getAs[Double]("mean"),
        r.getAs[Double]("mn"), r.getAs[Double]("mx"))
      assert(mn <= mean + 1e-4 && mean <= mx + 1e-4,
        s"dim ${r.getAs[Int]("dim")}: $mn <= $mean <= $mx violated")
      if (!r.isNullAt(r.fieldIndex("z_max")))
        assert(r.getAs[Double]("z_max") >= 0)
    }
  }

  test("q_target_encode: shrinkage pulls toward the global mean") {
    val rows = q("q_target_encode").collect()
    val gm = Tables.t(spark, sf, "events").agg(avg("value")).head.getDouble(0)
    for (r <- rows) {
      val (raw, enc, shrink) = (r.getAs[Double]("raw_mean"),
        r.getAs[Double]("encoded"), r.getAs[Double]("shrink"))
      assert(shrink > 0 && shrink < 1)
      // encoded lies strictly between the category mean and the prior
      val (lo, hi) = (math.min(raw, gm), math.max(raw, gm))
      assert(enc >= lo - 1e-3 && enc <= hi + 1e-3,
        s"${r.getString(0)}: $enc outside [$lo, $hi]")
    }
  }

  test("q_class_weights: weighted counts re-sum to N") {
    val rows = q("q_class_weights").collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == Tables.t(spark, sf, "embeddings").count())
    val reweighted = rows.map(r =>
      r.getAs[Long]("n") * r.getAs[Double]("weight")).sum
    assert(math.abs(reweighted - n) / n < 1e-3,
      s"sum n_k*w_k = $reweighted != $n")
  }

  test("q_curriculum_bins: stages partition the corpus, schedule accumulates") {
    val rows = q("q_curriculum_bins").collect()
      .sortBy(_.getAs[Int]("stage"))
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.map(_.getAs[Int]("stage")).distinct.length == rows.length)
    val docs = Tables.t(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs)
    // difficulty is monotone across stages (they're score-range carved)
    val diffs = rows.map(_.getAs[Double]("mean_difficulty"))
    assert(diffs.zip(diffs.tail).forall { case (a, b) => a <= b + 1e-9 },
      s"stage difficulty not monotone: ${diffs.mkString(",")}")
    var cum = 0L
    for (r <- rows) {
      cum += r.getAs[Long]("tokens")
      assert(r.getAs[Long]("cum_tokens") == cum)
    }
  }

  test("q_lag_features matches an independent per-user scan") {
    val rows = q("q_lag_features").collect()
    val daily = Tables.t(spark, sf, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    assert(rows.length == daily.length)
    val byUser = daily.groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(x => x._2 -> x._3).sortBy(_._1.toEpochDay) }
    for (r <- rows) {
      val (u, d) = (r.getAs[Long]("user_id"), r.getDate(1).toLocalDate)
      val series = byUser(u)
      val i = series.indexWhere(_._1 == d)
      assert(r.getAs[Long]("cents") == series(i)._2)
      val roll = series.filter { case (dd, _) =>
        !dd.isAfter(d) && !dd.isBefore(d.minusDays(6)) }.map(_._2).sum
      assert(r.getAs[Long]("roll7_cents") == roll,
        s"user $u $d: roll7 ${r.getAs[Long]("roll7_cents")} != $roll")
      if (i == 0) {
        assert(r.isNullAt(r.fieldIndex("lag1_cents")))
        assert(r.isNullAt(r.fieldIndex("days_since")))
      } else {
        assert(r.getAs[Long]("lag1_cents") == series(i - 1)._2)
        assert(r.getAs[Long]("days_since") ==
          d.toEpochDay - series(i - 1)._1.toEpochDay)
      }
    }
  }

  test("q_logreg_train: the descent beats the prior and calibrates") {
    val r = q("q_logreg_train").collect().head
    val acc = r.getAs[Double]("accuracy")
    val ll = r.getAs[Double]("log_loss")
    // the majority class of a median split is ~50%; learned accuracy
    // must clear it decisively and the loss must beat ln 2 (the
    // all-0.5 predictor) — otherwise the "training" did nothing
    assert(acc > 0.7, s"accuracy $acc barely beats the prior")
    assert(ll < math.log(2.0), s"log-loss $ll no better than coin flips")
    assert(ll > 0)
    // token count drives length: its weight must come out positive and
    // dominant
    val w1 = r.getAs[Double]("w1")
    assert(w1 > 0, s"token-count weight $w1 should be positive")
    assert(math.abs(w1) > math.abs(r.getAs[Double]("w2")),
      "token count should outweigh mean word length")
  }

  test("q_calibration_bins: bins partition, ECE recomputes, ranking monotone") {
    val rows = q("q_calibration_bins").collect().sortBy(_.getAs[Int]("bin"))
    assert(rows.nonEmpty && rows.forall(r => {
      val b = r.getAs[Int]("bin"); b >= 0 && b <= 4
    }))
    val docs = Tables.t(spark, sf, "documents")
      .filter(length(trim(col("text"))) > 0).count()
    assert(rows.map(_.getAs[Long]("n")).sum == docs)
    val ece = rows.head.getAs[Double]("ece")
    assert(rows.forall(_.getAs[Double]("ece") == ece))
    val recomputed = rows.map(r => r.getAs[Long]("n") *
      math.abs(r.getAs[Double]("mean_p") - r.getAs[Double]("obs_rate"))).sum /
      rows.map(_.getAs[Long]("n")).sum
    assert(math.abs(ece - recomputed) < 1e-3, s"ece $ece vs $recomputed")
    // a usable score ranks: observed rate non-decreasing across bins
    val obs = rows.map(_.getAs[Double]("obs_rate"))
    assert(obs.zip(obs.tail).forall { case (a, b) => a <= b + 1e-9 },
      s"observed rate not monotone: ${obs.mkString(",")}")
  }

  test("q_roc_auc matches a brute-force pairwise AUC") {
    val r = q("q_roc_auc").collect().head
    val (np, nn, auc) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
      r.getAs[Double]("auc"))
    assert(math.abs(r.getAs[Double]("gini") - (2 * auc - 1)) < 2e-4)
    // brute force: P(score_pos > score_neg) + half-ties — the definition
    // the rank identity must reproduce
    val (f, w) = graft.queries.FeatureQueries.logregTrain(spark, sf, 10)
    val scored = f.select(graft.queries.FeatureQueries.logregPCol(w)
      .as("p"), col("y")).collect()
      .map(r0 => (r0.getDouble(0), r0.getDouble(1)))
    val pos = scored.filter(_._2 == 1.0).map(_._1)
    val neg = scored.filter(_._2 == 0.0).map(_._1)
    assert(pos.length == np && neg.length == nn)
    val pairs = (for (a <- pos; b <- neg)
      yield if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
    val brute = pairs / (pos.length.toDouble * neg.length)
    assert(math.abs(auc - brute) < 1e-3, s"auc $auc vs brute $brute")
    // the score genuinely ranks this target
    assert(auc > 0.8, s"auc $auc — model should rank length well")
  }

  test("q_pca_power: unit loadings, sign convention, Rayleigh consistency") {
    val rows = q("q_pca_power").collect().sortBy(_.getAs[Int]("dim"))
    assert(rows.map(_.getAs[Int]("dim")).toSeq == (0 until 64))
    val v = rows.map(_.getAs[Double]("loading"))
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 0.01, s"loading norm $norm")
    // orientation: the largest-|loading| dimension is positive
    val dstar = v.indices.minBy(i => (-math.abs(v(i)), i))
    assert(v(dstar) > 0, s"sign convention violated at dim $dstar")
    val lambda = rows.head.getAs[Double]("eigenvalue")
    val evr = rows.head.getAs[Double]("evr")
    assert(lambda > 0 && evr > 0 && evr < 1)
    // Rayleigh quotient of the returned vector against the real scatter
    // matrix: within 15% of the reported eigenvalue (5 iterations on a
    // weak eigengap won't be exact, but it must be the same ballpark)
    val x = Tables.t(spark, sf, "embeddings").select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val mu = (0 until 64).map(d => x.map(_(d)).sum / x.length)
    val xc = x.map(r => r.indices.map(d => r(d) - mu(d)).toArray)
    val cv = (0 until 64).map(d =>
      xc.map(r => r(d) * r.indices.map(e => r(e) * v(e)).sum).sum)
    val rayleigh = (0 until 64).map(d => v(d) * cv(d)).sum
    assert(math.abs(rayleigh - lambda) / lambda < 0.15,
      s"Rayleigh $rayleigh vs reported eigenvalue $lambda")
  }

  test("q_corr_matrix: all 6 ordered pairs present, r within [-1, 1]") {
    val rows = q("q_corr_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(rows.size == 6, s"${rows.size} pairs")
    val ms = Seq("quantity", "extendedprice", "discount", "tax")
    for (i <- ms.indices; j <- ms.indices if i < j)
      assert(rows.contains((ms(i), ms(j))), s"missing ${ms(i)}/${ms(j)}")
    // the driver fixture draws the measures independently, so no pair
    // may show strong correlation — |r| small is the semantic check
    for (((a, b), c) <- rows) {
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"corr($a,$b)=$c")
      assert(math.abs(c) < 0.3, s"corr($a,$b)=$c on independent draws")
    }
  }

  test("q_mutual_info: MI bounded by the marginal entropies, NMI in [0,1]") {
    val r = q("q_mutual_info").collect().head
    val (mi, ha, hb, nmi) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(mi >= -1e-6, s"MI $mi negative")
    assert(mi <= math.min(ha, hb) + 1e-6, s"MI $mi exceeds min entropy")
    assert(nmi >= -1e-6 && nmi <= 1.0 + 1e-6, s"NMI $nmi")
    assert(ha > 0 && hb > 0)
  }
}

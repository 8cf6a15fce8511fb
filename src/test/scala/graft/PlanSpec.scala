package graft

/** Physical-plan shape assertions: the optimizations we rely on at scale
  * must actually appear in the executed plan, not just be hoped for.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val p = q("q1_agg").queryExecution.sparkPlan.toString
    assert(p.contains("PushedFilters") &&
      p.contains("LessThanOrEqual(l_shipdate"), p)
  }

  test("q_identity_join broadcasts the dimension side") {
    assert(plan("q_identity_join").contains("BroadcastHashJoin"))
  }

  test("q_history_delta plans a left anti join") {
    assert(plan("q_history_delta").contains("LeftAnti"))
  }

  test("scalar transforms stay in one codegen stage with no exchange") {
    val p = plan("q_case_concat")
    assert(!p.contains("Exchange"), p)
    // "*(n)" prefixes mark whole-stage-codegen stages in the plan string
    assert(p.contains("*(1)"), p)
  }

  test("q_knn_cosine scores pairs with the native dot expression") {
    // DotProduct renders via prettyName "dot" in the plan
    val p = plan("q_knn_cosine")
    assert(p.contains("dot(") || p.contains("graft_dot"), p)
  }

  test("q_embed_neardup plans no cartesian product (banded equi-join)") {
    val p = plan("q_embed_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_embed_neardup_capped: no cartesian; cap is a bounded aggregate, not a window") {
    val p = plan("q_embed_neardup_capped")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // r17: the keep-lowest cut is the BottomKLongs aggregate — map-side
    // buffers hold ≤ cap ids per bucket, so even a fully-degenerate band
    // bucket never funnels n rows through one task. The r16 row_number
    // window did exactly that; no WindowExec may remain in this plan.
    val sp = q("q_embed_neardup_capped").queryExecution.sparkPlan
    val windows = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, sp.toString)
    assert(sp.toString.contains("bottom_k_longs"), sp.toString)
  }

  test("q_semantic_dedup: cell-bounded pairwise stage, bounded rep cap, no windows") {
    // the pairwise stage must be an equi-join on centroid_id (never the
    // corpus square) and the maxCellSize cut must be the bounded
    // aggregate — a collapse-degenerate cell can't funnel one task
    val sp = q("q_semantic_dedup").queryExecution.sparkPlan
    val windows = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, sp.toString)
    assert(sp.toString.contains("bottom_k_longs"), sp.toString)
    assert(!sp.toString.contains("CartesianProduct"), sp.toString)
  }

  test("q_semantic_dedup_coarse: two-level routing stays window-free and cartesian-free") {
    // the three argmax chains are all broadcast joins + max_by partial
    // aggregates; a row_number formulation would expand n·k rows through
    // the shuffle (the Ivf.assign lesson)
    val sp = q("q_semantic_dedup_coarse").queryExecution.sparkPlan
    val windows = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, sp.toString)
    assert(sp.toString.contains("bottom_k_longs"), sp.toString)
    assert(!sp.toString.contains("CartesianProduct"), sp.toString)
  }

  test("q_ann_ivf plans no unpartitioned global window") {
    // a Window with an empty partition spec funnels the corpus through one
    // task; seeding must plan as TakeOrderedAndProject instead
    val sp = q("q_ann_ivf").queryExecution.sparkPlan
    val globalWindows = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, sp.toString)
  }

  test("q_ngram_jaccard plans no cross join (prefix-filtered inverted index)") {
    // the scale-correct route: candidates come from an equi-join on each
    // doc's rarest grams, never a crossJoin over documents
    val p = plan("q_ngram_jaccard")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_word_jaccard_scaled plans no cross join (inverted-index word Jaccard)") {
    // the 100×-shippable word-Jaccard plan: prefix-filtered equi-join
    // candidates, exact verification — never a crossJoin over documents
    val p = plan("q_word_jaccard_scaled")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_basket_jaccard plans no cross join (inverted-index set similarity)") {
    val p = plan("q_basket_jaccard")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_word_jaccard plans no cross join (size-banded popcount equi-join)") {
    // r12: the bitmask candidate stage joins on partner popcount size —
    // a BroadcastHashJoin, never the all-pairs BNLJ it replaced
    val p = plan("q_word_jaccard")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_simhash_neardup plans no cross join (banded pigeonhole equi-join)") {
    val p = plan("q_simhash_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_fuzzy_match plans no cross join (q-gram prefix + length blocking)") {
    val p = plan("q_fuzzy_match")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_snapshot_diff's null-safe anti joins stay HASH joins") {
    // <=> conjuncts must be extracted as EqualNullSafe equi-join keys —
    // a BroadcastNestedLoopJoin here would be O(n²) per diff at scale
    val p = plan("q_snapshot_diff")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q_segment_dedup picks first occurrences via partial aggregation, not a window") {
    // segment text is the skew key at web scale (hot boilerplate segments)
    // — the first-occurrence choice must be a min(struct) aggregate whose
    // map-side partial collapses hot keys BEFORE the shuffle, never a
    // row_number window (full sort of every copy in one task)
    val sp = q("q_segment_dedup").queryExecution.sparkPlan
    val windows = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, sp.toString)
    assert(sp.toString.contains("partial_min"), sp.toString)
  }

  test("q_quantile_bins bins via aggregate cuts + broadcast join, not a window") {
    val sp = q("q_quantile_bins").queryExecution.sparkPlan
    val windows = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, sp.toString)
    val p = sp.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_substr_dedup: dup-gram detection is a partial aggregate, islands window is doc-bounded") {
    val sp = q("q_substr_dedup").queryExecution.sparkPlan
    // corpus-wide repeat filter must partial-aggregate (absorbs the hot
    // boilerplate gram before the shuffle), and every window must be
    // partitioned (doc-bounded state), never global
    assert(sp.toString.contains("partial_count"), sp.toString)
    val globalWindows = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, sp.toString)
    assert(!sp.toString.contains("CartesianProduct"), sp.toString)
  }

  test("q_incremental_dedup plans no cross join (band-bucket equi-joins only)") {
    val p = plan("q_incremental_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_lm_perplexity: V rides as a broadcast, no per-row scalar subquery") {
    val p = plan("q_lm_perplexity")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("prefix-sum consumers compute the global scan without a global window") {
    // the two-phase scan (range partition → pid-bounded window + broadcast
    // offsets) must never plan a Window with an empty partition spec —
    // that is the single-task global sort PrefixSum exists to avoid
    for (name <- Seq("q_pack_sequences", "q_shard_assign", "q_gini_value")) {
      val sp = q(name).queryExecution.sparkPlan
      val globalWindows = sp.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty, s"$name:\n$sp")
    }
  }

  test("q_skyline computes the strict prefix-min without a global window") {
    // r7 verdict: the skyline's prefix-min gated an empty-partition-spec
    // Window (single-task funnel). It now rides PrefixSum's range-
    // partitioned two-phase scan; assert the executed plan proves it.
    val sp = q("q_skyline").queryExecution.sparkPlan
    val globalWindows = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, sp.toString)
  }

  test("q_exists_corr decorrelates EXISTS into a semi join, not a per-row subplan") {
    val p = plan("q_exists_corr")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("ScalarSubquery"), p)
  }

  test("q_scalar_corr decorrelates the scalar subquery into an aggregate+join") {
    // Q17 shape: the per-part avg must become ONE aggregate over lineitem
    // joined back on the correlation key — a scalar-subquery node in the
    // executed plan would mean an avg() per outer row
    val p = plan("q_scalar_corr")
    assert(!p.contains("ScalarSubquery"), p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
  }

  test("q_vocab_ids_join broadcasts the vocab to the token stream") {
    val p = plan("q_vocab_ids_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_sql_pruned reads only two columns from the scan") {
    val p = q("q_sql_pruned").queryExecution.sparkPlan.toString
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"), p)
  }

  test("q_bucketed_join: sort-merge join with NO shuffle below it") {
    // both sides bucketed on the join key at write time → the scans
    // already satisfy the join's distribution; an Exchange under the SMJ
    // would mean bucketing was ignored
    // AdaptiveSparkPlanExec hides its inner plan from collect(), but the
    // printed tree lists children AFTER their parent — so everything after
    // the SortMergeJoin line is its subtree (the agg's Exchange sits above)
    val p = q("q_bucketed_join").queryExecution.executedPlan.toString
    val i = p.indexOf("SortMergeJoin")
    assert(i >= 0, p)
    val below = p.substring(i)
    assert(!below.contains("Exchange"), p)
    assert(below.contains("Bucketed: true"), p)
  }

  test("q_partition_pruning resolves the filter at the file listing") {
    val p = q("q_partition_pruning").queryExecution.sparkPlan.toString
    assert(p.contains("PartitionFilters") &&
      p.contains("event_type#") , p)
    // the partition column never appears in the parquet ReadSchema — it
    // comes from the directory name, not file bytes
    assert(!p.contains("ReadSchema: struct<event_type"), p)
  }

  test("q_upsert reads only the projected columns") {
    val p = q("q_upsert").queryExecution.sparkPlan.toString
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint," +
      "o_orderstatus:string,o_totalprice:double>") ||
      p.contains("o_orderkey"), p)
  }

  test("q_ann_ivfpq: centroids/codebooks broadcast, no cartesian product") {
    val p = plan("q_ann_ivfpq")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("sampling top-k plans TakeOrderedAndProject, never a global sort") {
    Seq("q_priority_sample", "q_weighted_sample").foreach { name =>
      val p = plan(name)
      assert(p.contains("TakeOrderedAndProject"), s"$name:\n$p")
      assert(!p.contains("rangepartitioning"), s"$name plans a global sort:\n$p")
    }
  }

  test("q_tpch_q3: pushed date filters, broadcast customer, top-k heap") {
    val p = q("q_tpch_q3").queryExecution.sparkPlan.toString
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("LessThan(o_orderdate") || p.contains("GreaterThan(l_shipdate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_tpch_q6: all three predicates reach the parquet scan, no join") {
    val sp = q("q_tpch_q6").queryExecution.sparkPlan
    // toString truncates PushedFilters — read the scan node's metadata
    val pushed = sp.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(l_discount"), pushed)
    assert(pushed.contains("LessThan(l_quantity"), pushed)
    assert(!sp.toString.contains("Join"), sp.toString)
  }

  test("q_tpch_q5: supplier/nation/region dims ride as one broadcast") {
    val p = plan("q_tpch_q5")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpch_q18: lineitem aggregates before the joins, top-k heap") {
    val sp = q("q_tpch_q18").queryExecution.sparkPlan
    assert(sp.toString.contains("TakeOrderedAndProject"), sp.toString)
    // the quantity rollup must sit BELOW the first join (filter-early): no
    // aggregate may have a join anywhere beneath it
    val aggsAboveJoins = sp.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          if a.find(_.isInstanceOf[
            org.apache.spark.sql.execution.joins.BaseJoinExec]).isDefined => a
    }
    assert(aggsAboveJoins.isEmpty, sp.toString)
  }

  test("q_tpch_q19: one broadcast join + residual disjunction, no union") {
    val p = plan("q_tpch_q19")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Union"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpch_q2: filtered part + supplier geo dims broadcast, no cartesian") {
    val p = plan("q_tpch_q2")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpch_q9: all three dims broadcast; only orders joins by shuffle") {
    val sp = q("q_tpch_q9").queryExecution.executedPlan
    val shuffleJoins = sp.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shuffleJoins.size <= 1, sp.toString)
    assert(sp.toString.contains("BroadcastHashJoin"), sp.toString)
  }

  test("q_tpch_q12: shipdate+returnflag predicates reach the lineitem scan") {
    val sp = q("q_tpch_q12").queryExecution.sparkPlan
    val pushed = sp.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("In(l_returnflag"), pushed)
  }

  test("q_tpch_q20/q21 plan semi-joins, never inner-join row expansion") {
    for (name <- Seq("q_tpch_q20", "q_tpch_q21")) {
      val p = plan(name)
      assert(p.contains("LeftSemi"), s"$name:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
    }
  }

  test("q_tpch_q21: two semi-join probes, broadcast supplier, top-k heap") {
    // the decorrelated EXISTS/NOT-EXISTS pair must stay SEMI joins (probe,
    // not row-expand), the supplier dim must broadcast, and the final
    // ORDER BY+LIMIT must plan as a heap — a global sort of the s_name
    // aggregate would serialize the reduce side at scale
    val p = q("q_tpch_q21").queryExecution.executedPlan.toString
    assert("LeftSemi".r.findAllIn(p).size >= 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpch_q8: every dim broadcasts; facts shuffle-join at most twice") {
    // the widest join in the battery (7 tables): part/supplier/nation×2/
    // region must all ride as broadcasts — only lineitem⨝orders and
    // ⨝customer may shuffle. A third shuffle join means a dim fell off
    // the broadcast path and would move TBs at scale.
    val sp = q("q_tpch_q8").queryExecution.executedPlan
    val shuffleJoins = sp.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shuffleJoins.size <= 2, sp.toString)
    assert(sp.toString.contains("BroadcastHashJoin"), sp.toString)
    assert(!sp.toString.contains("CartesianProduct"), sp.toString)
  }

  test("q_ngram_novelty: first-occurrence is a partial aggregate, no window") {
    // hot boilerplate grams must collapse map-side (min(doc_id) partial),
    // and novelty must never plan a corpus-ordered window
    val sp = q("q_ngram_novelty").queryExecution.sparkPlan
    assert(sp.toString.contains("partial_min"), sp.toString)
    val windows = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, sp.toString)
    assert(!sp.toString.contains("CartesianProduct"), sp.toString)
  }

  test("mixture queries: corpus reduces before any cross join (one-row totals only)") {
    // q_mix_weights/q_token_budget cross-join ONE-ROW totals — every
    // BroadcastNestedLoopJoin in the plan must sit above the per-source
    // aggregate, so its inputs are |sources|-sized, never the corpus
    for (name <- Seq("q_mix_weights", "q_token_budget")) {
      val sp = q(name).queryExecution.sparkPlan
      val bad = sp.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
            if j.find(_.isInstanceOf[
              org.apache.spark.sql.execution.aggregate.BaseAggregateExec]).isEmpty => j
      }
      assert(bad.isEmpty, s"$name cross-joins un-aggregated input:\n$sp")
    }
  }

  test("q_hard_negatives: query block broadcasts, corpus never shuffle-joins") {
    val p = plan("q_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("media kernels are row-local: no join, no window in resize/frames") {
    for (name <- Seq("q_image_resize", "q_audio_frames")) {
      val sp = q(name).queryExecution.sparkPlan
      assert(!sp.toString.contains("Join"), s"$name:\n$sp")
      val windows = sp.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.isEmpty, s"$name:\n$sp")
    }
  }

  test("q_langid_confusion: totals ride as a broadcast") {
    val p = plan("q_langid_confusion")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("traversal/sweep-line queries plan no unpartitioned global window") {
    // q_theil_sen/q_holt_forecast: every window/fold partitioned by
    // series — a global window would serialize all series' pairs/values
    for (name <- Seq("q_interval_union", "q_concurrency_peak",
        "q_source_cap", "q_theil_sen", "q_holt_forecast")) {
      val sp = q(name).queryExecution.sparkPlan
      val globalWindows = sp.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty, s"$name:\n$sp")
    }
  }

  test("q_word_pmi: vocab cap and corpus size ride as broadcasts") {
    val p = plan("q_word_pmi")
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_bm25: df/avgdl ride as broadcasts, no cartesian product") {
    val p = plan("q_bm25")
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_rolling_median window is partitioned (parallel frames)") {
    val p = plan("q_rolling_median")
    assert(p.contains("Window"), p)
    // a partition-less window would print an empty partition spec
    assert(!p.contains("Window [collect_list") ||
      p.contains("windowspecdefinition(event_type"), p)
  }

  test("rank-based stats ride PrefixSum, never a corpus-global window") {
    // q_mannwhitney ranks (type, value) groups; q_abc_parts ranks parts
    // by revenue — both corpus-proportional relations where an
    // empty-partition-spec window is the classic scale killer
    for (name <- Seq("q_mannwhitney", "q_abc_parts")) {
      val sp = q(name).queryExecution.sparkPlan
      val globalWindows = sp.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty, s"$name:\n$sp")
    }
  }

  test("KMV sketches: per-source top-k windows are partitioned; " +
      "pair frames join on equality") {
    for (name <- Seq("q_kmv_distinct", "q_kmv_jaccard")) {
      val sp = q(name).queryExecution.sparkPlan
      val globalWindows = sp.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(globalWindows.isEmpty, s"$name:\n$sp")
      // the |sources|² pair expansion is a bounded dimension join — it
      // must never show up as a corpus-sized cartesian (the source pair
      // table itself is tiny; a NestedLoop over it is fine, over the
      // corpus-sized hash relation it is not)
      val p = sp.toString
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
    }
  }

  test("spatial radius join: salted grid equi-join, no nested-loop/cartesian") {
    // the 9-cell neighborhood fan is an explode + broadcast-hash join on
    // (cell, salt-bucket); a CartesianProduct or BroadcastNestedLoopJoin
    // here would mean the grid decayed into the O(n²) theta join
    for (name <- Seq("q_spatial_join", "q_spatial_cluster",
        "q_spatial_knn")) {
      val p = q(name).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
    }
    // the kNN rank window must be partitioned by point id — a global
    // (empty-partition) window would serialize the whole neighbor set
    // through one task
    val knnWindows = q("q_spatial_knn").queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(knnWindows.isEmpty, "q_spatial_knn has a global window")
  }

  test("q_hits/q_kcore: iterate on equi-joins with broadcast totals only") {
    for (name <- Seq("q_hits", "q_kcore", "q_weighted_path", "q_textrank")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
    }
  }

  test("q_rolling_wau: bounded fan-out join, no window at all") {
    val sp = q("q_rolling_wau").queryExecution.sparkPlan
    assert(sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, sp.toString)
  }

  test("q_pca_power output is the 64-row driver-assembled relation") {
    // the iterative work runs during construction against the ONE
    // checkpointed centered matrix; the final plan must be a local
    // 64-row scan — any parquet/join here would mean the loop's lineage
    // leaked into the result
    val p = plan("q_pca_power")
    assert(p.contains("LocalTableScan") || p.contains("localtablescan"), p)
    assert(!p.toLowerCase.contains("parquet") && !p.contains("Join"), p)
  }
}

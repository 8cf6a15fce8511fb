package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize._

/** Exact group quantiles with a STATISTICS-ADAPTIVE plan.
  *
  * A `Window.partitionBy(group).orderBy(value)` rank pick is exact and
  * cheap when every group fits one task's sort — but the group is the unit
  * of parallelism, so a 1e12-row group (or a `lit(1)` global quantile)
  * becomes a single-reducer straggler at 100 TB no matter how many
  * executors exist. The fix is not to always pay a multi-pass plan either:
  * at small group sizes the window sort IS the best plan (one shuffle,
  * few stages), and the multi-pass selection's extra stages would tax
  * every caller for a straggler they don't have.
  *
  * So this module dispatches like an optimizer, PER GROUP: groups at or
  * under `maxSortedGroup` rows (default 4M — a comfortably sub-second
  * single-task double sort) ride one window scan; only the hot groups
  * pay the TWO-LEVEL HISTOGRAM SELECTION:
  *
  *   pass 1  per-(group, bucket) counts over B range buckets, cumulated
  *           over ≤B tiny rows per group → the ONE bucket holding each
  *           target rank, and the rank's offset within it
  *   pass 2  re-bracket within that bucket (another ÷B)     [levels ≥ 2]
  *   final   row_number over ONLY the bracketed rows — ~n/B^levels per
  *           group instead of n
  *
  * Every selection pass is a scan + map-side-combinable aggregation or a
  * broadcast-joined filter; nothing buffers a whole group anywhere. A
  * bracket whose min == max IS the answer (massive ties cost nothing); a
  * bracket whose value range is not finite (NaN/±Inf) skips refinement
  * and is resolved exactly by the final window over that bracket —
  * graceful degradation, never a wrong answer. With B = 1024 and
  * levels = 2 the final sort touches ~n/1e6 of the group: a 1e12-row
  * group leaves ~1e6 rows for the one ranked pick, and the histogram
  * shuffles carry only groups × B pre-combined rows. `maxSortedGroup = 0`
  * forces the two-level path (probes, plan tests).
  *
  * The narrow (group, value) projection is materialized once with a lazy
  * `localCheckpoint` — the stats decision plus either plan re-scan it
  * 2–4×, and each re-scan would otherwise replay the caller's whole
  * upstream pipeline (measured 2–9× on computed inputs). Same "one
  * materialization pays for k passes" trade PrefixSum makes. When the
  * input is CHEAP TO RE-SCAN — its analyzed plan is only
  * Project/Filter over a leaf (a parquet/local relation, no join/agg/
  * window/generate upstream) — the checkpoint is pure loss (~1.3× at
  * 60 M rows, r15 bench) and is skipped automatically; `materializeInput`
  * overrides the heuristic in either direction for callers who know
  * better (e.g. a cached view that LOOKS computed, or an expensive
  * Project the heuristic can't see through).
  *
  * EAGER + ONE-SHOT semantics: the per-group stats that pick the plan run
  * at CALL time (one job over the input), and when the input is computed
  * the checkpointed narrow base is pinned as single-replica executor
  * blocks for the lifetime of the session — re-materializing the RETURNED
  * DataFrame after an executor loss cannot replay that lineage (rebuild
  * the plan by calling the method again, as FaultRun does), and repeated
  * calls in a long-lived session accrue storage until the source
  * DataFrames are GC'd. Bare-scan inputs skip the checkpoint and have
  * neither property on the cold path; the `...Windowed` forms never
  * checkpoint.
  *
  * Definitions: `groupQuantiles` = SQL `percentile_cont` (0-based
  * p = q·(n−1), result v_lo + (v_hi − v_lo)·(p − ⌊p⌋));
  * `groupQuantilesDisc` = SQL `percentile_disc` / DuckDB `quantile_disc`
  * (the element at 1-based rank max(⌈q·n⌉, 1) — an actual data value, so
  * strict comparisons against the cut are bit-stable across engines; the
  * r14 sf1 widening caught `quantile_cont` cuts differing by 1 ulp
  * between engines and flipping a strict `value < lo` count).
  *
  * Groups whose values are ALL NULL are kept (NULL cuts, n = 0), matching
  * SQL GROUP BY / DuckDB — the r14 window form dropped them (filter
  * before groupBy; advisor find). NULL group keys are a group, as in SQL.
  */
object Quantiles {

  private val B_DEFAULT = 1024

  /** Largest group the dispatcher hands to the single-task window sort. */
  val defaultMaxSortedGroup = 4000000L

  /** One row per group: the requested `(name, q)` interpolated quantiles
    * of `valueCol` plus the non-null count `n`.
    *
    * EAGER: the plan-picking stats job runs at call time. On computed
    * inputs the narrow base is localCheckpoint-pinned for the session
    * (see the object doc); `materializeInput` = Some(false) forces the
    * non-checkpointing behavior for long-lived sessions, Some(true)
    * forces materialization of an input the heuristic deems cheap.
    */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      quantiles: Seq[(String, Double)], buckets: Int = B_DEFAULT,
      levels: Int = 2,
      maxSortedGroup: Long = defaultMaxSortedGroup,
      materializeInput: Option[Boolean] = None): DataFrame =
    hybrid(df, groupCol, valueCol, quantiles, buckets, levels,
      maxSortedGroup, disc = false, materializeInput)

  /** DISCRETE (SQL type-1) group quantiles: the element at 1-based rank
    * max(⌈q·n⌉, 1) of the sorted non-null values. Same eager /
    * checkpoint semantics as [[groupQuantiles]].
    */
  def groupQuantilesDisc(df: DataFrame, groupCol: String, valueCol: String,
      quantiles: Seq[(String, Double)], buckets: Int = B_DEFAULT,
      levels: Int = 2,
      maxSortedGroup: Long = defaultMaxSortedGroup,
      materializeInput: Option[Boolean] = None): DataFrame =
    hybrid(df, groupCol, valueCol, quantiles, buckets, levels,
      maxSortedGroup, disc = true, materializeInput)

  /** Cheap-to-re-scan heuristic: true iff the analyzed plan is only
    * Project/Filter/alias nodes over a single leaf (file scan, local or
    * cached relation) — re-running it costs one columnar scan, so the
    * 2–4 hybrid passes are cheaper than pinning a checkpoint copy.
    * Anything with a join/aggregate/window/generate (or a multi-child
    * node) upstream is treated as expensive. Nondeterministic expressions
    * (rand(), uuid(), monotonically_increasing_id()) also force the
    * checkpoint: the hybrid re-scans the input for the dispatch count, the
    * window pass and the two-level stats, and a projection that evaluates
    * to DIFFERENT values per scan would silently drop rows outside the
    * pinned min/max brackets — cheapness is only safe when every re-scan
    * sees the same values.
    */
  private[graft] def cheapToRescan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def narrow(p: LogicalPlan): Boolean = p match {
      case _: LeafNode       => true
      case p: Project        => p.projectList.forall(_.deterministic) && narrow(p.child)
      case f: Filter         => f.condition.deterministic && narrow(f.child)
      case s: SubqueryAlias  => narrow(s.child)
      case _                 => false
    }
    narrow(df.queryExecution.analyzed)
  }

  // ------------------------------------------------------------------
  // PER-GROUP hybrid dispatch. The unit that straggles is the GROUP, so
  // the plan choice is per group, not per query: exact per-group stats
  // over a checkpointed narrow base decide; when no group exceeds the
  // cap, ONE window scan over the checkpointed base (the r14 plan);
  // otherwise only the hot groups pay the multi-pass two-level selection
  // (their list is bounded by totalRows/maxSortedGroup, so it
  // broadcasts) and the cold groups still ride the window scan, union.
  // Both paths are exact; the dispatch threshold is performance-only.
  // ------------------------------------------------------------------

  private def hybrid(df: DataFrame, groupCol: String, valueCol: String,
      quantiles: Seq[(String, Double)], buckets: Int, levels: Int,
      cap: Long, disc: Boolean,
      materializeInput: Option[Boolean] = None): DataFrame = {
    val names = quantiles.map(_._1)
    def windowAllOn(frame: DataFrame): DataFrame =
      if (disc) discWindowAll(frame, quantiles)
      else contWindowAll(frame, quantiles)
    def twoLevelOn(vs: DataFrame, st: DataFrame, lv: Int): DataFrame =
      if (disc) discTwoLevel(vs, st, quantiles, buckets, lv)
      else contTwoLevel(vs, st, quantiles, buckets, lv)
    // narrow checkpoint: the stats decision plus either plan re-scan this
    // 2-4x, and each re-scan would otherwise replay the caller's whole
    // upstream pipeline (measured 2-9x on computed inputs) — UNLESS the
    // input is a bare scan, where the re-scan is cheap and the checkpoint
    // is pure loss (r15 bench: ~1.3x uniform overhead on scan inputs)
    val narrowed = df.select(col(groupCol).as("__g"),
      col(valueCol).cast("double").as("__v"))
    val base =
      if (materializeInput.getOrElse(!cheapToRescan(df)))
        narrowed.graftCheckpoint(eager = false)
      else narrowed
    val vals = base.filter(col("__v").isNotNull)
    // full stats (count/min/max per group) feed 3-4 two-level passes, so
    // they checkpoint — but ONLY once the two-level path is chosen; the
    // common cold path must pin nothing (its decision job below is a
    // lighter count-only agg that is consumed once, eagerly)
    def fullStats(): DataFrame = base.groupBy("__g").agg(
      count(col("__v")).as("__n"), min("__v").as("__mn"),
      max("__v").as("__mx"))
      .graftCheckpoint(eager = false)
    if (cap == 0) { // forced two-level on every group (probes, plan tests)
      val stats = fullStats()
      return assemble(stats, twoLevelOn(vals, stats, levels), groupCol, names)
    }
    val mrow = base.groupBy("__g").agg(count(col("__v")).as("__n"))
      .agg(max("__n")).first()
    val maxN = if (mrow.isNullAt(0)) 0L else mrow.getLong(0)
    if (maxN <= cap)
      return rename(windowAllOn(base), groupCol, names)
    val stats = fullStats()
    // refinement depth from the KNOWN max group size: enough levels that
    // the final bracket (~maxN/B^L) fits a task's sort — one level covers
    // up to cap·B rows (4G at the defaults), two up to cap·B²
    val lv = math.max(1, math.ceil(
      math.log(maxN.toDouble / cap) / math.log(buckets.toDouble)).toInt)
    val hotG = stats.filter(col("__n") > cap)
    val hotKeys = broadcast(hotG.select(col("__g").as("__hk")))
    val cold = rename(windowAllOn(
      base.join(hotKeys, col("__g") <=> col("__hk"), "left_anti")),
      groupCol, names)
    // the hot slice feeds 2+ selection passes — materialize it once
    // rather than re-filtering the full base per pass
    val valsHot = vals.join(hotKeys, col("__g") <=> col("__hk"), "left_semi")
      .graftCheckpoint(eager = false)
    val hot = assemble(hotG, twoLevelOn(valsHot, hotG, lv), groupCol, names)
    cold.unionByName(hot)
  }

  private def rename(wide: DataFrame, groupCol: String,
      names: Seq[String]): DataFrame =
    wide.select(col("__g").as(groupCol) +: names.map(col) :+ col("n"): _*)

  /** Keep every group of `domain` (left join), restore the caller's
    * group-column name, n = 0 and NULL cuts for groups the core dropped.
    */
  private def assemble(domain: DataFrame, wide: DataFrame,
      groupCol: String, names: Seq[String]): DataFrame = {
    val dom = domain.select(col("__g").as("__dg"))
    dom.join(wide, col("__dg") <=> wide("__g"), "left")
      .select(col("__dg").as(groupCol) +: names.map(col) :+
        coalesce(col("n"), lit(0L)).as("n"): _*)
  }

  // ------------------------------------------------------------------
  // window cores (cold-group plan): ONE shuffle sort over (__g, __v)
  // INCLUDING null values — nulls sort first and ranks are shifted by
  // the per-group null count, so all-NULL groups survive to the groupBy
  // (NULL cuts, n = 0) without a separate domain pass.
  // ------------------------------------------------------------------

  private def contWindowAll(base: DataFrame,
      quantiles: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy("__g")
    val ranked = base
      .withColumn("__rn",
        row_number().over(w.orderBy(asc_nulls_first("__v"))))
      .withColumn("__nn", count(col("__v")).over(w))
      .withColumn("__nu", count(lit(1)).over(w) - col("__nn"))
    val aggs = quantiles.flatMap { case (name, qv) =>
      val p = lit(qv) * (col("__nn") - 1) // constant within a group
      Seq(
        min(when(col("__rn") - col("__nu") === floor(p) + 1, col("__v")))
          .as(s"__${name}_lo"),
        min(when(col("__rn") - col("__nu") === ceil(p) + 1, col("__v")))
          .as(s"__${name}_hi"),
        min(p - floor(p)).as(s"__${name}_f"))
    } :+ count(col("__v")).as("n")
    ranked.groupBy("__g")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("__g") +: quantiles.map { case (name, _) =>
        (col(s"__${name}_lo") +
          (col(s"__${name}_hi") - col(s"__${name}_lo")) * col(s"__${name}_f"))
          .as(name)
      } :+ col("n"): _*)
  }

  private def discWindowAll(base: DataFrame,
      quantiles: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy("__g")
    val ranked = base
      .withColumn("__rn",
        row_number().over(w.orderBy(asc_nulls_first("__v"))))
      .withColumn("__nn", count(col("__v")).over(w))
      .withColumn("__nu", count(lit(1)).over(w) - col("__nn"))
    val aggs = quantiles.map { case (name, qv) =>
      min(when(col("__rn") - col("__nu") ===
        greatest(ceil(lit(qv) * col("__nn")), lit(1L)), col("__v"))).as(name)
    } :+ count(col("__v")).as("n")
    ranked.groupBy("__g").agg(aggs.head, aggs.tail: _*)
  }

  // ------------------------------------------------------------------
  // two-level cores (huge-group plan)
  // ------------------------------------------------------------------

  private def contTwoLevel(vals: DataFrame, stats: DataFrame,
      quantiles: Seq[(String, Double)], buckets: Int,
      levels: Int): DataFrame = {
    // per-(group, quantile) target ranks: lo/hi elements around p = q(n−1)
    val spec = stats.filter(col("__n") > 0).select(
      col("__g"), col("__n"),
      explode(array(quantiles.map { case (name, qv) =>
        val p = lit(qv) * (col("__n") - 1).cast("double")
        struct(lit(name).as("__q"),
          (floor(p) + 1).cast("long").as("__rlo"),
          (ceil(p) + 1).cast("long").as("__rhi"),
          (p - floor(p)).as("__f"))
      }: _*)).as("__s"))
      .select(col("__g"), col("__n"), col("__s.__q"),
        col("__s.__rlo"), col("__s.__rhi"), col("__s.__f"))
    // distinct ranks to resolve (rlo == rhi whenever p is integral)
    val ranks = spec.select(col("__g"), explode(array(col("__rlo"),
      col("__rhi"))).as("__r")).distinct()
    val got = rankSelect(vals, stats, ranks, buckets, levels)
    // null-safe on the group key: a NULL group key is a group in SQL
    val gotLo = got.select(col("__g").as("__lg"), col("__r").as("__lr"),
      col("__rv").as("__vlo"))
    val gotHi = got.select(col("__g").as("__hg"), col("__r").as("__hr"),
      col("__rv").as("__vhi"))
    spec
      .join(gotLo,
        col("__g") <=> col("__lg") && col("__rlo") === col("__lr"))
      .join(gotHi,
        col("__g") <=> col("__hg") && col("__rhi") === col("__hr"))
      .select(col("__g"), col("__n"), col("__q"),
        (col("__vlo") + (col("__vhi") - col("__vlo")) * col("__f"))
          .as("__qv"))
      .groupBy("__g")
      .agg(first("__n").as("n"), quantiles.map { case (name, _) =>
        min(when(col("__q") === name, col("__qv"))).as(name)
      }: _*)
  }

  private def discTwoLevel(vals: DataFrame, stats: DataFrame,
      quantiles: Seq[(String, Double)], buckets: Int,
      levels: Int): DataFrame = {
    val spec = stats.filter(col("__n") > 0).select(
      col("__g"), col("__n"),
      explode(array(quantiles.map { case (name, qv) =>
        struct(lit(name).as("__q"),
          greatest(ceil(lit(qv) * col("__n")), lit(1L)).cast("long")
            .as("__r"))
      }: _*)).as("__s"))
      .select(col("__g"), col("__n"), col("__s.__q"), col("__s.__r"))
    val ranks = spec.select("__g", "__r").distinct()
    val got = rankSelect(vals, stats, ranks, buckets, levels)
      .select(col("__g").as("__gg"), col("__r").as("__gr"), col("__rv"))
    spec.join(got,
        col("__g") <=> col("__gg") && col("__r") === col("__gr"))
      .groupBy("__g")
      .agg(first("__n").as("n"), quantiles.map { case (name, _) =>
        min(when(col("__q") === name, col("__rv"))).as(name)
      }: _*)
  }

  /** Exact rank selection: for each (group __g, 1-based rank __r) in
    * `ranks`, the element at that rank of the group's ascending non-null
    * values → (__g, __r, __rv). Histogram-brackets the rank through
    * `levels` rounds of B range buckets, then ranks only the final
    * bracket. Spark NaN semantics (NaN = NaN, NaN greatest) make the
    * comparisons total; non-finite brackets skip refinement (resolved by
    * the final window over the bracket — exact, just unnarrowed).
    */
  private def rankSelect(vals: DataFrame, stats: DataFrame,
      ranks: DataFrame, buckets: Int, levels: Int): DataFrame = {
    require(levels >= 1 && buckets >= 2)
    val bLit = lit(buckets.toDouble)
    // needs: one row per (group, rank) with the current bracket
    //   [__lo, __hi] (inclusive value bounds known to contain the rank),
    //   __rib = the rank RELATIVE to the bracket's sorted values,
    //   __done = resolved value (non-null once known).
    var needs = ranks.join(stats.withColumnRenamed("__g", "__sg"),
        col("__g") <=> col("__sg"))
      .select(col("__g"), col("__r"), col("__r").as("__rib"),
        col("__mn").as("__lo"), col("__mx").as("__hi"),
        when(col("__mn") === col("__mx"), col("__mn")).as("__done"))

    for (level <- 1 to levels) {
      // a bracket refines only when open and its width is a finite > 0
      // double; NaN/Inf-polluted brackets fall through to the final window
      val width = col("__hi") - col("__lo")
      val active = needs.filter(col("__done").isNull &&
        width > 0 && !isnan(width) &&
        width =!= lit(Double.PositiveInfinity))
      val rest = needs.filter(!(col("__done").isNull &&
        width > 0 && !isnan(width) &&
        width =!= lit(Double.PositiveInfinity)))
      // level 1's bracket is the whole group for every rank: build ONE
      // shared per-(group, bucket) histogram instead of replicating the
      // data per rank — the big-data pass stays ×1
      val refined = if (level == 1) {
        val withB = vals.join(broadcast(
            stats.select(col("__g").as("__sg"), col("__mn"), col("__mx"))
              .filter(!isnan(col("__mx") - col("__mn")) &&
                (col("__mx") - col("__mn")) > 0 &&
                (col("__mx") - col("__mn")) =!= lit(Double.PositiveInfinity))),
            col("__g") <=> col("__sg"))
          .withColumn("__b", least(
            floor((col("__v") - col("__mn")) / (col("__mx") - col("__mn"))
              * bLit).cast("long"), lit(buckets - 1L)))
        val hist = withB.groupBy("__g", "__b").agg(
            count(lit(1)).as("__c"),
            min("__v").as("__bmn"), max("__v").as("__bmx"))
          .withColumn("__cb",
            sum("__c").over(Window.partitionBy("__g").orderBy("__b"))
              - col("__c"))
        locate(active, hist, perRank = false)
      } else {
        val joined = vals.join(broadcast(active
            .select(col("__g").as("__sg"), col("__r").as("__sr"),
              col("__lo"), col("__hi"))),
          col("__g") <=> col("__sg") &&
            col("__v") >= col("__lo") && col("__v") <= col("__hi"))
          .withColumn("__b", least(
            floor((col("__v") - col("__lo")) / (col("__hi") - col("__lo"))
              * bLit).cast("long"), lit(buckets - 1L)))
        val hist = joined.groupBy(col("__g"), col("__sr").as("__hr"),
            col("__b"))
          .agg(count(lit(1)).as("__c"),
            min("__v").as("__bmn"), max("__v").as("__bmx"))
          .withColumn("__cb",
            sum("__c").over(Window.partitionBy("__g", "__hr").orderBy("__b"))
              - col("__c"))
        locate(active, hist, perRank = true)
      }
      needs = refined.unionByName(rest)
    }

    val open = needs.filter(col("__done").isNull)
      .select(col("__g").as("__sg"), col("__r").as("__sr"),
        col("__rib"), col("__lo"), col("__hi"))
    // final exact pick: rank only the bracketed rows; partition size is
    // the bracket count (~n/B^levels), not the group
    val picked = vals.join(broadcast(open),
        col("__g") <=> col("__sg") &&
          col("__v") >= col("__lo") && col("__v") <= col("__hi"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__g", "__sr").orderBy("__v")))
      .filter(col("__rn") === col("__rib"))
      .select(col("__g"), col("__sr").as("__r"), col("__v").as("__rv"))
    needs.filter(col("__done").isNotNull)
      .select(col("__g"), col("__r"), col("__done").as("__rv"))
      .unionByName(picked)
  }

  /** Bucket location: join each (group, rank) need to the one histogram
    * row whose cumulative range covers the in-bracket rank. `perRank`
    * matches the level-≥2 per-(group, rank) histogram key.
    */
  private def locate(active: DataFrame, hist: DataFrame,
      perRank: Boolean): DataFrame = {
    val h = hist.withColumnRenamed("__g", "__hg")
    val cond = col("__g") <=> col("__hg") &&
      col("__rib") > col("__cb") && col("__rib") <= col("__cb") + col("__c")
    active.join(h,
        if (perRank) cond && col("__r") === col("__hr") else cond)
      .select(col("__g"), col("__r"),
        (col("__rib") - col("__cb")).as("__rib"),
        col("__bmn").as("__lo"), col("__bmx").as("__hi"),
        when(col("__bmn") === col("__bmx"), col("__bmn")).as("__done"))
  }

  // ------------------------------------------------------------------
  // r14 window formulations, kept verbatim as the equivalence reference
  // for QuantilesTwoLevelSpec (they drop all-NULL groups — the public
  // forms keep them).
  // ------------------------------------------------------------------

  private[graft] def groupQuantilesWindowed(df: DataFrame, groupCol: String,
      valueCol: String, quantiles: Seq[(String, Double)]): DataFrame =
    contWindowAll(
      df.filter(col(valueCol).isNotNull)
        .select(col(groupCol).as("__g"),
          col(valueCol).cast("double").as("__v")),
      quantiles).withColumnRenamed("__g", groupCol)

  private[graft] def groupQuantilesDiscWindowed(df: DataFrame,
      groupCol: String, valueCol: String,
      quantiles: Seq[(String, Double)]): DataFrame =
    discWindowAll(
      df.filter(col(valueCol).isNotNull)
        .select(col(groupCol).as("__g"),
          col(valueCol).cast("double").as("__v")),
      quantiles).withColumnRenamed("__g", groupCol)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.expressions.Hashing
import graft.Materialize._

/** KMV (k-minimum-values) distinct sketches over per-source character
  * shingles: mergeable cardinality + Jaccard estimation with a FIXED
  * k·|sources| memory footprint — the sketch family for "how much do two
  * crawls overlap" questions where exact distinct-intersections would
  * shuffle the full token universe.
  *
  * Hashes are sha60 (expressions/Hashing.scala) so the DuckDB oracle
  * replays them bit-for-bit; everything up to the final estimate division
  * is integer arithmetic — no float drift anywhere.
  *
  * Scale shape: the only corpus-sized stage is the distinct (source,
  * hash) aggregate. Per-source top-k then runs in TWO phases — a local
  * top-k per (source, physical partition), then a global top-k over the
  * ≤ k·P candidates — so no window ever sees a corpus-sized frame (same
  * two-phase contract as ops/PrefixSum). Pair frames are ≤ 2k rows per
  * source pair.
  */
object SketchQueries {

  private val K = 256
  /** 2^60 — the sha60 hash space size; estimator scale constant. */
  private val MaxH = 1152921504606846976L

  /** Distinct (source, sha60(char-8-shingle)) pairs. Dedup runs on the
    * shingle STRINGS first and sha60 only on the survivors — the corpus
    * repeats each distinct shingle ~25× here, so hashing after the
    * distinct cuts the sha256 work by that factor for a slightly wider
    * shuffle row (probe at sf0.1: q_kmv_distinct 7.3 → 3.8 s cold /
    * 2.8 s warm, together with the shared-materialization fix below).
    */
  private def hashes(s: SparkSession, dir: String): DataFrame = {
    val t = graft.dedup.Dedup.normalized(col("text"))
    Tables.t(s, dir, "documents")
      .select(col("source"), col("text"))
      // one-file fixture scan = one task; the explode + substring +
      // map-side distinct partials below are the corpus-sized hot loop
      // (measured 2.0 s single-task at sf0.1) — spread first (no-op on
      // multi-split inputs)
      .graftSpread()
      .select(col("source"), t.as("t"))
      .filter(length(col("t")) >= 8) // sequence(1, n<1) would descend
      .withColumn("i", explode(sequence(lit(1), length(col("t")) - 7)))
      .select(col("source"), expr("substring(t, i, 8)").as("sh"))
      .distinct()
      .select(col("source"), Hashing.sha60(col("sh")).as("h"))
  }

  /** Per-source KMV sketch: the K smallest hashes via the bounded
    * [[graft.expressions.BottomKLongs]] aggregate — O(K) heap state on
    * the map AND reduce side, shuffle carries ≤ K longs per (source,
    * map partition), no sort anywhere. Replaces the r13 two-phase
    * local/global row_number windows, which paid a full sort of the
    * corpus-sized hash table per window (same k-smallest result —
    * bottom-k of merged partial bottom-ks IS the global bottom-k, and
    * the hash table is distinct so ties don't exist).
    */
  private def sketchFrom(hashed: DataFrame): DataFrame =
    hashed.groupBy("source")
      .agg(graft.expressions.BottomKLongs
        .bottomK(hashed.sparkSession, col("h"), K).as("__bk"))
      .select(col("source"), explode(col("__bk")).as("h"))

  private def sketch(s: SparkSession, dir: String): DataFrame =
    sketchFrom(hashes(s, dir))

  // dedup in the SHINGLE-STRING domain then hash — the same order as the
  // Spark side, so a sha60 collision between two distinct shingles yields
  // a duplicate h in BOTH engines (r9 advice: the previous DISTINCT-over-h
  // oracle deduped in the hash domain, a ~n²/2⁶¹ contract asymmetry)
  private val hashesSql =
    s"""SELECT source,
       |    ${Hashing.sha60Sql("sh")} AS h
       |  FROM (SELECT DISTINCT source, substr(t, CAST(i AS INT), 8) AS sh
       |  FROM (SELECT source, t, unnest(range(1, len(t) - 6)) AS i
       |    FROM (SELECT source,
       |        lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
       |      FROM documents)))""".stripMargin

  private val sketchSql =
    s"""SELECT source, h FROM (
       |  SELECT source, h, row_number() OVER (PARTITION BY source
       |    ORDER BY h) AS r
       |  FROM ($hashesSql)) WHERE r <= $K""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // PER-SOURCE cardinality estimate: (k−1)·2⁶⁰/h_k when the sketch is
    // full, exact when the source has < k distinct shingles — compared
    // in-engine against the true distinct count so the estimator's error
    // is part of the gated evidence.
    QueryDef(
      "q_kmv_distinct",
      Some(s"""WITH sk AS ($sketchSql),
             |st AS (SELECT source, CAST(count(*) AS BIGINT) AS sk_size,
             |    CAST(max(h) AS BIGINT) AS hk
             |  FROM sk GROUP BY 1),
             |ex AS (SELECT source, CAST(count(*) AS BIGINT) AS exact
             |  FROM ($hashesSql) GROUP BY 1)
             |SELECT st.source, st.sk_size, ex.exact,
             |  round(CASE WHEN st.sk_size < $K THEN st.sk_size
             |    ELSE ($K - 1) * ${MaxH}.0 / st.hk END, 2) AS est,
             |  round(abs(CASE WHEN st.sk_size < $K THEN st.sk_size
             |      ELSE ($K - 1) * ${MaxH}.0 / st.hk END - ex.exact)
             |    / ex.exact, 4) AS rel_err
             |FROM st JOIN ex USING (source)""".stripMargin),
      (s, dir) => {
        // one materialization feeds both the sketch and the exact count —
        // the hash relation is the expensive corpus-sized stage
        val h = hashes(s, dir).graftCheckpoint()
        val st = sketchFrom(h).groupBy("source")
          .agg(count(lit(1)).as("sk_size"), max("h").as("hk"))
        val ex = h.groupBy("source")
          .agg(count(lit(1)).as("exact"))
        val est = when(col("sk_size") < K, col("sk_size"))
          .otherwise(lit(K - 1) * lit(MaxH.toDouble) / col("hk"))
        st.join(ex, "source")
          .select(col("source"), col("sk_size"), col("exact"),
            round(est, 2).as("est"),
            round(abs(est - col("exact")) / col("exact"), 4).as("rel_err"))
      }),

    // PAIRWISE Jaccard estimate between sources from MERGED sketches:
    // take the k smallest of each pair's hash union, count how many live
    // in both sketches — Ĵ = |M_k ∩ A ∩ B| / k — and scale the union
    // estimate into an intersection size. All frames ≤ 2k rows per pair;
    // |sources|² pair table is a governance dimension, never corpus-sized.
    QueryDef(
      "q_kmv_jaccard",
      Some(s"""WITH sk AS ($sketchSql),
             |src AS (SELECT DISTINCT source FROM sk),
             |pr AS (SELECT a.source AS sa, b.source AS sb
             |  FROM src a JOIN src b ON a.source < b.source),
             |u AS (SELECT pr.sa, pr.sb, sk.h,
             |    max(CASE WHEN sk.source = pr.sa THEN 1 ELSE 0 END) AS ina,
             |    max(CASE WHEN sk.source = pr.sb THEN 1 ELSE 0 END) AS inb
             |  FROM pr JOIN sk ON sk.source IN (pr.sa, pr.sb)
             |  GROUP BY 1, 2, 3),
             |rk AS (SELECT sa, sb, h, ina, inb,
             |    row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS r
             |  FROM u),
             |m AS (SELECT sa, sb,
             |    CAST(count(*) AS BIGINT) AS k_used,
             |    CAST(sum(ina * inb) AS BIGINT) AS n_both,
             |    CAST(max(h) AS BIGINT) AS hk
             |  FROM rk WHERE r <= $K GROUP BY 1, 2)
             |SELECT sa, sb, k_used, n_both,
             |  round(n_both / CAST(k_used AS DOUBLE), 4) AS jaccard_est,
             |  round(n_both / CAST(k_used AS DOUBLE)
             |    * (CASE WHEN k_used < $K THEN k_used
             |        ELSE ($K - 1) * ${MaxH}.0 / hk END), 2)
             |    AS intersection_est
             |FROM m""".stripMargin),
      (s, dir) => {
        val sk = sketch(s, dir).graftCheckpoint() // reused 3× below
        val src = sk.select("source").distinct()
        val pr = src.select(col("source").as("sa"))
          .join(src.select(col("source").as("sb")), col("sa") < col("sb"))
        val ua = sk.join(pr, sk("source") === col("sa"))
          .select(col("sa"), col("sb"), col("h"), lit(1).as("ina"),
            lit(0).as("inb"))
        val ub = sk.join(pr, sk("source") === col("sb"))
          .select(col("sa"), col("sb"), col("h"), lit(0).as("ina"),
            lit(1).as("inb"))
        val u = ua.unionByName(ub)
          .groupBy("sa", "sb", "h")
          .agg(max("ina").as("ina"), max("inb").as("inb"))
        val w = Window.partitionBy("sa", "sb").orderBy("h")
        val m = u.withColumn("r", row_number().over(w))
          .filter(col("r") <= K)
          .groupBy("sa", "sb")
          .agg(count(lit(1)).as("k_used"),
            sum(col("ina") * col("inb")).as("n_both"),
            max("h").as("hk"))
        val uEst = when(col("k_used") < K, col("k_used"))
          .otherwise(lit(K - 1) * lit(MaxH.toDouble) / col("hk"))
        m.select(col("sa"), col("sb"), col("k_used"), col("n_both"),
          round(col("n_both") / col("k_used").cast("double"), 4)
            .as("jaccard_est"),
          round(col("n_both") / col("k_used").cast("double") * uEst, 2)
            .as("intersection_est"))
      }),

    // MERGEABLE QUANTILE SKETCH (ops/QuantileSketch): per-source
    // log-bucketed percentile summaries, PERSISTED to the warehouse and
    // read back (the daily-pipeline shape), with the global distribution
    // obtained by MERGING the per-source sketches — never re-scanning the
    // data. p50/p90/p99 estimates are compared in-engine against the
    // exact integer-rank percentile, so the ≤1/32 error bound is gated
    // evidence, KMV-style. Exact side runs on the (source, cents)
    // distinct-value relation — value-DOMAIN bounded, not corpus-bounded.
    QueryDef(
      "q_quantile_sketch",
      Some(s"""WITH ev AS (SELECT event_type AS source,
             |    CAST(round(value * 100, 0) AS BIGINT) AS c FROM events),
             |b AS (SELECT source, c, ${graft.ops.QuantileSketch.ixSql} AS ix,
             |    ${graft.ops.QuantileSketch.rep2xSql} AS rep2x FROM ev),
             |sk0 AS (SELECT source, ix, rep2x,
             |    CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2, 3),
             |sk AS (SELECT * FROM sk0 UNION ALL
             |  SELECT 'ALL', ix, rep2x, CAST(sum(cnt) AS BIGINT)
             |  FROM sk0 GROUP BY 2, 3),
             |n AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n
             |  FROM sk GROUP BY 1),
             |qs(pct, num, den) AS (VALUES (50,1,2), (90,9,10), (99,99,100)),
             |tgt AS (SELECT n.source, qs.pct,
             |    (n.n * qs.num + qs.den - 1) // qs.den AS r FROM n, qs),
             |cum AS (SELECT source, ix, rep2x,
             |    sum(cnt) OVER (PARTITION BY source ORDER BY ix) AS cum
             |  FROM sk),
             |est AS (SELECT c2.source, t.pct, min(c2.rep2x) / 2.0 AS est
             |  FROM cum c2 JOIN tgt t
             |  ON t.source = c2.source AND c2.cum >= t.r GROUP BY 1, 2),
             |ba AS (SELECT source, c FROM ev
             |  UNION ALL SELECT 'ALL', c FROM ev),
             |vc AS (SELECT source, c, CAST(count(*) AS BIGINT) AS vcnt
             |  FROM ba GROUP BY 1, 2),
             |vcum AS (SELECT source, c,
             |    sum(vcnt) OVER (PARTITION BY source ORDER BY c) AS cum
             |  FROM vc),
             |ex AS (SELECT v.source, t.pct, CAST(min(v.c) AS BIGINT) AS exact
             |  FROM vcum v JOIN tgt t
             |  ON t.source = v.source AND v.cum >= t.r GROUP BY 1, 2)
             |SELECT est.source, CAST(est.pct AS INT) AS pct, est.est,
             |  ex.exact,
             |  round(abs(est.est - ex.exact) / ex.exact, 4) AS rel_err
             |FROM est JOIN ex
             |ON ex.source = est.source AND ex.pct = est.pct""".stripMargin),
      (s, dir) => {
        import graft.ops.QuantileSketch
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.t(s, dir, "events")
          .select(col("event_type").as("source"),
            round(col("value") * 100, 0).cast("long").as("c"))
        // persist the per-source sketch, read it back — the estimate side
        // only ever sees warehouse rows (mergeable state, like the
        // incremental-dedup index)
        val wh = new graft.tables.Warehouse(s,
          java.nio.file.Files.createTempDirectory("graft-qsk").toString)
        wh.appendIfAbsent("qsketch", QuantileSketch.build(ev),
          Seq("source", "ix"))
        val sk0 = wh.read("qsketch")
        val global = sk0.withColumn("source", lit("ALL"))
        val sk = QuantileSketch.merge(sk0, global)
        val pcts = Seq((50, 1, 2), (90, 9, 10), (99, 99, 100))
        val est = QuantileSketch.estimate(sk, pcts)
        // exact integer-rank percentiles over the distinct-cents relation
        val ba = ev.unionByName(ev.withColumn("source", lit("ALL")))
        val vc = ba.groupBy("source", "c").agg(count(lit(1)).as("vcnt"))
        val vcum = vc.withColumn("cum",
          sum("vcnt").over(Window.partitionBy("source").orderBy("c")))
        val n = ba.groupBy("source").agg(count(lit(1)).as("n"))
        val qs = s.createDataFrame(pcts).toDF("pct", "num", "den")
        val tgt = n.crossJoin(broadcast(qs))
          .withColumn("r", expr("(n * num + den - 1) div den"))
          .select("source", "pct", "r")
        val ex = vcum.join(tgt, Seq("source"))
          .filter(col("cum") >= col("r"))
          .groupBy("source", "pct")
          .agg(min("c").as("exact"))
        est.join(ex, Seq("source", "pct"))
          .select(col("source"), col("pct"), col("est"), col("exact"),
            round(abs(col("est") - col("exact")) / col("exact"), 4)
              .as("rel_err"))
      }),

    // CROSS-SOURCE DISTRIBUTION DRIFT from merged sketches: total-
    // variation distance between each source's bucket distribution and
    // the all-source mixture, in EXACT integer arithmetic (|cs·ng−cg·ns|
    // sums — order-independent, unlike a float Σ|p−q|), with one final
    // division. The cross products are widened to 128-bit BEFORE the
    // multiply (DecimalType(38,0) here, HUGEINT on the oracle) because at
    // the corpus scale this module advertises (ng ≳ 3e9 with comparable
    // per-source cs) cs·ng overflows a 64-bit Long — Spark would wrap
    // silently in non-ANSI mode while DuckDB raises, i.e. the engines
    // would diverge exactly when the at-scale claim is invoked. The
    // feature-drift monitor a training pipeline runs daily against
    // persisted sketches — everything here is bucket-dimension sized
    // once the sketch exists.
    QueryDef(
      "q_sketch_drift",
      Some(s"""WITH ev AS (SELECT event_type AS source,
             |    CAST(round(value * 100, 0) AS BIGINT) AS c FROM events),
             |b AS (SELECT source, c, ${graft.ops.QuantileSketch.ixSql} AS ix
             |  FROM ev),
             |sk0 AS (SELECT source, ix, CAST(count(*) AS BIGINT) AS cnt
             |  FROM b GROUP BY 1, 2),
             |gl AS (SELECT ix, CAST(sum(cnt) AS BIGINT) AS gc
             |  FROM sk0 GROUP BY 1),
             |ns AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS ns
             |  FROM sk0 GROUP BY 1),
             |ng AS (SELECT CAST(sum(gc) AS BIGINT) AS ng FROM gl),
             |grid AS (SELECT s.source, g.ix, g.gc,
             |    coalesce(k.cnt, 0) AS cs
             |  FROM (SELECT DISTINCT source FROM sk0) s
             |  CROSS JOIN gl g
             |  LEFT JOIN sk0 k ON k.source = s.source AND k.ix = g.ix)
             |SELECT grid.source, ns.ns AS n,
             |  round(sum(abs(CAST(cs AS HUGEINT) * ng.ng
             |                - CAST(gc AS HUGEINT) * ns.ns))
             |    / (2.0 * ns.ns * ng.ng), 6) AS tv_dist
             |FROM grid JOIN ns ON ns.source = grid.source CROSS JOIN ng
             |GROUP BY 1, 2, ng.ng""".stripMargin),
      (s, dir) => {
        import graft.ops.QuantileSketch
        val ev = Tables.t(s, dir, "events")
          .select(col("event_type").as("source"),
            round(col("value") * 100, 0).cast("long").as("c"))
        val sk0 = QuantileSketch.build(ev).drop("rep2x").graftCheckpoint()
        val glob = sk0.groupBy("ix").agg(sum("cnt").as("gc"))
        val ns = sk0.groupBy("source").agg(sum("cnt").as("ns"))
        val ng = glob.agg(sum("gc").as("ng"))
        val grid = sk0.select("source").distinct()
          .crossJoin(broadcast(glob))
          .join(sk0.withColumnRenamed("cnt", "cs"), Seq("source", "ix"),
            "left_outer")
          .withColumn("cs", coalesce(col("cs"), lit(0L)))
        grid.join(broadcast(ns), Seq("source"))
          .crossJoin(broadcast(ng))
          .groupBy("source", "ns", "ng")
          .agg(sum(abs(col("cs").cast("decimal(38,0)") * col("ng")
              - col("gc").cast("decimal(38,0)") * col("ns")))
            .as("num"))
          .select(col("source"), col("ns").as("n"),
            round(col("num") / (lit(2.0) * col("ns") * col("ng")), 6)
              .as("tv_dist"))
      })
  )
}

package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.ops.Quantiles

/** Equivalence of the two-level histogram-selection quantiles against the
  * previous per-group window-sort form AND a driver-side exact reference,
  * across the shapes that break naive bracketing: heavy ties, single-value
  * groups, single-element groups, outlier-stretched ranges (one value 1e12
  * away crushes the rest into one bucket — the refinement level must
  * re-bracket), all-NULL groups (kept with NULL cuts / n = 0 by the
  * two-level form, like SQL GROUP BY), NULL group keys, and tiny bucket
  * counts that force multi-level narrowing.
  */
class QuantilesTwoLevelSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)

  /** Deterministic pseudo-random fixture: ~n rows over k groups with ties,
    * negatives, and per-group value offsets.
    */
  private def fixture(n: Int, k: Int): DataFrame =
    spark.range(n).select(
      concat(lit("g"), pmod(col("id") * 2654435761L, lit(k))).as("g"),
      // xorshift-ish mix, then modulo to force ties
      (pmod(col("id") * 1103515245L + 12345L, lit(997)).cast("double")
        - 498.0 + pmod(col("id"), lit(7)).cast("double") / 3.0).as("v"))

  private def sortedRows(df: DataFrame): Seq[Row] =
    df.collect().sortBy(_.mkString("|")).toSeq

  /** Driver-side exact percentile_cont per group. */
  private def refCont(rows: Seq[(String, Option[Double])], q: Double)
      : Map[String, Option[Double]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val vs = rs.flatMap(_._2).sorted
      g -> (if (vs.isEmpty) None else {
        val p = q * (vs.length - 1)
        val lo = vs(p.toInt)
        val hi = vs(math.ceil(p).toInt)
        Some(lo + (hi - lo) * (p - math.floor(p)))
      })
    }

  /** Driver-side exact percentile_disc (type 1) per group. */
  private def refDisc(rows: Seq[(String, Option[Double])], q: Double)
      : Map[String, Option[Double]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val vs = rs.flatMap(_._2).sorted
      g -> (if (vs.isEmpty) None
            else Some(vs(math.max(math.ceil(q * vs.length).toInt, 1) - 1)))
    }

  private def checkAgainstWindowed(df: DataFrame): Unit = {
    // the windowed form drops all-NULL groups (their n would be 0);
    // compare on its domain
    val tl = Quantiles.groupQuantiles(df, "g", "v", qs, buckets = 16,
        maxSortedGroup = 0).filter(col("n") > 0)
    val win = Quantiles.groupQuantilesWindowed(df, "g", "v", qs)
    assert(sortedRows(tl) == sortedRows(win))
    val tld = Quantiles.groupQuantilesDisc(df, "g", "v", qs, buckets = 16,
        maxSortedGroup = 0).filter(col("n") > 0)
    val wind = Quantiles.groupQuantilesDiscWindowed(df, "g", "v", qs)
    assert(sortedRows(tld) == sortedRows(wind))
  }

  test("two-level == windowed on a mixed random fixture (small buckets)") {
    checkAgainstWindowed(fixture(20000, 13))
  }

  test("two-level == windowed under heavy ties (3 distinct values)") {
    val df = spark.range(30000).select(
      concat(lit("g"), pmod(col("id"), lit(5))).as("g"),
      pmod(col("id"), lit(3)).cast("double").as("v"))
    checkAgainstWindowed(df)
  }

  test("outlier-stretched range still resolves exactly") {
    // one value 1e12 away: level-1 crams everything else into bucket 0;
    // the refinement level must re-bracket inside it
    val base = spark.range(9999).select(lit("g0").as("g"),
      (col("id").cast("double") / 7.0).as("v"))
    val df = base.unionByName(
      Seq(("g0", 1e12)).toDF("g", "v"))
    val got = Quantiles.groupQuantiles(df, "g", "v", qs, buckets = 16,
        maxSortedGroup = 0).collect().head
    val rows = df.collect().map(r => (r.getString(0),
      Option(r.get(1)).map(_.toString.toDouble))).toSeq
    qs.zipWithIndex.foreach { case ((_, qv), i) =>
      val want = refCont(rows, qv)("g0").get
      assert(math.abs(got.getDouble(i + 1) - want) <= math.ulp(want),
        s"q=$qv got=${got.getDouble(i + 1)} want=$want")
    }
  }

  test("single-element and single-value groups") {
    val df = Seq(("a", 5.0), ("b", 2.0), ("b", 2.0), ("b", 2.0),
      ("c", -1.0), ("c", 4.0)).toDF("g", "v")
    val got = Quantiles.groupQuantiles(df, "g", "v", Seq("p50" -> 0.5))
      .orderBy("g").collect()
    assert(got.map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSeq == Seq(("a", 5.0, 1L), ("b", 2.0, 3L), ("c", 1.5, 2L)))
  }

  test("all-NULL group kept with NULL cuts and n=0; NULL group key is a group") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)),
      ("deadg", None), ("deadg", None),
      (null.asInstanceOf[String], Some(7.0)),
      (null.asInstanceOf[String], Some(9.0))).toDF("g", "v")
    def rows(msg: Long) = Quantiles
      .groupQuantiles(df, "g", "v", Seq("p50" -> 0.5), maxSortedGroup = msg)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2)))
      .toSet
    // both the window path (default, small groups) and the forced
    // two-level path must keep the all-NULL group
    val got = rows(Quantiles.defaultMaxSortedGroup)
    assert(rows(0L) == got)
    assert(got == Set(
      (Some("a"), Some(2.0), 2L),
      (Some("deadg"), None, 0L),
      (None, Some(8.0), 2L)))
    val gotD = Quantiles.groupQuantilesDisc(df, "g", "v", Seq("p50" -> 0.5))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2)))
      .toSet
    assert(gotD == Set(
      (Some("a"), Some(1.0), 2L),
      (Some("deadg"), None, 0L),
      (None, Some(7.0), 2L)))
  }

  test("matches driver-side exact reference incl. disc type-1 convention") {
    val df = fixture(5000, 7)
    val rows = df.collect().map(r => (r.getString(0),
      Option(r.get(1)).map(_.toString.toDouble))).toSeq
    val got = Quantiles.groupQuantiles(df, "g", "v", qs, buckets = 8,
        maxSortedGroup = 0).collect().map(r => r.getString(0) ->
        qs.indices.map(i => r.getDouble(i + 1))).toMap
    qs.zipWithIndex.foreach { case ((_, qv), i) =>
      val want = refCont(rows, qv)
      want.foreach { case (g, Some(w)) =>
        assert(math.abs(got(g)(i) - w) <= 4 * math.ulp(w),
          s"cont g=$g q=$qv got=${got(g)(i)} want=$w")
      case _ => ()
      }
    }
    val gotD = Quantiles.groupQuantilesDisc(df, "g", "v", qs, buckets = 8,
        maxSortedGroup = 0).collect().map(r => r.getString(0) ->
        qs.indices.map(i => r.getDouble(i + 1))).toMap
    qs.zipWithIndex.foreach { case ((_, qv), i) =>
      val want = refDisc(rows, qv)
      want.foreach { case (g, Some(w)) =>
        assert(gotD(g)(i) == w, s"disc g=$g q=$qv got=${gotD(g)(i)} want=$w")
      case _ => ()
      }
    }
  }

  test("no data-sized unpartitioned window in a lit(1) global-quantile plan") {
    // partitionBy(lit(1)) constant-folds to an EMPTY partition spec; that
    // is fine over the ≤B-row histogram or the bracket-filtered pick, but
    // must never sit directly over the raw data (the single-task global
    // sort this module replaces). Structural gate: every empty-spec
    // WindowExec must have an aggregate (histogram) or a join (bracket
    // filter) below it.
    val df = spark.range(100000).select(lit(1).as("g"),
      pmod(col("id") * 48271L, lit(99991)).cast("double").as("v"))
    val sp = Quantiles.groupQuantiles(df, "g", "v", Seq("p50" -> 0.5),
        maxSortedGroup = 0).queryExecution.sparkPlan
    val bad = sp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty &&
            w.child.collectFirst {
              case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
              case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
            }.isEmpty => w
    }
    assert(bad.isEmpty, sp.toString)
    // and a non-constant group key must never produce an empty spec at all
    val df2 = spark.range(100000).select(pmod(col("id"), lit(5)).as("g"),
      pmod(col("id") * 48271L, lit(99991)).cast("double").as("v"))
    val sp2 = Quantiles.groupQuantiles(df2, "g", "v", Seq("p50" -> 0.5),
        maxSortedGroup = 0).queryExecution.sparkPlan
    val empt = sp2.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(empt.isEmpty, sp2.toString)
  }

  test("per-group hybrid: hot groups via two-level, cold via window, union exact") {
    // one group of 30k rows against a 1k cap (hot), plus a cold tail and
    // an all-NULL group — the union must equal the forced paths exactly
    val hot = spark.range(30000).select(lit("big").as("g"),
      pmod(col("id") * 48271L, lit(9973)).cast("double").as("v"))
    val cold = spark.range(2000).select(
      concat(lit("c"), pmod(col("id"), lit(7))).as("g"),
      (col("id") % 997).cast("double").as("v"))
    val dead = Seq(("dead", Option.empty[Double]),
      ("dead", Option.empty[Double])).toDF("g", "v")
    val df = hot.unionByName(cold).unionByName(
      dead.select(col("g"), col("v").cast("double")))
    val hy = Quantiles.groupQuantiles(df, "g", "v", qs, buckets = 16,
      maxSortedGroup = 1000)
    val forced = Quantiles.groupQuantiles(df, "g", "v", qs, buckets = 16,
      maxSortedGroup = 0)
    assert(sortedRows(hy) == sortedRows(forced))
    assert(hy.count() == 9) // big + c0..c6 + dead
    val hyD = Quantiles.groupQuantilesDisc(df, "g", "v", qs, buckets = 16,
      maxSortedGroup = 1000)
    val forcedD = Quantiles.groupQuantilesDisc(df, "g", "v", qs,
      buckets = 16, maxSortedGroup = 0)
    assert(sortedRows(hyD) == sortedRows(forcedD))
  }

  test("levels=1 (no refinement) and levels=3 both exact") {
    val df = fixture(4000, 3)
    val r1 = Quantiles.groupQuantiles(df, "g", "v", qs, buckets = 8,
      levels = 1, maxSortedGroup = 0)
    val r3 = Quantiles.groupQuantiles(df, "g", "v", qs, buckets = 8,
      levels = 3, maxSortedGroup = 0)
    assert(sortedRows(r1) == sortedRows(r3))
  }

  test("cheap-to-rescan heuristic: bare scans skip the checkpoint, computed inputs keep it") {
    // project/filter over a parquet relation → cheap (re-scan beats pinning)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    assert(Quantiles.cheapToRescan(li))
    assert(Quantiles.cheapToRescan(
      li.filter(col("l_quantity") > 10).select("l_returnflag", "l_quantity")))
    // a local relation is a leaf too
    assert(Quantiles.cheapToRescan(fixture(100, 2)))
    // anything with an agg/join upstream is computed → materialize
    assert(!Quantiles.cheapToRescan(
      li.groupBy("l_returnflag").agg(sum("l_quantity").as("s"))))
    assert(!Quantiles.cheapToRescan(li.join(li.limit(5), Seq("l_orderkey"))))
  }

  test("materializeInput override and heuristic paths agree on results") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val auto = Quantiles.groupQuantiles(li, "l_returnflag", "l_quantity", qs)
    val forcedCp = Quantiles.groupQuantiles(li, "l_returnflag", "l_quantity",
      qs, materializeInput = Some(true))
    val forcedNo = Quantiles.groupQuantiles(li, "l_returnflag", "l_quantity",
      qs, materializeInput = Some(false))
    assert(sortedRows(auto) == sortedRows(forcedCp))
    assert(sortedRows(auto) == sortedRows(forcedNo))
    // the skipped checkpoint must also hold on the forced two-level path
    val tl = Quantiles.groupQuantiles(li, "l_returnflag", "l_quantity", qs,
      buckets = 16, maxSortedGroup = 0, materializeInput = Some(false))
    assert(sortedRows(auto) == sortedRows(tl))
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Measured salted-vs-unsalted comparison on a fixture dir (r14: the
  * advisor's ask — `Skew.saltedAgg/saltedJoin` were equivalence-spec'd
  * but never MEASURED against a hot-key fixture; run this on a uniform
  * ScaleUp dir and a `--skew` dir and diff the numbers).
  *
  * Join variants force a SHUFFLE join (autoBroadcastJoinThreshold=-1):
  * that is the regime saltedJoin exists for (dim too big to broadcast);
  * under the default config Spark broadcasts the supplier side and skew
  * never reaches a shuffle — measured here too, as the baseline row.
  * AQE skew-join handling is measured both off and on: AQE's splitting
  * covers sort-merge joins, so the interesting comparison is
  * salted-vs-AQE, not just salted-vs-naive.
  *
  * Agg variants: the algebraic pair (sum/count, map-side combinable —
  * partial aggregation should absorb skew, salting expected ~neutral)
  * and a holistic pair (exact median via percentile, whose partial
  * buffer carries per-key value multiplicities — the shape partials do
  * NOT collapse).
  *
  * Prints ONE JSON line {"fixture":…,"timings":{variant:sec,…}}; each
  * variant is run `SPARK_GRAFT_SKEWPROBE_PASSES` (default 3) times
  * interleaved and reports the minimum, Bench-style.
  */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_SKEWPROBE_PASSES", "3").toInt
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
    graft.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def li = graft.Tables.t(spark, sfDir, "lineitem")
      .select("l_suppkey", "l_orderkey", "l_quantity", "l_extendedprice")
    def supp = graft.Tables.t(spark, sfDir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))

    def plainJoin(): DataFrame =
      li.join(supp, Seq("l_suppkey"))
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sq"))
    def saltedJoin(): DataFrame =
      Skew.saltedJoin(li, supp, Seq("l_suppkey"), salts = cpus.toInt)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sq"))
    // profile-driven: salts only keys the 1 % sample estimates above
    // 500k rows — on the uniform fixture (300 rows/key) nothing is hot
    // and the plan degenerates to the plain join + one sampled agg; on
    // the --skew fixture the 4 hot keys (~7.5 M rows each) are salted
    def adaptiveJoin(): DataFrame =
      Skew.adaptiveSaltedJoin(li, supp, Seq("l_suppkey"),
          salts = cpus.toInt, hotKeyMinRows = 500000L)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sq"))
    def plainAgg(): DataFrame =
      li.groupBy("l_suppkey")
        .agg(round(sum("l_quantity"), 2).as("sq"), count(lit(1)).as("n"))
    def saltedAgg(): DataFrame =
      Skew.saltedAgg(li, Seq("l_suppkey"), salts = cpus.toInt,
        partials = Seq(sum("l_quantity").as("ps"), count(lit(1)).as("pn")),
        combine = Seq(round(sum("ps"), 2).as("sq"), sum("pn").as("n")))
    def plainMedian(): DataFrame =
      li.groupBy("l_suppkey")
        .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
    // r15: exact group median via two-level histogram selection — the
    // per-(key, bucket) counts are map-side combinable, so a hot key's
    // 7.5 M values collapse to ≤1024 histogram rows BEFORE the shuffle
    // and the holistic skew penalty (1.4× measured on `percentile` at
    // r14) disappears; on uniform small-group data the extra passes make
    // it SLOWER than the buffer/window forms — it is the huge-group and
    // global-quantile plan, not a universal replacement
    def twoLevelMedian(): DataFrame =
      graft.ops.Quantiles.groupQuantiles(li, "l_suppkey",
        "l_extendedprice", Seq("med" -> 0.5), maxSortedGroup = 0)
    def windowMedian(): DataFrame =
      graft.ops.Quantiles.groupQuantilesWindowed(li, "l_suppkey",
        "l_extendedprice", Seq("med" -> 0.5))
    // the shipped default: the stats-adaptive dispatcher — window plan on
    // the uniform fixture (300 rows/key), two-level on the skew fixture
    // (hot keys of 7.5 M rows exceed maxSortedGroup)
    def adaptiveMedian(): DataFrame =
      graft.ops.Quantiles.groupQuantiles(li, "l_suppkey",
        "l_extendedprice", Seq("med" -> 0.5))

    // (variant name, config overrides, plan)
    val variants: Seq[(String, Map[String, String], () => DataFrame)] = Seq(
      ("join_broadcast_default", Map.empty, plainJoin _),
      ("join_shuffle_plain", Map(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.enabled" -> "false"), plainJoin _),
      ("join_shuffle_aqe_skew", Map(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.enabled" -> "true"), plainJoin _),
      ("join_shuffle_salted", Map(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.enabled" -> "false"), saltedJoin _),
      ("join_shuffle_adaptive_salted", Map(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.skewJoin.enabled" -> "false"), adaptiveJoin _),
      ("agg_algebraic_plain", Map.empty, plainAgg _),
      ("agg_algebraic_salted", Map.empty, saltedAgg _),
      ("agg_median_plain", Map.empty, plainMedian _),
      ("agg_median_window", Map.empty, windowMedian _),
      ("agg_median_twolevel", Map.empty, twoLevelMedian _),
      ("agg_median_adaptive", Map.empty, adaptiveMedian _))

    val best = collection.mutable.Map[String, Double]()
    for (_ <- 1 to passes; (name, confs, plan) <- variants) {
      val saved = confs.keys.map(k =>
        k -> util.Try(spark.conf.get(k)).toOption).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val t0 = System.nanoTime()
      plan().write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), sec)
    }
    val js = variants.map(_._1).map(n => s""""$n":${"%.3f".format(best(n))}""")
      .mkString(",")
    println(s"""{"fixture":"$sfDir","passes":$passes,"timings":{$js}}""")
    spark.stop()
  }
}

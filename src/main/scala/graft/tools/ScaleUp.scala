package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture scale-up: replicate an existing SF directory
  * `factor`× with key striding, for scale measurements above the largest
  * driver-generated SF (the r9 verdict's ask: turn every "survives 100×"
  * design argument into a measurement). NOT for correctness gating — the
  * DuckDB oracle always runs against driver fixtures; this exists so
  * Bench can run at sf1 and the per-query sf0.1→sf1 ratios land in a
  * committed artifact.
  *
  * Replica r shifts every key column by r·10⁸ (far above any fixture
  * key), preserving referential integrity (orders↔lineitem↔part/supplier,
  * customer↔orders) and every schema/type exactly. The two dimension
  * tables (region, nation) stay single-copy, as a real star schema would.
  *
  * Two tables get per-replica CONTENT perturbation so similarity
  * operators see a 10×-bigger corpus rather than 10 identical clones
  * (which would measure a 100% duplicate corpus, not scale):
  *   - documents: every token of replica r > 0 gets an `xr<r>` suffix —
  *     vocabulary and Zipf shape scale with the corpus, cross-replica
  *     word/shingle overlap drops to ~zero, near-dup pair counts scale
  *     linearly like a real crawl's;
  *   - embeddings: replica r's vector is the original rotated by r
  *     positions — norms and coordinate distributions unchanged,
  *     cross-replica cosine decorrelated.
  *
  * SKEW MODE (r14, `--skew[=rowFrac:nHot]`): real fleets are Zipfian,
  * the uniform replication above is not — so salting/AQE-skew claims
  * were argued, never measured. With `--skew`, `rowFrac` of lineitem
  * rows remap their l_suppkey (and orders rows their o_custkey) onto
  * `nHot` fixed GLOBAL hot keys [1, nHot] (replica 0's smallest keys,
  * present in every replicated dimension table, so referential
  * integrity holds from any replica; global heat is what makes a hot
  * key's row count grow with the factor) — schemas/row counts
  * unchanged. Default `0.5:nKeys/100` (1 % of keys carry half the
  * rows, ~50× the average). For a STRAGGLER stress —
  * a hot key bigger than a whole shuffle partition, the case salting
  * exists for — use few absolute keys, e.g. `--skew=0.5:4`.
  * Perf fixture ONLY: results differ from the uniform fixture by
  * construction, so no oracle gate ever reads a skewed dir.
  *
  * PERTURB MODE (r15, `--perturb`): plain ×N replication copies every
  * monetary value N times, so an ORDER BY price LIMIT k over the scaled
  * fixture manufactures EXACT ties the base data never had — TPC-H
  * Q3/Q10 at sf10 became spec-level nondeterministic (either engine's
  * pick is a correct answer, but they differ). With `--perturb`,
  * replica r > 0 adds r cents to `l_extendedprice` and `o_totalprice`
  * (deterministic, ≤ factor−1 cents — far below any aggregate gate's
  * rounding, large enough that replicated rows stop tying). The oracle
  * replays DuckDB on the SAME perturbed dir, so both engines see
  * identical values and the tie-break ambiguity is gone, not hidden.
  *
  * Usage: runMain graft.tools.ScaleUp <inDir> <outDir> <factor>
  *        [--skew[=rowFrac:nHot]] [--perturb]
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val (inDir, outDir, factorS) = (args(0), args(1), args(2))
    val skewArg = args.drop(3).find(_.startsWith("--skew"))
    val skew = skewArg.isDefined
    // --skew=<rowFrac>:<nHot>; nHot = 0 means "1% of keys" (default)
    val (skewFrac, skewHot): (Double, Long) = skewArg match {
      case Some(s) if s.contains("=") =>
        // --skew=<rowFrac> (nHot defaults) or --skew=<rowFrac>:<nHot>
        s.split("=")(1).split(":") match {
          case Array(f) => (f.toDouble, 0L)
          case Array(f, h) => (f.toDouble, h.toLong)
          case _ => sys.error(s"bad --skew argument: $s")
        }
      case _ => (0.5, 0L)
    }
    val perturb = args.drop(3).contains("--perturb")
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stride = 100000000L

    def write(name: String, df: DataFrame, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")

    def replicate(name: String, keyCols: Seq[String],
        perReplica: (DataFrame, Int) => DataFrame = (d, _) => d,
        parts: Int = 8): Unit = {
      val src = spark.read.parquet(s"$inDir/$name.parquet")
      val all = (0 until factor).map { r =>
        val shifted = keyCols.foldLeft(src)((d, c) =>
          d.withColumn(c, col(c) + lit(r * stride)))
        perReplica(shifted, r)
      }.reduce(_ unionByName _)
      write(name, all, parts)
      println(s"[scaleup] $name ×$factor")
    }

    for (t <- Seq("region", "nation"))
      write(t, spark.read.parquet(s"$inDir/$t.parquet"), 1)

    // Hot-key remap for --skew: `skewFrac` of the rows (deterministic
    // hash coin on a stable key) redirect their dimension FK to one of
    // the `nHot` GLOBAL hot keys [1, nHot] — replica 0's smallest keys,
    // which exist in every replicated dimension table, so referential
    // integrity holds from any replica. Global (not per-replica) heat is
    // what makes a hot key's row count GROW with the factor — the
    // partition-dominating straggler salting exists for; per-replica hot
    // ranges would spread the heat back out and measure nothing.
    def hotify(keyCol: String, nKeys: Long, coinCol: String)(
        d: DataFrame, r: Int): DataFrame =
      if (!skew) d
      else {
        val nHot = if (skewHot > 0) skewHot else math.max(1L, nKeys / 100)
        val denom = 1000000L
        d.withColumn(keyCol,
          when(pmod(xxhash64(col(coinCol)), lit(denom)) <
              lit((skewFrac * denom).toLong),
            pmod(xxhash64(col(coinCol), lit(7)), lit(nHot)) + 1)
            .otherwise(col(keyCol)))
      }
    val nSupp = spark.read.parquet(s"$inDir/supplier.parquet").count()
    val nCust = spark.read.parquet(s"$inDir/customer.parquet").count()

    // --perturb: replica r adds r cents to the named money column —
    // deterministic, bounded by (factor−1) cents, kills replication ties
    def centify(colName: String)(d: DataFrame, r: Int): DataFrame =
      if (!perturb || r == 0) d
      else d.withColumn(colName, col(colName) + lit(r) * 0.01)

    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"), (d, r) =>
      centify("o_totalprice")(
        hotify("o_custkey", nCust, "o_orderkey")(d, r), r))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"),
      (d, r) => centify("l_extendedprice")(
        hotify("l_suppkey", nSupp, "l_orderkey")(d, r), r),
      parts = 16)
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"), (d, r) =>
      if (r == 0) d
      else d
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "$1xr" + r))
        .withColumn("n_chars", length(col("text")).cast("long")))
    replicate("embeddings", Seq("vec_id"), (d, r) =>
      if (r == 0) d
      else d.withColumn("embedding", expr(
        s"transform(embedding, (x, i) -> element_at(embedding, " +
          s"CAST((i + $r) % size(embedding) AS INT) + 1))")))

    spark.stop()
    println(s"[scaleup] done: $outDir (factor $factor)")
  }
}

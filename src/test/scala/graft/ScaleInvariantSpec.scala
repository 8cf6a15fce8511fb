package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup

/** Scale-invariant correctness gates (r14) for the families whose DuckDB
  * oracles are output-quadratic and therefore TIMEOUT out of the sf1
  * oracle widening (SCALECHECK_sf1.md): the ENGINE results still get
  * non-oracle evidence at scale — bounds every correct result must
  * satisfy, exact recomputation on samples, and cross-query/strategy
  * agreement — none of which replay the quadratic join in DuckDB.
  *
  * Env-gated: cancels (not fails) unless GRAFT_SCALE_DIR names a fixture
  * dir. Run:
  *   SPARK_DRIVER_MEM=32g GRAFT_SCALE_DIR=/root/repo/target/sf1 \
  *     sbt "testOnly graft.ScaleInvariantSpec"
  */
class ScaleInvariantSpec extends AnyFunSuite {

  private val dirOpt = sys.env.get("GRAFT_SCALE_DIR")

  // Own session: the shared TestSpark session is local[4]/4-partition,
  // sized for sf0.001 — at sf1 this spec wants real parallelism. Under a
  // plain `sbt test` the env gate cancels before this is touched.
  private lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[16]")
      .appName("graft-scale-invariants")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  private def dir = dirOpt.get
  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  // ---- spatial family ------------------------------------------------

  /** The query's own coordinate derivation (SpatialQueries.pairs5km),
    * restated independently: sha60(custkey:salt) scaled into the fixture
    * lat/lon boxes. */
  private def points: DataFrame = {
    def coord(salt: String, base: Double, span: Double) =
      lit(base) + lit(span) *
        (graft.expressions.Hashing.sha60(concat(
          col("c_custkey").cast("string"), lit(s":$salt"))) % 1000000) /
        1000000.0
    Tables.t(spark, dir, "customer")
      .select(col("c_custkey").as("pid"),
        coord("lat", 50.0, 1.0).as("plat"),
        coord("lon", 8.0, 2.0).as("plon"))
  }

  private def haversine(la: org.apache.spark.sql.Column,
      na: org.apache.spark.sql.Column, lb: org.apache.spark.sql.Column,
      nb: org.apache.spark.sql.Column) = {
    val dLat = radians(lb - la) / 2
    val dLon = radians(nb - na) / 2
    lit(2 * 6371000.0) * asin(sqrt(
      sin(dLat) * sin(dLat) +
        cos(radians(la)) * cos(radians(lb)) * sin(dLon) * sin(dLon)))
  }

  test("q_spatial_knn at scale: <=3 in-radius neighbors, exact distances, " +
      "consistent with q_spatial_join") {
    assume(dirOpt.isDefined, "set GRAFT_SCALE_DIR to run scale gates")
    val knn = q("q_spatial_knn").localCheckpoint()
    val join = q("q_spatial_join").localCheckpoint()

    // bounds: rank in 1..3, at most 3 rows per point, radius respected
    assert(knn.filter(col("rk") < 1 || col("rk") > 3).isEmpty)
    assert(knn.groupBy("id").count().filter(col("count") > 3).isEmpty)
    assert(knn.filter(col("dist_m") > 5000.0).isEmpty)

    // sampled exactness: recompute the haversine distance from the
    // independently re-derived coordinates for 1000 emitted rows
    val sample = knn.orderBy("id", "rk").limit(1000)
    val p = points
    val recomputed = sample
      .join(p.withColumnRenamed("pid", "id"), Seq("id"))
      .withColumnsRenamed(Map("plat" -> "la", "plon" -> "na"))
      .join(p.withColumnRenamed("pid", "neighbor_id"), Seq("neighbor_id"))
      .withColumn("rd",
        round(haversine(col("la"), col("na"), col("plat"), col("plon")), 1))
    assert(recomputed.count() == sample.count(), "every sampled id resolved")
    // dist_m is decimeter-rounded in the query; recompute must agree to
    // the same decimeter (trig is deterministic double math on both sides)
    assert(recomputed.filter(abs(col("rd") - col("dist_m")) > 0.05).isEmpty)

    // cross-query consistency: every knn row IS a q_spatial_join pair
    // (either orientation, same decimeter distance) …
    val symJoin = join.select(col("id_a").as("id"),
        col("id_b").as("neighbor_id"), col("dist_m"))
      .unionByName(join.select(col("id_b").as("id"),
        col("id_a").as("neighbor_id"), col("dist_m")))
    assert(knn.select("id", "neighbor_id", "dist_m")
      .exceptAll(symJoin).isEmpty)
    // … and every point that has any in-radius pair has a knn row
    val idsWithPairs = symJoin.select("id").distinct()
    val idsWithKnn = knn.select("id").distinct()
    assert(idsWithPairs.exceptAll(idsWithKnn).isEmpty)
    assert(idsWithKnn.exceptAll(idsWithPairs).isEmpty)
  }

  // ---- jaccard family ------------------------------------------------

  test("q_word_jaccard at scale: threshold bound, exact recompute on " +
      "sample, slice recall vs brute force") {
    assume(dirOpt.isDefined, "set GRAFT_SCALE_DIR to run scale gates")
    val pairs = q("q_word_jaccard").localCheckpoint()

    // bound: every emitted pair meets the query's threshold
    assert(pairs.filter(col("jaccard") < 0.9 || col("jaccard") > 1.0).isEmpty)

    // sampled exactness: recompute exact Jaccard from the word sets for
    // 1000 emitted pairs (deterministic sample)
    val sets = Dedup.wordSets(
        Tables.t(spark, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("words")).localCheckpoint()
    val sample = pairs.orderBy("doc_a", "doc_b").limit(1000)
    val re = sample
      .join(sets.select(col("doc_id").as("doc_a"), col("words").as("wa")),
        Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("words").as("wb")),
        Seq("doc_b"))
      .withColumn("rj", round(
        size(array_intersect(col("wa"), col("wb"))).cast("double") /
          size(array_union(col("wa"), col("wb"))), 4))
    assert(re.count() == sample.count())
    assert(re.filter(abs(col("rj") - col("jaccard")) > 1e-9).isEmpty)

    // slice recall: brute-force ALL pairs within a ~1% doc slice and
    // assert the engine emitted every qualifying one (and no extras
    // within the slice) — catches missed candidates, which the sampled
    // exactness gate above cannot
    val slice = sets.filter(pmod(col("doc_id"), lit(97)) === 0)
      .localCheckpoint()
    val a = slice.select(col("doc_id").as("doc_a"), col("words").as("wa"))
    val b = slice.select(col("doc_id").as("doc_b"), col("words").as("wb"))
    val brute = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("wa"), col("wb"))).cast("double") /
          size(array_union(col("wa"), col("wb"))), 4))
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b", "jaccard")
    val sliceIds = slice.select(col("doc_id"))
    val engineSlice = pairs
      .join(sliceIds.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"))
      .join(sliceIds.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"))
      .select("doc_a", "doc_b", "jaccard")
    assert(brute.exceptAll(engineSlice).isEmpty,
      "engine missed a qualifying slice pair")
    assert(engineSlice.exceptAll(brute).isEmpty,
      "engine emitted a non-qualifying slice pair")
  }

  test("jaccard strategy agreement at scale on a bounded slice " +
      "(bitmask vs inverted share no candidate code)") {
    assume(dirOpt.isDefined, "set GRAFT_SCALE_DIR to run scale gates")
    val docs = Tables.t(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(41)) === 0) // ~2.4% slice
    val banded = Dedup.jaccardPairs(docs, "doc_id", "text", 0.9,
      strategy = Dedup.JaccardBitmask, bitmaskMaxSets = 100000L)
    val inverted = Dedup.jaccardPairs(docs, "doc_id", "text", 0.9,
      strategy = Dedup.JaccardInverted)
    assert(banded.exceptAll(inverted).isEmpty &&
      inverted.exceptAll(banded).isEmpty)
  }
}

package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.IncrementalDedup
import graft.sim.IvfPq
import graft.tables.Warehouse

/** Measures the per-batch cost of the two persistent-index operators
  * (IncrementalDedup.processBatch, IvfPq.appendToIndex) against seed
  * corpora of different scales, holding the BATCH fixed — the direct test
  * of their O(batch) value proposition (r11 verdict item #5): if the
  * claim holds, batch wall time is roughly flat as the seed corpus grows
  * 10×; if any step secretly rescans the corpus, it shows up as a ~10×
  * batch-time ratio.
  *
  * The fixed batch is cut from the ORIGINAL fixture key range
  * (`id < 10⁸`, i.e. ScaleUp replica 0), so the batch rows are bitwise
  * identical at every scale factor. Each trial seeds a FRESH index and
  * times the first processBatch/appendToIndex (the honest daily cost —
  * replays are cheaper by idempotence); min over `trials` discards host
  * contention spikes, same estimator as Bench.
  *
  * Usage: runMain graft.tools.IncrementalProbe <sfDir> [trials] [only]
  * `only` is a comma-separated probe-name filter (incr_dedup,
  * ann_append, incr_paragraph, incr_semantic, incr_semantic_coarse) —
  * fourth-decade runs re-probe one shape without paying every seed.
  * Prints one JSON line per probe:
  *   {"probe":"incr_dedup","dir":…,"seed_n":…,"batch_n":…,
  *    "seed_s":…,"batch_s":…}
  */
object IncrementalProbe {

  private val OrigStride = 100000000L // ScaleUp replica-0 key bound

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val trials = if (args.length > 1) args(1).toInt else 3
    val only = args.lift(2).map(_.split(",").map(_.trim).toSet)
    def want(p: String) = only.forall(_.contains(p))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // --- incremental near-dup dedup: fixed ~2% batch of the original docs
    val docs = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    val isBatch = col("doc_id") < OrigStride && col("doc_id") % 50 === 3
    val batch = docs.filter(isBatch).localCheckpoint()
    val seed = docs.filter(!isBatch).localCheckpoint()
    val (seedN, batchN) = (seed.count(), batch.count())
    if (want("incr_dedup")) {
    val dedupTimes = (1 to trials).map { _ =>
      val wh = new Warehouse(spark,
        Files.createTempDirectory("graft-probe-dedup").toString)
      val seedS = timed(
        IncrementalDedup.seedIndex(wh, "docs", seed, "doc_id", "text"))
      val batchS = timed(
        IncrementalDedup.processBatch(wh, "docs", batch, "doc_id", "text")
          .write.format("noop").mode("overwrite").save())
      (seedS, batchS)
    }
    println(s"""{"probe":"incr_dedup","dir":"$sfDir","seed_n":$seedN,""" +
      s""""batch_n":$batchN,"seed_s":${dedupTimes.map(_._1).min},""" +
      s""""batch_s":${dedupTimes.map(_._2).min}}""")
    }

    // --- incremental ANN: fixed ~2% batch of the original vectors
    val emb = Tables.t(spark, sfDir, "embeddings")
    val isVecBatch = col("vec_id") < OrigStride && col("vec_id") % 50 === 3
    // quantizer seeds (lowest-id vectors) must stay in the base split
    val vecBatch = emb.filter(isVecBatch && col("vec_id") >= 16)
      .localCheckpoint()
    val vecSeed = emb.filter(!(isVecBatch && col("vec_id") >= 16))
      .localCheckpoint()
    val (vSeedN, vBatchN) = (vecSeed.count(), vecBatch.count())
    if (want("ann_append")) {
    val annTimes = (1 to trials).map { _ =>
      val wh = new Warehouse(spark,
        Files.createTempDirectory("graft-probe-ann").toString)
      val seedS = timed(
        IvfPq.buildIndex(wh, "ann", vecSeed, "vec_id", "embedding",
          numCells = 8, m = 8, subDim = 8, ksub = 16, iters = 0))
      val batchS = timed(
        IvfPq.appendToIndex(wh, "ann", vecBatch, "vec_id", "embedding",
          m = 8, subDim = 8))
      (seedS, batchS)
    }
    println(s"""{"probe":"ann_append","dir":"$sfDir","seed_n":$vSeedN,""" +
      s""""batch_n":$vBatchN,"seed_s":${annTimes.map(_._1).min},""" +
      s""""batch_s":${annTimes.map(_._2).min}}""")
    }

    // --- incremental paragraph dedup (r18): fixed batch vs growing
    // digest index — the O(batch) claim is exactly the dedup one
    if (want("incr_paragraph")) {
    val paraTimes = (1 to trials).map { _ =>
      val wh = new Warehouse(spark,
        Files.createTempDirectory("graft-probe-para").toString)
      val seedS = timed(graft.dedup.ParagraphDedup.seedIndex(
        wh, "pd", seed, "doc_id", "text", " the "))
      val batchS = timed(graft.dedup.ParagraphDedup.processBatch(
          wh, "pd", batch, "doc_id", "text", " the ")
        .write.format("noop").mode("overwrite").save())
      (seedS, batchS)
    }
    println(s"""{"probe":"incr_paragraph","dir":"$sfDir","seed_n":$seedN,""" +
      s""""batch_n":$batchN,"seed_s":${paraTimes.map(_._1).min},""" +
      s""""batch_s":${paraTimes.map(_._2).min}}""")
    }

    // --- incremental semantic dedup (r18): fixed vector batch vs frozen
    // ⌈√n⌉-centroid index. Expected batch growth per seed decade is √10
    // (assignment is |batch|·√n_corpus dots), NOT flat — the probe
    // verifies the sub-linear exponent, the design's actual claim
    if (want("incr_semantic")) {
    val semTimes = (1 to trials).map { _ =>
      val wh = new Warehouse(spark,
        Files.createTempDirectory("graft-probe-sem").toString)
      val seedS = timed(graft.sim.SemDedup.seedIndex(
        wh, "sd", vecSeed, "vec_id", "embedding", cap = 16))
      val batchS = timed(graft.sim.SemDedup.processBatch(
          wh, "sd", vecBatch, "vec_id", "embedding",
          threshold = 0.3, cap = 16)
        .write.format("noop").mode("overwrite").save())
      (seedS, batchS)
    }
    println(s"""{"probe":"incr_semantic","dir":"$sfDir","seed_n":$vSeedN,""" +
      s""""batch_n":$vBatchN,"seed_s":${semTimes.map(_._1).min},""" +
      s""""batch_s":${semTimes.map(_._2).min}}""")
    }

    // --- coarse-seeded incremental semantic dedup (r19): the
    // fourth-decade BOOTSTRAP — seedIndexCoarse's two-level n·2√k corpus
    // pass vs seedIndex's flat n·k (the 45-minute-class sf100 wall);
    // processBatch unchanged, so batch_s should match incr_semantic
    if (want("incr_semantic_coarse")) {
    val semcTimes = (1 to trials).map { _ =>
      val wh = new Warehouse(spark,
        Files.createTempDirectory("graft-probe-semc").toString)
      val seedS = timed(graft.sim.SemDedup.seedIndexCoarse(
        wh, "sd", vecSeed, "vec_id", "embedding", cap = 16))
      val batchS = timed(graft.sim.SemDedup.processBatch(
          wh, "sd", vecBatch, "vec_id", "embedding",
          threshold = 0.3, cap = 16)
        .write.format("noop").mode("overwrite").save())
      (seedS, batchS)
    }
    println(s"""{"probe":"incr_semantic_coarse","dir":"$sfDir","seed_n":$vSeedN,""" +
      s""""batch_n":$vBatchN,"seed_s":${semcTimes.map(_._1).min},""" +
      s""""batch_s":${semcTimes.map(_._2).min}}""")
    }

    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev probe for [[graft.sim.SemDedup]]'s scale lever: the in-cell
  * pairwise stage is Σ|cell|² ≈ n²/numCells on near-uniform cells, so
  * numCells must grow with the corpus (the paper runs ~50k cells at web
  * scale). This prints drops + wall for a few cell counts on a fixture —
  * the measured version of that sentence.
  *
  * Usage: graft.tools.SemProbe <sfDir> [cells ...]
  *        graft.tools.SemProbe --train <sfDir> [cap]
  *
  * `--train` (r17 verdict #6): cell QUALITY evidence — the gated
  * configurations all run iters=0 (lowest-id seeds: deterministic float
  * math both engines replay); the paper's cells are Lloyd-trained.
  * Training changes only WHICH pairs share a cell — recall, never
  * precision — so the honest measurement is the drop-set delta at equal
  * threshold/cells/cap: drops at iters=0 vs iters=2, their overlap, and
  * walls. Not hash-gateable (float k-means means diverge across engines);
  * this probe + a SemDedupSpec assertion are the evidence instead.
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--train")) { trainProbe(args.tail); return }
    if (args.headOption.contains("--drift")) { driftProbe(args.tail); return }
    if (args.headOption.contains("--growth")) { growthProbe(args.tail); return }
    val sfDir = args.head
    val cellCounts =
      if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(8, 64, 141)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("graft-semprobe")
      .getOrCreate()
    graft.Tables.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.t(spark, sfDir, "embeddings")
    for (cells <- cellCounts) {
      val t0 = System.nanoTime()
      val drops = graft.sim.SemDedup
        .semanticDedup(e, "vec_id", "embedding", cells, 0.3)
        .filter(!col("keep")).count()
      println(f"[semprobe] cells=$cells%5d drops=$drops%7d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }

  /** `--drift` (r18 verdict missing #4): quantify the ONE trade
    * [[graft.sim.SemDedup.seedIndex]] makes — frozen corpus-seeded
    * centroids — on a batch whose embedding distribution has DRIFTED
    * from the seed corpus. The drifted batch is the fixture batch slice
    * rotated one coordinate (ScaleUp's embedding perturbation: norms and
    * coordinate distributions unchanged, cosine against the corpus
    * decorrelated — the worst realistic drift at fixed geometry). Two
    * verdict paths at equal threshold/cap:
    *
    *   frozen — seedIndex(corpus) then processBatch(driftedBatch): the
    *            daily shape, assignment against seed-corpus centroids;
    *   fresh  — reseedIndex over (corpus ∪ driftedBatch) — ⌈√(n+batch)⌉
    *            centroids seeing the drifted data — restricted to the
    *            batch ids: the cutover's verdicts.
    *
    * Prints both drop sets' sizes, overlap, jaccard, the frozen path's
    * recall of the fresh path's drops (the honest "what drift costs"
    * number), and walls. When recall decays past the operator's
    * tolerance, [[graft.sim.SemDedup.reseedIndex]] is the cutover; this
    * probe is how the cadence gets chosen. Not hash-gateable (the two
    * paths legitimately differ — that difference IS the measurement).
    *
    * Usage: SemProbe --drift <sfDir> [cap]
    */
  private def driftProbe(args: Array[String]): Unit = {
    val sfDir = args.head
    val cap = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("graft-semprobe-drift")
      .getOrCreate()
    graft.Tables.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val e = graft.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val corpus = e.filter(col("vec_id") % 10 =!= 0).localCheckpoint()
    // drift: rotate each batch vector one position (norm-preserving,
    // decorrelates cosine vs the seed cells — ScaleUp's perturbation)
    val batch = e.filter(col("vec_id") % 10 === 0)
      .withColumn("embedding",
        concat(slice(col("embedding"), 2, 10000),
          slice(col("embedding"), 1, 1)))
      .localCheckpoint()
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val whF = new graft.tables.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-drift-frozen").toString)
    graft.sim.SemDedup.seedIndex(whF, "d", corpus, "vec_id", "embedding", cap)
    val (frozen, wF) = timed(graft.sim.SemDedup
      .processBatch(whF, "d", batch, "vec_id", "embedding", 0.3, cap)
      .filter(!col("keep")).select("vec_id")
      .collect().map(_.getLong(0)).toSet)
    val whR = new graft.tables.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-drift-fresh").toString)
    val batchIds = batch.select("vec_id").collect().map(_.getLong(0)).toSet
    val (fresh, wR) = timed(graft.sim.SemDedup
      .reseedIndex(whR, "d", corpus.unionByName(batch), "vec_id",
        "embedding", 0.3, cap)
      .filter(!col("keep")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
      .intersect(batchIds))
    val inter = (frozen intersect fresh).size
    println(f"[semprobe-drift] cap=$cap corpus=${corpus.count()} " +
      f"batch=${batchIds.size} | frozen_drops=${frozen.size} wall=$wF%.2f s " +
      f"| fresh_drops=${fresh.size} wall=$wR%.2f s | overlap=$inter " +
      f"jaccard=${inter.toDouble / math.max(1, (frozen union fresh).size)}%.4f " +
      f"recall_of_fresh=${inter.toDouble / math.max(1, fresh.size)}%.4f")
    spark.stop()
  }

  /** `--growth` (r18 verdict missing #2): measure what the reps index
    * accumulates across N sequential daily batches WITHOUT compaction —
    * every processBatch appends its candidate cut, so ex-representatives
    * pile up with churn — then compact and print the restored bound.
    * Verdict-invariance of the compaction is SemDedupSpec's assertion;
    * this prints the operational numbers (rows read per batch) that set
    * the compaction cadence.
    *
    * Usage: SemProbe --growth <sfDir> [nBatches] [cap]
    */
  private def growthProbe(args: Array[String]): Unit = {
    val sfDir = args.head
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val cap = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("graft-semprobe-growth")
      .getOrCreate()
    graft.Tables.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    val e = graft.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // corpus = high ids (so every batch is a wave of NEW lowest ids —
    // worst-case churn: each batch displaces representatives)
    val corpus = e.filter(col("vec_id") % (n + 1) === n)
    val wh = new graft.tables.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-growth").toString)
    graft.sim.SemDedup.seedIndex(wh, "g", corpus, "vec_id", "embedding", cap)
    val cells = wh.read("g_centroids").count()
    val bound = cap * cells
    println(s"[semprobe-growth] cap=$cap cells=$cells bound=$bound " +
      s"seed_reps=${wh.read("g_reps").count()}")
    (0 until n).foreach { i =>
      graft.sim.SemDedup.processBatch(wh, "g",
        e.filter(col("vec_id") % (n + 1) === i), "vec_id", "embedding",
        threshold = 0.3, cap = cap)
        .write.format("noop").mode("overwrite").save()
      println(s"[semprobe-growth] after_batch=${i + 1} " +
        s"reps=${wh.read("g_reps").count()}")
    }
    graft.sim.SemDedup.compactIndex(wh, "g", cap)
    println(s"[semprobe-growth] after_compact reps=" +
      s"${wh.read("g_reps").count()} (bound $bound)")
    spark.stop()
  }

  private def trainProbe(args: Array[String]): Unit = {
    val sfDir = args.head
    val cap = args.lift(1).map(_.toInt)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("graft-semprobe-train")
      .getOrCreate()
    graft.Tables.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.t(spark, sfDir, "embeddings")
    val cells = graft.sim.SemDedup.scaledCells(e.count())
    def drops(iters: Int): (Set[Long], Double) = {
      val t0 = System.nanoTime()
      val d = graft.sim.SemDedup
        .semanticDedup(e, "vec_id", "embedding", cells, 0.3, iters, cap)
        .filter(!col("keep")).select("vec_id")
        .collect().map(_.getLong(0)).toSet
      (d, (System.nanoTime() - t0) / 1e9)
    }
    val (d0, w0) = drops(0)
    val (d2, w2) = drops(2)
    val inter = (d0 intersect d2).size
    println(f"[semprobe-train] cells=$cells cap=${cap.getOrElse(-1)} " +
      f"drops(iters=0)=${d0.size} wall=$w0%.2f s | " +
      f"drops(iters=2)=${d2.size} wall=$w2%.2f s | " +
      f"overlap=$inter jaccard=${
        inter.toDouble / math.max(1, (d0 union d2).size)}%.4f " +
      f"delta=${(d2.size - d0.size).toDouble / math.max(1, d0.size) * 100}%.1f%%")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.sim.SemDedup

/** SemDeDup keep/drop partition properties — checked independently of the
  * DuckDB oracle (which replays the same formulas; these assert the
  * SEMANTICS the formulas are supposed to have).
  */
class SemDedupSpec extends SparkSpec {

  private lazy val e = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val out = SemDedup.semanticDedup(
    e, "vec_id", "embedding", numCells = 8, threshold = 0.3)
    .localCheckpoint()

  test("one row per input vector, and the lowest id of every cell is kept") {
    assert(out.count() == e.count())
    assert(out.select("vec_id").distinct().count() == e.count())
    val firstPerCell = out.groupBy("cell").agg(min("vec_id").as("vec_id"))
    val droppedFirsts = firstPerCell.join(out, Seq("cell", "vec_id"))
      .filter(!col("keep")).count()
    assert(droppedFirsts == 0, "a cell's lowest id can never have a lower-id match")
  }

  test("kept set is threshold-separated within every cell; drops are justified") {
    import graft.expressions.DotProduct
    val v = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val j = out.join(v, Seq("vec_id"))
    val a = j.select(col("cell"), col("vec_id").as("ida"), col("keep").as("ka"),
      col("v").as("va"))
    val b = j.select(col("cell"), col("vec_id").as("idb"), col("keep").as("kb"),
      col("v").as("vb"))
    val pairs = a.join(b, Seq("cell")).filter(col("idb") < col("ida"))
      .withColumn("cos",
        DotProduct.dot(spark, col("va"), col("vb")) /
          (graft.sim.Knn.norm(col("va")) * graft.sim.Knn.norm(col("vb"))))
      .localCheckpoint()
    // no two KEPT members of a cell match at >= threshold (greedy
    // lowest-id-first independent set)
    assert(pairs.filter(col("ka") && col("kb") && col("cos") >= 0.3)
      .count() == 0)
    // every dropped vector has at least one lower-id cell member >= t
    val dropped = out.filter(!col("keep")).select(col("vec_id").as("ida"))
    val justified = pairs.filter(col("cos") >= 0.3)
      .select(col("ida")).distinct()
    assert(dropped.join(justified, Seq("ida"), "left_anti").count() == 0)
  }

  test("maxCellSize cap: drops shrink to a justified subset, every row still verdicted") {
    // capped = only each cell's `cap` lowest ids can justify a drop, so
    // the capped drop set must be a subset of the uncapped one, and every
    // capped drop must have a lower-id justifier WITHIN the cap window.
    val cap = 3
    val capped = SemDedup.semanticDedup(
      e, "vec_id", "embedding", numCells = 8, threshold = 0.3,
      maxCellSize = Some(cap)).localCheckpoint()
    assert(capped.count() == e.count(), "every vector gets a verdict")
    val cappedDrops = capped.filter(!col("keep")).select("vec_id")
    val uncappedDrops = out.filter(!col("keep")).select("vec_id")
    assert(cappedDrops.exceptAll(uncappedDrops).isEmpty,
      "a cap can only REMOVE drop justifications, never add drops")
    // the cap must BIND on the fixture (some cell larger than cap) or the
    // test is vacuous
    val maxCell = out.groupBy("cell").count().agg(max("count")).first().getLong(0)
    assert(maxCell > cap, s"fixture max cell $maxCell must exceed cap $cap")
    // justification within the window: every capped drop matches a rep
    // (one of its cell's `cap` lowest ids) at >= threshold
    import graft.expressions.DotProduct
    val v = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val j = capped.join(v, Seq("vec_id"))
    val reps = j.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("cell").orderBy("vec_id")))
      .filter(col("rn") <= cap)
      .select(col("cell"), col("vec_id").as("idb"), col("v").as("vb"))
    val justified = j.select(col("cell"), col("vec_id").as("ida"), col("v").as("va"))
      .join(reps, Seq("cell")).filter(col("idb") < col("ida"))
      .withColumn("cos", DotProduct.dot(spark, col("va"), col("vb")) /
        (graft.sim.Knn.norm(col("va")) * graft.sim.Knn.norm(col("vb"))))
      .filter(col("cos") >= 0.3).select(col("ida").as("vec_id")).distinct()
    assert(cappedDrops.exceptAll(justified).isEmpty)
    assert(justified.exceptAll(cappedDrops).isEmpty,
      "exactly the within-window-justified set is dropped")
  }

  test("capped path with STRING ids: bounded generic cut equals the long-id cut") {
    // r17 verdict #2: production string doc-ids previously fell back to
    // the unbounded per-cell window. Zero-padded decimal strings order
    // exactly like the longs they encode, so the whole pipeline (seed
    // selection, argmax ties, keep-lowest cap, lower-id-wins drops) must
    // produce the identical partition under either id type.
    val cap = 3
    val sid = e.withColumn("vec_id",
      lpad(col("vec_id").cast("string"), 8, "0"))
    val viaString = SemDedup.semanticDedup(sid, "vec_id", "embedding",
        numCells = 8, threshold = 0.3, maxCellSize = Some(cap))
      .withColumn("vec_id", col("vec_id").cast("long"))
    val viaLong = SemDedup.semanticDedup(e, "vec_id", "embedding",
      numCells = 8, threshold = 0.3, maxCellSize = Some(cap))
    assert(viaString.exceptAll(viaLong).isEmpty &&
      viaLong.exceptAll(viaString).isEmpty)
  }

  test("semanticDedupScaled = semanticDedup at ceil(sqrt(n)) cells") {
    val n = e.count()
    val k = SemDedup.scaledCells(n)
    assert(k == math.ceil(math.sqrt(n.toDouble)).toInt && k >= 1)
    val scaled = SemDedup.semanticDedupScaled(
      e, "vec_id", "embedding", threshold = 0.3, maxCellSize = Some(16))
    val explicit = SemDedup.semanticDedup(
      e, "vec_id", "embedding", numCells = k, threshold = 0.3,
      maxCellSize = Some(16))
    assert(scaled.exceptAll(explicit).isEmpty &&
      explicit.exceptAll(scaled).isEmpty)
  }

  test("coarse two-level assignment: every vector verdicted, drops justified in-cell") {
    val cap = 16
    val out = SemDedup.semanticDedupCoarse(e, "vec_id", "embedding",
      threshold = 0.3, maxCellSize = Some(cap)).localCheckpoint()
    assert(out.count() == e.count())
    assert(out.select("vec_id").distinct().count() == e.count(),
      "coarse routing must never lose or duplicate a vector (empty-coarse-cell guard)")
    // lowest id of every (coarse-assigned) cell is kept
    val firstPerCell = out.groupBy("cell").agg(min("vec_id").as("vec_id"))
    assert(firstPerCell.join(out, Seq("cell", "vec_id"))
      .filter(!col("keep")).count() == 0)
    // every drop is justified by one of ITS cell's `cap` lowest ids at
    // >= threshold — exactly, using the cells the coarse router produced
    import graft.expressions.DotProduct
    val v = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val j = out.join(v, Seq("vec_id"))
    val reps = j.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("cell").orderBy("vec_id")))
      .filter(col("rn") <= cap)
      .select(col("cell"), col("vec_id").as("idb"), col("v").as("vb"))
    val justified = j.select(col("cell"), col("vec_id").as("ida"), col("v").as("va"))
      .join(reps, Seq("cell")).filter(col("idb") < col("ida"))
      .withColumn("cos", DotProduct.dot(spark, col("va"), col("vb")) /
        (graft.sim.Knn.norm(col("va")) * graft.sim.Knn.norm(col("vb"))))
      .filter(col("cos") >= 0.3).select(col("ida").as("vec_id")).distinct()
    val drops = out.filter(!col("keep")).select("vec_id")
    assert(drops.exceptAll(justified).isEmpty &&
      justified.exceptAll(drops).isEmpty)
  }

  test("Lloyd-trained cells (iters=2): partition invariants hold, recall comparable") {
    // Cell quality changes RECALL (which pairs share a cell), never
    // precision — so the invariants must hold for ANY assignment, and the
    // trained/seed drop counts must be comparable. Measured (SemProbe
    // --train): sf0.001 uncapped +9.9% drops with training, sf1 uncapped
    // +0.4%, sf1 capped −1.7% (balanced cells trade a sliver of capped
    // recall for 1.7× less pairwise wall). Not hash-gateable: float
    // k-means means diverge across engines.
    val cells = SemDedup.scaledCells(e.count())
    val trained = SemDedup.semanticDedup(
      e, "vec_id", "embedding", cells, threshold = 0.3, iters = 2)
      .localCheckpoint()
    assert(trained.count() == e.count())
    val firstPerCell = trained.groupBy("cell").agg(min("vec_id").as("vec_id"))
    assert(firstPerCell.join(trained, Seq("cell", "vec_id"))
      .filter(!col("keep")).count() == 0,
      "lowest id of every trained cell must be kept")
    // exact drop-justification within the trained cells
    import graft.expressions.DotProduct
    val v = e.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val j = trained.join(v, Seq("vec_id"))
    val pairs = j.select(col("cell"), col("vec_id").as("ida"), col("v").as("va"))
      .join(j.select(col("cell"), col("vec_id").as("idb"), col("v").as("vb")),
        Seq("cell"))
      .filter(col("idb") < col("ida"))
      .withColumn("cos", DotProduct.dot(spark, col("va"), col("vb")) /
        (graft.sim.Knn.norm(col("va")) * graft.sim.Knn.norm(col("vb"))))
      .filter(col("cos") >= 0.3)
      .select(col("ida").as("vec_id")).distinct()
    val drops = trained.filter(!col("keep")).select("vec_id")
    assert(drops.exceptAll(pairs).isEmpty && pairs.exceptAll(drops).isEmpty,
      "exactly the in-cell-justified set is dropped under trained cells")
    val seedDrops = SemDedup.semanticDedup(
        e, "vec_id", "embedding", cells, threshold = 0.3, iters = 0)
      .filter(!col("keep")).count()
    // The recall RATIO is a fixture-coupled float-k-means metric, not an
    // invariant (r18 advice #3): Lloyd means fold through avg() whose
    // reduction order can shift across Spark versions/platforms. Log it
    // (SemProbe --train is the committed evidence) and keep a 70% floor
    // (r19 advice: observed cross-platform variance is a few percent —
    // the measured ratio sits near 1.0, so 0.7 still has wide margin
    // while catching a real training regression, not just a collapse).
    val trainedDrops = drops.count()
    info(f"trained-cell drops=$trainedDrops seed=$seedDrops " +
      f"ratio=${trainedDrops.toDouble / math.max(1, seedDrops)}%.3f")
    assert(trainedDrops * 10 >= seedDrops * 7,
      s"trained-cell recall below 70% of seed: $trainedDrops vs $seedDrops")
  }

  test("incremental index: batch verdicts idempotent, bounded, drops justified") {
    import spark.implicits._
    import graft.tables.Warehouse
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-semincr").toString)
    val corpus = e.filter(col("vec_id") % 2 =!= 0)
    val batch = e.filter(col("vec_id") % 2 === 0)
    val cap = 4
    SemDedup.seedIndex(wh, "sd", corpus, "vec_id", "embedding", cap)
    val cells = SemDedup.scaledCells(corpus.count())
    assert(wh.read("sd_centroids").count() == cells)
    assert(wh.read("sd_reps").count() <= cap.toLong * cells,
      "seed reps must be the cap-lowest cut, never the corpus")
    def vs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    val run1 = vs(SemDedup.processBatch(wh, "sd", batch,
      "vec_id", "embedding", threshold = 0.3, cap = cap))
    val repsN = wh.read("sd_reps").count()
    assert(repsN <= 2L * cap * cells,
      "post-batch reps stay bounded by the cap algebra")
    val run2 = vs(SemDedup.processBatch(wh, "sd", batch,
      "vec_id", "embedding", threshold = 0.3, cap = cap))
    assert(wh.read("sd_reps").count() == repsN, "re-run grew the reps index")
    assert(run1 == run2, "re-run changed the verdict set")
    assert(run1.size == batch.count(), "every batch vector gets one verdict")
    assert(run1.exists(!_._3) && run1.exists(_._3),
      "fixture must exercise both keep and drop verdicts")
    // every drop is justified by a LOWER-ID candidate of its cell —
    // candidate = cap-lowest of (seed reps ∪ batch) per cell — at >= t
    import graft.expressions.DotProduct
    val out = run1.toSeq.toDF("vec_id", "cell", "keep")
    val cents = wh.read("sd_centroids")
    val assignedB = graft.sim.Ivf.index(batch, "vec_id", "embedding", cents)
    val assignedC = graft.sim.Ivf.index(corpus, "vec_id", "embedding", cents)
    val seedReps = assignedC.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("centroid_id").orderBy("neighbor_id")))
      .filter(col("rn") <= cap).drop("rn")
    val cand = seedReps.unionByName(assignedB)
      .withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("centroid_id").orderBy("neighbor_id")))
      .filter(col("rn") <= cap)
      .select(col("centroid_id").as("cell"), col("neighbor_id").as("idb"),
        col("cv").as("vb"))
    val justified = assignedB
      .select(col("centroid_id").as("cell"), col("neighbor_id").as("ida"),
        col("cv").as("va"))
      .join(cand, Seq("cell")).filter(col("idb") < col("ida"))
      .withColumn("cos", DotProduct.dot(spark, col("va"), col("vb")) /
        (graft.sim.Knn.norm(col("va")) * graft.sim.Knn.norm(col("vb"))))
      .filter(col("cos") >= 0.3).select(col("ida").as("vec_id")).distinct()
    val drops = out.filter(!col("keep")).select("vec_id")
    assert(drops.exceptAll(justified).isEmpty &&
      justified.exceptAll(drops).isEmpty,
      "exactly the candidate-justified batch vectors are dropped")
  }

  test("sequenced batches compose by the cap algebra; compaction is verdict-invariant and bounded") {
    import graft.tables.Warehouse
    def tmp(p: String) = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory(p).toString)
    val corpus = e.filter(col("vec_id") % 10 =!= 0 && col("vec_id") % 10 =!= 5)
    val b1 = e.filter(col("vec_id") % 10 === 5)
    val b2 = e.filter(col("vec_id") % 10 === 0)
    val cap = 4
    def vs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    def run(df: org.apache.spark.sql.DataFrame, wh: Warehouse) =
      vs(SemDedup.processBatch(wh, "sd", df, "vec_id", "embedding",
        threshold = 0.3, cap = cap))
    // A: the sequenced pipeline (seed → B1 → B2)
    val whA = tmp("graft-semseqA")
    SemDedup.seedIndex(whA, "sd", corpus, "vec_id", "embedding", cap)
    val vA1 = run(b1, whA)
    val vA2 = run(b2, whA)
    // B: single-shot B1 ∪ B2 — the cap algebra says B2's sequential
    // candidate set (bottomCap(reps-after-B1 ∪ B2)) IS
    // bottomCap(corpus ∪ B1 ∪ B2), i.e. the single-shot candidate set,
    // so the B2 verdicts must be identical row for row
    val whB = tmp("graft-semseqB")
    SemDedup.seedIndex(whB, "sd", corpus, "vec_id", "embedding", cap)
    val vB = run(b1.unionByName(b2), whB)
    val b2ids = b2.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(vA2 == vB.filter(t => b2ids.contains(t._1)),
      "sequenced day-2 verdicts must equal the single-shot union cut")
    assert(vA1.exists(!_._3) || vA2.exists(!_._3),
      "fixture must exercise drops across the sequence")
    // C: compaction between the days is VERDICT-INVARIANT (the algebra's
    // operational half) and restores the cap·cells bound
    val whC = tmp("graft-semseqC")
    SemDedup.seedIndex(whC, "sd", corpus, "vec_id", "embedding", cap)
    run(b1, whC)
    val grown = whC.read("sd_reps").count()
    SemDedup.compactIndex(whC, "sd", cap)
    val compacted = whC.read("sd_reps").count()
    val cells = whC.read("sd_centroids").count()
    assert(compacted <= cap * cells,
      s"compaction must restore the cap*cells bound: $compacted > $cap*$cells")
    assert(compacted <= grown)
    assert(run(b2, whC) == vA2,
      "compaction changed a subsequent batch's verdicts")
    // D: a TORN seed (crash between the centroids and reps writes —
    // r19 advice #3) fails fast instead of silently verdicting against
    // mismatched cells. Simulate the crash state: centroids re-written
    // under a fresh generation, reps left at the old one.
    val whD = tmp("graft-semseqD")
    SemDedup.seedIndex(whD, "sd", corpus, "vec_id", "embedding", cap)
    whD.overwrite("sd_centroids", whD.read("sd_centroids")
      .withColumn("seed_gen", lit("torn-reseed-generation")))
    val torn = intercept[IllegalArgumentException] { run(b1, whD) }
    assert(torn.getMessage.contains("torn"),
      s"torn-seed guard must name the failure: ${torn.getMessage}")
  }

  test("epoch order is observable: the kept representative follows arrival order") {
    import spark.implicits._
    import graft.tables.Warehouse
    // v5 ≈ v10 (cosine 1), both < 0.95 to every corpus vector — whoever
    // arrives first is kept, the other dropped; swapping epochs swaps it
    val corpus = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val b1 = Seq((5L, Array(0.8f, 0.6f))).toDF("vec_id", "embedding")
    val b2 = Seq((10L, Array(0.8f, 0.6f))).toDF("vec_id", "embedding")
    def keeps(first: org.apache.spark.sql.DataFrame,
        second: org.apache.spark.sql.DataFrame) = {
      val wh = new Warehouse(spark,
        java.nio.file.Files.createTempDirectory("graft-semord").toString)
      SemDedup.seedIndex(wh, "sd", corpus, "vec_id", "embedding", cap = 4)
      def k(df: org.apache.spark.sql.DataFrame) =
        SemDedup.processBatch(wh, "sd", df, "vec_id", "embedding",
          threshold = 0.95, cap = 4)
          .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      (k(first), k(second))
    }
    val (k1, k2) = keeps(b1, b2)
    assert(k1 == Map(5L -> true) && k2 == Map(10L -> false),
      "a later-epoch duplicate must drop against the earlier-epoch rep")
    // Swapped: id 10 arrives first and keeps (nothing lower matches);
    // id 5 arrives second and ALSO keeps — the keep-lowest rule never
    // drops a vector for a HIGHER-id candidate, so the observable
    // order-sensitivity is exactly id 10's verdict flip.
    val (s1, s2) = keeps(b2, b1)
    assert(s1 == Map(10L -> true) && s2 == Map(5L -> true),
      "swapping the epochs must flip the higher id's verdict only")
  }

  test("coarse-seeded index: verdicts exact within frozen cells, idempotent, justified") {
    import graft.tables.Warehouse
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-semincrc").toString)
    val corpus = e.filter(col("vec_id") % 2 =!= 0)
    val batch = e.filter(col("vec_id") % 2 === 0)
    val cap = 4
    SemDedup.seedIndexCoarse(wh, "sc", corpus, "vec_id", "embedding", cap)
    val cells = SemDedup.scaledCells(corpus.count())
    assert(wh.read("sc_centroids").count() == cells,
      "coarse seeding must freeze the same scaled centroid count")
    assert(wh.read("sc_reps").count() <= cap.toLong * cells)
    def vs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    val run1 = vs(SemDedup.processBatch(wh, "sc", batch,
      "vec_id", "embedding", threshold = 0.3, cap = cap))
    val run2 = vs(SemDedup.processBatch(wh, "sc", batch,
      "vec_id", "embedding", threshold = 0.3, cap = cap))
    assert(run1 == run2 && run1.size == batch.count(),
      "coarse-seeded batch verdicts must be idempotent and complete")
    // drops justified against capLowest(coarse-assigned corpus ∪
    // flat-assigned batch) — the exact candidate set the seed persisted
    import graft.expressions.DotProduct
    import org.apache.spark.sql.expressions.Window
    val cents = wh.read("sc_centroids")
    val assignedC = graft.sim.Ivf.indexHierarchical(
      corpus, "vec_id", "embedding", cents, SemDedup.scaledCells(cells))
    val assignedB = graft.sim.Ivf.index(batch, "vec_id", "embedding", cents)
    val seedReps = assignedC.withColumn("rn", row_number().over(
        Window.partitionBy("centroid_id").orderBy("neighbor_id")))
      .filter(col("rn") <= cap).drop("rn")
    val cand = seedReps.unionByName(assignedB)
      .withColumn("rn", row_number().over(
        Window.partitionBy("centroid_id").orderBy("neighbor_id")))
      .filter(col("rn") <= cap)
      .select(col("centroid_id").as("cell"), col("neighbor_id").as("idb"),
        col("cv").as("vb"))
    import spark.implicits._
    val justified = assignedB
      .select(col("centroid_id").as("cell"), col("neighbor_id").as("ida"),
        col("cv").as("va"))
      .join(cand, Seq("cell")).filter(col("idb") < col("ida"))
      .withColumn("cos", DotProduct.dot(spark, col("va"), col("vb")) /
        (graft.sim.Knn.norm(col("va")) * graft.sim.Knn.norm(col("vb"))))
      .filter(col("cos") >= 0.3).select(col("ida").as("vec_id")).distinct()
    val drops = run1.toSeq.toDF("vec_id", "cell", "keep")
      .filter(!col("keep")).select("vec_id")
    assert(drops.exceptAll(justified).isEmpty &&
      justified.exceptAll(drops).isEmpty,
      "exactly the coarse-candidate-justified batch vectors are dropped")
  }

  test("reseedIndex: emitted cut equals the full-corpus scaled dedup; index is fresh") {
    import graft.tables.Warehouse
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft-semreseed").toString)
    // stale index from a corpus PREFIX, then reseed over everything
    SemDedup.seedIndex(wh, "sd", e.filter(col("vec_id") % 3 === 0),
      "vec_id", "embedding", cap = 4)
    val cut = SemDedup.reseedIndex(wh, "sd", e, "vec_id", "embedding",
      threshold = 0.3, cap = 4)
    val direct = SemDedup.semanticDedupScaled(e, "vec_id", "embedding",
      threshold = 0.3, maxCellSize = Some(4))
    def vs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(vs(cut) == vs(direct),
      "post-reseed cut must equal the full-corpus semanticDedupScaled cut")
    val cells = SemDedup.scaledCells(e.count())
    assert(wh.read("sd_centroids").count() == cells,
      "reseed must re-scale the cell count to the grown corpus")
    assert(wh.read("sd_reps").count() <= 4L * cells)
    // the pipeline keeps running: a later batch verdicts against the
    // fresh index, idempotently
    import spark.implicits._
    val batch = e.limit(20).select(
      (col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val r1 = vs(SemDedup.processBatch(wh, "sd", batch, "vec_id",
      "embedding", threshold = 0.3, cap = 4))
    val r2 = vs(SemDedup.processBatch(wh, "sd", batch, "vec_id",
      "embedding", threshold = 0.3, cap = 4))
    assert(r1 == r2 && r1.size == 20)
  }

  test("threshold monotonicity: a stricter threshold on the same cells drops a subset") {
    val strict = SemDedup.semanticDedup(
      e, "vec_id", "embedding", numCells = 8, threshold = 0.4)
      .filter(!col("keep")).select("vec_id")
    val loose = out.filter(!col("keep")).select("vec_id")
    // same cells, stricter cosine predicate → fewer pairs → drops ⊆
    assert(strict.exceptAll(loose).isEmpty)
    assert(loose.count() > 0,
      "threshold must bind on the fixture for the gate to mean anything")
  }
}

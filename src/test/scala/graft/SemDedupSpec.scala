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
    assert(drops.count() >= (seedDrops * 9) / 10,
      s"trained-cell recall collapsed: ${drops.count()} vs seed $seedDrops")
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

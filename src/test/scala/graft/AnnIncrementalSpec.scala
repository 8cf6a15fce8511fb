package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sim.IvfPq
import graft.tables.Warehouse

/** Incremental IVF-PQ maintenance: (build + append) must leave the same
  * persisted index a fresh full build leaves (quantizers frozen, seeds in
  * the base split), and the staleness metric / rebuild trigger must track
  * appended volume. The search-parity contract is oracle-gated
  * (q_ann_incremental); these specs pin the index-table equality and the
  * maintenance lifecycle.
  */
class AnnIncrementalSpec extends SparkSpec {

  private val P = (8, 8, 8, 16) // numCells, m, subDim, ksub

  private def emb = Tables.t(spark, sf, "embeddings")

  private def buildSplit(): (Warehouse, org.apache.spark.sql.DataFrame) = {
    val (numCells, m, subDim, ksub) = P
    val wh = new Warehouse(spark,
      Files.createTempDirectory("graft-annincr").toString)
    val base = emb.filter(col("vec_id") < 16 || col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") >= 16 && col("vec_id") % 5 === 0)
    IvfPq.buildIndex(wh, "ann", base, "vec_id", "embedding",
      numCells, m, subDim, ksub, iters = 0)
    IvfPq.appendToIndex(wh, "ann", delta, "vec_id", "embedding", m, subDim)
    (wh, delta)
  }

  test("append leaves the identical persisted index a fresh full build leaves") {
    val (numCells, m, subDim, ksub) = P
    val (whIncr, _) = buildSplit()
    val whFull = new Warehouse(spark,
      Files.createTempDirectory("graft-annfull").toString)
    IvfPq.buildIndex(whFull, "ann", emb, "vec_id", "embedding",
      numCells, m, subDim, ksub, iters = 0)
    for (t <- Seq("ann_centroids", "ann_cells", "ann_codebooks", "ann_codes")) {
      val a = whIncr.read(t); val b = whFull.read(t)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$t differs between incremental and fresh build")
    }
  }

  test("appendToIndex replay is idempotent: a retried batch adds nothing") {
    val (_, m, subDim, _) = P
    val (wh, delta) = buildSplit()
    val cells0 = wh.read("ann_cells").count()
    val codes0 = wh.read("ann_codes").count()
    val stale0 = IvfPq.staleness(wh, "ann")
    // crash-replay of the same daily batch: must not duplicate candidate
    // rows or inflate staleness
    IvfPq.appendToIndex(wh, "ann", delta, "vec_id", "embedding", m, subDim)
    assert(wh.read("ann_cells").count() == cells0,
      "replayed append duplicated cell assignments")
    assert(wh.read("ann_codes").count() == codes0,
      "replayed append duplicated PQ codes")
    assert(IvfPq.staleness(wh, "ann") == stale0,
      "replayed append inflated the staleness metric")
  }

  test("pre-_meta index: staleness is a pure read; ensureMeta migrates once") {
    val (_, m, subDim, _) = P
    val (wh, delta) = buildSplit()
    val legacy = new Warehouse(spark,
      Files.createTempDirectory("graft-annlegacy").toString)
    for (t <- Seq("ann_centroids", "ann_cells", "ann_codebooks", "ann_codes"))
      legacy.overwrite(t, wh.read(t)) // everything EXCEPT _meta
    assert(!legacy.exists("ann_meta"))
    // a monitoring read must not fail AND must not write — two
    // back-to-back calls on a meta-less index leave no _meta behind
    assert(IvfPq.staleness(legacy, "ann") == 0.0,
      "pre-_meta index must read as staleness 0, not fail")
    assert(IvfPq.staleness(legacy, "ann") == 0.0)
    assert(!legacy.exists("ann_meta"),
      "staleness() must never write (pure read)")
    // explicit migration: backfills once, second call is a no-op
    assert(IvfPq.ensureMeta(legacy, "ann"), "first ensureMeta must backfill")
    assert(legacy.exists("ann_meta"))
    val builtN = legacy.read("ann_meta").head.getLong(0)
    assert(builtN == legacy.read("ann_cells").count())
    assert(!IvfPq.ensureMeta(legacy, "ann"), "replayed ensureMeta must no-op")
    assert(legacy.read("ann_meta").head.getLong(0) == builtN,
      "replayed ensureMeta reset the build point")
    // drift accounting starts at the migration point: appends after
    // ensureMeta are visible
    IvfPq.appendToIndex(legacy, "ann", delta, "vec_id", "embedding", m, subDim)
    assert(IvfPq.staleness(legacy, "ann") == 0.0,
      "replayed batch (already absorbed pre-migration) must not count")
  }

  test("staleness tracks appended volume; compactIfStale triggers and resets") {
    val (numCells, m, subDim, ksub) = P
    val (wh, delta) = buildSplit()
    val total = emb.count().toDouble
    val expected = delta.count() / total
    assert(math.abs(IvfPq.staleness(wh, "ann") - expected) < 1e-9,
      s"staleness ${IvfPq.staleness(wh, "ann")} != appended share $expected")
    // below threshold → no-op; above → rebuild, staleness resets to 0
    assert(!IvfPq.compactIfStale(wh, "ann", emb, "vec_id", "embedding",
      numCells, m, subDim, ksub, threshold = 0.5, iters = 0))
    assert(IvfPq.compactIfStale(wh, "ann", emb, "vec_id", "embedding",
      numCells, m, subDim, ksub, threshold = 0.05, iters = 0))
    assert(IvfPq.staleness(wh, "ann") == 0.0, "rebuild did not reset staleness")
    assert(!IvfPq.compactIfStale(wh, "ann", emb, "vec_id", "embedding",
      numCells, m, subDim, ksub, threshold = 0.05, iters = 0),
      "fresh index must not trigger another rebuild")
  }
}

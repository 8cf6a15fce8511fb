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

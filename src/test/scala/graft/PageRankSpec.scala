package graft

import graft.ops.PageRank

class PageRankSpec extends SparkSpec {

  test("symmetric pair splits mass evenly; ranks sum to 1") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = PageRank.ranks(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 0.5) < 1e-12 && math.abs(got(2L) - 0.5) < 1e-12)
  }

  test("undirected star concentrates rank on the hub") {
    import spark.implicits._
    val spokes = (2L to 5L)
    val fwd = spokes.map(s => (1L, s))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val got = PageRank.ranks(edges, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) > got(2L) * 2, got.toString)
    // symmetric spokes get identical rank
    assert(spokes.map(got).distinct.size == 1)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }
}

package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the traversal/sweep-line wave that the DuckDB
  * oracle equivalence alone doesn't pin down (both engines could share a
  * wrong convention; these checks anchor the intended semantics).
  */
class TraversalSpec extends SparkSpec {

  test("q_shortest_path: seeds at distance 0, bipartite parity, cap 4") {
    val rows = q("q_shortest_path").collect()
    val bySeed = rows.groupBy(_.getLong(0))
    assert(bySeed.keySet == Set(0L, 2L, 4L))
    for ((seed, rs) <- bySeed) {
      val self = rs.find(_.getLong(1) == seed).get
      assert(self.getInt(2) == 0, s"seed $seed not at distance 0")
    }
    for (r <- rows) {
      val (node, d) = (r.getLong(1), r.getInt(2))
      assert(d >= 0 && d <= 4)
      // customers are even nodes, suppliers odd; every edge flips parity,
      // and all seeds are customers — so dist parity == node parity
      assert(d % 2 == (node % 2).toInt,
        s"node $node at dist $d breaks bipartite parity")
    }
  }

  test("q_weighted_path matches a driver-side Bellman-Ford (<=3 hops)") {
    // rebuild the same weighted bipartite graph, then run the textbook
    // relaxation in plain Scala — the spec pins the ITERATION, the
    // DuckDB oracle already pins the SQL-expressible semantics
    val o = Tables.t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    val l = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_quantity")
    val fwd = o.join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      .agg((min("l_quantity").cast("long") % 9 + 1).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edges = fwd ++ fwd.map { case (a, b, w) => (b, a, w) }
    val adj = edges.groupBy(_._1)
    val expected = scala.collection.mutable.Map[(Long, Long), Long]()
    for (seed <- Seq(0L, 2L, 4L) if adj.contains(seed)) {
      var best = Map(seed -> 0L)
      for (_ <- 1 to 3) {
        val relaxed = for {
          (n, c) <- best.toSeq
          (_, d, w) <- adj.getOrElse(n, Array.empty[(Long, Long, Long)])
        } yield d -> (c + w)
        best = (best.toSeq ++ relaxed).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).min }
      }
      for ((n, c) <- best) expected((seed, n)) = c
    }
    val got = q("q_weighted_path").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected.toMap, "weighted-path table diverged")
    assert(got.nonEmpty)
  }

  test("q_hierarchy_closure: root is the leading digit, depth = digits-1") {
    val rows = q("q_hierarchy_closure").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (node, root, depth) = (r.getLong(0), r.getLong(1), r.getInt(2))
      val s = node.toString
      assert(root == s.head.asDigit.toLong, s"node $node root $root")
      assert(depth == s.length - 1, s"node $node depth $depth")
    }
  }

  test("q_interval_union: covered time bounded by raw duration sum") {
    val events = Tables.t(spark, sf, "events")
      .select(col("user_id"),
        round(col("value") * 1000).cast("long").as("dur"))
      .groupBy("user_id").agg(sum("dur").as("raw"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = q("q_interval_union").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (user, covered, islands) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (raw, n) = events(user)
      // merging can only shrink total coverage; islands can't exceed spans
      assert(covered <= raw, s"user $user covered $covered > raw $raw")
      assert(covered > 0 && islands >= 1 && islands <= n)
    }
  }

  test("q_concurrency_peak: peak is positive and witnessed by an interval") {
    val r = q("q_concurrency_peak").collect().head
    val (peak, at) = (r.getLong(0), r.getLong(1))
    assert(peak >= 1)
    // at the reported ms, at least `peak` intervals are open: [st, en)
    val open = Tables.t(spark, sf, "events")
      .select((unix_micros(col("ts")) / 1000).cast("long").as("st"),
        round(col("value") * 1000).cast("long").as("dur"))
      .filter(col("st") <= at && col("st") + col("dur") > at)
      .count()
    assert(open >= peak, s"only $open open at $at, peak claims $peak")
  }

  test("q_source_cap: at most 50 docs kept per source") {
    val rows = q("q_source_cap").collect()
    assert(rows.nonEmpty)
    for (r <- rows) assert(r.getLong(1) >= 1 && r.getLong(1) <= 50)
  }

  test("degree-oriented triangle count equals id-ordered on a hub graph") {
    import graft.ops.Triangles
    // a star hub (node 0 — where id-ordered wedges explode) overlaid
    // with cliques and chains touching the hub: exercises tie-breaking
    // (equal-degree leaves), hub orientation, and non-hub triangles
    val edges = (
      (1L to 20L).map(i => (0L, i)) ++                 // star: no triangles
        Seq((1L, 2L), (3L, 4L), (5L, 6L)) ++           // hub triangles
        Seq((21L, 22L), (22L, 23L), (21L, 23L)) ++     // off-hub triangle
        Seq((24L, 25L))                                 // isolated edge
      ).distinct
    val df = spark.createDataFrame(edges).toDF("doc_a", "doc_b")
    val fast = Triangles.count(df).first().getLong(0)
    val base = Triangles.countIdOrdered(df).first().getLong(0)
    assert(fast == base, s"degree-oriented $fast != id-ordered $base")
    assert(fast == 4L, s"expected 4 triangles, got $fast")
  }

  test("triangle parity holds on a random graph (seeded)") {
    import graft.ops.Triangles
    val rnd = new scala.util.Random(42)
    val edges = (for (_ <- 1 to 400) yield {
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
      if (a < b) Some((a, b)) else if (b < a) Some((b, a)) else None
    }).flatten.distinct
    val df = spark.createDataFrame(edges).toDF("doc_a", "doc_b")
    val fast = Triangles.count(df).first().getLong(0)
    val base = Triangles.countIdOrdered(df).first().getLong(0)
    assert(fast == base, s"degree-oriented $fast != id-ordered $base")
    assert(fast > 0, "vacuous random graph — raise edge count")
  }

  test("q_hits: each side is a distribution; auth-1 step equals indegree share") {
    val rows = q("q_hits").collect()
    val bySide = rows.groupBy(_.getAs[String]("side"))
    assert(bySide.keySet == Set("hub", "auth"))
    for ((side, rs) <- bySide) {
      val total = rs.map(_.getAs[Double]("score")).sum
      assert(math.abs(total - 1.0) < 1e-3, s"$side scores sum to $total")
      assert(rs.forall(_.getAs[Double]("score") >= 0))
    }
    // hubs are customers (even ids), authorities suppliers (odd ids)
    assert(bySide("hub").forall(_.getAs[Long]("node") % 2 == 0))
    assert(bySide("auth").forall(_.getAs[Long]("node") % 2 == 1))
  }

  test("q_random_walks: complete, edge-connected, parity-alternating walks") {
    val rows = q("q_random_walks").collect()
      .map(r => (r.getAs[Long]("start_id"), r.getAs[Int]("step"),
        r.getAs[Long]("node")))
    val byStart = rows.groupBy(_._1)
    assert(byStart.nonEmpty)
    // adjacency for edge-connectivity checks
    val o = Tables.t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    val l = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    val fwd = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("s"),
        (col("l_suppkey") * 2 + 1).cast("long").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (fwd ++ fwd.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    for ((start, steps) <- byStart) {
      val walk = steps.sortBy(_._2).map(_._3)
      assert(walk.length == 4, s"$start: incomplete walk ${walk.length}")
      assert(walk.head == start)
      for (Array(a, b) <- walk.sliding(2)) {
        assert(adj(a)(b), s"$start: $a -> $b is not an edge")
        // bipartite graph: every hop flips customer/supplier parity
        assert(a % 2 != b % 2, s"$start: parity not alternating at $a->$b")
      }
    }
  }

  test("q_kcore matches an independent driver-side peel") {
    val rows = q("q_kcore").collect()
    assert(rows.nonEmpty, "empty core — k too aggressive for this fixture")
    val k = rows.head.getAs[Long]("k")
    // in-core degree is >= k for every member, by definition
    assert(rows.forall(_.getAs[Long]("core_degree") >= k))
    // independent peel on collected edges
    val o = Tables.t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    val l = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    val fwd = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = (fwd ++ fwd.map(_.swap)).distinct
    var changed = true
    while (changed) {
      val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.length }
      val keep = deg.filter(_._2 >= k).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next.length != edges.length
      edges = next
    }
    val expect = edges.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    val got = rows.map(r => r.getAs[Long]("node") ->
      r.getAs[Long]("core_degree")).toMap
    assert(got == expect,
      s"core mismatch: ${got.size} vs ${expect.size} members")
  }
}

package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.dedup.ConnectedComponents

/** Large-star/small-star connected components: exactness against a
  * driver-side union-find on random graphs, plus the shapes that stress
  * the algorithm differently — long chains (where naive label propagation
  * needs O(diameter) rounds but star contraction needs O(log n)), cliques
  * (degree skew), and empties.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def ufLabels(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  private def ccLabels(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.labels(edges.toDF("src", "dst"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches union-find on random graphs") {
    val edgeGen: Gen[List[(Long, Long)]] =
      Gen.listOf(for {
        a <- Gen.choose(0L, 39L)
        b <- Gen.choose(0L, 39L) if a != b
      } yield (a, b))
    (1 to 6).flatMap(i =>
      edgeGen.apply(Gen.Parameters.default.withSize(30), Seed(500L + i)))
      .filter(_.nonEmpty)
      .foreach { edges =>
        val expected = ufLabels(40, edges)
        val got = ccLabels(edges)
        // labels() covers only nodes present in the edge set; singletons
        // are the caller's coalesce
        val present = edges.flatMap(e => Seq(e._1, e._2)).toSet
        assert(got.keySet == present, s"edges=$edges")
        got.foreach { case (n, l) =>
          assert(l == expected(n), s"node $n: got $l want ${expected(n)} edges=$edges")
        }
      }
  }

  test("chain of 60 collapses to one root within the O(log n) budget") {
    val chain = (0L until 59L).map(i => (i, i + 1))
    // 8 rounds ≫ log2(60) ≈ 6 but ≪ the 59 a diameter-bound algorithm needs
    val got = ccLabels(chain, maxIter = 8)
    assert(got.size == 60 && got.values.forall(_ == 0L))
  }

  test("clique plus isolated pairs keeps components separate") {
    val clique = for { a <- 10L to 19L; b <- (a + 1) to 19L } yield (a, b)
    val pairs = Seq((100L, 101L), (200L, 201L))
    val got = ccLabels(clique ++ pairs)
    assert((10L to 19L).forall(got(_) == 10L))
    assert(got(100L) == 100L && got(101L) == 100L)
    assert(got(200L) == 200L && got(201L) == 200L)
  }

  test("hitting the iteration cap before convergence throws, never emits") {
    import spark.implicits._
    // maxIter = 0 forbids even one contraction round on a non-trivial
    // graph: a silent return here could assign a node several labels
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.labels(
        Seq((0L, 1L), (1L, 2L)).toDF("src", "dst"), maxIter = 0).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("empty and self-loop-only edge sets yield no labels") {
    import spark.implicits._
    assert(ConnectedComponents.labels(
      Seq.empty[(Long, Long)].toDF("src", "dst")).isEmpty)
    assert(ConnectedComponents.labels(
      Seq((5L, 5L)).toDF("src", "dst")).isEmpty)
  }
}

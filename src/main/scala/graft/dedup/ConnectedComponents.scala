package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Materialize._

/** Distributed connected components over a pair table — the step that turns
  * near-duplicate PAIRS (MinHash / SimHash / Jaccard output) into dedup
  * CLUSTERS, so a corpus keeps exactly one canonical document per group of
  * transitively-linked near-dups. The reference stops at pairwise dedup
  * (delete+insert keyed on ids, e.g. dags/bexio/bexio_orders_de.py:131-149);
  * clustering is the missing transitive closure a corpus-scale pipeline
  * needs.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — converges in
  * O(log n) rounds even on pathological chain graphs, versus O(diameter)
  * for naive min-label propagation. Each half-round is two bounded shuffles
  * (a map-side-combinable `min` aggregation and an equi-join); no
  * `collect_set` of neighbor lists ever materializes, so a 10M-member
  * near-clique (the worst case real web corpora produce) never builds a
  * 10M-element array on one executor — the min-per-key aggregate partially
  * aggregates map-side and the join fans the result back out.
  *
  * Every round `localCheckpoint`s the edge set: iterative DataFrame algos
  * otherwise stack O(rounds) of lineage, re-running the whole history each
  * action. On a cluster with executor loss concerns, swap for reliable
  * `checkpoint` with a checkpoint dir; the algorithm is unchanged.
  */
object ConnectedComponents {

  /** Canonical undirected edge form: (u, v) with u < v, self-loops dropped,
    * duplicates merged. Both star operations emit edges in arbitrary
    * orientation; canonicalizing once per half-round keeps the set minimal.
    */
  private def canon(edges: DataFrame): DataFrame =
    edges.select(
        least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Large-star: every node u links each strictly-larger neighbor to the
    * minimum of its closed neighborhood. Two shuffles: min-by-key (partial
    * agg) + join back to the symmetric edge list.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u").as("a"), col("v").as("b"))
      .union(e.select(col("v").as("a"), col("u").as("b")))
    val m = sym.groupBy("a")
      .agg(min(col("b")).as("mn"))
      .select(col("a"), least(col("a"), col("mn")).as("m"))
    canon(sym.join(m, "a")
      .filter(col("b") > col("a"))
      .select(col("b").as("u"), col("m").as("v")))
  }

  /** Small-star: every node u links its smaller-or-equal neighbors (and
    * itself) to the minimum of that set. Keyed on the LARGER endpoint, so
    * high-degree roots don't become a single reduce key for their whole
    * component: each child contributes one row keyed by itself.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    // orient every edge towards its larger endpoint: a = max, b = min
    val oriented = e.select(col("v").as("a"), col("u").as("b"))
    val m = oriented.groupBy("a").agg(min(col("b")).as("m"))
    val grouped = oriented.join(m, "a")
    // emit (b, m) for every smaller neighbor b != m, plus (a, m) itself
    canon(
      grouped.filter(col("b") =!= col("m"))
        .select(col("b").as("u"), col("m").as("v"))
      .union(m.select(col("a").as("u"), col("m").as("v"))))
  }

  /** Order-insensitive signature of an edge set: (count, sum of per-edge
    * xxhash64, widened to decimal so ANSI mode can't overflow). Two
    * consecutive identical signatures mean the star forest is stable.
    * Probabilistic (a colliding sum could in principle mask a change), so
    * `maxIter` also hard-caps the loop; the scalacheck spec cross-checks
    * final labels against an exact union-find on random graphs.
    */
  private def signature(e: DataFrame): (Long, java.math.BigDecimal) = {
    val r = e.agg(
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("h")).first()
    (r.getLong(0), r.getDecimal(1))
  }

  /** Cluster labels for every node that appears in `edges`: (node,
    * cluster_id) where cluster_id is the minimum node id reachable from
    * `node`. Nodes absent from `edges` (singletons) are the caller's to
    * add — typically `coalesce(cluster_id, id)` after a left join, which
    * keeps this function free of a second full-corpus scan.
    *
    * @param edges two numeric columns `src`, `dst`; orientation and
    *              duplication don't matter.
    */
  def labels(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    var e = canon(edges.select(
        col("src").cast("long").as("u"),
        col("dst").cast("long").as("v")))
      .graftCheckpoint()
    var sig = signature(e)
    var converged = e.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).graftCheckpoint()
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      e = next
      iter += 1
    }
    // A non-converged star forest can assign a node MULTIPLE labels, and
    // downstream (golden-record survivorship, dedup cluster joins) assumes
    // exactly one — fail loudly rather than emit inconsistent clusters.
    // Star contraction halves component diameter per round, so the default
    // cap of 25 covers any physically storable graph; hitting it means the
    // input (or a bug) needs looking at, not a silent result.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter iterations; " +
          "raise maxIter or inspect the edge set")
    // converged star forest: every edge is (root, child) with root < child
    e.select(col("v").as("node"), col("u").as("cluster_id"))
      .union(e.select(col("u").as("node"), col("u").as("cluster_id")).distinct())
  }
}

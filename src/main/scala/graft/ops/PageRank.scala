package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Materialize._

/** Distributed PageRank by power iteration — the graph-centrality
  * primitive corpus curation uses to rank interlinked documents (Common
  * Crawl seed ranking, harmonic-centrality quality filters). Pure
  * DataFrame ops: per iteration one equi-join (ranks → edges) and one
  * map-side-combinable sum per destination; lineage reset per round via
  * `localCheckpoint` (swap for reliable `checkpoint` on a cluster). The
  * edge list and degrees are materialized ONCE and reused every round —
  * the join re-shuffles only the rank table (|V| rows), not the edges.
  *
  * Dangling mass (nodes with no out-edges) is DROPPED, not redistributed
  * — callers wanting the textbook stochastic matrix should symmetrize or
  * add sink self-loops first. Kept that way so the per-iteration formula
  * `r' = (1−d)/N + d·Σ r/deg` is literally what any external engine
  * (the SQL oracle's recursive CTE) recomputes.
  */
object PageRank {

  /** Ranks after exactly `iters` power iterations from the uniform start.
    * `edges` needs numeric `src`, `dst` columns; direction respected,
    * duplicates collapsed. After the first iteration the rank table holds
    * exactly the nodes that RECEIVE mass (every node, when the edge set
    * is symmetric); in-edge-free sources stop contributing after round
    * one — the same semantics the oracle's recursive CTE computes.
    */
  def ranks(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = e.join(deg, "src").graftCheckpoint()
    val n = withDeg.select("src").distinct().count()
    var ranks = withDeg.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1.0 / n))
    (1 to iters).foreach { _ =>
      ranks = withDeg.join(ranks, col("src") === col("node"))
        .select(col("dst"), (col("rank") / col("deg")).as("__c"))
        .groupBy("dst")
        .agg(sum("__c").as("__s"))
        .select(col("dst").as("node"),
          (lit((1.0 - damping) / n) + lit(damping) * col("__s")).as("rank"))
        .graftCheckpoint()
    }
    ranks
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => fn}

/** Triangle counting over an undirected edge list, degree-oriented.
  *
  * Reference behavior: the near-dup cluster quality checks
  * (clustering-coefficient denominators) the pipeline's dedup audits
  * compute; re-expressed as the standard two-join wedge-close plan.
  *
  * Orient every undirected edge from its lower-(degree, id) endpoint to
  * the higher one. The orientation is a DAG (it follows a total order on
  * vertices), so each triangle has exactly one vertex with both incident
  * edges outgoing — the wedge at that vertex is counted once and closed
  * against the undirected edge between its two heads. Compared with
  * id-ordered wedges, fan-out at any vertex is bounded by its
  * OUT-degree under the orientation, which is O(√m) on arbitrary graphs
  * (Schank/Wagner forward counting): a power-law hub stops generating
  * quadratic wedges because its edges point INTO it.
  *
  * Shuffles: one degree aggregate (map-side partial), two equi-joins for
  * the degree attach (degree table is |V|-sized — broadcastable for most
  * graphs), one self-join on the wedge source, one closing equi-join.
  * No driver-side state; every step is a DataFrame op.
  */
object Triangles {

  /** @param edges undirected edge list with columns (doc_a, doc_b),
    *              canonical doc_a < doc_b, no duplicates.
    * @return single-row DataFrame: n_triangles BIGINT
    */
  def count(edges: DataFrame): DataFrame = {
    val und = edges.select(col("doc_a"), col("doc_b"))
    val deg = und.select(col("doc_a").as("v"))
      .unionAll(und.select(col("doc_b").as("v")))
      .groupBy("v").agg(fn.count(lit(1)).as("deg"))
    // attach both endpoint degrees; the deg table is vertex-sized, so
    // Spark broadcasts it below the auto-broadcast threshold — at larger
    // |V| these become shuffle joins on the edge key, still linear
    val withDeg = und
      .join(deg.select(col("v").as("doc_a"), col("deg").as("da")), "doc_a")
      .join(deg.select(col("v").as("doc_b"), col("deg").as("db")), "doc_b")
    // orient low→high under (deg, id); acyclic by construction
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("doc_a") < col("doc_b"))
    val dir = withDeg.select(
      when(aFirst, col("doc_a")).otherwise(col("doc_b")).as("src"),
      when(aFirst, col("doc_b")).otherwise(col("doc_a")).as("dst"))
    // wedges at the out-degree-2 vertex; v<w picks each head pair once
    val w1 = dir.select(col("src"), col("dst").as("v"))
    val w2 = dir.select(col("src"), col("dst").as("w"))
    val wedges = w1.join(w2, "src").filter(col("v") < col("w"))
    // close against the canonical undirected edge (doc_a<doc_b == v<w)
    wedges.join(und,
        col("v") === col("doc_a") && col("w") === col("doc_b"), "left_semi")
      .agg(fn.count(lit(1)).as("n_triangles"))
  }

  /** The id-ordered wedge join (orientation = vertex id) — kept as the
    * parity baseline TraversalSpec checks the degree-oriented plan
    * against; quadratic at hub vertices, so never the default.
    */
  def countIdOrdered(edges: DataFrame): DataFrame = {
    val e = edges.select(col("doc_a"), col("doc_b"))
    val x = e.select(col("doc_a").as("a"), col("doc_b").as("b"))
    val y = e.select(col("doc_a").as("b"), col("doc_b").as("c"))
    val z = e.select(col("doc_a").as("a"), col("doc_b").as("c"))
    x.join(y, Seq("b")).join(z, Seq("a", "c"), "left_semi")
      .agg(fn.count(lit(1)).as("n_triangles"))
  }
}

package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Distribution-shift monitoring between corpus slices — "did the crawl
  * drift?" / "does source X look like source Y?" — via pairwise
  * Jensen–Shannon divergence of per-class unigram distributions. The
  * reference has no analogue (its closest is per-tenant UNION ALL
  * consolidation, dags/sql-queries/bexio_and_stripe/shore_bexio_all.py);
  * a training-data pipeline needs this before deciding mixture weights.
  */
object DistShift {

  /** Pairwise JS divergence (in bits, ∈ [0,1]) between the unigram
    * distributions of every class pair. One token explode, two bounded
    * aggregations, then a term equi-join between class-term tables —
    * each term contributes ≤ C² rows (C = #classes, small), so the join
    * never goes quadratic in corpus size.
    *
    * Terms exclusive to one side are NOT joined away: their total KL mass
    * is `(1 − Σ_shared p)·log2`, folded in algebraically — so the join can
    * stay inner (scale-safe) while the divergence stays exact:
    * `JS_bits = (S_a + S_b)/(2·ln2) + 1 − (M_a + M_b)/2` with
    * `S_x = Σ_shared p_x·ln(2p_x/(p_a+p_b))`, `M_x = Σ_shared p_x`.
    * Class pairs sharing no terms at all produce no row (their JS is
    * exactly 1 bit); emit them from the class list if needed.
    */
  def jsDivergence(docs: DataFrame, classCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(classCol).as("cls"),
        explode(split(Dedup.normalized(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val ct = tok.groupBy("cls", "term").agg(count(lit(1)).as("n_ct"))
    val totals = ct.groupBy("cls").agg(sum("n_ct").as("n_c"))
    val p = ct.join(broadcast(totals), "cls")
      .select(col("cls"), col("term"),
        (col("n_ct").cast("double") / col("n_c")).as("p"))
    val a = p.select(col("cls").as("cls_a"), col("term"), col("p").as("pa"))
    val b = p.select(col("cls").as("cls_b"), col("term"), col("p").as("pb"))
    a.join(b, Seq("term")).filter(col("cls_a") < col("cls_b"))
      .groupBy("cls_a", "cls_b")
      .agg(
        sum(col("pa") * log(lit(2.0) * col("pa") / (col("pa") + col("pb")))).as("sa"),
        sum(col("pb") * log(lit(2.0) * col("pb") / (col("pa") + col("pb")))).as("sb"),
        sum("pa").as("ma"), sum("pb").as("mb"))
      .select(col("cls_a"), col("cls_b"),
        round(lit(0.5) * (col("sa") + col("sb")) / math.log(2.0)
          + lit(0.5) * (lit(2.0) - col("ma") - col("mb")), 4).as("js_bits"))
  }
}

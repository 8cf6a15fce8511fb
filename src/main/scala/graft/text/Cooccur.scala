package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Document-level word co-occurrence with pointwise mutual information —
  * the distributional-semantics census (collocation mining, topic seeds,
  * embedding sanity checks). PMI(a,b) = ln(N·n_ab / (df_a·df_b)) over
  * document co-membership; every term inside the log is an exact integer,
  * so both engines divide the same two exactly-representable doubles and
  * the only float op is one `ln`.
  *
  * Scale shape: the pair stage self-joins the doc×word table ON doc_id —
  * per-document |vocab∩doc|² candidate rows, corpus-linear overall — and
  * partial-aggregates map-side before the (w1, w2) shuffle. The
  * `topVocab` cap (df-ranked, broadcast) bounds the per-document blowup
  * BEFORE pairing: a 100 TB corpus pairs only its top-K terms, which is
  * what collocation mining wants anyway.
  */
object Cooccur {

  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
      topVocab: Int = 1000, minCount: Long = 1): DataFrame = {
    val words = Dedup.wordSets(docs, idCol, textCol)
      .select(col(idCol).as("doc_id"), explode(col("words")).as("word"))
      .filter(col("word") =!= "")
    val dfCounts = words.groupBy("word").agg(count(lit(1)).as("df"))
    val top = dfCounts.orderBy(col("df").desc, col("word")).limit(topVocab)
    val wv = words.join(broadcast(top), Seq("word"))
    val n = docs.agg(count(lit(1)).as("n"))
    val a = wv.select(col("doc_id"), col("word").as("w1"), col("df").as("df1"))
    val b = wv.select(col("doc_id"), col("word").as("w2"), col("df").as("df2"))
    a.join(b, Seq("doc_id")).filter(col("w1") < col("w2"))
      .groupBy("w1", "w2", "df1", "df2")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("n_ab"),
        round(log((col("n_ab") * col("n")).cast("double")
          / (col("df1") * col("df2"))), 4).as("pmi"))
  }
}

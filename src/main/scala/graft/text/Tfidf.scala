package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** TF-IDF term scoring over a document corpus — the classic relevance /
  * keyword-extraction primitive. Fully distributed: token explode → two
  * aggregations (tf per doc-term, df per term) → broadcast of the one-row
  * corpus size → per-doc top-k via a PARTITIONED window. No global window,
  * no driver-side counts in the plan.
  */
object Tfidf {

  /** One row per (doc, term) with tf, df and smoothed tf-idf
    * `tf * ln((N + 1) / (df + 1))`, N = number of docs with ≥1 token.
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(split(Dedup.normalized(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df_ = tok.groupBy("term").agg(countDistinct("doc_id").as("df"))
    val n = tok.agg(countDistinct("doc_id").as("n_docs"))
    tf.join(df_, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6))
  }

  /** Top-k terms per document by tf-idf, ties broken by term — fully
    * deterministic. The window is partitioned by doc: parallel at any
    * corpus size.
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    score(docs, idCol, textCol)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tfidf"),
        col("rnk").cast("int").as("rnk"))
  }

  /** Global top-k word bigrams by frequency (the n-gram census a corpus
    * report starts with). `zip_with(slice, slice)` forms adjacent pairs
    * row-locally; global ordering is a TakeOrdered (no full sort).
    */
  def topBigrams(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val toks = split(Dedup.normalized(col(textCol)), " ")
    val n = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(
      slice(toks, lit(1), n),
      slice(toks, lit(2), n),
      (a, b) => concat(a, lit(" "), b))
    docs.select(explode(bigrams).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)
  }
}

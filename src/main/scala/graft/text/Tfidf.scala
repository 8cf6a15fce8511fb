package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.Materialize._

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

  /** Sparse weighted cosine similarity pairs (Bayardo et al.'s all-pairs
    * problem): documents as tf-idf vectors, pairs scored by
    * dot/(‖a‖·‖b‖) over the shared-term inverted join — the WEIGHTED
    * sibling of the set-Jaccard family (rare shared terms matter more
    * than stopwords, which carry ≈0 idf weight). The join key is the
    * term, so cost concentrates in high-df terms — exactly the terms
    * whose weights are near zero; at corpus scale add a df cap / prefix
    * filter (the Dedup.jaccardInvertedIndex treatment) before the join.
    * tf-idf weights come pre-rounded (6 dp) from [[score]], so both
    * engines aggregate identical doubles.
    */
  def sparseCosinePairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    // materialize once: feeds the norm aggregate and both join sides
    val w = score(docs, idCol, textCol)
      .select(col("doc_id"), col("term"), col("tfidf").as("w"))
      .graftCheckpoint()
    val norms = w.groupBy("doc_id")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val a = w.select(col("doc_id").as("doc_a"), col("term"), col("w").as("wa"))
    val b = w.select(col("doc_id").as("doc_b"), col("term"), col("w").as("wb"))
    a.join(b, Seq("term")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(sum(col("wa") * col("wb")).as("dot"))
      .join(norms.select(col("doc_id").as("doc_a"), col("nrm").as("na")),
        Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("nrm").as("nb")),
        Seq("doc_b"))
      .filter(col("dot") / (col("na") * col("nb")) >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("dot") / (col("na") * col("nb")), 4).as("cos"))
  }

  /** Okapi BM25 relevance of every document against a fixed bag of query
    * terms — the retrieval scorer behind quality-filtering a corpus by
    * closeness to a target domain. One token explode feeding three
    * aggregations: per-doc length, per-(doc,term) tf restricted to the
    * query bag, per-term df; corpus size N and avgdl are one-row
    * broadcasts. Scoring every document (no top-k truncation) keeps the
    * result selection-free; callers re-rank/limit downstream.
    *
    * avgdl is `sum(dl)::double / N` — an exact integer sum then one
    * division — NOT `avg()`, whose engine-specific accumulation order
    * would make cross-engine float drift possible.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(split(Dedup.normalized(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = tok.filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(df_), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(sum("contrib").as("score"))
    docs.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("score"), lit(0.0)), 4).as("bm25"))
  }
}

package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus deduplication for training-data pipelines. Every stage is a
  * DataFrame→DataFrame transform with bounded shuffles — no driver-side
  * state — so the same code runs on 500 fixture docs or a 100 TB corpus.
  */
object Dedup {

  /** Normalization applied before any dedup comparison. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Exact dedup by content hash: one shuffle on the (hashed) normalized
    * text. Keeps the smallest id as canonical — deterministic, unlike
    * dropDuplicates which keeps an arbitrary row. At scale, group on the
    * 256-bit digest rather than the full text to keep shuffle rows small.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), sha2(normalized(col(textCol)), 256).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Distinct word set per document (unigram shingles). */
  def wordSets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      array_distinct(split(normalized(col(textCol)), " ")).as("words"))

  /** Exact word-set Jaccard pairs ≥ threshold. All-pairs — correct as the
    * small-corpus ground truth and as the verifier behind MinHash; at
    * corpus scale the candidate set must come from [[MinHashLSH]] instead
    * (this is O(n²) by construction).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val w = wordSets(df, idCol, textCol)
    val a = w.select(col(idCol).as("doc_a"), col("words").as("wa"))
    val b = w.select(col(idCol).as("doc_b"), col("words").as("wb"))
    a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("wa"), col("wb"))).cast("double")
          / size(array_union(col("wa"), col("wb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}

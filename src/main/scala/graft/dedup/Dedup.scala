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

  /** Exact word-set Jaccard pairs ≥ threshold. Two physical strategies,
    * chosen by vocabulary size (a planning-time scalar, like AQE's stats):
    *
    * - vocab ≤ 64 → BITMASK: each word gets a bit, each document reduces to
    *   one long; per-pair Jaccard is `popcount(a&b)/popcount(a|b)` — pure
    *   codegen integer ops. (Per-pair array_intersect on the same data
    *   measured ~300 s for 500 docs; this runs the 5 000-doc / 12.5M-pair
    *   case in seconds.)
    * - vocab > 64 → inverted index: explode distinct words, equi-join on
    *   word, count shared words per pair. Ubiquitous-word skew at corpus
    *   scale is handled upstream by document-frequency filtering or by
    *   taking candidates from [[MinHashLSH]] instead.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val w = wordSets(df, idCol, textCol)
      .select(col(idCol).as("doc_id"), explode(col("words")).as("word"))
    val vocab = w.select("word").distinct()
    if (vocab.count() <= 64) jaccardBitmask(w, threshold)
    else jaccardInvertedIndex(w, threshold)
  }

  private def jaccardBitmask(w: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bits = w.select("word").distinct()
      .withColumn("bit", row_number().over(Window.orderBy("word")) - 1)
    val masks = w.join(broadcast(bits), Seq("word"))
      .groupBy("doc_id")
      .agg(bit_or(expr("shiftleft(1L, bit)")).as("mask"))
    val a = masks.select(col("doc_id").as("doc_a"), col("mask").as("ma"))
    val b = masks.select(col("doc_id").as("doc_b"), col("mask").as("mb"))
    a.crossJoin(broadcast(b))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        bit_count(col("ma").bitwiseAND(col("mb"))).cast("double")
          / bit_count(col("ma").bitwiseOR(col("mb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  private def jaccardInvertedIndex(w: DataFrame, threshold: Double): DataFrame = {
    val sizes = w.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = w.select(col("doc_id").as("doc_a"), col("word"))
      .join(w.select(col("doc_id").as("doc_b"), col("word")), Seq("word"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-quality analysis for training-data pipelines: length/token/punct/
  * stopword features per document, all as codegen'd column expressions —
  * a 100 TB corpus runs these embarrassingly parallel with zero shuffles.
  */
object TextStats {

  /** Whitespace tokenization (the cheap counter). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish lexer tokenization: letter runs, digit runs, single
    * punctuation — the usual pre-tokenizer shape for LLM token estimates.
    */
  val lexerPattern = "\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]"
  def lexTokens(text: Column): Column = regexp_extract_all(text, lit(lexerPattern), lit(0))

  def stopwords: Seq[String] = Seq("the", "and", "of", "to", "a")
  private def stopwordRe = s"\\b(${stopwords.mkString("|")})\\b"

  /** Per-document quality features. Ratios are rounded to 4 places so the
    * values are engine-portable (see tools/check.py notes on rounding).
    */
  def features(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val len = length(t).cast("long")
    val alpha = length(regexp_replace(t, "[^A-Za-z]", "")).cast("long")
    df
      .withColumn("n_chars_calc", len)
      .withColumn("n_tokens", size(tokens(t)).cast("long"))
      .withColumn("n_lex_tokens", size(lexTokens(t)).cast("long"))
      .withColumn("alpha_ratio", round(alpha.cast("double") / len, 4))
      .withColumn("n_stopwords",
        size(regexp_extract_all(lower(t), lit(stopwordRe), lit(0))).cast("long"))
      .withColumn("mean_token_len",
        round(length(regexp_replace(t, "\\s+", "")).cast("double")
          / size(tokens(t)), 4))
  }

  /** Repetition detection (the Gopher-rules quality signal a training
    * pipeline filters on): per document, the most-repeated word trigram's
    * count and its share of all trigrams. Boilerplate/spam shows
    * rep_ratio near 1; organic prose stays low. Shuffles on (doc, trigram)
    * then (doc) — both partitioned by document, no global state.
    * Documents with fewer than 3 tokens carry no trigram and are omitted.
    */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // toks materialized as a column: inlined into the transform lambda,
    // Catalyst re-evaluates the split per trigram (the Fingerprint lesson)
    val t = df.withColumn("__toks",
        split(graft.dedup.Dedup.normalized(col(textCol)), " "))
      .filter(size(col("__toks")) >= 3)
    val tri = t.select(col(idCol),
      explode(transform(
        sequence(lit(1), size(col("__toks")) - 2),
        i => concat_ws(" ", slice(col("__toks"), i, lit(3))))).as("tri"))
    tri.groupBy(col(idCol), col("tri")).agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(max(col("__n")).as("max_rep"), sum(col("__n")).as("n_tri"))
      .select(col(idCol), col("max_rep"),
        round(col("max_rep").cast("double") / col("n_tri"), 4).as("rep_ratio"))
  }

  /** Composite quality score in [0,1]: long-enough, word-like, has
    * stopwords — the usual crude pre-filter before expensive dedup.
    */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame =
    features(df, textCol).withColumn("quality",
      round(
        least(col("n_tokens").cast("double") / 50.0, lit(1.0)) * 0.4 +
        col("alpha_ratio") * 0.4 +
        least(col("n_stopwords").cast("double") / 5.0, lit(1.0)) * 0.2, 4))

  /** Per-document Shannon character entropy (bits/char) — the gibberish /
    * binary-blob detector: natural prose sits ~3.5–4.5 bits, base64 and
    * random bytes push past 5.5, single-char spam drops near 0. Char
    * explode → (doc,char) counts → per-doc `-Σ p·log₂p`. Both shuffles
    * key on the document, so the plan is partition-parallel at any corpus
    * size; the per-doc char alphabet (≤ a few hundred keys) keeps the
    * second aggregate tiny. Entropy is rounded to 4 decimals: log ulp
    * differences across engines sit ~1e-15, ten orders below the
    * rounding grain.
    */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = df
      .withColumn("__t", graft.dedup.Dedup.normalized(col(textCol)))
      .filter(length(col("__t")) > 0)
      .select(col(idCol), explode(split(col("__t"), "")).as("ch"))
      .filter(col("ch") =!= "")
    chars.groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(sum(col("__n")).as("__len"),
        count(lit(1)).as("n_distinct_chars"),
        sum(col("__n") * log(col("__n").cast("double"))).as("__nlogn"))
      // H = log2(len) - (Σ n·ln n)/(len·ln 2); algebraically identical to
      // -Σ p log2 p but each row contributes ONE log, not a division first
      .select(col(idCol),
        col("n_distinct_chars").cast("int").as("n_distinct_chars"),
        round(
          log(2.0, col("__len").cast("double")) -
            col("__nlogn") / (col("__len") * math.log(2.0)), 4)
          .as("entropy_bits"))
  }
}

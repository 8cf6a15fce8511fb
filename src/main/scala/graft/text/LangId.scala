package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heuristic language identification: score each language by hits of its
  * characteristic function words / character classes, pick the argmax.
  * Pure column expressions (one pass, no shuffle, no UDF) — the standard
  * large-corpus shape where a real model (fastText etc.) would slot into
  * the same argmax structure via a batched mapPartitions.
  */
object LangId {

  /** Function-word profiles (tiny on purpose: this is the n-gram heuristic
    * tier, not a trained model). */
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que"),
    "es" -> Seq("el", "los", "las", "es", "una", "que", "para"))

  private def score(t: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(t),
      lit(s"\\b(${words.mkString("|")})\\b"), lit(0)))

  /** CJK detection is script-based, not word-based. */
  private def cjkCount(t: Column): Column =
    size(regexp_extract_all(t, lit("[\\p{script=Han}]"), lit(0)))

  /** Adds `lang_pred` (best language, 'und' when nothing scores) and
    * `lang_score` (hit count of the winner).
    */
  def detect(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(score(t, words).as("s"), lit(lang).as("l"))
    } :+ struct((cjkCount(t) * 3).as("s"), lit("zh").as("l"))
    val best = greatest(scored: _*)
    df.withColumn("lang_pred",
        when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und")))
      .withColumn("lang_score", best.getField("s"))
  }
}

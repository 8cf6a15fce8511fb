package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materialize._

/** Fuzzy string matching for entity resolution: all pairs within a
  * Levenshtein distance bound, with EXACT (recall-1.0) candidate blocking.
  *
  * Two composed blocks, both implied by `dist ≤ d`:
  *
  *  - LENGTH: `|len(a) − len(b)| ≤ d` — one side explodes to its
  *    d-neighborhood of lengths, the join is an equi-join on the length
  *    key; per-block density bounds the worst task.
  *  - Q-GRAM PREFIX (ED-Join, Xiao et al., VLDB'08): one edit destroys at
  *    most q of a string's positional q-grams, so two strings within
  *    distance d share all but ≤ q·d of their grams — under any GLOBAL
  *    total order on grams, each string only needs to index its first
  *    q·d + 1 grams (ordered by ascending document frequency, so the
  *    indexed grams are the rarest) and every true pair still collides.
  *    This is what breaks the degenerate case the length block can't: a
  *    corpus where every string has the same length (e.g. generated keys)
  *    blocks into ONE length bucket, while its gram prefixes still
  *    partition it by content.
  *
  * Strings too short to own q·d + 1 grams (len < q·(d+1)) carry no prefix
  * guarantee — they fall back to the length block against the whole
  * corpus. Both candidate sets are unioned, deduplicated, and verified
  * with the real `levenshtein`, so the result is identical to the
  * quadratic theta join.
  */
object Fuzzy {

  /** Candidate (id_a < id_b) pairs — superset of all pairs within
    * `maxDist`, exposed so specs can assert the blocking actually prunes
    * (candidate volume ≪ n²) without relying on plan internals.
    */
  def candidatePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0 && q >= 1)
    // consumed by the gram index, both join sides and the short fallback —
    // materialize once (the localCheckpoint pattern used across graft)
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"),
      length(col(strCol)).as("len")).graftCheckpoint()
    val minLen = q * (maxDist + 1) // len − q + 1 ≥ q·d + 1 ⇔ prefix holds
    val long = base.filter(col("len") >= minLen)
    val short = base.filter(col("len") < minLen)

    // positional-gram EXPLODE → distinct gram set per long string
    val grams = long.select(col("id"),
        explode(array_distinct(transform(
          sequence(lit(1), col("len") - (q - 1)),
          i => col("s").substr(i, lit(q))))).as("gram"))
    // global rarity order = (corpus gram frequency, gram)
    val dfT = grams.groupBy("gram").agg(count(lit(1)).as("__df"))
    val byRarity = Window.partitionBy("id").orderBy(col("__df"), col("gram"))
    val prefix = grams.join(dfT, Seq("gram"))
      .withColumn("__rk", row_number().over(byRarity))
      .filter(col("__rk") <= q * maxDist + 1)
      .select("id", "gram")
    val lenOf = base.select(col("id"), col("len"))
    val candLong = prefix.select(col("id").as("id_a"), col("gram"))
      .join(prefix.select(col("id").as("id_b"), col("gram")), Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      // the length filter still applies — cheap post-join prune
      .join(lenOf.select(col("id").as("id_a"), col("len").as("__la")), Seq("id_a"))
      .join(lenOf.select(col("id").as("id_b"), col("len").as("__lb")), Seq("id_b"))
      .filter(abs(col("__la") - col("__lb")) <= maxDist)
      .select("id_a", "id_b")

    // short strings: length-blocked against EVERYTHING in ±d (guarantee
    // needs one side short; canonicalize so either id order is kept)
    val sk = short.withColumn("__lk",
      explode(sequence(col("len") - maxDist, col("len") + maxDist)))
    val candShort = base.select(col("id").as("__ia"), col("len").as("__la"))
      .join(sk.select(col("id").as("__ib"), col("__lk")),
        col("__la") === col("__lk") && col("__ia") =!= col("__ib"))
      .select(least(col("__ia"), col("__ib")).as("id_a"),
        greatest(col("__ia"), col("__ib")).as("id_b"))

    candLong.union(candShort).distinct()
  }

  /** Pairs `(id_a, id_b, dist)` with `dist ≤ maxDist`, `id_a < id_b` —
    * exact: candidate recall is 1.0 and every candidate is verified with
    * the real edit distance.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
    candidatePairs(df, idCol, strCol, maxDist, q)
      .join(base.select(col("id").as("id_a"), col("s").as("s_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("s").as("s_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching for entity resolution: all pairs within a
  * Levenshtein distance bound. Candidate generation is BLOCKED on string
  * length (edit distance ≤ d ⇒ length difference ≤ d): one side explodes
  * to its d-neighborhood of lengths and the join is a plain equi-join on
  * the length key — never a cross join, so per-block density (strings per
  * length), not corpus size, bounds the worst task. Sharper blocking
  * (prefix buckets, q-gram counts) drops in by swapping the key column.
  */
object Fuzzy {

  /** Pairs `(id_a, id_b, dist)` with `dist ≤ maxDist`, `id_a < id_b`. */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 0)
    val a = df.select(col(idCol).as("id_a"), col(strCol).as("s_a"),
      length(col(strCol)).as("__la"))
    val b = df.select(col(idCol).as("id_b"), col(strCol).as("s_b"),
        length(col(strCol)).as("__lb"))
      .withColumn("__lk",
        explode(sequence(col("__lb") - maxDist, col("__lb") + maxDist)))
    a.join(b, col("__la") === col("__lk") && col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
  }
}

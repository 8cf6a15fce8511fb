package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document fingerprinting via character-k-gram hashing with winnowing:
  * hash every k-gram, keep the minimum of each sliding window of w hashes
  * (the winnowing sketch), and condense to a single 64-bit fingerprint.
  * Two documents sharing long substrings share sketch hashes. All
  * higher-order column expressions — row-local, shuffle-free.
  *
  * IMPORTANT: the k-gram hash array must be materialized as its own column
  * before winnowing. Inlining it into the window lambda makes Catalyst
  * re-evaluate the whole O(n) array for every window element — O(n²) per
  * row (measured: minutes/row on 500-char docs).
  */
object Fingerprint {

  /** Hashes of all character k-grams of `text`. `hashFn` defaults to the
    * fast engine-internal xxhash64; pass [[graft.expressions.Hashing.sha60]]
    * when an external oracle must recompute the hashes.
    */
  def kgramHashes(text: Column, k: Int,
      hashFn: Column => Column = xxhash64(_)): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => hashFn(substring(text, i, lit(k))))

  /** Winnowing sketch over a MATERIALIZED hash-array column (see scaladoc). */
  def winnow(hashes: Column, w: Int): Column =
    array_sort(array_distinct(transform(
      sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1))),
      i => array_min(slice(hashes, i, lit(w))))))

  /** Adds `sketch` (array<long>) and `fingerprint` (xor-fold of the
    * canonical sketch — order-independent over the sorted-distinct sketch,
    * reproducible by any engine) columns. Equal fingerprints ⇒ near-certain
    * duplicate content; shared sketch hashes ⇒ shared substrings.
    */
  def withFingerprint(df: DataFrame, textCol: String, k: Int = 5, w: Int = 4,
      sketchCol: String = "sketch", fpCol: String = "fingerprint",
      hashFn: Column => Column = xxhash64(_)): DataFrame =
    df.withColumn("__kg", kgramHashes(col(textCol), k, hashFn))
      .withColumn(sketchCol, winnow(col("__kg"), w))
      .withColumn(fpCol,
        aggregate(col(sketchCol), lit(0L), (acc, x) => acc.bitwiseXOR(x)))
      .drop("__kg")
}

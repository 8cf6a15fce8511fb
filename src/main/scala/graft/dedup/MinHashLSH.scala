package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + banded LSH near-duplicate detection — the scale path for
  * Jaccard dedup. shingle → minhash signature → band buckets → candidate
  * pairs → exact-Jaccard verification. Compared with [[Dedup.jaccardPairs]]
  * (O(n²)), candidate generation here is O(n·bands) shuffle rows: only
  * documents sharing a band bucket are ever compared, which is what makes
  * 100 TB feasible.
  *
  * All hashing is xxhash64 with the band/permutation index mixed in — fully
  * deterministic across runs and engines.
  */
object MinHashLSH {

  final case class Config(
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.8) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  /** Distinct word-k-shingles per document: (id, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = split(Dedup.normalized(col(textCol)), " ")
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(k))))
    df.select(col(idCol).as("doc_id"), explode(array_distinct(grams)).as("shingle"))
      .distinct()
  }

  /** Per-document minhash signature: H min-aggregate columns (h0..hN), one
    * per simulated permutation (shingle hashed with the slot index). The H
    * mins are computed as map-side partial aggregates — the shuffle carries
    * one row of H longs per document, NOT an exploded (doc, slot) row per
    * shingle×slot (the explode formulation shuffled 64× the shingle count
    * and ran ~3× slower).
    */
  def minhashSignatures(sh: DataFrame, cfg: Config): DataFrame =
    sh.groupBy("doc_id").agg(
      min(xxhash64(lit(0), col("shingle"))).as("h0"),
      (1 until cfg.numHashes).map(i =>
        min(xxhash64(lit(i), col("shingle"))).as(s"h$i")): _*)

  /** Band signatures: hash the r min-values of each band into one bucket
    * key → (doc_id, band, band_sig).
    */
  def bandSignatures(sig: DataFrame, cfg: Config): DataFrame = {
    val bandCols = (0 until cfg.bands).map { b =>
      xxhash64(concat_ws(",",
        (b * cfg.rowsPerBand until (b + 1) * cfg.rowsPerBand)
          .map(i => col(s"h$i").cast("string")): _*))
    }
    sig.select(col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band", "band_sig")))
  }

  /** Candidate pairs: documents sharing any band bucket. */
  def candidates(bands: DataFrame): DataFrame = {
    val a = bands.select(col("band"), col("band_sig"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("band_sig"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Full pipeline with exact-Jaccard verification of the candidates
    * (verification joins only the candidate set — the expensive all-pairs
    * comparison never happens).
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    // no cache(): the shingle subplan ends in a distinct shuffle, and the
    // four consumers share it via ReuseExchange. A cache() here leaked
    // across queries and measurably degraded later jobs in the session;
    // an eager localCheckpoint ran the pipeline at construction time.
    val sh = shingles(df, idCol, textCol, cfg.shingleSize)
    val cand = candidates(bandSignatures(minhashSignatures(sh, cfg), cfg))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= cfg.threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }
}

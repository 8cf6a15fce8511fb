package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Materialize._

/** MinHash + banded LSH near-duplicate detection — the scale path for
  * Jaccard dedup. shingle → minhash signature → band buckets → candidate
  * pairs → exact-Jaccard verification. Compared with [[Dedup.jaccardPairs]]
  * (O(n²)), candidate generation here is O(n·bands) shuffle rows: only
  * documents sharing a band bucket are ever compared, which is what makes
  * 100 TB feasible.
  *
  * Signatures use the classic (a·h + b) mod p permutation family over
  * sha256-derived base hashes — fully deterministic AND reproducible by any
  * other engine (the DuckDB oracle recomputes identical signatures from the
  * same constants); band bucketing stays on fast engine-internal xxhash64,
  * which only needs equality semantics, not cross-engine equality.
  */
object MinHashLSH {

  /** Modulus of the permutation family: 2^31−1 (prime). Base hashes and
    * constants stay below it, so a·h+b < 2^62 — no int64 overflow under
    * ANSI mode in either engine.
    */
  val Mod: Long = 2147483647L

  /** Deterministic permutation constants (a_i, b_i), a ≠ 0. The SAME values
    * are interpolated into the DuckDB oracle SQL, so the two engines can
    * never drift apart silently.
    */
  def perms(n: Int): IndexedSeq[(Long, Long)] = {
    val rnd = new java.util.Random(20260812L)
    IndexedSeq.fill(n)(
      (1L + rnd.nextInt((Mod - 1).toInt), rnd.nextInt(Mod.toInt).toLong))
  }

  /** `maxBucketSize`: optional skew guard for candidate generation — a
    * band bucket shared by B documents contributes O(B²) candidate pairs,
    * and at corpus scale a degenerate bucket (boilerplate-heavy shingle
    * sets) can dominate the self-join. Buckets above the cap are dropped
    * from candidate generation only; such buckets carry little signal (the
    * documents agree on a whole band of min-hashes with thousands of
    * others), and every surviving candidate is still exact-verified, so
    * precision is unaffected — the cap trades bounded recall loss on
    * boilerplate clusters for a bounded join. None (default) = exact
    * LSH semantics, what the oracle-gated query runs.
    */
  final case class Config(
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.8,
      maxBucketSize: Option[Int] = None) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  /** Distinct word-k-shingles per document: (id, shingle). Per-document
    * uniqueness comes from `array_distinct` BEFORE the explode — no
    * corpus-wide distinct shuffle is needed (an earlier version paid one).
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = split(Dedup.normalized(col("__text")), " ")
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(k))))
    // graftSpread: normalization + shingling + the downstream 64-slot
    // signature partial-agg fuse into the SCAN stage, and a one-file
    // fixture scan is one task — spread (id, text) first so the row-local
    // hot loop parallelizes; no-op whenever the input already arrives with
    // ≥ defaultParallelism splits (any production corpus).
    df.select(col(idCol).as("doc_id"), col(textCol).as("__text"))
      .graftSpread()
      .select(col("doc_id"), explode(array_distinct(grams)).as("shingle"))
  }

  /** Shingles reduced to their 60-bit sha-derived identity: (doc_id, __h).
    * Everything downstream — signatures, set sizes, intersection counts —
    * operates on the 8-byte hash instead of the multi-word shingle string,
    * which shrinks every shuffle; a cross-document sha60 collision
    * (~n²/2⁶¹) is the accepted identity approximation, applied identically
    * in the SQL oracle.
    */
  def hashedShingles(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    shingles(df, idCol, textCol, k)
      .select(col("doc_id"),
        graft.expressions.Hashing.sha60(col("shingle")).as("__h"))

  /** Per-document minhash signature over (doc_id, __h): H min-aggregate
    * columns (h0..hN), one per permutation (a_i·(h mod p) + b_i) mod p.
    * The H mins are computed as map-side partial aggregates — the shuffle
    * carries one row of H longs per document, NOT an exploded (doc, slot)
    * row per shingle×slot (the explode formulation shuffled 64× the
    * shingle count and ran ~3× slower). Each slot is three integer ops.
    */
  def minhashSignatures(hashed: DataFrame, cfg: Config): DataFrame = {
    val ps = perms(cfg.numHashes)
    def slot(i: Int): Column =
      min(((col("__h") % Mod) * ps(i)._1 + ps(i)._2) % Mod).as(s"h$i")
    hashed.groupBy("doc_id")
      .agg(slot(0), (1 until cfg.numHashes).map(slot): _*)
  }

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

  /** Candidate pairs: documents sharing any band bucket (buckets above
    * `maxBucketSize` excluded when set — see [[Config]]).
    */
  def candidates(bands: DataFrame,
      maxBucketSize: Option[Int] = None): DataFrame = {
    val pruned = maxBucketSize match {
      case Some(cap) =>
        val sizes = bands.groupBy("band", "band_sig")
          .agg(count(lit(1)).as("__bn"))
          .filter(col("__bn") <= cap)
          .drop("__bn")
        bands.join(sizes, Seq("band", "band_sig"))
      case None => bands
    }
    val a = pruned.select(col("band"), col("band_sig"), col("doc_id").as("doc_a"))
    val b = pruned.select(col("band"), col("band_sig"), col("doc_id").as("doc_b"))
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
    // localCheckpoint, NOT ReuseExchange: the shingle table feeds four
    // consumers (signatures, sizes, both verification sides), but column
    // pruning pushes a different projection below each Exchange, so the
    // canonical plans differ and nothing is reused — the formatted plan
    // showed SIX full scan→shingle recomputations (~9 s at sf0.1; ~2.5 s
    // with the two checkpoints). cache() is still avoided: it leaked
    // across queries in a shared session.
    val sh = hashedShingles(df, idCol, textCol, cfg.shingleSize).graftCheckpoint()
    // tiny (one row of H longs per doc) but self-joined via the band table
    // on both candidate sides — checkpoint kills the duplicate 64-slot agg
    val sig = minhashSignatures(sh, cfg).graftCheckpoint()
    val cand = candidates(bandSignatures(sig, cfg), cfg.maxBucketSize)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("__h")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("__h")), Seq("doc_b", "__h"))
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

  /** DuckDB SQL computing exactly [[nearDuplicates]] over `table` — same
    * shingles, same sha60 base hash (set identity AND permutation input,
    * mirroring [[hashedShingles]]), same permutation constants (a_i, b_i)
    * interpolated from [[perms]], same band grouping, same exact-Jaccard
    * verification over the hashes. Band keys compare as the raw slot-value
    * string where the Spark side compares their xxhash64 — identical
    * equality semantics (a cross-doc 64-bit collision would additionally
    * need Jaccard ≥ threshold to survive verification).
    */
  def oracleSql(cfg: Config, table: String = "documents",
      idCol: String = "doc_id", textCol: String = "text"): String = {
    val values = perms(cfg.numHashes).zipWithIndex
      .map { case ((a, b), i) => s"($i,$a,$b)" }.mkString(", ")
    val k = cfg.shingleSize
    s"""WITH perms(i, a, b) AS (VALUES $values),
       |d AS (SELECT $idCol AS doc_id,
       |  regexp_split_to_array(lower(trim(regexp_replace($textCol, '\\s+', ' ', 'g'))), ' ') AS toks
       |  FROM $table),
       |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(toks) - ${k - 1}, 1) + 1),
       |    i -> array_to_string(toks[i:i+${k - 1}], ' ')))) AS shingle FROM d),
       |hs AS (SELECT doc_id,
       |  ${graft.expressions.Hashing.sha60Sql("shingle")} AS h FROM sh),
       |sig AS (SELECT doc_id, i, min((a * (h % $Mod) + b) % $Mod) AS m
       |  FROM hs CROSS JOIN perms GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, i // ${cfg.rowsPerBand} AS band,
       |  string_agg(m::VARCHAR, ',' ORDER BY i) AS bkey
       |  FROM sig GROUP BY doc_id, i // ${cfg.rowsPerBand}),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y
       |  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY doc_id),
       |inter AS (SELECT doc_a, doc_b, count(*) AS ninter FROM cand
       |  JOIN hs sa ON sa.doc_id = cand.doc_a
       |  JOIN hs sb ON sb.doc_id = cand.doc_b AND sb.h = sa.h
       |  GROUP BY doc_a, doc_b)
       |SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM (
       |  SELECT i.doc_a, i.doc_b, i.ninter::DOUBLE / (na.n + nb.n - i.ninter) AS jac
       |  FROM inter i JOIN sizes na ON na.doc_id = i.doc_a
       |  JOIN sizes nb ON nb.doc_id = i.doc_b)
       |WHERE jac >= ${cfg.threshold}""".stripMargin
  }
}

package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.tables.Warehouse
import graft.Materialize._

/** Incremental corpus-vs-batch near-dup detection — the daily shape of
  * dedup at 100 TB. Every [[MinHashLSH]] query self-joins the full corpus;
  * a production pipeline instead maintains a PERSISTENT signature index in
  * the warehouse and joins each day's batch against it:
  *
  *   1. signature the batch (minhash over hashed shingles),
  *   2. append the batch's signatures + band keys to the index
  *      (`appendIfAbsent` — idempotent under at-least-once re-runs),
  *   3. equi-join the batch's band keys against the indexed band keys
  *      → candidate pairs, verified by signature-slot agreement,
  *   4. emit every near-dup pair with at least one side in the batch.
  *
  * Per-batch cost is O(batch + matched index rows), never O(corpus²) and
  * never a corpus re-signature: the index tables only ever APPEND (the
  * warehouse manifest keeps that O(batch) too). This is the reference's
  * own high-watermark incremental pattern (billwerk_invoices.py:49-99 —
  * cursor-checkpointed ingest) applied to dedup state.
  *
  * Verification uses SIGNATURE-ESTIMATED Jaccard (fraction of agreeing
  * minhash slots, an unbiased estimator of true Jaccard): storing shingle
  * sets for exact verification would cost as much as the corpus itself,
  * while signatures are a fixed numHashes longs per document. Agreement
  * counts are integers over a fixed hash family, so estimates are exact
  * multiples of 1/numHashes — deterministic and reproducible by the DuckDB
  * oracle from the shared permutation constants.
  *
  * Pairs are canonicalized (doc_a = least id, doc_b = greatest) and
  * distinct, so RE-RUNNING a batch emits exactly the same pair set: the
  * batch's own signatures are already in the index, `appendIfAbsent`
  * no-ops, and the band join reproduces the same candidates. Idempotence
  * is spec-proven (IncrementalSpec).
  */
object IncrementalDedup {
  import MinHashLSH.{Config, bandSignatures, hashedShingles, minhashSignatures}

  private def sigTable(name: String) = s"${name}_sig"
  private def bandTable(name: String) = s"${name}_bands"

  /** Signature + band rows for a batch of documents. */
  private def signatureAndBands(batch: DataFrame, idCol: String,
      textCol: String, cfg: Config): (DataFrame, DataFrame) = {
    // localCheckpoint: the signature table feeds both the band explode and
    // the warehouse append — without it the 64-slot aggregation runs twice
    val sigs = minhashSignatures(
      hashedShingles(batch, idCol, textCol, cfg.shingleSize), cfg)
      .graftCheckpoint()
    (sigs, bandSignatures(sigs, cfg))
  }

  /** Seed (or extend) the index without emitting pairs — the bulk-load
    * path for the pre-existing corpus. Idempotent on doc_id.
    */
  def seedIndex(wh: Warehouse, name: String, docs: DataFrame, idCol: String,
      textCol: String, cfg: Config = Config()): Unit = {
    val (sigs, bands) = signatureAndBands(docs, idCol, textCol, cfg)
    wh.appendIfAbsent(sigTable(name), sigs, Seq("doc_id"))
    wh.appendIfAbsent(bandTable(name), bands, Seq("doc_id", "band"))
  }

  /** Process one batch: extend the index, return every near-dup pair with
    * at least one side in the batch — (doc_a, doc_b, est_jaccard), doc_a <
    * doc_b. Within-batch near-dups are included (the batch is part of the
    * index by the time the join runs), which is also what makes a re-run
    * emit the identical set.
    *
    * Scale shape: batch bands equi-join the indexed bands on
    * (band, band_sig) — one shuffle sized by the batch plus the matching
    * index rows; candidate verification joins only candidate ids against
    * the signature table. At 1000-executor scale the band table would be
    * bucketed on band_sig at write time to make the daily probe
    * shuffle-free on the index side; the manifest-append warehouse keeps
    * the index build O(batch) either way.
    *
    * Warehouse IO: ONE read per index table (r9 verdict — the previous
    * shape paid four: appendIfAbsent's internal anti-join read plus a
    * post-append re-read, per table). The pre-append snapshot is read
    * once, the anti-joined new rows are appended, and the probe/verify
    * relations are the in-memory union snapshot ∪ new — identical to a
    * re-read by construction (append is the only writer here).
    */
  def processBatch(wh: Warehouse, name: String, batch: DataFrame,
      idCol: String, textCol: String, cfg: Config = Config()): DataFrame = {
    val (sigs, bands) = signatureAndBands(batch, idCol, textCol, cfg)
    val sig = appendOnce(wh, sigTable(name), sigs, Seq("doc_id"))
    val idxBands = appendOnce(wh, bandTable(name), bands,
      Seq("doc_id", "band"))
    val batchBands = bands
      .select(col("band"), col("band_sig"), col("doc_id").as("batch_doc"))
    emitPairs(idxBands, batchBands, sig, cfg)
  }

  /** appendIfAbsent with a single table read, returning the post-append
    * relation (snapshot ∪ appended) without re-reading it — now the
    * generic [[Warehouse.appendIfAbsentReturning]] (the same pattern the
    * paragraph and semantic incremental indexes use).
    */
  private def appendOnce(wh: Warehouse, table: String, batch: DataFrame,
      keys: Seq[String]): DataFrame =
    wh.appendIfAbsentReturning(table, batch, keys)

  private def emitPairs(idxBands: DataFrame, batchBands: DataFrame,
      sig: DataFrame, cfg: Config): DataFrame = {
    val cand = idxBands.join(batchBands, Seq("band", "band_sig"))
      .filter(col("doc_id") =!= col("batch_doc"))
      .select(least(col("doc_id"), col("batch_doc")).as("doc_a"),
        greatest(col("doc_id"), col("batch_doc")).as("doc_b"))
      .distinct()
    val agree = (0 until cfg.numHashes)
      .map(i => when(col(s"a.h$i") === col(s"b.h$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sig.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sig.as("b"), col("doc_b") === col("b.doc_id"))
      .withColumn("est_jaccard", agree.cast("double") / cfg.numHashes)
      .filter(col("est_jaccard") >= cfg.threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** Fused first-day path: seed the corpus AND process the first batch in
    * one signature job and ONE warehouse write per index table (vs
    * seedIndex + processBatch = two signature jobs and four writes). The
    * tagged union signs corpus+batch in a single pass; the probe then
    * runs entirely against the just-computed relations — day one has no
    * pre-existing index to read. Idempotent like the daily path
    * (appendIfAbsent keys on doc_id). PRECONDITION: corpus and batch ids
    * are disjoint (they are different days of the same feed).
    */
  def bootstrap(wh: Warehouse, name: String, corpus: DataFrame,
      batch: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val tagged = corpus.select(col(idCol), col(textCol), lit(0).as("__b"))
      .unionByName(batch.select(col(idCol), col(textCol), lit(1).as("__b")))
    val sigs = minhashSignatures(
      hashedShingles(tagged, idCol, textCol, cfg.shingleSize), cfg)
      .join(tagged.select(col(idCol).as("doc_id"), col("__b")), Seq("doc_id"))
      .graftCheckpoint()
    val bands = bandSignatures(sigs.drop("__b"), cfg)
    wh.appendIfAbsent(sigTable(name), sigs.drop("__b"), Seq("doc_id"))
    wh.appendIfAbsent(bandTable(name), bands, Seq("doc_id", "band"))
    val batchIds = sigs.filter(col("__b") === 1).select("doc_id")
    val batchBands = bands
      .join(batchIds, Seq("doc_id"), "left_semi")
      .select(col("band"), col("band_sig"), col("doc_id").as("batch_doc"))
    emitPairs(bands, batchBands, sigs.drop("__b"), cfg)
  }

  /** DuckDB SQL reproducing [[processBatch]]'s output for a corpus seeded
    * with `NOT (batchPred)` rows and a batch of `batchPred` rows — same
    * permutation constants, same band grouping, same slot-agreement
    * estimate. Band keys compare as raw slot-value strings where Spark
    * compares their xxhash64 — identical equality semantics.
    */
  def oracleSql(cfg: Config, batchPred: String,
      table: String = "documents", idCol: String = "doc_id",
      textCol: String = "text"): String = {
    val values = MinHashLSH.perms(cfg.numHashes).zipWithIndex
      .map { case ((a, b), i) => s"($i,$a,$b)" }.mkString(", ")
    val k = cfg.shingleSize
    val M = MinHashLSH.Mod
    s"""WITH perms(i, a, b) AS (VALUES $values),
       |d AS (SELECT $idCol AS doc_id,
       |  regexp_split_to_array(lower(trim(regexp_replace($textCol, '\\s+', ' ', 'g'))), ' ') AS toks
       |  FROM $table),
       |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(toks) - ${k - 1}, 1) + 1),
       |    i -> array_to_string(toks[i:i+${k - 1}], ' ')))) AS shingle FROM d),
       |hs AS (SELECT doc_id,
       |  ${graft.expressions.Hashing.sha60Sql("shingle")} AS h FROM sh),
       |sig AS (SELECT doc_id, i, min((a * (h % $M) + b) % $M) AS m
       |  FROM hs CROSS JOIN perms GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, i // ${cfg.rowsPerBand} AS band,
       |  string_agg(m::VARCHAR, ',' ORDER BY i) AS bkey
       |  FROM sig GROUP BY doc_id, i // ${cfg.rowsPerBand}),
       |cand AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
       |    greatest(x.doc_id, y.doc_id) AS doc_b
       |  FROM bands x JOIN bands y
       |  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id <> y.doc_id
       |  WHERE y.doc_id $batchPred),
       |est AS (SELECT c.doc_a, c.doc_b,
       |    sum(CASE WHEN sa.m = sb.m THEN 1 ELSE 0 END)::DOUBLE
       |      / ${cfg.numHashes} AS e
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.doc_a
       |  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
       |  GROUP BY c.doc_a, c.doc_b)
       |SELECT doc_a, doc_b, round(e, 4) AS est_jaccard
       |FROM est WHERE e >= ${cfg.threshold}""".stripMargin
  }
}

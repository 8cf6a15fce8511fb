package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Materialize._
import graft.dedup.ParagraphDedup
import graft.sim.SemDedup
import graft.state.Cursor
import graft.tables.Warehouse

/** The daily CURATION pipeline — the composition the incremental dedup
  * operators exist for (r18 verdict #6): cursor → batch → paragraph-incr
  * → (semantic-incr) → reassemble → idempotent warehouse append → cursor
  * advance. Each piece is an already-gated operator; this class proves
  * they compose under the reference's own incremental contract
  * (billwerk_invoices.py:14,86-99 — read watermark, process only rows
  * above it, sink idempotently, advance the watermark only after the
  * sink commit).
  *
  * Shape per day at 100 TB: the cursor filter prunes the scan to the
  * day's arrivals (parquet min/max on the id column); paragraph verdicts
  * cost O(batch paragraphs + matched index rows); the optional semantic
  * stage costs |batch|·√n_corpus assignment dots + ≤ |batch|·cap
  * pairwise; reassembly is one (doc, idx) equi-join + a row-local fold
  * over the batch only. Nothing rescans the corpus.
  *
  * Crash safety: a crash between the clean-table append and the cursor
  * advance re-processes the batch on the next run — safe because every
  * write is idempotent by key (the paragraph index appends only absent
  * digests, the semantic reps append only absent ids, the clean table
  * appends only absent documents), the reference's at-least-once →
  * exactly-once pattern. A re-run after a SUCCESSFUL day is a no-op: the
  * cursor filter yields an empty batch (PipelineSpec asserts both).
  *
  * Output table `<name>_clean`: (idCol, n_kept, clean_len, clean_hash)
  * per processed document — [[ParagraphDedup.reassemble]]'s scalar
  * surface. With a semantic stage configured, documents whose vector is
  * a semantic duplicate of an earlier-id document are dropped from the
  * clean table entirely (the SemDeDup curation policy); their paragraph
  * owners still enter the index, keeping verdicts monotone.
  */
final class Curation(
    spark: SparkSession,
    wh: Warehouse,
    cursor: Cursor,
    name: String,
    idCol: String,
    textCol: String,
    sepRegex: String = "\n\n",
    joinSep: String = "\n\n",
    vecCol: Option[String] = None,
    semThreshold: Double = 0.3,
    semCap: Int = 16) {

  private val cleanTable = s"${name}_clean"

  /** Seed the persistent indexes from the initial corpus and set the
    * cursor to the corpus high watermark. Returns that watermark.
    */
  def bootstrap(corpus: DataFrame): Long = {
    val c = corpus.graftCheckpoint()
    ParagraphDedup.seedIndex(wh, name, c, idCol, textCol, sepRegex)
    vecCol.foreach(vc => SemDedup.seedIndex(wh, name, c, idCol, vc, semCap))
    val hi = c.agg(max(col(idCol))).first()
    require(!hi.isNullAt(0), "curation bootstrap needs a non-empty corpus")
    val w = hi.getLong(0)
    cursor.advance(w)
    w
  }

  /** One daily run over `source` (the full table as of today — the
    * cursor filter carves the day's batch). Returns the number of batch
    * documents processed (0 = nothing new, nothing written).
    */
  def runDay(source: DataFrame): Long = {
    val batch = source.filter(col(idCol) > cursor.value()).graftCheckpoint()
    val n = batch.count()
    if (n == 0) return 0L
    val verdicts = ParagraphDedup.processBatch(
      wh, name, batch, idCol, textCol, sepRegex)
    val clean = ParagraphDedup.reassembleWith(
      batch, verdicts, idCol, textCol, sepRegex, joinSep)
    val curated = vecCol match {
      case Some(vc) =>
        val semKeep = SemDedup.processBatch(
            wh, name, batch.select(col(idCol), col(vc)), idCol, vc,
            semThreshold, semCap)
          .filter(col("keep")).select(col(idCol))
        clean.join(semKeep, Seq(idCol), "left_semi")
      case None => clean
    }
    wh.appendIfAbsent(cleanTable, curated, Seq(idCol))
    cursor.advance(batch.agg(max(col(idCol))).first().getLong(0))
    n
  }

  /** The curated corpus so far. */
  def clean: DataFrame = wh.read(cleanTable)
}

object Curation {

  /** DuckDB SQL replaying the DOC-side pipeline end-to-end for the gated
    * query: bootstrap(id ≤ ⌊max·3/5⌋) → day 1 (id ≤ ⌊max·4/5⌋) → day 2
    * (rest), clean table = per-document reassembly of the epoch-ranked
    * paragraph verdicts (ownership is permanent, so the two sequenced
    * days replay as one epoch-major rank — the
    * [[ParagraphDedup.incrOracleSqlEpochs]] argument). Watermarks are
    * computed IN-QUERY with integer arithmetic both engines reproduce
    * exactly, so one SQL string gates every scale factor.
    */
  def oracleSql(sepRegex: String, joinSep: String,
      table: String = "documents", idCol: String = "doc_id",
      textCol: String = "text"): String = {
    val sep = ParagraphDedup.sqlStringLit(sepRegex)
    val js = ParagraphDedup.sqlStringLit(joinSep)
    s"""WITH b AS (SELECT max($idCol) * 3 // 5 AS w0, max($idCol) * 4 // 5 AS w1
       |  FROM $table),
       |d AS (SELECT $idCol AS doc,
       |    regexp_split_to_array($textCol, $sep) AS ps FROM $table),
       |t0 AS (SELECT doc, ps, unnest(range(1, len(ps) + 1)) AS pos1 FROM d),
       |t1 AS (SELECT doc, CAST(pos1 - 1 AS INT) AS para_idx, ps[pos1] AS p,
       |    lower(trim(regexp_replace(ps[pos1], '\\s+', ' ', 'g'))) AS np
       |  FROM t0),
       |t2 AS (SELECT doc, para_idx, p, np,
       |    CASE WHEN doc <= (SELECT w0 FROM b) THEN 0
       |         WHEN doc <= (SELECT w1 FROM b) THEN 1 ELSE 2 END AS ep
       |  FROM t1 WHERE len(np) > 0),
       |k AS (SELECT doc, para_idx, p, row_number() OVER (PARTITION BY np
       |    ORDER BY ep, doc, para_idx) AS rn
       |  FROM t2),
       |agg AS (SELECT doc, count(*) AS n_kept,
       |    string_agg(p, $js ORDER BY para_idx) AS ct
       |  FROM k WHERE rn = 1 GROUP BY doc)
       |SELECT d.doc AS $idCol,
       |  CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
       |  CAST(length(coalesce(agg.ct, '')) AS INT) AS clean_len,
       |  sha256(coalesce(agg.ct, '')) AS clean_hash
       |FROM d LEFT JOIN agg ON agg.doc = d.doc
       |WHERE d.doc > (SELECT w0 FROM b)""".stripMargin
  }
}

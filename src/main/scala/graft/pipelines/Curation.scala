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
  *
  * Semantic-index LIFECYCLE (r19 verdict #1 — the pipeline owns its
  * index's whole life, not just the happy path):
  *   - bootstrap ROUTES by corpus size: above `semCoarseSeedAbove` rows
  *     the seed pass runs [[SemDedup.seedIndexCoarse]] (two-level
  *     n·2√k assignment — the fourth-decade shape; the flat n·k seed
  *     measured DNF-ing at 75 min on 2M vectors, SCALECHECK_sf100)
  *     instead of [[SemDedup.seedIndex]]. Daily batches are unaffected
  *     — [[SemDedup.processBatch]] runs the identical flat argmax
  *     against the same frozen centroids either way.
  *   - `semCompactEvery` = N > 0 runs [[SemDedup.compactIndex]] after
  *     every Nth successful day, bounding the per-batch reps read back
  *     to cap·cells (verdict-invariant by the cap algebra; the day
  *     counter persists next to the cursor, and a crash between cursor
  *     and counter advance at worst delays one compaction by a day —
  *     cadence drift, never correctness).
  *   - [[reseedSemanticIndex]] is the drift cutover: when measured
  *     frozen-centroid recall loss (tools.SemProbe --drift) crosses the
  *     operator's tolerance, re-bootstrap from the full current corpus
  *     and re-verdict the catalog from the returned cut.
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
    semCap: Int = 16,
    semCoarseSeedAbove: Long = 1000000L,
    semCompactEvery: Int = 0) {

  private val cleanTable = s"${name}_clean"

  /** Successful-day counter for the compaction cadence — same tiny
    * atomic-rename file mechanism as the watermark cursor, co-located
    * with the tables it governs.
    */
  private val dayCounter =
    new Cursor(spark, s"${wh.rootPath}/${name}_days.cursor")

  /** The id column must be integral: the cursor watermark is a Long, and
    * a non-integral id would otherwise fail with a bare ClassCastException
    * deep inside the pipeline (r19 advice #2) instead of a contract error.
    */
  private def requireIntegralId(df: DataFrame): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"curation id column '$idCol' must be an integral type (found $dt): " +
        "the high-watermark cursor orders and stores ids as Long")
  }

  /** Seed the persistent indexes from the initial corpus and set the
    * cursor to the corpus high watermark. Returns that watermark.
    * Corpora larger than `semCoarseSeedAbove` rows seed the semantic
    * index through the two-level coarse assignment (see class doc).
    */
  def bootstrap(corpus: DataFrame): Long = {
    requireIntegralId(corpus)
    val c = corpus.graftCheckpoint()
    ParagraphDedup.seedIndex(wh, name, c, idCol, textCol, sepRegex)
    val agg0 = c.agg(max(col(idCol)), count(lit(1))).first()
    require(!agg0.isNullAt(0), "curation bootstrap needs a non-empty corpus")
    vecCol.foreach { vc =>
      val vecs = c.select(col(idCol), col(vc))
      if (agg0.getLong(1) > semCoarseSeedAbove)
        SemDedup.seedIndexCoarse(wh, name, vecs, idCol, vc, semCap)
      else SemDedup.seedIndex(wh, name, vecs, idCol, vc, semCap)
    }
    val w = agg0.getAs[Number](0).longValue
    cursor.advance(w)
    w
  }

  /** One daily run over `source` (the full table as of today — the
    * cursor filter carves the day's batch). Returns the number of batch
    * documents processed (0 = nothing new, nothing written).
    */
  def runDay(source: DataFrame): Long = {
    requireIntegralId(source)
    val batch = source.filter(col(idCol) > cursor.value()).graftCheckpoint()
    // ONE action for batch count AND high watermark (r21; was a count()
    // here plus a separate max() after the append — the value of an
    // already-checkpointed batch cannot change between them)
    val agg0 = batch.agg(count(lit(1)), max(col(idCol))).first()
    val n = agg0.getLong(0)
    if (n == 0) return 0L
    val watermark = agg0.getAs[Number](1).longValue
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
    cursor.advance(watermark)
    val day = dayCounter.value(0L) + 1
    dayCounter.advance(day)
    if (semCompactEvery > 0 && vecCol.isDefined &&
        day % semCompactEvery == 0)
      SemDedup.compactIndex(wh, name, semCap)
    n
  }

  /** Compact the semantic reps index back to the exact cap·cells cut —
    * verdict-invariant ([[SemDedup.compactIndex]]'s cap algebra); the
    * manual form of the `semCompactEvery` cadence for operators who
    * schedule maintenance externally.
    */
  def compactSemanticIndex(): Unit = {
    require(vecCol.isDefined, "no semantic stage configured")
    SemDedup.compactIndex(wh, name, semCap)
  }

  /** Drift cutover: re-bootstrap the semantic index from the full
    * CURRENT corpus (fresh ⌈√n_now⌉ centroids) and return the
    * full-corpus verdict cut so the caller can re-verdict its catalog in
    * the same job — [[SemDedup.reseedIndex]] wired to this pipeline's
    * threshold/cap. Subsequent [[runDay]] batches verdict against the
    * fresh index. Run on a measured-drift cadence (tools.SemProbe
    * --drift quantifies the frozen-vs-fresh trade), not daily.
    */
  def reseedSemanticIndex(corpus: DataFrame): DataFrame = {
    require(vecCol.isDefined, "no semantic stage configured")
    requireIntegralId(corpus)
    SemDedup.reseedIndex(wh, name,
      corpus.select(col(idCol), col(vecCol.get)), idCol, vecCol.get,
      semThreshold, semCap)
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

  /** DuckDB SQL replaying the FULL doc+vector pipeline (r19 verdict #3 —
    * the semantic drop policy is the curation pipeline's point, and it
    * was previously spec-only): same bootstrap/day-1/day-2 watermarks as
    * [[oracleSql]], with each document carrying the embedding of dense
    * vector key `doc_id % count(embeddings)` (dense = row_number over
    * vec_id, a bijection onto [0, n) at every scale factor — raw scaled
    * vec_ids are replica-strided and would cover only replica 0). The
    * clean table then excludes every batch document the sequenced
    * semantic stage dropped: the paragraph side replays as the usual
    * epoch-major rank (ownership is permanent — [[ParagraphDedup
    * .incrOracleSqlEpochs]]), the semantic side as one flat argmax
    * assignment plus a per-epoch cap-lowest candidate cut
    * ([[graft.sim.SemDedup.incrOracleSqlEpochs]]'s cap algebra, with the
    * documents' own ids as the vector ids). Paragraph owners of dropped
    * documents still enter the rank — exactly [[Curation.runDay]], which
    * verdicts and indexes the whole batch before the semantic left-semi.
    */
  def oracleSqlSem(sepRegex: String, joinSep: String, threshold: Double,
      cap: Int, docTable: String = "documents",
      embTable: String = "embeddings", idCol: String = "doc_id",
      textCol: String = "text", vecIdCol: String = "vec_id",
      vecCol: String = "embedding"): String = {
    val sep = ParagraphDedup.sqlStringLit(sepRegex)
    val js = ParagraphDedup.sqlStringLit(joinSep)
    def candDrops(ep: Int): String =
      s"""cand$ep AS (SELECT doc, v, centroid_id FROM (
         |    SELECT doc, v, centroid_id,
         |      row_number() OVER (PARTITION BY centroid_id ORDER BY doc) AS cr
         |    FROM asn WHERE ep <= $ep) WHERE cr <= $cap),
         |drops$ep AS (SELECT DISTINCT a.doc FROM asn a JOIN cand$ep c
         |  ON a.centroid_id = c.centroid_id AND c.doc < a.doc
         |  WHERE a.ep = $ep AND list_dot_product(a.v, c.v)
         |      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))
         |    >= $threshold)""".stripMargin
    s"""WITH b AS (SELECT max($idCol) * 3 // 5 AS w0, max($idCol) * 4 // 5 AS w1
       |  FROM $docTable),
       |nv AS (SELECT count(*) AS n FROM $embTable),
       |ek AS (SELECT $vecCol::DOUBLE[] AS v,
       |    row_number() OVER (ORDER BY $vecIdCol) - 1 AS vk FROM $embTable),
       |src AS (SELECT d0.$idCol AS doc, d0.$textCol AS txt, ek.v,
       |    CASE WHEN d0.$idCol <= (SELECT w0 FROM b) THEN 0
       |         WHEN d0.$idCol <= (SELECT w1 FROM b) THEN 1 ELSE 2 END AS ep
       |  FROM $docTable d0 JOIN ek ON ek.vk = d0.$idCol % (SELECT n FROM nv)),
       |cent AS (SELECT CAST(row_number() OVER (ORDER BY doc) - 1 AS INT) AS centroid_id,
       |    v AS cvec
       |  FROM (SELECT doc, v, row_number() OVER (ORDER BY doc) AS rn
       |    FROM src WHERE ep = 0)
       |  WHERE rn <= (SELECT CAST(ceil(sqrt(count(*))) AS INT)
       |    FROM src WHERE ep = 0)),
       |bd AS (SELECT s.doc, max(list_dot_product(s.v, t.cvec)) AS bd
       |  FROM src s CROSS JOIN cent t GROUP BY s.doc),
       |asn AS (SELECT s.doc, s.v, s.ep, a.centroid_id FROM src s JOIN (
       |    SELECT s2.doc, min(t.centroid_id) AS centroid_id
       |    FROM src s2 CROSS JOIN cent t JOIN bd ON bd.doc = s2.doc
       |    WHERE list_dot_product(s2.v, t.cvec) = bd.bd
       |    GROUP BY s2.doc) a ON a.doc = s.doc),
       |${candDrops(1)},
       |${candDrops(2)},
       |dropped AS (SELECT doc FROM drops1 UNION SELECT doc FROM drops2),
       |d AS (SELECT doc, regexp_split_to_array(txt, $sep) AS ps, ep FROM src),
       |t0 AS (SELECT doc, ps, ep, unnest(range(1, len(ps) + 1)) AS pos1 FROM d),
       |t1 AS (SELECT doc, ep, CAST(pos1 - 1 AS INT) AS para_idx, ps[pos1] AS p,
       |    lower(trim(regexp_replace(ps[pos1], '\\s+', ' ', 'g'))) AS np
       |  FROM t0),
       |t2 AS (SELECT doc, ep, para_idx, p, np FROM t1 WHERE len(np) > 0),
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
       |WHERE d.doc > (SELECT w0 FROM b)
       |  AND d.doc NOT IN (SELECT doc FROM dropped)""".stripMargin
  }
}

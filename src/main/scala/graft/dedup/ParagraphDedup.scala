package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tables.Warehouse

/** Exact PARAGRAPH dedup across documents — the C4/Gopher curation step
  * that document-level exact dedup misses: boilerplate paragraphs (cookie
  * banners, license headers, navigation text) repeat across millions of
  * otherwise-distinct pages, and the standard pipeline drops every
  * occurrence after the first.
  *
  * Shape: split each document on `sepRegex` (default blank line),
  * normalize each paragraph ([[Dedup.normalized]] — the corpus-wide
  * comparison contract), drop whitespace-only paragraphs, then
  * hash-canonical min-key keep: the occurrence with the LOWEST
  * (docId, paraIdx) of each normalized paragraph survives — the same
  * deterministic rule as [[Dedup.exact]], order-independent under
  * retries. One shuffle on the 256-bit digest (shuffle rows carry the
  * hash, never the paragraph text) + one join back, both corpus-linear;
  * reassembly (concatenating kept paragraphs back into documents) is a
  * row-local sort_array over collected (paraIdx, text) pairs the caller
  * applies when needed.
  */
object ParagraphDedup {

  /** `sepRegex` is evaluated by TWO regex dialects — Java regex in
    * Spark's `split`, RE2 in DuckDB's `regexp_split_to_array` — so it
    * must stay within their shared subset (no lookbehind, no
    * backreferences, no possessive quantifiers: Java-only constructs
    * would make the operator and its oracle silently diverge). Literal
    * separators and simple classes/quantifiers are safe.
    */
  private[graft] def sqlStringLit(s: String): String =
    "'" + s.replace("'", "''") + "'"

  /** One row per non-empty paragraph: (idCol, para_idx, __h) — the
    * digest relation both the full-corpus and incremental paths consume.
    * para_idx is the 0-based position in the ORIGINAL split (empty
    * paragraphs still consume an index, so indices address the raw
    * document).
    */
  private def paragraphs(df: DataFrame, idCol: String, textCol: String,
      sepRegex: String): DataFrame =
    df.select(col(idCol),
        posexplode(split(col(textCol), sepRegex)).as(Seq("para_idx", "__p")))
      .withColumn("__np", Dedup.normalized(col("__p")))
      .filter(length(col("__np")) > 0)
      .select(col(idCol), col("para_idx"), sha2(col("__np"), 256).as("__h"))

  /** Lowest-(doc, idx) owner of every distinct paragraph digest:
    * (para_hash, owner_id, owner_idx).
    */
  private def owners(paras: DataFrame, idCol: String): DataFrame =
    paras.groupBy("__h")
      .agg(min(struct(col(idCol), col("para_idx"))).as("__f"))
      .select(col("__h").as("para_hash"),
        col("__f").getField(idCol).as("owner_id"),
        col("__f").getField("para_idx").as("owner_idx"))

  /** keep = this occurrence IS its digest's owner. */
  private def verdicts(paras: DataFrame, ownerRel: DataFrame,
      idCol: String): DataFrame =
    paras.join(ownerRel, col("__h") === col("para_hash"))
      .select(col(idCol), col("para_idx"),
        (col(idCol) === col("owner_id") &&
          col("para_idx") === col("owner_idx")).as("keep"))

  /** One row per non-empty paragraph: (idCol, para_idx, keep). */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
      sepRegex: String = "\n\n"): DataFrame = {
    val paras = paragraphs(df, idCol, textCol, sepRegex)
    verdicts(paras, owners(paras, idCol), idCol)
  }

  /** DuckDB SQL computing exactly [[paragraphDedup]] — same split, same
    * normalization, same lowest-(doc, idx)-wins rule (DuckDB ranks the
    * normalized text directly; Spark groups its sha256, a collision-free
    * relabeling of the same partition). The separator is quoted as a SQL
    * string literal; it must stay within the Java-regex ∩ RE2 subset
    * (see [[sqlStringLit]]).
    */
  def oracleSql(sepRegex: String = "\n\n", table: String = "documents",
      idCol: String = "doc_id", textCol: String = "text"): String =
    s"""WITH d AS (SELECT $idCol AS doc,
       |    regexp_split_to_array($textCol, ${sqlStringLit(sepRegex)}) AS ps FROM $table),
       |t0 AS (SELECT doc, ps, unnest(range(1, len(ps) + 1)) AS pos1 FROM d),
       |t1 AS (SELECT doc, CAST(pos1 - 1 AS INT) AS para_idx,
       |    lower(trim(regexp_replace(ps[pos1], '\\s+', ' ', 'g'))) AS np
       |  FROM t0),
       |t2 AS (SELECT doc, para_idx, np FROM t1 WHERE len(np) > 0),
       |k AS (SELECT doc, para_idx,
       |    row_number() OVER (PARTITION BY np ORDER BY doc, para_idx) AS rn
       |  FROM t2)
       |SELECT doc AS $idCol, para_idx, (rn = 1) AS keep FROM k""".stripMargin

  // ---- Reassembly ----------------------------------------------------

  /** Kept paragraphs reassembled into cleaned documents — the half of
    * the C4 pipeline that actually ships (r17 verdict #5): apply
    * [[paragraphDedup]]'s verdicts back to the RAW (pre-normalization)
    * paragraphs and concatenate the survivors in paragraph order with
    * `joinSep`. Corpus-linear: the digest shuffle inside paragraphDedup,
    * one (doc, idx) equi-join, one per-document aggregation whose
    * per-group state is the document's own kept paragraphs (row-local
    * sort_array fold — no window). Documents whose every paragraph was
    * dropped or whitespace-only emit n_kept = 0 and an empty clean text.
    * Output: (idCol, n_kept, clean_len, clean_hash) — hash + length
    * instead of the text so the gated result stays small and scalar.
    */
  def reassemble(df: DataFrame, idCol: String, textCol: String,
      sepRegex: String = "\n\n", joinSep: String = "\n\n"): DataFrame =
    reassembleWith(df, paragraphDedup(df, idCol, textCol, sepRegex),
      idCol, textCol, sepRegex, joinSep)

  /** [[reassemble]] against CALLER-SUPPLIED verdicts — the incremental
    * composition point (r18 verdict #6): a daily pipeline verdicts its
    * batch with [[processBatch]] (against the persistent index, not a
    * batch-local dedup) and reassembles the batch documents from those
    * verdicts. `verdicts` must be (idCol, para_idx, keep) rows covering
    * df's non-empty paragraphs — exactly what [[paragraphDedup]] and
    * [[processBatch]] emit. Same plan shape as the full-corpus form: one
    * (doc, idx) equi-join + a row-local sort_array fold, no window.
    */
  def reassembleWith(df: DataFrame, verdicts: DataFrame, idCol: String,
      textCol: String, sepRegex: String = "\n\n",
      joinSep: String = "\n\n"): DataFrame = {
    val kept = df
      .select(col(idCol),
        posexplode(split(col(textCol), sepRegex)).as(Seq("para_idx", "__p")))
      .join(verdicts.filter(col("keep")).drop("keep"),
        Seq(idCol, "para_idx"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("para_idx"), col("__p")))),
          s => s.getField("__p")), joinSep).as("__ct"))
    df.select(col(idCol)).join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        length(coalesce(col("__ct"), lit(""))).cast("int").as("clean_len"),
        sha2(coalesce(col("__ct"), lit("")), 256).as("clean_hash"))
  }

  /** DuckDB SQL computing exactly [[reassemble]]. */
  def reassembleOracleSql(sepRegex: String = "\n\n",
      joinSep: String = "\n\n", table: String = "documents",
      idCol: String = "doc_id", textCol: String = "text"): String =
    s"""WITH d AS (SELECT $idCol AS doc,
       |    regexp_split_to_array($textCol, ${sqlStringLit(sepRegex)}) AS ps FROM $table),
       |t0 AS (SELECT doc, ps, unnest(range(1, len(ps) + 1)) AS pos1 FROM d),
       |t1 AS (SELECT doc, CAST(pos1 - 1 AS INT) AS para_idx, ps[pos1] AS p,
       |    lower(trim(regexp_replace(ps[pos1], '\\s+', ' ', 'g'))) AS np
       |  FROM t0),
       |t2 AS (SELECT doc, para_idx, p, np FROM t1 WHERE len(np) > 0),
       |k AS (SELECT doc, para_idx, p,
       |    row_number() OVER (PARTITION BY np ORDER BY doc, para_idx) AS rn
       |  FROM t2),
       |agg AS (SELECT doc, count(*) AS n_kept,
       |    string_agg(p, ${sqlStringLit(joinSep)} ORDER BY para_idx) AS ct
       |  FROM k WHERE rn = 1 GROUP BY doc)
       |SELECT d.doc AS $idCol,
       |  CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
       |  CAST(length(coalesce(agg.ct, '')) AS INT) AS clean_len,
       |  sha256(coalesce(agg.ct, '')) AS clean_hash
       |FROM d LEFT JOIN agg ON agg.doc = d.doc""".stripMargin

  // ---- Incremental (persistent paragraph-digest index) ----------------

  /** Seed the PERSISTENT paragraph-digest index — the daily-pipeline
    * shape (r17 verdict #1): the warehouse table `<name>_paras` maps
    * every distinct normalized-paragraph digest to its lowest-(doc, idx)
    * owner. A daily batch then joins the index instead of re-splitting
    * the corpus — per-batch cost is O(batch paragraphs + matched index
    * rows), the reference's own high-watermark incremental pattern
    * (billwerk_invoices.py:49-99) applied to paragraph state. Idempotent
    * on para_hash.
    */
  def seedIndex(wh: Warehouse, name: String, docs: DataFrame,
      idCol: String, textCol: String, sepRegex: String = "\n\n"): Unit =
    wh.appendIfAbsent(s"${name}_paras",
      owners(paragraphs(docs, idCol, textCol, sepRegex), idCol),
      Seq("para_hash"))

  /** Process one batch: verdict every batch paragraph against the index
    * (digest already indexed → the indexed owner wins; new digest → the
    * batch's lowest-(doc, idx) occurrence wins and is APPENDED as owner).
    * Output: (idCol, para_idx, keep) for the batch's paragraphs.
    *
    * Idempotent under at-least-once redelivery: a re-run's owner rows
    * are already indexed (appendIfAbsent no-ops) and the verdicts are
    * recomputed against the identical post-append index, so the exact
    * same verdict set comes back (IncrementalSpec). The index only ever
    * appends ≤ |distinct new digests| rows per batch — a digest row,
    * never paragraph text, so index growth is bounded by distinct
    * content, not corpus size.
    */
  def processBatch(wh: Warehouse, name: String, batch: DataFrame,
      idCol: String, textCol: String,
      sepRegex: String = "\n\n"): DataFrame = {
    import graft.Materialize._
    val paras = paragraphs(batch, idCol, textCol, sepRegex).graftCheckpoint()
    val idx = wh.appendIfAbsentReturning(s"${name}_paras",
      owners(paras, idCol), Seq("para_hash"))
    verdicts(paras, idx, idCol)
  }

  /** DuckDB SQL computing exactly the SEQUENCED daily pipeline (r18
    * verdict #1): seedIndex(rows matching no predicate) then
    * processBatch(epochPreds(0)) then processBatch(epochPreds(1)) …, each
    * batch's verdicts gated under its 1-based epoch number. Because
    * paragraph ownership is PERMANENT once written (the index appends
    * owners and never displaces them), the whole sequence replays as ONE
    * rank with epoch-major ordering: a batch paragraph keeps iff no
    * earlier-epoch occurrence of its digest exists (corpus = epoch 0) and
    * it is its own epoch's lowest (doc, idx). Epoch ORDER is observable —
    * a digest appearing in both B1 and B2 is owned by B1's occurrence,
    * and swapping the epochs moves the ownership (the sensitivity spec) —
    * which is what makes this a composition gate.
    */
  def incrOracleSqlEpochs(epochPreds: Seq[String],
      sepRegex: String = "\n\n", table: String = "documents",
      idCol: String = "doc_id", textCol: String = "text"): String = {
    require(epochPreds.nonEmpty, "need at least one batch epoch")
    val epCase = "CASE " + epochPreds.zipWithIndex.map { case (p, i) =>
      s"WHEN doc $p THEN ${i + 1}" }.mkString(" ") + " ELSE 0 END"
    s"""WITH d AS (SELECT $idCol AS doc,
       |    regexp_split_to_array($textCol, ${sqlStringLit(sepRegex)}) AS ps FROM $table),
       |t0 AS (SELECT doc, ps, unnest(range(1, len(ps) + 1)) AS pos1 FROM d),
       |t1 AS (SELECT doc, CAST(pos1 - 1 AS INT) AS para_idx,
       |    lower(trim(regexp_replace(ps[pos1], '\\s+', ' ', 'g'))) AS np
       |  FROM t0),
       |t2 AS (SELECT doc, para_idx, np, ($epCase) AS ep FROM t1
       |  WHERE len(np) > 0),
       |k AS (SELECT doc, para_idx, ep, row_number() OVER (PARTITION BY np
       |    ORDER BY ep, doc, para_idx) AS rn
       |  FROM t2)
       |SELECT doc AS $idCol, para_idx, CAST(ep AS INT) AS epoch,
       |  (rn = 1) AS keep
       |FROM k WHERE ep > 0""".stripMargin
  }

  /** DuckDB SQL computing exactly seedIndex(NOT batchPred docs) then
    * [[processBatch]](batchPred docs): a batch paragraph keeps iff no
    * corpus occurrence of its digest exists AND it is the batch's
    * lowest-(doc, idx) occurrence — one rank with corpus-first ordering.
    */
  def incrOracleSql(batchPred: String, sepRegex: String = "\n\n",
      table: String = "documents", idCol: String = "doc_id",
      textCol: String = "text"): String =
    s"""WITH d AS (SELECT $idCol AS doc,
       |    regexp_split_to_array($textCol, ${sqlStringLit(sepRegex)}) AS ps FROM $table),
       |t0 AS (SELECT doc, ps, unnest(range(1, len(ps) + 1)) AS pos1 FROM d),
       |t1 AS (SELECT doc, CAST(pos1 - 1 AS INT) AS para_idx,
       |    lower(trim(regexp_replace(ps[pos1], '\\s+', ' ', 'g'))) AS np
       |  FROM t0),
       |t2 AS (SELECT doc, para_idx, np, (doc $batchPred) AS b FROM t1
       |  WHERE len(np) > 0),
       |k AS (SELECT doc, para_idx, b, row_number() OVER (PARTITION BY np
       |    ORDER BY (CASE WHEN b THEN 1 ELSE 0 END), doc, para_idx) AS rn
       |  FROM t2)
       |SELECT doc AS $idCol, para_idx, (rn = 1) AS keep FROM k WHERE b""".stripMargin
}

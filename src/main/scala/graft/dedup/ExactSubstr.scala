package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-SUBSTRING detection (Lee et al. 2021, "Deduplicating
  * Training Data Makes Language Models Better": remove every substring of
  * length ≥ L that appears more than once in the corpus). The paper builds
  * a corpus-wide suffix array — inherently sequential and memory-resident,
  * the wrong shape for a cluster. The distributed equivalent here:
  *
  *   1. every character position contributes its L-char gram, reduced to
  *      an xxhash64 — (doc_id, pos, h): O(corpus chars) rows,
  *      embarrassingly parallel, ~20 bytes each. The hash array is built
  *      ROW-LOCALLY (transform over the positions) before the explode, so
  *      generated rows carry only longs — exploding first and slicing
  *      after would copy the full document text into every position row
  *      (measured 3× slower at sf0.1);
  *   2. one aggregation finds hashes occurring more than once corpus-wide
  *      (within-doc repeats count, as in the paper);
  *   3. each doc's duplicated positions merge into maximal spans with a
  *      gaps-and-islands window PARTITIONED BY doc — state bounded by
  *      document length, never corpus length.
  *
  * Cost is one shuffle of the position table (L× the corpus bytes as
  * hash rows) + one doc-local window — the price of exactness; MinHash/
  * SimHash stay the cheap first pass, this is the heavy second pass run
  * on what survives. Gram identity needs only EQUALITY semantics, so the
  * engine-internal xxhash64 is enough (like MinHashLSH's band keys): the
  * DuckDB oracle groups the raw gram TEXT instead and must land on the
  * same dup sets — a 64-bit collision (≈ positions²/2⁶⁴; switch to a
  * two-seed 128-bit pair at 100 TB) is the only way they could differ.
  * Interval arithmetic is integer-exact on both engines.
  */
object ExactSubstr {

  /** Normalized corpus: (doc_id, __t normalized text, __len). */
  private def normalizedDocs(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      Dedup.normalized(col(textCol)).as("__t"))
      .withColumn("__len", length(col("__t")))

  /** Maximal per-document duplicated spans: (doc_id, __span ordinal,
    * __npos positions in the span, __s 1-based start, __e inclusive end).
    * The shared core of [[spanStats]] and [[cleanText]].
    */
  private def dupSpans(norm: DataFrame, minMatch: Int): DataFrame = {
    // position table: 1-based start of every L-gram. Hashes are computed
    // into a per-doc array BEFORE the generator so exploded rows are
    // (long, int, long) — never (text, int).
    val pos = norm.filter(col("__len") >= minMatch)
      // the per-position hash transform is the hot row-local loop, and a
      // one-file corpus arrives as ONE input partition — spread it before
      // paying L bytes of hashing per character (the q_ngram_jaccard
      // lesson; measured 5.9 s → 3.2 s warm at sf0.1)
      .repartition(norm.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), col("__len") - (minMatch - 1)),
          p => xxhash64(col("__t").substr(p, lit(minMatch)))))
          .as(Seq("__i", "__h")))
      .select(col("doc_id"), (col("__i") + 1).as("pos"), col("__h"))
    // corpus-wide repeated grams: aggregate + join-back, DELIBERATELY not
    // count().over(partition by hash) — the window form saves a shuffle
    // here but buffers every copy of a gram in one task, and the hot gram
    // at web scale is exactly the boilerplate repeated 10⁹ times; the
    // aggregate gets map-side partials and the join-back gets AQE's skew
    // split
    val dupGrams = pos.groupBy("__h").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1).select("__h")
    val dupPos = pos.join(dupGrams, Seq("__h")).select("doc_id", "pos")
    // gaps-and-islands span merge, doc-local: a new span starts where the
    // position lies beyond every previous position's coverage [p, p+L)
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prior = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    dupPos
      .withColumn("__maxEnd", max(col("pos") + (minMatch - 1)).over(prior))
      .withColumn("__start",
        when(col("__maxEnd").isNull || col("pos") > col("__maxEnd") + 1, 1)
          .otherwise(0))
      .withColumn("__span", sum(col("__start")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "__span")
      .agg(count(lit(1)).as("__npos"),
        min(col("pos")).as("__s"),
        (max(col("pos")) + (minMatch - 1)).as("__e"))
  }

  /** Per-document duplicated-span statistics: n_dup_pos (positions whose
    * L-gram repeats corpus-wide), n_spans (maximal merged spans),
    * n_chars_dup (chars covered by those spans), clean_len (normalized
    * length minus covered chars). Docs with no duplicated span — and docs
    * shorter than L — report zeros.
    */
  def spanStats(docs: DataFrame, idCol: String, textCol: String,
      minMatch: Int): DataFrame = {
    val norm = normalizedDocs(docs, idCol, textCol)
    val spans = dupSpans(norm, minMatch)
    val perDoc = spans.groupBy("doc_id")
      .agg(sum(col("__npos")).as("n_dup_pos"),
        count(lit(1)).cast("int").as("n_spans"),
        sum(col("__e") - col("__s") + 1).as("n_chars_dup"))
    norm.select(col("doc_id"), col("__len"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_dup_pos"), lit(0L)).as("n_dup_pos"),
        coalesce(col("n_spans"), lit(0)).as("n_spans"),
        coalesce(col("n_chars_dup"), lit(0L)).as("n_chars_dup"),
        (col("__len") - coalesce(col("n_chars_dup"), lit(0L))).as("clean_len"))
  }

  /** The REMOVAL the Lee-et-al. pipeline exists for: each document's
    * normalized text with every duplicated span cut out — (doc_id,
    * clean_text). The span set is [[dupSpans]]'s (sorted, non-overlapping,
    * maximal, gaps ≥ 1 char between spans by construction), so the rebuild
    * is a doc-local left fold over the span array: keep [cursor, start),
    * advance cursor to end+1, and append the tail. Everything after the
    * span computation is row-local (`aggregate` over a per-doc array
    * bounded by document length — no window, no extra shuffle beyond
    * spanStats' own). Docs without duplicated spans pass through verbatim
    * (normalized); a fully-covered doc yields the empty string.
    */
  def cleanText(docs: DataFrame, idCol: String, textCol: String,
      minMatch: Int): DataFrame = {
    val norm = normalizedDocs(docs, idCol, textCol)
    val spanArr = dupSpans(norm, minMatch)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("__s"), col("__e"))))
        .as("__spans"))
    norm.join(spanArr, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__spans").isNull, col("__t")).otherwise(expr(
          """aggregate(__spans,
            |  named_struct('cur', 1, 'out', ''),
            |  (acc, sp) -> named_struct(
            |    'cur', sp.__e + 1,
            |    'out', concat(acc.out, substring(__t, acc.cur, sp.__s - acc.cur))),
            |  acc -> concat(acc.out, substring(__t, acc.cur, __len - acc.cur + 1)))"""
            .stripMargin)).as("clean_text"))
  }

  /** DuckDB replay of [[cleanText]]: same normalization, gram table, dup
    * filter and island merge as [[oracleSql]], then the cleaned string is
    * rebuilt CHARACTER-WISE — every 1-based position not covered by any
    * span keeps its character, string_agg in position order. A different
    * mechanism than Spark's span-subtraction fold on purpose: both must
    * land on identical strings. Docs with spans covering everything yield
    * ''; docs with no spans (including shorter than L) pass through
    * normalized.
    */
  def cleanOracleSql(minMatch: Int, table: String = "documents",
      idCol: String = "doc_id", textCol: String = "text"): String = {
    val L = minMatch
    s"""WITH n AS (SELECT $idCol AS doc_id,
       |    lower(trim(regexp_replace($textCol, '\\s+', ' ', 'g'))) AS t
       |  FROM $table),
       |p AS (SELECT doc_id, pos, substr(t, pos, $L) AS g
       |  FROM (SELECT doc_id, t,
       |      unnest(range(1, length(t) - ${L - 1} + 1)) AS pos
       |    FROM n WHERE length(t) >= $L)),
       |dg AS (SELECT g FROM p GROUP BY g HAVING count(*) > 1),
       |dp AS (SELECT doc_id, pos FROM p JOIN dg USING (g)),
       |st AS (SELECT doc_id, pos,
       |    CASE WHEN max(pos + ${L - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |      OR pos > max(pos + ${L - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
       |      THEN 1 ELSE 0 END AS strt
       |  FROM dp),
       |isl AS (SELECT doc_id, pos,
       |    sum(strt) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS span
       |  FROM st),
       |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + ${L - 1} AS e
       |  FROM isl GROUP BY doc_id, span),
       |ch AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS cp FROM n),
       |keep AS (SELECT c.doc_id, c.cp, substr(c.t, c.cp, 1) AS c1
       |  FROM ch c WHERE NOT EXISTS (SELECT 1 FROM sp
       |    WHERE sp.doc_id = c.doc_id AND c.cp BETWEEN sp.s AND sp.e)),
       |cl AS (SELECT doc_id, string_agg(c1, '' ORDER BY cp) AS clean_text
       |  FROM keep GROUP BY doc_id)
       |SELECT n.doc_id,
       |  coalesce(cl.clean_text,
       |    CASE WHEN EXISTS (SELECT 1 FROM sp WHERE sp.doc_id = n.doc_id)
       |      THEN '' ELSE n.t END) AS clean_text
       |FROM n LEFT JOIN cl ON cl.doc_id = n.doc_id""".stripMargin
  }

  /** DuckDB replay of [[spanStats]]. */
  def oracleSql(minMatch: Int, table: String = "documents",
      idCol: String = "doc_id", textCol: String = "text"): String = {
    val L = minMatch
    s"""WITH n AS (SELECT $idCol AS doc_id,
       |    lower(trim(regexp_replace($textCol, '\\s+', ' ', 'g'))) AS t
       |  FROM $table),
       |p AS (SELECT doc_id, pos, substr(t, pos, $L) AS g
       |  FROM (SELECT doc_id, t,
       |      unnest(range(1, length(t) - ${L - 1} + 1)) AS pos
       |    FROM n WHERE length(t) >= $L)),
       |dg AS (SELECT g FROM p GROUP BY g HAVING count(*) > 1),
       |dp AS (SELECT doc_id, pos FROM p JOIN dg USING (g)),
       |st AS (SELECT doc_id, pos,
       |    CASE WHEN max(pos + ${L - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |      OR pos > max(pos + ${L - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
       |      THEN 1 ELSE 0 END AS strt
       |  FROM dp),
       |isl AS (SELECT doc_id, pos,
       |    sum(strt) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS span
       |  FROM st),
       |sp AS (SELECT doc_id, span, count(*) AS npos,
       |    max(pos) + ${L - 1} - min(pos) + 1 AS covered
       |  FROM isl GROUP BY doc_id, span),
       |pd AS (SELECT doc_id, CAST(sum(npos) AS BIGINT) AS n_dup_pos,
       |    CAST(count(*) AS INT) AS n_spans,
       |    CAST(sum(covered) AS BIGINT) AS n_chars_dup
       |  FROM sp GROUP BY doc_id)
       |SELECT n.doc_id,
       |  COALESCE(pd.n_dup_pos, 0) AS n_dup_pos,
       |  COALESCE(pd.n_spans, 0) AS n_spans,
       |  COALESCE(pd.n_chars_dup, 0) AS n_chars_dup,
       |  length(n.t) - COALESCE(pd.n_chars_dup, 0) AS clean_len
       |FROM n LEFT JOIN pd USING (doc_id)""".stripMargin
  }
}

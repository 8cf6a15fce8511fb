package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  private[dedup] def sqlStringLit(s: String): String =
    "'" + s.replace("'", "''") + "'"

  /** One row per non-empty paragraph: (idCol, para_idx, keep). para_idx
    * is the 0-based position in the ORIGINAL split (empty paragraphs
    * still consume an index, so kept indices address the raw document).
    */
  def paragraphDedup(df: DataFrame, idCol: String, textCol: String,
      sepRegex: String = "\n\n"): DataFrame = {
    val paras = df
      .select(col(idCol),
        posexplode(split(col(textCol), sepRegex)).as(Seq("para_idx", "__p")))
      .withColumn("__np", Dedup.normalized(col("__p")))
      .filter(length(col("__np")) > 0)
      .select(col(idCol), col("para_idx"), sha2(col("__np"), 256).as("__h"))
    val firsts = paras.groupBy("__h")
      .agg(min(struct(col(idCol), col("para_idx"))).as("__f"))
      .select(col("__h"), col("__f").getField(idCol).as("__fid"),
        col("__f").getField("para_idx").as("__fix"))
    paras.join(firsts, Seq("__h"))
      .select(col(idCol), col("para_idx"),
        (col(idCol) === col("__fid") && col("para_idx") === col("__fix"))
          .as("keep"))
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
}

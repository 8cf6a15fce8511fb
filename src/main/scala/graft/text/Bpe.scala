package graft.text

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.Materialize._

/** Byte-pair-encoding tokenizer: LEARN the top-K merges from corpus word
  * frequencies, APPLY them row-locally — the subword step real training
  * pipelines run between cleaning and token-id assignment.
  *
  * Scale shape (the reason BPE is feasible at 100 TB): learning never
  * touches the corpus again after ONE word-frequency aggregation — the
  * merge loop runs over the distinct-word table (millions of rows at web
  * scale, not billions of tokens), each iteration one pair-count
  * aggregate plus a single-row argmax collect, driver-bounded by K.
  * Application is a pure per-row expression chain — zero shuffle.
  *
  * Symbol representation: a word's symbol sequence is a string of
  * `|`-wrapped symbols separated by single spaces (`hello` →
  * `|h| |e| |l| |l| |o|`; the learned alphabet is restricted to `[a-z]+`
  * words so the delimiters can never collide with symbol text). Applying
  * merge (a,b) is then the LITERAL string replace `"|a| |b|"` →
  * `"|ab|"` — left-to-right and non-overlapping in Spark and DuckDB
  * alike, which is exactly BPE's greedy application order AND what lets
  * the DuckDB oracle replay the entire learn loop as K generated CTE
  * stages (no recursion, no UDF). Ties in pair frequency break on the
  * pair string ascending — total, engine-independent order (ASCII).
  */
object Bpe {

  final case class Merge(rank: Int, pair: String, merged: String, weight: Long)

  /** Corpus word-frequency table: (w, cnt) over lowercase-alpha tokens of
    * the normalized text. The ONE corpus-wide aggregation.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(Dedup.normalized(col(textCol)), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** `hello` → `|h| |e| |l| |l| |o|`. */
  private def symCol = trim(regexp_replace(col("w"), "(.)", "|$1| "))

  /** Learn the top-`k` merges, BATCHED: several provably-safe merges per
    * driver round-trip. Sequential BPE costs one Spark job per merge —
    * fine for a gated K of 16, but a production vocab of 30k merges would
    * serialize 30k jobs. Each round here runs ONE pair-count aggregate,
    * collects the top-`probe` pairs, and keeps a prefix of them that is
    * guaranteed to equal what the sequential loop would have picked:
    *
    *   - pairs are scanned in (weight desc, pair asc) rank order; a pair
    *     is kept while its two symbols are disjoint from every
    *     already-kept pair's symbols; the scan STOPS at the first
    *     conflicting pair (weight `w_stop`);
    *   - of the kept pairs, only those with weight strictly > `w_stop`
    *     are retained (plus the head, which is the exact argmax
    *     regardless). Applying a merge (a,b) only changes counts of pairs
    *     touching `a` or `b` — all blocked, so all of weight ≤ w_stop —
    *     and any pair it CREATES, (x,ab), inherits ≤ the weight of the
    *     blocked pair (x,a). Retained pairs' counts are therefore exact,
    *     still above everything that moved, and their (weight, pair)
    *     order is the sequential tie-break order. If the probe window
    *     fills without a conflict, the horizon weight is the conservative
    *     w_stop — anything below the window might conflict unseen.
    *
    * Identity with the sequential loop is asserted by BpeSpec on fixture
    * corpora and by the oracle gate (the DuckDB replay IS sequential).
    * Returns (merges, driver round-trips). The word table stays
    * localCheckpoint'd once per ROUND, not per merge.
    */
  def learnBatched(words: DataFrame, k: Int,
      probe: Int = 64): (Seq[Merge], Int) = {
    var cur = words.withColumn("sym", symCol).graftCheckpoint()
    val out = ArrayBuffer[Merge]()
    var rounds = 0
    var exhausted = false
    while (out.size < k && !exhausted) {
      val arr = split(col("sym"), " ")
      val topN = cur.filter(size(arr) >= 2)
        .select(col("cnt"), explode(transform(sequence(lit(1), size(arr) - 1),
          i => concat(element_at(arr, i), lit(" "), element_at(arr, i + 1))))
          .as("pair"))
        .groupBy("pair").agg(sum(col("cnt")).as("weight"))
        .orderBy(col("weight").desc, col("pair").asc)
        .limit(probe).collect()
      rounds += 1
      if (topN.isEmpty) exhausted = true
      else {
        val kept = ArrayBuffer[(String, Long)]()
        val sym = scala.collection.mutable.Set[String]()
        var wStop = Option.empty[Long]
        val it = topN.iterator
        while (it.hasNext && wStop.isEmpty) {
          val row = it.next()
          val pair = row.getString(0); val w = row.getLong(1)
          val ss = pair.split(" ")
          if (kept.nonEmpty && ss.exists(sym)) wStop = Some(w)
          else { kept += ((pair, w)); sym ++= ss }
        }
        if (wStop.isEmpty && topN.length == probe)
          wStop = Some(topN.last.getLong(1))
        val safe = (wStop match {
          case Some(w) => kept.head +: kept.tail.takeWhile(_._2 > w)
          case None => kept
        }).take(k - out.size)
        safe.foreach { case (pair, w) =>
          out += Merge(out.size + 1, pair, pair.replace("| |", ""), w)
        }
        cur = safe.foldLeft(cur) { case (d, (pair, _)) =>
          d.withColumn("sym",
            expr(s"replace(sym, '$pair', '${pair.replace("| |", "")}')"))
        }.graftCheckpoint()
      }
    }
    (out.toSeq, rounds)
  }

  /** Learn the top-`k` merges (batched under the hood — see
    * [[learnBatched]] for the safety argument).
    */
  def learn(words: DataFrame, k: Int): Seq[Merge] =
    learnBatched(words, k)._1

  /** The reference one-merge-per-job loop [[learnBatched]] must replicate
    * exactly; kept for the BpeSpec identity assertion.
    */
  private[graft] def learnSequential(words: DataFrame, k: Int): Seq[Merge] = {
    var cur = words.withColumn("sym", symCol).graftCheckpoint()
    val out = ArrayBuffer[Merge]()
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val arr = split(col("sym"), " ")
      val top = cur.filter(size(arr) >= 2)
        .select(col("cnt"), explode(transform(sequence(lit(1), size(arr) - 1),
          i => concat(element_at(arr, i), lit(" "), element_at(arr, i + 1))))
          .as("pair"))
        .groupBy("pair").agg(sum(col("cnt")).as("weight"))
        .orderBy(col("weight").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val merged = pair.replace("| |", "")
        out += Merge(r, pair, merged, top(0).getLong(1))
        cur = cur.withColumn("sym",
          expr(s"replace(sym, '$pair', '$merged')")).graftCheckpoint()
        r += 1
      }
    }
    out.toSeq
  }

  /** The learned merge table as a DataFrame (rank, pair, merged, weight). */
  def mergesDf(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learn(wordTable(docs, textCol), k)
      .toDF("rank", "pair", "merged", "weight")
  }

  /** Apply learned merges: per-document BPE token count. Tokenizes the
    * same `[a-z]+` words the learner saw, replays the merges in rank
    * order (a chain of K literal replaces — row-local, codegen'd, zero
    * shuffle), and aggregates tokens per document.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val words = docs
      .select(col(idCol),
        explode(split(Dedup.normalized(col(textCol)), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
    val applied = merges.foldLeft(words.withColumn("sym", symCol)) {
      (d, m) => d.withColumn("sym", expr(s"replace(sym, '${m.pair}', '${m.merged}')"))
    }
    applied
      .withColumn("n", size(split(col("sym"), " ")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"), sum(col("n")).as("n_bpe_tokens"))
  }

  // ---- DuckDB oracle generation -------------------------------------

  // AS MATERIALIZED on every chain stage: each s<i> is referenced twice
  // (by m<i+1> and s<i+1>), so an inlining planner would re-execute the
  // whole upstream chain per reference — exponential re-scans of the
  // parquet source (observed as "too many open files" at K=16).
  // Materialization makes the replay linear in K.
  private def wordCte(table: String, textCol: String): String =
    s"""w AS MATERIALIZED (SELECT w, count(*) AS cnt FROM (
       |    SELECT unnest(regexp_split_to_array(
       |      lower(trim(regexp_replace($textCol, '\\s+', ' ', 'g'))), ' ')) AS w
       |    FROM $table)
       |  WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY w),
       |s0 AS MATERIALIZED (SELECT w, cnt,
       |  trim(regexp_replace(w, '(.)', '|\\1| ', 'g')) AS sym FROM w)""".stripMargin

  /** One learn iteration as two CTEs: `m<i>` (the argmax pair of `s<i-1>`)
    * and `s<i>` (the replace applied). `range(1, len(arr))` is
    * end-exclusive, mirroring Spark's inclusive `sequence(1, size-1)`.
    */
  private def stepCtes(i: Int): String =
    s"""m$i AS MATERIALIZED (SELECT pair, sum(cnt) AS weight FROM (
       |    SELECT cnt, unnest(list_transform(range(1, len(arr)),
       |      j -> arr[j] || ' ' || arr[j+1])) AS pair
       |    FROM (SELECT cnt, str_split(sym, ' ') AS arr FROM s${i - 1})
       |    WHERE len(arr) >= 2)
       |  GROUP BY pair ORDER BY weight DESC, pair ASC LIMIT 1),
       |s$i AS MATERIALIZED (SELECT w, cnt, replace(sym, (SELECT pair FROM m$i),
       |    replace((SELECT pair FROM m$i), '| |', '')) AS sym FROM s${i - 1})""".stripMargin

  /** Oracle replaying [[learn]]: the K-row merge table. */
  def mergesOracleSql(k: Int, table: String = "documents",
      textCol: String = "text"): String = {
    val ctes = (wordCte(table, textCol) +: (1 to k).map(stepCtes)).mkString(",\n")
    val rows = (1 to k).map(i =>
      s"""SELECT CAST($i AS INT) AS rank, pair,
         |  replace(pair, '| |', '') AS merged,
         |  CAST(weight AS BIGINT) AS weight FROM m$i""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"WITH $ctes\n$rows"
  }

  /** Oracle replaying [[learn]] + [[encode]]: per-document token counts
    * after the K learned merges.
    */
  def encodeOracleSql(k: Int, table: String = "documents",
      idCol: String = "doc_id", textCol: String = "text"): String = {
    val ctes = (wordCte(table, textCol) +: (1 to k).map(stepCtes)).mkString(",\n")
    val applied = (1 to k).foldLeft("trim(regexp_replace(w, '(.)', '|\\1| ', 'g'))") {
      (acc, i) =>
        s"replace($acc, (SELECT pair FROM m$i), replace((SELECT pair FROM m$i), '| |', ''))"
    }
    s"""WITH $ctes,
       |dw AS (SELECT $idCol AS doc_id, unnest(regexp_split_to_array(
       |    lower(trim(regexp_replace($textCol, '\\s+', ' ', 'g'))), ' ')) AS w
       |  FROM $table),
       |aw AS (SELECT doc_id, len(str_split($applied, ' ')) AS n
       |  FROM dw WHERE regexp_matches(w, '^[a-z]+$$'))
       |SELECT doc_id, count(*) AS n_words,
       |  CAST(sum(n) AS BIGINT) AS n_bpe_tokens
       |FROM aw GROUP BY doc_id""".stripMargin
  }
}

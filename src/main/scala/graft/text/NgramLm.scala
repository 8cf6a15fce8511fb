package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.Materialize._

/** Corpus-trained bigram language-model perplexity — the CCNet-style
  * quality signal (Wenzek et al. 2020, arXiv:1911.00359): score every
  * document by how predictable its token stream is under an n-gram LM.
  * Boilerplate and in-distribution prose score low; OCR noise, menus,
  * and gibberish score high — the standard cheap filter in front of a
  * pretraining pipeline. Here the LM is trained on the corpus itself
  * (self-perplexity: outliers vs the corpus's own distribution), which
  * is the same two-pass shape as training on a reference corpus — the
  * count tables just come from a different input.
  *
  * Model: add-k-smoothed bigram conditional,
  * logp(w2|w1) = ln((c(w1,w2) + k) / (c(w1·) + k·V)), with V the
  * continuation vocabulary (distinct w2). ppl(doc) =
  * exp(−Σ logp / n_bigrams). Every count is an exact integer and k is a
  * power of two, so both engines divide identically-representable
  * doubles; the per-doc Σ folds the bigram log-probs IN POSITION ORDER
  * (sorted collect + left fold — the q_embed_pool cross-engine parity
  * trick), so the float result is reproducible, not
  * accumulation-order-dependent.
  *
  * Scale shape: two corpus-linear passes (bigram explode → two
  * map-side-combinable count aggregations), then the scoring join
  * back to the exploded bigrams on (w1, w2) — shuffles carry bigram
  * TYPES for the count tables (vocab-bounded) and bigram TOKENS for the
  * scoring join (corpus-linear, AQE-broadcast when the LM fits). No
  * per-document state bigger than its own token list ever sorts in one
  * task beyond the per-doc fold.
  */
object NgramLm {

  /** One row per document: (idCol, n_bigrams, ppl) — ppl NULL for
    * documents with fewer than two tokens.
    */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    val toks = split(Dedup.normalized(col(textCol)), " ")
    val d = docs.select(col(idCol).as("__doc"), toks.as("__toks"))
    // (doc, pos, w1, w2): pos is the 0-based index of w1. The bigram
    // structs are zipped ROW-LOCALLY before the explode — an
    // element_at(toks, pos)-after-explode formulation would carry the
    // whole token array on every exploded row (O(len²) bytes per
    // document through the Generate), which is the kind of quiet
    // amplification that only shows up on 10k-token documents at scale.
    val nBi = greatest(size(col("__toks")) - 1, lit(0))
    val bgArr = zip_with(
      slice(col("__toks"), lit(1), nBi), slice(col("__toks"), lit(2), nBi),
      (a, b) => struct(a.as("w1"), b.as("w2")))
    val bg = d.select(col("__doc"), posexplode(bgArr).as(Seq("__pos", "__bg")))
      .select(col("__doc"), col("__pos"),
        col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
    // ONE corpus aggregation (the bigram counts); the leading-token
    // marginal and the continuation vocabulary both fold from that
    // vocab²-bounded table instead of re-scanning the corpus — the plan
    // audit showed the three-aggregation formulation re-generated the
    // token stream once per count table (4 corpus scans; this is 2)
    val c12 = bg.groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12"))
      .graftCheckpoint(eager = false)
    val c1 = c12.groupBy("__w1").agg(sum("__c12").as("__c1"))
      .withColumnRenamed("__w1", "__u1")
    val v = c12.agg(countDistinct(col("__w2")).as("__v"))
    val scored = bg
      .join(c12, Seq("__w1", "__w2"))
      .join(c1, col("__w1") === col("__u1"))
      .crossJoin(broadcast(v))
      .select(col("__doc"), col("__pos"),
        log((col("__c12") + lit(k)) / (col("__c1") + lit(k) * col("__v")))
          .as("__lp"))
    val per = scored.groupBy("__doc").agg(
        sort_array(collect_list(struct(col("__pos"), col("__lp"))))
          .as("__ls"))
      .select(col("__doc"),
        size(col("__ls")).cast("long").as("n_bigrams"),
        round(exp(-aggregate(col("__ls"), lit(0.0d),
            (acc, s) => acc + s.getField("__lp")) / size(col("__ls"))), 4)
          .as("ppl"))
    // keep sub-2-token documents in the domain (n_bigrams 0, NULL ppl)
    d.select(col("__doc"))
      .join(per, Seq("__doc"), "left")
      .select(col("__doc").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("ppl"))
  }

  /** DuckDB SQL computing exactly [[bigramPerplexity]] — same tokenizer,
    * same counts, same position-ordered left fold.
    */
  def oracleSql(k: Double = 0.5, table: String = "documents",
      idCol: String = "doc_id", textCol: String = "text"): String =
    s"""WITH d AS (SELECT $idCol AS doc, regexp_split_to_array(
       |    lower(trim(regexp_replace($textCol, '\\s+', ' ', 'g'))), ' ') AS toks
       |  FROM $table),
       |bg0 AS (SELECT doc, toks, unnest(range(1, len(toks))) AS pos FROM d),
       |bg AS (SELECT doc, pos, toks[pos] AS w1, toks[pos + 1] AS w2 FROM bg0),
       |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
       |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
       |v AS (SELECT count(DISTINCT w2) AS v FROM bg),
       |scored AS (SELECT bg.doc, bg.pos,
       |    ln((c12.c12 + $k) / (c1.c1 + $k * v.v)) AS lp
       |  FROM bg JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
       |  JOIN c1 ON bg.w1 = c1.w1 CROSS JOIN v),
       |per AS (SELECT doc, list(lp ORDER BY pos) AS ls
       |  FROM scored GROUP BY doc)
       |SELECT d.doc AS $idCol,
       |  CAST(coalesce(len(per.ls), 0) AS BIGINT) AS n_bigrams,
       |  round(exp(-list_reduce(per.ls, (a, b) -> a + b) / len(per.ls)), 4)
       |    AS ppl
       |FROM d LEFT JOIN per ON per.doc = d.doc""".stripMargin
}

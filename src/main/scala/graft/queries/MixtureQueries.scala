package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Data-MIXTURE operators: the source-level bookkeeping a training-data
  * pipeline runs before sampling a corpus — temperature-smoothed mixture
  * weights, token-budget allocation with per-source caps, first-occurrence
  * n-gram novelty, and duplicate-cluster size audits.
  *
  * Reference behavior: the reference's per-tenant/per-source load
  * accounting (row counts and shares per connector feeding the warehouse)
  * generalized to the token-weighted form LLM corpus curation uses
  * (smoothed sampling weights à la multilingual/unigram mixing).
  *
  * Scale shape shared by all four: ONE heavy map-side-combinable
  * aggregate over documents (token counting / fingerprinting) reduces the
  * corpus to |sources| or |clusters| rows; everything after — weight
  * normalization, budget redistribution — runs on that tiny frame with
  * one-row totals riding as broadcasts. No cross joins, no windows over
  * the corpus.
  */
object MixtureQueries {

  /** documents with a whitespace token count per doc (the `size(split)`
    * is codegen'd; the count is the only thing that leaves the row).
    */
  private def docTokens(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).as("n_tok"))

  /** Per-source (avail tokens, n_docs) + smoothed weight columns. */
  private def sourceWeights(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val src = docTokens(s, dir).groupBy("source")
      .agg(sum("n_tok").as("avail"), count(lit(1)).as("n_docs"))
    val tot = src.agg(sum("avail").as("total"))
    val shared = src.crossJoin(broadcast(tot))
      .withColumn("share", col("avail").cast("double") / col("total"))
      .withColumn("rw", sqrt(col("share")))
    val rwSum = shared.agg(sum("rw").as("rw_sum"))
    shared.crossJoin(broadcast(rwSum))
      .withColumn("weight", col("rw") / col("rw_sum"))
  }

  val defs: Seq[QueryDef] = Seq(

    // TEMPERATURE-SMOOTHED mixture weights (α=0.5): the standard
    // upsample-the-tail / downsample-the-head rebalancing (multilingual
    // unigram mixing). share = source tokens / corpus tokens; weight ∝
    // share^α; boost = weight/share is the effective epoch multiplier a
    // sampler applies to that source. Integer token sums keep share exact;
    // the only float ops are sqrt + one 20-term normalization.
    QueryDef(
      "q_mix_weights",
      Some("""WITH s AS (SELECT source,
             |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS avail,
             |    CAST(count(*) AS BIGINT) AS n_docs
             |  FROM documents GROUP BY 1),
             |t AS (SELECT CAST(sum(avail) AS BIGINT) AS total FROM s),
             |w AS (SELECT source, avail, n_docs,
             |    avail::DOUBLE / total AS share,
             |    sqrt(avail::DOUBLE / total) AS rw
             |  FROM s, t),
             |n AS (SELECT sum(rw) AS rw_sum FROM w)
             |SELECT source, avail, n_docs,
             |  round(share, 6) AS share,
             |  round(rw / rw_sum, 6) AS weight,
             |  round((rw / rw_sum) / share, 4) AS boost
             |FROM w, n""".stripMargin),
      (s, dir) => sourceWeights(s, dir)
        .select(col("source"), col("avail"), col("n_docs"),
          round(col("share"), 6).as("share"),
          round(col("weight"), 6).as("weight"),
          round(col("weight") / col("share"), 4).as("boost"))),

    // TOKEN-BUDGET allocation with per-source caps: give each source
    // budget·weight tokens, cap at what the source actually has, then
    // redistribute the capped surplus over uncapped sources in proportion
    // to weight (one redistribution round — with smoothing at α=0.5 the
    // uncapped margins dwarf the surplus, so one round settles; the
    // at-scale iterative water-filling is the same |sources|-row loop
    // driver-side, never a corpus pass). The budget is 95% of corpus
    // tokens — scale-invariant, so the capped/uncapped regime the spec
    // pins survives fixture regeneration at any sf.
    QueryDef(
      "q_token_budget",
      Some("""WITH s AS (SELECT source,
             |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS avail
             |  FROM documents GROUP BY 1),
             |t AS (SELECT CAST(sum(avail) AS BIGINT) AS total FROM s),
             |w AS (SELECT source, avail, total,
             |    sqrt(avail::DOUBLE / total) AS rw FROM s, t),
             |n AS (SELECT sum(rw) AS rw_sum FROM w),
             |d AS (SELECT source, avail, rw / rw_sum AS wt,
             |    CAST(0.95 AS DOUBLE) * total * (rw / rw_sum) AS desired,
             |    CAST(0.95 AS DOUBLE) * total AS budget
             |  FROM w, n),
             |c AS (SELECT *, desired >= avail AS capped,
             |    least(desired, avail::DOUBLE) AS alloc1 FROM d),
             |l AS (SELECT max(budget) - sum(alloc1) AS leftover,
             |    sum(CASE WHEN NOT capped THEN wt ELSE 0.0 END) AS w_unc
             |  FROM c)
             |SELECT source, avail, capped,
             |  round(CASE WHEN capped THEN avail::DOUBLE
             |    ELSE least(avail::DOUBLE, alloc1 + leftover * wt / w_unc)
             |    END, 2) AS alloc
             |FROM c, l""".stripMargin),
      (s, dir) => {
        val d = sourceWeights(s, dir)
          .withColumn("budget", lit(0.95) * col("total"))
          .withColumn("desired", col("budget") * col("weight"))
          .withColumn("capped", col("desired") >= col("avail"))
          .withColumn("alloc1", least(col("desired"), col("avail").cast("double")))
        val lf = d.agg(
          (max("budget") - sum("alloc1")).as("leftover"),
          sum(when(!col("capped"), col("weight")).otherwise(lit(0.0))).as("w_unc"))
        d.crossJoin(broadcast(lf))
          .select(col("source"), col("avail"), col("capped"),
            round(when(col("capped"), col("avail").cast("double"))
              .otherwise(least(col("avail").cast("double"),
                col("alloc1") + col("leftover") * col("weight") / col("w_unc"))),
              2).as("alloc"))
      }),

    // OUTPUT-SHARD ASSIGNMENT: place docs (in doc_id order) into
    // fixed-token-budget shards — the webdataset/tfrecord export planning
    // step that decides which output file each document lands in. A doc
    // starts in the shard its cumulative predecessor count falls in
    // (greedy, order-preserving — shard boundaries never split a doc).
    // The running total rides ops.PrefixSum's two-phase range-partitioned
    // scan: no empty-partition-spec Window, state bounded per partition —
    // the same machinery (and PlanSpec gate) as q_pack_sequences.
    QueryDef(
      "q_shard_assign",
      Some("""WITH t AS (SELECT doc_id,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
             |      AS n_tok
             |  FROM documents),
             |r AS (SELECT doc_id, n_tok,
             |    sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
             |      AS running
             |  FROM t)
             |SELECT doc_id, n_tok, CAST(running AS BIGINT) AS running,
             |  CAST((running - n_tok) // 4000 AS BIGINT) AS shard_id
             |FROM r""".stripMargin),
      (s, dir) => {
        val toks = Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
        graft.ops.PrefixSum.runningTotal(
            toks, Seq(col("doc_id")), col("n_tok"), "running")
          .select(col("doc_id"), col("n_tok"), col("running"),
            expr("(running - n_tok) div 4000").as("shard_id"))
      }),

    // N-GRAM NOVELTY in doc_id order: per doc, the fraction of its
    // distinct word-3-grams whose FIRST corpus occurrence is this doc —
    // the saturation curve corpus curation watches to decide when more
    // data from a source stops adding anything. first-occurrence is a
    // min(doc_id) aggregate per gram (map-side partial absorbs hot
    // boilerplate grams — the same skew shape as substring dedup), never
    // a window over the corpus.
    QueryDef(
      "q_ngram_novelty",
      Some("""WITH tok AS (SELECT doc_id,
             |    regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
             |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |    range(1, len(toks) - 1),
             |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS gram
             |  FROM tok WHERE len(toks) >= 3),
             |f AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1)
             |SELECT g.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_grams,
             |  CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_novel,
             |  round(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)::DOUBLE
             |    / count(*), 4) AS novelty
             |FROM g JOIN f USING (gram) GROUP BY 1""".stripMargin),
      (s, dir) => {
        val toks = Tables.t(s, dir, "documents")
          .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
          .filter(size(col("toks")) >= 3)
        val grams = toks.select(col("doc_id"), explode(expr(
            "array_distinct(transform(sequence(0, size(toks) - 3), " +
              "i -> concat_ws(' ', slice(toks, i + 1, 3))))")).as("gram"))
        val first = grams.groupBy("gram").agg(min("doc_id").as("first_doc"))
        grams.join(first, "gram")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("first_doc") === col("doc_id"), 1).otherwise(0))
              .cast("long").as("n_novel"))
          .select(col("doc_id"), col("n_grams"), col("n_novel"),
            round(col("n_novel").cast("double") / col("n_grams"), 4).as("novelty"))
      }),

    // DUPLICATE-CLUSTER SIZE HISTOGRAM over prefix fingerprints (the
    // cheap first-pass dup audit: cluster on the normalized 50-char
    // prefix, report how cluster sizes distribute). Two stacked
    // aggregates, both map-side combinable: a hot boilerplate prefix
    // collapses to one row per partition before either shuffle — the
    // power-law head never concentrates on a reducer.
    QueryDef(
      "q_cluster_size_hist",
      Some("""WITH fp AS (SELECT substr(lower(trim(regexp_replace(
             |      text, '\s+', ' ', 'g'))), 1, 50) AS fp
             |  FROM documents),
             |c AS (SELECT fp, CAST(count(*) AS BIGINT) AS cluster_size
             |  FROM fp GROUP BY 1)
             |SELECT cluster_size,
             |  CAST(count(*) AS BIGINT) AS n_clusters,
             |  CAST(sum(cluster_size) AS BIGINT) AS n_docs
             |FROM c GROUP BY 1""".stripMargin),
      (s, dir) => Tables.t(s, dir, "documents")
        .select(substring(lower(trim(regexp_replace(
          col("text"), "\\s+", " "))), 1, 50).as("fp"))
        .groupBy("fp").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"),
          sum("cluster_size").as("n_docs")))
  )
}

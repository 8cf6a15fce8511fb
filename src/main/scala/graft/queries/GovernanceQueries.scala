package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.Materialize._

/** Corpus-GOVERNANCE operators: the audit reports a data pipeline owner
  * runs before shipping a corpus — filter-funnel attrition, per-source
  * dedup impact, k-anonymity suppression cost, and embedding-space
  * separability.
  *
  * Reference behavior: the reference's per-connector data-quality and
  * row-count audit queries (dq dashboards over load stats), generalized
  * to the corpus-curation checks an LLM data pipeline needs.
  *
  * Scale shape: every query is one corpus scan reduced by
  * map-side-combinable aggregates to a tiny report frame (|stages|,
  * |sources|, |event types|, |label pairs|); no windows over the corpus,
  * no cross joins except |labels|²-sized centroid pairing.
  */
object GovernanceQueries {

  val defs: Seq[QueryDef] = Seq(

    // FILTER-FUNNEL attrition: the cumulative keep/drop ledger for a
    // 4-rule quality gate (min chars → target langs → min words → max
    // stopword ratio). ONE scan computes per-doc flags; conditional sums
    // collapse to a single row; stack() unpivots to one row per stage
    // with pass/drop/rate bookkeeping. The report a curation run prints
    // before anyone signs off on "we dropped 37% of the crawl".
    QueryDef(
      "q_filter_funnel",
      Some("""WITH w AS (SELECT n_chars, lang,
             |    regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
             |f AS (SELECT
             |    n_chars >= 120 AS c1,
             |    lang IN ('en', 'de', 'fr', 'es') AS c2,
             |    len(t) >= 25 AS c3,
             |    len(list_filter(t, x -> x IN ('the', 'a')))::DOUBLE
             |      / len(t) <= 0.10 AS c4
             |  FROM w),
             |a AS (SELECT
             |    CAST(count(*) AS BIGINT) AS n0,
             |    CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |    CAST(sum(CASE WHEN c1 AND c2 AND c3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             |    CAST(sum(CASE WHEN c1 AND c2 AND c3 AND c4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
             |  FROM f)
             |SELECT stage, filter, n_pass,
             |  n_prev - n_pass AS n_dropped,
             |  round(n_pass::DOUBLE / n0, 4) AS pass_rate
             |FROM (
             |  SELECT n0, 0 AS stage, 'all' AS filter, n0 AS n_pass, n0 AS n_prev FROM a
             |  UNION ALL SELECT n0, 1, 'min_chars_120', n1, n0 FROM a
             |  UNION ALL SELECT n0, 2, 'target_langs', n2, n1 FROM a
             |  UNION ALL SELECT n0, 3, 'min_words_25', n3, n2 FROM a
             |  UNION ALL SELECT n0, 4, 'stopword_ratio', n4, n3 FROM a)""".stripMargin),
      (s, dir) => {
        val f = Tables.t(s, dir, "documents")
          .select(col("n_chars"), col("lang"),
            split(trim(col("text")), "\\s+").as("t"))
          .select(
            (col("n_chars") >= 120).as("c1"),
            col("lang").isin("en", "de", "fr", "es").as("c2"),
            (size(col("t")) >= 25).as("c3"),
            (size(filter(col("t"), x => x.isin("the", "a"))).cast("double")
              / size(col("t")) <= 0.10).as("c4"))
        f.agg(
            count(lit(1)).as("n0"),
            sum(when(col("c1"), 1).otherwise(0)).as("n1"),
            sum(when(col("c1") && col("c2"), 1).otherwise(0)).as("n2"),
            sum(when(col("c1") && col("c2") && col("c3"), 1).otherwise(0)).as("n3"),
            sum(when(col("c1") && col("c2") && col("c3") && col("c4"), 1)
              .otherwise(0)).as("n4"))
          .selectExpr(
            """stack(5,
              |  0, 'all',            n0, n0, n0,
              |  1, 'min_chars_120',  n1, n0, n0,
              |  2, 'target_langs',   n2, n1, n0,
              |  3, 'min_words_25',   n3, n2, n0,
              |  4, 'stopword_ratio', n4, n3, n0
              |) AS (stage, filter, n_pass, n_prev, n_all)""".stripMargin)
          .select(col("stage"), col("filter"),
            col("n_pass").cast("long").as("n_pass"),
            (col("n_prev") - col("n_pass")).cast("long").as("n_dropped"),
            round(col("n_pass").cast("double") / col("n_all"), 4).as("pass_rate"))
      }),

    // PER-SOURCE DEDUP IMPACT with GLOBAL keeper attribution: dedup on
    // the normalized 50-char prefix fingerprint keeps the lowest doc_id
    // per cluster CORPUS-WIDE; each source is then charged for its docs
    // that lost to a keeper (possibly in another source) — the report
    // that shows which feeds are re-crawling each other. min(doc_id) per
    // fingerprint is a partial aggregate (hot boilerplate collapses
    // map-side); the keeper table joins back on the fingerprint key.
    QueryDef(
      "q_dedup_impact",
      Some("""WITH fp AS (SELECT doc_id, source,
             |    substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), 1, 50) AS fp
             |  FROM documents),
             |k AS (SELECT fp, min(doc_id) AS keeper FROM fp GROUP BY 1)
             |SELECT source,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN doc_id = keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
             |  round(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END)::DOUBLE
             |    / count(*), 4) AS dup_rate
             |FROM fp JOIN k USING (fp) GROUP BY 1""".stripMargin),
      (s, dir) => {
        val fp = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            substring(lower(trim(regexp_replace(col("text"), "\\s+", " "))),
              1, 50).as("fp"))
        val k = fp.groupBy("fp").agg(min("doc_id").as("keeper"))
        fp.join(k, "fp")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("doc_id") === col("keeper"), 1).otherwise(0))
              .cast("long").as("n_kept"),
            sum(when(col("doc_id") =!= col("keeper"), 1).otherwise(0))
              .cast("long").as("n_removed"))
          .select(col("source"), col("n_docs"), col("n_kept"), col("n_removed"),
            round(col("n_removed").cast("double") / col("n_docs"), 4)
              .as("dup_rate"))
      }),

    // K-ANONYMITY suppression audit (k=5): quasi-identifier =
    // (event_type, event hour); a group seen by fewer than k distinct
    // users is re-identifiable, and publishing the table k-anonymized
    // means suppressing those rows. Reports, per event type, how many
    // quasi-groups are risky and what fraction of rows suppression
    // costs — the privacy/utility tradeoff number. Two stacked
    // aggregates; group cardinality is |types|×|hours|, never user-sized.
    QueryDef(
      "q_k_anon",
      Some("""WITH g AS (SELECT event_type, date_trunc('hour', ts) AS h,
             |    count(DISTINCT user_id) AS n_users, count(*) AS n_rows
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type,
             |  CAST(count(*) AS BIGINT) AS n_groups,
             |  CAST(sum(CASE WHEN n_users < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky,
             |  CAST(sum(CASE WHEN n_users < 5 THEN n_rows ELSE 0 END) AS BIGINT)
             |    AS rows_suppressed,
             |  round(sum(CASE WHEN n_users < 5 THEN n_rows ELSE 0 END)::DOUBLE
             |    / sum(n_rows), 4) AS suppression_cost
             |FROM g GROUP BY 1""".stripMargin),
      (s, dir) => Tables.t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(countDistinct("user_id").as("n_users"),
          count(lit(1)).as("n_rows"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("n_users") < 5, 1).otherwise(0)).cast("long")
            .as("n_risky"),
          sum(when(col("n_users") < 5, col("n_rows")).otherwise(0L))
            .cast("long").as("rows_suppressed"),
          round(sum(when(col("n_users") < 5, col("n_rows")).otherwise(0L))
            .cast("double") / sum("n_rows"), 4).as("suppression_cost"))),

    // EVAL-SPLIT LEAKAGE: after the deterministic sha-bucket split
    // (identical to q_split_sample), count test docs that have a ≥0.9
    // word-Jaccard near-duplicate on the train/val side — the
    // decontamination check run before any benchmark number is trusted.
    // Pair generation pins the SAME strategy q_word_jaccard pins — bitmask
    // with the 10k-doc cap — because this template corpus's 31-word
    // vocabulary defeats every candidate-pruning scheme (measured there:
    // prefix-inverted = 11.3M candidates / ~90 s, popcount all-pairs ~2 s;
    // re-confirmed here: the default auto-routed index cost 85 s at
    // sf0.1). On a real vocabulary the call would pass JaccardInverted,
    // exactly like q_word_jaccard_scaled. The split and leak attribution
    // are joins on the pair ends.
    QueryDef(
      "q_split_leakage",
      Some("""WITH w AS (SELECT doc_id, list_distinct(regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS ws
             |  FROM documents),
             |s AS (SELECT doc_id, CASE WHEN b < 80 THEN 'train'
             |      WHEN b < 90 THEN 'val' ELSE 'test' END AS split
             |  FROM (SELECT doc_id,
             |    ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |      % 100 AS b FROM documents)),
             |p AS (SELECT a.doc_id AS da, b.doc_id AS db
             |  FROM w a JOIN w b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.ws, b.ws))::DOUBLE
             |      / len(list_distinct(a.ws || b.ws)) >= 0.9),
             |x AS (SELECT DISTINCT CASE WHEN sa.split = 'test' THEN da ELSE db
             |    END AS leaked
             |  FROM p JOIN s sa ON sa.doc_id = da JOIN s sb ON sb.doc_id = db
             |  WHERE (sa.split = 'test') <> (sb.split = 'test'))
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM s
             |    WHERE split = 'test') AS n_test,
             |  CAST(count(*) AS BIGINT) AS n_leaked,
             |  round(count(*)::DOUBLE / (SELECT count(*) FROM s
             |    WHERE split = 'test'), 4) AS leak_rate
             |FROM x""".stripMargin),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val splits = graft.ops.Sampling.hashSplit(
          docs.select("doc_id"), "doc_id").select("doc_id", "split")
        val pairs = graft.dedup.Dedup.jaccardPairs(
            docs, "doc_id", "text", threshold = 0.9,
            strategy = graft.dedup.Dedup.JaccardBitmask,
            bitmaskMaxSets = 100000L)
          .select("doc_a", "doc_b")
        val leaked = pairs
          .join(splits.select(col("doc_id").as("doc_a"),
            (col("split") === "test").as("ta")), "doc_a")
          .join(splits.select(col("doc_id").as("doc_b"),
            (col("split") === "test").as("tb")), "doc_b")
          .filter(col("ta") =!= col("tb"))
          .select(when(col("ta"), col("doc_a")).otherwise(col("doc_b"))
            .as("leaked"))
          .distinct()
        val nTest = splits.filter(col("split") === "test")
          .agg(count(lit(1)).as("n_test"))
        leaked.agg(count(lit(1)).as("n_leaked"))
          .crossJoin(broadcast(nTest))
          .select(col("n_test"), col("n_leaked"),
            round(col("n_leaked").cast("double") / col("n_test"), 4)
              .as("leak_rate"))
      }),

    // WINSORIZATION audit: clamp value to per-type exact [p05, p95] and
    // report the clamp counts + winsorized mean — the outlier treatment
    // robust pipelines apply before any mean-based statistic. Cuts come
    // from ops.Quantiles and ride back as a broadcast join — the corpus
    // is never windowed or sorted globally.
    //
    // r14: cuts are DISCRETE (type-1) quantiles, not interpolated. The
    // sf1 widening caught the interpolated form's fragility: the two
    // engines' quantile_cont produced cuts 1 ulp apart, and the strict
    // `value < lo` clamp count flipped by an entire 50-row tie group
    // (green at every sf ≤ 0.1, red at sf1). A discrete cut is a data
    // value picked by integer rank — bit-identical across engines, so
    // the comparison is scale-stable. Winsorizing on disc quantiles is
    // equally standard practice.
    QueryDef(
      "q_winsorize",
      Some("""WITH c AS (SELECT event_type,
             |    quantile_disc(value, 0.05) AS lo,
             |    quantile_disc(value, 0.95) AS hi
             |  FROM events GROUP BY 1)
             |SELECT e.event_type,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
             |  CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
             |  round(avg(CASE WHEN value < lo THEN lo WHEN value > hi THEN hi
             |    ELSE value END), 4) AS mean_w
             |FROM events e JOIN c USING (event_type) GROUP BY 1""".stripMargin),
      (s, dir) => {
        val ev = Tables.t(s, dir, "events").select("event_type", "value")
        val cuts = graft.ops.Quantiles.groupQuantilesDisc(
            ev, "event_type", "value", Seq("lo" -> 0.05, "hi" -> 0.95))
          .select("event_type", "lo", "hi")
        ev.join(broadcast(cuts), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") < col("lo"), 1).otherwise(0)).cast("long")
              .as("n_lo"),
            sum(when(col("value") > col("hi"), 1).otherwise(0)).cast("long")
              .as("n_hi"),
            round(avg(when(col("value") < col("lo"), col("lo"))
              .when(col("value") > col("hi"), col("hi"))
              .otherwise(col("value"))), 4).as("mean_w"))
      }),

    // HARD-NEGATIVE MINING: for each query vector, the top-3 most
    // cosine-similar vectors with a DIFFERENT label — the
    // contrastive-pair source a retrieval/embedding trainer feeds on.
    // Same plan family as q_knn_cosine (broadcast query block × corpus,
    // native codegen dot product, per-query top-k window over a
    // |queries|-partitioned frame); the label constraint is a residual
    // filter on the broadcast join, pruning before any score is computed.
    QueryDef(
      "q_hard_negatives",
      Some("""WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
             |    embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 20),
             |c AS (SELECT vec_id AS neighbor_id, label AS nlabel,
             |    embedding::DOUBLE[] AS cv FROM embeddings)
             |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
             |  round(cos, 4) AS cos
             |FROM (SELECT query_id, neighbor_id,
             |    list_cosine_similarity(qv, cv) AS cos,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id) AS rank
             |  FROM q JOIN c ON qlabel <> nlabel)
             |WHERE rank <= 3""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import graft.expressions.DotProduct
        val base = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            transform(col("embedding"), _.cast("double")).as("v"))
        val withN = base.withColumn("n",
          sqrt(DotProduct.dot(s, col("v"), col("v"))))
        val qs = withN.filter(col("vec_id") < 20)
          .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
            col("v").as("qv"), col("n").as("qn"))
        val cs = withN.select(col("vec_id").as("neighbor_id"),
          col("label").as("nlabel"), col("v").as("cv"), col("n").as("cn"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))
        cs.crossJoin(broadcast(qs))
          .filter(col("nlabel") =!= col("qlabel"))
          .withColumn("cos",
            DotProduct.dot(s, col("qv"), col("cv")) / (col("qn") * col("cn")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("query_id"), col("neighbor_id"),
            col("rank").cast("int").as("rank"), round(col("cos"), 4).as("cos"))
      }),

    // CROSS-SOURCE DUPLICATION MATRIX: near-dup pairs (≥0.9 word
    // Jaccard, same pinned bitmask strategy as q_split_leakage) rolled up
    // by the source pair — the "which feeds mirror each other" report
    // that decides crawl dedup priorities. The pair set is tiny relative
    // to the corpus; source attribution is two joins on the pair ends and
    // the rollup is |sources|²-bounded.
    QueryDef(
      "q_source_overlap",
      Some("""WITH w AS (SELECT doc_id, source, list_distinct(
             |    regexp_split_to_array(lower(trim(regexp_replace(
             |      text, '\s+', ' ', 'g'))), ' ')) AS ws
             |  FROM documents),
             |p AS (SELECT a.doc_id AS da, a.source AS sa,
             |    b.doc_id AS db, b.source AS sb
             |  FROM w a JOIN w b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.ws, b.ws))::DOUBLE
             |      / len(list_distinct(a.ws || b.ws)) >= 0.9)
             |SELECT least(sa, sb) AS source_a, greatest(sa, sb) AS source_b,
             |  CAST(count(*) AS BIGINT) AS n_pairs
             |FROM p GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val srcs = docs.select(col("doc_id"), col("source"))
        graft.dedup.Dedup.jaccardPairs(
            docs, "doc_id", "text", threshold = 0.9,
            strategy = graft.dedup.Dedup.JaccardBitmask,
            bitmaskMaxSets = 100000L)
          .select("doc_a", "doc_b")
          .join(broadcast(srcs.select(col("doc_id").as("doc_a"),
            col("source").as("sa"))), "doc_a")
          .join(broadcast(srcs.select(col("doc_id").as("doc_b"),
            col("source").as("sb"))), "doc_b")
          .groupBy(least(col("sa"), col("sb")).as("source_a"),
            greatest(col("sa"), col("sb")).as("source_b"))
          .agg(count(lit(1)).as("n_pairs"))
      }),

    // LABEL-CENTROID COSINE matrix: pairwise similarity between
    // per-label embedding centroids — the separability audit run before
    // trusting labels for stratified sampling or eval splits. Centroids
    // come from ONE posexplode + (label, dim) average (map-side
    // combinable, |labels|·dims rows); the pairwise stage joins on the
    // dim key so it is |labels|²·dims — never |vectors|². No arrays are
    // re-materialized: dot and norms are plain aggregates.
    QueryDef(
      "q_centroid_cos",
      Some("""WITH x AS (SELECT label,
             |    unnest(embedding::DOUBLE[]) AS v,
             |    unnest(range(len(embedding))) AS i
             |  FROM embeddings),
             |c AS (SELECT label, i, avg(v) AS v FROM x GROUP BY 1, 2),
             |n AS (SELECT label, sqrt(sum(v * v)) AS nrm FROM c GROUP BY 1),
             |p AS (SELECT a.label AS label_a, b.label AS label_b,
             |    sum(a.v * b.v) AS dot
             |  FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
             |  GROUP BY 1, 2)
             |SELECT label_a, label_b,
             |  round(dot / (x.nrm * y.nrm), 4) AS cos
             |FROM p JOIN n x ON x.label = label_a
             |JOIN n y ON y.label = label_b""".stripMargin),
      (s, dir) => {
        val x = Tables.t(s, dir, "embeddings")
          .select(col("label"), posexplode(col("embedding")).as(Seq("i", "v")))
          .select(col("label"), col("i"), col("v").cast("double").as("v"))
        val c = x.groupBy("label", "i").agg(avg("v").as("v"))
        val n = c.groupBy("label").agg(sqrt(sum(col("v") * col("v"))).as("nrm"))
        val a = c.select(col("label").as("label_a"), col("i"), col("v").as("va"))
        val b = c.select(col("label").as("label_b"), col("i"), col("v").as("vb"))
        a.join(b, Seq("i")).filter(col("label_a") < col("label_b"))
          .groupBy("label_a", "label_b")
          .agg(sum(col("va") * col("vb")).as("dot"))
          .join(n.select(col("label").as("label_a"), col("nrm").as("na")), "label_a")
          .join(n.select(col("label").as("label_b"), col("nrm").as("nb")), "label_b")
          .select(col("label_a"), col("label_b"),
            round(col("dot") / (col("na") * col("nb")), 4).as("cos"))
      }),

    // ROW-LEVEL TABLE DIFF between two snapshots (the data-diff audit
    // behind every backfill review): one full-outer join on the key →
    // added / removed / changed status plus the exact changed-column
    // list, unchanged rows dropped. The two snapshots are derived
    // deterministically from orders (v2 drops key%5, adds back key%7,
    // re-prices key%3 via INTEGER cents·11÷10, flips status on key%4) so
    // the diff exercises every branch; money stays in integer cents
    // end-to-end. One co-partitioned shuffle — the plan a 100 TB diff
    // needs (both sides hash by key; no broadcast of a full snapshot).
    QueryDef(
      "q_table_diff",
      Some("""WITH v1 AS (SELECT o_orderkey AS k, o_orderstatus AS st,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
             |    o_custkey AS cust
             |  FROM orders WHERE o_orderkey % 7 <> 0),
             |v2 AS (SELECT o_orderkey AS k,
             |    CASE WHEN o_orderkey % 4 = 0 THEN 'X' ELSE o_orderstatus
             |      END AS st,
             |    CASE WHEN o_orderkey % 3 = 0
             |      THEN CAST(round(o_totalprice * 100, 0) AS BIGINT) * 11 // 10
             |      ELSE CAST(round(o_totalprice * 100, 0) AS BIGINT)
             |      END AS cents,
             |    o_custkey AS cust
             |  FROM orders WHERE o_orderkey % 5 <> 0),
             |j AS (SELECT coalesce(v1.k, v2.k) AS o_orderkey,
             |    v1.k AS k1, v2.k AS k2, v1.st AS st1, v2.st AS st2,
             |    v1.cents AS c1, v2.cents AS c2,
             |    v1.cust AS u1, v2.cust AS u2
             |  FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k)
             |SELECT o_orderkey,
             |  CASE WHEN k1 IS NULL THEN 'added'
             |    WHEN k2 IS NULL THEN 'removed'
             |    ELSE 'changed' END AS status,
             |  CASE WHEN k1 IS NULL OR k2 IS NULL THEN ''
             |    ELSE concat_ws(',',
             |      CASE WHEN st1 <> st2 THEN 'o_orderstatus' END,
             |      CASE WHEN c1 <> c2 THEN 'price_cents' END,
             |      CASE WHEN u1 <> u2 THEN 'o_custkey' END) END AS changed_cols
             |FROM j
             |WHERE k1 IS NULL OR k2 IS NULL
             |  OR st1 <> st2 OR c1 <> c2 OR u1 <> u2""".stripMargin),
      (s, dir) => {
        val o = Tables.t(s, dir, "orders")
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
            round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
            col("o_custkey").as("cust"))
        val v1 = o.filter(col("k") % 7 =!= 0)
        val v2 = o.filter(col("k") % 5 =!= 0)
          .select(col("k"),
            when(col("k") % 4 === 0, "X").otherwise(col("st")).as("st"),
            when(col("k") % 3 === 0, expr("cents * 11 div 10"))
              .otherwise(col("cents")).as("cents"),
            col("cust"))
        val j = v1.as("a").join(v2.as("b"), col("a.k") === col("b.k"),
          "full_outer")
        val changed = concat_ws(",",
          when(col("a.st") =!= col("b.st"), "o_orderstatus"),
          when(col("a.cents") =!= col("b.cents"), "price_cents"),
          when(col("a.cust") =!= col("b.cust"), "o_custkey"))
        j.select(coalesce(col("a.k"), col("b.k")).as("o_orderkey"),
            when(col("a.k").isNull, "added")
              .when(col("b.k").isNull, "removed")
              .otherwise("changed").as("status"),
            when(col("a.k").isNull || col("b.k").isNull, "")
              .otherwise(changed).as("changed_cols"),
            col("a.k").as("k1"), col("b.k").as("k2"),
            col("a.st").as("st1"), col("b.st").as("st2"),
            col("a.cents").as("c1"), col("b.cents").as("c2"),
            col("a.cust").as("u1"), col("b.cust").as("u2"))
          .filter(col("k1").isNull || col("k2").isNull ||
            col("st1") =!= col("st2") || col("c1") =!= col("c2") ||
            col("u1") =!= col("u2"))
          .select("o_orderkey", "status", "changed_cols")
      }),

    // VOCABULARY COVERAGE TABLE: top-k tokens by frequency with each
    // prefix's cumulative corpus share — the tokenizer-design table
    // ("how big a vocab covers 95%"). Corpus-wide counts first; the
    // rank window runs on the |vocab| table only.
    QueryDef(
      "q_vocab_coverage",
      Some("""WITH tok AS (SELECT unnest(regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
             |    AS w FROM documents),
             |f AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok
             |  WHERE w <> '' GROUP BY 1),
             |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM f),
             |r AS (SELECT w, c,
             |    CAST(row_number() OVER (ORDER BY c DESC, w) AS INT) AS k,
             |    CAST(sum(c) OVER (ORDER BY c DESC, w
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM f)
             |SELECT r.k, r.w AS token, r.c,
             |  round(r.c / CAST(t.n AS DOUBLE), 4) AS share,
             |  round(r.cum / CAST(t.n AS DOUBLE), 4) AS cum_share
             |FROM r, t""".stripMargin),
      (s, dir) => {
        val f = Tables.t(s, dir, "documents")
          .select(explode(split(graft.dedup.Dedup.normalized(col("text")),
            " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("c"))
        val t = f.agg(sum("c").as("n"))
        // vocab is corpus-growing, so rank + cumulative count both run on
        // ops.PrefixSum's range-partitioned scan — one shared ranged pass,
        // no empty-partition-spec window (r9 advice)
        val r = graft.ops.PrefixSum.runningTotals(
          f, Seq(col("c").desc, col("w")),
          Seq(lit(1L) -> "k", col("c") -> "cum"))
        r.crossJoin(broadcast(t))
          .select(col("k").cast("int").as("k"), col("w").as("token"),
            col("c"),
            round(col("c") / col("n").cast("double"), 4).as("share"),
            round(col("cum") / col("n").cast("double"), 4).as("cum_share"))
      }),

    // CORPUS DATA CARD: the one-row datasheet a governance review reads
    // before a corpus ships — sizes, vocabulary, source/language
    // diversity (Shannon entropy of the lang mix), exact-duplicate
    // rate, and token-length distribution (mean + exact median). Every
    // number is a one-pass aggregate composition of gates that exist
    // individually; this row is the artifact.
    QueryDef(
      "q_data_card",
      Some("""WITH d AS (SELECT doc_id, source, lang,
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t,
             |    len(regexp_split_to_array(lower(trim(regexp_replace(
             |      text, '\s+', ' ', 'g'))), ' ')) AS toks
             |  FROM documents),
             |lm AS (SELECT -sum((c / CAST(n AS DOUBLE))
             |      * log2(c / CAST(n AS DOUBLE))) AS lang_entropy
             |  FROM (SELECT lang, CAST(count(*) AS BIGINT) AS c,
             |      (SELECT count(*) FROM d) AS n
             |    FROM d GROUP BY 1)),
             |v AS (SELECT count(DISTINCT w) AS vocab FROM (
             |  SELECT unnest(regexp_split_to_array(t, ' ')) AS w FROM d)
             |  WHERE w <> ''),
             |s AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(toks) AS BIGINT) AS total_tokens,
             |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             |    CAST(count(DISTINCT t) AS BIGINT) AS n_unique_texts,
             |    round(avg(toks), 2) AS mean_tokens,
             |    round(quantile_cont(toks, 0.5), 1) AS p50_tokens
             |  FROM d)
             |SELECT s.n_docs, s.total_tokens, v.vocab, s.n_sources,
             |  s.n_langs,
             |  round(1 - s.n_unique_texts / CAST(s.n_docs AS DOUBLE), 4)
             |    AS dup_rate,
             |  round(lm.lang_entropy, 4) AS lang_entropy,
             |  s.mean_tokens, s.p50_tokens
             |FROM s, v, lm""".stripMargin),
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("source"), col("lang"),
            graft.dedup.Dedup.normalized(col("text")).as("t"))
          .withColumn("toks", size(split(col("t"), " ")))
          .graftCheckpoint() // five aggregate consumers below
        val lm = d.groupBy("lang").agg(count(lit(1)).as("c"))
          .crossJoin(broadcast(d.agg(count(lit(1)).as("n"))))
          .agg((-sum((col("c") / col("n").cast("double"))
            * log2(col("c") / col("n").cast("double")))).as("lang_entropy"))
        val v = d.select(explode(split(col("t"), " ")).as("w"))
          .filter(col("w") =!= "")
          .agg(countDistinct("w").as("vocab"))
        val med = graft.ops.Quantiles.groupQuantiles(
            d.withColumn("g", lit(1)), "g", "toks", Seq("p50" -> 0.5))
          .select(round(col("p50"), 1).as("p50_tokens"))
        val sdf = d.agg(count(lit(1)).as("n_docs"),
          sum("toks").cast("long").as("total_tokens"),
          countDistinct("source").as("n_sources"),
          countDistinct("lang").as("n_langs"),
          countDistinct("t").as("n_unique_texts"),
          round(avg("toks"), 2).as("mean_tokens"))
        sdf.crossJoin(broadcast(v)).crossJoin(broadcast(lm))
          .crossJoin(broadcast(med))
          .select(col("n_docs"), col("total_tokens"), col("vocab"),
            col("n_sources"), col("n_langs"),
            round(lit(1) - col("n_unique_texts") / col("n_docs")
              .cast("double"), 4).as("dup_rate"),
            round(col("lang_entropy"), 4).as("lang_entropy"),
            col("mean_tokens"), col("p50_tokens"))
      }),

    // BENFORD'S-LAW first-digit audit of order totals — the fraud/
    // fabrication screen auditors run on money columns. The digit comes
    // from the INTEGER-cents decimal string (both engines format
    // integers identically), never from log10 of a float whose
    // power-of-ten boundary could round differently; expected shares are
    // log10(1+1/d). One scan, 9-row frame, χ² via the same grid-safe
    // Σ form as q_chi_square.
    QueryDef(
      "q_benford",
      Some("""WITH d AS (SELECT CAST(substr(CAST(CAST(round(
             |      o_totalprice * 100, 0) AS BIGINT) AS VARCHAR), 1, 1)
             |    AS BIGINT) AS digit
             |  FROM orders WHERE o_totalprice > 0),
             |o AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
             |  FROM d GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM o),
             |s AS (SELECT o.digit, o.n,
             |    o.n / CAST(t.tot AS DOUBLE) AS obs,
             |    log10(1 + 1.0 / o.digit) AS exp
             |  FROM o, t),
             |x AS (SELECT sum((obs - exp) * (obs - exp) / exp)
             |    * (SELECT tot FROM t) AS chi2 FROM s)
             |SELECT s.digit, s.n, round(s.obs, 4) AS obs_share,
             |  round(s.exp, 4) AS benford_share,
             |  round(x.chi2, 2) AS chi2
             |FROM s, x""".stripMargin),
      (s, dir) => {
        val d = Tables.t(s, dir, "orders")
          .filter(col("o_totalprice") > 0)
          .select(substring(round(col("o_totalprice") * 100, 0)
            .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
        val o = d.groupBy("digit").agg(count(lit(1)).as("n"))
        val t = o.agg(sum("n").as("tot"))
        val sdf = o.crossJoin(broadcast(t))
          .withColumn("obs", col("n") / col("tot").cast("double"))
          .withColumn("exp", log10(lit(1) + lit(1.0) / col("digit")))
        val x = sdf.agg((sum((col("obs") - col("exp"))
          * (col("obs") - col("exp")) / col("exp"))
          * first("tot")).as("chi2"))
        sdf.crossJoin(broadcast(x))
          .select(col("digit"), col("n"), round(col("obs"), 4)
            .as("obs_share"),
            round(col("exp"), 4).as("benford_share"),
            round(col("chi2"), 2).as("chi2"))
      }),

    // DIFFERENTIALLY-PRIVATE counts with REPRODUCIBLE Laplace noise:
    // u ~ Uniform(−½,½) derived from the sha60 of the key (so any engine
    // replays the same draw), inverse-CDF'd into Laplace(1/ε) and added
    // to the per-type counts — the release mechanism a data-clean-room
    // demo needs, with the noise pinned for test determinism. ε = 1,
    // sensitivity 1 (event-level). One aggregate, |types| frame.
    QueryDef(
      "q_dp_counts",
      Some(s"""WITH c AS (SELECT event_type,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1),
             |u AS (SELECT event_type, n,
             |    ${graft.expressions.Hashing.sha60Sql(
                     "event_type || ':dp'")} /
             |      1152921504606846976.0 - 0.5 AS u
             |  FROM c)
             |SELECT event_type, n,
             |  round(n + CASE WHEN u >= 0 THEN -1.0 ELSE 1.0 END
             |    * ln(greatest(1e-12, 1 - 2 * abs(u))), 2) AS noisy_n,
             |  CAST(1.0 AS DOUBLE) AS epsilon
             |FROM u""".stripMargin),
      (s, dir) => {
        val c = Tables.t(s, dir, "events")
          .groupBy("event_type").agg(count(lit(1)).as("n"))
        val u = graft.expressions.Hashing
          .sha60(concat(col("event_type"), lit(":dp")))
          ./(lit(1152921504606846976.0)).minus(lit(0.5))
        c.withColumn("u", u)
          .select(col("event_type"), col("n"),
            round(col("n") + when(col("u") >= 0, lit(-1.0)).otherwise(lit(1.0))
              * log(greatest(lit(1e-12), lit(1) - lit(2) * abs(col("u")))), 2)
              .as("noisy_n"),
            lit(1.0).as("epsilon"))
      })
  )
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.dedup.Dedup
import graft.ops.Sampling
import graft.text.{Bpe, Dsir, NgramLm, Redact, Tfidf}
import graft.Materialize._

/** Corpus analytics round 3: TF-IDF, n-gram census, char-n-gram Jaccard,
  * deterministic split assignment, PII scrubbing. All row-local or
  * two-aggregation shapes; every oracle recomputes the identical scalar
  * expression trees in DuckDB.
  */
object TextQueries {

  val defs: Seq[QueryDef] = Seq(

    // TEMPERATURE-based mixture sampling — the multilingual/domain
    // rebalancing step (mT5/XLM-R style): keep rate (n_min/n_d)^(1-α)
    // with α = 0.5 down-samples large domains so kept counts end up
    // ∝ n_d^α — the head flattens, the smallest domain keeps everything.
    // Realized per row by a deterministic sha-bucket acceptance test —
    // reproducible on any engine, stable under re-runs and
    // repartitioning, never rand(). keep ⟺ bucket/10⁶ < sqrt(n_min/n_d)
    // is evaluated in PURE INTEGER form (bucket²·n_d < n_min·10¹²) so no
    // libm sqrt/pow ulp can flip a boundary row cross-engine. Overflow
    // bound: n·10¹² < 2⁶³ ⇒ per-domain counts up to ~9.2·10⁶ at this
    // bucket width; larger corpora narrow the bucket space. The skewed
    // domain assignment (least(doc_id % 10, 4)) gives one domain 6× the
    // mass so the acceptance test actually fires on the fixture.
    QueryDef(
      "q_temperature_sample",
      Some("""WITH d AS (SELECT doc_id, least(doc_id % 10, 4) AS domain
             |  FROM documents),
             |c AS (SELECT domain, count(*) AS n FROM d GROUP BY domain),
             |m AS (SELECT min(n) AS mn FROM c)
             |SELECT d.doc_id, d.domain,
             |  ('0x' || substr(sha256(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
             |      % 1000000
             |    * (('0x' || substr(sha256(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
             |      % 1000000)
             |    * c.n < m.mn * 1000000000000 AS keep
             |FROM d JOIN c USING (domain) CROSS JOIN m""".stripMargin),
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), least(col("doc_id") % 10, lit(4)).as("domain"))
        val counts = d.groupBy("domain").agg(count(lit(1)).as("n"))
        val mn = counts.agg(min(col("n")).as("mn"))
        val bucket = graft.expressions.Hashing.sha60(col("doc_id")) % 1000000
        d.join(broadcast(counts), Seq("domain"))
          .crossJoin(broadcast(mn))
          .select(col("doc_id"), col("domain"),
            (bucket * bucket * col("n") < col("mn") * 1000000000000L).as("keep"))
      }),

    // Bigram LM PERPLEXITY scoring — the CCNet/Gopher quality filter: train
    // a bigram model on the corpus itself (counts + add-one smoothing),
    // score every document's mean negative log2 bigram probability. All
    // counts are integers and V rides along as a broadcast 1-row aggregate
    // (never a driver scalar), so the only float work is the final
    // log2((c2+1)/(c1+V)) — round(4) absorbs last-ulp libm differences.
    // Plan: two aggregates over the pair table + two joins back + one
    // per-doc agg; every join key is a token string. <2-token docs score
    // NULL with n_bigrams = 0.
    QueryDef(
      "q_lm_perplexity",
      Some("""WITH d AS (SELECT doc_id, regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |  FROM documents),
             |p AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
             |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM d)),
             |bg AS (SELECT w1, w2, count(*) AS c2 FROM p GROUP BY w1, w2),
             |ug AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM bg GROUP BY w1),
             |v AS (SELECT count(DISTINCT t) AS v FROM
             |  (SELECT unnest(toks) AS t FROM d)),
             |sc AS (SELECT p.doc_id, count(*) AS n_bigrams,
             |    round(avg(-log2((bg.c2 + 1.0) / (ug.c1 + v.v))), 4) AS avg_nll_bits
             |  FROM p JOIN bg USING (w1, w2) JOIN ug USING (w1) CROSS JOIN v
             |  GROUP BY p.doc_id)
             |SELECT d.doc_id, COALESCE(sc.n_bigrams, 0) AS n_bigrams,
             |  sc.avg_nll_bits
             |FROM d LEFT JOIN sc USING (doc_id)""".stripMargin),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
          .select(col("doc_id"), split(Dedup.normalized(col("text")), " ").as("__toks"))
        val pairs = docs.filter(size(col("__toks")) >= 2)
          .select(col("doc_id"), explode(transform(
            sequence(lit(1), size(col("__toks")) - 1),
            i => struct(element_at(col("__toks"), i).as("w1"),
              element_at(col("__toks"), i + 1).as("w2")))).as("pr"))
          .select(col("doc_id"), col("pr.w1").as("w1"), col("pr.w2").as("w2"))
        val bg = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        val ug = bg.groupBy("w1").agg(sum(col("c2")).as("c1"))
        val vdf = docs.select(explode(col("__toks")).as("t"))
          .agg(countDistinct(col("t")).as("v"))
        val scored = pairs
          .join(bg, Seq("w1", "w2")).join(ug, Seq("w1"))
          .crossJoin(broadcast(vdf))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            round(avg(-log2((col("c2") + lit(1.0)) / (col("c1") + col("v")))), 4)
              .as("avg_nll_bits"))
        docs.select("doc_id").join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            col("avg_nll_bits"))
      }),

    // Training-sequence PACKING (concat-and-chunk): documents concatenated
    // in doc_id order and split into fixed 512-token sequences — each doc
    // reports its global token offset and the first/last sequence it lands
    // in. The global cumulative sum uses ops.PrefixSum's two-phase scan
    // (range partition → per-partition window + broadcast offsets), NOT a
    // global Window.orderBy — the single-task sort that dies at 100 TB
    // (PlanSpec asserts no empty-partition-spec window). The oracle uses
    // the plain global window DuckDB can afford at fixture scale: the
    // result is partitioning-independent by construction.
    QueryDef(
      "q_pack_sequences",
      Some("""WITH d AS (SELECT doc_id,
             |    len(regexp_split_to_array(
             |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS n_tokens
             |  FROM documents),
             |c AS (SELECT doc_id, n_tokens,
             |    sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM d)
             |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(cum - n_tokens AS BIGINT) AS tok_start,
             |  CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_first,
             |  CAST((cum - 1) // 512 AS BIGINT) AS seq_last
             |FROM c""".stripMargin),
      (s, dir) => {
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            size(split(Dedup.normalized(col("text")), " "))
              .cast("long").as("n_tokens"))
        graft.ops.PrefixSum.runningTotal(
            d, Seq(col("doc_id")), col("n_tokens"), "cum")
          .select(col("doc_id"), col("n_tokens"),
            (col("cum") - col("n_tokens")).as("tok_start"),
            expr("(cum - n_tokens) div 512").as("seq_first"),
            expr("(cum - 1) div 512").as("seq_last"))
      }),

    // BPE merge LEARNING: the top-16 byte-pair merges from corpus word
    // frequencies. One corpus aggregation builds the word table; the merge
    // loop then runs BATCHED rounds over it — each round one pair-count
    // aggregate + a top-64 collect, keeping the provably-sequential-
    // identical symbol-disjoint prefix (see Bpe.learnBatched) — never
    // touching the corpus again, the property that makes BPE learnable at
    // 100 TB. The oracle replays the ENTIRE loop as 16 generated CTE
    // stages: literal string replace is left-to-right non-overlapping in
    // both engines, which is exactly BPE's greedy application order.
    QueryDef(
      "q_bpe_merges",
      Some(Bpe.mergesOracleSql(16)),
      (s, dir) => Bpe.mergesDf(
        Tables.t(s, dir, "documents"), "text", k = 16)),

    // BPE ENCODE: apply the 16 learned merges to every document — a chain
    // of 16 literal replaces per word, row-local, zero shuffle — and gate
    // per-document word/BPE-token counts. A mis-learned merge, a wrong
    // application order, or an overlap-handling difference flips counts.
    QueryDef(
      "q_bpe_encode",
      Some(Bpe.encodeOracleSql(16)),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        Bpe.encode(docs, "doc_id", "text",
          Bpe.learn(Bpe.wordTable(docs, "text"), 16))
      }),

    // TF-IDF top-3 terms per document (smoothed idf, partitioned window).
    QueryDef(
      "q_tfidf",
      Some("""WITH t AS (SELECT doc_id, unnest(regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
             |  WHERE term <> '' GROUP BY 1, 2),
             |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t
             |  WHERE term <> '' GROUP BY 1),
             |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM t
             |  WHERE term <> ''),
             |s AS (SELECT doc_id, tf.term,
             |    CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
             |    round(tf.tf * ln((nd.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
             |  FROM tf JOIN df USING (term) CROSS JOIN nd)
             |SELECT doc_id, term, tfidf, CAST(rnk AS INT) AS rnk
             |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
             |        ORDER BY tfidf DESC, term) AS rnk FROM s)
             |WHERE rnk <= 3""".stripMargin),
      (s, dir) => Tfidf.topTerms(
          Tables.t(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", k = 3)
        .drop("tf", "df", "n_docs")
        .select("doc_id", "term", "tfidf", "rnk")),

    // CCNet-style corpus-LM perplexity quality score (arXiv:1911.00359):
    // add-k bigram LM trained on the corpus, per-doc ppl from a
    // position-ordered log-prob fold (cross-engine float parity — the
    // q_embed_pool trick). Two linear count passes + one scoring join;
    // the full per-document score column is hash-gated.
    QueryDef(
      "q_ngram_perplexity",
      Some(NgramLm.oracleSql()),
      (s, dir) => NgramLm.bigramPerplexity(
        Tables.t(s, dir, "documents"), "doc_id", "text")),

    // DSIR importance weights (arXiv:2302.03169): hashed-token-bucket
    // log-ratio of a target slice (lang='en') vs the whole corpus —
    // data SELECTION, where perplexity above is data FILTERING. The two
    // ≤B-row count tables broadcast; the per-doc sum folds in position
    // order; the full weight column is hash-gated.
    QueryDef(
      "q_dsir_weights",
      Some(Dsir.oracleSql("lang = 'en'")),
      (s, dir) => Dsir.importanceWeights(
        Tables.t(s, dir, "documents"), "doc_id", "text",
        targetPred = col("lang") === "en")),

    // DSIR selection — the paper's Gumbel top-k resampling step,
    // completed (r16 verdict #3): noise keyed on sha60(doc_id) makes the
    // "random" draw deterministic, so the SELECTED SET hash-gates. k=100
    // binds on the 500-doc sf0.01 fixture (and harder at sf1); the top-k
    // plans as TakeOrderedAndProject, never a global sort.
    QueryDef(
      "q_dsir_select",
      Some(Dsir.selectOracleSql("lang = 'en'", k = 100)),
      (s, dir) => Dsir.select(
        Tables.t(s, dir, "documents"), "doc_id", "text",
        targetPred = col("lang") === "en", k = 100)),

    // Global top-20 word bigrams (TakeOrdered, no full sort).
    QueryDef(
      "q_top_ngrams",
      Some("""WITH d AS (SELECT regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |  FROM documents),
             |b AS (SELECT unnest(list_transform(range(1, len(toks)),
             |    i -> toks[i] || ' ' || toks[i + 1])) AS bigram FROM d)
             |SELECT bigram, CAST(count(*) AS BIGINT) AS n
             |FROM b GROUP BY 1
             |ORDER BY n DESC, bigram LIMIT 20""".stripMargin),
      (s, dir) => Tfidf.topBigrams(
        Tables.t(s, dir, "documents").select("text"), "text", k = 20)),

    // Character-trigram Jaccard near-dup pairs on a bounded id slice —
    // the shingle family for text without word boundaries. Pins the
    // prefix-filtered inverted index: the scale-correct plan (candidate
    // equi-join on each doc's rarest ~(1−t)·n grams, exact recall), unlike
    // the bitmask path whose candidate stage is a broadcast crossJoin —
    // fine at ≤2000 docs, quadratic past that. The naive full inverted
    // join on this degenerate 377-gram vocabulary measured ~27M join
    // rows; the prefix index cuts that to the rare-gram rows only.
    QueryDef(
      "q_ngram_jaccard",
      Some("""WITH n AS (SELECT doc_id,
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
             |  FROM documents WHERE doc_id < 300),
             |g AS (SELECT doc_id, list_distinct(list_transform(
             |    range(1, length(t) - 1), i -> substr(t, i, 3))) AS gs FROM n)
             |SELECT doc_a, doc_b, round(j, 4) AS jaccard
             |FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    len(list_intersect(a.gs, b.gs))::DOUBLE
             |      / len(list_distinct(a.gs || b.gs)) AS j
             |  FROM g a JOIN g b ON a.doc_id < b.doc_id)
             |WHERE j >= 0.8""".stripMargin),
      (s, dir) => Dedup.jaccardPairsFeatures(
        Dedup.charNgramSets(
            Tables.t(s, dir, "documents").filter(col("doc_id") < 300)
              // one-file fixture = one partition; shingling is the
              // row-local hot loop, so spread it first
              .repartition(s.sparkContext.defaultParallelism),
            "doc_id", "text", n = 3)
          // explode_outer: plain explode triggers InferFiltersFromGenerate,
          // which duplicates the whole gram expression into a pre-shuffle
          // filter (measured 1.7 s/pass of pure recompute); the outer
          // variant infers nothing — drop the null rows on the attribute
          .select(col("doc_id"), explode_outer(col("grams")).as("word"))
          .filter(col("word").isNotNull),
        threshold = 0.8, strategy = Dedup.JaccardInverted)),

    // Deterministic 80/10/10 train/val/test assignment by sha-derived
    // bucket — reproducible on any engine, any partitioning.
    QueryDef(
      "q_split_sample",
      Some("""SELECT doc_id, CAST(b AS INT) AS bucket,
             |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM (SELECT doc_id,
             |  ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
             |FROM documents)""".stripMargin),
      (s, dir) => Sampling.hashSplit(
        Tables.t(s, dir, "documents").select("doc_id"), "doc_id")),

    // PII scrubbing. The fixture corpus carries no PII, so the query first
    // derives a deterministic contact-laden variant (same expression both
    // engines), then redacts emails and phone-shaped spans and counts the
    // removals — exercising the scrub on text guaranteed to match.
    QueryDef(
      "q_pii_redact",
      Some("""WITH p AS (SELECT doc_id,
             |    substr(text, 1, 40) || ' contact user' || doc_id ||
             |    '@mail.example or +41 79 ' || (doc_id * 7) AS t
             |  FROM documents),
             |r AS (SELECT doc_id, t,
             |    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             |      '<EMAIL>', 'g') AS no_email
             |  FROM p)
             |SELECT doc_id,
             |  regexp_replace(no_email, '\+?[0-9][0-9 -]{5,}[0-9]', '<PHONE>', 'g')
             |    AS redacted,
             |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             |    + len(regexp_extract_all(no_email, '\+?[0-9][0-9 -]{5,}[0-9]'))
             |    AS INT) AS n_redacted
             |FROM r""".stripMargin),
      (s, dir) => {
        val pii = concat(
          substring(col("text"), 1, 40), lit(" contact user"),
          col("doc_id").cast("string"),
          lit("@mail.example or +41 79 "),
          (col("doc_id") * 7).cast("string"))
        val base = Tables.t(s, dir, "documents")
          .select(col("doc_id"), pii.as("t"))
        val (scrubbed, n) = Redact.scrub(col("t"))
        base.select(col("doc_id"), scrubbed.as("redacted"), n.as("n_redacted"))
      }),

    // Alternating large-star/small-star connected components over char-
    // trigram Jaccard edges — the O(log n)-round contraction (vs the
    // O(diameter) min-label propagation behind q_dedup_resolve), gated on
    // a deliberately NASTY edge set: threshold 0.6 on the doc_id<300 slice
    // yields one dense 164-node component plus isolated pairs, so the
    // query exercises both degree skew and trivial components. Oracle:
    // recursive reachability CTE, min label per node, singletons
    // coalesced to themselves.
    QueryDef(
      "q_cc_star",
      Some("""WITH RECURSIVE
             |n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
             |  FROM documents WHERE doc_id < 300),
             |g AS (SELECT doc_id, list_distinct(list_transform(
             |    range(1, length(t) - 1), i -> substr(t, i, 3))) AS gs FROM n),
             |p AS (SELECT a.doc_id AS s, b.doc_id AS d
             |  FROM g a JOIN g b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.gs, b.gs))::DOUBLE
             |      / len(list_distinct(a.gs || b.gs)) >= 0.6),
             |e AS (SELECT s, d FROM p UNION SELECT d, s FROM p),
             |walk(node, lbl) AS (
             |  SELECT DISTINCT s, s FROM e
             |  UNION
             |  SELECT e.d, walk.lbl FROM walk JOIN e ON e.s = walk.node),
             |cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id
             |  FROM walk GROUP BY node)
             |SELECT dd.doc_id,
             |  coalesce(cc.cluster_id, dd.doc_id) AS cluster_id,
             |  coalesce(cc.cluster_id, dd.doc_id) = dd.doc_id AS is_canonical
             |FROM (SELECT doc_id FROM documents WHERE doc_id < 300) dd
             |LEFT JOIN cc USING (doc_id)""".stripMargin),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents").filter(col("doc_id") < 300)
        val pairs = Dedup.jaccardPairsFeatures(
          Dedup.charNgramSets(
              docs.repartition(s.sparkContext.defaultParallelism),
              "doc_id", "text", n = 3)
            .select(col("doc_id"), explode_outer(col("grams")).as("word"))
            .filter(col("word").isNotNull),
          threshold = 0.6, strategy = Dedup.JaccardInverted)
        val labels = graft.dedup.ConnectedComponents.labels(
          pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
        docs.select("doc_id")
          .join(labels, col("doc_id") === col("node"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
          .withColumn("is_canonical", col("cluster_id") === col("doc_id"))
      }),

    // Okapi BM25 against a fixed query bag — corpus quality-filtering by
    // domain relevance. Selection-free (every doc scored, no top-k
    // boundary); all float constants forced ::DOUBLE in the oracle so both
    // engines run identical IEEE arithmetic, and the 4-decimal round sits
    // ten orders above log-ulp drift.
    QueryDef(
      "q_bm25",
      Some("""WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
             |  FROM documents),
             |tok2 AS (SELECT * FROM tok WHERE term <> ''),
             |dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY 1),
             |st AS (SELECT count(*) AS n_docs,
             |    sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2
             |  WHERE term IN ('join', 'hash', 'customer') GROUP BY 1, 2),
             |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |sc AS (SELECT t.doc_id,
             |    sum(ln(1.0::DOUBLE + (st.n_docs - df.df + 0.5::DOUBLE) / (df.df + 0.5::DOUBLE))
             |      * (t.tf * 2.2::DOUBLE)
             |      / (t.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl.dl / st.avgdl))) AS score
             |  FROM tf t JOIN df USING (term) JOIN dl USING (doc_id)
             |  CROSS JOIN st GROUP BY 1)
             |SELECT d.doc_id, round(coalesce(sc.score, 0.0), 4) AS bm25
             |FROM documents d LEFT JOIN sc USING (doc_id)""".stripMargin),
      (s, dir) => Tfidf.bm25(Tables.t(s, dir, "documents"), "doc_id", "text",
        terms = Seq("join", "hash", "customer"))),

    // Shannon character entropy per document — the gibberish/binary-blob
    // gate of a corpus quality pipeline. Uses the single-log algebraic
    // form H = log2(len) − Σ(n·ln n)/(len·ln 2) on both engines.
    QueryDef(
      "q_char_entropy",
      Some("""WITH n AS (SELECT doc_id,
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
             |  FROM documents),
             |c AS (SELECT doc_id, unnest(regexp_split_to_array(t, '')) AS ch
             |  FROM n WHERE length(t) > 0),
             |g AS (SELECT doc_id, ch, count(*) AS cnt FROM c
             |  WHERE ch <> '' GROUP BY 1, 2),
             |a AS (SELECT doc_id, sum(cnt) AS len,
             |    count(*) AS n_distinct_chars,
             |    sum(cnt * ln(cnt::DOUBLE)) AS nlogn FROM g GROUP BY 1)
             |SELECT doc_id, CAST(n_distinct_chars AS INT) AS n_distinct_chars,
             |  round(ln(len::DOUBLE) / ln(2.0::DOUBLE)
             |    - nlogn / (len * ln(2.0::DOUBLE)), 4) AS entropy_bits
             |FROM a""".stripMargin),
      (s, dir) => graft.text.TextStats.charEntropy(
        Tables.t(s, dir, "documents"), "doc_id", "text")),

    // Fixed-COUNT deterministic uniform sample (k smallest sha60
    // priorities) — physical plan is TakeOrderedAndProject (per-partition
    // k-heaps), never a global sort, so the same query holds at 100 TB.
    QueryDef(
      "q_priority_sample",
      Some("""SELECT doc_id, priority FROM (
             |  SELECT doc_id,
             |    ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS priority
             |  FROM documents)
             |ORDER BY priority, doc_id LIMIT 100""".stripMargin),
      (s, dir) => Sampling.prioritySample(
        Tables.t(s, dir, "documents"), "doc_id", k = 100)
        .select("doc_id", "priority")),

    // Efraimidis–Spirakis weighted sample without replacement (k smallest
    // −ln(u)/w exponential variates, w = n_chars): inclusion ∝ weight,
    // deterministic u from sha60. Selection boundary is float-safe: race
    // keys are spaced ~1e-9 apart (u quantized at 1e-6), nine orders above
    // cross-engine ln ulp drift.
    QueryDef(
      "q_weighted_sample",
      Some("""WITH w AS (SELECT doc_id, n_chars,
             |    (('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |      % 1000000 + 1) / 1000000.0::DOUBLE AS u
             |  FROM documents)
             |SELECT doc_id, n_chars FROM w
             |ORDER BY -ln(u) / n_chars, doc_id LIMIT 120""".stripMargin),
      (s, dir) => Sampling.weightedSample(
        Tables.t(s, dir, "documents"), "doc_id", "n_chars", k = 120)
        .select("doc_id", "n_chars")),

    // Pairwise Jensen–Shannon divergence between per-source unigram
    // distributions — the corpus drift monitor. Exclusive-term mass folded
    // in algebraically so the term join stays INNER (see DistShift);
    // identical algebra on both engines, 4-decimal round over ~1e-16
    // accumulation noise.
    QueryDef(
      "q_js_divergence",
      Some("""WITH tok AS (SELECT source AS cls, unnest(regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
             |  FROM documents),
             |t2 AS (SELECT * FROM tok WHERE term <> ''),
             |ct AS (SELECT cls, term, count(*) AS n_ct FROM t2 GROUP BY 1, 2),
             |tot AS (SELECT cls, sum(n_ct) AS n_c FROM ct GROUP BY 1),
             |p AS (SELECT ct.cls, ct.term, ct.n_ct::DOUBLE / tot.n_c AS p
             |  FROM ct JOIN tot USING (cls)),
             |j AS (SELECT a.cls AS cls_a, b.cls AS cls_b,
             |    sum(a.p * ln(2.0::DOUBLE * a.p / (a.p + b.p))) AS sa,
             |    sum(b.p * ln(2.0::DOUBLE * b.p / (a.p + b.p))) AS sb,
             |    sum(a.p) AS ma, sum(b.p) AS mb
             |  FROM p a JOIN p b ON a.term = b.term AND a.cls < b.cls
             |  GROUP BY 1, 2)
             |SELECT cls_a, cls_b,
             |  round(0.5::DOUBLE * (sa + sb) / ln(2.0::DOUBLE)
             |    + 0.5::DOUBLE * (2.0::DOUBLE - ma - mb), 4) AS js_bits
             |FROM j""".stripMargin),
      (s, dir) => graft.text.DistShift.jsDivergence(
        Tables.t(s, dir, "documents"), "source", "text")),

    // Document-level PMI collocations: integer counts inside one ln, so
    // the only cross-engine float question is a single log ulp under a
    // 4-decimal round. minCount=20 keeps the gated output to genuinely
    // co-occurring pairs.
    QueryDef(
      "q_word_pmi",
      Some("""WITH w AS (SELECT DISTINCT doc_id, word FROM (
             |    SELECT doc_id, unnest(list_distinct(regexp_split_to_array(
             |      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))) AS word
             |    FROM documents) WHERE word <> ''),
             |dfc AS (SELECT word, count(*) AS df FROM w GROUP BY 1),
             |topv AS (SELECT word, df FROM dfc ORDER BY df DESC, word LIMIT 1000),
             |wv AS (SELECT w.doc_id, w.word, topv.df FROM w JOIN topv USING (word)),
             |nn AS (SELECT count(*) AS n FROM documents),
             |p AS (SELECT a.word AS w1, b.word AS w2,
             |    a.df AS df1, b.df AS df2, count(*) AS n_ab
             |  FROM wv a JOIN wv b ON a.doc_id = b.doc_id AND a.word < b.word
             |  GROUP BY 1, 2, 3, 4)
             |SELECT w1, w2, n_ab,
             |  round(ln((n_ab * nn.n)::DOUBLE / (df1 * df2)), 4) AS pmi
             |FROM p CROSS JOIN nn WHERE n_ab >= 20""".stripMargin),
      (s, dir) => graft.text.Cooccur.pmiPairs(
        Tables.t(s, dir, "documents"), "doc_id", "text", minCount = 20L)),

    // Weighted sparse-cosine similarity pairs (all-pairs over tf-idf
    // vectors) on the bounded doc_id<300 slice — the inverted-join shape
    // whose cost lives in near-zero-weight stopword terms; see
    // Tfidf.sparseCosinePairs for the at-scale df-cap note. Weights are
    // pre-rounded to 6 dp by Tfidf.score, so both engines aggregate
    // identical doubles.
    QueryDef(
      "q_sparse_cosine",
      Some("""WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
             |  FROM documents WHERE doc_id < 300),
             |t2 AS (SELECT * FROM tok WHERE term <> ''),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM t2 GROUP BY 1, 2),
             |dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM t2 GROUP BY 1),
             |nn AS (SELECT count(DISTINCT doc_id) AS n FROM t2),
             |w AS (SELECT doc_id, term,
             |    round(tf * ln((nn.n + 1.0::DOUBLE) / (dfc.df + 1.0::DOUBLE)), 6) AS w
             |  FROM tf JOIN dfc USING (term) CROSS JOIN nn),
             |norms AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
             |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    sum(a.w * b.w) AS dot
             |  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b, round(dot / (x.nrm * y.nrm), 4) AS cos
             |FROM p JOIN norms x ON x.doc_id = doc_a
             |JOIN norms y ON y.doc_id = doc_b
             |WHERE dot / (x.nrm * y.nrm) >= 0.9""".stripMargin),
      (s, dir) => Tfidf.sparseCosinePairs(
        Tables.t(s, dir, "documents").filter(col("doc_id") < 300),
        "doc_id", "text", threshold = 0.9)),

    // TRIANGLE COUNT over the near-dup graph (clustering-coefficient
    // denominator; how clique-like are the dup clusters?). DEGREE-ORIENTED
    // wedge join (the at-scale algorithm, now the gated default): orient
    // each undirected edge low-degree→high-degree (ties by id) — the
    // orientation is acyclic, so every triangle has exactly ONE vertex
    // with both edges outgoing and is counted exactly once at that
    // vertex. Wedge fan-out is then bounded by the SMALLER endpoint's
    // out-degree (≤ O(√m) on any graph), which is what survives a
    // power-law web graph where id-ordered wedges explode at hub nodes.
    // Costs one extra degree aggregate + broadcastable join; the count is
    // identical (TraversalSpec pins parity vs the id-ordered wedge join).
    QueryDef(
      "q_triangles",
      Some("""WITH n AS (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
             |  FROM documents WHERE doc_id < 300),
             |g AS (SELECT doc_id, list_distinct(list_transform(
             |    range(1, length(t) - 1), i -> substr(t, i, 3))) AS gs FROM n),
             |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             |  FROM g a JOIN g b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.gs, b.gs))::DOUBLE
             |      / len(list_distinct(a.gs || b.gs)) >= 0.6)
             |SELECT CAST(count(*) AS BIGINT) AS n_triangles
             |FROM p x JOIN p y ON x.doc_b = y.doc_a
             |JOIN p z ON z.doc_a = x.doc_a AND z.doc_b = y.doc_b""".stripMargin),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents").filter(col("doc_id") < 300)
        val e = Dedup.jaccardPairsFeatures(
          Dedup.charNgramSets(
              docs.repartition(s.sparkContext.defaultParallelism),
              "doc_id", "text", n = 3)
            .select(col("doc_id"), explode_outer(col("grams")).as("word"))
            .filter(col("word").isNotNull),
          threshold = 0.6, strategy = Dedup.JaccardInverted)
          .select("doc_a", "doc_b").graftCheckpoint()
        graft.ops.Triangles.count(e)
      }),

    // Unicode NFC normalization (native codegen expression wrapping the
    // JDK's Normalizer — Spark ships no builtin): composed vs decomposed
    // accents diverge every content hash and shingle downstream, so the
    // canonicalization must run BEFORE dedup. The fixture text is ASCII,
    // so each row gets a deterministic decomposed suffix (e + U+0301,
    // twice); the oracle's nfc_normalize must land on byte-identical
    // composed text — compared via sha256, the strictest possible gate.
    QueryDef(
      "q_nfc_normalize",
      Some("""WITH p AS (SELECT doc_id,
             |    substr(text, 1, 30) || 'e' || chr(769) || 'cafe' || chr(769) AS t
             |  FROM documents)
             |SELECT doc_id, CAST(length(t) AS INT) AS len_raw,
             |  CAST(length(nfc_normalize(t)) AS INT) AS len_nfc,
             |  sha256(nfc_normalize(t)) AS nfc_hash
             |FROM p""".stripMargin),
      (s, dir) => {
        // NB: Spark's chr() is ASCII-mod-256 (chr(769) → U+0001), unlike
        // DuckDB's codepoint chr — the combining acute must be a literal
        val t = concat(substring(col("text"), 1, 30),
          lit("e\u0301cafe\u0301"))
        Tables.t(s, dir, "documents")
          .select(col("doc_id"), t.as("__t"))
          .select(col("doc_id"),
            length(col("__t")).as("len_raw"),
            length(graft.expressions.NfcNormalize.nfc(s, col("__t"))).as("len_nfc"),
            sha2(graft.expressions.NfcNormalize.nfc(s, col("__t")), 256).as("nfc_hash"))
      }),

    // DEDUP-METHOD EVALUATION inside the engine: recall/precision of the
    // cheap SimHash banded pass against exact word-Jaccard ≥0.9 ground
    // truth — the measurement that justifies running the sketch first and
    // the exact pass only on survivors. Both member pipelines are already
    // independently gated (q_simhash_neardup, q_dedup_resolve); this
    // gates their INTERSECTION arithmetic.
    QueryDef(
      "q_dedup_recall",
      Some("""WITH w AS (SELECT doc_id, list_distinct(regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS ws
             |  FROM documents),
             |ep AS (SELECT a.doc_id AS da, b.doc_id AS db
             |  FROM w a JOIN w b ON a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.ws, b.ws))::DOUBLE
             |      / len(list_distinct(a.ws || b.ws)) >= 0.9),
             |tok AS (SELECT doc_id, list_transform(
             |    regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
             |    t -> ('0x' || substr(sha256(t), 1, 15))::BIGINT) AS hs
             |  FROM documents),
             |sh AS (SELECT doc_id,
             |  CAST(list_sum(list_transform(range(0, 60), b ->
             |    CASE WHEN list_sum(list_transform(hs, h ->
             |           CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
             |         THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
             |  FROM tok),
             |sp AS (SELECT a.doc_id AS da, b.doc_id AS db
             |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
             |ne AS (SELECT count(*) AS n_exact FROM ep),
             |ns AS (SELECT count(*) AS n_simhash FROM sp),
             |nb AS (SELECT count(*) AS n_both
             |  FROM ep JOIN sp ON ep.da = sp.da AND ep.db = sp.db)
             |SELECT CAST(n_exact AS BIGINT) AS n_exact,
             |  CAST(n_simhash AS BIGINT) AS n_simhash,
             |  CAST(n_both AS BIGINT) AS n_both,
             |  round(n_both::DOUBLE / n_exact, 4) AS recall,
             |  round(n_both::DOUBLE / n_simhash, 4) AS precision
             |FROM ne, ns, nb""".stripMargin),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.9,
            strategy = Dedup.JaccardBitmask, bitmaskMaxSets = 100000L)
          .select("doc_a", "doc_b")
        val sim = Dedup.simhashNearDup(s,
            docs.repartition(s.sparkContext.defaultParallelism),
            "doc_id", "text", maxHamming = 3)
          .select("doc_a", "doc_b")
        val ne = exact.agg(count(lit(1)).as("n_exact"))
        val ns = sim.agg(count(lit(1)).as("n_simhash"))
        val nb = exact.join(sim, Seq("doc_a", "doc_b"))
          .agg(count(lit(1)).as("n_both"))
        ne.crossJoin(ns).crossJoin(nb)
          .select(col("n_exact"), col("n_simhash"), col("n_both"),
            round(col("n_both").cast("double") / col("n_exact"), 4).as("recall"),
            round(col("n_both").cast("double") / col("n_simhash"), 4).as("precision"))
      }),

    // ZIPF-LAW FIT of the corpus token frequency distribution: OLS of
    // ln(freq) on ln(rank) — the exponent (~ −1 for natural text) is a
    // one-number corpus-health diagnostic (template/generated text bends
    // it). Frequencies aggregate corpus-wide FIRST; the rank window and
    // the regression then run on the |vocab| table only. All regression
    // moments are plain partial-aggregable sums.
    QueryDef(
      "q_zipf_fit",
      Some("""WITH tok AS (SELECT unnest(regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '))
             |    AS w
             |  FROM documents),
             |f AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok
             |  WHERE w <> '' GROUP BY 1),
             |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk
             |  FROM f),
             |p AS (SELECT ln(rk) AS x, ln(c) AS y FROM r),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n, avg(x) AS mx,
             |    avg(y) AS my,
             |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
             |  FROM p)
             |SELECT n AS vocab,
             |  round((sxy - n * mx * my) / (sxx - n * mx * mx), 4)
             |    AS zipf_exponent,
             |  round(my - (sxy - n * mx * my) / (sxx - n * mx * mx) * mx, 4)
             |    AS intercept,
             |  round(pow(sxy - n * mx * my, 2)
             |    / ((sxx - n * mx * mx) * (syy - n * my * my)), 4) AS r2
             |FROM m""".stripMargin),
      (s, dir) => {
        val tok = Tables.t(s, dir, "documents")
          .select(explode(split(graft.dedup.Dedup.normalized(col("text")),
            " ")).as("w"))
          .filter(col("w") =!= "")
        val f = tok.groupBy("w").agg(count(lit(1)).as("c"))
        // vocab is corpus-growing (heavy-tailed), so the rank runs on
        // ops.PrefixSum's range-partitioned running count instead of an
        // empty-partition-spec window (r9 advice)
        val r = graft.ops.PrefixSum.runningTotal(
          f, Seq(col("c").desc, col("w")), lit(1L), "rk")
        val p = r.select(log(col("rk")).as("x"), log(col("c")).as("y"))
        val m = p.agg(count(lit(1)).as("n"), avg("x").as("mx"),
          avg("y").as("my"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        val slope = (col("sxy") - col("n") * col("mx") * col("my")) /
          (col("sxx") - col("n") * col("mx") * col("mx"))
        m.select(col("n").as("vocab"),
          round(slope, 4).as("zipf_exponent"),
          round(col("my") - slope * col("mx"), 4).as("intercept"),
          round(pow(col("sxy") - col("n") * col("mx") * col("my"), 2)
            / ((col("sxx") - col("n") * col("mx") * col("mx"))
              * (col("syy") - col("n") * col("my") * col("my"))), 4)
            .as("r2"))
      }),

    // TOP-P (NUCLEUS) TRUNCATION of bigram successor distributions —
    // the inference-side vocabulary carve applied as a data op: for the
    // 20 most frequent context words, keep the smallest count-ordered
    // successor prefix reaching ≥90% of the context's mass and
    // renormalize. The threshold compare stays in INTEGER counts
    // (10·cum_before < 9·total — no float boundary can flip membership);
    // successor windows are per-context, vocab-bounded. Output is the
    // truncated, renormalized distribution table an efficient sampler
    // consumes.
    QueryDef(
      "q_top_p",
      Some("""WITH d AS (SELECT regexp_split_to_array(lower(trim(
             |    regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |  FROM documents),
             |p AS (SELECT toks[i] AS w1, toks[i+1] AS w2
             |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM d)
             |  WHERE toks[i] <> '' AND toks[i+1] <> ''),
             |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
             |  FROM p GROUP BY 1, 2),
             |t AS (SELECT w1, CAST(sum(c) AS BIGINT) AS total
             |  FROM bg GROUP BY 1),
             |top AS (SELECT w1, total FROM t
             |  ORDER BY total DESC, w1 LIMIT 20),
             |r AS (SELECT bg.w1, bg.w2, bg.c, top.total,
             |    CAST(row_number() OVER (PARTITION BY bg.w1
             |      ORDER BY bg.c DESC, bg.w2) AS INT) AS rnk,
             |    CAST(sum(bg.c) OVER (PARTITION BY bg.w1
             |      ORDER BY bg.c DESC, bg.w2 ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS cum
             |  FROM bg JOIN top USING (w1)),
             |k AS (SELECT w1, w2, c, rnk, total,
             |    CAST(sum(c) OVER (PARTITION BY w1) AS BIGINT) AS kept
             |  FROM r WHERE 10 * (cum - c) < 9 * total)
             |SELECT w1, w2, c, rnk,
             |  round(c / CAST(kept AS DOUBLE), 4) AS p_renorm
             |FROM k""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val toks = Tables.t(s, dir, "documents")
          .select(split(graft.dedup.Dedup.normalized(col("text")), " ")
            .as("toks"))
        val p = toks
          .select(posexplode(col("toks")).as(Seq("i", "w1")), col("toks"))
          .filter(col("w1") =!= "")
          .withColumn("w2", try_element_at(col("toks"), col("i") + 2))
          .filter(col("w2").isNotNull && col("w2") =!= "")
        val bg = p.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        val t = bg.groupBy("w1").agg(sum("c").as("total"))
        val top = t.orderBy(col("total").desc, col("w1")).limit(20)
        val wOrd = Window.partitionBy("w1")
          .orderBy(col("c").desc, col("w2"))
        val r = bg.join(broadcast(top), "w1")
          .withColumn("rnk", row_number().over(wOrd))
          .withColumn("cum",
            sum("c").over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
          .filter(lit(10) * (col("cum") - col("c")) < lit(9) * col("total"))
        val kept = r.withColumn("kept",
          sum("c").over(Window.partitionBy("w1")))
        kept.select(col("w1"), col("w2"), col("c"), col("rnk"),
          round(col("c") / col("kept").cast("double"), 4).as("p_renorm"))
      }),

    // ENTROPY RATE of the corpus bigram model: conditional entropy
    // H(W₂|W₁) = −Σ p(w₁) Σ p(w₂|w₁) log₂ p(w₂|w₁) against the unigram
    // entropy, with redundancy 1 − H_cond/H_uni — the information-theory
    // one-liner behind "how compressible/templated is this corpus". Two
    // aggregates over the bigram table; counts exact, only the final
    // log-sums are float.
    QueryDef(
      "q_entropy_rate",
      Some("""WITH d AS (SELECT regexp_split_to_array(lower(trim(
             |    regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |  FROM documents),
             |p AS (SELECT toks[i] AS w1, toks[i+1] AS w2
             |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM d)
             |  WHERE toks[i] <> '' AND toks[i+1] <> ''),
             |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
             |  FROM p GROUP BY 1, 2),
             |t AS (SELECT w1, CAST(sum(c) AS BIGINT) AS tw
             |  FROM bg GROUP BY 1),
             |n AS (SELECT CAST(sum(tw) AS BIGINT) AS n FROM t),
             |hc AS (SELECT -sum((bg.c / CAST(n.n AS DOUBLE))
             |    * log2(bg.c / CAST(t.tw AS DOUBLE))) AS h_cond
             |  FROM bg JOIN t USING (w1), n),
             |hu AS (SELECT -sum((tw / CAST(n.n AS DOUBLE))
             |    * log2(tw / CAST(n.n AS DOUBLE))) AS h_uni
             |  FROM t, n)
             |SELECT n.n AS n_bigrams,
             |  CAST((SELECT count(*) FROM t) AS BIGINT) AS vocab,
             |  round(hu.h_uni, 4) AS h_unigram,
             |  round(hc.h_cond, 4) AS h_cond,
             |  round(1 - hc.h_cond / hu.h_uni, 4) AS redundancy
             |FROM n, hc, hu""".stripMargin),
      (s, dir) => {
        val toks = Tables.t(s, dir, "documents")
          .select(split(graft.dedup.Dedup.normalized(col("text")), " ")
            .as("toks"))
        val p = toks
          .select(posexplode(col("toks")).as(Seq("i", "w1")), col("toks"))
          .filter(col("w1") =!= "")
          .withColumn("w2", try_element_at(col("toks"), col("i") + 2))
          .filter(col("w2").isNotNull && col("w2") =!= "")
        val bg = p.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        val t = bg.groupBy("w1").agg(sum("c").as("tw"))
        val n = t.agg(sum("tw").as("n"))
        val hc = bg.join(broadcast(t), "w1").crossJoin(broadcast(n))
          .agg((-sum((col("c") / col("n").cast("double"))
            * log2(col("c") / col("tw").cast("double")))).as("h_cond"))
        val hu = t.crossJoin(broadcast(n))
          .agg((-sum((col("tw") / col("n").cast("double"))
            * log2(col("tw") / col("n").cast("double")))).as("h_uni"),
            count(lit(1)).as("vocab"))
        n.crossJoin(broadcast(hc)).crossJoin(broadcast(hu))
          .select(col("n").as("n_bigrams"), col("vocab"),
            round(col("h_uni"), 4).as("h_unigram"),
            round(col("h_cond"), 4).as("h_cond"),
            round(lit(1) - col("h_cond") / col("h_uni"), 4)
              .as("redundancy"))
      }),

    // BEAM-SEARCH DECODE over the bigram model (beam width 3, 3 steps
    // from the most frequent token): the decode-side counterpart of
    // q_top_p — each step expands every live beam with all successors
    // and keeps the global top-3 by cumulative ln-probability
    // (path-string tie-break). Beam frames are |beam|×|successors|
    // rows (≤ ~100); the only corpus-sized stage is the one bigram
    // aggregate. Equal count-ratios give bit-equal logprobs on any
    // engine, so the ranking cannot straddle a libm ulp.
    QueryDef(
      "q_beam_search",
      Some("""WITH d AS (SELECT regexp_split_to_array(lower(trim(
             |    regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |  FROM documents),
             |p AS (SELECT toks[i] AS w1, toks[i+1] AS w2
             |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM d)
             |  WHERE toks[i] <> '' AND toks[i+1] <> ''),
             |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
             |  FROM p GROUP BY 1, 2),
             |t AS (SELECT w1, CAST(sum(c) AS BIGINT) AS tw
             |  FROM bg GROUP BY 1),
             |lp AS (SELECT bg.w1, bg.w2,
             |    ln(bg.c / CAST(t.tw AS DOUBLE)) AS lp
             |  FROM bg JOIN t USING (w1)),
             |b0 AS (SELECT w1 AS path, w1 AS tail, 0.0 AS score
             |  FROM t ORDER BY tw DESC, w1 LIMIT 1),
             |b1 AS (SELECT b0.path || ' ' || lp.w2 AS path, lp.w2 AS tail,
             |    b0.score + lp.lp AS score
             |  FROM b0 JOIN lp ON lp.w1 = b0.tail
             |  ORDER BY score DESC, path LIMIT 3),
             |b2 AS (SELECT b1.path || ' ' || lp.w2 AS path, lp.w2 AS tail,
             |    b1.score + lp.lp AS score
             |  FROM b1 JOIN lp ON lp.w1 = b1.tail
             |  ORDER BY score DESC, path LIMIT 3),
             |b3 AS (SELECT b2.path || ' ' || lp.w2 AS path, lp.w2 AS tail,
             |    b2.score + lp.lp AS score
             |  FROM b2 JOIN lp ON lp.w1 = b2.tail
             |  ORDER BY score DESC, path LIMIT 3)
             |SELECT CAST(row_number() OVER (ORDER BY score DESC, path)
             |    AS INT) AS rank,
             |  path, round(score, 4) AS logprob
             |FROM b3""".stripMargin),
      (s, dir) => {
        val toks = Tables.t(s, dir, "documents")
          .select(split(graft.dedup.Dedup.normalized(col("text")), " ")
            .as("toks"))
        val p = toks
          .select(posexplode(col("toks")).as(Seq("i", "w1")), col("toks"))
          .filter(col("w1") =!= "")
          .withColumn("w2", try_element_at(col("toks"), col("i") + 2))
          .filter(col("w2").isNotNull && col("w2") =!= "")
        val bg = p.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        val t = bg.groupBy("w1").agg(sum("c").as("tw"))
        val lp = bg.join(t, "w1")
          .select(col("w1"), col("w2"),
            log(col("c") / col("tw").cast("double")).as("lp"))
          .graftCheckpoint() // probed by all 3 beam steps
        var beams = t.orderBy(col("tw").desc, col("w1")).limit(1)
          .select(col("w1").as("path"), col("w1").as("tail"),
            lit(0.0).as("score"))
        for (_ <- 1 to 3) {
          beams = beams
            .join(lp.withColumnRenamed("w1", "bw1"),
              col("bw1") === col("tail"))
            .select(concat(col("path"), lit(" "), col("w2")).as("path"),
              col("w2").as("tail"), (col("score") + col("lp")).as("score"))
            .orderBy(col("score").desc, col("path")).limit(3)
        }
        import org.apache.spark.sql.expressions.Window
        beams.withColumn("rank",
            row_number().over(Window.orderBy(col("score").desc, col("path"))))
          .select(col("rank"), col("path"),
            round(col("score"), 4).as("logprob"))
      }),

    // PHRASE SEARCH over a POSITIONAL inverted index — the search-engine
    // primitive: build (token, doc, pos) postings, pick the corpus's most
    // frequent bigram (deterministic top-1), and resolve the phrase by
    // intersecting the two tokens' posting lists on (doc, pos+1)
    // adjacency. At scale the postings ARE the index (shuffle on token,
    // skew-bounded by df); no document text is rescanned to answer the
    // query. Output: per matching doc, the phrase and its occurrence
    // count.
    QueryDef(
      "q_phrase_search",
      Some("""WITH tok AS (SELECT doc_id, i - 1 AS pos, toks[i] AS w
             |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(
             |      regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |    FROM documents),
             |    unnest(range(1, len(toks) + 1)) AS t(i)
             |  WHERE toks[i] <> ''),
             |bg AS (SELECT a.w AS w1, b.w AS w2, count(*) AS c
             |  FROM tok a JOIN tok b
             |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
             |  GROUP BY 1, 2),
             |top AS (SELECT w1, w2 FROM bg
             |  ORDER BY c DESC, w1, w2 LIMIT 1),
             |hits AS (SELECT a.doc_id, top.w1, top.w2,
             |    CAST(count(*) AS BIGINT) AS n_occ
             |  FROM tok a JOIN top ON a.w = top.w1
             |  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
             |    AND b.w = top.w2
             |  GROUP BY 1, 2, 3)
             |SELECT doc_id, w1, w2, n_occ FROM hits""".stripMargin),
      (s, dir) => {
        val tok = Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(split(graft.dedup.Dedup.normalized(col("text")),
              " ")).as(Seq("pos", "w")))
          .filter(col("w") =!= "")
          .graftCheckpoint() // the postings table, consumed three times
        val bg = tok.as("a")
          .join(tok.as("b"),
            col("b.doc_id") === col("a.doc_id") &&
              col("b.pos") === col("a.pos") + 1)
          .groupBy(col("a.w").as("w1"), col("b.w").as("w2"))
          .agg(count(lit(1)).as("c"))
        val top = bg.orderBy(col("c").desc, col("w1"), col("w2")).limit(1)
          .select("w1", "w2")
        tok.as("a").join(broadcast(top), col("a.w") === col("w1"))
          .join(tok.as("b"),
            col("b.doc_id") === col("a.doc_id") &&
              col("b.pos") === col("a.pos") + 1 && col("b.w") === col("w2"))
          .groupBy(col("a.doc_id").as("doc_id"), col("w1"), col("w2"))
          .agg(count(lit(1)).as("n_occ"))
      }),

    // TEXTRANK keyword scores: weighted PageRank over the word
    // co-occurrence (bigram) graph — the unsupervised keyword-extraction
    // classic (Mihalcea & Tarau 2004), here at corpus grain. Edges are
    // symmetrized bigram counts; rank mass flows proportional to edge
    // weight over weighted degree (r' = 0.15/N + 0.85·Σ r·w/wdeg), 5
    // iterations like q_pagerank. Scale shape: ONE corpus scan builds the
    // bigram table, then every iteration joins only the vocab-bounded
    // (node, rank) relation against the vocab²-bounded edge list —
    // corpus size never re-enters the loop. The oracle replays the same
    // iterations in a recursive CTE.
    QueryDef(
      "q_textrank",
      Some("""WITH RECURSIVE d AS (SELECT regexp_split_to_array(lower(trim(
             |    regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |  FROM documents),
             |p AS (SELECT toks[i] AS w1, toks[i+1] AS w2
             |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM d)
             |  WHERE toks[i] <> '' AND toks[i+1] <> ''),
             |bg0 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
             |  FROM p GROUP BY 1, 2),
             |e AS (SELECT a, b, CAST(sum(c) AS BIGINT) AS w FROM (
             |    SELECT w1 AS a, w2 AS b, c FROM bg0
             |    UNION ALL SELECT w2, w1, c FROM bg0)
             |  GROUP BY 1, 2),
             |deg AS (SELECT a, CAST(sum(w) AS BIGINT) AS d FROM e
             |  GROUP BY 1),
             |nn AS (SELECT count(*)::DOUBLE AS n FROM deg),
             |pr(iter, node, r) AS (
             |  SELECT 0, a, 1.0::DOUBLE / n FROM deg CROSS JOIN nn
             |  UNION ALL
             |  SELECT pr.iter + 1, e.b,
             |    0.15::DOUBLE / nn.n + 0.85::DOUBLE * sum(pr.r * e.w / deg.d)
             |  FROM pr JOIN e ON e.a = pr.node
             |  JOIN deg ON deg.a = e.a
             |  CROSS JOIN nn
             |  WHERE pr.iter < 5
             |  GROUP BY pr.iter, e.b, nn.n)
             |SELECT node AS word, round(r, 6) AS rank
             |FROM pr WHERE iter = 5""".stripMargin),
      (s, dir) => {
        val toks = Tables.t(s, dir, "documents")
          .select(split(graft.dedup.Dedup.normalized(col("text")), " ")
            .as("toks"))
        val p = toks
          .select(posexplode(col("toks")).as(Seq("i", "w1")), col("toks"))
          .filter(col("w1") =!= "")
          .withColumn("w2", try_element_at(col("toks"), col("i") + 2))
          .filter(col("w2").isNotNull && col("w2") =!= "")
        val bg0 = p.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        val e = bg0.select(col("w1").as("a"), col("w2").as("b"), col("c"))
          .unionByName(bg0.select(col("w2").as("a"), col("w1").as("b"),
            col("c")))
          .groupBy("a", "b").agg(sum("c").as("w"))
          .graftCheckpoint() // probed by deg and all 5 iterations
        val deg = e.groupBy("a").agg(sum("w").as("d"))
        val n = deg.count().toDouble
        var r = deg.select(col("a").as("node"),
          (lit(1.0) / lit(n)).as("r"))
        for (_ <- 1 to 5) {
          r = r.join(e, col("node") === col("a"))
            .join(deg, "a")
            .groupBy(col("b"))
            .agg(sum(col("r") * col("w") / col("d")).as("s"))
            .select(col("b").as("node"),
              (lit(0.15) / lit(n) + lit(0.85) * col("s")).as("r"))
            .graftCheckpoint()
        }
        r.select(col("node").as("word"), round(col("r"), 6).as("rank"))
      }),

    // KEYNESS (Dunning log-likelihood ratio G²): which words
    // distinguish one corpus slice from another — the corpus-linguistics
    // standard behind "what changed in this week's crawl" and
    // contamination triage, sharper than raw frequency ratios on rare
    // words. Slices are the deterministic doc_id parity halves;
    // G² = 2·Σ O·ln(O/E) against the pooled expectation, with the
    // 0·ln0 = 0 convention, and the enriched side decided by the EXACT
    // integer cross-product a·N_B vs b·N_A (no float tie risk). One
    // corpus scan → vocab-bounded contingency table; only the final
    // logs are float.
    QueryDef(
      "q_keyness",
      Some("""WITH t AS (SELECT doc_id % 2 AS sl,
             |    unnest(regexp_split_to_array(lower(trim(
             |      regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS w
             |  FROM documents),
             |t2 AS (SELECT sl, w FROM t WHERE w <> ''),
             |c AS (SELECT w,
             |    CAST(sum(CASE WHEN sl = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS a,
             |    CAST(sum(CASE WHEN sl = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS b
             |  FROM t2 GROUP BY 1),
             |nt AS (SELECT CAST(sum(a) AS BIGINT) AS na,
             |    CAST(sum(b) AS BIGINT) AS nb FROM c),
             |g AS (SELECT c.w, c.a, c.b,
             |    2 * (CASE WHEN c.a > 0 THEN c.a * ln(c.a
             |        / (CAST(nt.na AS DOUBLE) * (c.a + c.b)
             |          / (nt.na + nt.nb))) ELSE 0 END
             |      + CASE WHEN c.b > 0 THEN c.b * ln(c.b
             |        / (CAST(nt.nb AS DOUBLE) * (c.a + c.b)
             |          / (nt.na + nt.nb))) ELSE 0 END) AS g2,
             |    CASE WHEN c.a * nt.nb > c.b * nt.na THEN 'A'
             |      WHEN c.a * nt.nb < c.b * nt.na THEN 'B'
             |      ELSE 'tie' END AS enriched
             |  FROM c CROSS JOIN nt)
             |SELECT w, a, b, round(g2, 4) AS g2, enriched
             |FROM g""".stripMargin),
      (s, dir) => {
        val t = Tables.t(s, dir, "documents")
          .select((col("doc_id") % 2).as("sl"),
            explode(split(graft.dedup.Dedup.normalized(col("text")), " "))
              .as("w"))
          .filter(col("w") =!= "")
        val c = t.groupBy("w").agg(
          sum(when(col("sl") === 0, 1).otherwise(0)).as("a"),
          sum(when(col("sl") === 1, 1).otherwise(0)).as("b"))
          .graftCheckpoint() // feeds the totals AND the scored rows
        val nt = c.agg(sum("a").as("na"), sum("b").as("nb"))
        val scored = c.crossJoin(broadcast(nt))
        val g2 = lit(2) * (
          when(col("a") > 0, col("a") * log(col("a")
            / (col("na").cast("double") * (col("a") + col("b"))
              / (col("na") + col("nb"))))).otherwise(lit(0.0))
          + when(col("b") > 0, col("b") * log(col("b")
            / (col("nb").cast("double") * (col("a") + col("b"))
              / (col("na") + col("nb"))))).otherwise(lit(0.0)))
        scored.select(col("w"), col("a"), col("b"),
          round(g2, 4).as("g2"),
          when(col("a") * col("nb") > col("b") * col("na"), "A")
            .when(col("a") * col("nb") < col("b") * col("na"), "B")
            .otherwise("tie").as("enriched"))
      }),

    // KNESER-NEY smoothed bigram probabilities (absolute discount
    // D=0.75, interpolated form): P(w₂|w₁) = max(c−D,0)/c(w₁·) +
    // (D/c(w₁·))·N₁₊(w₁·)·P_cont(w₂) with the continuation prior
    // P_cont(w₂) = N₁₊(·w₂)/|bigram types| — the LM-smoothing classic
    // the unsmoothed q_lm_perplexity family deliberately omits. Scale
    // shape: one corpus scan builds the bigram table; every factor after
    // that (totals, fan-out/continuation type counts, the 1-row type
    // total) is vocab-bounded, and the final probability is a pure
    // scalar expression over one equi-joined row per bigram. Written
    // with IDENTICAL float operation order in both engines.
    QueryDef(
      "q_kneser_ney",
      Some("""WITH d AS (SELECT regexp_split_to_array(lower(trim(
             |    regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |  FROM documents),
             |p AS (SELECT toks[i] AS w1, toks[i+1] AS w2
             |  FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM d)
             |  WHERE toks[i] <> '' AND toks[i+1] <> ''),
             |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
             |  FROM p GROUP BY 1, 2),
             |t AS (SELECT w1, CAST(sum(c) AS BIGINT) AS tw,
             |    CAST(count(*) AS BIGINT) AS n1f
             |  FROM bg GROUP BY 1),
             |cb AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1b
             |  FROM bg GROUP BY 1),
             |b AS (SELECT CAST(count(*) AS BIGINT) AS bb FROM bg)
             |SELECT bg.w1, bg.w2, bg.c,
             |  round(greatest(bg.c - 0.75::DOUBLE, 0.0::DOUBLE) / t.tw
             |    + (0.75::DOUBLE / t.tw) * t.n1f
             |      * (cb.n1b / CAST(b.bb AS DOUBLE)), 6) AS p_kn
             |FROM bg JOIN t USING (w1) JOIN cb USING (w2)
             |CROSS JOIN b""".stripMargin),
      (s, dir) => {
        val toks = Tables.t(s, dir, "documents")
          .select(split(graft.dedup.Dedup.normalized(col("text")), " ")
            .as("toks"))
        val p = toks
          .select(posexplode(col("toks")).as(Seq("i", "w1")), col("toks"))
          .filter(col("w1") =!= "")
          .withColumn("w2", try_element_at(col("toks"), col("i") + 2))
          .filter(col("w2").isNotNull && col("w2") =!= "")
        val bg = p.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
          .graftCheckpoint() // feeds t, cb, b and the final projection
        val t = bg.groupBy("w1")
          .agg(sum("c").as("tw"), count(lit(1)).as("n1f"))
        val cb = bg.groupBy("w2").agg(count(lit(1)).as("n1b"))
        val b = bg.agg(count(lit(1)).as("bb"))
        bg.join(t, "w1").join(cb, "w2")
          .crossJoin(broadcast(b))
          .select(col("w1"), col("w2"), col("c"),
            round(greatest(col("c") - lit(0.75), lit(0.0)) / col("tw")
              + (lit(0.75) / col("tw")) * col("n1f")
                * (col("n1b") / col("bb").cast("double")), 6).as("p_kn"))
      })
  )
}

package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.Materialize._
import graft.dedup.{Dedup, IncrementalDedup, MinHashLSH}
import graft.expressions.{Hashing, SimHash64}
import graft.multimodal.Binary
import graft.sim.{Knn, SemDedup}
import graft.text.{Fingerprint, LangId, TextStats}

/** Training-data pipeline operators (the north-star extensions in
  * BASELINE.json): dedup, similarity, text analysis, multimodal plumbing.
  * Oracle SQL provided wherever DuckDB can express the computation with
  * bit-identical scalar expression trees; approximate/sketch pipelines are
  * verified by ScalaTest recall/consistency checks instead.
  */
object ExtensionQueries {

  private val ivfPqOracle: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
                 |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS centroid_id,
                 |    v AS cvec
                 |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
                 |asn AS (SELECT vec_id, centroid_id FROM (
                 |    SELECT e.vec_id, c.centroid_id,
                 |      row_number() OVER (PARTITION BY e.vec_id
                 |        ORDER BY list_dot_product(e.v, c.cvec) DESC, c.centroid_id) AS rn
                 |    FROM e CROSS JOIN cent c) WHERE rn = 1),
                 |seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code, v
                 |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
                 |grid AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS s),
                 |cb AS (SELECT grid.s, seeds.code, seeds.v[grid.s*8+1 : grid.s*8+8] AS cvec
                 |  FROM seeds CROSS JOIN grid),
                 |sub AS (SELECT e.vec_id, grid.s, e.v[grid.s*8+1 : grid.s*8+8] AS sv
                 |  FROM e CROSS JOIN grid),
                 |enc AS (SELECT vec_id, s, code FROM (
                 |  SELECT sub.vec_id, sub.s, cb.code,
                 |    row_number() OVER (PARTITION BY sub.vec_id, sub.s
                 |      ORDER BY list_dot_product(cb.cvec, cb.cvec)
                 |        - 2.0 * list_dot_product(sub.sv, cb.cvec), cb.code) AS rn
                 |  FROM sub JOIN cb ON cb.s = sub.s) WHERE rn = 1),
                 |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
                 |probes AS (SELECT query_id, centroid_id FROM (
                 |    SELECT q.query_id, c.centroid_id,
                 |      row_number() OVER (PARTITION BY q.query_id
                 |        ORDER BY list_dot_product(q.qv, c.cvec) DESC, c.centroid_id) AS pr
                 |    FROM q CROSS JOIN cent c) WHERE pr <= 2),
                 |lut AS (SELECT qs.vec_id AS query_id, cb.s, cb.code,
                 |    list_dot_product(qs.sv, cb.cvec) AS part
                 |  FROM (SELECT * FROM sub WHERE vec_id < 20) qs
                 |  JOIN cb ON cb.s = qs.s),
                 |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
                 |  FROM probes p JOIN asn a
                 |  ON a.centroid_id = p.centroid_id AND a.vec_id <> p.query_id),
                 |sc AS (SELECT c.query_id, c.neighbor_id,
                 |    list_reduce(list(l.part ORDER BY l.s), (a, b) -> a + b) AS score
                 |  FROM cand c JOIN enc ON enc.vec_id = c.neighbor_id
                 |  JOIN lut l ON l.query_id = c.query_id AND l.s = enc.s AND l.code = enc.code
                 |  GROUP BY 1, 2)
                 |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id,
                 |  round(score, 4) AS adc_score
                 |FROM (SELECT query_id, neighbor_id, score,
                 |    row_number() OVER (PARTITION BY query_id
                 |      ORDER BY score DESC, neighbor_id) AS rn
                 |  FROM sc) WHERE rn <= 3""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Text quality features — identical expression trees both engines.
    QueryDef(
      "q_text_stats",
      Some("""SELECT doc_id,
             |  length(text) AS n_chars_calc,
             |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             |  CAST(len(regexp_extract_all(text, '\p{L}+|\p{N}+|[^\s\p{L}\p{N}]')) AS BIGINT) AS n_lex_tokens,
             |  round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text), 4) AS alpha_ratio,
             |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|a)\b')) AS BIGINT) AS n_stopwords,
             |  round(length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
             |        / len(regexp_split_to_array(trim(text), '\s+')), 4) AS mean_token_len
             |FROM documents""".stripMargin),
      (s, dir) => TextStats.features(
          Tables.t(s, dir, "documents").select("doc_id", "text"))
        .drop("text")),

    // Composite quality score (crude pre-filter before expensive dedup).
    QueryDef(
      "q_quality_score",
      Some("""SELECT doc_id, round(
             |  least(n_tokens / 50.0, 1.0) * 0.4 + alpha_ratio * 0.4 +
             |  least(n_stopwords / 5.0, 1.0) * 0.2, 4) AS quality
             |FROM (SELECT doc_id,
             |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             |  round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text), 4) AS alpha_ratio,
             |  len(regexp_extract_all(lower(text), '\b(the|and|of|to|a)\b')) AS n_stopwords
             |FROM documents)""".stripMargin),
      (s, dir) => TextStats.qualityScore(
          Tables.t(s, dir, "documents").select("doc_id", "text"))
        .select("doc_id", "quality")),

    // END-TO-END corpus cleanse — the composition the individual operators
    // exist for, under ONE oracle: quality pre-filter (the crude cheap
    // pass) → exact-dedup to canonical docs (min doc_id per content hash,
    // among survivors) → exact repeated-substring REMOVAL over the
    // survivor corpus (ExactSubstr.cleanText, the Lee-et-al. heavy pass —
    // dedup-first on purpose: exact copies would otherwise make every one
    // of their substrings "repeated") → deterministic 95/5 train/val split
    // (sha-bucket on doc_id — reproducible on any engine, stable under
    // reruns and repartitioning). clean_hash pins the full cleaned string
    // at constant output width; a drift anywhere in the four stages — the
    // scoring arithmetic, the canonical choice, a span boundary, the
    // bucket — turns the row red.
    QueryDef(
      "q_corpus_cleanse",
      Some("""WITH q0 AS (SELECT doc_id, text, round(
             |    least(len(regexp_split_to_array(trim(text), '\s+')) / 50.0, 1.0) * 0.4 +
             |    round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text), 4) * 0.4 +
             |    least(len(regexp_extract_all(lower(text), '\b(the|and|of|to|a)\b')) / 5.0, 1.0) * 0.2,
             |    4) AS quality
             |  FROM documents),
             |k AS (SELECT doc_id, text, quality FROM q0 WHERE quality >= 0.5),
             |c AS (SELECT min(doc_id) AS doc_id FROM k
             |  GROUP BY sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))),
             |surv AS (SELECT k.doc_id, k.text, k.quality FROM k JOIN c USING (doc_id)),
             |n AS (SELECT doc_id, quality,
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
             |  FROM surv),
             |p AS (SELECT doc_id, pos, substr(t, pos, 50) AS g
             |  FROM (SELECT doc_id, t, unnest(range(1, length(t) - 49 + 1)) AS pos
             |    FROM n WHERE length(t) >= 50)),
             |dg AS (SELECT g FROM p GROUP BY g HAVING count(*) > 1),
             |dp AS (SELECT doc_id, pos FROM p JOIN dg USING (g)),
             |st AS (SELECT doc_id, pos,
             |    CASE WHEN max(pos + 49) OVER (PARTITION BY doc_id ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             |      OR pos > max(pos + 49) OVER (PARTITION BY doc_id ORDER BY pos
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
             |      THEN 1 ELSE 0 END AS strt
             |  FROM dp),
             |isl AS (SELECT doc_id, pos,
             |    sum(strt) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS UNBOUNDED PRECEDING) AS span
             |  FROM st),
             |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 49 AS e
             |  FROM isl GROUP BY doc_id, span),
             |ch AS (SELECT doc_id, t, unnest(range(1, length(t) + 1)) AS cp FROM n),
             |keep AS (SELECT c2.doc_id, c2.cp, substr(c2.t, c2.cp, 1) AS c1
             |  FROM ch c2 WHERE NOT EXISTS (SELECT 1 FROM sp
             |    WHERE sp.doc_id = c2.doc_id AND c2.cp BETWEEN sp.s AND sp.e)),
             |cl AS (SELECT doc_id, string_agg(c1, '' ORDER BY cp) AS clean_text
             |  FROM keep GROUP BY doc_id),
             |fin AS (SELECT n.doc_id, n.quality,
             |    coalesce(cl.clean_text,
             |      CASE WHEN EXISTS (SELECT 1 FROM sp WHERE sp.doc_id = n.doc_id)
             |        THEN '' ELSE n.t END) AS ct
             |  FROM n LEFT JOIN cl ON cl.doc_id = n.doc_id)
             |SELECT doc_id, quality,
             |  CAST(length(ct) AS INT) AS clean_len,
             |  sha256(ct) AS clean_hash,
             |  CASE WHEN ('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
             |    % 100 < 95 THEN 'train' ELSE 'val' END AS split
             |FROM fin""".stripMargin),
      (s, dir) => {
        val scored = TextStats.qualityScore(
          Tables.t(s, dir, "documents").select("doc_id", "text"))
        val kept = scored.filter(col("quality") >= 0.5)
        val canonical = Dedup.exact(kept, "doc_id", "text")
          .select(col("canonical_id").as("doc_id"))
        val surv = kept.join(canonical, Seq("doc_id"))
        val cleaned = graft.dedup.ExactSubstr.cleanText(
          surv, "doc_id", "text", minMatch = 50)
        surv.join(cleaned, Seq("doc_id"))
          .select(col("doc_id"), col("quality"),
            length(col("clean_text")).cast("int").as("clean_len"),
            sha2(col("clean_text"), 256).as("clean_hash"),
            when(Hashing.sha60(col("doc_id")) % 100 < 95, "train")
              .otherwise("val").as("split"))
      }),

    // Exact dedup by normalized content hash.
    QueryDef(
      "q_dedup_exact",
      Some("""SELECT sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
             |  min(doc_id) AS canonical_id, count(*) AS n_dups
             |FROM documents GROUP BY 1""".stripMargin),
      (s, dir) => Dedup.exact(
        Tables.t(s, dir, "documents"), "doc_id", "text")),

    // Exact PARAGRAPH dedup (the C4/Gopher step): lowest-(doc, idx)
    // occurrence of each normalized paragraph survives, every later
    // repetition is dropped. The fixture text is single-line (no blank
    // lines), so the GATE splits on the corpus's most frequent stopword
    // (' the ') to produce a genuinely multi-paragraph, heavily-repeating
    // corpus — the operator's default separator stays '\n\n'. One shuffle
    // on the 256-bit digest + one join back, corpus-linear.
    QueryDef(
      "q_paragraph_dedup",
      Some(graft.dedup.ParagraphDedup.oracleSql(sepRegex = " the ")),
      (s, dir) => graft.dedup.ParagraphDedup.paragraphDedup(
        Tables.t(s, dir, "documents"), "doc_id", "text",
        sepRegex = " the ")),

    // Paragraph REASSEMBLY — the half of the C4 pipeline that ships:
    // kept paragraphs concatenated back (in paragraph order) into the
    // cleaned document. Gated as (n_kept, clean_len, clean_hash) per doc
    // so the full reconstructed text is hash-verified without putting
    // megabytes of text in the gated result. Same fixture separator as
    // q_paragraph_dedup; ' | ' as the visible rejoin separator.
    QueryDef(
      "q_paragraph_reassemble",
      Some(graft.dedup.ParagraphDedup.reassembleOracleSql(
        sepRegex = " the ", joinSep = " | ")),
      (s, dir) => graft.dedup.ParagraphDedup.reassemble(
        Tables.t(s, dir, "documents"), "doc_id", "text",
        sepRegex = " the ", joinSep = " | ")),

    // INCREMENTAL paragraph dedup — the daily 100 TB shape of
    // q_paragraph_dedup: the corpus (doc_id % 10 <> 0) seeds a persistent
    // paragraph-digest→owner index; the day's batch (doc_id % 10 = 0)
    // joins the index and appends only its NEW digests. No corpus
    // re-split, per-batch cost O(batch paragraphs + matched index rows);
    // IncrementalSpec proves a batch re-run is idempotent. The oracle
    // replays the same corpus-first-then-lowest-(doc,idx) owner rule in
    // one rank.
    QueryDef(
      "q_paragraph_dedup_incr",
      Some(graft.dedup.ParagraphDedup.incrOracleSql(
        batchPred = "% 10 = 0", sepRegex = " the ")),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val wh = new graft.tables.Warehouse(s,
          java.nio.file.Files.createTempDirectory("graft-q-pincr").toString)
        graft.dedup.ParagraphDedup.seedIndex(wh, "pd",
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text",
          sepRegex = " the ")
        graft.dedup.ParagraphDedup.processBatch(wh, "pd",
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
          sepRegex = " the ")
      }),

    // SEQUENCED incremental paragraph dedup — the COMPOSITION gate (r18
    // verdict #1): the steady state is a sequence of daily batches, and a
    // single-epoch gate cannot see ownership created by an earlier batch.
    // seedIndex(corpus = doc_id % 10 ∉ {0, 5}) → processBatch(B1 =
    // doc_id % 10 = 5) → processBatch(B2 = doc_id % 10 = 0); B2's
    // verdicts must respect owners B1 created minutes earlier. The oracle
    // replays the whole sequence as one epoch-major rank (ownership is
    // permanent, so corpus < B1 < B2 ordering is exact); the
    // epoch-order-SENSITIVITY half (swapping B1/B2 moves owners) is
    // ParagraphDedupSpec's.
    QueryDef(
      "q_paragraph_dedup_incr2",
      Some(graft.dedup.ParagraphDedup.incrOracleSqlEpochs(
        epochPreds = Seq("% 10 = 5", "% 10 = 0"), sepRegex = " the ")),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val wh = new graft.tables.Warehouse(s,
          java.nio.file.Files.createTempDirectory("graft-q-pincr2").toString)
        graft.dedup.ParagraphDedup.seedIndex(wh, "pd",
          docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5),
          "doc_id", "text", sepRegex = " the ")
        // day-1 verdicts MATERIALIZE to the warehouse before day 2 runs —
        // exactly what Curation.runDay does (r19 verdict #2: holding
        // day-1 checkpoint blocks lazily across day-2's run was the one
        // fault window needing reliable checkpoints; a parquet
        // round-trip has no executor-resident state to lose)
        val v1 = graft.dedup.ParagraphDedup.processBatch(wh, "pd",
          docs.filter(col("doc_id") % 10 === 5), "doc_id", "text",
          sepRegex = " the ").withColumn("epoch", lit(1))
        wh.overwrite("v1", v1)
        val v2 = graft.dedup.ParagraphDedup.processBatch(wh, "pd",
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text",
          sepRegex = " the ").withColumn("epoch", lit(2))
        wh.read("v1").unionByName(v2)
      }),

    // The composed DAILY CURATION PIPELINE (r18 verdict #6): cursor →
    // batch → paragraph-incr → reassemble → idempotent append → cursor
    // advance, run for a bootstrap plus TWO sequenced days (watermarks
    // ⌊max·3/5⌋ and ⌊max·4/5⌋, computed identically in both engines).
    // The gated result is the CLEAN TABLE the pipeline shipped — both
    // days' documents reassembled from index-verdicted paragraphs — so
    // the gate proves the operators compose (day 2 respects owners day 1
    // wrote, the cursor carves exactly the arrivals, the appends land
    // once). The semantic stage needs an embedding column the documents
    // fixture lacks; PipelineSpec runs the full doc+vector composition
    // with hash assertions against the direct operators.
    QueryDef(
      "q_curation_pipeline",
      Some(graft.pipelines.Curation.oracleSql(
        sepRegex = " the ", joinSep = " | ")),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val (w0, w1) = (maxId * 3 / 5, maxId * 4 / 5)
        val root =
          java.nio.file.Files.createTempDirectory("graft-q-curation").toString
        val wh = new graft.tables.Warehouse(s, root)
        val cur = new graft.state.Cursor(s, s"$root/curation.cursor")
        val c = new graft.pipelines.Curation(s, wh, cur, "cur",
          "doc_id", "text", sepRegex = " the ", joinSep = " | ")
        c.bootstrap(docs.filter(col("doc_id") <= w0))
        c.runDay(docs.filter(col("doc_id") <= w1))
        c.runDay(docs)
        c.clean
      }),

    // The FULL doc+vector curation pipeline (r19 verdict #3): same
    // composed daily shape as q_curation_pipeline, plus the SEMANTIC
    // stage — each document carries the embedding of dense vector key
    // doc_id % count(embeddings) (dense rank over vec_id: a bijection
    // onto [0, n) at every scale factor, where the raw scaled vec_ids
    // are replica-strided), and batch documents whose vector duplicates
    // an earlier-id document at cosine >= 0.3 are dropped from the clean
    // table — the SemDeDup curation policy, oracle-replayed through the
    // sequenced cap algebra. The global row_number that builds the dense
    // key is a fixture-construction step (bounded by the embeddings
    // table), not pipeline shape. semCoarseSeedAbove is pinned to MaxValue
    // so the gated plan is the flat seed at every decade the gate runs
    // (the coarse routing is PipelineSpec-asserted against the direct
    // operators; its oracle is q_semantic_dedup_incr_coarse's).
    QueryDef(
      "q_curation_pipeline_sem",
      Some(graft.pipelines.Curation.oracleSqlSem(
        sepRegex = " the ", joinSep = " | ", threshold = 0.3, cap = 8)),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val emb = Tables.t(s, dir, "embeddings")
        // Dense 0-based key over vec_id WITHOUT a global single-partition
        // sort (r21; was row_number over Window.orderBy(vec_id) — the one
        // unbounded "No Partition Defined" window in the suite, a full
        // single-task sort of the embeddings table at every SF): bucket by
        // vec_id range (monotone, so bucket order == vec_id order), rank
        // within each bucket, and offset by the broadcast per-bucket
        // counts. Bit-identical to the global dense rank because vec_ids
        // are unique and buckets partition the id range monotonically.
        // One combined agg replaces the separate count() action.
        val nb = 32L
        val a0 = emb.agg(count(lit(1)), min("vec_id"), max("vec_id")).first()
        val nv = a0.getLong(0)
        val mn = a0.getAs[Number](1).longValue
        val mx = a0.getAs[Number](2).longValue
        val bw = math.max(1L, (mx - mn) / nb + 1)
        val bucketed = emb.select(col("vec_id"), col("embedding"),
          ((col("vec_id") - mn) / bw).cast("long").as("__b"))
        val offsets: Map[Long, Long] = {
          val cnts = bucketed.groupBy("__b").agg(count(lit(1)).as("c"))
            .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
          cnts.map(_._1).zip(cnts.scanLeft(0L)(_ + _._2)).toMap
        }
        // keyed is consumed by all three pipeline stages (bootstrap + two
        // runDay checkpoints): materialize the bucketed rank once
        val keyed = bucketed
          .withColumn("__r", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("__b").orderBy("vec_id")))
          .select(col("embedding"),
            (col("__r") - 1 + element_at(typedlit(offsets), col("__b")))
              .cast("long").as("__vk"))
          .graftCheckpoint()
        val src = docs
          .join(keyed, docs("doc_id") % nv === keyed("__vk"))
          .select("doc_id", "text", "embedding")
        val maxId = docs.agg(max(col("doc_id"))).first().getLong(0)
        val (w0, w1) = (maxId * 3 / 5, maxId * 4 / 5)
        val root =
          java.nio.file.Files.createTempDirectory("graft-q-cursem").toString
        val wh = new graft.tables.Warehouse(s, root)
        val cur = new graft.state.Cursor(s, s"$root/curation.cursor")
        val c = new graft.pipelines.Curation(s, wh, cur, "cur",
          "doc_id", "text", sepRegex = " the ", joinSep = " | ",
          vecCol = Some("embedding"), semThreshold = 0.3, semCap = 8,
          semCoarseSeedAbove = Long.MaxValue)
        c.bootstrap(src.filter(col("doc_id") <= w0))
        c.runDay(src.filter(col("doc_id") <= w1))
        c.runDay(src)
        c.clean
      }),

    // Exact word-set Jaccard pairs — ground truth for the MinHash path.
    // Strategy pinned to BITMASK with an explicit doc cap: the fixture
    // corpus is a 31-word template vocabulary where every word appears in
    // ~78% of documents, so NO candidate pruning (prefix filter, df cap,
    // LSH) can beat all-pairs — measured: prefix-inverted generated 11.3M
    // candidates / ~90 s, single-long popcount all-pairs runs in ~2 s.
    // Auto keeps the scale-safe 2000-doc guard; exceeding it is an
    // explicit, per-call decision like this one.
    QueryDef(
      "q_word_jaccard",
      Some("""WITH w AS (SELECT doc_id,
             |  list_distinct(regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS ws
             |FROM documents)
             |SELECT doc_a, doc_b, round(jaccard, 4) AS jaccard FROM (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    len(list_intersect(a.ws, b.ws))::DOUBLE / len(list_distinct(a.ws || b.ws)) AS jaccard
             |  FROM w a JOIN w b ON a.doc_id < b.doc_id)
             |WHERE jaccard >= 0.9""".stripMargin),
      (s, dir) => Dedup.jaccardPairs(
        Tables.t(s, dir, "documents"), "doc_id", "text", threshold = 0.9,
        strategy = Dedup.JaccardBitmask, bitmaskMaxSets = 100000L)),

    // The SCALE-SAFE word-Jaccard exemplar: the same semantics as
    // q_word_jaccard but under the prefix-filtered inverted index — the
    // plan that ships at 100× (equi-join candidate stage, no crossJoin;
    // PlanSpec asserts it). Two deliberate choices:
    // - NO dfCap: the fixture vocabulary is 31 words of which 30 exceed
    //   any useful cap — measured: dfCap(0.5) keeps only 10 of the 9020
    //   true pairs, so a capped index is NOT exactness-preserving here
    //   (it is on organic corpora with rare words, see ExtensionSpec).
    //   The uncapped prefix filter keeps candidate recall at exactly 1.0.
    // - A deterministic sf-proportional slice (doc_id % 10 = 0): on this
    //   template corpus ~8% of ALL pairs are true near-dups, so any exact
    //   algorithm's output is quadratic and the inverted index degrades to
    //   all-pairs (measured 11.3M candidates full-corpus at sf0.1). The
    //   gate exercises the 100× PLAN; the full-corpus run on a degenerate
    //   vocabulary belongs to the explicitly-bounded bitmask exemplar
    //   above. See q_basket_jaccard for the index pruning at full fixture
    //   scale on an organic feature space.
    QueryDef(
      "q_word_jaccard_scaled",
      Some("""WITH w AS (SELECT doc_id,
             |  list_distinct(regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS ws
             |FROM documents WHERE doc_id % 10 = 0)
             |SELECT doc_a, doc_b, round(jaccard, 4) AS jaccard FROM (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    len(list_intersect(a.ws, b.ws))::DOUBLE / len(list_distinct(a.ws || b.ws)) AS jaccard
             |  FROM w a JOIN w b ON a.doc_id < b.doc_id)
             |WHERE jaccard >= 0.9""".stripMargin),
      (s, dir) => Dedup.jaccardPairs(
        Tables.t(s, dir, "documents").filter(col("doc_id") % 10 === 0),
        "doc_id", "text", threshold = 0.9,
        strategy = Dedup.JaccardInverted)),

    // STRATEGY ROUTING under the oracle: the same slice, but the engine
    // PICKS the physical plan (JaccardAuto's bounded sample probe → the
    // exact ≤maskMaxVocab check → bitmask here; a big-vocab corpus would
    // route to the inverted index, a set-count overflow to the set-level
    // fallback). The r12 sf1 run showed mis-routing is the failure mode
    // that actually bites at scale — this gates that the router's choice
    // is invisible in the RESULT: whatever path Auto takes must
    // hash-match the same exact-Jaccard oracle the pinned gates use.
    QueryDef(
      "q_dedup_auto",
      Some("""WITH w AS (SELECT doc_id,
             |  list_distinct(regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS ws
             |FROM documents WHERE doc_id % 10 = 0)
             |SELECT doc_a, doc_b, round(jaccard, 4) AS jaccard FROM (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    len(list_intersect(a.ws, b.ws))::DOUBLE / len(list_distinct(a.ws || b.ws)) AS jaccard
             |  FROM w a JOIN w b ON a.doc_id < b.doc_id)
             |WHERE jaccard >= 0.9""".stripMargin),
      (s, dir) => Dedup.jaccardPairs(
        Tables.t(s, dir, "documents").filter(col("doc_id") % 10 === 0),
        "doc_id", "text", threshold = 0.9,
        strategy = Dedup.JaccardAuto)),

    // Set-similarity self-join over an ORGANIC high-cardinality feature
    // space: order "baskets" (the distinct part keys of each order) at
    // Jaccard ≥ 0.6 — transaction/cart dedup, the same jaccardPairsFeatures
    // machinery words use. Unlike the 31-word documents fixture, the part
    // vocabulary (2k at sf0.01, 20k at sf0.1) gives every feature a low
    // document frequency (avg ~30), so the prefix-filtered inverted index
    // prunes candidates the way it does on real corpora, at FULL fixture
    // scale, growing with sf. Oracle = exact intersection counts via the
    // same feature join, no list crossJoin.
    QueryDef(
      "q_basket_jaccard",
      Some("""WITH f AS (SELECT DISTINCT l_orderkey AS doc_id, l_partkey AS word FROM lineitem),
             |sz AS (SELECT doc_id, count(*) AS n FROM f GROUP BY 1),
             |i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
             |  FROM f a JOIN f b ON a.word = b.word AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT doc_a, doc_b, round(jaccard, 4) AS jaccard FROM (
             |  SELECT doc_a, doc_b, inter::DOUBLE / (sa.n + sb.n - inter) AS jaccard
             |  FROM i JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b)
             |WHERE jaccard >= 0.6""".stripMargin),
      (s, dir) => Dedup.jaccardPairsFeatures(
        Tables.t(s, dir, "lineitem")
          .select(col("l_orderkey").as("doc_id"), col("l_partkey").as("word"))
          .distinct(),
        threshold = 0.6, strategy = Dedup.JaccardInverted)),

    // Dedup cluster resolution: near-dup pairs → connected components →
    // deterministic canonical keep/drop list. Oracle: recursive reachability
    // CTE over the same exact-Jaccard pairs, min-id per component.
    QueryDef(
      "q_dedup_resolve",
      Some("""WITH RECURSIVE w AS (SELECT doc_id,
             |    list_distinct(regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS ws
             |  FROM documents),
             |pairs AS (SELECT doc_a, doc_b FROM (
             |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |      len(list_intersect(a.ws, b.ws))::DOUBLE / len(list_distinct(a.ws || b.ws)) AS jaccard
             |    FROM w a JOIN w b ON a.doc_id < b.doc_id)
             |  WHERE jaccard >= 0.9),
             |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
             |      UNION SELECT doc_b, doc_a FROM pairs),
             |r(id, lab) AS (
             |  SELECT doc_id, doc_id FROM documents
             |  UNION
             |  SELECT r.id, e.dst FROM r JOIN e ON r.lab = e.src)
             |SELECT id AS doc_id, min(lab) AS canonical_id,
             |  (id = min(lab)) AS keep
             |FROM r GROUP BY id""".stripMargin),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        Dedup.resolveClusters(docs, "doc_id",
          // bitmask pinned for the same degenerate-vocab reason as
          // q_word_jaccard above
          Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.9,
            strategy = Dedup.JaccardBitmask, bitmaskMaxSets = 100000L))
      }),

    // C4-style SEGMENT-LEVEL dedup: the corpus keeps only the FIRST
    // occurrence (min doc_id, then position) of every repeated segment and
    // reassembles each document from its surviving segments — the
    // line-dedup rule of C4/CCNet, with fixed 10-token windows standing in
    // for lines (the fixture corpus has no newlines; the rule is
    // segmenter-agnostic). One shuffle on segment text + one per-doc
    // regroup; first-occurrence choice makes the output deterministic.
    QueryDef(
      "q_segment_dedup",
      Some("""WITH d AS (SELECT doc_id, regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |  FROM documents),
             |w AS (SELECT doc_id, CAST(i AS INT) AS seg_idx,
             |    array_to_string(toks[i*10+1 : i*10+10], ' ') AS seg
             |  FROM (SELECT doc_id, toks,
             |      unnest(range(0, CAST(ceil(len(toks) / 10.0) AS INT))) AS i
             |    FROM d)),
             |k AS (SELECT doc_id, seg_idx, seg,
             |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) = 1 AS keep
             |  FROM w),
             |c AS (SELECT doc_id, count(*) AS n,
             |    string_agg(seg, ' ' ORDER BY seg_idx) AS txt
             |  FROM k WHERE keep GROUP BY doc_id)
             |SELECT d0.doc_id, CAST(COALESCE(c.n, 0) AS INT) AS n_kept,
             |  COALESCE(c.txt, '') AS clean_text
             |FROM (SELECT doc_id FROM documents) d0 LEFT JOIN c USING (doc_id)""".stripMargin),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val segs = docs
          .withColumn("__toks", split(Dedup.normalized(col("text")), " "))
          .withColumn("__w", transform(
            sequence(lit(0),
              ceil(size(col("__toks")) / 10.0).cast("int") - 1),
            w => array_join(slice(col("__toks"), w * 10 + 1, lit(10)), " ")))
          .select(col("doc_id"), posexplode(col("__w")).as(Seq("seg_idx", "seg")))
        // First occurrence = min (doc_id, seg_idx), computed as an
        // AGGREGATE, not row_number over a window on `seg`: segment text
        // is exactly the column that skews at web scale (boilerplate
        // repeated millions of times), and a window plan funnels every
        // copy of a hot segment into one task's sort. min(struct) gets
        // map-side partial aggregation — each task reduces its local
        // copies to one row before the shuffle, so the hot key arrives
        // pre-collapsed. Same rows, skew-tolerant plan.
        val kept = segs
          .groupBy("seg")
          .agg(min(struct(col("doc_id"), col("seg_idx"))).as("__first"))
          .select(col("__first.doc_id").as("doc_id"),
            col("__first.seg_idx").as("seg_idx"), col("seg"))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("int").as("n_kept"),
            array_join(transform(
              array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
              x => x.getField("seg")), " ").as("clean_text"))
        docs.select("doc_id").join(kept, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_kept"), lit(0)).as("n_kept"),
            coalesce(col("clean_text"), lit("")).as("clean_text"))
      }),

    // EXACT repeated-substring detection (Lee et al. 2021 — the stronger
    // variant of q_segment_dedup's fixed-window proxy): every position
    // whose 50-char gram repeats anywhere in the corpus, merged into
    // maximal per-doc spans. Suffix arrays don't distribute; the Spark
    // form is a position-gram hash table (one shuffle, O(corpus chars)
    // rows) + corpus-wide repeat filter + doc-local island merge (window
    // bounded by document length). See dedup/ExactSubstr.scala.
    QueryDef(
      "q_substr_dedup",
      Some(graft.dedup.ExactSubstr.oracleSql(50)),
      (s, dir) => graft.dedup.ExactSubstr.spanStats(
        Tables.t(s, dir, "documents"), "doc_id", "text", minMatch = 50)),

    // The REMOVAL q_substr_dedup's statistics exist for: each document's
    // normalized text with every corpus-duplicated ≥50-char span cut out.
    // Spark rebuilds by a row-local span-subtraction fold over the sorted
    // span array; the oracle rebuilds CHARACTER-WISE (keep every position
    // no span covers, string_agg in order) — two different mechanisms that
    // must land on byte-identical strings, so an off-by-one in either
    // span boundary or the fold's cursor arithmetic turns the row red.
    QueryDef(
      "q_substr_clean",
      Some(graft.dedup.ExactSubstr.cleanOracleSql(50)),
      (s, dir) => graft.dedup.ExactSubstr.cleanText(
        Tables.t(s, dir, "documents"), "doc_id", "text", minMatch = 50)),

    // Benchmark CONTAMINATION check (the GPT-3-paper step): flag every
    // train document sharing any word 8-gram with the held-out set
    // (doc_id % 50 = 0 stands in for the benchmark). Distinct grams per
    // side, an equi-join on gram, per-doc shared counts — the plan is two
    // aggs + a join however large the corpus, and the benchmark side is
    // tiny so AQE broadcasts it.
    QueryDef(
      "q_contamination",
      Some("""WITH d AS (SELECT doc_id, regexp_split_to_array(
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |  FROM documents),
             |g AS (SELECT DISTINCT doc_id, gram FROM (
             |    SELECT doc_id, unnest(list_transform(range(1, len(toks) - 6),
             |      i -> array_to_string(toks[i : i+7], ' '))) AS gram
             |    FROM d WHERE len(toks) >= 8)),
             |b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
             |sh AS (SELECT g.doc_id, count(*) AS n FROM g JOIN b USING (gram)
             |  WHERE g.doc_id % 50 <> 0 GROUP BY g.doc_id)
             |SELECT t.doc_id, CAST(COALESCE(sh.n, 0) AS INT) AS n_shared,
             |  COALESCE(sh.n, 0) > 0 AS contaminated
             |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) t
             |LEFT JOIN sh USING (doc_id)""".stripMargin),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        def grams(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("__toks", split(Dedup.normalized(col("text")), " "))
          .filter(size(col("__toks")) >= 8)
          .select(col("doc_id"), explode(transform(
            sequence(lit(0), size(col("__toks")) - 8),
            i => array_join(slice(col("__toks"), i + 1, lit(8)), " "))).as("gram"))
          .distinct()
        val all = grams(docs)
        val bench = all.filter(col("doc_id") % 50 === 0)
          .select("gram").distinct()
        val shared = all.filter(col("doc_id") % 50 =!= 0)
          .join(bench, Seq("gram"))
          .groupBy("doc_id").agg(count(lit(1)).cast("int").as("n_shared"))
        docs.filter(col("doc_id") % 50 =!= 0).select("doc_id")
          .join(shared, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_shared"), lit(0)).as("n_shared"),
            (coalesce(col("n_shared"), lit(0)) > 0).as("contaminated"))
      }),

    // MinHash+LSH near-dup (scale path). The oracle recomputes the entire
    // pipeline — sha60 permutation signatures, band buckets, exact-Jaccard
    // verification — from the same constants, so the full hash gate applies
    // (recall vs brute force is additionally spec-checked).
    QueryDef(
      "q_minhash_neardup",
      Some(MinHashLSH.oracleSql(MinHashLSH.Config())),
      (s, dir) => MinHashLSH.nearDuplicates(
        Tables.t(s, dir, "documents"), "doc_id", "text")),

    // INCREMENTAL corpus-vs-batch dedup — the daily 100 TB shape: the
    // pre-existing corpus (doc_id % 10 <> 0) seeds a persistent MinHash
    // signature/band index in the warehouse; the day's batch
    // (doc_id % 10 = 0) appends its signatures and band-joins the index,
    // emitting every near-dup pair with a batch side. No corpus
    // re-signature, no corpus self-join — per-batch cost is O(batch +
    // matched index rows). Verification is signature-slot agreement
    // (exact multiples of 1/64 → engine-reproducible); the oracle
    // recomputes signatures, bands, candidates and estimates from the
    // shared constants. IncrementalSpec proves a batch re-run is
    // idempotent (index unchanged, identical pair set).
    QueryDef(
      "q_incremental_dedup",
      Some(IncrementalDedup.oracleSql(MinHashLSH.Config(), "% 10 = 0")),
      (s, dir) => {
        val docs = Tables.t(s, dir, "documents")
        val wh = new graft.tables.Warehouse(s,
          java.nio.file.Files.createTempDirectory("graft-q-incdd").toString)
        // fused day-one path: one signature job, one write per index
        // table (IncrementalSpec proves it emits exactly what
        // seedIndex-then-processBatch emits)
        IncrementalDedup.bootstrap(wh, "dd",
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text")
      }),

    // SimHash via the native Catalyst expression; token features use the
    // sha256-derived 60-bit hash so DuckDB recomputes the identical simhash
    // (bits 60-63 are structurally 0 on both engines).
    QueryDef(
      "q_simhash",
      Some("""WITH tok AS (SELECT doc_id, list_transform(
             |    regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
             |    t -> ('0x' || substr(sha256(t), 1, 15))::BIGINT) AS hs
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(list_sum(list_transform(range(0, 60), b ->
             |    CASE WHEN list_sum(list_transform(hs, h ->
             |           CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
             |         THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
             |FROM tok""".stripMargin),
      (s, dir) => Tables.t(s, dir, "documents")
        // the fixture table is one small file = one partition; this op is
        // row-local, so parallelism is purely a partition-count decision
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          SimHash64.simhash64(s,
            transform(split(Dedup.normalized(col("text")), " "), t => Hashing.sha60(t)))
            .as("simhash"))),

    // SimHash near-dup pairs (Manku-style web dedup): banded equi-join
    // with pigeonhole-exact recall at hamming ≤ 3, verified by popcount.
    // The oracle recomputes the identical sha60 simhash pipeline
    // (q_simhash proves parity) and takes ALL pairs within the radius, so
    // the gate checks both the banding's recall and the hamming math.
    QueryDef(
      "q_simhash_neardup",
      Some("""WITH tok AS (SELECT doc_id, list_transform(
             |    regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
             |    t -> ('0x' || substr(sha256(t), 1, 15))::BIGINT) AS hs
             |  FROM documents),
             |sh AS (SELECT doc_id,
             |  CAST(list_sum(list_transform(range(0, 60), b ->
             |    CASE WHEN list_sum(list_transform(hs, h ->
             |           CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
             |         THEN (1::BIGINT << b) ELSE 0 END)) AS BIGINT) AS simhash
             |FROM tok)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
             |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin),
      (s, dir) => Dedup.simhashNearDup(s,
        Tables.t(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism),
        "doc_id", "text", maxHamming = 3)),

    // Winnowing fingerprint sketch (sha60 k-gram hashes for oracle parity;
    // fingerprint = xor-fold of the sorted-distinct sketch).
    QueryDef(
      "q_fingerprint",
      Some("""WITH n AS (SELECT doc_id,
             |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t FROM documents),
             |kg AS (SELECT doc_id, list_transform(
             |    range(1, greatest(length(t) - 4, 1) + 1),
             |    i -> ('0x' || substr(sha256(substr(t, i, 5)), 1, 15))::BIGINT) AS hs
             |  FROM n),
             |sk AS (SELECT doc_id, list_sort(list_distinct(list_transform(
             |    range(1, greatest(len(hs) - 3, 1) + 1),
             |    i -> list_aggregate(hs[i:i+3], 'min')))) AS sketch
             |  FROM kg)
             |SELECT doc_id, list_reduce(sketch, (a, b) -> xor(a, b)) AS fingerprint,
             |  CAST(len(sketch) AS INT) AS sketch_size
             |FROM sk""".stripMargin),
      (s, dir) => Fingerprint.withFingerprint(
          Tables.t(s, dir, "documents")
            .repartition(s.sparkContext.defaultParallelism)
            .select(col("doc_id"), Dedup.normalized(col("text")).as("norm_text")),
          "norm_text", hashFn = Hashing.sha60)
        .select(col("doc_id"), col("fingerprint"), size(col("sketch")).as("sketch_size"))),

    // Language-ID heuristic (profile argmax). The oracle reproduces the
    // argmax as max-of-structs: field order (score, lang) makes struct
    // ordering identical to Spark's greatest(struct(s, l)).
    QueryDef(
      "q_lang_id",
      Some("""WITH s AS (SELECT doc_id, lang,
             |  CAST(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit)\b')) AS INT) AS s_de,
             |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|with|that)\b')) AS INT) AS s_en,
             |  CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|que|para)\b')) AS INT) AS s_es,
             |  CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une|que)\b')) AS INT) AS s_fr,
             |  CAST(3 * len(regexp_extract_all(text, '[\p{Han}]')) AS INT) AS s_zh
             |FROM documents),
             |b AS (SELECT doc_id, lang, (list_sort([
             |    {'s': s_de, 'l': 'de'}, {'s': s_en, 'l': 'en'},
             |    {'s': s_es, 'l': 'es'}, {'s': s_fr, 'l': 'fr'},
             |    {'s': s_zh, 'l': 'zh'}]))[-1] AS best
             |FROM s)
             |SELECT doc_id, lang,
             |  CASE WHEN best.s > 0 THEN best.l ELSE 'und' END AS lang_pred,
             |  best.s AS lang_score
             |FROM b""".stripMargin),
      (s, dir) => LangId.detect(
          Tables.t(s, dir, "documents").select("doc_id", "text", "lang"))
        .select("doc_id", "lang", "lang_pred", "lang_score")),

    // FRAME-level audio features over the REAL decoded samples: 16-sample
    // frames, per-frame RMS energy + zero crossings — the energy envelope
    // a VAD/silence-trim stage consumes. The oracle recomputes every
    // frame from the WAV seed formula without parsing bytes (the
    // q_wav_decode contract, one level finer-grained).
    QueryDef(
      "q_audio_frames",
      Some {
        def s(e: String) =
          s"""CASE WHEN (doc_id*13 + ($e)*11) % 65536 >= 32768
             |  THEN (doc_id*13 + ($e)*11) % 65536 - 65536
             |  ELSE (doc_id*13 + ($e)*11) % 65536 END""".stripMargin
        s"""WITH fr AS (SELECT doc_id, unnest(range(0, 4)) AS frame FROM documents),
           |sm AS (SELECT doc_id, frame,
           |    list_transform(range(0, 16), k -> ${s("frame*16 + k")}) AS v
           |  FROM fr)
           |SELECT doc_id, CAST(frame AS INT) AS frame,
           |  round(sqrt(list_sum(list_transform(v, x -> x*x))::DOUBLE / 16), 4)
           |    AS rms,
           |  CAST(list_sum(list_transform(range(0, 15), k ->
           |    CASE WHEN v[k+1] * v[k+2] < 0 THEN 1 ELSE 0 END)) AS INT)
           |    AS zero_crossings
           |FROM sm""".stripMargin
      },
      (s, dir) => Binary.wavFrames(
          Binary.decodeWav(
            Binary.wavFromSeed(
              Tables.t(s, dir, "documents").select("doc_id")
                .repartition(s.sparkContext.defaultParallelism),
              "doc_id", nSamples = 64),
            "wav"),
          frameLen = 16)
        .select("doc_id", "frame", "rms", "zero_crossings")),

    // 16-POINT DFT POWER SPECTRUM per audio frame — real spectral
    // analysis over the decoded samples (per-bin dB power, energy share,
    // spectral centroid), the spectrogram row a feature-stacking stage
    // consumes. The trig is evaluated ONCE into shared 17-digit literal
    // twiddle tables (multimodal/Binary.dftCosTab), so both engines
    // multiply bit-identical doubles and libm never enters; dB output
    // compresses residual sum-order ulp far below the rounding grid.
    // Row-local folds after one explode; the only windows are 9-row
    // per-frame normalizations.
    QueryDef(
      "q_audio_spectrum",
      Some {
        def s(e: String) =
          s"""CASE WHEN (doc_id*13 + ($e)*11) % 65536 >= 32768
             |  THEN (doc_id*13 + ($e)*11) % 65536 - 65536
             |  ELSE (doc_id*13 + ($e)*11) % 65536 END""".stripMargin
        s"""WITH tw AS (SELECT ${Binary.tabSql(Binary.dftCosTab)} AS ct,
           |    ${Binary.tabSql(Binary.dftSinTab)} AS st),
           |fr AS (SELECT doc_id, unnest(range(0, 4)) AS frame FROM documents),
           |sm AS (SELECT doc_id, frame,
           |    list_transform(range(0, 16), k -> ${s("frame*16 + k")}) AS v
           |  FROM fr),
           |b AS (SELECT doc_id, frame, v, unnest(range(0, 9)) AS bin FROM sm),
           |sp AS (SELECT doc_id, CAST(frame AS INT) AS frame,
           |    CAST(bin AS INT) AS bin,
           |    list_sum(list_transform(range(0, 16),
           |      n -> v[n+1]::DOUBLE * ct[(bin*n) % 16 + 1])) AS re,
           |    -list_sum(list_transform(range(0, 16),
           |      n -> v[n+1]::DOUBLE * st[(bin*n) % 16 + 1])) AS im
           |  FROM b, tw),
           |pw AS (SELECT doc_id, frame, bin, re*re + im*im AS power FROM sp),
           |agg AS (SELECT doc_id, frame, bin, power,
           |    sum(power) OVER w AS tot,
           |    sum(CASE WHEN bin >= 1 THEN power * bin ELSE 0 END)
           |      OVER w AS ctr_num,
           |    sum(CASE WHEN bin >= 1 THEN power ELSE 0 END) OVER w AS ctr_den
           |  FROM pw WINDOW w AS (PARTITION BY doc_id, frame))
           |SELECT doc_id, frame, bin,
           |  round(10.0 * log10(power + 1), 3) AS power_db,
           |  round(power / tot, 4) AS share,
           |  CASE WHEN ctr_den > 0 THEN round(ctr_num / ctr_den, 4) END
           |    AS centroid
           |FROM agg""".stripMargin
      },
      (s, dir) => Binary.wavSpectrum(
        Binary.decodeWav(
          Binary.wavFromSeed(
            Tables.t(s, dir, "documents").select("doc_id")
              .repartition(s.sparkContext.defaultParallelism),
            "doc_id", nSamples = 64),
          "wav"))),

    // AUDIO FINGERPRINT (shazam-lite landmarks): per frame, the DOMINANT
    // non-DC DFT bin (argmax of the bit-reproducible raw powers, ties to
    // the lower bin) — the 4-frame dominant-bin sequence packs into one
    // base-9 integer fingerprint, and docs sharing a fingerprint form
    // acoustic near-dup groups (min-id canonical). This is the audio
    // half of the dedup story (dHash is the image half): row-local DFT,
    // an 8-row per-frame rank window, then ONE shuffle on the compact
    // fingerprint — never on samples. The oracle replays the DFT with
    // the shared twiddle-table literals and the same rank argmax.
    QueryDef(
      "q_audio_fingerprint",
      Some {
        def sg(e: String) =
          s"""CASE WHEN (doc_id*13 + ($e)*11) % 65536 >= 32768
             |  THEN (doc_id*13 + ($e)*11) % 65536 - 65536
             |  ELSE (doc_id*13 + ($e)*11) % 65536 END""".stripMargin
        s"""WITH tw AS (SELECT ${Binary.tabSql(Binary.dftCosTab)} AS ct,
           |    ${Binary.tabSql(Binary.dftSinTab)} AS st),
           |fr AS (SELECT doc_id, unnest(range(0, 4)) AS frame FROM documents),
           |sm AS (SELECT doc_id, frame,
           |    list_transform(range(0, 16), k -> ${sg("frame*16 + k")}) AS v
           |  FROM fr),
           |b AS (SELECT doc_id, frame, v, unnest(range(1, 9)) AS bin FROM sm),
           |sp AS (SELECT doc_id, frame, bin,
           |    list_sum(list_transform(range(0, 16),
           |      n -> v[n+1]::DOUBLE * ct[(bin*n) % 16 + 1])) AS re,
           |    -list_sum(list_transform(range(0, 16),
           |      n -> v[n+1]::DOUBLE * st[(bin*n) % 16 + 1])) AS im
           |  FROM b, tw),
           |dom AS (SELECT doc_id, frame, bin FROM (
           |    SELECT doc_id, frame, bin, row_number() OVER (
           |      PARTITION BY doc_id, frame
           |      ORDER BY re*re + im*im DESC, bin) AS rk
           |    FROM sp) WHERE rk = 1),
           |fp AS (SELECT doc_id,
           |    CAST(max(CASE WHEN frame = 0 THEN bin END) AS INT) AS dom0,
           |    CAST(max(CASE WHEN frame = 1 THEN bin END) AS INT) AS dom1,
           |    CAST(max(CASE WHEN frame = 2 THEN bin END) AS INT) AS dom2,
           |    CAST(max(CASE WHEN frame = 3 THEN bin END) AS INT) AS dom3,
           |    CAST(sum(bin * CASE frame WHEN 0 THEN 1 WHEN 1 THEN 9
           |      WHEN 2 THEN 81 ELSE 729 END) AS INT) AS fp
           |  FROM dom GROUP BY 1),
           |g AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_same,
           |    min(doc_id) AS canonical_id
           |  FROM fp GROUP BY 1)
           |SELECT f.doc_id, f.dom0, f.dom1, f.dom2, f.dom3, f.fp,
           |  g.n_same, g.canonical_id
           |FROM fp f JOIN g USING (fp)""".stripMargin
      },
      (s, dir) => {
        val dom = Binary.wavDominantBins(Binary.decodeWav(
          Binary.wavFromSeed(
            Tables.t(s, dir, "documents").select("doc_id")
              .repartition(s.sparkContext.defaultParallelism),
            "doc_id", nSamples = 64),
          "wav"))
        val weight = when(col("frame") === 0, 1)
          .when(col("frame") === 1, 9)
          .when(col("frame") === 2, 81).otherwise(729)
        val fp = dom.groupBy("doc_id").agg(
          max(when(col("frame") === 0, col("bin"))).cast("int").as("dom0"),
          max(when(col("frame") === 1, col("bin"))).cast("int").as("dom1"),
          max(when(col("frame") === 2, col("bin"))).cast("int").as("dom2"),
          max(when(col("frame") === 3, col("bin"))).cast("int").as("dom3"),
          sum(col("bin") * weight).cast("int").as("fp"))
        val g = fp.groupBy("fp").agg(count(lit(1)).as("n_same"),
          min("doc_id").as("canonical_id"))
        fp.join(g, "fp")
          .select(col("doc_id"), col("dom0"), col("dom1"), col("dom2"),
            col("dom3"), col("fp"), col("n_same"), col("canonical_id"))
      }),

    // LANGID EVALUATION in-engine: confusion matrix of the n-gram
    // heuristic against the fixture's ground-truth lang column, with
    // per-truth-language recall — the measurement that decides whether
    // the cheap classifier is good enough to gate a corpus on. Pure
    // rollup of the q_lang_id contract; |langs|² output.
    QueryDef(
      "q_langid_confusion",
      Some("""WITH s AS (SELECT doc_id, lang,
             |  CAST(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|mit)\b')) AS INT) AS s_de,
             |  CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|is|with|that)\b')) AS INT) AS s_en,
             |  CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|que|para)\b')) AS INT) AS s_es,
             |  CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une|que)\b')) AS INT) AS s_fr,
             |  CAST(3 * len(regexp_extract_all(text, '[\p{Han}]')) AS INT) AS s_zh
             |FROM documents),
             |b AS (SELECT doc_id, lang, (list_sort([
             |    {'s': s_de, 'l': 'de'}, {'s': s_en, 'l': 'en'},
             |    {'s': s_es, 'l': 'es'}, {'s': s_fr, 'l': 'fr'},
             |    {'s': s_zh, 'l': 'zh'}]))[-1] AS best
             |FROM s),
             |p AS (SELECT lang,
             |    CASE WHEN best.s > 0 THEN best.l ELSE 'und' END AS lang_pred
             |  FROM b),
             |t AS (SELECT lang, count(*) AS n_lang FROM p GROUP BY 1)
             |SELECT p.lang, lang_pred, CAST(count(*) AS BIGINT) AS n,
             |  round(count(*)::DOUBLE / any_value(n_lang), 4) AS share
             |FROM p JOIN t USING (lang) GROUP BY 1, 2""".stripMargin),
      (s, dir) => {
        val pred = LangId.detect(
            Tables.t(s, dir, "documents").select("doc_id", "text", "lang"))
          .select("lang", "lang_pred")
        val totals = pred.groupBy("lang").agg(count(lit(1)).as("n_lang"))
        pred.groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
          .join(broadcast(totals), "lang")
          .select(col("lang"), col("lang_pred"), col("n"),
            round(col("n").cast("double") / col("n_lang"), 4).as("share"))
      }),

    // Brute-force cosine top-k (ANN correctness baseline).
    QueryDef(
      "q_knn_cosine",
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
             |          FROM embeddings WHERE vec_id < 20),
             |     c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
             |          FROM embeddings)
             |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
             |       round(cos, 4) AS cos
             |FROM (SELECT query_id, neighbor_id,
             |        list_cosine_similarity(qv, cv) AS cos,
             |        row_number() OVER (PARTITION BY query_id
             |          ORDER BY list_cosine_similarity(qv, cv) DESC, neighbor_id) AS rank
             |      FROM q JOIN c ON query_id <> neighbor_id)
             |WHERE rank <= 3""".stripMargin),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        Knn.bruteForceTopK(
          e.filter(col("vec_id") < 20), e, "vec_id", "embedding", k = 3)
      }),

    // MMR DIVERSIFIED RE-RANKING (λ=0.5): the retrieval step between ANN
    // and the user — greedily pick 5 of the query's top-20 cosine
    // candidates maximizing λ·relevance − (1−λ)·max-similarity-to-
    // already-selected. Candidate generation is the distributed part
    // (corpus cosine + top-k); the greedy runs over the k-BOUNDED
    // candidate set driver-side (20 vectors — the IVF-centroid
    // precedent), exactly how production rerankers stage it. The oracle
    // unrolls the same greedy in 5 chained CTEs; ties break by vec_id.
    QueryDef(
      "q_mmr_rerank",
      Some {
        def sel(i: Int) = (1 until i).map(j => s"SELECT vec_id FROM s$j")
          .mkString(" UNION ")
        def step(i: Int) =
          s"""s$i AS (SELECT c.vec_id, c.rel,
             |    0.5 * c.rel - 0.5 * max(p.sim) AS mmr
             |  FROM cand c JOIN p ON p.ia = c.vec_id
             |    AND p.ib IN (${sel(i)})
             |  WHERE c.vec_id NOT IN (${sel(i)})
             |  GROUP BY c.vec_id, c.rel
             |  ORDER BY mmr DESC, c.vec_id LIMIT 1)""".stripMargin
        s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
           |  WHERE vec_id = 0),
           |c0 AS (SELECT vec_id, embedding::DOUBLE[] AS v,
           |    list_cosine_similarity(qv, embedding::DOUBLE[]) AS rel
           |  FROM embeddings, q WHERE vec_id <> 0),
           |cand AS (SELECT vec_id, v, rel FROM (
           |    SELECT vec_id, v, rel,
           |      row_number() OVER (ORDER BY rel DESC, vec_id) AS rk
           |    FROM c0) WHERE rk <= 20),
           |p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
           |    list_cosine_similarity(a.v, b.v) AS sim
           |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
           |s1 AS (SELECT vec_id, rel, rel AS mmr FROM cand
           |  ORDER BY rel DESC, vec_id LIMIT 1),
           |${(2 to 5).map(step).mkString(",\n")}
           |SELECT * FROM (
           |  SELECT 1 AS rank, vec_id, round(rel, 4) AS relevance,
           |    round(mmr, 4) AS mmr FROM s1
           |  ${(2 to 5).map(i =>
               s"UNION ALL SELECT $i, vec_id, round(rel, 4), round(mmr, 4) FROM s$i")
               .mkString("\n  ")})""".stripMargin
      },
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        // distributed candidate generation: corpus cosine vs the query
        // vector, top-20 (TakeOrdered — no global window)
        val qv = e.filter(col("vec_id") === 0)
          .select(transform(col("embedding"), _.cast("double")).as("qv"))
        val cand = e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(qv))
          .select(col("vec_id"),
            transform(col("embedding"), _.cast("double")).as("v"),
            Knn.cosine(transform(col("embedding"), _.cast("double")),
              col("qv")).as("rel"))
          .orderBy(col("rel").desc, col("vec_id")).limit(20)
          .collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
            r.getDouble(2)))
        // k-bounded greedy over the 20 candidates
        def cos(a: Array[Double], b: Array[Double]): Double = {
          var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
          while (i < a.length) {
            d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
          }
          d / math.sqrt(na * nb)
        }
        val selected = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Long, Double, Double)]
        val remaining = scala.collection.mutable.ArrayBuffer(cand: _*)
        for (rank <- 1 to 5) {
          val scored = remaining.map { case c @ (id, v, rel) =>
            val mmr =
              if (selected.isEmpty) rel
              else 0.5 * rel - 0.5 * selected.map(sid =>
                cos(v, cand.find(_._1 == sid._2).get._2)).max
            (c, mmr)
          }
          val best = scored.minBy { case ((id, _, _), m) => (-m, id) }
          selected += ((rank, best._1._1, best._1._3, best._2))
          remaining -= best._1
        }
        s.createDataFrame(selected.toSeq)
          .toDF("rank", "vec_id", "relevance", "mmr")
          .select(col("rank"), col("vec_id"),
            round(col("relevance"), 4).as("relevance"),
            round(col("mmr"), 4).as("mmr"))
      }),

    // Embedding near-duplicate pairs via banded sign-LSH (threshold from
    // the fixture's cosine distribution — max pair cosine is ~0.51). The
    // oracle recomputes the banded pipeline from the same plane literals;
    // recall vs the brute-force ground truth is spec-checked. r=2/b=16 fits
    // the fixture's low threshold; production thresholds use higher r.
    QueryDef(
      "q_embed_neardup",
      Some(Knn.nearDupBandedOracleSql(threshold = 0.4, bands = 16,
        planesPerBand = 2, dim = 64)),
      (s, dir) => Knn.nearDupPairsBanded(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, bands = 16, planesPerBand = 2, dim = 64)),

    // The SCALE path of the same pipeline: per-bucket keep-lowest cap
    // bounds candidate pairs to buckets·C(cap,2) — linear in the corpus —
    // where the uncapped query's output is quadratic (17.1× runtime on
    // 10× data at sf1, r15 verdict). The cap (100) BINDS at the gated
    // sf0.01 fixture (~125 ids per band bucket), so the hash gate
    // exercises the truncated path, and the oracle recomputes the same
    // deterministic row_number cut. Recall vs the uncapped pair set is
    // measured in KnnSpec and the sf1 scale notes.
    QueryDef(
      "q_embed_neardup_capped",
      Some(Knn.nearDupBandedOracleSql(threshold = 0.4, bands = 16,
        planesPerBand = 2, dim = 64, maxBucketSize = Some(100))),
      (s, dir) => Knn.nearDupPairsBanded(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, bands = 16, planesPerBand = 2, dim = 64,
        maxBucketSize = Some(100))),

    // SemDeDup (arXiv:2303.09540): semantic dedup — IVF cells bound the
    // pairwise stage (equi-join on centroid_id, Σ|cell|² work), lower-id
    // member wins within a semantic group. iters=0 seeds the cells from
    // the k lowest-id vectors: deterministic float math both engines
    // reproduce bit-identically (the q_ann_ivf precedent), so the whole
    // keep/drop partition is hash-gated, not sampled.
    //
    // Gated at the SCALE configuration (r16 verdict: the r16 fixture
    // pinned numCells=8, making the in-cell square n²/8 — quadratic at
    // 100× data): cells = ⌈√n⌉ computed from the corpus by BOTH engines,
    // and maxCellSize=16 caps the drop-candidate side at each cell's 16
    // lowest ids (Σ|cell|·cap ≤ 16n pairwise work — linear even under an
    // embedding collapse). The cap BINDS at sf0.01 (500 vectors / 23
    // cells ≈ 22 avg members), so the hash gate exercises the truncated
    // path; the oracle recomputes the same keep-lowest representative cut.
    QueryDef(
      "q_semantic_dedup",
      Some(SemDedup.oracleSqlScaled(threshold = 0.3,
        maxCellSize = Some(16))),
      (s, dir) => SemDedup.semanticDedupScaled(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.3, maxCellSize = Some(16))),

    // The 100 TB assignment shape of the same pipeline: with the pairwise
    // stage cap-bounded, the flat argmax's n·√n dot products become the
    // dominant FLOP term (measured 31.5× FLOPs on the r17 third decade).
    // The two-level coarse quantizer (FAISS-IMI shape) assigns in n·2√k —
    // ~10× fewer dots per decade — at a pure-recall cost near coarse-cell
    // boundaries. Three deterministic argmax chains, all replayed by the
    // oracle; flat q_semantic_dedup stays as the exact-assignment
    // baseline (the uncapped/capped near-dup twin precedent).
    QueryDef(
      "q_semantic_dedup_coarse",
      Some(SemDedup.oracleSqlCoarse(threshold = 0.3,
        maxCellSize = Some(16))),
      (s, dir) => SemDedup.semanticDedupCoarse(
        Tables.t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.3, maxCellSize = Some(16))),

    // INCREMENTAL semantic dedup — the daily shape of q_semantic_dedup:
    // the corpus (vec_id % 10 <> 0) freezes ⌈√n_corpus⌉ centroids and a
    // cap-lowest representative index in the warehouse; the batch
    // (vec_id % 10 = 0) assigns against the frozen centroids (broadcast
    // argmax) and is verdicted only within its own touched cells against
    // the indexed representatives ∪ itself. Per-batch work is
    // |batch|·√n assignment dots + ≤ |batch|·cap pairwise — no corpus
    // re-assignment, no corpus pairwise. The cap (16) binds at sf0.01
    // (~450 corpus vectors / 22 cells), so the gate exercises the
    // truncated candidate cut; IncrementalSpec proves batch re-runs are
    // idempotent. Frozen centroids trade boundary recall (the
    // q_ann_incremental precedent), never precision.
    QueryDef(
      "q_semantic_dedup_incr",
      Some(SemDedup.incrOracleSql(threshold = 0.3, cap = 16,
        batchPred = "% 10 = 0")),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val wh = new graft.tables.Warehouse(s,
          java.nio.file.Files.createTempDirectory("graft-q-semincr").toString)
        SemDedup.seedIndex(wh, "sd", e.filter(col("vec_id") % 10 =!= 0),
          "vec_id", "embedding", cap = 16)
        SemDedup.processBatch(wh, "sd", e.filter(col("vec_id") % 10 === 0),
          "vec_id", "embedding", threshold = 0.3, cap = 16)
      }),

    // The FOURTH-DECADE bootstrap of the incremental semantic index:
    // seedIndexCoarse replaces the flat n·√n corpus seed pass (measured
    // 45-minute-class at sf100's 2M vectors — the r18 flat-DNF wall)
    // with the two-level n·2·n^(1/4) assignment (the 33.97 s
    // q_semantic_dedup_coarse shape). Daily batches run the UNCHANGED
    // processBatch — small batches keep the exact flat argmax against
    // the same frozen centroids. The trade is recall near coarse
    // boundaries for corpus representatives, never precision.
    QueryDef(
      "q_semantic_dedup_incr_coarse",
      Some(SemDedup.incrOracleSqlCoarse(threshold = 0.3, cap = 16,
        batchPred = "% 10 = 0")),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val wh = new graft.tables.Warehouse(s,
          java.nio.file.Files.createTempDirectory("graft-q-semincrc").toString)
        SemDedup.seedIndexCoarse(wh, "sd",
          e.filter(col("vec_id") % 10 =!= 0), "vec_id", "embedding",
          cap = 16)
        SemDedup.processBatch(wh, "sd", e.filter(col("vec_id") % 10 === 0),
          "vec_id", "embedding", threshold = 0.3, cap = 16)
      }),

    // SEQUENCED incremental semantic dedup — the COMPOSITION gate (r18
    // verdict #1): seedIndex(corpus = vec_id % 10 ∉ {0, 5}) →
    // processBatch(B1 = % 10 = 5) → processBatch(B2 = % 10 = 0). B2's
    // candidate set must include representatives B1's append created; the
    // cap algebra collapses the replay to one per-epoch cap-lowest cut
    // over the epoch-tagged assignment (cand_j = bottom-cap of
    // corpus ∪ B_1..j per cell). Epoch-order sensitivity (swapping B1/B2
    // flips verdicts exactly where a lower-id rep changes) is
    // SemDedupSpec's half.
    QueryDef(
      "q_semantic_dedup_incr2",
      Some(SemDedup.incrOracleSqlEpochs(threshold = 0.3, cap = 16,
        epochPreds = Seq("% 10 = 5", "% 10 = 0"))),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val wh = new graft.tables.Warehouse(s,
          java.nio.file.Files.createTempDirectory("graft-q-semincr2").toString)
        SemDedup.seedIndex(wh, "sd",
          e.filter(col("vec_id") % 10 =!= 0 && col("vec_id") % 10 =!= 5),
          "vec_id", "embedding", cap = 16)
        // day-1 verdicts materialize to parquet before day 2 (r19
        // verdict #2) — fault-clean under DEFAULT checkpoints, matching
        // Curation.runDay's per-day materialization
        val v1 = SemDedup.processBatch(wh, "sd",
          e.filter(col("vec_id") % 10 === 5), "vec_id", "embedding",
          threshold = 0.3, cap = 16).withColumn("epoch", lit(1))
        wh.overwrite("v1", v1)
        val v2 = SemDedup.processBatch(wh, "sd",
          e.filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
          threshold = 0.3, cap = 16).withColumn("epoch", lit(2))
        wh.read("v1").unionByName(v2)
      }),

    // The compaction-INTERLEAVED sequenced gate (r19 verdict #6): same
    // oracle as q_semantic_dedup_incr2 — the cap algebra PREDICTS that a
    // compactIndex between the epochs cannot move any verdict
    // (capLowest(T) = bottomCap(all-seen) for every T between the exact
    // cut and the full append history); gating it makes that an ORACLE
    // fact rather than a spec fact. SemDedupSpec holds the
    // bound-restoration half (reps row count back to <= cap*cells).
    QueryDef(
      "q_semantic_dedup_incr2_compact",
      Some(SemDedup.incrOracleSqlEpochs(threshold = 0.3, cap = 16,
        epochPreds = Seq("% 10 = 5", "% 10 = 0"))),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val wh = new graft.tables.Warehouse(s,
          java.nio.file.Files.createTempDirectory("graft-q-semincr2c").toString)
        SemDedup.seedIndex(wh, "sd",
          e.filter(col("vec_id") % 10 =!= 0 && col("vec_id") % 10 =!= 5),
          "vec_id", "embedding", cap = 16)
        val v1 = SemDedup.processBatch(wh, "sd",
          e.filter(col("vec_id") % 10 === 5), "vec_id", "embedding",
          threshold = 0.3, cap = 16).withColumn("epoch", lit(1))
        wh.overwrite("v1", v1)
        SemDedup.compactIndex(wh, "sd", cap = 16)
        val v2 = SemDedup.processBatch(wh, "sd",
          e.filter(col("vec_id") % 10 === 0), "vec_id", "embedding",
          threshold = 0.3, cap = 16).withColumn("epoch", lit(2))
        wh.read("v1").unionByName(v2)
      }),

    // Vector norms (array math sanity surface; fixtures are unit vectors).
    QueryDef(
      "q_embed_norm",
      Some("""SELECT vec_id,
             |  round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 4) AS norm
             |FROM embeddings""".stripMargin),
      (s, dir) => Tables.t(s, dir, "embeddings")
        .select(col("vec_id"),
          round(Knn.norm(transform(col("embedding"), _.cast("double"))), 4).as("norm"))),

    // Mean-pool chunk embeddings into a per-group vector (the
    // chunk-embeddings → document-embedding step). Both engines fold the
    // id-sorted member list strictly left-to-right, so the float result is
    // reproducible. The pooled vector is exploded to scalar (grp, dim, val)
    // rows: the driver's compare sorts rows column-wise and cannot hash an
    // array cell, so arrays must never appear in a gated result.
    QueryDef(
      "q_embed_pool",
      Some("""WITH m AS (SELECT vec_id % 40 AS grp, vec_id, embedding::DOUBLE[] AS v
             |  FROM embeddings),
             |g AS (SELECT grp, list(v ORDER BY vec_id) AS vs FROM m GROUP BY grp),
             |p AS (SELECT grp, list_transform(
             |    list_reduce(vs, (a, b) -> list_transform(range(1, 65), d -> a[d] + b[d])),
             |    x -> round(x / len(vs), 6) + 0.0) AS pooled
             |FROM g)
             |SELECT grp, CAST(unnest(range(0, len(pooled))) AS INT) AS dim,
             |  unnest(pooled) AS val
             |FROM p""".stripMargin),
      (s, dir) => Knn.meanPool(
        Tables.t(s, dir, "embeddings")
          .withColumn("grp", col("vec_id") % 40),
        "grp", "vec_id", "embedding", dim = 64)
        .select(col("grp"), posexplode(col("pooled")).as(Seq("dim", "val")))),

    // LSH-bucketed ANN (scale path). The oracle recomputes bucket ids from
    // the same plane literals and applies the same rank/tie rules — full
    // hash gate; recall vs brute force is spec-checked separately.
    QueryDef(
      "q_ann_lsh",
      Some(Knn.lshOracleSql(k = 3, numPlanes = 8, dim = 64)),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        Knn.lshTopK(e.filter(col("vec_id") < 20), e, "vec_id", "embedding",
          k = 3, numPlanes = 8, dim = 64)
      }),

    // IVF ANN (coarse-quantizer cells + nprobe search). The gated query
    // runs iters=0 — cells from the k lowest-id seed vectors — which is
    // fully deterministic float math both engines reproduce bit-identically;
    // Lloyd-trained quality (iters>0, spherical k-means) is spec-checked by
    // recall on clustered synthetic vectors.
    QueryDef(
      "q_ann_ivf",
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS centroid_id,
             |    v AS cvec
             |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
             |asn AS (SELECT vec_id, v, centroid_id FROM (
             |    SELECT e.vec_id, e.v, c.centroid_id,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY list_dot_product(e.v, c.cvec) DESC, c.centroid_id) AS rn
             |    FROM e CROSS JOIN cent c) WHERE rn = 1),
             |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 20),
             |probes AS (SELECT query_id, qv, centroid_id FROM (
             |    SELECT q.query_id, q.qv, c.centroid_id,
             |      row_number() OVER (PARTITION BY q.query_id
             |        ORDER BY list_dot_product(q.qv, c.cvec) DESC, c.centroid_id) AS pr
             |    FROM q CROSS JOIN cent c) WHERE pr <= 2),
             |scored AS (SELECT p.query_id, a.vec_id AS neighbor_id,
             |    list_dot_product(p.qv, a.v)
             |      / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))) AS cos
             |  FROM probes p JOIN asn a
             |  ON a.centroid_id = p.centroid_id AND a.vec_id <> p.query_id)
             |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cos, 4) AS cos
             |FROM (SELECT query_id, neighbor_id, cos,
             |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
             |      FROM scored)
             |WHERE rank <= 3""".stripMargin),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        graft.sim.Ivf.topK(e.filter(col("vec_id") < 20), e, "vec_id",
          "embedding", k = 3, numCells = 8, nprobe = 2, iters = 0)
      }),

    // PRODUCT QUANTIZATION encode (FAISS PQ: the 32× compression layer of
    // billion-vector ANN): 64-dim vectors → 8 subspaces × 16-code
    // codebooks → 8 small integers per vector. Gated with seed codebooks
    // (subvectors of the 16 lowest-id vectors — the Ivf iters=0
    // convention, bit-reproducible because centroid values are exact
    // copies of stored data); Lloyd-trained codebooks are spec-checked by
    // quantization-error improvement (PqSpec).
    QueryDef(
      "q_pq_encode",
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code, v
             |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
             |grid AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS s),
             |cb AS (SELECT grid.s, seeds.code, seeds.v[grid.s*8+1 : grid.s*8+8] AS cvec
             |  FROM seeds CROSS JOIN grid),
             |sub AS (SELECT e.vec_id, grid.s, e.v[grid.s*8+1 : grid.s*8+8] AS sv
             |  FROM e CROSS JOIN grid)
             |SELECT vec_id, s AS subspace, code FROM (
             |  SELECT sub.vec_id, sub.s, cb.code,
             |    row_number() OVER (PARTITION BY sub.vec_id, sub.s
             |      ORDER BY list_dot_product(cb.cvec, cb.cvec)
             |        - 2.0 * list_dot_product(sub.sv, cb.cvec), cb.code) AS rn
             |  FROM sub JOIN cb ON cb.s = sub.s) WHERE rn = 1""".stripMargin),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val cb = graft.sim.Pq.codebooks(e, "vec_id", "embedding",
          m = 8, subDim = 8, ksub = 16, iters = 0)
        graft.sim.Pq.encode(e, "vec_id", "embedding", m = 8, subDim = 8, cb)
      }),

    // PQ ADC search: uncompressed queries against the CODES (never the
    // vectors) — per query one M×ksub lookup table, per database vector a
    // sum of 8 table lookups folded in subspace order (deterministic
    // float both engines). Rank ties break on neighbor id.
    QueryDef(
      "q_pq_adc",
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code, v
             |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
             |grid AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS s),
             |cb AS (SELECT grid.s, seeds.code, seeds.v[grid.s*8+1 : grid.s*8+8] AS cvec
             |  FROM seeds CROSS JOIN grid),
             |sub AS (SELECT e.vec_id, grid.s, e.v[grid.s*8+1 : grid.s*8+8] AS sv
             |  FROM e CROSS JOIN grid),
             |enc AS (SELECT vec_id, s, code FROM (
             |  SELECT sub.vec_id, sub.s, cb.code,
             |    row_number() OVER (PARTITION BY sub.vec_id, sub.s
             |      ORDER BY list_dot_product(cb.cvec, cb.cvec)
             |        - 2.0 * list_dot_product(sub.sv, cb.cvec), cb.code) AS rn
             |  FROM sub JOIN cb ON cb.s = sub.s) WHERE rn = 1),
             |lut AS (SELECT q.vec_id AS query_id, cb.s, cb.code,
             |    list_dot_product(q.sv, cb.cvec) AS part
             |  FROM (SELECT * FROM sub WHERE vec_id < 20) q
             |  JOIN cb ON cb.s = q.s),
             |sc AS (SELECT l.query_id, enc.vec_id AS neighbor_id,
             |    list_reduce(list(l.part ORDER BY l.s), (a, b) -> a + b) AS score
             |  FROM enc JOIN lut l ON l.s = enc.s AND l.code = enc.code
             |  GROUP BY l.query_id, enc.vec_id)
             |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id,
             |  round(score, 4) AS adc_score
             |FROM (SELECT query_id, neighbor_id, score,
             |    row_number() OVER (PARTITION BY query_id
             |      ORDER BY score DESC, neighbor_id) AS rn
             |  FROM sc) WHERE rn <= 3""".stripMargin),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val cb = graft.sim.Pq.codebooks(e, "vec_id", "embedding",
          m = 8, subDim = 8, ksub = 16, iters = 0)
        val codes = graft.sim.Pq.encode(e, "vec_id", "embedding",
          m = 8, subDim = 8, cb)
        graft.sim.Pq.adcTopK(e.filter(col("vec_id") < 20), codes, cb,
          "vec_id", "embedding", m = 8, subDim = 8, k = 3)
      }),

    // IVF-PQ: the FAISS IndexIVFPQ composition — coarse cells prune the
    // corpus per query, ADC scores only the PROBED cells' codes (the full
    // vectors never enter the search join). Same iters=0 seeding as the
    // two component queries; the oracle is their literal composition, so a
    // drift in either layer (cell routing OR code assignment OR LUT fold)
    // turns this row red even if the component queries stay green.
    QueryDef(
      "q_ann_ivfpq",
      Some(ivfPqOracle),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        graft.sim.IvfPq.topK(e.filter(col("vec_id") < 20), e,
          "vec_id", "embedding", k = 3, numCells = 8, nprobe = 2,
          m = 8, subDim = 8, ksub = 16, iters = 0)
      }),

    // PERSISTED IVF-PQ: the same search routed through a warehouse-backed
    // build-once index (four snapshot tables — centroids, cell map,
    // codebooks, CODES; the codes table is the only corpus-sized one).
    // Oracle = q_ann_ivfpq's: a round-trip through persistence must not
    // change a single rank — any parquet/row-order/codebook drift reddens
    // this row while q_ann_ivfpq stays green.
    QueryDef(
      "q_ann_ivfpq_index",
      Some(ivfPqOracle),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val wh = new graft.tables.Warehouse(s,
          java.nio.file.Files.createTempDirectory("graft-q-ivfpq").toString)
        graft.sim.IvfPq.buildIndex(wh, "ann", e, "vec_id", "embedding",
          numCells = 8, m = 8, subDim = 8, ksub = 16, iters = 0)
        graft.sim.IvfPq.searchIndex(wh, "ann", e.filter(col("vec_id") < 20),
          "vec_id", "embedding", k = 3, nprobe = 2, m = 8, subDim = 8)
      }),

    // INCREMENTAL ANN MAINTENANCE: build the persisted IVF-PQ index from
    // ~80% of the corpus, append the remaining batch via appendToIndex
    // (encode against the FROZEN quantizers, no rebuild), then search.
    // Oracle = the fresh-FULL-build ivfPqOracle: with iters=0 both
    // quantizers seed from the 8/16 lowest-id vectors, all of which live
    // in the base split, so (index + delta) must reproduce the fresh
    // build's ranks exactly — the q_incremental_dedup contract for
    // similarity search. Staleness/rebuild mechanics are spec'd in
    // AnnIncrementalSpec.
    QueryDef(
      "q_ann_incremental",
      Some(ivfPqOracle),
      (s, dir) => {
        val e = Tables.t(s, dir, "embeddings")
        val wh = new graft.tables.Warehouse(s,
          java.nio.file.Files.createTempDirectory("graft-q-annincr").toString)
        val base = e.filter(col("vec_id") < 16 || col("vec_id") % 5 =!= 0)
        val delta = e.filter(col("vec_id") >= 16 && col("vec_id") % 5 === 0)
        graft.sim.IvfPq.buildIndex(wh, "ann", base, "vec_id", "embedding",
          numCells = 8, m = 8, subDim = 8, ksub = 16, iters = 0)
        graft.sim.IvfPq.appendToIndex(wh, "ann", delta, "vec_id",
          "embedding", m = 8, subDim = 8)
        graft.sim.IvfPq.searchIndex(wh, "ann", e.filter(col("vec_id") < 20),
          "vec_id", "embedding", k = 3, nprobe = 2, m = 8, subDim = 8)
      }),

    // Context-window chunking: overlapping token windows (size 32, stride
    // 24) exploded to one row per chunk — the training-data step between
    // cleaning and tokenization. Pure integer window arithmetic → exact
    // SQL twin.
    QueryDef(
      "q_chunk_tokens",
      Some("""WITH d AS (SELECT doc_id,
             |    regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
             |  FROM documents),
             |n AS (SELECT doc_id, toks,
             |    CAST(ceil(greatest(len(toks) - 32, 0)::DOUBLE / 24) AS INT) + 1 AS nwin
             |  FROM d),
             |c AS (SELECT doc_id, toks, unnest(range(0, nwin)) AS chunk_idx FROM n)
             |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
             |  array_to_string(toks[chunk_idx*24+1 : chunk_idx*24+32], ' ') AS chunk_text,
             |  CAST(len(toks[chunk_idx*24+1 : chunk_idx*24+32]) AS INT) AS chunk_tokens
             |FROM c""".stripMargin),
      (s, dir) => graft.text.Chunker.chunkTokens(
        Tables.t(s, dir, "documents").select("doc_id", "text"),
        "text", Seq("doc_id"), chunkSize = 32, stride = 24)),

    // Multimodal frame sampling: one row per sampled frame position, stub
    // per-frame feature = byte at the offset (oracle recomputes it from
    // the blob). The generator/explode shape is what real video sampling
    // plans; only the decode body is the stub.
    QueryDef(
      "q_frame_sample",
      Some("""WITH p AS (SELECT doc_id, encode(text) AS b FROM documents),
             |f AS (SELECT doc_id, b, unnest(range(0,
             |    greatest(CAST(ceil(octet_length(b)::DOUBLE / 64) AS INT), 1))) AS frame_idx
             |  FROM p)
             |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
             |  CAST(frame_idx * 64 AS INT) AS frame_offset,
             |  CASE WHEN octet_length(b) = 0 THEN -1
             |       ELSE ('0x' || substr(hex(b), CAST(frame_idx * 128 + 1 AS INT), 2))::INT
             |  END AS frame_feat
             |FROM f""".stripMargin),
      (s, dir) => Binary.frameSample(
          Binary.attachPayload(Tables.t(s, dir, "documents"), "doc_id", "text"),
          step = 64)
        .select("doc_id", "frame_idx", "frame_offset", "frame_feat")),

    // REAL image decode under the hash gate: each doc gets a deterministic
    // 8×8 P6 PPM (pixel byte j = (doc_id·31 + j·7) mod 256), decodePpm
    // parses the actual bytes — ASCII header fields, then every pixel from
    // positional blob slices — and ppmFeatures reduces the decoded pixels
    // to channel means + a 2×2-downsample checksum. The oracle recomputes
    // the same features from the generator FORMULA, never touching the
    // bytes: a decoder that misparses the header, mis-offsets a pixel, or
    // drops a channel turns the row red. (q_png_decode below runs the
    // same contract through a real COMPRESSED codec via javax.imageio.)
    QueryDef(
      "q_ppm_decode",
      Some("""WITH px AS (SELECT doc_id, unnest(range(0, 64)) AS i FROM documents),
             |v AS (SELECT doc_id, i,
             |  (doc_id*31 + (3*i)*7) % 256 AS r,
             |  (doc_id*31 + (3*i+1)*7) % 256 AS g,
             |  (doc_id*31 + (3*i+2)*7) % 256 AS b
             |FROM px)
             |SELECT doc_id,
             |  CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
             |  CAST(255 AS INT) AS maxval,
             |  round(avg(r), 4) AS mean_r, round(avg(g), 4) AS mean_g,
             |  round(avg(b), 4) AS mean_b,
             |  CAST(sum(CASE WHEN (i % 8) % 2 = 0 AND (i // 8) % 2 = 0
             |       THEN r + g + b ELSE 0 END) AS BIGINT) AS ds_checksum
             |FROM v GROUP BY doc_id""".stripMargin),
      (s, dir) => Binary.ppmFeatures(Binary.decodePpm(
          Binary.ppmFromSeed(
            // decode is the row-local hot loop; a one-file corpus arrives
            // as one partition — spread before paying per-pixel parsing
            Tables.t(s, dir, "documents").select("doc_id")
              .repartition(s.sparkContext.defaultParallelism),
            "doc_id", width = 8, height = 8),
          "ppm"))
        .select("doc_id", "width", "height", "maxval",
          "mean_r", "mean_g", "mean_b", "ds_checksum")),

    // REAL image RESIZE under the hash gate: decode the seed-formula PPM,
    // then 2×2 box-filter downsample the DECODED pixels (avgPool2 — one
    // output pixel per 2×2 block, exact integer 4-tap sums + exact-quarter
    // averages). The oracle recomputes every pooled sum from the seed
    // formula without parsing a byte, so a decoder or kernel that reads
    // any wrong source pixel reddens the row. This retires the last
    // still-image stub surface: resize is now real for decodable formats
    // (resizeStub remains only for opaque codec payloads).
    QueryDef(
      "q_image_resize",
      Some("""WITH g AS (SELECT doc_id, unnest(range(0, 16)) AS p FROM documents),
             |q AS (SELECT doc_id, CAST(p % 4 AS INT) AS px,
             |    CAST(p // 4 AS INT) AS py FROM g)
             |SELECT doc_id, CAST(4 AS INT) AS out_w, CAST(4 AS INT) AS out_h,
             |  px, py,
             |  CAST(list_sum(list_transform(range(0, 4), k ->
             |    (doc_id*31 + (((2*py + k//2)*8 + (2*px + k%2))*3 + 0)*7) % 256))
             |    AS BIGINT) AS r4,
             |  CAST(list_sum(list_transform(range(0, 4), k ->
             |    (doc_id*31 + (((2*py + k//2)*8 + (2*px + k%2))*3 + 1)*7) % 256))
             |    AS BIGINT) AS g4,
             |  CAST(list_sum(list_transform(range(0, 4), k ->
             |    (doc_id*31 + (((2*py + k//2)*8 + (2*px + k%2))*3 + 2)*7) % 256))
             |    AS BIGINT) AS b4,
             |  list_sum(list_transform(range(0, 4), k ->
             |    (doc_id*31 + (((2*py + k//2)*8 + (2*px + k%2))*3 + 0)*7) % 256))
             |    / 4.0 AS r_avg,
             |  list_sum(list_transform(range(0, 4), k ->
             |    (doc_id*31 + (((2*py + k//2)*8 + (2*px + k%2))*3 + 1)*7) % 256))
             |    / 4.0 AS g_avg,
             |  list_sum(list_transform(range(0, 4), k ->
             |    (doc_id*31 + (((2*py + k//2)*8 + (2*px + k%2))*3 + 2)*7) % 256))
             |    / 4.0 AS b_avg
             |FROM q""".stripMargin),
      (s, dir) => Binary.avgPool2(Binary.decodePpm(
          Binary.ppmFromSeed(
            Tables.t(s, dir, "documents").select("doc_id")
              .repartition(s.sparkContext.defaultParallelism),
            "doc_id", width = 8, height = 8),
          "ppm"))
        .select("doc_id", "out_w", "out_h", "px", "py",
          "r4", "g4", "b4", "r_avg", "g_avg", "b_avg")),

    // IMAGE DIFFERENCE-HASH (dHash) — the perceptual fingerprint behind
    // image near-dup detection in crawl pipelines: 18×16 seed-formula
    // pixels are PNG-encoded, REALLY decoded (ImageIO inflate/unfilter,
    // the q_png_decode path), box-downsampled 2× to a 9×8 luminance
    // grid, and each of the 64 bits records whether the right neighbor
    // block is brighter than the left (Y*8+X, X<8). A second hash runs
    // on a deterministically perturbed copy of the DECODED bytes (+120
    // on every 97th byte — a "slightly edited image") and the gate emits
    // both hashes, their Hamming distance, and the near-dup verdict —
    // tiny edits must land within a few bits, which is the property the
    // operator exists for. Everything after the decode is literal-index
    // integer arithmetic (no floats anywhere), so the oracle recomputes
    // both hashes exactly from the formula without parsing a PNG. Scale:
    // row-local kernel over opaque binary columns — the mapInPandas-
    // style multimodal shape, no shuffle at all.
    QueryDef(
      "q_image_dhash",
      Some("""WITH px AS (SELECT doc_id, t.i AS i,
             |    (doc_id*31 + t.i*7) % 256 AS v
             |  FROM documents CROSS JOIN unnest(range(0, 864)) AS t(i)),
             |p2 AS (SELECT doc_id, i,
             |    CASE WHEN i % 97 = 0 THEN (v + 120) % 256 ELSE v END AS v
             |  FROM px),
             |b1 AS (SELECT doc_id,
             |    (((i//3) // 18) // 2) * 9 + ((i//3) % 18) // 2 AS k,
             |    CAST(sum(v) AS BIGINT) AS s
             |  FROM px GROUP BY 1, 2),
             |b2 AS (SELECT doc_id,
             |    (((i//3) // 18) // 2) * 9 + ((i//3) % 18) // 2 AS k,
             |    CAST(sum(v) AS BIGINT) AS s
             |  FROM p2 GROUP BY 1, 2),
             |bits1 AS (SELECT d.doc_id, t.bi,
             |    CASE WHEN c.s > a.s THEN 1 ELSE 0 END AS bit
             |  FROM documents d CROSS JOIN unnest(range(0, 64)) AS t(bi)
             |  JOIN b1 a ON a.doc_id = d.doc_id
             |    AND a.k = (t.bi // 8) * 9 + t.bi % 8
             |  JOIN b1 c ON c.doc_id = d.doc_id
             |    AND c.k = (t.bi // 8) * 9 + t.bi % 8 + 1),
             |bits2 AS (SELECT d.doc_id, t.bi,
             |    CASE WHEN c.s > a.s THEN 1 ELSE 0 END AS bit
             |  FROM documents d CROSS JOIN unnest(range(0, 64)) AS t(bi)
             |  JOIN b2 a ON a.doc_id = d.doc_id
             |    AND a.k = (t.bi // 8) * 9 + t.bi % 8
             |  JOIN b2 c ON c.doc_id = d.doc_id
             |    AND c.k = (t.bi // 8) * 9 + t.bi % 8 + 1),
             |h1 AS (SELECT doc_id,
             |    CAST(sum(CASE WHEN bi < 32
             |      THEN bit * (CAST(1 AS BIGINT) << bi) ELSE 0 END)
             |      AS BIGINT) AS lo,
             |    CAST(sum(CASE WHEN bi >= 32
             |      THEN bit * (CAST(1 AS BIGINT) << (bi - 32)) ELSE 0 END)
             |      AS BIGINT) AS hi
             |  FROM bits1 GROUP BY 1),
             |h2 AS (SELECT doc_id,
             |    CAST(sum(CASE WHEN bi < 32
             |      THEN bit * (CAST(1 AS BIGINT) << bi) ELSE 0 END)
             |      AS BIGINT) AS lo,
             |    CAST(sum(CASE WHEN bi >= 32
             |      THEN bit * (CAST(1 AS BIGINT) << (bi - 32)) ELSE 0 END)
             |      AS BIGINT) AS hi
             |  FROM bits2 GROUP BY 1),
             |hm AS (SELECT x.doc_id,
             |    CAST(sum(abs(x.bit - y.bit)) AS INT) AS hamming
             |  FROM bits1 x JOIN bits2 y
             |    ON y.doc_id = x.doc_id AND y.bi = x.bi
             |  GROUP BY 1)
             |SELECT h1.doc_id, h1.hi AS dhash_hi, h1.lo AS dhash_lo,
             |  h2.hi AS pert_hi, h2.lo AS pert_lo,
             |  hm.hamming, hm.hamming <= 10 AS near
             |FROM h1 JOIN h2 ON h2.doc_id = h1.doc_id
             |JOIN hm ON hm.doc_id = h1.doc_id""".stripMargin),
      (s, dir) => {
        val dec = Binary.decodeImage(Binary.pngFromSeed(
          Tables.t(s, dir, "documents").select("doc_id")
            .repartition(s.sparkContext.defaultParallelism),
          "doc_id", width = 18, height = 16), "png")
        // Same integer arithmetic as the unrolled r20 form, but with
        // RUNTIME indexes inside transform/aggregate lambdas instead of
        // 72·12 + 2·64 + 4·32 literal-index expression nodes (r21, guide
        // §1.2 step 2): the probe showed ~1.5 s/pass of DRIVER time —
        // Catalyst optimization + codegen of the ~3000-node tree — against
        // 1.4 s of actual execution. Block k sums the 12 bytes of its 2×2
        // pixel window, bit i compares blocks (Y,X+1)>(Y,X); all
        // index arithmetic is exact integer math, so the values are
        // bit-identical to the unrolled form (oracle-gated).
        def blocksOf(pxCol: Column) =
          transform(sequence(lit(0), lit(71)), k => {
            val x0 = pmod(k, lit(9)) * 2
            val y0 = (k / 9).cast("int") * 2
            (for (dy <- 0 to 1; dx <- 0 to 1; c <- 0 to 2)
              yield element_at(pxCol,
                (lit(3) * ((y0 + lit(dy)) * 18 + (x0 + lit(dx)))
                  + lit(c) + lit(1)).cast("int")))
              .reduce(_ + _).cast("long")
          })
        def bitsOf(bl: Column) =
          transform(sequence(lit(0), lit(63)), i => {
            val base = (i / 8).cast("int") * 9 + pmod(i, lit(8))
            when(element_at(bl, base + 2) >
              element_at(bl, base + 1), 1).otherwise(0)
          })
        val pows = typedlit((0 until 32).map(b => 1L << b))
        def half(bits: Column, from: Int) =
          aggregate(sequence(lit(0), lit(31)), lit(0L),
            (acc, i) => acc + element_at(bits, (i + lit(from + 1)).cast("int"))
              .cast("long") * element_at(pows, (i + 1).cast("int")))
        val withBits = dec
          .withColumn("px2", transform(col("pixels"),
            (v, i) => when(pmod(i, lit(97)) === 0, pmod(v + 120, lit(256)))
              .otherwise(v)))
          .withColumn("bl1", blocksOf(col("pixels")))
          .withColumn("bl2", blocksOf(col("px2")))
          .withColumn("bits1", bitsOf(col("bl1")))
          .withColumn("bits2", bitsOf(col("bl2")))
        val hamming = aggregate(sequence(lit(0), lit(63)), lit(0),
          (acc, i) => acc + abs(element_at(col("bits1"), (i + 1).cast("int"))
            - element_at(col("bits2"), (i + 1).cast("int"))))
        withBits.select(col("doc_id"),
          half(col("bits1"), 32).as("dhash_hi"),
          half(col("bits1"), 0).as("dhash_lo"),
          half(col("bits2"), 32).as("pert_hi"),
          half(col("bits2"), 0).as("pert_lo"),
          hamming.cast("int").as("hamming"),
          (hamming <= 10).as("near"))
      }),

    // REAL compressed-image decode under the hash gate: the same
    // seed-formula pixels as q_ppm_decode, but ENCODED to PNG with the
    // JDK's javax.imageio and decoded back through ImageIO.read in
    // batched mapPartitions (decodeImage). PNG is lossless, so the
    // decoded pixels must equal the formula exactly — the oracle
    // recomputes the features from the formula and never parses a PNG.
    // Gates a real inflate/unfilter codec path, not byte slicing.
    QueryDef(
      "q_png_decode",
      Some("""WITH px AS (SELECT doc_id, unnest(range(0, 64)) AS i FROM documents),
             |v AS (SELECT doc_id, i,
             |  (doc_id*31 + (3*i)*7) % 256 AS r,
             |  (doc_id*31 + (3*i+1)*7) % 256 AS g,
             |  (doc_id*31 + (3*i+2)*7) % 256 AS b
             |FROM px)
             |SELECT doc_id,
             |  CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
             |  round(avg(r), 4) AS mean_r, round(avg(g), 4) AS mean_g,
             |  round(avg(b), 4) AS mean_b,
             |  CAST(sum(CASE WHEN (i % 8) % 2 = 0 AND (i // 8) % 2 = 0
             |       THEN r + g + b ELSE 0 END) AS BIGINT) AS ds_checksum
             |FROM v GROUP BY doc_id""".stripMargin),
      (s, dir) => Binary.ppmFeatures(Binary.decodeImage(
          Binary.pngFromSeed(
            // same one-partition-input hazard as q_ppm_decode
            Tables.t(s, dir, "documents").select("doc_id")
              .repartition(s.sparkContext.defaultParallelism),
            "doc_id", width = 8, height = 8),
          "png"))
        .select("doc_id", "width", "height",
          "mean_r", "mean_g", "mean_b", "ds_checksum")),

    // REAL LOSSY decode under a tolerance gate: the same seed-formula
    // pixels encoded to JPEG (quantization + chroma subsampling make
    // byte-exact recovery impossible by design), decoded back through
    // ImageIO. The gate is the lossy-safe contract: dimensions must be
    // EXACT (from the decoded header), each decoded channel mean within
    // ε=12 of the formula mean, and the whole-image per-pixel mean
    // absolute error ≤ 40 — all recomputed in-plan from the seed.
    // Empirical bounds over 500 seeds at default JDK JPEG quality:
    // channel-mean error ≤ 5.375, pixel MAE ≤ 19.45 (JpegSpec pins
    // both), so the thresholds carry ≥2× margin while NULL pixels or a
    // garbage inflate (~85 MAE on noise) land far outside. Byte-exact
    // pixel extraction through this SAME decodeImage path is already
    // gated by q_png_decode; this query adds the evidence that a lossy
    // bitstream decodes within tolerance. The oracle is all-true
    // booleans; the decode evidence lives Spark-side, where a failure
    // flips a boolean (or NULLs width) and reddens the hash.
    QueryDef(
      "q_jpeg_decode",
      Some("""SELECT doc_id, CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
             |  true AS mean_r_ok, true AS mean_g_ok, true AS mean_b_ok,
             |  true AS mae_ok
             |FROM documents""".stripMargin),
      (s, dir) => {
        val dec = Binary.ppmFeatures(Binary.decodeImage(
          Binary.jpegFromSeed(
            Tables.t(s, dir, "documents").select("doc_id")
              .repartition(s.sparkContext.defaultParallelism),
            "doc_id", width = 8, height = 8),
          "jpeg"))
        // formula pixel j = (seed·31 + j·7) % 256, recomputed in-plan
        def formulaMean(c: Int) =
          aggregate(sequence(lit(0), lit(63)), lit(0L),
            (acc, i) => acc + (col("doc_id") * 31 + (i * 3 + c) * 7) % 256)
            .cast("double") / 64.0
        def ok(decoded: String, c: Int) =
          (abs(col(decoded) - formulaMean(c)) <= 12.0).as(s"${decoded}_ok")
        val mae = aggregate(sequence(lit(0), lit(191)), lit(0L),
          (acc, j) => acc + abs(element_at(col("pixels"), j + 1) -
            (col("doc_id") * 31 + j * 7) % 256)).cast("double") / 192.0
        dec.select(col("doc_id"), col("width"), col("height"),
          ok("mean_r", 0), ok("mean_g", 1), ok("mean_b", 2),
          (mae <= 40.0).as("mae_ok"))
      }),

    // REAL VIDEO decode (MJPEG-in-AVI) under the q_jpeg_decode-style
    // tolerance gate: each doc gets a 3-frame AVI whose JPEG frames carry
    // the seed formula at frame seed doc_id·101 + f; decodeAviFrames
    // walks the actual RIFF container (chunk sizes, even-byte padding,
    // LIST nesting, movi discovery) and ImageIO-decodes each frame. The
    // gate: EXACTLY 3 frames per doc (rows+hash), exact dims, per-channel
    // means within ε=12 of the in-plan formula means, per-pixel MAE ≤ 40
    // (the q_jpeg_decode bounds, which carry ≥2× empirical margin). A
    // mis-walked container drops/duplicates rows; a mis-decoded frame
    // flips a boolean — either reddens the gate.
    QueryDef(
      "q_video_frames",
      Some("""SELECT doc_id, CAST(f AS INT) AS frame_idx,
             |  CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
             |  true AS mean_r_ok, true AS mean_g_ok, true AS mean_b_ok,
             |  true AS mae_ok
             |FROM (SELECT doc_id, unnest(range(0, 3)) AS f
             |  FROM documents)""".stripMargin),
      (s, dir) => {
        val dec = Binary.ppmFeatures(Binary.decodeAviFrames(
          Binary.aviFromSeed(
            Tables.t(s, dir, "documents").select("doc_id")
              .repartition(s.sparkContext.defaultParallelism),
            "doc_id", width = 8, height = 8, nFrames = 3),
          "avi"))
        val fseed = col("doc_id") * 101 + col("frame_idx")
        def formulaMean(c: Int) =
          aggregate(sequence(lit(0), lit(63)), lit(0L),
            (acc, i) => acc + (fseed * 31 + (i * 3 + c) * 7) % 256)
            .cast("double") / 64.0
        def ok(decoded: String, c: Int) =
          (abs(col(decoded) - formulaMean(c)) <= 12.0).as(s"${decoded}_ok")
        val mae = aggregate(sequence(lit(0), lit(191)), lit(0L),
          (acc, j) => acc + abs(element_at(col("pixels"), j + 1) -
            (fseed * 31 + j * 7) % 256)).cast("double") / 192.0
        dec.select(col("doc_id"), col("frame_idx"), col("width"),
          col("height"), ok("mean_r", 0), ok("mean_g", 1), ok("mean_b", 2),
          (mae <= 40.0).as("mae_ok"))
      }),

    // REAL audio decode under the hash gate: each doc gets a deterministic
    // 64-sample 16-bit PCM WAV (sample j = (doc_id·13 + j·11) mod 65536,
    // two's-complement signed), decodeWav parses the actual bytes — RIFF
    // magic, little-endian fmt fields, every sample with sign handling —
    // and wavFeatures reduces to mean/RMS/zero-crossings. The oracle
    // recomputes the features from the generator FORMULA, never touching
    // bytes: a decoder that misreads an LE field, drops sign handling or
    // mis-offsets a sample turns the row red. (PPM, PNG, JPEG and WAV are
    // now real decoders; only video remains stubbed — the JDK has no
    // codec.)
    QueryDef(
      "q_wav_decode",
      Some {
        def s(e: String) =
          s"""CASE WHEN (doc_id*13 + ($e)*11) % 65536 >= 32768
             |  THEN (doc_id*13 + ($e)*11) % 65536 - 65536
             |  ELSE (doc_id*13 + ($e)*11) % 65536 END""".stripMargin
        s"""WITH sm AS (SELECT doc_id, ${s("i")} AS smp
           |  FROM (SELECT doc_id, unnest(range(0, 64)) AS i FROM documents)),
           |zc AS (SELECT doc_id,
           |    CAST(sum(CASE WHEN s1 * s2 < 0 THEN 1 ELSE 0 END) AS INT) AS zero_crossings
           |  FROM (SELECT doc_id, ${s("i")} AS s1, ${s("i + 1")} AS s2
           |    FROM (SELECT doc_id, unnest(range(0, 63)) AS i FROM documents))
           |  GROUP BY doc_id)
           |SELECT sm.doc_id, CAST(8000 AS INT) AS sample_rate,
           |  CAST(64 AS INT) AS n_samples,
           |  round(avg(smp), 4) AS mean_amp,
           |  round(sqrt(avg(smp * smp)), 4) AS rms,
           |  any_value(zc.zero_crossings) AS zero_crossings
           |FROM sm JOIN zc USING (doc_id) GROUP BY sm.doc_id""".stripMargin
      },
      (s, dir) => Binary.wavFeatures(Binary.decodeWav(
          Binary.wavFromSeed(
            // same one-partition-input hazard as q_ppm_decode
            Tables.t(s, dir, "documents").select("doc_id")
              .repartition(s.sparkContext.defaultParallelism),
            "doc_id", nSamples = 64),
          "wav"))
        .select("doc_id", "sample_rate", "n_samples",
          "mean_amp", "rms", "zero_crossings")),

    // Multimodal binary plumbing for NON-image media (video, compressed
    // audio): the decode is a stub (the JDK has no codecs for these) but
    // its deterministic byte features are externally checkable: DuckDB
    // recomputes length/head/checksum over the same blob.
    QueryDef(
      "q_multimodal",
      Some("""WITH p AS (SELECT doc_id, encode(text) AS b FROM documents)
             |SELECT doc_id,
             |  octet_length(b)::BIGINT AS byte_len,
             |  CAST(doc_id % 640 AS INT) AS width,
             |  CAST(doc_id % 480 AS INT) AS height,
             |  octet_length(b)::BIGINT AS feat_byte_len,
             |  CASE WHEN octet_length(b) = 0 THEN -1
             |       ELSE ('0x' || substr(hex(b), 1, 2))::INT END AS feat_head,
             |  COALESCE(list_sum(list_transform(range(0, octet_length(b)),
             |    i -> ('0x' || substr(hex(b), 2*i+1, 2))::INT)), 0)::BIGINT AS feat_checksum
             |FROM p""".stripMargin),
      (s, dir) => Binary.decodeFeatures(
          Binary.attachPayload(Tables.t(s, dir, "documents"), "doc_id", "text"))
        .select("doc_id", "meta.byte_len", "meta.width", "meta.height",
          "feat_byte_len", "feat_head", "feat_checksum"))
  )
}

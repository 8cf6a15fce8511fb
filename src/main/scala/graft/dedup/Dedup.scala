package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Materialize._

/** Corpus deduplication for training-data pipelines. Every stage is a
  * DataFrame→DataFrame transform with bounded shuffles — no driver-side
  * state — so the same code runs on 500 fixture docs or a 100 TB corpus.
  */
object Dedup {

  /** Normalization applied before any dedup comparison. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Exact dedup by content hash: one shuffle on the (hashed) normalized
    * text. Keeps the smallest id as canonical — deterministic, unlike
    * dropDuplicates which keeps an arbitrary row. At scale, group on the
    * 256-bit digest rather than the full text to keep shuffle rows small.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), sha2(normalized(col(textCol)), 256).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** Distinct word set per document (unigram shingles). NO spread
    * repartition here (r21): the r20 graftSpread at this site shipped the
    * full text column through an extra exchange on every consumer, and the
    * driver measured the wordSets family 20–30% SLOWER for it
    * (q_word_jaccard 0.77×, q_dedup_auto 0.70×, q_dedup_recall 0.81×,
    * q_source_overlap 0.79× vs r19) — the split/array_distinct loop is
    * cheap relative to the downstream jaccard machinery, unlike the
    * shingling loops that keep their spread (MinHashLSH.shingles,
    * SketchQueries.hashes). Callers with a measured hot fused loop spread
    * explicitly at the call site.
    */
  def wordSets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      array_distinct(split(normalized(col(textCol)), " ")).as("words"))

  /** Distinct character n-gram set per document — the shingle family for
    * short/no-whitespace text (CJK, code, URLs) where word tokens don't
    * exist. Row-local: `sequence` + `transform` over the normalized string,
    * no UDF. Documents shorter than n yield an empty set.
    */
  def charNgramSets(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    // normalized() MUST be materialized as its own column: inlined into
    // the transform lambda, Catalyst re-evaluates the whole regex chain
    // for every gram — O(len²) per document (the Fingerprint lesson;
    // measured ~2 s/pass → ~60 ms on the 300-doc fixture slice)
    val t = col("__t")
    val grams = when(length(t) >= n,
        array_distinct(transform(
          sequence(lit(1), length(t) - (n - 1)),
          i => t.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), col(textCol))
      .graftSpread() // one-task fixture scans: spread before the O(len·n) gram loop
      .withColumn("__t", normalized(col(textCol)))
      .select(col(idCol), grams.as("grams"))
  }

  /** Physical strategy for [[jaccardPairs]]. */
  sealed trait JaccardStrategy
  /** Probe a bounded sample to pick bitmask vs inverted index. */
  case object JaccardAuto extends JaccardStrategy
  /** Force the bounded-vocabulary bitmask path (falls back if vocab or
    * doc count exceed the caps). */
  case object JaccardBitmask extends JaccardStrategy
  /** Force the inverted-index path. */
  case object JaccardInverted extends JaccardStrategy

  /** Vocabulary cap for the (multi-word) bitmask path: vocab ≤ 64·k words
    * packs each document into k longs. 1024 ⇒ ≤16 longs per doc.
    */
  val maskMaxVocab = 1024

  /** DISTINCT-WORD-SET cap for the bitmask path. The bitmask candidate
    * stage is quadratic in distinct masks within a size band (docs dedup
    * to their word-set mask first — r10: quadratic work moved from
    * documents to distinct sets; r12: the all-pairs crossJoin became a
    * size-banded equi-join, so only pairs whose popcount sizes can reach
    * the threshold are materialized). The guard bounds the worst case
    * (all sets one size): 10000 sets ⇒ ≤50M popcount pairs, a bounded
    * flat cost. Past the cap the fallback is the prefix-filtered
    * inverted index over the DISTINCT SETS (r12 — never worse than the
    * doc-level index, since sets ≤ docs), which for a REAL big-vocab
    * corpus is the better plan anyway: distinct word-sets there ≈
    * distinct documents and prefix pruning actually bites. Template
    * corpora (tiny vocab, spread set sizes) should RAISE the cap
    * instead — the banded popcount join is the only exact plan whose
    * cost doesn't explode when every feature is common; the sf1
    * measurement has the numbers.
    *
    * Cap sizing (retuned r12 after the sf10 run): the worst case is all
    * sets in one size band — ~0.5·cap² candidate pairs, each ONE
    * codegen'd long-AND/popcount fold. At 100k sets that is ≤5G integer
    * folds, seconds across a handful of cores and trivially partitioned;
    * the memory footprint is the ≤16-long masks themselves (≈13 MB per
    * 100k sets broadcast side). The sf10 measurement showed the OLD 10k
    * default tripping mid-decade on a template corpus slice (44.5k sets)
    * and routing q_dedup_auto to the set-level inverted fallback — a 31×
    * wall-clock step (65 s vs the banded path's projected ~25 s) purely
    * from the routing cliff. Organic corpora with millions of distinct
    * sets still cross the cap and take the bounded fallback, which is
    * the right plan there (prefix pruning works when features are rare).
    */
  val defaultBitmaskMaxSets = 100000L

  /** Cap on the REPLICA sum of the size-banded candidate broadcast
    * (Σ_s band-width(s) rows, each a slim (sb, pb, ps) triple ≈ 16 B):
    * 4M replicas ≈ 64 MB payload — heavy but deliverable; past it the
    * set-level inverted fallback is the safer physical plan. Injectable
    * (r14) so the reroute branch is testable with a tiny cap. */
  val defaultMaxBandReplicas = 4000000L

  /** @deprecated renamed — since r10 the guard caps DISTINCT WORD-SET
    * masks, not documents; use [[defaultBitmaskMaxSets]]. This alias
    * preserves ONLY references to the constant by its old name; the
    * matching named parameter of [[jaccardPairs]]/[[jaccardPairsFeatures]]
    * was renamed outright (`bitmaskMaxDocs = …` keyword call sites must
    * update to `bitmaskMaxSets = …`).
    */
  @deprecated("the cap bounds distinct word-set masks, not documents; use defaultBitmaskMaxSets", "r11")
  val defaultBitmaskMaxDocs = defaultBitmaskMaxSets

  /** Exact word-set Jaccard pairs ≥ threshold. Two physical strategies:
    *
    * - BITMASK (vocab ≤ 64 AND few docs): each word gets a bit, each
    *   document reduces to one long; per-pair Jaccard is
    *   `popcount(a&b)/popcount(a|b)` — pure codegen integer ops. (Per-pair
    *   array_intersect on the same data measured ~300 s for 500 docs; this
    *   runs the 5 000-doc / 12.5M-pair case in seconds.) Still quadratic in
    *   docs, so a guard on the DISTINCT-MASK count (r10 semantics: `bitmaskMaxSets`
    *   caps word-set masks, not raw documents) rejects it past the cap.
    * - INVERTED INDEX with PREFIX FILTERING (exact): each document indexes
    *   only its rarest `n − ceil(t·n) + 1` features under a global
    *   (df, feature) order; any pair with J ≥ t provably shares an indexed
    *   feature, so candidate recall is 1.0 while the equi-join touches a
    *   small fraction of the feature rows. Survivors are verified with
    *   exact intersection counts over ALL features — reported Jaccard
    *   values are exact. `dfCap` additionally drops ubiquitous features
    *   from the index (a pair sharing only capped features is missed; at
    *   dedup thresholds that requires near-stopword-only documents, which
    *   belong to the exact-dedup path anyway).
    *
    * Strategy choice is an explicit parameter; `JaccardAuto` probes a
    * bounded sample of the word table (never a full corpus scan) and only
    * pays the exact ≤64-vocab check when the sample already looks tiny.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, strategy: JaccardStrategy = JaccardAuto,
      dfCap: Option[Double] = None,
      bitmaskMaxSets: Long = defaultBitmaskMaxSets,
      maxBandReplicas: Long = defaultMaxBandReplicas): DataFrame =
    jaccardPairsFeatures(
      wordSets(df, idCol, textCol)
        // explode_outer + null filter: inner explode makes
        // InferFiltersFromGenerate clone the word-set expression into a
        // pre-shuffle filter that re-runs the normalization per row
        .select(col(idCol).as("doc_id"), explode_outer(col("words")).as("word"))
        .filter(col("word").isNotNull),
      threshold, strategy, dfCap, bitmaskMaxSets, maxBandReplicas)

  /** Exact Jaccard over an arbitrary exploded feature table
    * `(doc_id, word)` — words, char n-grams, shingle hashes, anything
    * set-valued. Same strategy machinery as [[jaccardPairs]].
    */
  def jaccardPairsFeatures(features: DataFrame, threshold: Double,
      strategy: JaccardStrategy = JaccardAuto, dfCap: Option[Double] = None,
      bitmaskMaxSets: Long = defaultBitmaskMaxSets,
      maxBandReplicas: Long = defaultMaxBandReplicas): DataFrame = {
    // public API guard (r13): both physical strategies divide by the
    // threshold — the bitmask band bound floor(pb/t) is Infinity at t=0
    // (ANSI cast error) and a near-zero t replicates every set into
    // thousands of band slots; the prefix filter's index length
    // n − ⌈t·n⌉ + 1 likewise only makes sense on (0, 1].
    require(threshold > 0.0 && threshold <= 1.0,
      s"jaccard threshold must be in (0, 1], got $threshold")
    val w = features
    strategy match {
      case JaccardInverted =>
        // materialize ONCE: the feature table feeds df counts, sizes, the
        // prefix index and both verification sides — ReuseExchange does not
        // unify them (column pruning pushes different projections below
        // each exchange), so without this the upstream shingling re-runs
        // per consumer
        jaccardInvertedIndex(w.graftCheckpoint(), threshold, dfCap)
      case JaccardAuto | JaccardBitmask =>
        // the bitmask path assigns bits via a String-keyed literal map —
        // a non-string feature table (e.g. basket part keys) routes to the
        // inverted index instead of failing at analysis time
        val stringFeatures = w.schema("word").dataType ==
          org.apache.spark.sql.types.StringType
        // bounded sample first: a big vocabulary disqualifies without ever
        // scanning the corpus; only a small-looking vocab pays more
        val sampleSmall = stringFeatures &&
          w.limit(65536).select("word").distinct().count() <= maskMaxVocab
        if (!sampleSmall) jaccardInvertedIndex(w.graftCheckpoint(), threshold, dfCap)
        else {
          // materialize ONCE: the exact eligibility pass, the vocab
          // collect and both mask builds all consume the feature table —
          // recomputing the upstream shingling per action dominated the
          // fixture runtime before this
          val wc = w.graftCheckpoint()
          val exactVocab =
            wc.agg(countDistinct(col("word"))).first().getLong(0)
          // doc count no longer disqualifies: the bitmask path dedups to
          // distinct word-set masks and guards on THAT count internally,
          // falling back to the inverted index past bitmaskMaxSets sets
          if (exactVocab <= maskMaxVocab)
            jaccardBitmask(wc, threshold, bitmaskMaxSets, dfCap,
              maxBandReplicas)
          else jaccardInvertedIndex(wc, threshold, dfCap)
        }
    }
  }

  /** Bitmask Jaccard, quadratic only in DISTINCT WORD-SETS within a
    * size band (r10/r12): docs dedup to their set mask first, the
    * popcount join runs over the (set_id, mask) relation, and qualifying
    * set pairs expand back to doc pairs through output-bounded equi-joins
    * (identical-set docs pair at J = 1.0 via a set_id self-join). On
    * template-shaped corpora — tiny vocab, massive doc counts, the exact
    * case that defeats the inverted index's prefix pruning — distinct
    * sets grow far slower than docs: the sf1 probe had q_word_jaccard at
    * 203 s via the doc-quadratic path and ~2 s via this one.
    *
    * r12 hot-loop shape (sf1-measured): masks live in nWords SCALAR LONG
    * columns (m0…mk), NOT an array — the candidate condition is then pure
    * codegen'd long AND/popcount arithmetic with no per-access array or
    * null checks; the candidate stage is a broadcast EQUI-join on partner
    * popcount size (J ≥ t ⇒ min ≥ t·max, b side replicated over its
    * ≤(1/t−t)·s+1 compatible sizes) rather than an all-pairs crossJoin;
    * and the threshold test stays in the integer domain (inter·(1+t) ≥
    * t·(pa+pb) ⟺ J ≥ t) so the pushed-down join condition evaluates ONE
    * popcount fold per candidate. Real (big-vocab) corpora have ~as many
    * sets as docs and fall back to the set-level inverted index via the
    * `maxSets` guard.
    */
  private def jaccardBitmask(w: DataFrame, threshold: Double,
      maxSets: Long, dfCap: Option[Double],
      maxBandReplicas: Long = defaultMaxBandReplicas): DataFrame = {
    // the caller guarantees vocab ≤ maskMaxVocab: assign bits driver-side
    // (a global row_number window here moved all words to one partition and
    // was the repo's last unpartitioned-window warning) and inline them as
    // a literal map — codegen'd lookup, zero extra shuffle. Each document
    // packs into ceil(vocab/64) longs; per-pair Jaccard is pure popcount
    // arithmetic. `w` arrives materialized (localCheckpoint in the caller).
    val bitOf: Map[String, Int] = w.select("word").distinct()
      .orderBy("word").collect().map(_.getString(0)).zipWithIndex.toMap
    val nWords = math.max(1, (bitOf.size + 63) / 64)
    val mcols = (0 until nWords).map(i => s"m$i")
    val withBit = w.withColumn("bit", element_at(typedlit(bitOf), col("word")))
    val docMasks =
      (if (nWords == 1)
        // single-long fast path: scalar codegen ops throughout
        withBit.groupBy("doc_id")
          .agg(bit_or(expr("shiftleft(1L, bit)")).as("m0"))
      else
        // bit b lives in long b/64 at position b%64; the per-long masks
        // land in flat columns m0…mk via the intermediate map
        withBit
          .withColumn("wi", (col("bit") / 64).cast("int"))
          .groupBy("doc_id", "wi")
          .agg(bit_or(expr("shiftleft(1L, bit % 64)")).as("m"))
          .groupBy("doc_id")
          .agg(map_from_entries(collect_list(struct(col("wi"), col("m"))))
            .as("mm"))
          .select(col("doc_id") +: (0 until nWords).map(i =>
            coalesce(element_at(col("mm"), i), lit(0L)).as(s"m$i")): _*)
      ).graftCheckpoint() // feeds the set dedup AND the membership join
    val sets = docMasks.groupBy(mcols.head, mcols.tail: _*)
      .agg(min("doc_id").as("set_id"))
      .graftCheckpoint() // counted for the guard, then joined three ways
    val member = docMasks.join(sets, mcols).select("set_id", "doc_id")
    def pcOf(cols: Seq[String]) =
      cols.map(c => bit_count(col(c))).reduce(_ + _)
    // REPLICATION-AWARE guard (r13): the size-banded candidate join
    // broadcasts one replica per (set, compatible partner size) — the
    // broadcast relation has Σ_s (⌊p_s/t⌋ − ⌈t·p_s⌉ + 1) rows, NOT
    // |sets| rows, and the band width ≈ (1/t − t)·p grows with set size:
    // 100k sets of popcount 500 at t = 0.9 replicate to ~10.6M rows.
    // Bound the REPLICAS (exact sum, one tiny agg over ≤cap set rows),
    // not just the set count. The cap is rows, and post-r13 each replica
    // row is slim — (sb: long, pb: int, ps: int) = 16 data bytes, masks
    // excluded — so 4M replicas ≈ 64 MB payload / low-hundreds-MB hashed
    // relation per executor: heavy but deliverable; past it the set-level
    // inverted fallback (measured 65 s vs 55 s banded on the 44.5k-set
    // slice) is the safer plan. The sf-fixture slices (31-word vocab,
    // t = 0.9 → ≤7 replicas/set) sit orders of magnitude under it.
    val nSets = sets.count()
    // r14 (advisor): pc/threshold is unbounded in the DOUBLE domain — at
    // extreme-but-legal thresholds (t ≲ 1e-16) floor()'s long result
    // overflows and the guard built to PREVENT blowups would itself ANSI-
    // error instead of routing to the fallback. Two clamps keep the sum
    // inside long everywhere: (1) the per-set band width at 1e12 BEFORE
    // leaving double (engages only when pc/t > 1e12, i.e. t < ~1e-9), and
    // (2) — r15, advisor — the per-set LONG term at maxBandReplicas + 1:
    // routing only needs to distinguish Σ ≤ cap from Σ > cap, and one set
    // already over the cap decides it, so clamping each term at cap + 1
    // loses nothing while bounding Σ ≤ nSets·(cap+1). With the short-
    // circuit above, nSets ≤ maxSets here, so overflow would need a
    // caller to inject maxSets·(maxBandReplicas+1) > 2⁶³ — rejected
    // explicitly instead of wrapping silently.
    val termCap: Long = math.min(maxBandReplicas, Long.MaxValue - 1) + 1
    require(maxSets <= Long.MaxValue / termCap,
      s"bitmaskMaxSets ($maxSets) × (maxBandReplicas+1) ($termCap) " +
        "overflows the replica-sum guard")
    val bandReplicas: Long =
      if (nSets > maxSets) Long.MaxValue // already routed away
      else sets.select(least(
          (floor(least(pcOf(mcols) / threshold, lit(1.0e12)) + 1e-9)
            - ceil(pcOf(mcols) * threshold - 1e-9) + 1).cast("long"),
          lit(termCap)).as("bw"))
        .agg(coalesce(sum("bw"), lit(0L))).first().getLong(0)
    val qual =
      if (nSets > maxSets || bandReplicas > maxBandReplicas) {
        // CAP OVERFLOW (r12, found by the sf1 run): the old fallback
        // re-ran the inverted index over ALL DOCUMENTS — on the template
        // corpora this path exists for, tiny vocab defeats prefix pruning
        // and the fallback was the blowup the bitmask path was built to
        // avoid. Run the prefix-filtered index over the DISTINCT SETS
        // instead (one feature row set per representative doc) and expand
        // winners back to doc pairs below: work is bounded by sets ≤ docs
        // — never worse than the doc-level fallback — and doc-count
        // growth alone no longer reaches the candidate join at all.
        val setFeatures = w
          .join(sets.select(col("set_id").as("doc_id")), Seq("doc_id"))
          .graftCheckpoint()
        jaccardInvertedIndex(setFeatures, threshold, dfCap)
          .select(col("doc_a").as("sa"), col("doc_b").as("sb"),
            col("jaccard"))
      } else {
        val a = sets.select(col("set_id").as("sa") +:
          pcOf(mcols).as("pa") +:
          mcols.map(c => col(c).as(s"a_$c")): _*)
        // SIZE-BANDED candidate join (r12, replaces the all-pairs
        // crossJoin): J ≥ t ⇒ min(|A|,|B|) ≥ t·max(|A|,|B|), so each set
        // only ever pairs with sets whose popcount size lies in
        // [⌈t·s⌉, ⌊s/t⌋]. The b side replicates each set to every
        // compatible partner size and the candidate stage becomes a
        // broadcast EQUI-join on that size — incompatible pairs are never
        // materialized. Bounds are ε-widened: 0.9·20 = 18.000…004 in
        // doubles, and an unwidened ⌈·⌉ would silently drop
        // exact-boundary pairs (|A|=18 ⊂ |B|=20 IS J = 0.9).
        // Over-inclusion is harmless — every candidate is verified.
        //
        // r13: the REPLICATED relation carries only (sb, pb, ps) — the
        // ≤16-long masks do NOT ride the band explosion (at the cap that
        // replication multiplied the old "13 MB per 100k sets" estimate
        // by the band width into GBs). Masks come back via a SECOND,
        // non-exploded broadcast keyed on sb: both probes pipeline in
        // the same codegen stage, so candidates are never materialized
        // between them, and the broadcast payload is bounded by
        // bandReplicas·16 B (guarded above) + |sets|·masks (the original
        // 13 MB/100k figure, now actually true).
        val bSlim = sets.select(col("set_id").as("sb"),
            pcOf(mcols).as("pb"))
          // upper band edge clamped (r14, defense-in-depth): any set
          // whose pb/t exceeds int range carries a band width far past
          // the replica guard, so this branch is unreachable for such
          // thresholds — but the clamp keeps the UNCHOSEN plan free of
          // ANSI-overflow expressions should the guard ever move
          .withColumn("ps", explode(sequence(
            ceil(col("pb") * threshold - 1e-9).cast("int"),
            least(floor(least(col("pb") / threshold, lit(1.0e9)) + 1e-9),
              lit(2000000000L)).cast("int"))))
        val bMasks = sets.select(col("set_id").as("sb_m") +:
          mcols.map(c => col(c).as(s"b_$c")): _*)
        // (A block-index-keyed variant of this join — explode each side
        // over its nonzero mask blocks so shard-disjoint vocabularies
        // never pair — was prototyped and MEASURED NEUTRAL at sf10:
        // 59 s vs 55 s on q_dedup_auto's 44.5k-set slice, because a
        // 64-bit block spans ~2 of the 10 replica shards, cutting
        // candidates only ~3× while the min-shared-block uniqueness
        // filter doubles per-candidate cost. Reverted; it would win
        // only when shards-per-block ≪ 1, i.e. hundreds of small
        // disjoint vocabularies, at which point set counts cross
        // `maxSets` into the inverted fallback anyway.)
        val setPairs = a.join(broadcast(bSlim),
            col("pa") === col("ps") && col("sa") < col("sb"))
          .join(broadcast(bMasks), col("sb") === col("sb_m"))
          .drop("sb_m")
        // ONE popcount fold per pair: |A∪B| = |A| + |B| − |A∩B| and the
        // sizes already ride the join, so no union fold; the threshold
        // test stays in the INTEGER domain — inter·(1+t) ≥ t·(pa+pb) ⟺
        // J ≥ t (ε admits exact-boundary pairs only: adjacent possible J
        // values differ by ≥ 1/(2·64·nWords)², far above ε) — so the
        // pushed-down condition is one flat scalar popcount sum.
        val inter = mcols.map(c =>
          bit_count(col(s"a_$c").bitwiseAND(col(s"b_$c")))).reduce(_ + _)
        setPairs
          .withColumn("inter", inter)
          .filter(col("inter") * (1.0 + threshold)
            >= (col("pa") + col("pb")) * threshold - 1e-9)
          .withColumn("jaccard",
            col("inter").cast("double") / (col("pa") + col("pb") - col("inter")))
          .select("sa", "sb", "jaccard")
      }
    // expansion joins are sized by the OUTPUT pair count, nothing more
    val crossSet = qual
      .join(member.select(col("set_id").as("sa"), col("doc_id").as("da")),
        Seq("sa"))
      .join(member.select(col("set_id").as("sb"), col("doc_id").as("db")),
        Seq("sb"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("jaccard"))
    val withinSet = member.select(col("set_id"), col("doc_id").as("doc_a"))
      .join(member.select(col("set_id"), col("doc_id").as("doc_b")),
        Seq("set_id"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(1.0).as("jaccard"))
    crossSet.unionByName(withinSet)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Inverted-index Jaccard with PREFIX FILTERING (Chaudhuri/Bayardo
    * set-similarity join): J(a,b) ≥ t ⇒ |a∩b| ≥ ⌈t·|a|⌉, so if a's
    * features are sorted under a global total order, a pair at threshold
    * MUST share one of a's first |a| − ⌈t·|a|⌉ + 1 features — indexing only
    * that prefix (sorted by ascending document frequency, so the indexed
    * features are the rarest) keeps candidate recall at exactly 1.0 while
    * the self-join touches ~(1−t) of the feature rows, and those the least
    * skewed ones. Candidates are then verified with exact intersection
    * counts over ALL features. `dfCap` additionally drops features with
    * df > cap·nDocs from the index (documented recall trade on
    * boilerplate-only pairs; verification stays exact).
    *
    * `w` must arrive materialized (localCheckpoint in the caller): df
    * counts, sizes, the prefix index and both verification sides all
    * consume it.
    */
  private def jaccardInvertedIndex(w: DataFrame, threshold: Double,
      dfCap: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NOT checkpointed (r21, measured): sizes/prefix appear in several
    // consumers, but their exchanges canonicalize identically and
    // ReuseExchange shares them within the one action — eager
    // checkpoints here serialized the DAG into extra jobs and measured
    // q_basket_jaccard 1.35× / q_ngram_jaccard 1.16× SLOWER.
    val sizes = w.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val dfTable = w.groupBy("word").agg(count(lit(1)).as("__df"))
    val indexed = dfCap match {
      case Some(cap) =>
        val nDocs = w.select("doc_id").distinct().count()
        dfTable.filter(col("__df") <= cap * nDocs)
      case None => dfTable
    }
    // per-doc rarity rank; (df, word) is a total order shared globally
    val byRarity = Window.partitionBy("doc_id").orderBy(col("__df"), col("word"))
    val prefix = w.join(indexed, Seq("word"))
      .join(sizes, Seq("doc_id"))
      .withColumn("__rk", row_number().over(byRarity))
      .filter(col("__rk") <= col("n") - ceil(col("n") * threshold) + 1)
      .select("doc_id", "word")
    val cand = prefix.select(col("doc_id").as("doc_a"), col("word"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("word")), Seq("word"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val inter = cand
      .join(w.select(col("doc_id").as("doc_a"), col("word")), Seq("doc_a"))
      .join(w.select(col("doc_id").as("doc_b"), col("word")), Seq("doc_b", "word"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-duplicate pairs within `maxHamming` (Manku/Charikar web
    * dedup): each doc's 60-bit token simhash is split into `maxHamming+1`
    * bands; by pigeonhole, any pair with hamming ≤ maxHamming agrees on at
    * least one WHOLE band, so an equi-join on (band, band-value) has exact
    * recall — no crossJoin — and the per-candidate popcount filter leaves
    * only true pairs. The candidate volume is governed by band width
    * (60/(maxHamming+1) bits ⇒ ~2^15 values at the default, so random
    * collisions are rare); at 100× the same plan holds because bands join
    * hash-partitioned.
    */
  def simhashNearDup(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
      idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val bands = maxHamming + 1
    require(60 % bands == 0, s"need 60 divisible by bands=$bands")
    val bitsPerBand = 60 / bands
    val mask = (1L << bitsPerBand) - 1
    import graft.expressions.{Hashing, SimHash64}
    val sh = df.select(col(idCol).as("doc_id"),
      SimHash64.simhash64(spark,
        transform(split(normalized(col(textCol)), " "),
          t => Hashing.sha60(t))).as("simhash"))
    val banded = sh
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bv",
        expr(s"shiftright(simhash, band * $bitsPerBand) & $mask"))
    val a = banded.select(col("doc_id").as("doc_a"),
      col("simhash").as("__sa"), col("band"), col("bv"))
    val b = banded.select(col("doc_id").as("doc_b"),
      col("simhash").as("__sb"), col("band"), col("bv"))
    a.join(b, Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      // a pair can agree on several bands; hamming is pair-deterministic,
      // so distinct collapses the duplicates
      .select("doc_a", "doc_b", "hamming").distinct()
  }

  /** Resolve near-duplicate PAIRS into connected-component clusters with a
    * deterministic canonical id — the step that makes LSH/Jaccard output
    * actionable on a corpus: `(doc_id, canonical_id, keep)` where `keep`
    * marks the component minimum (the row a training pipeline retains).
    *
    * Min-label propagation: every node starts as its own label; each round
    * every node takes the min of its own and its neighbors' labels — one
    * shuffle (join + groupBy) per round, converging in O(component
    * diameter) rounds. Near-dup components are overwhelmingly
    * cliques/stars (diameter ≤ 2); `maxRounds` bounds pathological chains.
    * Each round is `localCheckpoint`ed: the label table (one row per doc)
    * is the only thing materialized, lineage resets per round, and
    * convergence is detected by the label-sum strictly decreasing (labels
    * only ever decrease, so an unchanged sum ⇔ a fixed point). For graphs
    * whose diameter actually grows with data (rare here) the same loop
    * accepts the large-star/small-star contraction as a drop-in.
    */
  def resolveClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
      maxRounds: Int = 10): DataFrame = {
    // materialize the pair list once: it is consumed in both union branches
    // AND every round, and its producer (a near-dup pair pipeline) is
    // typically the most expensive plan in the job — evaluating it per
    // branch per round would dominate runtime
    val p = pairs.select("doc_a", "doc_b").graftCheckpoint()
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = docs.select(col(idCol).cast("long").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .graftCheckpoint()
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).first().getDecimal(0)
    var prevSum = labelSum(labels)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val viaNeighbor = edges
        .join(labels.select(col("id").as("src"), col("label")), Seq("src"))
        .select(col("dst").as("id"), col("label"))
      val next = labels.select(col("id"), col("label"))
        .union(viaNeighbor)
        .groupBy("id")
        .agg(min("label").as("label"))
        .graftCheckpoint()
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      round += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("canonical_id"),
      (col("id") === col("label")).as("keep"))
  }
}

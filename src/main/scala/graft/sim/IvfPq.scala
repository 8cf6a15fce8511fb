package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.DotProduct

/** IVF-PQ — the composition billion-vector ANN actually ships (FAISS
  * IndexIVFPQ): an inverted-file coarse quantizer prunes the corpus to
  * `nprobe` cells per query, and within those cells scoring reads only the
  * PQ CODES (M small ints/vector) through a per-query lookup table — the
  * full vectors never flow through the search join. [[Ivf]] alone reads
  * raw vectors in probed cells; [[Pq]] alone scans every code; this does
  * neither.
  *
  * Plan shape: centroids and codebooks are broadcasts; the candidate join
  * distributes on `centroid_id`; the LUT join is an equi-join on
  * (query_id, s, code); the fold over M subspace partials runs in
  * deterministic subspace order (same float sum on any engine/partitioning).
  */
object IvfPq {

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, _.cast("double"))

  /** Top-k per query by ADC score over probed cells. `iters = 0` seeds
    * cells/codebooks from the lowest-id vectors (bit-reproducible, the
    * oracle convention); `iters > 0` Lloyd-trains both.
    */
  def topK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, numCells: Int, nprobe: Int,
      m: Int, subDim: Int, ksub: Int, iters: Int = 0): DataFrame = {
    val centroids = Ivf.buildCentroids(corpus, idCol, vecCol, numCells, iters)
    val cells = Ivf.index(corpus, idCol, vecCol, centroids)
      .select("neighbor_id", "centroid_id")
    val cb = Pq.codebooks(corpus, idCol, vecCol, m, subDim, ksub, iters)
    val codes = Pq.encode(corpus, idCol, vecCol, m, subDim, cb)
      .select(col(idCol).as("neighbor_id"), col("subspace").as("s"), col("code"))
    search(queries, centroids, cells, cb, codes, idCol, vecCol, k, nprobe, m, subDim)
  }

  /** Build-once: persist the four index tables (centroids, cell
    * assignment, PQ codebooks, PQ codes) behind the Warehouse's
    * crash-safe snapshot swap. The CODES table is the only corpus-sized
    * artifact — M bytes-ish per vector, the 32× compression that makes a
    * billion-vector index storable; search-many never touches the raw
    * vectors again.
    */
  def buildIndex(wh: graft.tables.Warehouse, name: String, corpus: DataFrame,
      idCol: String, vecCol: String, numCells: Int,
      m: Int, subDim: Int, ksub: Int, iters: Int = 2): Unit = {
    val centroids = Ivf.buildCentroids(corpus, idCol, vecCol, numCells, iters)
    wh.overwrite(s"${name}_centroids", centroids)
    wh.overwrite(s"${name}_cells", Ivf.index(corpus, idCol, vecCol, centroids)
      .select("neighbor_id", "centroid_id"))
    val cb = Pq.codebooks(corpus, idCol, vecCol, m, subDim, ksub, iters)
    wh.overwrite(s"${name}_codebooks", cb)
    wh.overwrite(s"${name}_codes",
      Pq.encode(corpus, idCol, vecCol, m, subDim, cb)
        .select(col(idCol).as("neighbor_id"), col("subspace").as("s"), col("code")))
    // build-time size: the denominator-anchor for the staleness metric
    val spark = corpus.sparkSession
    import spark.implicits._
    wh.overwrite(s"${name}_meta",
      Seq(wh.read(s"${name}_cells").count()).toDF("built_n"))
  }

  /** Search a persisted index built by [[buildIndex]]. */
  def searchIndex(wh: graft.tables.Warehouse, name: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      m: Int, subDim: Int): DataFrame =
    search(queries,
      wh.read(s"${name}_centroids"), wh.read(s"${name}_cells"),
      wh.read(s"${name}_codebooks"), wh.read(s"${name}_codes"),
      idCol, vecCol, k, nprobe, m, subDim)

  /** INCREMENTAL index maintenance — the daily-batch path (the
    * q_incremental_dedup analogue for similarity search): encode a new
    * embedding batch against the EXISTING coarse centroids and PQ
    * codebooks and append its cell assignments + codes; no retraining, no
    * corpus re-encode, cost O(batch). Because both quantizers are frozen,
    * search over (index + delta) returns EXACTLY what a fresh build with
    * the same quantizers would — gated by q_ann_incremental against the
    * full-corpus oracle. The price of freezing is drift: batches that
    * shift the embedding distribution make the quantizers stale —
    * measured by [[staleness]], repaired by [[compactIfStale]].
    *
    * IDEMPOTENT under replay: both appends anti-join on their key
    * (`neighbor_id` for cells, `(neighbor_id, s)` for codes) before
    * writing, so a retried/crash-replayed daily batch neither duplicates
    * candidate rows (which would displace genuine top-k neighbors) nor
    * inflates the [[staleness]] numerator — same contract as
    * IncrementalDedup.processBatch.
    *
    * Ids are APPEND-ONLY: a batch row whose `idCol` is already indexed is
    * discarded wholesale — the stored cell assignment and PQ codes win,
    * even if the row carries a different (re-embedded) vector. The
    * fresh-build-parity claim above therefore holds only for corpora
    * where an id's vector never changes; re-embedding an existing id
    * requires a rebuild ([[buildIndex]] / [[compactIfStale]]).
    */
  def appendToIndex(wh: graft.tables.Warehouse, name: String,
      batch: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): Unit = {
    val centroids = wh.read(s"${name}_centroids")
    val cb = wh.read(s"${name}_codebooks")
    wh.appendIfAbsent(s"${name}_cells",
      Ivf.index(batch, idCol, vecCol, centroids)
        .select("neighbor_id", "centroid_id"),
      Seq("neighbor_id"))
    wh.appendIfAbsent(s"${name}_codes",
      Pq.encode(batch, idCol, vecCol, m, subDim, cb)
        .select(col(idCol).as("neighbor_id"), col("subspace").as("s"),
          col("code")),
      Seq("neighbor_id", "s"))
  }

  /** Explicit one-time migration for an index persisted before `_meta`
    * existed (only [[buildIndex]] writes it): record the CURRENT cells
    * count as `built_n`, i.e. treat the index as fully built at its
    * present size. Drift accounting starts from this migration point —
    * appends the legacy index already absorbed are permanently invisible
    * to [[staleness]], which is why this is an explicit operator call and
    * not a lazy side effect of a metric read (a legacy index with known
    * pre-migration drift should be rebuilt via [[buildIndex]] instead).
    * Idempotent: a no-op when `_meta` already exists, so concurrent or
    * replayed migrations cannot reset drift accounting. Returns whether
    * a backfill was written.
    */
  def ensureMeta(wh: graft.tables.Warehouse, name: String): Boolean = {
    if (wh.exists(s"${name}_meta")) return false
    val cells = wh.read(s"${name}_cells")
    val spark = cells.sparkSession
    import spark.implicits._
    wh.overwrite(s"${name}_meta", Seq(cells.count()).toDF("built_n"))
    true
  }

  /** Fraction of indexed vectors encoded AFTER the last (re)build —
    * appended rows used quantizers trained without them, so this is the
    * index's distribution-drift exposure. 0.0 right after a build.
    *
    * PURE READ — never writes (a monitoring call must be safe to race
    * with appends and with itself). An index without `_meta` reads as
    * 0.0: its build point is unknown, so no drift can be claimed; run
    * [[ensureMeta]] once to start drift accounting from the current
    * size (or [[buildIndex]] to reset it honestly).
    */
  def staleness(wh: graft.tables.Warehouse, name: String): Double = {
    if (!wh.exists(s"${name}_meta")) return 0.0
    val total = wh.read(s"${name}_cells").count()
    val built = wh.read(s"${name}_meta")
      .select("built_n").head.getLong(0)
    if (total == 0) 0.0 else (total - built).toDouble / total
  }

  /** Rebuild trigger: when [[staleness]] exceeds `threshold`, retrain
    * quantizers and re-encode from `corpus` (a full [[buildIndex]] —
    * the amortized compaction every write-optimized index pays
    * eventually); otherwise a no-op. Returns whether a rebuild ran.
    */
  def compactIfStale(wh: graft.tables.Warehouse, name: String,
      corpus: DataFrame, idCol: String, vecCol: String, numCells: Int,
      m: Int, subDim: Int, ksub: Int, threshold: Double,
      iters: Int = 2): Boolean = {
    val s = staleness(wh, name)
    if (s > threshold) {
      buildIndex(wh, name, corpus, idCol, vecCol, numCells, m, subDim,
        ksub, iters)
      true
    } else false
  }

  private def search(queries: DataFrame, centroids: DataFrame,
      cells: DataFrame, cb: DataFrame, codes: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      m: Int, subDim: Int): DataFrame = {
    val spark = queries.sparkSession
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__cs").desc, col("centroid_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__cs", DotProduct.dot(spark, col("qv"), col("cvec")))
      .withColumn("__pr", row_number().over(wProbe))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("centroid_id"))

    val lut = Pq.subvectors(queries, idCol, vecCol, m, subDim)
      .withColumnRenamed("__id", "query_id")
      .join(broadcast(cb), Seq("s"))
      .withColumn("__part", DotProduct.dot(spark, col("__sub"), col("cvec")))
      .select("query_id", "s", "code", "__part")

    val cand = probes.join(cells, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
    val scored = cand
      .join(codes, Seq("neighbor_id"))
      .join(lut, Seq("query_id", "s", "code"))
      .groupBy("query_id", "neighbor_id")
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("s"), col("__part")))),
          e => e.getField("__part")),
        lit(0.0), (acc, x) => acc + x).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 4).as("adc_score"))
  }
}

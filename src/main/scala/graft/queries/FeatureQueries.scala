package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.Materialize._

/** FEATURE-ENGINEERING primitives for a training-data pipeline: the
  * normalization / encoding / weighting / ordering steps that sit between
  * a cleaned corpus and a trainer.
  *
  * Reference behavior: the reference's marts feed modeling tables with
  * per-column statistics and categorical rollups (dags/ transform layer);
  * re-expressed here as the standard ML-side feature steps over the
  * embeddings/documents/events fixtures.
  *
  * Scale shape: every query is one scan + a bounded-domain frame
  * (64 dims, |event types|, |labels|, 5 curriculum stages) — nothing
  * corpus-sized survives the first aggregate.
  */
object FeatureQueries {

  /** Shared logistic-regression scaffolding for q_logreg_train and
    * q_calibration_bins: the feature CTE, the unrolled GD chain (η=5,
    * 10 steps), and the Spark-side trainer returning (features,
    * weights). Kept in ONE place so the two gates can never train
    * different models.
    */
  /** The feature CTE body, optionally carrying extra per-doc columns
    * (e.g. "doc_id, lang, ") for eval queries that split or group the
    * scored rows — ONE string so the model's features can never drift
    * between the train gates and the eval gates.
    */
  private[graft] def logregFeatSqlWith(extra: String): String =
    s"""SELECT ${extra}CASE WHEN n_chars > med.m THEN 1.0 ELSE 0.0 END AS y,
      |    len(tk) / 100.0 AS x1,
      |    len(t) / CAST(len(tk) AS DOUBLE) / 10 AS x2,
      |    len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE) AS x3
      |  FROM (SELECT doc_id, lang, n_chars,
      |      lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t,
      |      regexp_split_to_array(lower(trim(regexp_replace(text,
      |        '\\s+', ' ', 'g'))), ' ') AS tk
      |    FROM documents) base,
      |    (SELECT quantile_cont(n_chars, 0.5) AS m FROM documents) med
      |  WHERE len(tk) > 0 AND len(t) > 0""".stripMargin

  private[graft] val logregFeatSql: String = logregFeatSqlWith("")

  private[graft] def logregChainSql(steps: Int,
      extra: String = ""): String = {
    def step(i: Int) = {
      val p = "1/(1 + exp(-(w0 + w1*x1 + w2*x2 + w3*x3)))"
      s"""g$i AS (SELECT
         |    w0 + 5 * sum((y - $p) * 1) / count(*) AS w0,
         |    w1 + 5 * sum((y - $p) * x1) / count(*) AS w1,
         |    w2 + 5 * sum((y - $p) * x2) / count(*) AS w2,
         |    w3 + 5 * sum((y - $p) * x3) / count(*) AS w3
         |  FROM f, g${i - 1}
         |  GROUP BY g${i - 1}.w0, g${i - 1}.w1, g${i - 1}.w2,
         |    g${i - 1}.w3)""".stripMargin
    }
    s"""f AS (${logregFeatSqlWith(extra)}),
       |g0 AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
       |  CAST(0 AS DOUBLE) AS w2, CAST(0 AS DOUBLE) AS w3),
       |${(1 to steps).map(step).mkString(",\n")}""".stripMargin
  }

  /** Spark-side twin of [[logregChainSql]]: materialized feature matrix
    * plus the trained 4-weight vector (driver-side, k-bounded).
    */
  private[graft] def logregTrain(s: org.apache.spark.sql.SparkSession,
      dir: String, steps: Int): (org.apache.spark.sql.DataFrame,
      Array[Double]) = {
    // the feature formulas live ONCE in logregFeaturesWith — train and
    // eval gates can never drift
    val f = logregFeaturesWith(s, dir, Nil)
      .graftCheckpoint() // scanned once per GD step + final eval
    var w = Array(0.0, 0.0, 0.0, 0.0)
    def pCol = lit(1) / (lit(1) + exp(-(lit(w(0)) + lit(w(1)) * col("x1")
      + lit(w(2)) * col("x2") + lit(w(3)) * col("x3"))))
    for (_ <- 1 to steps) {
      val g = f.agg(
        (sum((col("y") - pCol) * 1) / count(lit(1))).as("g0"),
        (sum((col("y") - pCol) * col("x1")) / count(lit(1))).as("g1"),
        (sum((col("y") - pCol) * col("x2")) / count(lit(1))).as("g2"),
        (sum((col("y") - pCol) * col("x3")) / count(lit(1))).as("g3"))
        .collect().head
      w = Array(w(0) + 5 * g.getDouble(0), w(1) + 5 * g.getDouble(1),
        w(2) + 5 * g.getDouble(2), w(3) + 5 * g.getDouble(3))
    }
    (f, w)
  }

  /** Spark-side twin of [[logregFeatSqlWith]] and the SINGLE home of the
    * Spark-side feature formulas: [[logregTrain]] builds its frame via
    * this (extra = Nil), and eval gates pass the per-doc columns they
    * need to split/group scored rows (e.g. Seq("lang")).
    */
  private[graft] def logregFeaturesWith(s: org.apache.spark.sql.SparkSession,
      dir: String, extra: Seq[String]): org.apache.spark.sql.DataFrame = {
    val t = graft.dedup.Dedup.normalized(col("text"))
    val base = Tables.t(s, dir, "documents")
      .select(col("doc_id") +: col("lang") +: col("n_chars") +:
        t.as("t") +: split(t, " ").as("tk") +: Nil: _*)
      .filter(size(col("tk")) > 0 && length(col("t")) > 0)
    val med = graft.ops.Quantiles
      .groupQuantiles(Tables.t(s, dir, "documents")
        .withColumn("g", lit(1)), "g", "n_chars", Seq("m" -> 0.5))
      .select("m")
    base.crossJoin(broadcast(med))
      .select(extra.map(col) ++ Seq(
        when(col("n_chars") > col("m"), 1.0).otherwise(0.0).as("y"),
        (size(col("tk")) / 100.0).as("x1"),
        (length(col("t")) / size(col("tk")).cast("double") / 10).as("x2"),
        (size(array_distinct(col("tk")))
          / size(col("tk")).cast("double")).as("x3")): _*)
  }

  private[graft] def logregPCol(w: Array[Double]) =
    lit(1) / (lit(1) + exp(-(lit(w(0)) + lit(w(1)) * col("x1")
      + lit(w(2)) * col("x2") + lit(w(3)) * col("x3"))))

  val defs: Seq[QueryDef] = Seq(

    // PER-DIMENSION feature scaling stats over the embedding matrix:
    // mean/σ/min/max per dim — the fit step of a standard scaler — plus
    // the standardized max as evidence the transform is applied. One
    // posexplode + one 64-group aggregate; the float sums ride round(4).
    QueryDef(
      "q_feature_scale",
      Some("""WITH x AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             |    unnest(embedding::DOUBLE[]) AS v
             |  FROM embeddings),
             |s AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,
             |    avg(v) AS mu, stddev_pop(v) AS sd,
             |    min(v) AS mn, max(v) AS mx
             |  FROM x GROUP BY 1)
             |SELECT CAST(dim AS INT) AS dim, n,
             |  round(mu, 4) + 0.0 AS mean, round(sd, 4) AS sd,
             |  round(mn, 4) + 0.0 AS mn, round(mx, 4) + 0.0 AS mx,
             |  CASE WHEN sd > 0 THEN round((mx - mu) / sd, 4) END AS z_max
             |FROM s""".stripMargin),
      (s, dir) => {
        val x = Tables.t(s, dir, "embeddings")
          .select(posexplode(col("embedding")).as(Seq("dim", "f")))
          .select(col("dim"), col("f").cast("double").as("v"))
        x.groupBy("dim")
          .agg(count(lit(1)).as("n"), avg("v").as("mu"),
            stddev_pop(col("v")).as("sd"),
            min("v").as("mn"), max("v").as("mx"))
          .select(col("dim").cast("int").as("dim"), col("n"),
            round(col("mu"), 4).as("mean"), round(col("sd"), 4).as("sd"),
            round(col("mn"), 4).as("mn"), round(col("mx"), 4).as("mx"),
            when(col("sd") > 0, round((col("mx") - col("mu")) / col("sd"), 4))
              .as("z_max"))
      }),

    // SMOOTHED TARGET ENCODING of event_type against the value outcome:
    // enc = (Σy + m·ȳ_global)/(n + m) with m=100 — the shrinkage
    // estimator that keeps rare categories near the prior instead of
    // memorizing noise. Reports the shrink factor so downstream can see
    // how much prior each category carries. Two tiny aggregates.
    QueryDef(
      "q_target_encode",
      Some("""WITH g AS (SELECT avg(value) AS gm FROM events),
             |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    sum(value) AS sy
             |  FROM events GROUP BY 1)
             |SELECT t.event_type, t.n,
             |  round(t.sy / t.n, 4) AS raw_mean,
             |  round((t.sy + 100 * g.gm) / (t.n + 100), 4) AS encoded,
             |  round(100.0 / (t.n + 100), 4) AS shrink
             |FROM t, g""".stripMargin),
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
        val g = ev.agg(avg("value").as("gm"))
        ev.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("value").as("sy"))
          .crossJoin(broadcast(g))
          .select(col("event_type"), col("n"),
            round(col("sy") / col("n"), 4).as("raw_mean"),
            round((col("sy") + lit(100) * col("gm")) / (col("n") + 100), 4)
              .as("encoded"),
            round(lit(100.0) / (col("n") + 100), 4).as("shrink"))
      }),

    // INVERSE-FREQUENCY class weights over the embeddings labels:
    // w_k = N/(K·n_k) — the balanced-class weighting a trainer feeds its
    // loss. Weighted counts re-sum to N by construction (spec-checked).
    QueryDef(
      "q_class_weights",
      Some("""WITH c AS (SELECT label, CAST(count(*) AS BIGINT) AS n
             |  FROM embeddings GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
             |    CAST(count(*) AS BIGINT) AS k FROM c)
             |SELECT c.label, c.n,
             |  round(t.total / (CAST(t.k AS DOUBLE) * c.n), 6) AS weight
             |FROM c, t""".stripMargin),
      (s, dir) => {
        val c = Tables.t(s, dir, "embeddings")
          .groupBy("label").agg(count(lit(1)).as("n"))
        val t = c.agg(sum("n").as("total"), count(lit(1)).as("k"))
        c.crossJoin(broadcast(t))
          .select(col("label"), col("n"),
            round(col("total") / (col("k").cast("double") * col("n")), 6)
              .as("weight"))
      }),

    // CURRICULUM STAGING: order the corpus by a difficulty proxy (mean
    // word length of the normalized text) and carve it into 5 stages with
    // per-stage token budgets and the cumulative schedule. Stage
    // boundaries come from the GLOBAL min/max (broadcast, no quantile
    // window); the only window is the 5-row cumulative over stages.
    QueryDef(
      "q_curriculum_bins",
      Some("""WITH d AS (SELECT doc_id,
             |    len(regexp_split_to_array(lower(trim(
             |      regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS toks,
             |    len(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
             |      AS chars
             |  FROM documents),
             |sc AS (SELECT doc_id, toks,
             |    chars / CAST(toks AS DOUBLE) AS score
             |  FROM d WHERE toks > 0),
             |b AS (SELECT min(score) AS mn, max(score) AS mx FROM sc),
             |st AS (SELECT CAST(CASE WHEN b.mx > b.mn THEN least(
             |      floor((sc.score - b.mn) / (b.mx - b.mn) * 5), 4)
             |    ELSE 0 END AS INT) AS stage,
             |    sc.toks, sc.score
             |  FROM sc, b),
             |g AS (SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(toks) AS BIGINT) AS tokens,
             |    avg(score) AS mean_difficulty
             |  FROM st GROUP BY 1)
             |SELECT stage, n_docs, tokens,
             |  round(mean_difficulty, 4) AS mean_difficulty,
             |  CAST(sum(tokens) OVER (ORDER BY stage
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
             |FROM g""".stripMargin),
      (s, dir) => {
        val norm = graft.dedup.Dedup.normalized(col("text"))
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), size(split(norm, " ")).as("toks"),
            length(norm).as("chars"))
          .filter(col("toks") > 0)
          .withColumn("score", col("chars") / col("toks").cast("double"))
        val b = d.agg(min("score").as("mn"), max("score").as("mx"))
        val st = d.crossJoin(broadcast(b))
          .select(
            when(col("mx") > col("mn"),
              least(floor((col("score") - col("mn"))
                / (col("mx") - col("mn")) * 5), lit(4)))
              .otherwise(lit(0)).cast("int").as("stage"),
            col("toks"), col("score"))
        val g = st.groupBy("stage")
          .agg(count(lit(1)).as("n_docs"),
            sum("toks").cast("long").as("tokens"),
            avg("score").as("mean_difficulty"))
        // 5-row stage domain — aggregated before the cumulative window
        val w = Window.orderBy("stage")
          .rowsBetween(Window.unboundedPreceding, 0)
        g.select(col("stage"), col("n_docs"), col("tokens"),
          round(col("mean_difficulty"), 4).as("mean_difficulty"),
          sum("tokens").over(w).as("cum_tokens"))
      }),

    // TOP PRINCIPAL COMPONENT of the embedding matrix by POWER ITERATION
    // (5 rounds, uniform unit start): loadings, dominant eigenvalue of
    // the scatter matrix XᵀX, and the explained-variance ratio — PCA as
    // an engine query, no linalg library. Per round: ONE scan of the
    // centered matrix — scores via a strict left-to-right zip_with/
    // aggregate dot against the literal v (no join), back-projection via
    // posexplode + a 64-group map-side-combined sum. The 64-vector is
    // collected and renormalized on the driver each round (k-bounded,
    // the IVF-centroid precedent); the centered matrix is materialized
    // ONCE (localCheckpoint) and re-scanned, never recomputed. Sign is
    // fixed at the largest-|loading| dimension so both engines agree on
    // the eigenvector's orientation. The iteration is contractive, so
    // last-ulp float divergence between engines stays last-ulp — round(4)
    // absorbs it.
    QueryDef(
      "q_pca_power",
      Some("""WITH x0 AS (SELECT vec_id,
             |    generate_subscripts(embedding, 1) - 1 AS dim,
             |    unnest(embedding::DOUBLE[]) AS v
             |  FROM embeddings),
             |mu AS (SELECT dim, avg(v) AS mu FROM x0 GROUP BY 1),
             |xc AS (SELECT x0.vec_id, x0.dim, x0.v - mu.mu AS x
             |  FROM x0 JOIN mu USING (dim)),
             |v0 AS (SELECT DISTINCT dim, 0.125 AS v FROM x0),
             |w1 AS (SELECT xc.vec_id, sum(xc.x * v0.v) AS w
             |  FROM xc JOIN v0 USING (dim) GROUP BY 1),
             |u1 AS (SELECT xc.dim, sum(xc.x * w1.w) AS u
             |  FROM xc JOIN w1 USING (vec_id) GROUP BY 1),
             |v1 AS (SELECT dim, u / sqrt((SELECT sum(u*u) FROM u1)) AS v
             |  FROM u1),
             |w2 AS (SELECT xc.vec_id, sum(xc.x * v1.v) AS w
             |  FROM xc JOIN v1 USING (dim) GROUP BY 1),
             |u2 AS (SELECT xc.dim, sum(xc.x * w2.w) AS u
             |  FROM xc JOIN w2 USING (vec_id) GROUP BY 1),
             |v2 AS (SELECT dim, u / sqrt((SELECT sum(u*u) FROM u2)) AS v
             |  FROM u2),
             |w3 AS (SELECT xc.vec_id, sum(xc.x * v2.v) AS w
             |  FROM xc JOIN v2 USING (dim) GROUP BY 1),
             |u3 AS (SELECT xc.dim, sum(xc.x * w3.w) AS u
             |  FROM xc JOIN w3 USING (vec_id) GROUP BY 1),
             |v3 AS (SELECT dim, u / sqrt((SELECT sum(u*u) FROM u3)) AS v
             |  FROM u3),
             |w4 AS (SELECT xc.vec_id, sum(xc.x * v3.v) AS w
             |  FROM xc JOIN v3 USING (dim) GROUP BY 1),
             |u4 AS (SELECT xc.dim, sum(xc.x * w4.w) AS u
             |  FROM xc JOIN w4 USING (vec_id) GROUP BY 1),
             |v4 AS (SELECT dim, u / sqrt((SELECT sum(u*u) FROM u4)) AS v
             |  FROM u4),
             |w5 AS (SELECT xc.vec_id, sum(xc.x * v4.v) AS w
             |  FROM xc JOIN v4 USING (dim) GROUP BY 1),
             |u5 AS (SELECT xc.dim, sum(xc.x * w5.w) AS u
             |  FROM xc JOIN w5 USING (vec_id) GROUP BY 1),
             |v5 AS (SELECT dim, u / sqrt((SELECT sum(u*u) FROM u5)) AS v
             |  FROM u5),
             |lam AS (SELECT sqrt(sum(u * u)) AS l FROM u5),
             |tr AS (SELECT sum(x * x) AS t FROM xc),
             |sg AS (SELECT CASE WHEN (SELECT v FROM v5
             |    ORDER BY abs(v) DESC, dim LIMIT 1) < 0
             |  THEN -1.0 ELSE 1.0 END AS s)
             |SELECT CAST(v5.dim AS INT) AS dim,
             |  round(sg.s * v5.v, 4) AS loading,
             |  round(lam.l, 2) AS eigenvalue,
             |  round(lam.l / tr.t, 4) AS evr
             |FROM v5, sg, lam, tr""".stripMargin),
      (s, dir) => {
        val emb = Tables.t(s, dir, "embeddings")
        val x0 = emb
          .select(posexplode(col("embedding")).as(Seq("dim", "f")))
          .select(col("dim"), col("f").cast("double").as("v"))
        // 64-bounded collects: per-dim means, then one 64-vector per round
        val mu = x0.groupBy("dim").agg(avg("v").as("mu")).collect()
          .map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val muLit = array((0 until 64).map(d => lit(mu(d))): _*)
        val xc = emb.select(col("vec_id"),
            zip_with(transform(col("embedding"), _.cast("double")), muLit,
              (a, b) => a - b).as("x"))
          .graftCheckpoint()
        val trace = xc.select(explode(col("x")).as("e"))
          .agg(sum(col("e") * col("e"))).head.getDouble(0)
        var v = Array.fill(64)(0.125)
        var lambda = 0.0
        for (_ <- 1 to 5) {
          val vLit = array(v.toIndexedSeq.map(lit): _*)
          val scored = xc.withColumn("w",
            aggregate(zip_with(col("x"), vLit, (a, b) => a * b),
              lit(0.0), (acc, e) => acc + e))
          val u = scored
            .select(posexplode(col("x")).as(Seq("dim", "xv")), col("w"))
            .groupBy("dim").agg(sum(col("xv") * col("w")).as("u"))
            .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
          val uArr = (0 until 64).map(u).toArray
          lambda = math.sqrt(uArr.map(x => x * x).sum)
          v = uArr.map(_ / lambda)
        }
        val dstar = v.indices.minBy(i => (-math.abs(v(i)), i))
        if (v(dstar) < 0) v = v.map(x => -x)
        val out = v.zipWithIndex.map { case (x, d) => (d, x) }.toIndexedSeq
        s.createDataFrame(out).toDF("dim", "loading")
          .select(col("dim"), round(col("loading"), 4).as("loading"),
            round(lit(lambda), 2).as("eigenvalue"),
            round(lit(lambda / trace), 4).as("evr"))
      }),

    // PER-USER LAG FEATURE TABLE — the feature-store snapshot a model
    // trains on: for every active (user, day): that day's spend (exact
    // cents), previous-active-day spend (lag 1), calendar-true rolling
    // 7-day spend (RANGE frame, so gaps don't stretch the window), and
    // days since previous activity. One daily aggregate, then windows
    // partitioned BY USER over each user's ≤|calendar| active days —
    // never a corpus frame.
    QueryDef(
      "q_lag_features",
      Some("""WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
             |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
             |      AS cents
             |  FROM events GROUP BY 1, 2)
             |SELECT user_id, day, cents,
             |  lag(cents) OVER (PARTITION BY user_id ORDER BY day)
             |    AS lag1_cents,
             |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY day
             |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS roll7_cents,
             |  CAST(day - lag(day) OVER (PARTITION BY user_id ORDER BY day)
             |    AS BIGINT) AS days_since
             |FROM d""".stripMargin),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val d = Tables.t(s, dir, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        val byDay = Window.partitionBy("user_id").orderBy("day")
        // RANGE over epoch-days so calendar gaps shrink, not shift, the
        // frame — identical to the oracle's INTERVAL RANGE
        val byRange = Window.partitionBy("user_id")
          .orderBy(expr("cast(cast(day AS timestamp) AS long) div 86400"))
          .rangeBetween(-6, 0)
        d.select(col("user_id"), col("day"), col("cents"),
          lag("cents", 1).over(byDay).as("lag1_cents"),
          sum("cents").over(byRange).as("roll7_cents"),
          datediff(col("day"), lag("day", 1).over(byDay)).cast("long")
            .as("days_since"))
      }),

    // LOGISTIC-REGRESSION TRAINING as an engine query: 10 full-batch
    // gradient-descent steps (η=5) fitting P(doc longer than the corpus
    // median) from token-level features — count, mean word length,
    // type/token ratio. (The fixture's lang label is independent of its
    // text — all langid markers score identically across langs — so the
    // learnable target is length; the point is the TRAINING machinery.)
    // Like q_pca_power, each step is ONE scan of the materialized
    // feature matrix producing 4 partial-aggregable gradient sums; the
    // 4-weight vector lives driver-side (k-bounded). The oracle replays
    // the identical recursion in chained CTEs — exp()'s last-ulp libm
    // spread is contracted by the sigmoid and absorbed by round(4).
    // Probed at sf0.01: accuracy 0.98 vs 0.50 majority — the descent
    // demonstrably descends (spec-pinned).
    QueryDef(
      "q_logreg_train",
      Some(s"""WITH ${logregChainSql(10)},
             |ev AS (SELECT w0, w1, w2, w3,
             |    1/(1 + exp(-(w0 + w1*x1 + w2*x2 + w3*x3))) AS p, y
             |  FROM f, g10)
             |SELECT round(any_value(w0), 4) AS w0,
             |  round(any_value(w1), 4) AS w1,
             |  round(any_value(w2), 4) AS w2,
             |  round(any_value(w3), 4) AS w3,
             |  round(avg(CASE WHEN (p > 0.5) = (y = 1.0) THEN 1.0
             |    ELSE 0.0 END), 4) AS accuracy,
             |  round(-avg(y * ln(greatest(p, 1e-12))
             |    + (1 - y) * ln(greatest(1 - p, 1e-12))), 4) AS log_loss
             |FROM ev""".stripMargin),
      (s, dir) => {
        val (f, w) = logregTrain(s, dir, steps = 10)
        f.withColumn("p", logregPCol(w))
          .agg(
            round(lit(w(0)), 4).as("w0"), round(lit(w(1)), 4).as("w1"),
            round(lit(w(2)), 4).as("w2"), round(lit(w(3)), 4).as("w3"),
            round(avg(when((col("p") > 0.5) === (col("y") === 1.0), 1.0)
              .otherwise(0.0)), 4).as("accuracy"),
            round(-avg(col("y") * log(greatest(col("p"), lit(1e-12)))
              + (lit(1) - col("y"))
              * log(greatest(lit(1) - col("p"), lit(1e-12)))), 4)
              .as("log_loss"))
      }),

    // CALIBRATION of the trained model: predictions binned into 5 equal-
    // width probability buckets, observed event rate per bucket, and the
    // expected calibration error Σ (n_b/N)·|p̄_b − ȳ_b| — the reliability
    // diagram + one-number summary a model gate reads before trusting
    // scores as probabilities. Shares the EXACT training chain with
    // q_logreg_train (one scaffolding, two gates).
    QueryDef(
      "q_calibration_bins",
      Some(s"""WITH ${logregChainSql(10)},
             |ev AS (SELECT
             |    1/(1 + exp(-(w0 + w1*x1 + w2*x2 + w3*x3))) AS p, y
             |  FROM f, g10),
             |b AS (SELECT CAST(least(floor(p * 5), 4) AS INT) AS bin, p, y
             |  FROM ev),
             |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
             |    avg(p) AS mean_p, avg(y) AS obs_rate
             |  FROM b GROUP BY 1),
             |t AS (SELECT sum(n * abs(mean_p - obs_rate))
             |    / sum(n) AS ece FROM g)
             |SELECT g.bin, g.n, round(g.mean_p, 4) AS mean_p,
             |  round(g.obs_rate, 4) AS obs_rate,
             |  round(t.ece, 4) AS ece
             |FROM g, t""".stripMargin),
      (s, dir) => {
        val (f, w) = logregTrain(s, dir, steps = 10)
        val ev = f.select(logregPCol(w).as("p"), col("y"))
          .withColumn("bin", least(floor(col("p") * 5), lit(4)).cast("int"))
        val g = ev.groupBy("bin")
          .agg(count(lit(1)).as("n"), avg("p").as("mean_p"),
            avg("y").as("obs_rate"))
        val t = g.agg((sum(col("n") * abs(col("mean_p") - col("obs_rate")))
          / sum("n")).as("ece"))
        g.crossJoin(broadcast(t))
          .select(col("bin"), col("n"), round(col("mean_p"), 4).as("mean_p"),
            round(col("obs_rate"), 4).as("obs_rate"),
            round(col("ece"), 4).as("ece"))
      }),

    // ROC AUC of the trained score, EXACT via the rank-sum identity
    // AUC = (R₁ − n₁(n₁+1)/2)/(n₁n₀) with average-rank ties — no curve
    // discretization. Ranks use the same corpus-safe shape as
    // q_mannwhitney: collapse to distinct scores first, then
    // ops.PrefixSum's range-partitioned running count (no global
    // window). Gini = 2·AUC − 1 rides along. Third member of the
    // train/calibrate/evaluate family on ONE shared model.
    QueryDef(
      "q_roc_auc",
      Some(s"""WITH ${logregChainSql(10)},
             |ev AS (SELECT
             |    1/(1 + exp(-(w0 + w1*x1 + w2*x2 + w3*x3))) AS p, y
             |  FROM f, g10),
             |d AS (SELECT p, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS np
             |  FROM ev GROUP BY 1),
             |r AS (SELECT np,
             |    sum(n) OVER (ORDER BY p ROWS UNBOUNDED PRECEDING)
             |      - (n - 1) / 2.0 AS avg_rank
             |  FROM d),
             |t AS (SELECT CAST(sum(np) AS BIGINT) AS n1,
             |    sum(np * avg_rank) AS r1
             |  FROM r),
             |c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ev)
             |SELECT t.n1 AS n_pos, c.n - t.n1 AS n_neg,
             |  round((t.r1 - t.n1 * (t.n1 + 1) / 2.0)
             |    / (t.n1 * (c.n - t.n1)), 4) AS auc,
             |  round(2 * (t.r1 - t.n1 * (t.n1 + 1) / 2.0)
             |    / (t.n1 * (c.n - t.n1)) - 1, 4) AS gini
             |FROM t, c""".stripMargin),
      (s, dir) => {
        val (f, w) = logregTrain(s, dir, steps = 10)
        val ev = f.select(logregPCol(w).as("p"), col("y"))
        val d = ev.groupBy("p")
          .agg(count(lit(1)).as("n"),
            sum(when(col("y") === 1.0, 1).otherwise(0)).cast("long")
              .as("np"))
        val ranked = graft.ops.PrefixSum.runningTotal(
          d, Seq(col("p")), col("n"), "cum")
          .withColumn("avg_rank", col("cum") - (col("n") - 1) / 2.0)
        val t = ranked.agg(sum("np").as("n1"),
          sum(col("np") * col("avg_rank")).as("r1"))
        val c = ev.agg(count(lit(1)).as("n"))
        val auc = (col("r1") - col("n1") * (col("n1") + 1) / 2.0) /
          (col("n1") * (col("n") - col("n1")))
        t.crossJoin(broadcast(c))
          .select(col("n1").as("n_pos"), (col("n") - col("n1")).as("n_neg"),
            round(auc, 4).as("auc"),
            round(lit(2) * auc - 1, 4).as("gini"))
      }),

    // PER-SLICE model evaluation: the trained score broken down by the
    // `lang` column carried through logregFeaturesWith — n, positives,
    // accuracy, AUC, and ECE per language, the fairness/quality slice
    // report a model gate reads before shipping scores corpus-wide.
    // Scale shape: scores are quantized to 4 decimals FIRST, so all
    // ranking state is a bounded |langs|×10⁴ histogram (the per-lang
    // rank window runs over the histogram, never the corpus); AUC uses
    // the rank-sum identity with average-rank ties over the quantized
    // scores, identically on both engines. Fourth member of the
    // train/calibrate/evaluate family on ONE shared model.
    QueryDef(
      "q_logreg_eval_by_lang",
      Some(s"""WITH ${logregChainSql(10, "doc_id, lang, ")},
             |ev AS (SELECT lang,
             |    round(1/(1 + exp(-(w0 + w1*x1 + w2*x2 + w3*x3))), 4)
             |      AS pb, y
             |  FROM f, g10),
             |d AS (SELECT lang, pb, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS np
             |  FROM ev GROUP BY 1, 2),
             |r AS (SELECT lang, pb, n, np,
             |    sum(n) OVER (PARTITION BY lang ORDER BY pb
             |      ROWS UNBOUNDED PRECEDING) - (n - 1) / 2.0 AS avg_rank
             |  FROM d),
             |t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n,
             |    CAST(sum(np) AS BIGINT) AS n1,
             |    sum(np * avg_rank) AS r1,
             |    sum(CASE WHEN pb > 0.5 THEN np ELSE n - np END)
             |      / CAST(sum(n) AS DOUBLE) AS acc
             |  FROM r GROUP BY 1),
             |b AS (SELECT lang, CAST(least(floor(pb * 5), 4) AS INT)
             |      AS bin,
             |    sum(n) AS nb, sum(pb * n) / sum(n) AS mean_p,
             |    sum(np) / CAST(sum(n) AS DOUBLE) AS obs
             |  FROM d GROUP BY 1, 2),
             |e AS (SELECT lang, sum(nb * abs(mean_p - obs)) / sum(nb)
             |      AS ece
             |  FROM b GROUP BY 1)
             |SELECT t.lang, t.n, t.n1 AS n_pos,
             |  round(t.acc, 4) AS accuracy,
             |  round((t.r1 - t.n1 * (t.n1 + 1) / 2.0)
             |    / (t.n1 * (t.n - t.n1)), 4) AS auc,
             |  round(e.ece, 4) AS ece
             |FROM t JOIN e ON t.lang = e.lang
             |ORDER BY 1""".stripMargin),
      (s, dir) => {
        val (_, w) = logregTrain(s, dir, steps = 10)
        val ev = logregFeaturesWith(s, dir, Seq("lang"))
          .select(col("lang"), round(logregPCol(w), 4).as("pb"), col("y"))
        val d = ev.groupBy("lang", "pb")
          .agg(count(lit(1)).as("n"),
            sum(when(col("y") === 1.0, 1).otherwise(0)).cast("long")
              .as("np"))
        // histogram-sized window: ≤ |langs|·10⁴ rows total by quantization
        val win = Window.partitionBy("lang").orderBy("pb")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val r = d.withColumn("avg_rank",
          sum("n").over(win) - (col("n") - 1) / 2.0)
        val t = r.groupBy("lang").agg(
          sum("n").as("n"), sum("np").as("n1"),
          sum(col("np") * col("avg_rank")).as("r1"),
          (sum(when(col("pb") > 0.5, col("np"))
            .otherwise(col("n") - col("np")))
            / sum("n").cast("double")).as("acc"))
        val b = d.groupBy(col("lang"),
            least(floor(col("pb") * 5), lit(4)).cast("int").as("bin"))
          .agg(sum("n").as("nb"),
            (sum(col("pb") * col("n")) / sum("n")).as("mean_p"),
            (sum("np") / sum("n").cast("double")).as("obs"))
        val e = b.groupBy("lang")
          .agg((sum(col("nb") * abs(col("mean_p") - col("obs")))
            / sum("nb")).as("ece"))
        val auc = (col("r1") - col("n1") * (col("n1") + 1) / 2.0) /
          (col("n1") * (col("n") - col("n1")))
        t.join(e, "lang")
          .select(col("lang"), col("n"), col("n1").as("n_pos"),
            round(col("acc"), 4).as("accuracy"),
            round(auc, 4).as("auc"),
            round(col("ece"), 4).as("ece"))
          .orderBy("lang")
      }),

    // MEASURE CORRELATION MATRIX — pairwise Pearson r over the four
    // lineitem measures in ONE corpus scan: every Σx/Σx²/Σxy
    // accumulates as an exact integer — quantity integral, rates in
    // cents, and price at DOLLAR grain (correlation is scale-invariant;
    // cents-grain Σp² overflows BIGINT past ~60M rows — found when the
    // sf1 run ANSI-errored — dollar grain holds to ~6e9 rows; past
    // that, swap the two price sums to DECIMAL(38,0)), map-side
    // combinable, and the 6 pair rows project off
    // the single aggregate row. Only the final r is float, computed
    // with identical operation order in both engines. The shape a
    // feature-selection pass wants at 100 TB: no per-pair rescan.
    QueryDef(
      "q_corr_matrix",
      Some {
        val ms = Seq("q" -> "quantity", "p" -> "extendedprice",
          "d" -> "discount", "t" -> "tax")
        val sums = ms.map { case (k, _) =>
          s"CAST(sum($k) AS BIGINT) AS s$k, CAST(sum($k*$k) AS BIGINT) AS s$k$k"
        }.mkString(",\n             |    ")
        val crosses = (for {
          i <- ms.indices; j <- ms.indices if i < j
        } yield {
          val (a, b) = (ms(i)._1, ms(j)._1)
          s"CAST(sum($a*$b) AS BIGINT) AS s$a$b"
        }).mkString(",\n             |    ")
        val rows = (for {
          i <- ms.indices; j <- ms.indices if i < j
        } yield {
          val (a, an) = ms(i); val (b, bn) = ms(j)
          s"""SELECT '$an' AS m1, '$bn' AS m2, n,
             |  round((CAST(n AS DOUBLE)*s$a$b - CAST(s$a AS DOUBLE)*s$b)
             |    / (sqrt(CAST(n AS DOUBLE)*s$a$a - CAST(s$a AS DOUBLE)*s$a)
             |      * sqrt(CAST(n AS DOUBLE)*s$b$b
             |        - CAST(s$b AS DOUBLE)*s$b)), 6) AS corr
             |FROM s"""
        }).mkString("\n             |UNION ALL\n             |")
        s"""WITH m AS (SELECT CAST(l_quantity AS BIGINT) AS q,
           |    CAST(round(l_extendedprice, 0) AS BIGINT) AS p,
           |    CAST(round(l_discount*100, 0) AS BIGINT) AS d,
           |    CAST(round(l_tax*100, 0) AS BIGINT) AS t
           |  FROM lineitem),
           |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |    $sums,
           |    $crosses
           |  FROM m)
           |$rows""".stripMargin
      },
      (s, dir) => {
        val ms = Seq("q" -> "quantity", "p" -> "extendedprice",
          "d" -> "discount", "t" -> "tax")
        val m = Tables.t(s, dir, "lineitem").select(
          col("l_quantity").cast("long").as("q"),
          round(col("l_extendedprice"), 0).cast("long").as("p"),
          round(col("l_discount") * 100, 0).cast("long").as("d"),
          round(col("l_tax") * 100, 0).cast("long").as("t"))
        val aggs = ms.flatMap { case (k, _) => Seq(
          sum(col(k)).as(s"s$k"), sum(col(k) * col(k)).as(s"s$k$k"))
        } ++ (for {
          i <- ms.indices; j <- ms.indices if i < j
        } yield sum(col(ms(i)._1) * col(ms(j)._1))
          .as(s"s${ms(i)._1}${ms(j)._1}"))
        val st = m.agg(count(lit(1)).as("n"), aggs: _*).graftCheckpoint()
        val pairRows = for {
          i <- ms.indices; j <- ms.indices if i < j
        } yield {
          val (a, an) = ms(i); val (b, bn) = ms(j)
          val nD = col("n").cast("double")
          def sd(x: String) = col(s"s$x").cast("double")
          st.select(lit(an).as("m1"), lit(bn).as("m2"), col("n"),
            round((nD * col(s"s$a$b") - sd(a) * col(s"s$b"))
              / (sqrt(nD * col(s"s$a$a") - sd(a) * col(s"s$a"))
                * sqrt(nD * col(s"s$b$b") - sd(b) * col(s"s$b"))), 6)
              .as("corr"))
        }
        pairRows.reduce(_ unionByName _)
      }),

    // COLUMN MUTUAL INFORMATION (event_type × ISO weekday): the
    // feature-selection / drift primitive for CATEGORICAL pairs —
    // I(A;B) = Σ p(a,b)·log₂(p(a,b)/(p(a)p(b))) from exact contingency
    // counts (one scan, |A|·|B|-bounded tables), with both marginal
    // entropies and the normalized MI/min(H) score. Only the final
    // logs are float, over identical exact-integer ratios.
    QueryDef(
      "q_mutual_info",
      Some("""WITH e AS (SELECT event_type AS a,
             |    isodow(ts::TIMESTAMP) AS b FROM events),
             |jt AS (SELECT a, b, CAST(count(*) AS BIGINT) AS nab
             |  FROM e GROUP BY 1, 2),
             |ma AS (SELECT a, CAST(sum(nab) AS BIGINT) AS na
             |  FROM jt GROUP BY 1),
             |mb AS (SELECT b, CAST(sum(nab) AS BIGINT) AS nb
             |  FROM jt GROUP BY 1),
             |nt AS (SELECT CAST(sum(nab) AS BIGINT) AS n FROM jt),
             |mi AS (SELECT sum((jt.nab / CAST(nt.n AS DOUBLE))
             |      * log2((CAST(jt.nab AS DOUBLE) * nt.n)
             |        / (CAST(ma.na AS DOUBLE) * mb.nb))) AS mi
             |  FROM jt JOIN ma USING (a) JOIN mb USING (b)
             |  CROSS JOIN nt),
             |ha AS (SELECT -sum((na / CAST(nt.n AS DOUBLE))
             |    * log2(na / CAST(nt.n AS DOUBLE))) AS h
             |  FROM ma CROSS JOIN nt),
             |hb AS (SELECT -sum((nb / CAST(nt.n AS DOUBLE))
             |    * log2(nb / CAST(nt.n AS DOUBLE))) AS h
             |  FROM mb CROSS JOIN nt)
             |SELECT nt.n, round(mi.mi, 6) AS mi_bits,
             |  round(ha.h, 6) AS h_type, round(hb.h, 6) AS h_dow,
             |  round(mi.mi / least(ha.h, hb.h), 6) AS nmi
             |FROM nt, mi, ha, hb""".stripMargin),
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .select(col("event_type").as("a"),
            dayofweek(col("ts")).as("__dow"))
          // Spark dayofweek: Sunday=1..Saturday=7 → ISO Monday=1..Sunday=7
          .withColumn("b", when(col("__dow") === 1, 7)
            .otherwise(col("__dow") - 1))
        val jt = e.groupBy("a", "b").agg(count(lit(1)).as("nab"))
          .graftCheckpoint() // feeds marginals, total and the MI sum
        val ma = jt.groupBy("a").agg(sum("nab").as("na"))
        val mb = jt.groupBy("b").agg(sum("nab").as("nb"))
        val nt = jt.agg(sum("nab").as("n"))
        val mi = jt.join(ma, "a").join(mb, "b")
          .crossJoin(broadcast(nt))
          .agg(sum((col("nab") / col("n").cast("double"))
            * log2((col("nab").cast("double") * col("n"))
              / (col("na").cast("double") * col("nb")))).as("mi"))
        val ha = ma.crossJoin(broadcast(nt))
          .agg((-sum((col("na") / col("n").cast("double"))
            * log2(col("na") / col("n").cast("double")))).as("h_type"))
        val hb = mb.crossJoin(broadcast(nt))
          .agg((-sum((col("nb") / col("n").cast("double"))
            * log2(col("nb") / col("n").cast("double")))).as("h_dow"))
        nt.crossJoin(broadcast(mi)).crossJoin(broadcast(ha))
          .crossJoin(broadcast(hb))
          .select(col("n"), round(col("mi"), 6).as("mi_bits"),
            round(col("h_type"), 6).as("h_type"),
            round(col("h_dow"), 6).as("h_dow"),
            round(col("mi") / least(col("h_type"), col("h_dow")), 6)
              .as("nmi"))
      })
  )
}

package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

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
             |  round(mu, 4) AS mean, round(sd, 4) AS sd,
             |  round(mn, 4) AS mn, round(mx, 4) AS mx,
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
      })
  )
}

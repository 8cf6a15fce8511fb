package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the reference's SQL layer gets "for free" from BigQuery
  * and a training-data pipeline needs at corpus scale: as-of (most recent
  * earlier fact) and interval/range containment. Spark has no native ASOF
  * or RANGE join operator, so both are re-expressed as shuffle-bounded
  * compositions of built-ins — no cross join, no per-row subquery.
  */
object Temporal {

  /** As-of join: for every left row, attach the most recent right row of
    * the same key with `rightTs <= leftTs` (inclusive). Implemented as the
    * union-tag trick: tag both sides, sort each key's timeline once, and
    * carry the latest right payload forward with
    * `last(payload, ignoreNulls) OVER (... ROWS UNBOUNDED PRECEDING)`.
    *
    * ONE shuffle (by `key`), no range explosion, no per-left-row probe —
    * the plan that survives a 100 TB timeline, unlike the
    * broadcast-subquery or point-in-interval crossJoin formulations.
    * At equal timestamps the right row sorts first (side 0 < 1), so the
    * match is inclusive. Right rows must be unique per (key, ts) for a
    * deterministic payload — pre-aggregate the right side if not.
    *
    * Right payload columns keep their names; callers project/rename
    * afterwards (left columns win on collision — avoid overlapping names).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filter(c => c != key && c != rightTs).toSeq
    val payload = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType

    val l = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
      .select(col(key), col("__ts"), col("__side"),
        col("__p"), struct(left.columns.map(col).toIndexedSeq: _*).as("__l"))
    val r = right.select(col(key), col(rightTs).as("__ts"),
        lit(0).as("__side"), payload.as("__p"))
      .withColumn("__l",
        lit(null).cast(l.select(col("__l")).schema.head.dataType))

    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.unionByName(l)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: payloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** NEAREST-in-time join: for every left row, attach the right row of
    * the same key whose timestamp is CLOSEST in either direction
    * (backward wins exact ties, including the 0-distance tie). The same
    * union-tag single-shuffle timeline as [[asofJoin]], but the sorted
    * pass carries BOTH the latest-prior payload (`last … UNBOUNDED
    * PRECEDING`) and the earliest-later payload (`first … UNBOUNDED
    * FOLLOWING`) — two frames over one sort, still exactly ONE shuffle,
    * vs the two asof joins + re-join a naive composition would pay.
    * Adds `__near_ts` (the chosen right timestamp) alongside the payload;
    * both are NULL when the key has no right rows at all.
    *
    * PRECONDITION: the right side must be unique on (key, rightTs). When
    * several right rows share a (key, timestamp), the last/first frames
    * pick an arbitrary payload among the ties and the result is
    * nondeterministic — pre-aggregate the right side to one row per
    * (key, ts) first (as q_asof_nearest does). Enforcing this in-operator
    * would cost a full extra aggregation on every call; callers that
    * can't guarantee uniqueness should dedup explicitly.
    */
  def nearestJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val payloadCols = right.columns.filter(c => c != key && c != rightTs).toSeq
    val payload = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payload).schema.head.dataType

    val l = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(payloadType))
      .select(col(key), col("__ts"), col("__side"),
        col("__p"), struct(left.columns.map(col).toIndexedSeq: _*).as("__l"))
    val r = right.select(col(key), col(rightTs).as("__ts"),
        lit(0).as("__side"), payload.as("__p"))
      .withColumn("__l",
        lit(null).cast(l.select(col("__l")).schema.head.dataType))

    val base = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rightTsCol = when(col("__side") === 0, col("__ts"))
    val merged = r.unionByName(l)
      .withColumn("__b", last(col("__p"), ignoreNulls = true).over(wb))
      .withColumn("__bts", last(rightTsCol, ignoreNulls = true).over(wb))
      .withColumn("__f", first(col("__p"), ignoreNulls = true).over(wf))
      .withColumn("__fts", first(rightTsCol, ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
    // backward candidate wins when the forward one is absent or strictly
    // farther; equal distance (and the 0-distance same-ts case, which the
    // sort order routes into the backward frame) resolves backward
    val useBack = col("__fts").isNull ||
      (col("__bts").isNotNull &&
        col("__ts") - col("__bts") <= col("__fts") - col("__ts"))
    val chosen = when(useBack, col("__b")).otherwise(col("__f"))
    merged
      .withColumn("__near", chosen)
      .withColumn("__near_ts",
        when(useBack, col("__bts")).otherwise(col("__fts")))
      .select(col("__l.*") +:
        payloadCols.map(c => col(s"__near.$c").as(c)) :+
        col("__near_ts"): _*)
  }

  /** SCD Type-2 historization: turn a change log (one row per key per
    * change event) into versioned dimension rows with `[valid_from,
    * valid_to)` intervals and a current flag — the distributed analogue of
    * the reference's history tables (append + latest-per-key), but with
    * full interval semantics so point-in-time joins (`asofJoin`) can hit
    * any version. One shuffle: a window partitioned BY KEY (never global);
    * `tieBreak` totally orders simultaneous changes so the version chain
    * is deterministic. `valid_to` is null on the open (current) version.
    */
  def scd2(changeLog: DataFrame, key: String, ts: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tieBreak))
    changeLog
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }

  /** Point-in-time lookup over an SCD2 dimension ([[scd2]] output): the
    * version whose `[valid_from, valid_to)` interval contains `atTs` —
    * at most one row per key by construction of the version chain. A pure
    * filter: no shuffle, pushes down to the dimension scan.
    */
  def scd2AsOf(dim: DataFrame, atTs: Column): DataFrame =
    dim.filter(col("valid_from") <= atTs &&
      (col("valid_to").isNull || col("valid_to") > atTs))

  /** Interval containment join WITHOUT an equi key: left points land in
    * right `[start, end)` intervals. Both sides are bucketed on
    * `bucketWidth`-sized time cells: each point belongs to exactly one
    * bucket, each interval is exploded to every bucket it overlaps, and the
    * join becomes a plain equi-join on the bucket id plus an exact range
    * filter. Shuffle volume is O(points + intervals · span/bucketWidth),
    * and per-bucket density — not corpus size — bounds the worst task, the
    * property that keeps this viable at 100 TB where a theta-join would be
    * a broadcast-nested-loop over everything.
    *
    * `pointCol`, `startCol`, `endCol` are long (e.g. epoch micros);
    * `end` is exclusive.
    */
  def rangeJoin(left: DataFrame, pointCol: String,
      right: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left.withColumn("__bucket", floor(col(pointCol) / bucketWidth))
    val r = right
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        floor(col(startCol) / bucketWidth),
        floor((col(endCol) - 1) / bucketWidth))))
    l.join(r, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}

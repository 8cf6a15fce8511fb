package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{Sampling, Temporal}
import graft.dedup.Dedup

/** Round-3 operators: as-of join, bucketed range join, hash sampling,
  * char n-grams, redaction. Each is checked against an independent
  * formulation (brute force / theta join / direct construction).
  */
class TemporalSpec extends SparkSpec {

  import spark.implicits._

  test("asofJoin matches the per-row most-recent-earlier brute force") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"),
        (3L, 5L, "d"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 20L, 200.0), (2L, 30L, 300.0))
      .toDF("k", "ts", "v")
    val got = Temporal.asofJoin(left, right, "k", "ts", "ts")
      .select("k", "ts", "tag", "v").collect().toSet
    // brute force: max right.ts <= left.ts per key
    assert(got === Set(
      Row(1L, 10L, "a", 100.0),   // right@5
      Row(1L, 20L, "b", 200.0),   // inclusive tie at 20
      Row(2L, 15L, "c", null),    // right@30 is later
      Row(3L, 5L, "d", null)))    // no right side for key 3
  }

  test("rangeJoin equals the theta join, intervals spanning buckets") {
    val points = (0L to 100L by 7).toDF("p")
    val ivals = Seq((0L, 3L, 9L), (1L, 9L, 40L), (2L, 35L, 36L),
        (3L, 90L, 200L), (4L, 50L, 50L)) // empty interval dropped
      .toDF("iid", "s", "e")
    val got = Temporal.rangeJoin(points, "p", ivals, "s", "e", bucketWidth = 10L)
      .select("p", "iid").as[(Long, Long)].collect().toSet
    val want = (for {
      p <- 0L to 100L by 7
      (iid, s, e) <- Seq((0L, 3L, 9L), (1L, 9L, 40L), (2L, 35L, 36L),
        (3L, 90L, 200L), (4L, 50L, 50L))
      if p >= s && p < e
    } yield (p, iid)).toSet
    assert(got === want)
  }

  test("hashSplit is exhaustive, deterministic, and ~80/10/10") {
    val df = Tables.t(spark, sf, "documents").select("doc_id")
    val s1 = Sampling.hashSplit(df, "doc_id")
    val counts = s1.groupBy("split").count().as[(String, Long)]
      .collect().toMap
    val n = df.count()
    assert(counts.values.sum === n)
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // deterministic: re-running yields the identical assignment
    val s2 = Sampling.hashSplit(df, "doc_id")
    assert(s1.except(s2).isEmpty && s2.except(s1).isEmpty)
    // sampleHash keeps the subset the bucket predicate defines
    val kept = Sampling.sampleHash(df, "doc_id", 0.2).count()
    assert(kept > 0 && kept < n)
  }

  test("sampling guards: column collisions rejected, non-positive weights excluded") {
    import spark.implicits._
    // prioritySample exposes 'priority'; a pre-existing one must fail
    // loudly instead of being silently overwritten
    val clash = Seq((1L, 9L)).toDF("doc_id", "priority")
    intercept[IllegalArgumentException] {
      Sampling.prioritySample(clash, "doc_id", 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(Seq((1L, 0.5, 1.0)).toDF("doc_id", "__es", "w"),
        "doc_id", "w", 1)
    }
    // zero/negative weights would draw -Inf/negative exponential variates
    // and deterministically win the race - they must be excluded, not win
    val w = Seq((1L, 0.0), (2L, -3.0), (3L, 1.0), (4L, 2.0))
      .toDF("doc_id", "w")
    val won = Sampling.weightedSample(w, "doc_id", "w", 2)
      .select("doc_id").as[Long].collect().toSet
    assert(won == Set(3L, 4L), s"non-positive weights leaked: $won")
  }

  test("charNgramSets: correct grams, short strings empty") {
    val df = Seq((1L, "abcd"), (2L, "ab"), (3L, "aaaa")).toDF("id", "t")
    val got = Dedup.charNgramSets(df, "id", "t", 3)
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L).toSet === Set("abc", "bcd"))
    assert(got(2L).isEmpty)
    assert(got(3L) === Seq("aaa")) // distinct
  }

  test("redact scrubs emails and phones and counts spans") {
    import graft.text.Redact
    val df = Seq((1L, "mail me at a.b@x.co or call +41 79 123 45 67 now"),
        (2L, "clean text")).toDF("id", "t")
    val (scrubbed, n) = Redact.scrub(col("t"))
    val r1 = df.filter($"id" === 1L).select(scrubbed, n)
      .as[(String, Int)].head()
    assert(r1._1 === "mail me at <EMAIL> or call <PHONE> now")
    assert(r1._2 === 2)
    val r2 = df.filter($"id" === 2L).select(scrubbed, n)
      .as[(String, Int)].head()
    assert(r2 === ("clean text", 0))
  }

  test("nearestJoin picks the true minimum-distance match per user") {
    val rows = q("q_asof_nearest").collect()
    val ev = Tables.t(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val purchases = ev.filter(_._3 == "purchase")
      .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toVector }
    assert(rows.length == ev.length, "nearest join must preserve left rows")
    for (r <- rows) {
      val (u, ts) = (r.getAs[Long]("user_id"), r.getAs[Long]("ts_us"))
      purchases.get(u) match {
        case None =>
          assert(r.isNullAt(r.fieldIndex("purchase_id")),
            s"user $u has no purchases but event at $ts matched")
        case Some(ps) =>
          val best = ps.map(p => math.abs(p - ts)).min
          val got = math.abs(r.getAs[Long]("delta_us"))
          assert(got == best, s"user $u @ $ts: |delta| $got != nearest $best")
      }
    }
    // both directions must actually occur, or the query is a plain as-of
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("delta_us")) &&
      r.getAs[Long]("delta_us") < 0))
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("delta_us")) &&
      r.getAs[Long]("delta_us") > 0))
  }
}

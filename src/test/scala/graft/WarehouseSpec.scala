package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.tables.Warehouse

class WarehouseSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft-wh").toString

  test("overwrite → read round-trips and bumps snapshots") {
    val wh = new Warehouse(spark, freshRoot())
    val o = spark.read.parquet(s"$sf/orders.parquet")
    wh.overwrite("orders", o)
    assert(wh.read("orders").count() == o.count())
    wh.overwrite("orders", o.limit(10))
    assert(wh.read("orders").count() == 10)
    assert(wh.paths("orders") == Seq(wh.paths("orders").head))
    assert(wh.paths("orders").head.endsWith("data-000001"))
  }

  test("upsert replaces keyed rows, append adds, appendIfAbsent dedups") {
    val wh = new Warehouse(spark, freshRoot())
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    wh.overwrite("t", o)
    val batch = o.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", lit(-1.0))
    wh.upsert("t", batch, Seq("o_orderkey"))
    val after = wh.read("t")
    assert(after.count() == o.count())
    assert(after.filter(col("o_totalprice") === -1.0).count() == batch.count())
    // appendIfAbsent with already-present keys is a no-op
    wh.appendIfAbsent("t", batch, Seq("o_orderkey"))
    assert(wh.read("t").count() == o.count())
    // append duplicates rows
    wh.append("t", batch)
    assert(wh.read("t").count() == o.count() + batch.count())
  }

  test("upsert on missing table creates it; old snapshots pruned") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root)
    val o = spark.read.parquet(s"$sf/orders.parquet").limit(100)
    wh.upsert("x", o, Seq("o_orderkey"))
    assert(wh.read("x").count() == 100)
    (1 to 3).foreach(_ => wh.overwrite("x", o))
    val files = new java.io.File(s"$root/x").listFiles().map(_.getName)
    assert(files.count(_.endsWith(".manifest")) <= 2,
      s"expected manifest pruning, got ${files.toSeq}")
    assert(files.count(_.startsWith("data-")) <= 2,
      s"expected data pruning, got ${files.toSeq}")
  }

  test("append is O(batch): prior data files are not rewritten") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root)
    val o = spark.read.parquet(s"$sf/orders.parquet").limit(1000)
    wh.overwrite("t", o)
    val firstDir = new java.io.File(wh.paths("t").head)
    def fileState(d: java.io.File): Map[String, (Long, Long)] =
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
    val before = fileState(firstDir)
    assert(before.nonEmpty)
    wh.append("t", o.limit(50))
    wh.append("t", o.limit(20))
    // same dir still referenced, same files, same bytes, same mtimes
    assert(wh.paths("t").head == firstDir.toString)
    assert(wh.paths("t").size == 3)
    assert(fileState(firstDir) == before, "append rewrote prior data files")
    assert(wh.read("t").count() == 1070)
  }

  test("compact collapses appended dirs to one; values and schema survive") {
    val wh = new Warehouse(spark, freshRoot())
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    wh.overwrite("t", o)
    wh.append("t", o.limit(5))
    wh.append("t", o.limit(3))
    assert(wh.paths("t").size == 3)
    val before = wh.read("t").count()
    wh.compact("t")
    assert(wh.paths("t").size == 1)
    assert(wh.read("t").count() == before)
  }

  test("schema evolution: append with an extra column surfaces NULL-padded superset") {
    val wh = new Warehouse(spark, freshRoot())
    val o = spark.read.parquet(s"$sf/orders.parquet")
    wh.overwrite("t", o.select("o_orderkey", "o_totalprice").limit(10))
    wh.append("t", o.select("o_orderkey", "o_totalprice", "o_orderstatus").limit(4))
    val r = wh.read("t")
    assert(r.columns.toSet == Set("o_orderkey", "o_totalprice", "o_orderstatus"))
    assert(r.filter(col("o_orderstatus").isNull).count() == 10)
  }

  test("partitioned upsert rewrites ONLY affected partitions") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root)
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    wh.overwritePartitioned("ev", ev, "event_type")
    val before = wh.paths("ev").map(p => p -> fileSnapshot(p)).toMap
    val batch = ev.filter(col("event_type") === "purchase")
      .withColumn("value", col("value") * 2)
    wh.upsertPartitioned("ev", batch, Seq("event_id"), "event_type")
    val after = wh.paths("ev")
    // untouched partitions keep the ORIGINAL dirs, byte-identical
    val untouched = after.filterNot(_.contains("__part=purchase"))
    assert(untouched.nonEmpty && untouched.forall(before.contains))
    untouched.foreach(p => assert(fileSnapshot(p) == before(p), p))
    // the purchase partition moved to a fresh dir
    val touched = after.filter(_.contains("__part=purchase"))
    assert(touched.nonEmpty && touched.forall(!before.contains(_)))
    // values: purchases doubled, everything else identical
    val r = wh.read("ev")
    assert(r.count() == ev.count())
    val expect = ev.withColumn("value",
      when(col("event_type") === "purchase", col("value") * 2)
        .otherwise(col("value")))
    assert(r.exceptAll(expect).isEmpty && expect.exceptAll(r).isEmpty)
  }

  private def fileSnapshot(dir: String): Set[(String, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).map(st =>
      (st.getPath.getName, st.getLen, st.getModificationTime)).toSet
  }

  test("snapshotDiff: unchanged NULL-bearing rows produce ZERO diff rows") {
    val wh = new Warehouse(spark, freshRoot())
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      // every 'O' row carries a NULL — null-unsafe equality would report
      // each of them as a spurious delete+insert pair
      .withColumn("maybe_null", nullif(col("o_orderstatus"), lit("O")))
    wh.overwrite("t", o)
    val batch = o.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    wh.upsert("t", batch, Seq("o_orderkey"))
    val snaps = wh.snapshots("t")
    val diff = wh.snapshotDiff("t", snaps.head, snaps.last)
    val nBatch = batch.count()
    assert(o.filter(col("maybe_null").isNull).count() > 0, "fixture has no NULLs")
    assert(diff.count() == 2 * nBatch,
      s"expected ${2 * nBatch} diff rows (insert+delete per updated key), got ${diff.count()}")
    assert(diff.filter(col("o_orderkey") % 10 =!= 0).count() == 0,
      "unchanged rows leaked into the diff")
  }

  test("snapshotDiff across a schema-evolving append reads and diffs cleanly") {
    val wh = new Warehouse(spark, freshRoot())
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val first = o.select("o_orderkey", "o_totalprice").limit(10)
    wh.overwrite("t", first)
    // the append introduces a new column: the older snapshot lacks it and
    // must read + align (NULL-padded) instead of throwing
    wh.append("t", o.select("o_orderkey", "o_totalprice", "o_orderstatus")
      .join(first.select("o_orderkey"), Seq("o_orderkey"), "left_anti").limit(4))
    val snaps = wh.snapshots("t")
    val diff = wh.snapshotDiff("t", snaps.head, snaps.last)
    // exactly the 4 appended rows are inserts; the 10 pre-evolution rows
    // (NULL o_orderstatus after padding) are unchanged
    assert(diff.filter(col("change") === "insert").count() == 4)
    assert(diff.filter(col("change") === "delete").count() == 0)
  }

  test("append onto a partitioned table keeps partition manifest lines intact") {
    val wh = new Warehouse(spark, freshRoot())
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    wh.overwritePartitioned("ev", ev, "event_type")
    val n = ev.count()
    wh.append("ev", ev.limit(25))
    // the prior partition dirs must survive as full relative lines —
    // Path.getName would have committed dangling "__part=x" lines and
    // silently dropped the whole original table on the next read
    val partLines = wh.paths("ev").filter(_.contains("/data-") )
      .filter(_.contains("__part="))
    assert(partLines.nonEmpty, s"partition lines lost: ${wh.paths("ev")}")
    assert(wh.read("ev").count() == n + 25)
  }

  test("upsertPartitioned with an escaped partition value does not duplicate rows") {
    import spark.implicits._
    val wh = new Warehouse(spark, freshRoot())
    // ':' and space force Spark's partition-directory escaping (%3A, %20)
    val base = Seq((1L, "a:b", 10.0), (2L, "a:b", 20.0), (3L, "plain c", 30.0))
      .toDF("id", "cat", "v")
    wh.overwritePartitioned("t", base, "cat")
    val batch = Seq((1L, "a:b", -1.0), (3L, "plain c", -3.0)).toDF("id", "cat", "v")
    wh.upsertPartitioned("t", batch, Seq("id"), "cat")
    val r = wh.read("t").select("id", "cat", "v").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2))).toSet
    // an escaped dir name that fails to match its raw batch value keeps the
    // stale partition line alongside the new one → duplicated keys
    assert(r == Set((1L, "a:b", -1.0), (2L, "a:b", 20.0), (3L, "plain c", -3.0)),
      s"got $r")
    wh.deletePartitioned("t", Seq((2L, "a:b")).toDF("id", "cat"), Seq("id"), "cat")
    assert(wh.read("t").count() == 2)
  }

  test("partitioned append keeps the table partition-operable (upsert/compact after append)") {
    import spark.implicits._
    val wh = new Warehouse(spark, freshRoot())
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "cat", "v")
    wh.overwritePartitioned("t", base, "cat")
    // append routes through the recorded partition column — including a
    // BRAND-NEW partition ("c") — so every manifest line stays a
    // partition line and partition-local ops keep working
    wh.append("t", Seq((3L, "a", 3.0), (4L, "c", 4.0)).toDF("id", "cat", "v"))
    assert(wh.read("t").count() == 4)
    assert(wh.paths("t").forall(_.contains("__part=")), wh.paths("t"))
    wh.upsertPartitioned("t", Seq((3L, "a", -3.0)).toDF("id", "cat", "v"),
      Seq("id"), "cat")
    def vals() = wh.read("t").select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(vals() == Map(1L -> 1.0, 2L -> 2.0, 3L -> -3.0, 4L -> 4.0))
    // compact preserves the partition layout instead of flattening it
    wh.compact("t")
    assert(wh.paths("t").forall(_.contains("__part=")), wh.paths("t"))
    assert(wh.paths("t").map(_.split("/data-").head).distinct.size == 1,
      "compact should collapse to one data dir")
    wh.upsertPartitioned("t", Seq((4L, "c", -4.0)).toDF("id", "cat", "v"),
      Seq("id"), "cat")
    assert(vals() == Map(1L -> 1.0, 2L -> 2.0, 3L -> -3.0, 4L -> -4.0))
  }

  test("partitioned upsert preserves schema-evolved columns in rewritten partitions") {
    import spark.implicits._
    val wh = new Warehouse(spark, freshRoot())
    val base = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("id", "cat", "v")
    wh.overwritePartitioned("t", base, "cat")
    // schema-evolving append introduces `tag` (only row 4 carries it)
    wh.append("t", Seq((4L, "a", 4.0, "keep")).toDF("id", "cat", "v", "tag"))
    // an OLD-schema batch (no `tag`) upserts into partition 'a' — the
    // rewrite of that partition must not strip `tag` from kept row 4
    wh.upsertPartitioned("t", Seq((1L, "a", -1.0)).toDF("id", "cat", "v"),
      Seq("id"), "cat")
    val r = wh.read("t")
    assert(r.columns.contains("tag"),
      s"evolved column lost entirely: ${r.columns.toSeq}")
    val tags = r.select("id", "tag").collect()
      .map(x => x.getLong(0) -> Option(x.getString(1))).toMap
    assert(tags(4L) == Some("keep"),
      s"evolved value lost in rewritten partition: $tags")
    assert(tags(1L) == None && tags(3L) == None)
    val vals = r.select("id", "v").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(vals == Map(1L -> -1.0, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0))
  }

  test("flat overwrite of a partitioned table retires its partition routing") {
    import spark.implicits._
    val wh = new Warehouse(spark, freshRoot())
    wh.overwritePartitioned("t",
      Seq((1L, "a", 1.0)).toDF("id", "cat", "v"), "cat")
    wh.overwrite("t", Seq((1L, 1.0)).toDF("id", "v")) // no cat column
    // append must go flat — routing through the stale partition column
    // would fail on the missing column
    wh.append("t", Seq((2L, 2.0)).toDF("id", "v"))
    assert(wh.read("t").count() == 2)
    assert(wh.paths("t").forall(!_.contains("__part=")), wh.paths("t"))
  }

  test("a lost _LATEST marker recovers to the newest manifest, not data loss") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root)
    val o = spark.read.parquet(s"$sf/orders.parquet").limit(100)
    wh.overwrite("t", o)
    wh.append("t", o.limit(10))
    new java.io.File(s"$root/t/_LATEST").delete()
    assert(wh.exists("t"), "missing marker must not read as missing table")
    assert(wh.read("t").count() == 110)
    // a subsequent append must build on the recovered state
    wh.append("t", o.limit(5))
    assert(wh.read("t").count() == 115)
  }

  test("mergeConditional drives all four clause outcomes") {
    import spark.implicits._
    val wh = new Warehouse(spark, freshRoot())
    wh.overwrite("t", Seq(
      (1L, "upd", 10.0),   // matched, update condition true
      (2L, "del", 10.0),   // matched, delete condition true
      (3L, "keep", 10.0),  // matched, neither → keep target version
      (4L, "only", 10.0)   // unmatched target → untouched
    ).toDF("k", "tag", "v"))
    wh.mergeConditional("t", Seq(
      (1L, "upd", 99.0),
      (2L, "del", 99.0),
      (3L, "keep", 99.0),
      (5L, "ins", 99.0)    // unmatched source → insert
    ).toDF("k", "tag", "v"), Seq("k"),
      updateWhen = expr("t.tag = 'upd'"),
      deleteWhen = expr("t.tag = 'del'"))
    val got = wh.read("t").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(got == Map(
      1L -> ("upd", 99.0),   // took batch row
      3L -> ("keep", 10.0),  // kept target row
      4L -> ("only", 10.0),  // untouched
      5L -> ("ins", 99.0)))  // inserted; 2L deleted
  }
}

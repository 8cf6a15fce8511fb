package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.BottomKLongs

/** [[BottomKLongs]] — the bounded keep-lowest aggregate that replaced the
  * per-bucket row_number window in the capped LSH/SemDeDup paths. The
  * contract: identical keep-lowest semantics (so gated hashes don't move)
  * with map-side buffers bounded at k.
  */
class BottomKSpec extends SparkSpec {

  test("agrees with the window formulation on skewed keyed data") {
    import spark.implicits._
    // deterministic skew: key 0 holds half the ids, key sizes below and
    // above k both present
    val rows = (0L until 400L).map { i =>
      val key = if (i % 2 == 0) 0L else 1L + (i % 7)
      (key, i)
    }
    val df = rows.toDF("key", "id").repartition(8)
    val k = 5
    val viaAgg = df.groupBy("key")
      .agg(BottomKLongs.bottomK(spark, col("id"), k).as("ids"))
      .select(col("key"), explode(col("ids")).as("id"))
    val viaWindow = df.withColumn("rn",
        row_number().over(Window.partitionBy("key").orderBy("id")))
      .filter(col("rn") <= k).select("key", "id")
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
    // output is sorted ascending per key
    val sortedOk = df.groupBy("key")
      .agg(BottomKLongs.bottomK(spark, col("id"), k).as("ids"))
      .filter(col("ids") =!= array_sort(col("ids"))).count()
    assert(sortedOk == 0)
  }

  test("groups smaller than k pass through whole; nulls ignored") {
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (1L, Some(3L)), (1L, None),
      (2L, Some(7L))).toDF("key", "id")
    val got = df.groupBy("key")
      .agg(BottomKLongs.bottomK(spark, col("id"), 5).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(3L, 10L))
    assert(got(2L) == Seq(7L))
  }

  test("generic BottomK.perKey: agrees with BottomKLongs on longs; strings bounded, nulls skipped") {
    import spark.implicits._
    val rows = (0L until 400L).map { i =>
      (if (i % 2 == 0) 0L else 1L + (i % 7), i)
    }
    val df = rows.toDF("key", "id").repartition(8)
    val k = 5
    val viaAgg = df.groupBy("key")
      .agg(BottomKLongs.bottomK(spark, col("id"), k).as("ids"))
      .select(col("key"), explode(col("ids")).as("id"))
    val generic = graft.ops.BottomK.perKey(df, Seq("key"), "id", k)
    assert(generic.exceptAll(viaAgg).isEmpty &&
      viaAgg.exceptAll(generic).isEmpty,
      "generic two-phase bottom-k must equal the typed aggregate's cut")
    // strings: native binary order, NULL ids never occupy a cap slot
    val sdf = Seq(("a", Some("x09")), ("a", Some("x03")), ("a", None),
      ("a", Some("x11")), ("b", Some("z"))).toDF("key", "id")
      .repartition(3)
    val got = graft.ops.BottomK.perKey(sdf, Seq("key"), "id", 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "x03"), ("a", "x09"), ("b", "z")))
  }

  test("BottomKAny: window parity on skewed STRING keys; buffers bounded at k") {
    import spark.implicits._
    // deterministic skew: key "hot" holds half the ids; ids are strings
    // whose binary order differs from numeric order (x10 < x9)
    val rows = (0 until 400).map { i =>
      val key = if (i % 2 == 0) "hot" else s"k${i % 7}"
      (key, s"x$i")
    }
    val df = rows.toDF("key", "id").repartition(8)
    val k = 5
    val viaAgg = graft.ops.BottomK.perKey(df, Seq("key"), "id", k)
    val viaWindow = df.withColumn("rn",
        row_number().over(Window.partitionBy("key").orderBy("id")))
      .filter(col("rn") <= k).select("key", "id")
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty,
      "bounded generic aggregate must equal the window's keep-lowest cut")
  }

  test("BottomKAny: serialize/merge round-trip keeps k smallest, copies values") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val agg = graft.expressions.BottomKAny(
      BoundReference(0, StringType, nullable = true), 3)
    val b1 = agg.createAggregationBuffer()
    // shared mutable buffer: the same UTF8String instance is rewritten
    // between updates — the aggregate must copy on insert
    Seq("x9", "x1", "x7", "x5", null).foreach { s =>
      agg.update(b1, InternalRow(
        if (s == null) null else UTF8String.fromString(s)))
    }
    assert(b1.size <= 3, "buffer never exceeds k")
    val b2 = agg.createAggregationBuffer()
    Seq("x2", "x8", "x0").foreach { s =>
      agg.update(b2, InternalRow(UTF8String.fromString(s)))
    }
    val merged = agg.merge(b1, agg.deserialize(agg.serialize(b2)))
    val got = agg.eval(merged)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .array.map(_.toString).toSeq
    assert(got == Seq("x0", "x1", "x2"))
  }

  test("partial-aggregation bound: merge of serialized buffers keeps k smallest") {
    val agg = BottomKLongs(org.apache.spark.sql.catalyst.expressions.Literal(0L), 3)
    val b1 = agg.createAggregationBuffer()
    Seq(9L, 1L, 7L, 5L).foreach { x =>
      // exercise the same insert path update() uses, via deserialize(merge)
      val tmp = agg.deserialize(agg.serialize(b1)); b1.clear()
      tmp.foreach(b1.enqueue(_))
      if (b1.size < 3) b1.enqueue(x)
      else if (x < b1.head) { b1.dequeue(); b1.enqueue(x) }
    }
    val b2 = agg.createAggregationBuffer()
    Seq(2L, 8L, 0L).foreach { x =>
      if (b2.size < 3) b2.enqueue(x)
      else if (x < b2.head) { b2.dequeue(); b2.enqueue(x) }
    }
    assert(b1.size <= 3 && b2.size <= 3, "buffers never exceed k")
    val merged = agg.merge(b1, agg.deserialize(agg.serialize(b2)))
    assert(merged.toArray.sorted.toSeq == Seq(0L, 1L, 2L))
  }
}

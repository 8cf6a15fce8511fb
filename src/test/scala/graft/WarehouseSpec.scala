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
    assert(wh.path("orders").endsWith("snap-000001"))
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
    val snaps = new java.io.File(s"$root/x").listFiles()
      .map(_.getName).filter(_.startsWith("snap-"))
    assert(snaps.length <= 2, s"expected pruning, got ${snaps.toSeq}")
  }
}

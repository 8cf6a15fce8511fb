package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {
  import graft.ingest.{Enrich, Paginator, SheetCsv}

  test("keysetCursor terminates and respects rowLimit") {
    val pages = (0 until 4).map(i =>
      (0 until 10).map(j => s"""{"id":${i * 10 + j}}"""))
    def fetch(c: Option[String]): Paginator.Page = {
      val i = c.map(_.toInt).getOrElse(0)
      if (i >= 4) Paginator.Page(Nil, None)
      else Paginator.Page(pages(i), Some((i + 1).toString))
    }
    assert(Paginator.keysetCursor(fetch).size == 40)
    assert(Paginator.keysetCursor(fetch, rowLimit = 25).size == 25)
  }

  test("pageNumber stops on last page") {
    def fetch(p: Int): Paginator.Page =
      Paginator.Page(Seq(s"""{"p":$p}"""), if (p >= 2) None else Some(""))
    assert(Paginator.pageNumber(fetch).size == 3)
  }

  test("perKeyFetch enriches every row and captures failures") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey").limit(100)
    val out = Enrich.perKeyFetch(
      o, "o_orderkey",
      key => if (key.toLong % 7 == 0) sys.error(s"boom $key")
             else s"""{"ok":true}""",
      partitions = 4,
      policy = Enrich.Policy(maxRetries = 1))
    val rows = out.collect()
    assert(rows.length == 100)
    val failed = rows.filter(!_.isNullAt(rows.head.fieldIndex("detail_error")))
    assert(failed.nonEmpty)
    assert(failed.forall(_.getAs[Long]("o_orderkey") % 7 == 0))
    assert(rows.filter(_.isNullAt(rows.head.fieldIndex("detail_error")))
      .forall(r => r.getAs[String]("detail") == """{"ok":true}"""))
  }

  test("perKeyFetch retries transient failures") {
    import spark.implicits._
    val counters = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val df = Seq(1L, 2L).toDF("k")
    val out = Enrich.perKeyFetch(
      df, "k",
      key => {
        val n = counters.merge(key, 1, (a, b) => a + b)
        if (n < 2) sys.error("transient") else s"""{"attempt":$n}"""
      },
      partitions = 1,
      policy = Enrich.Policy(maxRetries = 3))
    // local mode: executors share the JVM, so the counter map is visible
    assert(out.filter(col("detail").isNotNull).count() == 2)
  }

  test("sheet carve slices rows by position on an all-string read") {
    val dir = Files.createTempDirectory("graft-sheet").toString
    val n = spark.read.parquet(s"$sf/nation.parquet")
    n.orderBy("n_nationkey").coalesce(1)
      .write.option("header", "true").mode("overwrite").csv(s"$dir/sheet")
    val indexed = SheetCsv.readIndexed(spark, s"$dir/sheet")
    assert(indexed.schema.fields.filter(_.name != "__row")
      .forall(_.dataType.typeName == "string"))
    val carved = SheetCsv.carve(indexed, 5, 10, Seq("n_nationkey", "n_name"))
    assert(carved.count() == 5)
    assert(carved.agg(min(col("n_nationkey").cast("int"))).first().getInt(0) == 5)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

class ScalarSpec extends SparkSpec {
  import graft.ops.{Coerce, Flatten}

  test("json flatten extracts k and missing is null") {
    val rows = q("q_json_flatten").limit(50).collect()
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("prop_missing"))))
    assert(rows.exists(!_.isNullAt(rows.head.fieldIndex("prop_k"))))
  }

  test("coerce: n.a. parses to null, fill casts to 0") {
    val rows = q("q_coerce_numeric").collect()
    val bad = rows.filter(_.getAs[Long]("doc_id") % 10 == 0)
    assert(bad.nonEmpty && bad.forall(r => r.isNullAt(r.fieldIndex("parsed"))))
    assert(bad.forall(_.getAs[Long]("filled") == 0L))
  }

  test("german date round-trips") {
    val rows = q("q_time_convert").limit(100).collect()
    rows.foreach { r =>
      assert(r.getAs[java.sql.Date]("german_parsed") == r.getAs[java.sql.Date]("order_date"))
    }
  }

  test("pct / thousands / na coercers") {
    import spark.implicits._
    val df = Seq(("12.5%", "1,234.5", "n.a."), ("100%", "7", "x"))
      .toDF("pct", "th", "na")
    val out = df.select(
      Coerce.pctToFraction($"pct").as("p"),
      Coerce.stripThousands($"th").as("t"),
      Coerce.naToNull($"na").as("n")).collect()
    assert(out(0).getDouble(0) == 0.125 && out(1).getDouble(0) == 1.0)
    assert(out(0).getDouble(1) == 1234.5 && out(1).getDouble(1) == 7.0)
    assert(out(0).isNullAt(2) && out(1).getString(2) == "x")
  }

  test("flatten expands nested structs depth-first") {
    import spark.implicits._
    val df = Seq((1L, "s", 2.0)).toDF("id", "a", "b")
      .select(col("id"), struct(col("a"), struct(col("b").as("inner")).as("nest")).as("payload"))
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "payload_a", "payload_nest_inner"))
  }

  test("month-year parses to month end") {
    import spark.implicits._
    val out = Seq("Feb-24", "Dec-23").toDF("my")
      .select(Coerce.monthYearToMonthEnd($"my").as("d")).collect()
    assert(out(0).getAs[java.sql.Date]("d").toString == "2024-02-29")
    assert(out(1).getAs[java.sql.Date]("d").toString == "2023-12-31")
  }
}

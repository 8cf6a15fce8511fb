package graft

import org.apache.spark.sql.types._

/** Fixture-schema CONTRACT. The round-8 regression (driver regenerated
  * events `ts` as timestamp[us] where it had been timestamp[ns], silently
  * breaking six streaming queries) shipped because nothing asserted what
  * the fixture tables look like. This spec turns the next generation
  * drift into ONE named failure pointing at the normalization helper,
  * instead of a pile of red bench rows.
  *
  * Columns with a normalization path (`events.ts` via
  * [[Tables.normalizeEventTs]]) tolerate every generation the helper
  * handles; everything else is pinned exactly.
  */
class FixtureSchemaSpec extends SparkSpec {

  private def fields(name: String) =
    spark.read.parquet(s"$sf/$name.parquet").schema
      .map(f => f.name -> f.dataType)

  private def assertExact(table: String, expect: Seq[(String, DataType)]): Unit = {
    val got = fields(table)
    assert(got == expect,
      s"fixture table '$table' drifted.\n  expected: $expect\n  got:      $got\n" +
        "If the driver regenerated fixtures, update this contract AND check " +
        "every reader of the changed column.")
  }

  test("dimension and fact tables have the pinned schemas") {
    assertExact("region", Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertExact("nation", Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assertExact("customer", Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assertExact("supplier", Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assertExact("part", Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    assertExact("documents", Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assertExact("embeddings", Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, true),
      "label" -> IntegerType))
  }

  test("orders/lineitem date columns are µs timestamps (either tz flavor)") {
    // both NTZ (isAdjustedToUTC=false) and TIMESTAMP read identically
    // under the UTC session tz our queries pin; either is acceptable
    val tsLike: Set[DataType] = Set(TimestampType, TimestampNTZType)
    val o = fields("orders").toMap
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType &&
      o("o_orderstatus") == StringType && o("o_totalprice") == DoubleType &&
      o("o_orderpriority") == StringType, s"orders drifted: $o")
    assert(tsLike.contains(o("o_orderdate")), s"o_orderdate: ${o("o_orderdate")}")
    val l = fields("lineitem").toMap
    assert(l("l_orderkey") == LongType && l("l_partkey") == LongType &&
      l("l_suppkey") == LongType && l("l_linenumber") == IntegerType &&
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .forall(c => l(c) == DoubleType) &&
      l("l_returnflag") == StringType && l("l_linestatus") == StringType,
      s"lineitem drifted: $l")
    assert(tsLike.contains(l("l_shipdate")), s"l_shipdate: ${l("l_shipdate")}")
  }

  test("events: ts is a generation normalizeEventTs handles; rest pinned") {
    val e = fields("events").toMap
    assert(e("event_id") == LongType && e("user_id") == LongType &&
      e("event_type") == StringType && e("value") == DoubleType &&
      e("props") == StringType, s"events drifted: $e")
    // tolerated generations: ns (LongType under nanosAsLong), µs-NTZ,
    // already-TIMESTAMP — exactly the dispatch in Tables.normalizeEventTs.
    // A NEW type here must grow the helper BEFORE this set.
    val tolerated: Set[DataType] = Set(LongType, TimestampNTZType, TimestampType)
    assert(tolerated.contains(e("ts")),
      s"events.ts is ${e("ts")} — a fixture generation " +
        "Tables.normalizeEventTs does not handle; extend the helper and " +
        "every streaming read site before updating this contract")
  }

  test("Tables.t yields one canonical events schema regardless of generation") {
    val ts = Tables.t(spark, sf, "events").schema("ts").dataType
    assert(ts == TimestampType, s"normalized events.ts is $ts, not TIMESTAMP")
  }

  test("normalizeEventTs handles each tolerated generation identically") {
    import org.apache.spark.sql.functions._
    // one fabricated row per generation; all should land on the same µs instant
    val micros = 1700000000123456L
    val fromNs = Tables.normalizeEventTs(
      spark.range(1).select(lit(micros * 1000).as("ts")))
    val fromNtz = Tables.normalizeEventTs(
      spark.range(1).select(
        timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts")))
    val fromTs = Tables.normalizeEventTs(
      spark.range(1).select(timestamp_micros(lit(micros)).as("ts")))
    for (df <- Seq(fromNs, fromNtz, fromTs)) {
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.select(unix_micros(col("ts"))).first().getLong(0) == micros)
    }
  }
}

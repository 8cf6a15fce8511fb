package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark DataFrame program plus (when SQL-expressible)
  * an equivalent ANSI-SQL oracle the driver runs in DuckDB over the same
  * parquet tables. Column names/aliases MUST match between the two.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

/** Fixture-table catalog: one parquet file per table under an sf dir.
  * See TESTDATA.md / FIXTURES.md.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session options every graft session needs. `nanosAsLong` lets Spark
    * read the events table's timestamp[ns] column (Spark has no ns
    * timestamp); Tables.t then truncates it to µs — the exact behavior of
    * the DuckDB oracle, which also reads TIMESTAMP_NS at µs precision.
    */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true")

  /** Read a fixture table. Parquet scan: column pruning + predicate
    * pushdown apply to anything selected/filtered downstream.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      // ns → µs truncation via integer division — `ts / 1000` in double
      // arithmetic would corrupt epoch-ns values (> 2^53).
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}

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
    * read a timestamp[ns] events column (Spark has no ns timestamp) in
    * fixture generations that ship one; Tables.t then truncates it to µs —
    * the exact behavior of the DuckDB oracle, which also reads
    * TIMESTAMP_NS at µs precision.
    */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true")

  /** Read a fixture table. Parquet scan: column pruning + predicate
    * pushdown apply to anything selected/filtered downstream.
    *
    * The events fixture has shipped `ts` as both timestamp[ns] (read as
    * LongType under `nanosAsLong`) and timestamp[us] (read natively as
    * TIMESTAMP_NTZ) across driver generations — normalize either to a
    * µs timestamp so every query sees one schema.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      // ns generation: ns → µs truncation via integer division —
      // `ts / 1000` in double arithmetic would corrupt epoch-ns values
      // (> 2^53).
      case LongType => df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      // µs generation: parquet timestamp[us] without tz reads as
      // TIMESTAMP_NTZ; cast to TIMESTAMP (value-identical under the UTC
      // session tz) so every query keeps the one schema it was built on.
      case TimestampNTZType => df.withColumn("ts",
        df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
    else df
  }
}

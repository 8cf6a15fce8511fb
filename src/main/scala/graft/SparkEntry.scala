package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnalyticQueries, BehaviorQueries, BreadthQueries, DepthQueries, ExperimentQueries, ExtensionQueries, FeatureQueries, GovernanceQueries, IngestQueries, MixtureQueries, NestedQueries, RelationalQueries, ScalarQueries, SeriesQueries, SinkQueries, SketchQueries, SpatialQueries, SqlQueries, StreamQueries, TemporalQueries, TextQueries, TpchQueries, TraversalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.queries.* as QueryDef(name, oracle, run) triples so
  * the Spark program and its DuckDB oracle stay side by side.
  */
object SparkEntry {

  private[graft] def registry: Seq[QueryDef] =
    RelationalQueries.defs ++ ScalarQueries.defs ++ NestedQueries.defs ++
      IngestQueries.defs ++ ExtensionQueries.defs ++ SqlQueries.defs ++
      TemporalQueries.defs ++ TextQueries.defs ++ AnalyticQueries.defs ++
      BehaviorQueries.defs ++ SinkQueries.defs ++ BreadthQueries.defs ++
      StreamQueries.defs ++ DepthQueries.defs ++ TpchQueries.defs ++
      TraversalQueries.defs ++ MixtureQueries.defs ++ GovernanceQueries.defs ++
      ExperimentQueries.defs ++ SeriesQueries.defs ++ FeatureQueries.defs ++
      SketchQueries.defs ++ SpatialQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke exactly: a PLAIN session (none of
  * Tables.sessionConfigs) calling SparkEntry.entry and requiring rows > 0.
  * Guards against entry() ever depending on graft-specific session config
  * (e.g. the nanosAsLong flag the events table needs).
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    require(n > 0, "driver smoke would fail: entry returned no rows")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dev probe: time a query N times and dump its formatted plan.
  * Usage: runMain graft.tools.Probe <sfDir> <queryName>...
  *   SPARK_GRAFT_MASTER overrides local[32] — `local-cluster[2,16,4096]`
  *   times the query through the real serialization/network-shuffle path
  *   (broadcast-size and task-serialization assumptions local[32]
  *   structurally cannot exercise);
  *   SPARK_GRAFT_PROBE_PASSES (default 2) and SPARK_GRAFT_EXEC_MEM
  *   (local-cluster executor memory, default 4g) tune the run. Prints
  *   per-pass walls and the min.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "2").toInt
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "4g"))
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      println(s"===== $name ($master) =====")
      if (!sys.env.contains("SPARK_GRAFT_PROBE_NOPLAN")) df.explain("formatted")
      val walls = (1 to passes).map { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$name run$i: $dt%.2f s")
        dt
      }
      println(f"$name min: ${walls.min}%.2f s")
    }
    spark.stop()
  }
}

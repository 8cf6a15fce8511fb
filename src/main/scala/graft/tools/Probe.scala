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
    // SPARK_GRAFT_PROBE_JOBS=1: print one line per Spark job (id, wall,
    // #tasks, description) — the empirical loop of guide §1.1 without the
    // UI (disabled here). Job rows attribute iterative operators' time to
    // rounds/actions; stage-level detail stays the UI's job.
    if (sys.env.get("SPARK_GRAFT_PROBE_JOBS").contains("1")) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          starts.put(j.jobId, (System.nanoTime(), desc,
            j.stageInfos.map(_.numTasks).sum))
        }
        override def onJobEnd(j: SparkListenerJobEnd): Unit = {
          Option(starts.remove(j.jobId)).foreach { case (t0, desc, nt) =>
            val dt = (System.nanoTime() - t0) / 1e9
            println(f"[job] id=${j.jobId}%-4d ${dt}%7.3f s tasks=$nt%-5d $desc")
          }
        }
      })
    }
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

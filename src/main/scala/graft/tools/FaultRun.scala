package graft.tools

import java.util.concurrent.atomic.AtomicBoolean

import scala.sys.process._

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Executor-loss fault injection under `local-cluster` (r15, verdict ask):
  * run a query once undisturbed, then again while SIGKILL-ing one of the
  * two executor JVMs right after its first stage completes — the job must
  * finish (stage retry recomputes the dead executor's shuffle output; the
  * standalone master relaunches the executor) and the result must
  * canonically equal the undisturbed run.
  *
  * What this exercises that local[32] structurally cannot: lost shuffle
  * blocks → FetchFailed → parent-stage resubmission; lost cached /
  * localCheckpoint blocks (lineage-truncated RDDs must either recover or
  * the query must not depend on a single replica); executor re-registration
  * mid-job. A hash mismatch would mean a retry-visible nondeterminism
  * (e.g. unstable row ordering feeding a limit) — the class of bug that
  * only shows up on a real cluster during an AZ blip.
  *
  * Canonicalization matches tools/check.py: columns sorted by name, rows
  * sorted, doubles to 9 significant digits (stage retries legitimately
  * reorder float partial sums; bit-equality would be asserting an order
  * the engine never promises).
  *
  * Usage: graft.tools.FaultRun <sfDir> <query> [query ...]
  *   SPARK_GRAFT_MASTER overrides the default local-cluster[2,16,4096].
  * Prints one line per query: FAULT-OK / FAULT-MISMATCH / FAULT-ERROR;
  * exit 0 only if all OK. Dev/validation tool — not part of the library.
  */
object FaultRun {

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER",
      "local-cluster[2,16,4096]")
    val b = SparkSession.builder()
      .master(master)
      .appName("graft-faultrun")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "3g"))
      // the point is to survive the kill: generous task/stage retry like a
      // production cluster (defaults: 4 task failures, 4 stage attempts)
      .config("spark.stage.maxConsecutiveAttempts", "8")
    graft.Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var allOk = true
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val undisturbed =
        try Right(canon(fn(spark, sfDir)))
        catch { case e: Throwable => Left(s"baseline failed: ${e.getMessage}") }
      undisturbed match {
        case Left(msg) =>
          println(s"FAULT-ERROR $name $msg"); allOk = false
        case Right((nA, hA)) =>
          val killed = new AtomicBoolean(false)
          val listener = new SparkListener {
            override def onStageCompleted(
                ev: SparkListenerStageCompleted): Unit =
              if (killed.compareAndSet(false, true)) {
                val pids = try {
                  Seq("pgrep", "-f",
                    "CoarseGrainedExecutorBackend").!!.trim
                    .split("\n").filter(_.nonEmpty)
                } catch { case _: Throwable => Array.empty[String] }
                pids.headOption.foreach { pid =>
                  Seq("kill", "-9", pid).!
                  System.err.println(
                    s"[fault] $name: killed executor JVM pid=$pid after " +
                      s"stage ${ev.stageInfo.stageId}")
                }
              }
          }
          spark.sparkContext.addSparkListener(listener)
          val disturbed =
            try Right(canon(fn(spark, sfDir)))
            catch { case e: Throwable =>
              Left(s"disturbed run failed: ${e.getMessage}") }
          spark.sparkContext.removeSparkListener(listener)
          // wait for the master to relaunch the executor before the next
          // query so each query starts from the same 2-executor state
          waitForExecutors(spark, 2)
          disturbed match {
            case Left(msg) =>
              println(s"FAULT-ERROR $name killed=${killed.get} $msg")
              allOk = false
            case Right((nB, hB)) if nA == nB && hA == hB =>
              println(s"FAULT-OK $name rows=$nA hash=$hA killed=${killed.get}")
            case Right((nB, hB)) =>
              println(s"FAULT-MISMATCH $name undisturbed=($nA,$hA) " +
                s"disturbed=($nB,$hB)")
              allOk = false
          }
      }
    }
    spark.stop()
    if (!allOk) sys.exit(1)
  }

  /** check.py-style canonical (rowCount, md5): columns sorted by name,
    * rows sorted, floats to 9 significant digits, -0.0 → 0.0.
    */
  private def canon(df: DataFrame): (Long, String) = {
    val order = df.columns.zipWithIndex.sortBy(_._1).map(_._2)
    val rows = df.collect().map { r =>
      order.map { i =>
        r.get(i) match {
          case null => "NULL"
          case d: Double => fmt(d)
          case f: Float => fmt(f.toDouble)
          case d: java.math.BigDecimal => fmt(d.doubleValue())
          case x => String.valueOf(x)
        }
      }.mkString("")
    }.sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(s => { md.update(s.getBytes("UTF-8")); md.update(10.toByte) })
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  private def fmt(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == 0.0) "0"
    else "%.9g".format(d)

  private def waitForExecutors(spark: SparkSession, want: Int): Unit = {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (System.nanoTime() < deadline &&
        spark.sparkContext.getExecutorMemoryStatus.size < want + 1) {
      Thread.sleep(500) // +1: the driver's block manager is in the map
    }
  }
}

package graft.tools

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import scala.sys.process._

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskStart}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Executor-loss fault injection under `local-cluster` (r15, widened r16):
  * run a query once undisturbed, then again while SIGKILL-ing executor
  * JVM(s), and assert the disturbed result canonically equals the
  * undisturbed one. Three kill schedules:
  *
  *   stage   (r15) one kill, right after the job's first stage COMPLETES —
  *           exercises lost shuffle blocks → FetchFailed → parent-stage
  *           resubmission and executor re-registration
  *   task    one kill, fired mid-stage after the Kth task START (default
  *           K=8) — the killed executor has tasks IN FLIGHT, exercising
  *           in-flight task loss + partial-stage retry, not just
  *           already-committed shuffle output
  *   double  two sequential kills: after the first stage completes, and
  *           again after a LATER stage completes once the standalone
  *           master has relaunched the first casualty (so the job always
  *           keeps ≥1 live executor) — exercises repeated loss within one
  *           job, the "rolling AZ blip"
  *
  * What this exercises that local[32] structurally cannot: lost shuffle
  * blocks, lost cached / localCheckpoint blocks (lineage-truncated RDDs
  * must either recover or the query must not depend on a single replica),
  * executor re-registration mid-job. A hash mismatch would mean a
  * retry-visible nondeterminism (e.g. unstable row ordering feeding a
  * limit) — the class of bug that only shows up on a real cluster.
  *
  * The kill targets only THIS app's executors: the pgrep pattern includes
  * the Spark application id (part of every CoarseGrainedExecutorBackend
  * command line), so a concurrently running unrelated Spark app is never
  * touched and `killed=true` always means OUR executor died.
  *
  * Canonicalization matches tools/check.py: columns sorted by name, rows
  * sorted, doubles to 9 significant digits in Locale.ROOT (stage retries
  * legitimately reorder float partial sums; bit-equality would be
  * asserting an order the engine never promises).
  *
  * Usage: graft.tools.FaultRun [--mode=stage|task|double] [--kill-at=K]
  *          <sfDir> <query>...
  *   SPARK_GRAFT_MASTER overrides the default local-cluster[2,16,4096].
  *   --kill-at=K (task mode) fires the kill at the Kth task START
  *   (default 8); queries whose jobs start fewer tasks need a smaller K.
  * Prints one line per query: FAULT-OK / FAULT-SKIP / FAULT-MISMATCH /
  * FAULT-ERROR; exit 0 only if all OK. FAULT-SKIP means the disturbed
  * run matched but FEWER kills landed than the mode promises (stage/task
  * 1, double 2) — it is NOT fault evidence and fails the run, so coverage
  * docs can never miscount an undisturbed pass as an injected-fault pass.
  * Dev/validation tool — not part of the library.
  */
object FaultRun {

  def main(args: Array[String]): Unit = {
    val usage = "usage: graft.tools.FaultRun [--mode=stage|task|double] " +
      "[--kill-at=K] <sfDir> <query>..."
    var mode = "stage"
    var killAt = 8
    val rest = args.dropWhile { a =>
      if (a.startsWith("--mode=")) { mode = a.stripPrefix("--mode="); true }
      else if (a.startsWith("--kill-at=")) {
        val v = a.stripPrefix("--kill-at=")
        require(v.nonEmpty && v.length <= 9 && v.forall(_.isDigit),
          s"--kill-at expects a positive integer, got '$v'\n$usage")
        killAt = v.toInt; true
      } else false
    }
    require(Seq("stage", "task", "double").contains(mode),
      s"unknown mode $mode\n$usage")
    require(killAt >= 1, s"--kill-at must be >= 1, got $killAt\n$usage")
    require(rest.nonEmpty, s"missing <sfDir> and query names\n$usage")
    val expectedKills = if (mode == "double") 2 else 1
    val sfDir = rest.head
    val names = rest.tail.toSeq
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
    val appId = spark.sparkContext.applicationId

    var allOk = true
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val undisturbed =
        try Right(canon(fn(spark, sfDir)))
        catch { case e: Throwable => Left(s"baseline failed: ${e.getMessage}") }
      undisturbed match {
        case Left(msg) =>
          println(s"FAULT-ERROR $name mode=$mode $msg"); allOk = false
        case Right((nA, hA)) =>
          val kills = new AtomicInteger(0)
          val listener = mkListener(spark, appId, name, mode, kills, killAt)
          spark.sparkContext.addSparkListener(listener)
          val disturbed =
            try Right(canon(fn(spark, sfDir)))
            catch { case e: Throwable =>
              Left(s"disturbed run failed: ${e.getMessage}") }
          spark.sparkContext.removeSparkListener(listener)
          // wait for the master to relaunch the executor(s) before the next
          // query so each query starts from the same 2-executor state
          waitForExecutors(spark, 2)
          disturbed match {
            case Left(msg) =>
              println(s"FAULT-ERROR $name mode=$mode kills=${kills.get} $msg")
              allOk = false
            case Right((nB, hB)) if nA == nB && hA == hB =>
              if (kills.get >= expectedKills)
                println(s"FAULT-OK $name mode=$mode rows=$nA hash=$hA " +
                  s"kills=${kills.get}")
              else {
                // matched, but no/too-few faults were injected — this run
                // proves nothing about fault tolerance and must not be
                // counted as evidence (e.g. a job with < killAt task starts)
                println(s"FAULT-SKIP $name mode=$mode rows=$nA " +
                  s"kills=${kills.get} expected=$expectedKills " +
                  "(fault not delivered; not fault evidence)")
                allOk = false
              }
            case Right((nB, hB)) =>
              println(s"FAULT-MISMATCH $name mode=$mode " +
                s"undisturbed=($nA,$hA) disturbed=($nB,$hB)")
              allOk = false
          }
      }
    }
    spark.stop()
    if (!allOk) sys.exit(1)
  }

  /** SIGKILL one executor JVM OF THIS APP (appId-scoped pgrep). Returns
    * true iff a kill was delivered.
    */
  private def killOne(appId: String, name: String, where: String): Boolean = {
    val pids = try {
      Seq("pgrep", "-f",
        s"CoarseGrainedExecutorBackend.*$appId").!!.trim
        .split("\n").filter(_.nonEmpty)
    } catch { case _: Throwable => Array.empty[String] }
    pids.headOption.exists { pid =>
      Seq("kill", "-9", pid).!
      System.err.println(s"[fault] $name: killed executor JVM pid=$pid $where")
      true
    }
  }

  private def mkListener(spark: SparkSession, appId: String, name: String,
      mode: String, kills: AtomicInteger, killAt: Int): SparkListener =
    mode match {
    case "stage" => new SparkListener {
      val fired = new AtomicBoolean(false)
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        if (fired.compareAndSet(false, true) &&
            killOne(appId, name, s"after stage ${ev.stageInfo.stageId}"))
          kills.incrementAndGet()
    }
    case "task" => new SparkListener {
      val starts = new AtomicInteger(0)
      val fired = new AtomicBoolean(false)
      override def onTaskStart(ev: SparkListenerTaskStart): Unit =
        // fire WHILE the stage is running: the Kth task start means ≥1
        // task is in flight on each executor of a 2-exec cluster
        if (starts.incrementAndGet() == killAt &&
            fired.compareAndSet(false, true) &&
            killOne(appId, name,
              s"mid-stage ${ev.stageId} (task start #$killAt)"))
          kills.incrementAndGet()
    }
    case "double" => new SparkListener {
      // block-manager entries present BEFORE kill 1: the killed executor's
      // entry can linger until the driver processes the loss, so a raw
      // size check could fire kill 2 at the ONLY live executor. Kill 2
      // waits for a NEW entry (the relaunch), which guarantees a survivor.
      @volatile var beforeKill1: Set[String] = Set.empty
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        kills.get() match {
          case 0 =>
            beforeKill1 =
              spark.sparkContext.getExecutorMemoryStatus.keySet.toSet
            if (killOne(appId, name, s"after stage ${ev.stageInfo.stageId} (kill 1/2)"))
              kills.incrementAndGet()
          case 1 =>
            val nowIds = spark.sparkContext.getExecutorMemoryStatus.keySet
            if (nowIds.exists(id => !beforeKill1.contains(id)) &&
                killOne(appId, name, s"after stage ${ev.stageInfo.stageId} (kill 2/2)"))
              kills.incrementAndGet()
          case _ => ()
        }
    }
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
      }.mkString("")
    }.sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(s => { md.update(s.getBytes("UTF-8")); md.update(10.toByte) })
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  private def fmt(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d == 0.0) "0"
    // Locale.ROOT: check.py's canonical uses '.' decimals; the JVM default
    // locale must not leak into the hash (comma-decimal locales diverge)
    else String.format(java.util.Locale.ROOT, "%.9g", Double.box(d))

  private def waitForExecutors(spark: SparkSession, want: Int): Unit = {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (System.nanoTime() < deadline &&
        spark.sparkContext.getExecutorMemoryStatus.size < want + 1) {
      Thread.sleep(500) // +1: the driver's block manager is in the map
    }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev probe for [[graft.sim.SemDedup]]'s scale lever: the in-cell
  * pairwise stage is Σ|cell|² ≈ n²/numCells on near-uniform cells, so
  * numCells must grow with the corpus (the paper runs ~50k cells at web
  * scale). This prints drops + wall for a few cell counts on a fixture —
  * the measured version of that sentence.
  *
  * Usage: graft.tools.SemProbe <sfDir> [cells ...]
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cellCounts =
      if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(8, 64, 141)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .appName("graft-semprobe")
      .getOrCreate()
    graft.Tables.sessionConfigs.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.t(spark, sfDir, "embeddings")
    for (cells <- cellCounts) {
      val t0 = System.nanoTime()
      val drops = graft.sim.SemDedup
        .semanticDedup(e, "vec_id", "embedding", cells, 0.3)
        .filter(!col("keep")).count()
      println(f"[semprobe] cells=$cells%5d drops=$drops%7d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Scratch diagnostic for the exact-Jaccard physical strategies: corpus
  * shape stats (docs, vocab, distinct word-sets, set-size histogram) plus
  * cold/warm wall times of the two paths the maxSets guard chooses
  * between — the banded popcount join and the set-level inverted-index
  * fallback. Usage: runMain graft.tools.BitmaskDebug <sfDir> [threshold]
  */
object BitmaskDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val threshold = if (args.length > 1) args(1).toDouble else 0.9
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.t(spark, sfDir, "documents")
    val w = Dedup.wordSets(docs, "doc_id", "text")
      .select(col("doc_id"), explode_outer(col("words")).as("word"))
      .filter(col("word").isNotNull)
      .localCheckpoint()
    println("docs:  " + w.select("doc_id").distinct().count())
    println("vocab: " + w.select("word").distinct().count())
    val sets = w.groupBy("doc_id").agg(sort_array(collect_set("word")).as("ws"))
      .groupBy("ws").agg(count(lit(1)).as("docs_per_set"))
    println("distinct sets: " + sets.count())
    sets.groupBy(size(col("ws")).as("set_size"))
      .agg(count(lit(1)).as("n_sets"))
      .orderBy("set_size").show(64, false)
    def run(label: String, maxSets: Long): Unit =
      (1 to 2).foreach { i =>
        t(s"$label run$i")(Dedup.jaccardPairs(docs, "doc_id", "text",
            threshold, strategy = Dedup.JaccardBitmask,
            bitmaskMaxSets = maxSets)
          .write.format("noop").mode("overwrite").save())
      }
    run("banded popcount (cap 10^9)", 1000000000L)
    run("set-level inverted (cap 1)", 1L)
    spark.stop()
  }
}

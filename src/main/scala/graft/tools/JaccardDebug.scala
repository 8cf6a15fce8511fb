package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Scratch diagnostic for the jaccard candidate volumes. */
object JaccardDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.t(spark, sfDir, "documents")
    val w = Dedup.wordSets(docs, "doc_id", "text")
      .select(col("doc_id"), explode_outer(col("words")).as("word"))
      .filter(col("word").isNotNull)
      .localCheckpoint()
    println(s"feature rows: ${w.count()}")
    println(s"docs: ${w.select("doc_id").distinct().count()}")
    val dfT = w.groupBy("word").agg(count(lit(1)).as("__df")).localCheckpoint()
    println(s"vocab: ${dfT.count()}")
    dfT.orderBy(col("__df").desc).show(10, false)
    println("df quantiles: " + dfT.stat.approxQuantile("__df",
      Array(0.5, 0.9, 0.99, 1.0), 0.001).mkString(", "))
    val sizes = w.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("__df"), col("word"))
    val t0 = System.nanoTime()
    val prefix = w.join(dfT, Seq("word"))
      .join(sizes, Seq("doc_id"))
      .withColumn("__rk", row_number().over(byRarity))
      .filter(col("__rk") <= col("n") - ceil(col("n") * 0.9) + 1)
      .select("doc_id", "word")
      .localCheckpoint()
    println(f"prefix rows: ${prefix.count()} (${(System.nanoTime()-t0)/1e9}%.1f s)")
    val pdf = prefix.groupBy("word").agg(count(lit(1)).as("pdf"))
    pdf.orderBy(col("pdf").desc).show(10, false)
    println("prefix join rows (sum pdf^2): " +
      pdf.agg(sum(col("pdf") * col("pdf"))).first().getLong(0))
    val t1 = System.nanoTime()
    val cand = prefix.select(col("doc_id").as("doc_a"), col("word"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("word")), Seq("word"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    println(f"candidates: ${cand.count()} (${(System.nanoTime()-t1)/1e9}%.1f s)")
    spark.stop()
  }
}

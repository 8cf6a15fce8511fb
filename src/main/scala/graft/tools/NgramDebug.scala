package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables, dedup}
import graft.dedup.Dedup

/** Throwaway timing breakdown for the char-ngram jaccard pipeline. */
object NgramDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    val docs = Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 300)
      .repartition(spark.sparkContext.defaultParallelism)
    val feat = Dedup.charNgramSets(docs, "doc_id", "text", 3)
      .select(col("doc_id"), explode_outer(col("grams")).as("word"))
      .filter(col("word").isNotNull)
    t("docs count")(docs.count())
    val norm = docs.withColumn("__t",
      lower(trim(regexp_replace(col("text"), "\\s+", " "))))
      .select("doc_id", "__t")
    t("norm count")(norm.count())
    val grams0 = norm.select(col("doc_id"), transform(
      sequence(lit(1), greatest(length(col("__t")) - 2, lit(1))),
      i => col("__t").substr(i, lit(3))).as("g"))
    t("grams-no-distinct")(grams0.count())
    t("grams-distinct")(grams0.select(array_distinct(col("g"))).count())
    t("grams-explode")(grams0.select(explode(col("g"))).count())
    t("feat count")(feat.count())
    t("feat count again")(feat.count())
    println(feat.queryExecution.executedPlan.toString.take(3000))
    val wc = t("localCheckpoint")(feat.localCheckpoint())
    t("sample distinct")(feat.limit(65536).select("word").distinct().count())
    t("exact distinct")(feat.agg(countDistinct(col("word")),
      countDistinct(col("doc_id"))).first())
    t("vocab collect")(wc.select("word").distinct().orderBy("word").count())
    t("full pairs")(Dedup.jaccardPairsFeatures(feat, 0.8,
      Dedup.JaccardBitmask).count())
    t("full pairs again")(Dedup.jaccardPairsFeatures(feat, 0.8,
      Dedup.JaccardBitmask).count())
    spark.stop()
  }
}

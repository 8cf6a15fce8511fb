package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Scratch diagnostic: per-phase wall times of the bitmask jaccard path. */
object BitmaskDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.t(spark, sfDir, "documents")
    val w = t("wordSets explode+ckpt") {
      Dedup.wordSets(docs, "doc_id", "text")
        .select(col("doc_id"), explode_outer(col("words")).as("word"))
        .filter(col("word").isNotNull)
        .localCheckpoint()
    }
    t("w.count")(println("  rows: " + w.count()))
    val bitOf = t("vocab collect") {
      w.select("word").distinct().orderBy("word")
        .collect().map(_.getString(0)).zipWithIndex.toMap
    }
    println("  vocab: " + bitOf.size)
    val nWords = math.max(1, (bitOf.size + 63) / 64)
    val withBit = w.withColumn("bit", element_at(typedlit(bitOf), col("word")))
    val docMasks = t("docMasks build+ckpt") {
      withBit
        .withColumn("wi", (col("bit") / 64).cast("int"))
        .groupBy("doc_id", "wi")
        .agg(bit_or(expr("shiftleft(1L, bit % 64)")).as("m"))
        .groupBy("doc_id")
        .agg(map_from_entries(collect_list(struct(col("wi"), col("m"))))
          .as("mm"))
        .select(col("doc_id"),
          transform(sequence(lit(0), lit(nWords - 1)),
            i => coalesce(element_at(col("mm"), i), lit(0L))).as("mask"))
        .localCheckpoint()
    }
    val sets = t("sets dedup+ckpt") {
      docMasks.groupBy("mask").agg(min("doc_id").as("set_id")).localCheckpoint()
    }
    t("sets.count")(println("  sets: " + sets.count()))
    val pc = (m: org.apache.spark.sql.Column) =>
      aggregate(transform(m, x => bit_count(x)), lit(0), (acc, v) => acc + v)
    val a = sets.select(col("set_id").as("sa"), col("mask").as("ma"),
      pc(col("mask")).as("pa"))
    val bK = sets.select(col("set_id").as("sb"), col("mask").as("mb"),
      pc(col("mask")).as("pb"))
      .withColumn("ps", explode(sequence(
        ceil(col("pb") * 0.9 - 1e-9).cast("int"),
        floor(col("pb") / 0.9 + 1e-9).cast("int"))))
    val setPairs = a.join(broadcast(bK),
      col("pa") === col("ps") && col("sa") < col("sb"))
    t("banded pair count")(println("  pairs: " + setPairs.count()))
    val inter = (1 to nWords).map(i => bit_count(
      element_at(col("ma"), i).bitwiseAND(element_at(col("mb"), i))))
      .reduce(_ + _)
    val qual = setPairs.withColumn("inter", inter)
      .withColumn("jaccard",
        col("inter").cast("double") / (col("pa") + col("pb") - col("inter")))
      .filter(col("jaccard") >= 0.9)
    t("qual count")(println("  qual: " + qual.count()))
    val dMax = floor((lit(1.0) - 0.9) / (1.0 + 0.9)
      * (col("ps") + col("pb")) + 1e-9).cast("int")
    val pb0 = bit_count(element_at(col("mb"), 1)).cast("int")
    val bK2 = bK.withColumn("p0s", explode(sequence(
      greatest(pb0 - dMax, lit(0)), pb0 + dMax)))
    val aK = a.withColumn("pa0",
      bit_count(element_at(col("ma"), 1)).cast("int"))
    val setPairs2 = aK.join(broadcast(bK2),
      col("pa") === col("ps") && col("pa0") === col("p0s")
        && col("sa") < col("sb"))
    t("pigeonhole pair count")(println("  pairs2: " + setPairs2.count()))
    t("full jaccardPairs") {
      Dedup.jaccardPairs(docs, "doc_id", "text", 0.9,
          strategy = Dedup.JaccardBitmask, bitmaskMaxSets = 100000L)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order's reason to exist, measured: with a single-column sort, a
  * filter on the OTHER column touches every file; with the Morton layout
  * both dimensions keep locality, so narrow filters on either column
  * touch only a fraction of the partitions (= files at write time).
  */
class LayoutSpec extends SparkSpec {

  test("z-order layout prunes on BOTH dimensions; single-column sort only on one") {
    // Like Delta's OPTIMIZE ZORDER, dimensions are quantized to equal-
    // width ranks before interleaving — raw values with different bit
    // widths would let one dimension own all the high interleaved bits.
    val parts = 16
    val raw = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), floor(col("value")).cast("long").as("vb"))
    val Array(uMin, uMax, vMin, vMax) = raw
      .agg(min("user_id"), max("user_id"), min("vb"), max("vb"))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    def rank(c: Column, lo: Long, hi: Long): Column =
      ((c - lo) * 255 / (hi - lo + 1)).cast("long")
    val base = raw.withColumn("z", Layout.zIndex(
      rank(col("user_id"), uMin, uMax), rank(col("vb"), vMin, vMax), bits = 8))
    // pruning metric = what parquet min/max skipping sees: how many
    // partitions' [min,max] interval of a column INTERSECTS a 5%-wide
    // mid-range filter (partitions whose stats overlap must be read)
    def overlaps(layout: DataFrame, c: String, lo: Long, hi: Long): Long = {
      val f1 = lo + (hi - lo) * 45 / 100
      val f2 = lo + (hi - lo) * 50 / 100
      layout.withColumn("__pid", spark_partition_id())
        .groupBy("__pid").agg(min(c).as("mn"), max(c).as("mx"))
        .filter(col("mn") <= f2 && col("mx") >= f1).count()
    }
    val zLayout = base.repartitionByRange(parts, col("z")).localCheckpoint()
    val uLayout = base.repartitionByRange(parts, col("user_id")).localCheckpoint()
    val zHits = overlaps(zLayout, "user_id", uMin, uMax) +
      overlaps(zLayout, "vb", vMin, vMax)
    val uHits = overlaps(uLayout, "user_id", uMin, uMax) +
      overlaps(uLayout, "vb", vMin, vMax)
    // user-sorted: every partition's vb stats span the full range → the
    // vb filter can skip nothing (16 + ~1); z-order: both dimensions keep
    // locality, so the total scanned-partition count drops
    assert(zHits < uHits, s"z=$zHits vs single-dim=$uHits")
    assert(overlaps(zLayout, "vb", vMin, vMax) < parts,
      "z layout gave vb no min/max locality")
  }

  test("zIndex interleaves bits exactly (known values)") {
    import spark.implicits._
    // x=0b1010 (even positions), y=0b0110 (odd positions)
    // z = sum_i x_i·4^i·1 + y_i·4^i·2 = interleave(1010, 0110) = 0b01101100
    val got = Seq((10L, 6L)).toDF("x", "y")
      .select(Layout.zIndex(col("x"), col("y")).as("z"))
      .collect()(0).getLong(0)
    assert(got == 0x6CL, s"got $got")
  }
}

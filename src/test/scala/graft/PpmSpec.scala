package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.multimodal.Binary

/** The PPM decoder against hand-built byte arrays with KNOWN pixels — the
  * oracle gate proves formula parity on generated images; this proves the
  * parser on images it did not generate (multi-digit dims, non-255 maxval,
  * truncated payload).
  */
class PpmSpec extends SparkSpec {

  private def ppmBytes(w: Int, h: Int, maxval: Int,
      pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == 3 * w * h)
    s"P6\n$w $h\n$maxval\n".getBytes("UTF-8") ++ pixels.map(_.toByte)
  }

  private def decode(rows: Seq[Array[Byte]]) = {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.zipWithIndex.map {
        case (b, i) => Row(i.toLong, b) }: _*),
      StructType(Seq(StructField("id", LongType), StructField("ppm", BinaryType))))
    Binary.decodePpm(df, "ppm")
      .select("id", "width", "height", "maxval", "pixels")
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), r.getInt(2), r.getInt(3),
          if (r.isNullAt(4)) null else r.getSeq[Integer](4).toList)))
      .toMap
  }

  test("decodePpm parses dims, maxval and every pixel byte exactly") {
    val px2x2 = Array(0, 1, 2, 255, 254, 253, 16, 32, 64, 128, 200, 9)
    val px10x1 = (0 until 30).map(i => (i * 11) % 256).toArray
    val out = decode(Seq(
      ppmBytes(2, 2, 255, px2x2),
      ppmBytes(10, 1, 99, px10x1))) // multi-digit width, non-255 maxval
    assert(out(0L) == ((2, 2, 255, px2x2.toList)))
    assert(out(1L) == ((10, 1, 99, px10x1.toList)))
  }

  test("decodePpm on a truncated payload yields null trailing pixels, no crash") {
    val full = ppmBytes(2, 2, 255, Array.fill(12)(7))
    val out = decode(Seq(full.dropRight(3)))
    val (w, h, m, px) = out(0L)
    assert((w, h, m) == ((2, 2, 255)))
    assert(px.take(9).forall(_ == 7) && px.drop(9).forall(_ == null))
  }

  test("decodePpm refuses 2-byte-sample images (maxval > 255) loudly") {
    // legal P6, maxval 65535 → 2 bytes per sample; the 1-byte extractor
    // must yield NULL pixels, never silently mis-decode every pixel
    val out = decode(Seq(ppmBytes(2, 1, 65535, Array.fill(6)(7))))
    val (w, h, m, px) = out(0L)
    assert((w, h, m) == ((2, 1, 65535)))
    assert(px == null, s"expected NULL pixels for maxval>255, got $px")
  }

  test("pngFromSeed → decodeImage recovers the exact formula pixels through a real codec") {
    val src = spark.range(5).toDF("doc_id")
    val dec = Binary.decodeImage(
      Binary.pngFromSeed(src, "doc_id", width = 3, height = 2), "png")
      .select("doc_id", "width", "height", "pixels").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getSeq[Int](3))))
      .toMap
    dec.foreach { case (seed, (w, h, px)) =>
      assert((w, h) == ((3, 2)))
      assert(px.length == 18)
      px.zipWithIndex.foreach { case (v, j) =>
        assert(v == ((seed * 31 + j * 7) % 256).toInt, s"seed=$seed j=$j")
      }
    }
  }

  test("jpegFromSeed → decodeImage: exact dims, channel means and pixel MAE within the lossy bounds") {
    val src = spark.range(64).toDF("doc_id")
    val dec = Binary.decodeImage(
      Binary.jpegFromSeed(src, "doc_id", width = 8, height = 8), "jpeg")
      .select("doc_id", "width", "height", "pixels").collect()
    assert(dec.length == 64)
    dec.foreach { r =>
      val seed = r.getLong(0)
      assert((r.getInt(1), r.getInt(2)) == ((8, 8)), s"seed=$seed dims")
      val px = r.getSeq[Int](3)
      assert(px.length == 192)
      // empirical bounds at default JDK JPEG quality (measured over 500
      // seeds: channel-mean err ≤ 5.375, pixel MAE ≤ 19.45); q_jpeg_decode
      // gates with 2× margin (12 / 40) — this spec pins the raw bounds so
      // an encoder-quality regression surfaces here first
      (0 until 3).foreach { c =>
        val decMean = (0 until 64).map(i => px(3 * i + c)).sum / 64.0
        val srcMean =
          (0 until 64).map(i => (seed * 31 + (3 * i + c) * 7) % 256).sum / 64.0
        assert(math.abs(decMean - srcMean) <= 6.0,
          s"seed=$seed c=$c decMean=$decMean srcMean=$srcMean")
      }
      val mae = (0 until 192)
        .map(j => math.abs(px(j) - (seed * 31 + j * 7) % 256)).sum / 192.0
      assert(mae <= 20.0, s"seed=$seed mae=$mae")
    }
  }

  test("decodeImage quarantines undecodable bytes as NULLs instead of failing") {
    val rows = Seq(Row(0L, Array[Byte](1, 2, 3, 4)), Row(1L, Array.empty[Byte]))
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("id", LongType), StructField("b", BinaryType))))
    val out = Binary.decodeImage(df, "b")
      .select("id", "width", "pixels").collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.isNullAt(1) && r.isNullAt(2), r.toString)
    }
  }

  test("ppmFromSeed → decodePpm round-trips the generator formula") {
    val src = spark.range(5).toDF("doc_id")
    val dec = Binary.decodePpm(
      Binary.ppmFromSeed(src, "doc_id", width = 3, height = 2), "ppm")
      .select("doc_id", "pixels").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    dec.foreach { case (seed, px) =>
      assert(px.length == 18)
      px.zipWithIndex.foreach { case (v, j) =>
        assert(v == ((seed * 31 + j * 7) % 256).toInt, s"seed=$seed j=$j")
      }
    }
  }

  test("avgPool2 pools each 2x2 block into exact channel sums") {
    // 4×2 image with hand-picked channel values: two 2×2 blocks
    // left block Rs: 10,20,30,40  Gs: 1,2,3,4  Bs: 5,6,7,8
    // right block Rs: 100,110,120,130  Gs: 9,10,11,12  Bs: 13,14,15,16
    val px = Array(
      10, 1, 5, /**/ 20, 2, 6, /**/ 100, 9, 13, /**/ 110, 10, 14, // row 0
      30, 3, 7, /**/ 40, 4, 8, /**/ 120, 11, 15, /**/ 130, 12, 16) // row 1
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(0L, ppmBytes(4, 2, 255, px))),
      StructType(Seq(StructField("id", LongType), StructField("ppm", BinaryType))))
    val pooled = Binary.avgPool2(Binary.decodePpm(df, "ppm"))
      .select("px", "py", "r4", "g4", "b4", "r_avg").collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(pooled.size == 2)
    assert(pooled((0, 0)) == ((100L, 10L, 26L, 25.0)))
    assert(pooled((1, 0)) == ((460L, 42L, 58L, 115.0)))
  }

  test("wavFrames: per-frame RMS and crossings on hand-built samples") {
    // 4 samples → 2 frames of 2: frame 0 = (3, -4), frame 1 = (0, 5)
    import org.apache.spark.sql.functions._
    val df = spark.range(1).toDF("id")
      .withColumn("n_samples", lit(4))
      .withColumn("samples", array(lit(3), lit(-4), lit(0), lit(5)))
    val out = Binary.wavFrames(df, frameLen = 2)
      .select("frame", "rms", "zero_crossings").collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(out.size == 2)
    // both frames: sqrt((9+16)/2) = sqrt((0+25)/2) = 3.5355 at 4 dp;
    // frame 0 has the one sign flip (3 → -4), frame 1 none (0·5 = 0)
    assert(out(0) == ((3.5355, 1)), s"frame0=${out(0)}")
    assert(out(1) == ((3.5355, 0)), s"frame1=${out(1)}")
  }
}

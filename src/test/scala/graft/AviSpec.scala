package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Binary

/** MJPEG-in-AVI container round-trip: the RIFF walk (sizes, even-byte
  * padding, LIST nesting) against the generator, plus corrupt-payload
  * quarantine. Pixel tolerance is covered by the gated q_video_frames;
  * these pin the CONTAINER mechanics.
  */
class AviSpec extends SparkSpec {

  private def docs(n: Int) = spark.range(n).select(col("id").as("doc_id"))

  test("decodeAviFrames recovers exactly nFrames per payload with exact dims") {
    val avi = Binary.aviFromSeed(docs(40), "doc_id", 8, 8, nFrames = 3)
    val dec = Binary.decodeAviFrames(avi, "avi")
    val perDoc = dec.groupBy("doc_id").agg(
      count(lit(1)).as("n"),
      min("frame_idx").as("f0"), max("frame_idx").as("f1"),
      min("width").as("w"), max("height").as("h"))
    assert(perDoc.filter(col("n") =!= 3 || col("f0") =!= 0 ||
      col("f1") =!= 2 || col("w") =!= 8 || col("h") =!= 8).isEmpty,
      "some payload decoded to the wrong frame set")
    // the RIFF even-byte padding rule is only exercised if some JPEG
    // frame payload is odd-sized: walk the RIFF structure (as
    // decodeAviFrames does) to enumerate movi-level '00dc' chunk sizes,
    // so a future generator change that quietly rounds every frame to
    // even bytes fails here instead of silently untesting the padding
    // walk. A structural walk, NOT a raw byte scan: the 4-byte sequence
    // '00dc' can legitimately occur inside JPEG entropy-coded data (or
    // in an idx1 index, whose entries embed '00dc' fourccs), so a scan
    // over-counts nondeterministically
    val payloads = avi.select("avi").collect().map(_.getAs[Array[Byte]](0))
    def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    def fourcc(b: Array[Byte], i: Int): String =
      new String(b.slice(i, i + 4), "US-ASCII")
    def moviDcSizes(b: Array[Byte]): Seq[Int] = {
      def walk(start: Int, end: Int, inMovi: Boolean): Seq[Int] = {
        val out = Seq.newBuilder[Int]
        var i = start
        while (i + 8 <= end) {
          val id = fourcc(b, i)
          val sz = le32(b, i + 4)
          if (id == "LIST" && i + 12 <= end)
            out ++= walk(i + 12, math.min(i + 8 + sz, end),
              fourcc(b, i + 8) == "movi")
          else if (inMovi && id == "00dc") out += sz
          i += 8 + sz + (sz & 1) // even-byte chunk padding
        }
        out.result()
      }
      if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
        Seq.empty
      else walk(12, math.min(8 + le32(b, 4), b.length), inMovi = false)
    }
    val sizes = payloads.toSeq.flatMap(moviDcSizes)
    assert(sizes.size == 120, s"expected 120 '00dc' chunks, saw ${sizes.size}")
    assert(sizes.exists(_ % 2 == 1),
      "no odd-sized JPEG frame generated: the padding rule is untested")
  }

  test("frames differ: per-frame seeds produce distinct pixel content") {
    val dec = Binary.decodeAviFrames(
      Binary.aviFromSeed(docs(5), "doc_id", 8, 8, nFrames = 3), "avi")
    val sums = dec.select(col("doc_id"), col("frame_idx"),
        aggregate(col("pixels"), lit(0L), (a, x) => a + x).as("s"))
      .groupBy("doc_id").agg(countDistinct("s").as("d"))
    assert(sums.filter(col("d") < 2).isEmpty,
      "all frames of a doc decoded to identical content")
  }

  test("corrupt payloads quarantine to zero frames, never abort") {
    val truncated = Binary.aviFromSeed(docs(4), "doc_id", 8, 8, 2)
      .withColumn("avi", expr("substring(avi, 1, 40)"))
    assert(Binary.decodeAviFrames(truncated, "avi").count() == 0)
    val garbage = docs(4).withColumn("avi",
      encode(lit("not a riff container at all"), "UTF-8"))
    assert(Binary.decodeAviFrames(garbage, "avi").count() == 0)
    val nullPayload = docs(4).withColumn("avi",
      lit(null).cast("binary"))
    assert(Binary.decodeAviFrames(nullPayload, "avi").count() == 0)
  }

  test("a non-movi LIST with dc-suffixed chunk ids contributes no frames") {
    // the walk must key on the movi list, not on chunk-id suffix alone:
    // hand-build a RIFF whose hdrl-level chunk is named '00dc' but sits
    // outside movi — it must be skipped; the movi frame still decodes
    val one = Binary.aviFromSeed(docs(1), "doc_id", 8, 8, 1)
      .select("avi").head.getAs[Array[Byte]](0)
    // splice a fake top-level '00dc' chunk right after 'AVI ' (12 bytes in)
    val fake = "00dc".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4)
    val spliced = one.take(12) ++ fake ++ one.drop(12)
    // patch the RIFF size (offset 4, LE) to cover the splice
    val newSize = (one.length - 8) + fake.length
    spliced(4) = (newSize & 0xff).toByte
    spliced(5) = ((newSize >> 8) & 0xff).toByte
    spliced(6) = ((newSize >> 16) & 0xff).toByte
    spliced(7) = ((newSize >> 24) & 0xff).toByte
    val df = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L, spliced)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("avi",
          org.apache.spark.sql.types.BinaryType))))
    val dec = Binary.decodeAviFrames(df, "avi")
    assert(dec.count() == 1, "fake top-level 00dc leaked in or movi lost")
    assert(dec.head.getAs[Int]("width") == 8)
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.multimodal.Binary

/** The WAV decoder against hand-built byte arrays with KNOWN samples — the
  * oracle gate proves formula parity on generated audio; this proves the
  * parser on bytes it did not generate (negative samples, truncation,
  * wrong magic, non-PCM format).
  */
class WavSpec extends SparkSpec {

  private def le(v: Long, n: Int): Array[Byte] =
    (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private def wavBytes(samples: Seq[Int], rate: Int = 8000,
      fmt: Int = 1, bits: Int = 16): Array[Byte] = {
    val data = samples.flatMap(s => le(s & 0xffff, 2)).toArray
    "RIFF".getBytes("US-ASCII") ++ le(36L + data.length, 4) ++
      "WAVEfmt ".getBytes("US-ASCII") ++ le(16, 4) ++
      le(fmt, 2) ++ le(1, 2) ++ le(rate, 4) ++ le(rate * 2L, 4) ++
      le(2, 2) ++ le(bits, 2) ++
      "data".getBytes("US-ASCII") ++ le(data.length, 4) ++ data
  }

  private def decode(rows: Seq[Array[Byte]]) = {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.zipWithIndex.map {
        case (b, i) => Row(i.toLong, b) }: _*),
      StructType(Seq(StructField("id", LongType), StructField("wav", BinaryType))))
    Binary.decodeWav(df, "wav")
      .select("id", "sample_rate", "n_samples", "samples")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("decodeWav parses rate, count and signed samples exactly") {
    val samples = Seq(0, 1, -1, 32767, -32768, 12345, -12345)
    val out = decode(Seq(wavBytes(samples, rate = 44100)))(0L)
    assert(out.getInt(1) == 44100)
    assert(out.getInt(2) == samples.length)
    assert(out.getSeq[Int](3).toList == samples.toList)
  }

  test("decodeWav rejects non-PCM / non-16-bit / wrong-magic bytes with NULLs") {
    val out = decode(Seq(
      wavBytes(Seq(1, 2), fmt = 3),    // IEEE-float format
      wavBytes(Seq(1, 2), bits = 8),   // 8-bit samples
      "JUNKJUNKJUNKJUNKJUNKJUNKJUNKJUNKJUNKJUNKJUNK".getBytes("US-ASCII")))
    (0L to 2L).foreach { id =>
      assert(out(id).isNullAt(1) && out(id).isNullAt(3), s"row $id decoded")
    }
  }

  test("truncated sample data yields NULL trailing samples, no crash") {
    val full = wavBytes(Seq(7, 8, 9))
    // drop one full sample AND one half sample: a sample missing its high
    // byte cannot decode and must be NULL too, not a garbage low byte
    val out = decode(Seq(full.dropRight(2), full.dropRight(3)))
    assert(out(0L).getSeq[Integer](3).toList == List(7, 8, null))
    assert(out(1L).getSeq[Integer](3).toList == List(7, null, null))
  }

  test("wavFromSeed → decodeWav round-trips the generator formula") {
    val dec = Binary.decodeWav(
      Binary.wavFromSeed(spark.range(5).toDF("doc_id"), "doc_id", 16), "wav")
      .select("doc_id", "samples").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    dec.foreach { case (seed, s) =>
      assert(s.length == 16)
      s.zipWithIndex.foreach { case (v, j) =>
        val u = (seed * 13 + j * 11) % 65536
        val expect = if (u >= 32768) u - 65536 else u
        assert(v == expect, s"seed=$seed j=$j")
      }
    }
  }

  test("q_audio_spectrum matches a scalar DFT and satisfies Parseval") {
    val rows = q("q_audio_spectrum").collect()
    def sample(seed: Long, j: Int): Double = {
      val u = (seed * 13 + j * 11) % 65536
      (if (u >= 32768) u - 65536 else u).toDouble
    }
    // independent scalar DFT with the SAME shared twiddle tables
    def power(seed: Long, frame: Int, bin: Int): Double = {
      val re = (0 until 16).map(n =>
        sample(seed, frame * 16 + n) * Binary.dftCosTab((bin * n) % 16)).sum
      val im = (0 until 16).map(n =>
        -sample(seed, frame * 16 + n) * Binary.dftSinTab((bin * n) % 16)).sum
      re * re + im * im
    }
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (d, f, b) = (r.getAs[Long]("doc_id"), r.getAs[Int]("frame"),
        r.getAs[Int]("bin"))
      val expectDb = 10.0 * math.log10(power(d, f, b) + 1)
      assert(math.abs(r.getAs[Double]("power_db") - expectDb) < 2e-3,
        s"doc $d frame $f bin $b: ${r.getAs[Double]("power_db")} vs $expectDb")
    }
    // Parseval over the half-spectrum: X0² + X8² + 2·Σ₁..₇ = 16·Σx²
    val byFrame = rows.groupBy(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Int]("frame")))
    for (((d, f), _) <- byFrame.take(20)) {
      val p = (0 to 8).map(b => power(d, f, b))
      val lhs = p(0) + p(8) + 2 * (1 to 7).map(p).sum
      val rhs = 16 * (0 until 16).map(n =>
        math.pow(sample(d, f * 16 + n), 2)).sum
      assert(math.abs(lhs - rhs) / rhs < 1e-9,
        s"Parseval broken at doc $d frame $f: $lhs vs $rhs")
    }
  }
}

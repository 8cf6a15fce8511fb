package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. REAL decoders: P6 PPM as pure Catalyst
  * expressions ([[decodePpm]]: header parse + per-pixel extraction),
  * PNG and JPEG via the JDK's own `javax.imageio` ([[decodeImage]]:
  * batched mapPartitions — no external library needed; ImageIO ships
  * PNG/BMP/GIF/JPEG codecs in every JVM), and canonical 16-bit PCM WAV
  * ([[decodeWav]]), and MJPEG-in-AVI video ([[decodeAviFrames]]: a real
  * RIFF container walk whose frames decode through the same ImageIO JPEG
  * path). Lossless formats are oracle-gated on exact pixel bytes; lossy
  * JPEG/MJPEG is tolerance-gated (exact dims, per-channel means within
  * ε). Formats with no JVM codec at all keep the STUBBED byte-level
  * featurizer ([[decodeFeatures]]/[[frameSample]]), but the Spark-side
  * shape is real: binary payload column, metadata struct, explicit
  * output schema, fixed batch size (what a vectorized/Arrow UDF would
  * see), partition parallelism.
  */
object Binary {

  // ImageIO defaults to a FILE-backed stream cache: every read/write
  // creates (and deletes) a temp file in java.io.tmpdir. Row-local codec
  // kernels touch millions of tiny in-memory images, and the per-image
  // temp-file churn turns into filesystem-metadata contention across
  // executor threads — measured at the r12 sf10 run: q_jpeg_decode
  // scaled 29x on 10x rows with the cache on. All our payloads are
  // byte arrays already in memory; cache in memory. (JVM-global flag,
  // set once when any codec path loads this object.)
  javax.imageio.ImageIO.setUseCache(false)

  /** Attach a binary payload + metadata struct. The fixture corpus has no
    * real media, so the payload is the UTF-8 text bytes standing in for an
    * encoded image.
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("byte_len"),
        (col(idCol) % 640).cast("int").as("width"),
        (col(idCol) % 480).cast("int").as("height")).as("meta"))

  /** Batch size a vectorized decode would use; kept small so tests observe
    * multiple batches per partition.
    */
  val decodeBatchSize = 64

  /** STUB decode/feature-extract for NON-image media (audio/video — codecs
    * the JDK lacks): replace the body of `featurize` with a real decoder
    * (JNI/media lib) in production. Batched mapPartitions so a real
    * implementation amortizes model/codec setup per batch exactly like
    * `mapInPandas` would. For images, [[decodeImage]] below is the real
    * thing over the same batching shape.
    */
  def decodeFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add("feat_byte_len", LongType)
      .add("feat_head", IntegerType)
      .add("feat_checksum", LongType)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false) // executor JVMs too

      iter.grouped(decodeBatchSize).flatMap { batch =>
        // one "codec init" per batch would go here
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](idx)
          val f = featurize(bytes)
          // Seq[Any] prevents numeric LUB widening (Seq(Long, Int, Long)
          // would infer Seq[Long] and silently widen the Int field)
          Row.fromSeq(row.toSeq ++ Seq[Any](f._1, f._2, f._3))
        }
      }
    }
  }

  /** Deterministic fake features (=== the stubbed decoder). */
  private def featurize(bytes: Array[Byte]): (Long, Int, Long) = {
    val len = bytes.length.toLong
    val head = if (bytes.isEmpty) -1 else bytes(0) & 0xff
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
    (len, head, sum)
  }

  /** STUB image resize for OPAQUE payloads: a JNI/codec-backed
    * implementation decodes `payload`, resizes, and re-encodes; the stub
    * only rewrites the metadata struct. For formats this module really
    * decodes (PPM/PNG/JPEG → `pixels`), [[avgPool2]] below is the REAL
    * resize kernel and is oracle-gated (q_image_resize).
    */
  def resizeStub(df: DataFrame, width: Int, height: Int): DataFrame =
    df.withColumn("meta", struct(
      col("meta.mime"),
      col("meta.byte_len"),
      lit(width).as("width"),
      lit(height).as("height")))

  /** REAL 2×2 box-filter downsample over a DECODED frame — one output
    * pixel per 2×2 input block, per channel, as the exact integer sum of
    * the four samples (`r4/g4/b4`) plus the /4 average. Pure Catalyst
    * (explode over output pixels + aggregate over the 4-tap kernel):
    * codegen'd, row-local per output pixel, zero shuffle — the shape a
    * resize kernel keeps at 100 TB (embarrassingly parallel over frames;
    * megapixel assets swap the per-pixel expression for a codec library
    * in batched mapPartitions, same schema).
    *
    * Expects [[decodePpm]]-style columns (width, height, pixels). Odd
    * trailing rows/columns are truncated (floor(w/2)×floor(h/2) output).
    */
  def avgPool2(decoded: DataFrame): DataFrame = {
    def chanSum(c: Int) = expr(
      s"""aggregate(sequence(0, 3), CAST(0 AS BIGINT), (acc, k) ->
         |  acc + element_at(pixels, CAST(
         |    ((2*py + k div 2) * width + (2*px + k % 2)) * 3 + $c + 1
         |    AS INT)))""".stripMargin)
    decoded
      .withColumn("out_w", expr("CAST(width div 2 AS INT)"))
      .withColumn("out_h", expr("CAST(height div 2 AS INT)"))
      // sequence(0, -1) is NOT empty (Spark infers step -1): a frame with
      // a zero output dimension must explode to ZERO rows, not two
      .withColumn("__p", explode(expr(
        "CASE WHEN out_w * out_h >= 1 THEN sequence(0, out_w * out_h - 1) " +
          "ELSE array() END")))
      .withColumn("px", expr("CAST(__p % out_w AS INT)"))
      .withColumn("py", expr("CAST(__p div out_w AS INT)"))
      .withColumn("r4", chanSum(0))
      .withColumn("g4", chanSum(1))
      .withColumn("b4", chanSum(2))
      // sums are exact ints; the averages are exact quarters, identical
      // in any IEEE engine — no rounding needed
      .withColumn("r_avg", col("r4") / 4.0)
      .withColumn("g_avg", col("g4") / 4.0)
      .withColumn("b_avg", col("b4") / 4.0)
      .drop("__p")
  }

  /** Deterministic P6 PPM test-image generator: pixel byte j of a row is
    * `(seed·31 + j·7) mod 256`, so an external engine can recompute every
    * pixel from the seed without parsing bytes — which is what lets the
    * DECODER's output be oracle-gated. Production rows arrive with real
    * encoded bytes in a binary column; this generator only replaces the
    * camera. Canonical header (`P6\n<w> <h>\n255\n`), 24-bit RGB.
    */
  def ppmFromSeed(df: DataFrame, seedCol: String, width: Int,
      height: Int): DataFrame = {
    val n = 3 * width * height
    val header = lit(s"P6\n$width $height\n255\n").cast("binary")
    val hexPixels = array_join(
      transform(sequence(lit(0), lit(n - 1)),
        j => lpad(hex((col(seedCol) * 31 + j * 7) % 256), 2, "0")), "")
    df.withColumn("ppm", concat(header, unhex(hexPixels)))
  }

  /** REAL P6 PPM decode — no stub: parses the ASCII header (width, height,
    * maxval; canonical single-whitespace separators) and extracts every
    * pixel byte into `pixels` (flattened RGB, 3·w·h ints). Pure Catalyst
    * expressions end to end: the header fields come from a regexp over the
    * ASCII prefix, pixel bytes from positional slices of the blob's hex
    * encoding — all codegen'd, row-local, zero shuffle. A truncated payload
    * yields NULL trailing pixels rather than an error.
    *
    * Scale note: per-pixel hex slicing is exact and fine for thumbnails /
    * sprite-sized assets (the fixture decodes 8×8); megapixel assets
    * belong to a codec library behind the same schema via batched
    * mapPartitions (see [[decodeFeatures]] for the batching shape).
    */
  def decodePpm(df: DataFrame, bytesCol: String): DataFrame = {
    val hdr = "^P6\\s(\\d+)\\s(\\d+)\\s(\\d+)\\s"
    // ASCII prefix: cast-to-string of the first 32 bytes is byte-stable for
    // the header region (pixel bytes past it may be invalid UTF-8; the
    // regexp never reaches them)
    val prefix = substring(col(bytesCol), 1, 32).cast("string")
    df
      .withColumn("__w", regexp_extract(prefix, hdr, 1))
      .withColumn("__h", regexp_extract(prefix, hdr, 2))
      .withColumn("__m", regexp_extract(prefix, hdr, 3))
      // canonical header length: "P6\n" + w + " " + h + "\n" + m + "\n"
      .withColumn("__hl",
        lit(3) + length(col("__w")) + lit(1) + length(col("__h")) + lit(1) +
          length(col("__m")) + lit(1))
      .withColumn("__hex", hex(col(bytesCol)))
      .withColumn("width", col("__w").cast("int"))
      .withColumn("height", col("__h").cast("int"))
      .withColumn("maxval", col("__m").cast("int"))
      // pixel byte at blob offset __hl + j lives at hex chars
      // [(__hl+j)·2 + 1, +2] (1-based). The when() guard (payload shorter
      // than the header → empty pixels) also references __hex a second
      // time, which keeps CollapseProject from inlining the hex() of the
      // whole blob into the per-element lambda.
      //
      // maxval > 255 means a LEGAL P6 with 2-byte big-endian samples —
      // which this 1-byte extractor would silently mis-decode on every
      // pixel. Such images fail LOUDLY (NULL pixels), never quietly wrong.
      .withColumn("pixels",
        when(col("maxval") > 255, lit(null).cast("array<int>"))
          .when(length(col("__hex")) < col("__hl") * 2,
            array().cast("array<int>"))
          .otherwise(transform(
            sequence(lit(0), col("width") * col("height") * 3 - 1),
            j => conv(col("__hex").substr((col("__hl") + j) * 2 + 1, lit(2)),
              16, 10).cast("int"))))
      .drop("__w", "__h", "__m", "__hl", "__hex")
  }

  /** Deterministic PNG test-image generator — the [[ppmFromSeed]] pattern
    * for a COMPRESSED format: pixel byte j of a row is
    * `(seed·31 + j·7) mod 256` (identical formula), rendered into a
    * `BufferedImage` and encoded with the JDK's `javax.imageio` PNG
    * writer. PNG is lossless, so a correct decoder must recover the exact
    * formula pixels — which is what lets [[decodeImage]] be oracle-gated
    * without the oracle ever parsing a PNG. Row-local mapPartitions;
    * production rows arrive with real encoded bytes.
    */
  def pngFromSeed(df: DataFrame, seedCol: String, width: Int,
      height: Int): DataFrame =
    rasterFromSeed(df, seedCol, width, height, "png", "png")

  /** The [[pngFromSeed]] generator for a LOSSY format: identical formula
    * pixels, encoded with the JDK's JPEG writer (default quality).
    * Quantization + chroma subsampling mean a decoder recovers the pixels
    * only approximately — which is exactly what the tolerance-gated
    * `q_jpeg_decode` exercises (dims exact, per-channel means within ε).
    */
  def jpegFromSeed(df: DataFrame, seedCol: String, width: Int,
      height: Int): DataFrame =
    rasterFromSeed(df, seedCol, width, height, "jpg", "jpeg")

  /** Shared seed-formula raster generator: pixel byte j of a row is
    * `(seed·31 + j·7) mod 256`, rendered into a `BufferedImage` and
    * encoded by the named `javax.imageio` writer. Row-local
    * mapPartitions; production rows arrive with real encoded bytes.
    */
  private def rasterFromSeed(df: DataFrame, seedCol: String, width: Int,
      height: Int, format: String, outCol: String): DataFrame = {
    val outSchema = df.schema.add(outCol, BinaryType)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(seedCol)
    df.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false) // executor JVMs too

      iter.map { row =>
        val seed = row.getAs[Number](idx).longValue
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val j = 3 * (y * width + x)
            val r = ((seed * 31 + j * 7) % 256).toInt
            val g = ((seed * 31 + (j + 1) * 7) % 256).toInt
            val b = ((seed * 31 + (j + 2) * 7) % 256).toInt
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, format, bos)
        Row.fromSeq(row.toSeq :+ bos.toByteArray)
      }
    }
  }

  /** REAL raster decode via the JDK's `javax.imageio` — handles PNG, BMP,
    * GIF and JPEG with zero external dependencies. Same output schema as
    * [[decodePpm]] (`width`, `height`, `maxval`, flattened-RGB `pixels`),
    * so downstream featurization ([[ppmFeatures]]) is format-agnostic.
    * Batched mapPartitions (the [[decodeFeatures]] shape): row-local,
    * zero shuffle, codec state amortizable per batch. Undecodable bytes
    * yield NULL fields rather than failing the job — corrupt assets are a
    * fact of life in a 100 TB media crawl and must quarantine, not abort.
    */
  def decodeImage(df: DataFrame, bytesCol: String): DataFrame = {
    val outSchema = df.schema
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("maxval", IntegerType)
      .add("pixels", ArrayType(IntegerType))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false) // executor JVMs too

      iter.grouped(decodeBatchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](idx)
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null)
            Row.fromSeq(row.toSeq ++ Seq[Any](null, null, null, null))
          else {
            val w = img.getWidth
            val h = img.getHeight
            val px = new Array[Int](3 * w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val j = 3 * (y * w + x)
                px(j) = (rgb >> 16) & 0xff
                px(j + 1) = (rgb >> 8) & 0xff
                px(j + 2) = rgb & 0xff
                x += 1
              }
              y += 1
            }
            Row.fromSeq(row.toSeq ++ Seq[Any](w, h, 255, px))
          }
        }
      }
    }
  }

  /** Image features over [[decodePpm]] output: per-channel means and a
    * 2×2-downsample checksum (the sum of r+g+b over every even-x, even-y
    * pixel — a subsample-then-reduce stand-in for a resize kernel). Four
    * row-local folds over the materialized pixel array; zero shuffle.
    */
  def ppmFeatures(df: DataFrame): DataFrame = {
    val npix = col("width") * col("height")
    def chan(i: org.apache.spark.sql.Column, c: Int) =
      element_at(col("pixels"), i * 3 + c + 1).cast("long")
    def meanChan(c: Int) =
      round(aggregate(sequence(lit(0), npix - 1), lit(0L),
        (acc, i) => acc + chan(i, c)).cast("double") / npix, 4)
    df
      .withColumn("mean_r", meanChan(0))
      .withColumn("mean_g", meanChan(1))
      .withColumn("mean_b", meanChan(2))
      .withColumn("ds_checksum",
        aggregate(sequence(lit(0), npix - 1), lit(0L),
          (acc, i) => acc + when(
            pmod(pmod(i, col("width")), lit(2)) === 0 &&
              pmod(floor(i.cast("double") / col("width")).cast("int"),
                lit(2)) === 0,
            chan(i, 0) + chan(i, 1) + chan(i, 2)).otherwise(lit(0L))))
  }

  /** Deterministic 16-bit mono PCM WAV generator — the audio sibling of
    * [[ppmFromSeed]]: sample j of a row is the unsigned 16-bit value
    * `(seed·13 + j·11) mod 65536` (two's-complement signed on decode),
    * wrapped in a canonical 44-byte RIFF/PCM header. The header is
    * seed-independent, so it is built ONCE in Scala as a literal hex
    * prefix; only the sample bytes are per-row expressions. An external
    * engine recomputes every sample from the formula without parsing
    * bytes — which is what lets [[decodeWav]] be oracle-gated.
    */
  def wavFromSeed(df: DataFrame, seedCol: String, nSamples: Int,
      sampleRate: Int = 8000): DataFrame = {
    val dataSize = 2 * nSamples
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    val header: Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ le(36L + dataSize, 4) ++
        "WAVEfmt ".getBytes("US-ASCII") ++ le(16, 4) ++
        le(1, 2) ++ le(1, 2) ++ le(sampleRate, 4) ++
        le(sampleRate * 2L, 4) ++ le(2, 2) ++ le(16, 2) ++
        "data".getBytes("US-ASCII") ++ le(dataSize, 4)
    val headerHex = header.map(b => f"${b & 0xff}%02X").mkString
    // per-sample little-endian hex: low byte then high byte
    val u = (j: org.apache.spark.sql.Column) =>
      (col(seedCol) * 13 + j * 11) % 65536
    val samplesHex = array_join(
      transform(sequence(lit(0), lit(nSamples - 1)), j =>
        concat(lpad(hex(u(j) % 256), 2, "0"),
          lpad(hex((u(j) / 256).cast("long")), 2, "0"))), "")
    df.withColumn("wav", unhex(concat(lit(headerHex), samplesHex)))
  }

  /** REAL canonical-PCM WAV decode — pure Catalyst expressions like
    * [[decodePpm]]: header fields from fixed little-endian offsets of the
    * 44-byte RIFF/PCM header, every 16-bit sample from positional hex
    * slices (two's-complement sign handling in the expression). NULL
    * fields when the magic/fmt is not canonical 16-bit PCM mono-header
    * layout — non-PCM or compressed WAV must fail loudly, not decode
    * garbage. Truncated data yields NULL trailing samples. Per-sample hex
    * slicing is documented jingle-scale; bulk audio belongs in batched
    * mapPartitions behind the same schema (the [[decodeFeatures]] shape).
    */
  def decodeWav(df: DataFrame, bytesCol: String): DataFrame = {
    val hx = hex(col(bytesCol))
    // byte value at 0-based blob offset o (via the hex encoding)
    def b(o: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      conv(col("__hex").substr(o * 2 + 1, lit(2)), 16, 10).cast("long")
    // little-endian n-byte integer at fixed offset o
    def leAt(o: Int, n: Int): org.apache.spark.sql.Column =
      (0 until n).map(i => b(lit(o + i)) * (1L << (8 * i))).reduce(_ + _)
    df
      .withColumn("__hex", hx)
      .withColumn("__magic",
        substring(col(bytesCol), 1, 4).cast("string") === "RIFF" &&
          substring(col(bytesCol), 9, 8).cast("string") === "WAVEfmt " &&
          substring(col(bytesCol), 37, 4).cast("string") === "data")
      .withColumn("__fmt", when(col("__magic"),
        leAt(20, 2) === 1 && leAt(34, 2) === 16 && leAt(22, 2) === 1)
        .otherwise(false))
      .withColumn("sample_rate",
        when(col("__fmt"), leAt(24, 4).cast("int")))
      .withColumn("n_samples",
        when(col("__fmt"), (leAt(40, 4) / 2).cast("int")))
      .withColumn("samples",
        when(col("__fmt") && col("n_samples") >= 1,
          transform(sequence(lit(0), col("n_samples") - 1), j => {
            val u = b(lit(44) + j * 2) + b(lit(45) + j * 2) * 256
            when(u >= 32768, u - 65536).otherwise(u).cast("int")
          }))
          .otherwise(when(col("__fmt"), array().cast("array<int>"))))
      .drop("__hex", "__magic", "__fmt")
  }

  /** Audio features over [[decodeWav]] output: mean amplitude, RMS and
    * zero-crossing count — row-local folds over the sample array, zero
    * shuffle (the audio analogue of [[ppmFeatures]]).
    */
  def wavFeatures(df: DataFrame): DataFrame = {
    val n = col("n_samples")
    def el(i: org.apache.spark.sql.Column) =
      element_at(col("samples"), i + 1).cast("long")
    df
      .withColumn("mean_amp",
        round(aggregate(sequence(lit(0), n - 1), lit(0L),
          (acc, i) => acc + el(i)).cast("double") / n, 4))
      .withColumn("rms",
        round(sqrt(aggregate(sequence(lit(0), n - 1), lit(0L),
          (acc, i) => acc + el(i) * el(i)).cast("double") / n), 4))
      .withColumn("zero_crossings",
        when(n >= 2, aggregate(sequence(lit(0), n - 2), lit(0),
          (acc, i) => acc + when(el(i) * el(i + 1) < 0, 1).otherwise(0)))
          .otherwise(lit(0)))
  }

  /** Frame-level audio features over [[decodeWav]] output: split the
    * sample array into fixed-length frames (trailing partial frame
    * dropped) and emit per-frame RMS energy and zero-crossing count —
    * the energy-envelope / spectrogram precursor every audio pipeline
    * computes before VAD, silence trimming, or feature stacking. One
    * explode multiplies rows per frame; the per-frame folds are
    * row-local Catalyst aggregates, zero shuffle — frames then flow
    * through the pipeline exactly like documents.
    */
  def wavFrames(df: DataFrame, frameLen: Int): DataFrame = {
    require(frameLen >= 2, "frameLen must be >= 2")
    def el(i: org.apache.spark.sql.Column) =
      element_at(col("samples"), (i + 1).cast("int")).cast("long")
    df
      // same sequence(0, -1) trap as avgPool2: clips shorter than one
      // frame (incl. n_samples=0 header-only WAVs) must emit ZERO frames —
      // the guard decodeWav/wavFeatures already keep for their folds
      .withColumn("frame",
        explode(when(col("n_samples") >= frameLen,
          sequence(lit(0), (col("n_samples") / frameLen).cast("int") - 1))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame", col("frame").cast("int"))
      .withColumn("rms",
        round(sqrt(aggregate(sequence(lit(0), lit(frameLen - 1)), lit(0L),
          (acc, k) => {
            val s = el(col("frame") * frameLen + k)
            acc + s * s
          }).cast("double") / frameLen), 4))
      .withColumn("zero_crossings",
        aggregate(sequence(lit(0), lit(frameLen - 2)), lit(0),
          (acc, k) => {
            val a = el(col("frame") * frameLen + k)
            val b = el(col("frame") * frameLen + k + 1)
            acc + when(a * b < 0, 1).otherwise(0)
          }))
  }

  /** Shared 16-point DFT twiddle tables, formatted to 17 significant
    * digits so Spark literals and the DuckDB oracle parse the SAME
    * doubles — every cos/sin product is then bit-identical cross-engine
    * (libm differences never enter: the trig is evaluated ONCE, here).
    * cos(2πkn/16) = cosTab((k·n) mod 16).
    */
  val dftCosTab: IndexedSeq[Double] =
    (0 until 16).map(m => math.cos(2 * math.Pi * m / 16))
  val dftSinTab: IndexedSeq[Double] =
    (0 until 16).map(m => math.sin(2 * math.Pi * m / 16))

  /** Render a twiddle table as a DuckDB list literal with round-trip-exact
    * decimal digits.
    */
  def tabSql(tab: Seq[Double]): String =
    // explicit Locale.ROOT: a comma-decimal default locale (de_DE) would
    // render '0,9238...' and break the DuckDB list-literal parse (r9 advice)
    tab.map(d => String.format(java.util.Locale.ROOT, "%.17g",
      java.lang.Double.valueOf(d))).mkString("[", ", ", "]")

  /** 16-point DFT power spectrum per audio frame from [[decodeWav]]
    * output: for bins k = 0..8 (the real-input half-spectrum), power_k =
    * re² + im² with re/im folded strictly left-to-right over the frame's
    * 16 samples against the shared twiddle tables — so the heavy
    * arithmetic is bit-reproducible on any engine that parses the same
    * literals. Emits per (frame, bin): power in dB (log compresses any
    * residual ulp into far below the rounding grid) and the bin's share
    * of frame energy; plus the frame's spectral centroid over k ≥ 1.
    * Row-local folds after one explode — zero shuffle, the spectrogram
    * precursor at corpus scale.
    */
  /** Shared DFT kernel: one row per (doc, frame, bin 0..8) with the RAW
    * bin power, re/im folded strictly left-to-right against the literal
    * twiddle tables — the bit-reproducible core [[wavSpectrum]] and
    * [[wavDominantBins]] both build on.
    */
  private def framedPower(df: DataFrame): DataFrame = {
    val frameLen = 16
    val cosLit = array(dftCosTab.map(lit): _*)
    val sinLit = array(dftSinTab.map(lit): _*)
    def el(i: org.apache.spark.sql.Column) =
      element_at(col("samples"), (i + 1).cast("int")).cast("double")
    val framed = df
      .withColumn("frame",
        explode(when(col("n_samples") >= frameLen,
          sequence(lit(0), (col("n_samples") / frameLen).cast("int") - 1))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame", col("frame").cast("int"))
      .withColumn("bin", explode(sequence(lit(0), lit(8))))
    val re = aggregate(sequence(lit(0), lit(frameLen - 1)), lit(0.0),
      (acc, n) => acc + el(col("frame") * frameLen + n) *
        element_at(cosLit, (col("bin") * n) % 16 + 1))
    val im = aggregate(sequence(lit(0), lit(frameLen - 1)), lit(0.0),
      (acc, n) => acc - el(col("frame") * frameLen + n) *
        element_at(sinLit, (col("bin") * n) % 16 + 1))
    framed.withColumn("power", re * re + im * im)
  }

  /** Per-frame DOMINANT non-DC bin (argmax of raw power over bins 1..8,
    * ties to the lower bin) — the landmark an audio fingerprint hashes.
    * The powers are bit-reproducible (literal twiddles, fixed fold
    * order), so the argmax — and every fingerprint built from it — is
    * deterministic across engines. Row-local except the 8-row per-frame
    * rank window.
    */
  def wavDominantBins(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    framedPower(df)
      .filter(col("bin") >= 1)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"), col("frame"))
          .orderBy(col("power").desc, col("bin"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("frame"), col("bin").cast("int").as("bin"))
  }

  def wavSpectrum(df: DataFrame): DataFrame = {
    val spec = framedPower(df)
      .withColumn("tot",
        sum("power").over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"), col("frame"))))
      .withColumn("ctr_num",
        sum(when(col("bin") >= 1, col("power") * col("bin"))
          .otherwise(lit(0.0)))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id"), col("frame"))))
      .withColumn("ctr_den",
        sum(when(col("bin") >= 1, col("power")).otherwise(lit(0.0)))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id"), col("frame"))))
    spec.select(col("doc_id"), col("frame"), col("bin").cast("int").as("bin"),
      round(lit(10.0) * log(10.0, col("power") + 1), 3).as("power_db"),
      round(col("power") / col("tot"), 4).as("share"),
      when(col("ctr_den") > 0,
        round(col("ctr_num") / col("ctr_den"), 4)).as("centroid"))
  }

  // ---------------------------------------------------------------------
  // MJPEG-in-AVI video: the one video format decodable with zero external
  // dependencies — an AVI is a RIFF container, and MJPEG's frames are
  // plain JPEGs, which ImageIO already decodes (gated by q_jpeg_decode).
  // The container walk (chunk sizes, even-byte padding, LIST nesting,
  // 'movi' discovery) is the real parsing work; the per-frame decode
  // reuses the proven JPEG path. This retires the last video stub
  // (frameSample remains as the byte-featurizer shape for formats that
  // genuinely have no JVM codec).
  // ---------------------------------------------------------------------

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** RIFF chunk: fourcc + LE32 size + data + pad byte when size is odd
    * (the padding rule real parsers trip on — JPEG payloads are odd-sized
    * about half the time).
    */
  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    fourcc(id) ++ le32(data.length) ++ data ++ pad
  }

  private def riffList(listType: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", fourcc(listType) ++ body)

  /** Deterministic MJPEG-in-AVI test-video generator: `nFrames` JPEG
    * frames per row, frame f's pixels from the shared seed formula with
    * frame seed `seed·101 + f` (so the gate recomputes every frame's
    * expected statistics in-plan), wrapped in a standards-shaped AVI:
    * RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
    * '00dc'×n)). Row-local mapPartitions; production rows arrive with
    * real camera bytes.
    */
  def aviFromSeed(df: DataFrame, seedCol: String, width: Int, height: Int,
      nFrames: Int): DataFrame = {
    val outSchema = df.schema.add("avi", BinaryType)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(seedCol)
    df.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false) // executor JVMs too

      iter.map { row =>
        val seed = row.getAs[Number](idx).longValue
        val frames = (0 until nFrames).map { f =>
          val fseed = seed * 101 + f
          val img = new java.awt.image.BufferedImage(
            width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              val j = 3 * (y * width + x)
              val r = ((fseed * 31 + j * 7) % 256).toInt
              val g = ((fseed * 31 + (j + 1) * 7) % 256).toInt
              val b = ((fseed * 31 + (j + 2) * 7) % 256).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", bos)
          bos.toByteArray
        }
        val maxFrame = frames.map(_.length).max
        // avih: 56-byte main header (µs/frame, rate, pad, flags, frames,
        // initial, streams, bufsize, w, h, 4 reserved)
        val avih = riffChunk("avih", le32(40000) ++ le32(maxFrame * 25) ++
          le32(0) ++ le32(0) ++ le32(nFrames) ++ le32(0) ++ le32(1) ++
          le32(maxFrame) ++ le32(width) ++ le32(height) ++
          le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
        // strh: 56-byte stream header for a 25fps MJPG vids stream
        val strh = riffChunk("strh", fourcc("vids") ++ fourcc("MJPG") ++
          le32(0) ++ le32(0) ++ le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++
          le32(nFrames) ++ le32(maxFrame) ++ le32(-1) ++ le32(0) ++
          le32(0) ++ le32((height << 16) | width))
        // strf: 40-byte BITMAPINFOHEADER, biCompression = 'MJPG'
        val strf = riffChunk("strf", le32(40) ++ le32(width) ++
          le32(height) ++ Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++
          fourcc("MJPG") ++ le32(width * height * 3) ++ le32(0) ++
          le32(0) ++ le32(0) ++ le32(0))
        val hdrl = riffList("hdrl", avih ++ riffList("strl", strh ++ strf))
        val movi = riffList("movi",
          frames.flatMap(fb => riffChunk("00dc", fb)).toArray)
        val body = fourcc("AVI ") ++ hdrl ++ movi
        val avi = fourcc("RIFF") ++ le32(body.length) ++ body
        Row.fromSeq(row.toSeq :+ avi)
      }
    }
  }

  /** REAL MJPEG-in-AVI decode: parse the RIFF container (magic + form
    * type, chunk walk with LE sizes and even-byte padding, nested LISTs),
    * locate the 'movi' list, and decode every video-data chunk
    * ('##dc'/'##db') as a JPEG through ImageIO. Emits ONE ROW PER FRAME
    * (`frame_idx`, `width`, `height`, flattened-RGB `pixels`) — the
    * generator shape: frames multiply rows exactly like exploded
    * documents, and everything downstream ([[ppmFeatures]], resize,
    * dedup) is format-agnostic. Undecodable payloads or frames yield
    * zero rows / NULL fields — corrupt assets quarantine, never abort.
    * Batched mapPartitions, row-local, zero shuffle.
    */
  def decodeAviFrames(df: DataFrame, bytesCol: String): DataFrame = {
    val outSchema = df.schema
      .add("frame_idx", IntegerType)
      .add("width", IntegerType)
      .add("height", IntegerType)
      .add("pixels", ArrayType(IntegerType))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)

    def u32le(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    // collect the (offset, size) of every ##dc/##db chunk inside 'movi'
    def frameChunks(b: Array[Byte]): Seq[(Int, Int)] = {
      if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ")
        return Seq.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
        var p = from
        while (p + 8 <= to) {
          val id = tag(b, p)
          val size = u32le(b, p + 4)
          if (size < 0 || p + 8 + size > to) return // truncated/corrupt
          val sz = size.toInt
          if (id == "LIST" && sz >= 4) {
            val listType = tag(b, p + 8)
            walk(p + 12, p + 8 + sz, inMovi || listType == "movi")
          } else if (inMovi && id.length == 4 &&
              (id.endsWith("dc") || id.endsWith("db")))
            out += ((p + 8, sz))
          p += 8 + sz + (sz % 2) // even-byte padding
        }
      }
      walk(12, (12 + u32le(b, 4) - 4).min(b.length).toInt, inMovi = false)
      out.toSeq
    }

    df.mapPartitions { iter =>
      javax.imageio.ImageIO.setUseCache(false) // executor JVMs too

      iter.grouped(decodeBatchSize).flatMap { batch =>
        batch.flatMap { row =>
          val bytes = row.getAs[Array[Byte]](idx)
          val chunks = if (bytes == null) Seq.empty else
            try frameChunks(bytes) catch { case _: Exception => Seq.empty }
          chunks.zipWithIndex.map { case ((off, len), f) =>
            val img =
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes, off, len))
              catch { case _: Exception => null }
            if (img == null)
              Row.fromSeq(row.toSeq ++ Seq[Any](f, null, null, null))
            else {
              val w = img.getWidth
              val h = img.getHeight
              val px = new Array[Int](3 * w * h)
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val j = 3 * (y * w + x)
                  px(j) = (rgb >> 16) & 0xff
                  px(j + 1) = (rgb >> 8) & 0xff
                  px(j + 2) = rgb & 0xff
                  x += 1
                }
                y += 1
              }
              Row.fromSeq(row.toSeq ++ Seq[Any](f, w, h, px))
            }
          }
        }
      }
    }
  }

  /** STUB video frame sampling: emit one row per sampled "frame" — every
    * `step`-th byte offset of the payload stands in for a decoded frame,
    * with the byte value as the frame's stub feature. The shape is the
    * real thing: a generator (explode of the sample positions) multiplies
    * rows per asset, per-frame decode is row-local, and a downstream
    * pipeline treats frames exactly like documents. Swap `frame_feat` for
    * a real decoder's output at the same schema position.
    */
  def frameSample(df: DataFrame, step: Int,
      payloadCol: String = "payload"): DataFrame = {
    require(step > 0, "step must be > 0")
    df.withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest(ceil(length(col(payloadCol)).cast("double") / step)
            .cast("int") - 1, lit(0)))))
      .withColumn("frame_offset", col("frame_idx") * step)
      .withColumn("frame_feat",
        when(length(col(payloadCol)) === 0, lit(-1))
          .otherwise(
            // byte value at frame_offset via the hex representation —
            // the same arithmetic the DuckDB oracle applies to the blob
            conv(expr(s"substr(hex($payloadCol), frame_offset * 2 + 1, 2)"),
              16, 10).cast("int")))
  }
}

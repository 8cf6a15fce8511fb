package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batches via mapPartitions. The actual
  * media decoding is STUBBED (this container has no image/audio libs) with
  * a deterministic byte-level featurizer — but the Spark-side shape is
  * real: binary payload column, metadata struct, explicit output schema,
  * fixed batch size (what a vectorized/Arrow UDF would see), partition
  * parallelism.
  */
object Binary {

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

  /** STUB decode/feature-extract: replace the body of `featurize` with a
    * real decoder (JNI/image lib) in production. Batched mapPartitions so
    * a real implementation amortizes model/codec setup per batch exactly
    * like `mapInPandas` would.
    */
  def decodeFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val outSchema = df.schema
      .add("feat_byte_len", LongType)
      .add("feat_head", IntegerType)
      .add("feat_checksum", LongType)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { iter =>
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

  /** STUB image resize: a real implementation decodes `payload`, resizes,
    * and re-encodes; the stub only rewrites the metadata struct (the
    * payload is opaque). The Spark-side contract — meta-struct rewrite,
    * payload passthrough, row-local, codegen-friendly — is exactly what a
    * JNI-backed resize exposes.
    */
  def resizeStub(df: DataFrame, width: Int, height: Int): DataFrame =
    df.withColumn("meta", struct(
      col("meta.mime"),
      col("meta.byte_len"),
      lit(width).as("width"),
      lit(height).as("height")))

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

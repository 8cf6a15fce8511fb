package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window chunking — the standard training-data step that splits a
  * document into overlapping token windows sized for a model's context.
  * Pure column expressions: windows are computed per row and exploded, so
  * a 100 TB corpus chunks with zero shuffles and the row multiplication is
  * the only cost.
  *
  * Window layout: starts at token 1, advancing by `stride`;
  * nWindows = ceil(max(nTokens − chunkSize, 0) / stride) + 1, so every
  * token is covered when stride ≤ chunkSize (the final window may be
  * shorter than `chunkSize`).
  */
object Chunker {

  /** Explode `textCol` into (chunk_idx, chunk_text, chunk_tokens) rows,
    * keeping `keep` parent columns. Tokenization is whitespace over the
    * normalized text (see [[graft.dedup.Dedup.normalized]]).
    */
  def chunkTokens(df: DataFrame, textCol: String, keep: Seq[String],
      chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize > 0, "chunkSize and stride must be > 0")
    val toks = split(graft.dedup.Dedup.normalized(col(textCol)), " ")
    val nWin = ceil(greatest(size(toks) - chunkSize, lit(0)).cast("double") / stride)
      .cast("int") + 1
    df.withColumn("__toks", toks)
      .withColumn("chunk_idx", explode(sequence(lit(0), nWin - 1)))
      .withColumn("__win",
        slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkSize)))
      .select(keep.map(col) ++ Seq(
        col("chunk_idx"),
        concat_ws(" ", col("__win")).as("chunk_text"),
        size(col("__win")).as("chunk_tokens")): _*)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark DataFrame program plus (when SQL-expressible)
  * an equivalent ANSI-SQL oracle the driver runs in DuckDB over the same
  * parquet tables. Column names/aliases MUST match between the two.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

/** Fixture-table catalog: one parquet file per table under an sf dir.
  * See TESTDATA.md / FIXTURES.md.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session options every graft session needs. `nanosAsLong` lets Spark
    * read a timestamp[ns] events column (Spark has no ns timestamp) in
    * fixture generations that ship one; Tables.t then truncates it to µs —
    * the exact behavior of the DuckDB oracle, which also reads
    * TIMESTAMP_NS at µs precision.
    */
  val sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true")

  /** Read a fixture table. Parquet scan: column pruning + predicate
    * pushdown apply to anything selected/filtered downstream.
    *
    * The events fixture has shipped `ts` as both timestamp[ns] (read as
    * LongType under `nanosAsLong`) and timestamp[us] (read natively as
    * TIMESTAMP_NTZ) across driver generations — [[normalizeEventTs]]
    * maps either to a µs timestamp so every query sees one schema. For
    * the LongType generation, the parquet footer's logical type is
    * verified once per dir: a plain-int64 `ts` that is NOT annotated
    * timestamp(NANOS) would be silently corrupted by the ÷1000, so it
    * fails loudly instead.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        requireNanosFooter(spark, s"$dir/$name.parquet")
      normalizeEventTs(df)
    } else df
  }

  /** Stage a fixture table into a streaming landing directory (the
    * FileStreamSource deployment shape: files arrive in a dir).
    *
    * Layout-agnostic (r12, found by the sf1 run): driver fixtures are
    * single parquet FILES, while scaled fixtures (tools.ScaleUp) are
    * DIRECTORIES of part files — `Files.copy` on a directory copies only
    * the empty dir entry and the stream then reads nothing. A single file
    * lands at `<destBase>.parquet`; a directory's part files land at
    * `<destBase>-<i>.parquet` in lexicographic part order (deterministic
    * arrival order). Callers that depend on one-batch-per-file set
    * `maxFilesPerTrigger` explicitly and stage their batches themselves;
    * every caller of THIS helper drains the landing dir in a single
    * AvailableNow pass, for which file count is semantically neutral.
    */
  def stageFixture(src: String, destBase: String): Unit = {
    val p = java.nio.file.Paths.get(src)
    if (java.nio.file.Files.isDirectory(p)) {
      val parts = {
        val s = java.nio.file.Files.list(p)
        try {
          val it = s.iterator()
          val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
          while (it.hasNext) { val f = it.next(); buf += f }
          buf.filter(_.getFileName.toString.endsWith(".parquet"))
            .sortBy(_.getFileName.toString)
        } finally s.close()
      }
      require(parts.nonEmpty, s"no parquet part files under $src")
      parts.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.copy(f,
          java.nio.file.Paths.get(s"$destBase-$i.parquet"))
      }
    } else
      java.nio.file.Files.copy(p,
        java.nio.file.Paths.get(s"$destBase.parquet"))
  }

  /** Normalize the events `ts` column to a µs TIMESTAMP regardless of
    * which fixture generation produced it. Dispatches purely on the
    * DataFrame schema, so it works identically on batch reads and on
    * `readStream` DataFrames built with the batch-read schema.
    *
    *  - LongType (timestamp[ns] under `nanosAsLong`): integer-divide to
    *    µs — `ts / 1000` in double arithmetic would corrupt epoch-ns
    *    values (> 2^53).
    *  - TIMESTAMP_NTZ (native timestamp[us] without tz): cast to
    *    TIMESTAMP — value-identical ONLY under a UTC session timezone,
    *    which is asserted here so a session built without
    *    [[sessionConfigs]] fails loudly instead of silently shifting
    *    every event time by the local-tz offset.
    *  - TIMESTAMP: already normalized, no-op.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case TimestampNTZType =>
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
        require(tz == "UTC",
          s"events ts is TIMESTAMP_NTZ and session timeZone is '$tz' — the " +
            "NTZ→TIMESTAMP cast is only value-preserving under UTC; apply " +
            "Tables.sessionConfigs to the session")
        df.withColumn("ts", df("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events ts has unexpected type $other — fixture generation drift; " +
          "extend Tables.normalizeEventTs for it")
    }
  }

  private val verifiedNsPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** A LongType `ts` is only epoch-NANOS if the parquet footer says so
    * (`nanosAsLong` is the sole source of long-typed ts in our fixtures).
    * One driver-side footer read per path, cached.
    */
  private def requireNanosFooter(spark: SparkSession, path: String): Unit = {
    if (verifiedNsPaths.contains(path)) return
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(s"no parquet file under $path"))
      else p
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val ann = schema.getType(schema.getFieldIndex("ts"))
        .asPrimitiveType().getLogicalTypeAnnotation
      val isNanos = ann match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
        case _ => false
      }
      if (!isNanos) throw new IllegalStateException(
        s"events ts reads as BIGINT but the parquet logical type is $ann, " +
          s"not timestamp(NANOS) — refusing the ns→µs division ($file)")
      verifiedNsPaths.add(path)
    } finally reader.close()
  }
}

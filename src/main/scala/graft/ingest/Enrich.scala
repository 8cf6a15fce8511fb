package graft.ingest

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.types.StringType
import scala.util.{Failure, Success, Try}

/** S6/S7 — per-key detail fan-out ("N+1 enrichment"). The reference fetches
  * `/{id}` per parent row with a ThreadPoolExecutor of 2–10 workers
  * (biilwerk_invoices_line_items.py:90-137, bexio_orders_de.py:165-192);
  * the Spark-native form is `repartition(n).mapPartitions(fetch)` — the
  * parallelism knob is the partition count, and each partition runs its own
  * rate limiter and retry loop. At 1000 executors this scales to thousands
  * of concurrent request streams with no driver involvement; the
  * reference's MAX_WORKERS maps 1:1 onto `partitions`.
  */
object Enrich {

  /** Retry with exponential backoff (urllib3 `Retry(total=5,
    * backoff_factor=1)` analogue, lex_office_payments.py:183-185) and a
    * fixed inter-request delay (their `time.sleep(2-3)`), both per
    * partition. Failures after retries land in the error channel instead of
    * failing the stage — the reference logs-and-continues
    * (billwerk_invoices.py:61-63).
    */
  final case class Policy(
      maxRetries: Int = 5,
      backoffMillis: Long = 0L,
      delayMillis: Long = 0L)

  /** Fetch a detail payload per key. Output columns: the originals plus
    * `detailCol` (JSON string, NULL on permanent failure) and
    * `detailCol_error` (the quarantine channel: NULL on success). Parse the
    * detail downstream with from_json + an explicit schema.
    */
  def perKeyFetch(
      df: DataFrame,
      keyCol: String,
      fetch: String => String,
      partitions: Int,
      detailCol: String = "detail",
      policy: Policy = Policy()): DataFrame = {
    val outSchema = df.schema
      .add(detailCol, StringType)
      .add(s"${detailCol}_error", StringType)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val keyIdx = df.schema.fieldIndex(keyCol)
    df.repartition(partitions).mapPartitions { iter =>
      iter.map { row =>
        val (detail, err) =
          fetchWithPolicy(String.valueOf(row.get(keyIdx)), fetch, policy)
        Row.fromSeq(row.toSeq ++ Seq(detail, err))
      }
    }
  }

  private def fetchWithPolicy(key: String, fetch: String => String,
      policy: Policy): (String, String) = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= policy.maxRetries) {
      if (policy.delayMillis > 0) Thread.sleep(policy.delayMillis)
      Try(fetch(key)) match {
        case Success(v) => return (v, null)
        case Failure(e) =>
          lastErr = e
          if (policy.backoffMillis > 0)
            Thread.sleep(policy.backoffMillis * (1L << attempt))
          attempt += 1
      }
    }
    (null, s"${lastErr.getClass.getSimpleName}: ${lastErr.getMessage}")
  }
}

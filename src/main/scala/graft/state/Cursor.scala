package graft.state

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Incremental high-watermark state (SURVEY.md §2.9). The reference keeps
  * `last_processed_id` in an Airflow Variable, reads it at job start and
  * advances it only after the load succeeds (billwerk_invoices.py:14,86-99,
  * 160-163) — at-least-once upstream, made exactly-once by the idempotent
  * sink (delete+insert / NOT-EXISTS append).
  *
  * Here the watermark is a tiny file written via tmp+rename; `advance` is
  * called by the caller AFTER its sink commit, preserving the reference's
  * ordering. A crash between sink and advance re-processes the batch — safe
  * because every graft sink is idempotent by key.
  */
final class Cursor(spark: SparkSession, path: String) {

  private val p = new Path(path)
  private def fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Current watermark; `default` on first run. */
  def value(default: Long = Long.MinValue): Long =
    if (!fs.exists(p)) default
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLong
      } finally in.close()
    }

  /** Persist a new watermark atomically (only call after sink success).
    * Overwrite-capable rename: no delete-then-rename window in which the
    * watermark file is missing (a crash there would have reset the cursor
    * and re-ingested the whole source — safe with idempotent sinks, but
    * expensive and contrary to the atomicity claim).
    */
  def advance(v: Long): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}

package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Paginated REST ingestion (SURVEY.md §2.1, S1–S5). The reference runs
  * these loops inside PythonOperators against live SaaS APIs; here the loop
  * shape is preserved but the transport is an injected `fetch` function so
  * everything runs offline and deterministically. The driver-side loop is
  * correct at this layer's scale (API pagination is inherently sequential —
  * each page's cursor comes from the previous page); the *parallel* ingest
  * path is Enrich.perKeyFetch, where keys are known up front and fan out
  * across partitions.
  *
  * Records are raw JSON strings; `toDf` hands them to spark.read.json which
  * distributes parsing. An explicit schema should be pinned for production
  * (SURVEY.md §1.3) — inference is exploration-only.
  */
object Paginator {

  /** One page of results plus the transport-specific continuation token. */
  final case class Page(records: Seq[String], next: Option[String])

  /** S1 — keyset cursor (`?from=<lastId>`; billwerk_invoices.py:49-82):
    * `next` carries the max id of the page; terminates when the fetcher
    * signals no progress (same cursor again or empty page).
    */
  def keysetCursor(fetch: Option[String] => Page, start: Option[String] = None,
      rowLimit: Int = Int.MaxValue): Seq[String] = {
    val out = Seq.newBuilder[String]
    var n = 0
    var cursor = start
    var done = false
    while (!done) {
      val page = fetch(cursor)
      val take = page.records.take(rowLimit - n)
      out ++= take
      n += take.size
      done = page.records.isEmpty || page.next == cursor || page.next.isEmpty || n >= rowLimit
      cursor = page.next
    }
    out.result()
  }

  /** S2 — page-number loop (`page=0..` until `last==true`;
    * lex_office_invoices.py:50-91). The fetcher returns next=None on the
    * last page.
    */
  def pageNumber(fetch: Int => Page): Seq[String] = {
    val out = Seq.newBuilder[String]
    var page = 0
    var done = false
    while (!done) {
      val p = fetch(page)
      out ++= p.records
      done = p.next.isEmpty
      page += 1
    }
    out.result()
  }

  /** S3 — next-link follow (`paging.next.link`; get_tickets_v2.py:43-58).
    * Structurally identical to the keyset loop with an opaque URL cursor.
    */
  def nextLink(fetch: Option[String] => Page): Seq[String] =
    keysetCursor(fetch)

  /** S4 — single offset/limit window (bexio_invoice_and_line_items_de.py:62-75). */
  def offsetWindow(fetch: (Int, Int) => Page, offset: Int, limit: Int): Seq[String] =
    fetch(offset, limit).records

  /** S5 — starting_after cursor (stripe_charges.py:40-60): same loop as S1,
    * cursor = id of last element.
    */
  def startingAfter(fetch: Option[String] => Page): Seq[String] =
    keysetCursor(fetch)

  /** Distribute collected JSON records for parsing. */
  def toDf(spark: SparkSession, records: Seq[String]): DataFrame = {
    import spark.implicits._
    val ds: Dataset[String] = spark.createDataset(records)
    spark.read.json(ds)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar coercion / cleaning layer (SURVEY.md §2.2, P8–P17). The reference
  * does all of this with eager pandas per-row Python; here every transform is
  * a codegen'd Column expression — no UDFs, so whole-stage codegen keeps the
  * hot path fused at any scale.
  */
object Coerce {

  /** P8 — error-tolerant numeric coercion (`pd.to_numeric(errors='coerce')`,
    * bexio_invoice_and_line_items_de.py:167-171): invalid → NULL.
    */
  def toNumeric(c: Column): Column = c.try_cast("double")

  def toNumericAll(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, toNumeric(col(c))))

  /** P9 — `fillna(0).astype(int)` (bexio_orders_de.py:256-259). */
  def fillIntCast(c: Column, fill: Long = 0L): Column =
    coalesce(toNumeric(c), lit(fill)).cast("long")

  /** P10 — unix microseconds → timestamp
    * (convert_unix_microseconds_to_datetime, bexio_orders_de.py:91-95).
    */
  def unixMicrosToTs(c: Column): Column = timestamp_micros(c)

  /** P10 — unix seconds → timestamp (stripe/account.py:120). */
  def unixSecondsToTs(c: Column): Column = timestamp_seconds(c)

  /** P10 — `DD.MM.YYYY` → date (regex-rewritten in
    * finance/disputed_invoices/stripe_dispute.py:80-82).
    */
  def germanDateToDate(c: Column): Column = to_date(c, "dd.MM.yyyy")

  /** P10 — `%b-%y` month parse + month-end snap
    * (price-increase/import_bi_dev_gross_margin.py:52-54).
    */
  def monthYearToMonthEnd(c: Column): Column = last_day(to_date(c, "MMM-yy"))

  /** P11 — `clean_text`: strip newlines/CRs, collapse whitespace
    * (biilwerk_invoices_line_items.py:65-77). The reference's SQL-literal
    * escaping (`convert_value`, bexio_orders_de.py:101-119) is obsolete
    * under Spark (no string-assembled SQL), kept for surface parity.
    */
  def cleanText(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** P11 — escape single quotes for SQL literals (convert_value). */
  def escapeSqlLiteral(c: Column): Column = regexp_replace(c, "'", "''")

  /** P12 — strip thousands separators then parse
    * (import_bi_dev_ltv.py:55-59).
    */
  def stripThousands(c: Column): Column = toNumeric(regexp_replace(c, ",", ""))

  /** P12 — `'12.5%'` → 0.125 (`str.rstrip('%')/100`). */
  def pctToFraction(c: Column): Column =
    round(toNumeric(regexp_replace(c, "%$", "")) / 100.0, 6)

  /** P12 — `'n.a.'` and friends → NULL. */
  def naToNull(c: Column, naValues: Seq[String] = Seq("n.a.", "N/A", "")): Column =
    when(c.isin(naValues.map(lit(_)): _*), lit(null)).otherwise(c)

  /** P17 — dict → JSON string (`json.dumps(CustomFields)`,
    * biilwerk_contracts.py:167).
    */
  def structToJson(c: Column): Column = to_json(c)
}

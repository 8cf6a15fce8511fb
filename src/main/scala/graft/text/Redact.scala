package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: replace email / phone-shaped spans
  * with typed placeholder tokens and count what was removed (the removal
  * count is the audit column a compliance pipeline keeps). Pure row-local
  * column expressions — zero shuffle, whole-stage codegen.
  *
  * Patterns are deliberately conservative regex classes that the oracle
  * engine reproduces verbatim (no lookarounds, no engine-specific syntax).
  */
object Redact {

  /** local-part@domain.tld */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-ish phone: optional +, then 7+ digits with spaces/dashes. */
  val phoneRe = "\\+?[0-9][0-9 -]{5,}[0-9]"

  /** Count of spans the email pattern would redact. */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailRe), lit(0)))

  /** Redact emails first (their digits would otherwise feed the phone
    * pattern), then phones on the already-email-redacted text; the count
    * columns mirror that order so counts and text agree.
    */
  def scrub(text: Column): (Column, Column) = {
    val noEmail = regexp_replace(text, emailRe, "<EMAIL>")
    val scrubbed = regexp_replace(noEmail, phoneRe, "<PHONE>")
    val n = emailCount(text) +
      size(regexp_extract_all(noEmail, lit(phoneRe), lit(0)))
    (scrubbed, n.cast("int"))
  }
}

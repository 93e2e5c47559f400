package graft.textanalysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII detection and redaction — the scrub step web-corpus pipelines run
 * before training (C4 / RefinedWeb family: replace emails, IPs, phone
 * numbers with typed placeholders; keep counts as per-doc audit signals).
 *
 * Pure Column expressions (`regexp_extract_all` / `regexp_replace`) — one
 * scan-side pass per row, no shuffle, whole-stage codegen. The patterns
 * deliberately use only syntax shared by Java regex (Spark) and RE2
 * (DuckDB/Go — no backreferences, no lookaround), so every signal and the
 * redacted text itself are oracle-checkable cross-engine.
 *
 * Scope note: regex PII catches FORMATS (addresses, numbers), not semantic
 * identity (names need an NER model — that is model-inference surface, not
 * engine surface; the redaction hook is where it would plug in).
 */
object Pii {

  /** Email addresses (conservative practical form). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (format match; does not range-check octets). */
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** International-format phone numbers: +country then 7-18 digits with
    * common separators, ending in a digit. Domestic formats are too
    * ambiguous for a regex pass (dates, ids) and stay out by design. */
  val PhoneRe = "\\+[0-9][0-9 ()./-]{6,18}[0-9]"

  def emailCount(text: Column): Column = size(regexp_extract_all(text, lit(EmailRe), lit(0)))
  def ipv4Count(text: Column): Column = size(regexp_extract_all(text, lit(Ipv4Re), lit(0)))
  def phoneCount(text: Column): Column = size(regexp_extract_all(text, lit(PhoneRe), lit(0)))

  /** Text after the email pass — stage 1 of the contractual sequence. */
  def afterEmails(text: Column): Column = regexp_replace(text, EmailRe, "[EMAIL]")

  /** Text after the email + phone passes — stage 2. */
  def afterPhones(text: Column): Column = regexp_replace(afterEmails(text), PhoneRe, "[PHONE]")

  /** Typed-placeholder redaction. Order matters and is contractual:
    * emails first (an address may embed digit runs), then phones, then
    * IPs — both engines apply the identical sequence. */
  def redact(text: Column): Column = regexp_replace(afterPhones(text), Ipv4Re, "[IP]")

  /** Per-doc audit report + scrubbed text:
    * `(idCol, n_emails, n_ipv4, n_phones, redacted)`.
    *
    * Counts are SEQUENTIAL — each stage counts on the previous stage's
    * output, exactly like the redaction itself — so every count equals the
    * number of placeholders of that type actually emitted, and the audit
    * books always reconcile against the redacted text. (Raw-text counts
    * would not: a phone-shaped digit run inside an email local part, or an
    * IPv4 swallowed by an adjacent phone match, would be counted but never
    * replaced.) */
  def scrub(docs: org.apache.spark.sql.DataFrame,
            idCol: String = "doc_id",
            textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
      emailCount(t).cast("long").as("n_emails"),
      ipv4Count(afterPhones(t)).cast("long").as("n_ipv4"),
      phoneCount(afterEmails(t)).cast("long").as("n_phones"),
      redact(t).as("redacted"))
  }
}

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

  /** Text after the email + phone + IP passes — stage 3. */
  def afterIps(text: Column): Column = regexp_replace(afterPhones(text), Ipv4Re, "[IP]")

  /** Payment-card CANDIDATES: 13–19 digits with optional single space/dash
    * separators, word-bounded. A candidate becomes `[CARD]` only if it
    * passes the Luhn checksum — format alone is how dates, ids, and
    * tracking numbers would leak into the scrub; format + checksum is the
    * standard card rule (a random digit run still passes at ~10%, the
    * documented residual). */
  val CardRe = "\\b(?:[0-9][ -]?){12,18}[0-9]\\b"

  /** Luhn checksum over a pure digit string: from the RIGHT, odd positions
    * count as-is, even positions doubled with digit-sum; valid iff the
    * total is divisible by 10. Integer-exact on any engine. */
  def luhnValid(digits: Column): Column =
    graft.dedup.Dedup.let(reverse(digits)) { r =>
      aggregate(sequence(lit(1), length(r)), lit(0),
        (acc, i) => {
          val d = substr(r, i, lit(1)).cast("int")
          acc + when(i % 2 === 1, d)
            .otherwise(when(d > 4, d * 2 - 9).otherwise(d * 2))
        }) % 10 === 0
    }

  /** Luhn-validated card literals of a text, LONGEST FIRST (then
    * lexicographic): replacement is by literal, and replacing a shorter
    * valid card that happens to be a substring of a longer one first would
    * corrupt the longer match. */
  def validCards(text: Column): Column =
    array_sort(
      filter(array_distinct(regexp_extract_all(text, lit(CardRe), lit(0))),
        c => luhnValid(regexp_replace(c, "[ -]", ""))),
      (a, b) => when(length(a) =!= length(b), length(b) - length(a))
        .otherwise(when(a < b, -1).when(a > b, 1).otherwise(0)))

  def cardCount(text: Column): Column =
    size(filter(regexp_extract_all(text, lit(CardRe), lit(0)),
      c => luhnValid(regexp_replace(c, "[ -]", ""))))

  /** Stage 4: every Luhn-valid card literal replaced (all occurrences of
    * each validated literal — identical semantics on every engine; in the
    * adversarial case of a valid literal also appearing inside an
    * unmatched digit run, the literal replace takes it too). */
  def afterCards(text: Column): Column =
    graft.dedup.Dedup.let(text) { t =>
      aggregate(validCards(t), t, (acc, c) => call_function("replace", acc, c, lit("[CARD]")))
    }

  /** Typed-placeholder redaction. Order matters and is contractual:
    * emails first (an address may embed digit runs), then phones, then
    * IPs, then Luhn-validated cards — both engines apply the identical
    * sequence. */
  def redact(text: Column): Column = afterCards(afterIps(text))

  /** Per-doc audit report + scrubbed text:
    * `(idCol, n_emails, n_ipv4, n_phones, n_cards, redacted)`.
    *
    * Counts are SEQUENTIAL — each stage counts on the previous stage's
    * output, exactly like the redaction itself — so every count equals the
    * number of placeholders of that type actually emitted, and the audit
    * books always reconcile against the redacted text. (Raw-text counts
    * would not: a phone-shaped digit run inside an email local part, or an
    * IPv4 swallowed by an adjacent phone match, would be counted but never
    * replaced. The one documented exception: `n_cards` counts regex
    * matches, while the literal replace can also take a valid card
    * embedded in an unmatched digit run — adversarial texts only.) */
  def scrub(docs: org.apache.spark.sql.DataFrame,
            idCol: String = "doc_id",
            textCol: String = "text"): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    // conditional fan-out (round 7): five stacked regex passes per row with
    // no downstream aggregation — pure per-row CPU that otherwise runs on
    // the raw scan's single probe-scale partition; no-op at scale
    graft.pipeline.Fanout.fanout(docs, col(idCol)).select(col(idCol),
      emailCount(t).cast("long").as("n_emails"),
      ipv4Count(afterPhones(t)).cast("long").as("n_ipv4"),
      phoneCount(afterEmails(t)).cast("long").as("n_phones"),
      cardCount(afterIps(t)).cast("long").as("n_cards"),
      redact(t).as("redacted"))
  }
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training corpora.
  *
  * Pure per-row regex maps over codegen'd `regexp_count`/`regexp_replace` —
  * no shuffle, no UDF; at 100 TB the cost is exactly one scan with the
  * regex engine as the constant factor. Patterns are deliberately RE2-safe
  * (no backreferences or lookaround) so the same strings run unchanged in
  * DuckDB/RE2-based oracles and in Java's engine with identical match
  * semantics (both scan left-to-right, non-overlapping).
  */
object Pii {

  /** user@host.tld mailbox spans. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style dashed phone numbers (555-123-4567). */
  val PhoneRe: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))

  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Text with every email/phone span replaced by a typed placeholder.
    * Email replacement runs first; the placeholders contain no digits or
    * `@`, so the passes cannot create or destroy each other's matches.
    */
  def scrub(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
}

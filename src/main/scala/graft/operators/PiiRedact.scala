package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass every released training corpus
  * runs (the C4/Dolma treatment): detect emails / IPv4 addresses /
  * US-style phone numbers with conservative regexes, replace each with
  * a typed placeholder token, and keep per-document counts so the
  * redaction is auditable (how much was removed, from where) rather
  * than silent.
  *
  * The patterns deliberately avoid constructs whose semantics differ
  * across regex engines (no lookaround, no backrefs, ASCII classes
  * only), so detection counts AND the redacted text are exactly
  * replayable in DuckDB's RE2 (q196). Email matching is
  * case-insensitive via explicit [A-Za-z] classes (real-world emails
  * are routinely mixed-case; RE2 has no inline (?i) groups in common
  * with Java semantics we want to rely on, so the classes spell it
  * out). 100 TB shape: pure map-side expression work — three
  * codegen'd regex passes per row, no shuffle, no UDF. */
object PiiRedact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** (id, n_emails, n_ips, n_phones, redacted) — each count is taken
    * on the SAME text its pattern is applied to (email on the
    * original, ip on the email-redacted text, phone on the
    * ip-redacted text), so the audit counts always agree with what
    * was actually removed: an earlier substitution can create a word
    * boundary (e.g. `x@y.com192.168.0.1` → `[EMAIL]192.168.0.1`)
    * that lets a later pattern match text the original never exposed.
    * Replacement order (email → ip → phone) is fixed and placeholder
    * tokens never re-match a later pattern. Catalyst keeps the
    * chained projections separate (regexp_replace is not a
    * collapse-cheap expression), so each regex pass runs once. */
  def redact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("n_emails", regexp_count(col(textCol), lit(EmailRe)))
      .withColumn("__t1", regexp_replace(col(textCol), EmailRe, "[EMAIL]"))
      .withColumn("n_ips", regexp_count(col("__t1"), lit(Ipv4Re)))
      .withColumn("__t2", regexp_replace(col("__t1"), Ipv4Re, "[IP]"))
      .withColumn("n_phones", regexp_count(col("__t2"), lit(PhoneRe)))
      .withColumn("redacted", regexp_replace(col("__t2"), PhoneRe, "[PHONE]"))
      .select(col(idCol), col("n_emails"), col("n_ips"), col("n_phones"),
        col("redacted"))
}

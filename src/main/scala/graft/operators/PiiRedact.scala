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
  * replayable in DuckDB's RE2 (q196). 100 TB shape: pure map-side
  * expression work — three codegen'd regex passes per row, no shuffle,
  * no UDF. */
object PiiRedact {

  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** (id, n_emails, n_ips, n_phones, redacted) — counts BEFORE
    * redaction; replacement order (email → ip → phone) is fixed and
    * placeholder tokens never re-match a later pattern. */
  def redact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).as("n_emails"),
      regexp_count(col(textCol), lit(Ipv4Re)).as("n_ips"),
      regexp_count(col(textCol), lit(PhoneRe)).as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col(textCol), EmailRe, "[EMAIL]"),
          Ipv4Re, "[IP]"),
        PhoneRe, "[PHONE]").as("redacted"))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation (SURVEY §2.3
  * north-star family): flag and scrub emails, IPv4 addresses, and
  * NANP-style phone numbers before a corpus ships to training.
  *
  * Pure narrow codegen'd column work — `regexp_count` / `regexp_replace`
  * over each row, no shuffle, no UDF — so the pass is scan-bound at any
  * corpus size and the predicates/projections push into the scan.
  *
  * The patterns deliberately use only syntax with identical semantics in
  * Java regex (Spark) and RE2 (DuckDB): character classes, bounded
  * repetition, word boundaries. No backrefs, no lookaround.
  */
object Pii {

  /** user@host.tld — conservative, no quoting/plus-routing edge cases. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic — does not range-check octets). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style nnn-nnnn local phone token. */
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Per-document PII counts over the raw text:
    * (doc_id, n_emails, n_ips, n_phones, has_pii).
    * Counts are non-overlapping match counts of each pattern against the
    * ORIGINAL text (no scrub interaction between categories).
    */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ne = regexp_count(col(textCol), lit(EmailRe))
    val ni = regexp_count(col(textCol), lit(Ipv4Re))
    val np = regexp_count(col(textCol), lit(PhoneRe))
    df.select(col(idCol).as("doc_id"),
      ne.cast("long").as("n_emails"),
      ni.cast("long").as("n_ips"),
      np.cast("long").as("n_phones"),
      (ne + ni + np > 0).as("has_pii"))
  }

  /** Redaction expression: emails first (their local part may contain
    * dots and digits that the narrower patterns would then mangle), then
    * IPs, then phones.
    */
  def scrubbed(textCol: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(textCol, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Replace `textCol` in place with the scrubbed text, schema otherwise
    * unchanged, so the stage composes with every downstream text op.
    */
  def scrub(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, scrubbed(col(textCol)))
}

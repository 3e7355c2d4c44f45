package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII masking for training corpora — the standard curation stage the
  * public pipelines run before packing (Dolma §2.3 "PII removal",
  * FineWeb's email/IP anonymization; the reference engine has no text
  * curation surface, so this is a beyond-parity operator like the rest
  * of the dedup/quality family).
  *
  * Three SYNTACTIC matchers (emails, IPv4 literals, NANP-style phone
  * numbers) are masked in a FIXED sequence with per-class counts taken
  * on the text each class actually saw:
  *
  *   n_emails on the raw text → mask emails →
  *   n_ipv4 on that          → mask IPs    →
  *   n_phones on that        → mask phones
  *
  * The sequencing is load-bearing twice over. First, overlap: an IPv4-
  * shaped string inside an email's local part ("1.2.3.4@x.org") must
  * count as ONE email and ZERO IPs — counting every class on the raw
  * text would double-count it. Second, engine parity: each count is a
  * pure function of the previous masked text, so the DuckDB oracle can
  * mirror the pipeline CTE-for-CTE and hash-match counts AND masked
  * output.
  *
  * These are Dolma-style syntactic matchers, NOT validators: "999.999.
  * 999.999" masks as an IP (each octet is 1-3 digits), and no attempt
  * is made to verify deliverability or allocation. That is the
  * documented behavior of the public pipelines this mirrors — recall
  * over precision, because a leaked real address costs more than an
  * over-masked token. Patterns stay in the Java-regex ∩ RE2 common
  * subset (no backrefs, no lookaround; `\d`/`\b` are ASCII in both) so
  * the oracle runs them verbatim.
  *
  * Scale shape: one map-side codegen'd projection — no shuffle, no UDF,
  * no driver state; composes into any curation pipeline position.
  */
object Pii {

  /** RFC-5322-ish practical email matcher (the FineWeb shape): dotted
    * local part with common specials, dotted domain, ≥ 2-letter TLD.
    */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** IPv4 literal: four 1-3 digit octets. Word-bounded so versions like
    * "1.2.3.4.5" still match their first four octets (the Dolma rule)
    * but digits inside longer tokens don't.
    */
  val Ipv4Pattern: String = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** NANP-style phone: either `(NNN) NNN-NNNN` (parenthesized area
    * code, optional single space — the most common written US form) or
    * `NNN-NNN-NNNN` with `-` or `.` separators. A separator of SOME
    * form is still REQUIRED (a bare 10-digit run is far likelier to be
    * an id than a phone number in crawl text), but recall-over-
    * precision argues the parenthesized form in: it is unambiguous in
    * prose. The optional space is a literal `[ ]` rather than `\s` —
    * Java's `\s` includes `\x0B`, RE2's does not, and the pattern must
    * mean the same bytes in both engines for oracle parity.
    */
  val PhonePattern: String =
    "(\\(\\d{3}\\) ?|\\b\\d{3}[-.])\\d{3}[-.]\\d{4}\\b"

  val EmailToken = "<EMAIL>"
  val Ipv4Token = "<IP>"
  val PhoneToken = "<PHONE>"

  private def count(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Mask all three classes and count each, sequentially (see object
    * doc for why the order is fixed). Adds `n_emails`, `n_ipv4`,
    * `n_phones`, and `<textCol>_masked`; NULL text yields NULL masked
    * text and 0 counts (nothing was redacted from nothing).
    */
  def maskPii(df: DataFrame, textCol: String): DataFrame = {
    val fresh = Seq("n_emails", "n_ipv4", "n_phones", s"${textCol}_masked")
    fresh.foreach(c => require(!df.columns.contains(c),
      s"Pii.maskPii: input already has a '$c' column; rename it first"))
    val raw = col(textCol)
    val afterEmail = regexp_replace(raw, EmailPattern, EmailToken)
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, Ipv4Token)
    val afterPhone = regexp_replace(afterIp, PhonePattern, PhoneToken)
    df.withColumn("n_emails", coalesce(count(raw, EmailPattern), lit(0L)))
      .withColumn("n_ipv4", coalesce(count(afterEmail, Ipv4Pattern), lit(0L)))
      .withColumn("n_phones", coalesce(count(afterIp, PhonePattern), lit(0L)))
      .withColumn(s"${textCol}_masked", afterPhone)
  }

  /** Drop rows whose PII density crosses `maxPiiHits` (Σ of the three
    * class counts) — the gate form the curation pipelines compose; the
    * masked column rides along for the keepers.
    */
  def filterByPii(df: DataFrame, textCol: String,
      maxPiiHits: Long): DataFrame = {
    require(maxPiiHits >= 0, s"Pii.filterByPii: maxPiiHits must be >= 0")
    maskPii(df, textCol)
      .where(col("n_emails") + col("n_ipv4") + col("n_phones") <= maxPiiHits)
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: emails,
  * IPv4 addresses, and international-format phone numbers, as pure
  * codegen'd column expressions (`regexp_count` / `regexp_replace` —
  * no UDFs, so the scan prunes and the match loop stays inside
  * whole-stage codegen at 100 TB).
  *
  * The patterns are deliberately written in the common subset of Java
  * regex (Spark) and RE2 (DuckDB) — no lookarounds, no backrefs — so
  * the oracle can state the identical patterns and the gate hashes
  * match byte-for-byte.
  */
object Pii {

  /** RFC-ish email: local part, @, dotted domain, ≥2-letter TLD. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic — no octet range check, which would
    * need alternation both dialects support but real scrubbers skip). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** International-ish phone: +CC sep NNN sep NNNN. */
  val PhoneRe = "\\+\\d{1,3}[-. ]\\d{3}[-. ]\\d{4}"

  /** Non-overlapping match counts per category (long-typed, matching
    * the oracle's `len(regexp_extract_all(...))` BIGINT). */
  def emailCount(text: Column): Column =
    regexp_count(text, lit(EmailRe)).cast("long")
  def ipv4Count(text: Column): Column =
    regexp_count(text, lit(Ipv4Re)).cast("long")
  def phoneCount(text: Column): Column =
    regexp_count(text, lit(PhoneRe)).cast("long")

  /** Redacted text: emails → `<EMAIL>`, then IPv4 → `<IP>`, then
    * phones → `<PHONE>`. The chain order is part of the contract; the
    * oracle applies the same chain. (A dotted-quad "domain" is not an
    * email — the TLD must be letters — so `user@10.0.0.1` keeps its
    * local part and redacts the IP.) */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Payment-card-shaped digit run: 13–16 digits with word boundaries
    * (both engines' \b is the ASCII word boundary). Runs of 17+ digits
    * match NOWHERE — no boundary splits them — which is the correct
    * read: those are ids/hashes, not PANs. */
  val CardRe = "\\b\\d{13,16}\\b"

  /** Luhn checksum (ISO/IEC 7812) of a digit string as a pure integer
    * column fold: from the RIGHT, double every second digit, subtract
    * 9 past 9, sum. Each position's contribution is independent, so
    * both engines state it as map-then-sum — no stateful fold. */
  def luhnSum(digits: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(digits)), i => {
        val d = digits.substr(length(digits) - i + 1, lit(1)).cast("int")
        when(i % 2 === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      }),
      lit(0), (acc, x) => acc + x)

  /** Per-doc card-number audit: candidate digit runs vs Luhn-VALID
    * ones — the distinction that separates a real PAN leak (block the
    * doc) from phone-number/id noise (don't). Zero shuffle. */
  def cardStats(text: Column): (Column, Column) = {
    val cands = regexp_extract_all(text, lit(CardRe), lit(0))
    val valid = filter(cands, c => luhnSum(c) % 10 === 0)
    (size(cands).cast("long"), size(valid).cast("long"))
  }

  /** Per-doc PII audit: (doc_id, n_email, n_ip, n_phone, red_len) where
    * red_len is the redacted text length — the monitoring frame a
    * pipeline thresholds on before release. One projection, no shuffle. */
  def piiStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol).as("doc_id"),
      emailCount(t).as("n_email"),
      ipv4Count(t).as("n_ip"),
      phoneCount(t).as("n_phone"),
      length(redact(t)).cast("long").as("red_len"))
  }

  /** Documents with PII scrubbed in place (all other columns kept). */
  def redactDocs(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol, redact(col(textCol)))
}

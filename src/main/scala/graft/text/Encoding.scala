package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake repair for web corpora: UTF-8 text that was decoded as
  * Windows-1252/Latin-1 and re-encoded ("cafÃ©", "â€” dash â€”") is the
  * single most common encoding defect in crawled training data (the
  * problem class ftfy exists for). The fix is a deterministic
  * longest-first replace chain over the high-frequency two- and
  * three-byte UTF-8 sequences whose cp1252 rendering is unambiguous —
  * each entry maps the garbled rendering back to the intended
  * character. Sequences involving cp1252's five undefined bytes
  * (0x81 0x8D 0x8F 0x90 0x9D) are NOT fixable this way (the byte was
  * lost at decode time) and are deliberately absent.
  *
  * Scale posture: the chain compiles to nested `StringReplace`
  * expressions — whole-stage-codegen'd, no UDF, no regex backtracking —
  * and is stated verbatim by a SQL oracle as nested `replace()`.
  */
object Encoding {

  /** (garbled, intended), longest garbled form first so three-byte
    * punctuation ("â€¦") is repaired before any two-byte prefix of it
    * could match. */
  val MojibakeTable: Seq[(String, String)] = Seq(
    // U+20xx punctuation: UTF-8 0xE2 0x80 0xXX read as cp1252
    "â€™" -> "’", // â€™ right single quote
    "â€˜" -> "‘", // â€˜ left single quote
    "â€œ" -> "“", // â€œ left double quote
    "â€“" -> "–", // â€“ en dash
    "â€”" -> "—", // â€” em dash
    "â€¦" -> "…", // â€¦ ellipsis
    "â€¢" -> "•", // â€¢ bullet
    "â„¢" -> "™", // â„¢ trade mark
    "â‚¬" -> "€", // â‚¬ euro sign
    // Latin-1 letters: UTF-8 0xC3 0xXX read as cp1252
    "Ã‰" -> "É", // Ã‰ É
    "Ã–" -> "Ö", // Ã– Ö
    "Ãœ" -> "Ü", // Ãœ Ü
    "Ã¡" -> "á", // Ã¡ á
    "Ã¢" -> "â", // Ã¢ â
    "Ã£" -> "ã", // Ã£ ã
    "Ã¤" -> "ä", // Ã¤ ä
    "Ã§" -> "ç", // Ã§ ç
    "Ã¨" -> "è", // Ã¨ è
    "Ã©" -> "é", // Ã© é
    "Ãª" -> "ê", // Ãª ê
    "Ã«" -> "ë", // Ã« ë
    "Ã­" -> "í", // Ã­ í
    "Ã®" -> "î", // Ã® î
    "Ã¯" -> "ï", // Ã¯ ï
    "Ã±" -> "ñ", // Ã± ñ
    "Ã³" -> "ó", // Ã³ ó
    "Ã´" -> "ô", // Ã´ ô
    "Ã¶" -> "ö", // Ã¶ ö
    "Ãº" -> "ú", // Ãº ú
    "Ã¼" -> "ü", // Ã¼ ü
    // Latin-1 symbols: UTF-8 0xC2 0xXX read as cp1252
    "Â " -> " ", // Â + nbsp → nbsp
    "Â¡" -> "¡", // Â¡ ¡
    "Â«" -> "«", // Â« «
    "Â°" -> "°", // Â° °
    "Â·" -> "·", // Â· ·
    "Â»" -> "»", // Â» »
    "Â¿" -> "¿") // Â¿ ¿

  /** Text with every table entry repaired, applied longest-first. */
  def fixMojibake(text: Column): Column =
    MojibakeTable.foldLeft(text) { case (c, (bad, good)) =>
      replace(c, lit(bad), lit(good))
    }

  /** Characters removed by repair — a cheap, monotone corpus-health
    * signal (0 = clean; each repaired sequence shrinks the text by 1-2
    * chars). Exactly `length(text) - length(fixMojibake(text))`. */
  def mojibakeScore(text: Column): Column =
    length(text) - length(fixMojibake(text))

  /** The same repair chain as DuckDB SQL over `inner` (an expression
    * yielding VARCHAR), for oracle statements. */
  def oracleFixSql(inner: String): String =
    MojibakeTable.foldLeft(inner) { case (s, (bad, good)) =>
      s"replace($s, '${bad}', '${good}')"
    }

  // --- Binary-junk audit: the encoding-damage class mojibake repair
  // can't fix — control characters and U+FFFD replacement chars left
  // by PDF extractors, truncated multi-byte sequences, and binary
  // sniffed as text. Pure codegen'd regexp counts (ASCII-only classes,
  // so Java regex and RE2 agree byte-for-byte); the standard curation
  // gate is n_control = 0 AND n_replacement = 0.

  /** C0 control characters (excluding \t \n \r) + DEL. */
  def controlCount(text: Column): Column =
    (length(text) - length(regexp_replace(text,
      "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""))).cast("long")

  /** U+FFFD replacement characters — each marks a byte sequence some
    * upstream decoder could not interpret. */
  def replacementCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "�", "")))
      .cast("long")

  /** Printable-ASCII character count (0x20-0x7E); with `length`, the
    * printable ratio — the cheap binary-sniff signal. */
  def printableAsciiCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\x20-\\x7e]", "")))
      .cast("long")
}

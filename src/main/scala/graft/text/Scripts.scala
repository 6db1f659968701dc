package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode-script detection for multilingual corpus curation — the
  * signal that routes documents to per-script pipelines (tokenizer
  * choice, lang-ID prior, CJK-aware segmentation) and catches
  * mojibake (a "German" doc that is 40 % Cyrillic is mis-encoded).
  *
  * Counts are per-script CHARACTER counts over explicit code-point
  * ranges — integer-exact, stated as `[\x{…}-\x{…}]` classes that
  * parse identically in Java regex (Spark codegen) and RE2 (DuckDB),
  * so the q134 oracle interpolates THESE constants verbatim. Ranges
  * are fixed blocks, not Unicode property classes (`\p{Latin}` spells
  * differently across engines); the definition is the contract.
  *
  * Dominant script = highest count, ties → first table entry (an
  * all-digit doc is "latin" by convention). Everything is a column
  * expression — no UDFs, embarrassingly parallel at 100 TB.
  */
object Scripts {

  /** (name, regex character class) in PRIORITY ORDER — the tiebreak
    * for [[dominantScript]]. Latin includes the Latin-1/Extended
    * letter blocks (the full 00C0–024F range; the two arithmetic
    * signs inside it are part of the defined contract). */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "cjk" -> "[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}]",
    "hangul" -> "[\\x{AC00}-\\x{D7AF}]")

  /** Per-script character count columns, named `n_<script>`. */
  def scriptCountCols(text: Column): Seq[Column] =
    ScriptRanges.map { case (name, re) =>
      regexp_count(text, lit(re)).cast("long").as(s"n_$name")
    }

  /** Dominant script by (count desc, table order asc) — computed from
    * the SAME count expressions, as one `greatest` over (count,
    * −index, name) structs (struct comparison: higher count wins,
    * ties → lower index). */
  def dominantScript(text: Column): Column = {
    val entries = ScriptRanges.zipWithIndex.map { case ((name, re), i) =>
      struct(regexp_count(text, lit(re)).cast("long").as("c"),
        lit(-i).as("negord"), lit(name).as("nm"))
    }
    greatest(entries: _*).getField("nm")
  }

  /** (id, n_<script>…, n_chars, dominant) per document — the q134
    * shape. */
  def scriptProfile(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(
      Seq(col(idCol).as("id")) ++
        scriptCountCols(col(textCol)) ++
        Seq(length(col(textCol)).cast("long").as("n_chars"),
          dominantScript(col(textCol)).as("dominant")): _*)
}

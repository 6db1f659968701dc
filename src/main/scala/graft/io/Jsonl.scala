package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-validated JSONL corpus ingest with QUARANTINE routing — the
  * defensive front door of every "docs arrive as one JSON object per
  * line" pipeline: malformed lines and schema violations must neither
  * kill the job (FAILFAST) nor silently become null-filled rows
  * (naive PERMISSIVE); they go to a quarantine lane carrying the raw
  * line, so the producer can be debugged and NOTHING is dropped —
  * ok-count + quarantined-count always equals input lines.
  *
  * Pure column expressions (`from_json` PERMISSIVE + the corrupt-record
  * column + required-field null checks): codegen, no UDFs, trivially
  * parallel. */
object Jsonl {

  /** Parse a JSONL line column against `schema`. A line is `ok` when it
    * parses AND every `required` field is non-null (PERMISSIVE parsing
    * turns a well-formed line of the wrong shape into nulls — the
    * null check catches what the corrupt-record column cannot).
    * Returns the schema's fields + (ok BOOLEAN, raw STRING — the
    * original line, null when ok so the wide column dies at the
    * first projection for the 99.9 % good path). */
  def parseWithQuarantine(lines: DataFrame, schema: StructType,
      required: Seq[String], lineCol: String = "line"): DataFrame = {
    // Collision-free corrupt-record field: the caller's schema may
    // itself contain `_corrupt` (plausible when re-ingesting previously
    // quarantined output) — schema.add would then produce a duplicate
    // field and from_json behavior becomes ambiguous. Derive an unused
    // name instead of assuming one.
    val corrupt = LazyList.from(0).map {
      case 0 => "_corrupt"
      case i => s"_corrupt$i"
    }.find(n => !schema.fieldNames.contains(n)).get
    val full = schema.add(corrupt, "string")
    val parsed = lines.withColumn("__p",
      from_json(col(lineCol), full,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> corrupt)))
    val ok = col("__p").isNotNull &&
      col("__p").getField(corrupt).isNull &&
      required.map(f => col(s"__p.$f").isNotNull)
        .foldLeft(lit(true))(_ && _)
    parsed.select(
      schema.fields.map(f => col(s"__p.${f.name}").as(f.name)).toIndexedSeq :+
        ok.as("ok") :+
        when(!ok, col(lineCol)).otherwise(lit(null).cast("string"))
          .as("raw"): _*)
  }

  /** Split a [[parseWithQuarantine]] result into the good frame (schema
    * columns only) and the quarantine frame (raw lines). */
  def route(parsed: DataFrame): (DataFrame, DataFrame) =
    (parsed.filter(col("ok")).drop("ok", "raw"),
      parsed.filter(!col("ok")).select(col("raw")))
}

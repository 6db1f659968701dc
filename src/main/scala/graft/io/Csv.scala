package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-validated CSV-line ingest with QUARANTINE routing — the
  * [[Jsonl]] discipline for the other line-delimited wire format a
  * crawl/export pipeline receives. Malformed lines (bad types, broken
  * quoting) and schema violations (missing required fields — a short
  * row null-fills in PERMISSIVE and is NOT marked corrupt, which is
  * exactly what the required-null check exists to catch) route to a
  * quarantine lane carrying the raw line; ok + quarantined always
  * equals input lines. Pure `from_csv` column expressions — codegen,
  * no UDFs. */
object Csv {

  /** Parse a CSV line column against `schema`; `options` pass through
    * to the CSV parser (sep, nullValue, ...). Returns the schema's
    * fields + (ok BOOLEAN, raw STRING — null when ok). */
  def parseWithQuarantine(lines: DataFrame, schema: StructType,
      required: Seq[String], lineCol: String = "line",
      options: Map[String, String] = Map.empty): DataFrame = {
    // Collision-free corrupt-record field (the Jsonl discipline).
    val corrupt = LazyList.from(0).map {
      case 0 => "_corrupt"
      case i => s"_corrupt$i"
    }.find(n => !schema.fieldNames.contains(n)).get
    val full = schema.add(corrupt, "string")
    // Empty-field policy (PINNED BEHAVIOR, verified empirically): an
    // unquoted empty field ("a,,b" or a trailing "a,b,") parses as
    // NULL for every type INCLUDING string, and no nullValue/
    // emptyValue option changes that (univocity returns null before
    // either applies). A field listed in `required` therefore treats
    // EMPTY as MISSING and quarantines the row — producers who mean
    // "present but empty" must quote the field. Oracle predictions
    // over synthesized lines must encode the same rule (see the
    // q211 gate SQL).
    val parsed = lines.withColumn("__p",
      from_csv(col(lineCol), full,
        options ++ Map("mode" -> "PERMISSIVE",
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

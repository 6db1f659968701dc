package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit — the pre-training gate a
  * 100 TB corpus pipeline runs before anything trains on the data:
  * referential integrity, key uniqueness, null-rate and predicate
  * checks, each returning a violation COUNT (0 = constraint holds).
  *
  * Every check is one anti-join or one aggregation; the audit unions
  * the scalar results, so the whole battery is a handful of
  * short-circuiting jobs with tiny outputs. Nothing collects row-level
  * violations by default (at scale that's a report, not a gate) —
  * [[fkViolations]] exposes the offending rows when a check fails.
  */
object Quality {

  /** Rows of `child` whose `childKey` has no match in `parent` —
    * referential-integrity violations (NULL keys are orphans too,
    * matching SQL NOT IN semantics would hide them). */
  def fkViolations(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey)).distinct(),
      child(childKey) === col(parentKey), "left_anti")

  /** One named scalar check result. */
  private def asCheck(name: String, count: Column, df: DataFrame): DataFrame =
    df.agg(count.cast("long").as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** Count of `child` rows violating the FK into `parent`. */
  def fkCheck(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    asCheck(name, count(lit(1)),
      fkViolations(child, childKey, parent, parentKey))

  /** Count of EXTRA rows beyond one per key (0 = column is unique). */
  def uniqueCheck(name: String, df: DataFrame, keyCols: Seq[String]): DataFrame =
    asCheck(name, coalesce(sum(col("cnt") - 1), lit(0L)),
      df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 1))

  /** Count of NULLs in a column. */
  def notNullCheck(name: String, df: DataFrame, c: String): DataFrame =
    asCheck(name, count(when(col(c).isNull, 1)), df)

  /** Count of rows FAILING an arbitrary row predicate. */
  def predicateCheck(name: String, df: DataFrame, holds: Column): DataFrame =
    asCheck(name, count(when(!holds, 1)), df)

  /** Union a battery of checks into one (check_name, n_violations)
    * report frame. */
  def audit(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity auditing and enforcement over
  * quasi-identifier (QI) column sets — the release-gate a corpus with
  * person-adjacent metadata needs before it ships (Sweeney 2002;
  * Machanavajjhala et al. 2007 for l-diversity). Complements
  * [[graft.text.Pii]] (content-level redaction): Pii scrubs what a row
  * SAYS, this audits what a row's keys REVEAL by combination.
  *
  * Scale shape: everything is ONE hash aggregate over the QI columns
  * (map-side partial combine, shuffle bounded by |distinct QI combos|,
  * never by row count) — the same plan Spark gives a groupBy-count.
  * Enforcement ([[suppressSmallGroups]]) is an equi-join of the corpus
  * against the violating-combo frame on the QI columns; the violating
  * frame is usually tiny (it is the audit's point) but the join is a
  * plain shuffled equi-join either way, so nothing breaks when it
  * is not.
  */
object Privacy {

  private def qi(qiCols: Seq[String]): Seq[Column] = qiCols.map(col)

  /** Per-QI-combination audit row: (qi..., group_n, n_sensitive) for
    * every combination VIOLATING k-anonymity (group_n < k) or
    * l-diversity (n_sensitive < l, distinct sensitive values in the
    * group). `l = 1` disables the diversity test (every nonempty group
    * has ≥ 1). NULL QI values group together (SQL GROUP BY semantics) —
    * a null combo is an equivalence class like any other. */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int = 1): DataFrame = {
    require(k >= 1 && l >= 1, s"bad thresholds k=$k l=$l")
    df.groupBy(qi(qiCols): _*)
      .agg(count(lit(1)).as("group_n"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .filter(col("group_n") < k || col("n_sensitive") < l)
  }

  /** One-row release summary: (n_groups, n_violating, rows_at_risk,
    * min_group_n) — the number a data card publishes ("k-anonymous at
    * k = …"). `rows_at_risk` counts rows in sub-k groups; `min_group_n`
    * IS the dataset's achieved k. */
  def kAnonymitySummary(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int = 1): DataFrame = {
    require(k >= 1 && l >= 1, s"bad thresholds k=$k l=$l")
    df.groupBy(qi(qiCols): _*)
      .agg(count(lit(1)).as("group_n"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("group_n") < k || col("n_sensitive") < l, 1L)
          .otherwise(0L)).as("n_violating"),
        sum(when(col("group_n") < k, col("group_n")).otherwise(0L))
          .as("rows_at_risk"),
        min(col("group_n")).as("min_group_n"))
  }

  /** Enforcement by suppression: drop every row whose QI combination
    * has fewer than k rows — the standard cell-suppression step that
    * makes the REMAINDER k-anonymous (each surviving combo kept ≥ k
    * rows by construction). Generalization (coarsening a QI column
    * before re-auditing) is the caller's transform; this is the final
    * gate after it. */
  def suppressSmallGroups(df: DataFrame, qiCols: Seq[String],
      k: Int): DataFrame = {
    require(k >= 1, s"bad threshold k=$k")
    val small = df.groupBy(qi(qiCols): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") < k)
      .select(qiCols.map(c => col(c).as(s"__$c")): _*)
    // Null-SAFE anti-join: GROUP BY put null QI combos in one class, so
    // the suppression join must match them too (a bare equi-anti-join
    // would silently retain every null-keyed row).
    val cond = qiCols.map(c => col(c) <=> col(s"__$c")).reduce(_ && _)
    df.join(small, cond, "left_anti")
  }
}

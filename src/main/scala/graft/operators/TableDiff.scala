package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic keyed DIFF of two DataFrames — "what changed between these
  * two snapshots/corpus versions": one full-outer hash join on the key
  * columns, rows classified `added` / `removed` / `changed` (identical
  * rows are dropped; emitting them would make the diff as big as the
  * inputs, which defeats its purpose at 100 TB).
  *
  * The net-spider use: diff two woven snapshots (same graph, two query
  * intervals) to answer "which links appeared / vanished / re-routed
  * between week 1 and week 2" (the reference can only materialize each
  * snapshot separately — `getSnapshot` at two intervals — and leaves
  * the comparison to the user). The pipeline use: corpus-version diffs
  * before retraining.
  */
object TableDiff {

  /** Returns (keys..., change, then for each compared column `c`:
    * `c_old`, `c_new`). `before`/`after` must share the schema on
    * `keys ++ compare`; keys are assumed unique per side (pre-aggregate
    * otherwise — asserted per key via the join's multiplicity only at
    * spec level, not at runtime). */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String],
      compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compare.nonEmpty, "need keys and compare columns")
    val b = before.select((keys ++ compare).map(col): _*)
      .withColumn("__b", lit(1))
    val a = after.select(keys.map(col) ++
      compare.map(c => col(c).as(s"__a_$c")): _*)
      .withColumn("__a", lit(1))
    val joined = b.join(a, keys, "full_outer")
    val changed = compare.map(c =>
      !(col(c) <=> col(s"__a_$c"))).reduce(_ || _)
    val change = when(col("__b").isNull, "added")
      .when(col("__a").isNull, "removed")
      .when(changed, "changed")
    joined
      .withColumn("change", change)
      .filter(col("change").isNotNull) // identical rows drop out
      .select(keys.map(col) ++ Seq(col("change")) ++ compare.flatMap(c =>
        Seq(col(c).as(s"${c}_old"), col(s"__a_$c").as(s"${c}_new"))): _*)
  }
}

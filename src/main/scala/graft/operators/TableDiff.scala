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

  /** CONTENT-ADDRESSED corpus version diff — the dataset-release view
    * keyed by what the bytes say, not what the id says (a plain keyed
    * [[diff]] calls a re-keyed document "removed + added"; release
    * notes must not). Every id of either version classifies as:
    *
    *  - `retained`  — same id, same content hash in both versions;
    *  - `edited`    — id in both, content changed;
    *  - `moved_in`  / `moved_out` — the content exists on the other
    *    side under a DIFFERENT id only (re-keying, shard moves);
    *  - `added` / `removed` — content hash on one side only.
    *
    * Returns (id, status, content_md5). Duplicate content across
    * different ids makes `moved_*` an over-approximation (any matching
    * hash on the other side counts) — dedup first when that matters.
    * Scale shape: one full-outer id join + two hash-set left joins,
    * all equi-joins on id/hash keys; nothing wider than (id, hash)
    * shuffles. */
  def contentDiff(before: DataFrame, after: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val b = before.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("bh"))
    val a = after.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("ah"))
    val bH = b.select(col("bh").as("h")).distinct()
    val aH = a.select(col("ah").as("h")).distinct()
    val j = b.join(a, Seq("id"), "full_outer")
    val withB = j.join(
      aH.select(col("h").as("bh"), lit(true).as("__bhInA")), Seq("bh"),
      "left")
    val withA = withB.join(
      bH.select(col("h").as("ah"), lit(true).as("__ahInB")), Seq("ah"),
      "left")
    withA.select(col("id"),
      when(col("bh").isNotNull && col("ah").isNotNull &&
          col("bh") === col("ah"), "retained")
        .when(col("bh").isNotNull && col("ah").isNotNull, "edited")
        .when(col("ah").isNotNull &&
          coalesce(col("__ahInB"), lit(false)), "moved_in")
        .when(col("ah").isNotNull, "added")
        .when(coalesce(col("__bhInA"), lit(false)), "moved_out")
        .otherwise("removed").as("status"),
      coalesce(col("ah"), col("bh")).as("content_md5"))
  }
}

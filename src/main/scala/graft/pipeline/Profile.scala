package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling — the "describe my 100 TB table without reading it
  * N times" operator every ingest pipeline fronts with: per-column null
  * and exact distinct counts in ONE pass. Spark plans the multi-column
  * distinct aggregation with a single Expand (each row fans out once per
  * counted column) — one scan, one shuffle, regardless of how many
  * columns are profiled; never a per-column job loop.
  */
object Profile {

  /** Long-format profile of `cols`: (col_name, n_rows, n_nulls,
    * n_distinct) — n_distinct excludes nulls (count distinct
    * semantics shared by Spark and ANSI SQL). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    row.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_nulls"),
        col("p.n_distinct"))
  }
}

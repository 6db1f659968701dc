package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence FUNNEL analysis: for each key, the first time it
  * performed stage 1, then the first stage-2 event strictly after that,
  * and so on — the "view → click → purchase" conversion query.
  *
  * Each stage is one aggregation over the events of THAT stage's type
  * only (the type filter pushes to the scan), joined against the
  * shrinking per-key stage frame — k stages cost k pruned scans + k
  * per-key-sized shuffles, never a per-key sort of the full event
  * stream. Keys that never perform stage 1 are not in the funnel and
  * not in the output. */
object Funnel {

  /** Returns one row per key that entered the funnel:
    * (key, <stage>_ms per stage — null once the chain breaks,
    * funnel_stage = number of stages completed in order). */
  def funnel(events: DataFrame, stages: Seq[String],
      keyCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ms"): DataFrame = {
    require(stages.nonEmpty, "empty funnel")
    require(stages.distinct == stages, "duplicate funnel stages")
    val s0 = stages.head
    var cur = events.filter(col(typeCol) === s0)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as(s"${s0}_ms"))
    var prev = s"${s0}_ms"
    var done = List(s"${s0}_ms")
    for (sk <- stages.tail) {
      val evk = events.filter(col(typeCol) === sk)
        .select(col(keyCol), col(tsCol))
      cur = evk.join(cur, Seq(keyCol), "right")
        .groupBy((keyCol :: done.reverse).map(col): _*)
        .agg(min(when(col(tsCol) > col(prev), col(tsCol))).as(s"${sk}_ms"))
      prev = s"${sk}_ms"
      done = s"${sk}_ms" :: done
    }
    var fs: Column = lit(0L)
    for ((sk, i) <- stages.zipWithIndex)
      fs = when(col(s"${sk}_ms").isNotNull, lit((i + 1).toLong)).otherwise(fs)
    cur.withColumn("funnel_stage", fs)
  }
}

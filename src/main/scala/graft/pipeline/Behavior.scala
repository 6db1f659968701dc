package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics over the (user, ts, event_type) stream:
  * session transition matrices and cohort retention — the two classic
  * product-analytics aggregations downstream of sessionization.
  *
  * Both are one-partitioned-window / one-aggregation plans keyed by
  * user: at 100 TB the only exchange is the per-user hash partition,
  * outputs are tiny (|types|² and weeks² rows respectively).
  */
object Behavior {

  /** Event-type TRANSITION MATRIX within sessions: counts of
    * (prev_type → next_type) steps, where a session breaks after
    * `gapMs` of inactivity (same split rule as the sessionizer).
    * Input needs (userCol, msCol, typeCol) plus a deterministic
    * tie-break column `seqCol` for simultaneous events. */
  def transitions(events: DataFrame, gapMs: Long = 1800000L,
      userCol: String = "user_id", msCol: String = "epoch_ms",
      typeCol: String = "event_type", seqCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(msCol), col(seqCol))
    events
      .withColumn("__prev_ms", lag(col(msCol), 1).over(w))
      .withColumn("__prev_type", lag(col(typeCol), 1).over(w))
      // a step exists only within one session: same user, gap ≤ gapMs
      .filter(col("__prev_ms").isNotNull &&
        col(msCol) - col("__prev_ms") <= gapMs)
      .groupBy(col("__prev_type").as("prev_type"),
        col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n_steps"))
  }

  /** DEBOUNCE (alert/telemetry dedup): keep only the FIRST event of
    * each burst per (key, kind) — a new burst starts when the gap from
    * the previous event of the same (key, kind) exceeds `gapMs`. The
    * burst structure is the chained-gap rule (each event extends its
    * burst), so this is island detection, not a fixed-window rounding:
    * a steady drizzle every gapMs−1 suppresses into ONE row however
    * long it lasts. One partitioned sort on (key, kind). */
  def debounce(events: DataFrame, gapMs: Long = 300000L,
      keyCols: Seq[String] = Seq("user_id", "event_type"),
      msCol: String = "epoch_ms", seqCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(msCol), col(seqCol))
    events
      .withColumn("__prev", lag(col(msCol), 1).over(w))
      .filter(col("__prev").isNull || col(msCol) - col("__prev") > gapMs)
      .drop("__prev")
  }

  /** COHORT RETENTION: users grouped by the epoch-week of their first
    * event; for each (cohort_week, week_offset ≥ 0), the number of
    * distinct cohort users active in that later week. Weeks are epoch
    * weeks (floor(ms / 7d) — timezone-free, oracle-exact). The first
    * week itself appears as offset 0 (= cohort size). */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      msCol: String = "epoch_ms"): DataFrame = {
    val weekMs = 604800000L
    val byUserWeek = events
      .select(col(userCol).as("user"),
        // floor division (oracle `//` parity, correct for negative ms)
        graft.time.Buckets.floorDiv(msCol, weekMs).as("week"))
      .distinct()
    val firstWeek = byUserWeek.groupBy(col("user"))
      .agg(min(col("week")).as("cohort_week"))
    byUserWeek.join(firstWeek, Seq("user"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}

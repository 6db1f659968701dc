package graft.tools
// Dev-only STREAMING STATE-STORE scale probe (round-15 verdict item
// 6): StreamingSpec proves micro-batch SEMANTICS on 6-event
// MemoryStreams; nothing measured whether operator state stays
// BOUNDED under watermark expiry when a real event volume flows
// through many micro-batches — the failure mode a 100 TB deployment
// actually dies of (a bare dropDuplicates whose key set grows
// forever; a session store that never closes). This main drives ~1 M
// events through dedupDocStream and sessionizeStream across ~100
// micro-batches, samples the state store's numRowsTotal /
// memoryUsedBytes from every batch's StreamingQueryProgress, and
// writes BENCH_STREAM.json. The boundedness verdict is computed HERE
// (exit 1 on failure) so the artifact is self-gating:
//   bounded := end-of-run state rows <= 1.5x the one-third-point rows
//              (steady state, not monotone growth)
//              AND peak rows < half the total distinct keys fed
//              (expiry really discards — an unbounded store holds
//              every key it ever saw)
//              AND some rows were actually REMOVED by expiry.
//
// Usage: Test/runMain graft.tools.StreamProbe [batches] [perBatch] [out.json]

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery}

import graft.streaming.StreamingIngest

object StreamProbe {

  /** One per-batch observation of the query's (only) state operator. */
  final case class Obs(batch: Int, rows: Long, bytes: Long, removed: Long)

  def observe(q: StreamingQuery, batch: Int): Option[Obs] = {
    val p = q.lastProgress
    if (p == null || p.stateOperators.isEmpty) None
    else {
      val s = p.stateOperators(0)
      Some(Obs(batch, s.numRowsTotal, s.memoryUsedBytes, s.numRowsRemoved))
    }
  }

  /** Boundedness rule (documented in the header). `distinctKeys` is
    * the number of distinct state keys the feed produced overall —
    * what an unbounded store would end up holding. */
  def verdict(obs: Seq[Obs], distinctKeys: Long): (Boolean, String) = {
    if (obs.isEmpty) return (false, "no state observations")
    val third = obs(obs.length / 3).rows.max(1L)
    val end = obs.last.rows
    val peak = obs.map(_.rows).max
    val removed = obs.map(_.removed).sum
    val steady = end <= (1.5 * third).toLong + 16
    val discards = peak < distinctKeys / 2
    val expired = removed > 0
    (steady && discards && expired,
      s"end=$end third=$third peak=$peak removed=$removed " +
        s"distinct=$distinctKeys steady=$steady discards=$discards " +
        s"expired=$expired")
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(100)
    val perBatch = if (args.length > 1) args(1).toInt else 10000
    val out = if (args.length > 2) args(2) else "BENCH_STREAM.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var rc = 0

    def record(name: String, obs: Seq[Obs], distinct: Long,
        events: Long, sec: Double): Unit = {
      val (ok, why) = verdict(obs, distinct)
      if (!ok) rc = 1
      // sample ~20 evenly-spaced rows points so the artifact stays small
      val step = math.max(1, obs.length / 20)
      val series = obs.grouped(step).map(_.last)
        .map(o => s"[${o.batch},${o.rows}]").mkString("[", ",", "]")
      results(name) =
        s"""{"events":$events,"distinct_keys":$distinct,""" +
          s""""rows_series":$series,"rows_end":${obs.last.rows},""" +
          s""""rows_peak":${obs.map(_.rows).max},""" +
          s""""bytes_peak":${obs.map(_.bytes).max},""" +
          s""""removed":${obs.map(_.removed).sum},""" +
          s""""sec":${math.round(sec * 100) / 100.0},""" +
          s""""bounded":$ok,"why":"$why"}"""
      println(s"PROBE $name: bounded=$ok $why (${math.round(sec)} s)")
    }

    // ---- dedupDocStream: exact content dedup, 10-minute watermark.
    // Batch i spans minute i; each batch carries perBatch docs over
    // perBatch/2 distinct texts (50% in-batch duplicates). Keys live
    // ~10 minutes => steady state ~10 * perBatch/2 rows; an unbounded
    // store would hold batches * perBatch/2.
    locally {
      val input = MemoryStream[(Long, String, Long)]
      val q = StreamingIngest.dedupDocStream(
          input.toDF().toDF("doc_id", "text", "epoch_ms"),
          watermark = "10 minutes")
        .writeStream.format("noop")
        .outputMode(OutputMode.Append()).start()
      val obs = Vector.newBuilder[Obs]
      val t0 = System.nanoTime()
      try {
        for (i <- 0 until batches) {
          val base = i.toLong * 60000L
          input.addData((0 until perBatch).map { j =>
            val id = i.toLong * perBatch + j
            (id, s"document text number ${i}_${j / 2}",
              base + j % 60000)
          })
          q.processAllAvailable()
          observe(q, i).foreach(obs += _)
        }
      } finally q.stop()
      record("dedup", obs.result(),
        distinct = batches.toLong * (perBatch / 2),
        events = batches.toLong * perBatch,
        sec = (System.nanoTime() - t0) / 1e9)
    }

    // ---- sessionizeStream: 2-minute gap/watermark session windows.
    // Batch i spans minute i and draws its users from a SLIDING window
    // [i*step, i*step + activeUsers): a user stays active for 4
    // batches (its session keeps extending), then disappears and the
    // watermark closes+expires the session. Open sessions are bounded
    // by activeUsers; an unbounded store would hold every user ever.
    locally {
      val activeUsers = math.max(perBatch / 5, 10)
      val step = activeUsers / 4
      val input = MemoryStream[(String, Long)]
      val q = StreamingIngest.sessionizeStream(
          input.toDF().toDF("user_id", "epoch_ms"),
          gap = "2 minutes", watermark = "2 minutes")
        .writeStream.format("noop")
        .outputMode(OutputMode.Append()).start()
      val obs = Vector.newBuilder[Obs]
      val t0 = System.nanoTime()
      try {
        for (i <- 0 until batches) {
          val base = i.toLong * 60000L
          input.addData((0 until perBatch).map { j =>
            val u = i.toLong * step + j % activeUsers
            (s"u$u", base + j % 60000)
          })
          q.processAllAvailable()
          observe(q, i).foreach(obs += _)
        }
      } finally q.stop()
      record("sessionize", obs.result(),
        distinct = (batches.toLong - 1) * step + activeUsers,
        events = batches.toLong * perBatch,
        sec = (System.nanoTime() - t0) / 1e9)
    }

    val json = s"""{"batches":$batches,"per_batch":$perBatch,""" +
      s""""note":"per-batch state-store telemetry from """ +
      s"""StreamingQueryProgress.stateOperators at local[$cpus]; """ +
      s"""'bounded' computed by StreamProbe.verdict (exit 1 on fail)",""" +
      s""""ops":{${results.map { case (k, v) => s""""$k":$v""" }
        .mkString(",")}}}"""
    println("RESULT " + json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    spark.stop()
    if (rc != 0) sys.exit(rc)
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingIngest
import graft.tools.StreamProbe

/** STATE-STORE BOUNDEDNESS under watermark expiry (round-15 verdict
  * item 6) — the in-suite twin of the committed large-volume probe
  * (`graft.tools.StreamProbe` → BENCH_STREAM.json, ~1 M events / ~100
  * micro-batches). StreamingSpec pins what the operators EMIT; this
  * spec pins what they RETAIN: the dedup hash set and the session
  * store must reach a watermark-sized steady state and actually expire
  * rows — the difference between `dropDuplicatesWithinWatermark` and a
  * bare `dropDuplicates` is invisible to any output assertion and
  * only shows here. Uses the probe's own verdict rule so the spec and
  * the artifact can never drift apart. */
class StreamStateSpec extends SparkSpec {

  it("dedupDocStream state reaches a watermark-bounded steady state " +
      "and expires old content hashes") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val batches = 12
    val perBatch = 200 // 100 distinct texts per batch (50% in-batch dups)
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamingIngest.dedupDocStream(
        input.toDF().toDF("doc_id", "text", "epoch_ms"),
        watermark = "2 minutes")
      .writeStream.format("noop")
      .outputMode(OutputMode.Append()).start()
    val obs = Vector.newBuilder[StreamProbe.Obs]
    try {
      for (i <- 0 until batches) {
        val base = i.toLong * 60000L // batch i spans minute i
        input.addData((0 until perBatch).map { j =>
          (i.toLong * perBatch + j, s"text ${i}_${j / 2}", base + j)
        })
        q.processAllAvailable()
        StreamProbe.observe(q, i).foreach(obs += _)
      }
    } finally q.stop()
    val series = obs.result()
    val (ok, why) = StreamProbe.verdict(series,
      distinctKeys = batches.toLong * (perBatch / 2))
    withClue(why) { ok shouldBe true }
    // the leak twin: a store that held every key ever seen would end
    // at ~1200 rows; the watermark keeps it at the ~2-minute horizon
    series.last.rows should be < (batches.toLong * (perBatch / 2)) / 2
  }

  it("sessionizeStream closes and expires sessions once users go " +
      "quiet past the watermark (open sessions bound the store)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val batches = 12
    val activeUsers = 40
    val step = 10 // users slide: each is active for 4 batches, then gone
    val input = MemoryStream[(String, Long)]
    val q = StreamingIngest.sessionizeStream(
        input.toDF().toDF("user_id", "epoch_ms"),
        gap = "2 minutes", watermark = "2 minutes")
      .writeStream.format("noop")
      .outputMode(OutputMode.Append()).start()
    val obs = Vector.newBuilder[StreamProbe.Obs]
    try {
      for (i <- 0 until batches) {
        val base = i.toLong * 60000L
        input.addData((0 until 200).map { j =>
          (s"u${i * step + j % activeUsers}", base + j)
        })
        q.processAllAvailable()
        StreamProbe.observe(q, i).foreach(obs += _)
      }
    } finally q.stop()
    val series = obs.result()
    val (ok, why) = StreamProbe.verdict(series,
      distinctKeys = (batches.toLong - 1) * step + activeUsers)
    withClue(why) { ok shouldBe true }
  }
}

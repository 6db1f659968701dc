package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.model.FoundNode
import graft.streaming.StreamingIngest

/** Streaming ingestion: incremental latest-per-node state and windowed
  * counts driven through MemoryStream micro-batches. */
class StreamingSpec extends SparkSpec {

  private def fn(subject: String, ms: Long, seq: Long) =
    FoundNode(subject, ms, Map.empty, Nil, seq)

  it("latestPerNode maintains keyed state across micro-batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[FoundNode]
    val q = StreamingIngest.latestPerNode(input.toDS())
      .writeStream.format("memory").queryName("latest_t1")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(fn("n1", 100, 1), fn("n2", 50, 2))
      q.processAllAvailable()
      // older finding for n1 must NOT regress the state
      input.addData(fn("n1", 80, 3), fn("n2", 200, 4))
      q.processAllAvailable()
      val rows = spark.table("latest_t1")
        .groupBy("subject").agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.struct($"epochMs", $"findingSeq")).as("m"))
        .select($"subject", $"m.epochMs")
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      rows shouldBe Seq(("n1", 100L), ("n2", 200L))
    } finally q.stop()
  }

  it("findingCounts windows by event time with watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[FoundNode]
    val q = StreamingIngest.findingCounts(input.toDS(), "1 minute", "10 minutes")
      .writeStream.format("memory").queryName("counts_t1")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(fn("n1", 0, 1), fn("n1", 30000, 2), fn("n1", 65000, 3))
      q.processAllAvailable()
      val rows = spark.table("counts_t1")
        .select($"subject", $"n_findings")
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      // window [0,1min): 2 findings; [1min,2min): 1
      rows should contain allOf (("n1", 2L), ("n1", 1L))
    } finally q.stop()
  }

  it("unifiedLinkUpdates emits only winner changes per pair") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import graft.model.FoundLink
    def fnl(subject: String, ms: Long, seq: Long, target: String, state: String) =
      FoundNode(subject, ms, Map.empty,
        Seq(FoundLink(target, state, Map.empty)), seq)
    val input = MemoryStream[FoundNode]
    val q = StreamingIngest.unifiedLinkUpdates(input.toDS())
      .writeStream.format("memory").queryName("unify_t1")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(fnl("n1", 100, 1, "n2", "to_target"))
      q.processAllAvailable()
      // an OLDER observation of the same pair must emit nothing new
      input.addData(fnl("n2", 50, 2, "n1", "to_subject"))
      q.processAllAvailable()
      // a NEWER empty-ish (unused) observation wins and is emitted
      input.addData(fnl("n2", 200, 3, "n1", "unused"))
      q.processAllAvailable()
      val rows = spark.table("unify_t1")
        .select($"subject", $"linkState", $"epochMs")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      rows shouldBe Seq(("n1", "to_target", 100L), ("n2", "unused", 200L))
    } finally q.stop()
  }

  it("dedupDocStream drops same-content docs within the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamingIngest.dedupDocStream(
        input.toDF().toDF("doc_id", "text", "epoch_ms"))
      .writeStream.format("memory").queryName("dedup_t1")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "same words here", 1000L),
        (2L, "Same   WORDS here", 2000L), // same token stream → dup
        (3L, "different entirely", 3000L))
      q.processAllAvailable()
      // duplicate arriving in a LATER batch inside the watermark
      input.addData((4L, "same words here", 4000L))
      q.processAllAvailable()
      val ids = spark.table("dedup_t1").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      ids shouldBe Seq(1L, 3L)
    } finally q.stop()
  }

  it("combineStreams joins DIO/DAO per node within the time tolerance") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dio = MemoryStream[(String, Long, Long)]
    val dao = MemoryStream[(String, Long, Long)]
    val q = StreamingIngest.combineStreams(
        dio.toDF().toDF("subject", "epoch_ms", "finding_seq"),
        dao.toDF().toDF("subject", "epoch_ms", "finding_seq"),
        watermark = "10 minutes", tolerance = "5 minutes")
      .writeStream.format("memory").queryName("combine_t1")
      .outputMode(OutputMode.Append()).start()
    try {
      dio.addData(("n1", 60000L, 1L), ("n2", 60000L, 2L))
      // n1's DAO within 5 min → joins; n2's DAO 10 min away → dropped
      dao.addData(("n1", 120000L, 3L), ("n2", 660000L, 4L))
      q.processAllAvailable()
      val rows = spark.table("combine_t1").select("subject", "dio_seq", "dao_seq")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      rows shouldBe Seq(("n1", 1L, 3L))
    } finally q.stop()
  }

  it("materializeLatest maintains a latest-per-node view across batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mat").toString
    val input = MemoryStream[FoundNode]
    val q = StreamingIngest.materializeLatest(input.toDS(),
      s"$dir/view", s"$dir/ckpt")
    try {
      input.addData(fn("n1", 100, 1), fn("n2", 50, 2))
      q.processAllAvailable()
      // newer n1 supersedes; older n2 must NOT regress the view
      input.addData(fn("n1", 300, 3), fn("n2", 20, 4))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/view")
        .select("subject", "epoch_ms").collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      got shouldBe Seq(("n1", 300L), ("n2", 50L))
    } finally q.stop()
  }

  it("materializeLatest recovers a view stranded mid-swap (crash between " +
      "the two renames)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mat_rec").toString
    val input = MemoryStream[FoundNode]
    val q = StreamingIngest.materializeLatest(input.toDS(),
      s"$dir/view", s"$dir/ckpt")
    try {
      input.addData(fn("n1", 100, 1), fn("n2", 50, 2))
      q.processAllAvailable()
      // simulate a crash between rename(cur, old) and rename(staging,
      // cur): the view exists ONLY under the .old name
      new java.io.File(s"$dir/view").renameTo(
        new java.io.File(s"$dir/view.old")) shouldBe true
      input.addData(fn("n3", 70, 3))
      q.processAllAvailable()
      // without recovery the view would hold ONLY n3 — the earlier
      // batches are checkpoint-committed and never replayed
      val got = spark.read.parquet(s"$dir/view")
        .select("subject", "epoch_ms").collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      got shouldBe Seq(("n1", 100L), ("n2", 50L), ("n3", 70L))
    } finally q.stop()
  }

  it("materializeSnapshot keeps a continuously-fresh snapshot graph — " +
      "negation retracts a link in a later batch") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val input = MemoryStream[FoundNode]
    val q = StreamingIngest.materializeSnapshot(input.toDS(),
      s"$dir/view", s"$dir/ckpt")
    def links() = spark.read.parquet(s"$dir/view/links")
      .select("source_node", "dest_node").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    def nodes() = spark.read.parquet(s"$dir/view/nodes")
      .select("node_id").collect().map(_.getString(0)).sorted.toSeq
    try {
      input.addData(
        FoundNode("n1", 1000L, Map.empty,
          Seq(model.FoundLink("n2", model.LinkState.Bidirectional, Map.empty)), 1))
      q.processAllAvailable()
      links() shouldBe Seq(("n1", "n2"))
      nodes() shouldBe Seq("n1", "n2")
      // n2 re-observed LATER with no links: negation must retract n1—n2
      input.addData(FoundNode("n2", 2000L, Map.empty, Nil, 2))
      q.processAllAvailable()
      links() shouldBe empty
      nodes() shouldBe Seq("n1", "n2")
      // a new link appears in a third batch
      input.addData(
        FoundNode("n2", 3000L, Map.empty,
          Seq(model.FoundLink("n3", model.LinkState.ToTarget, Map.empty)), 3))
      q.processAllAvailable()
      links() shouldBe Seq(("n2", "n3"))
      nodes() shouldBe Seq("n1", "n2", "n3")
    } finally q.stop()
  }

  it("appendToHistory lands stream batches in the parquet history table") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hist").toString
    val input = MemoryStream[FoundNode]
    val q = StreamingIngest.appendToHistory(input.toDS(),
      s"$dir/table", s"$dir/ckpt")
    try {
      input.addData(fn("n1", 100, 1), fn("n2", 50, 2))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/table")
      got.count() shouldBe 2
      // day-partitioned like History.append — one shared layout for the
      // streaming and batch writers
      got.columns.toSet shouldBe Set("subject", "epoch_ms", "finding_seq",
        "node_attrs", "links", "tz", "day")
    } finally q.stop()
  }

  it("asOfJoinStream matches out-of-order arrivals event-time-correctly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import StreamingIngest.AsOfIn
    val MIN = 60000L
    val input = MemoryStream[AsOfIn]
    val q = StreamingIngest.asOfJoinStream(
      input.toDS().withWatermark("event_time", "2 minutes"))
      .writeStream.format("memory").queryName("asof_t1")
      .outputMode(OutputMode.Append()).start()
    def got() = spark.table("asof_t1")
      .select($"leftId", $"rightId", $"rightValue")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
    try {
      // batch 1: a probe at t=10min; batch 2 delivers a right that is
      // EARLIER in event time (out-of-order arrival) — the probe must
      // wait for the watermark, then match that right.
      input.addData(AsOfIn("A", 10 * MIN, true, 1L, 0.0),
        AsOfIn("A", 4 * MIN, false, 100L, 1.5))
      q.processAllAvailable()
      got() shouldBe empty // watermark at 8min < 10min: buffered
      input.addData(AsOfIn("A", 9 * MIN, false, 101L, 2.5)) // out-of-order, admissible
      q.processAllAvailable()
      input.addData(AsOfIn("A", 13 * MIN, true, 2L, 0.0))
      q.processAllAvailable()
      input.addData(AsOfIn("B", 12 * MIN, true, 3L, 0.0),
        AsOfIn("A", 16 * MIN, true, 4L, 0.0)) // wm -> 14min after this batch
      q.processAllAvailable()
      input.addData(AsOfIn("A", 20 * MIN, false, 102L, 9.9)) // wm -> 18min
      q.processAllAvailable()
      // flush deterministically via DATA batches that run after the
      // watermark has passed every probe (no reliance on no-data
      // micro-batch timing): first advance the watermark, then touch
      // both keys so their state functions run under it.
      input.addData(AsOfIn("A", 30 * MIN, false, 998L, 0.0))
      q.processAllAvailable()
      input.addData(AsOfIn("A", 31 * MIN, false, 999L, 0.0),
        AsOfIn("B", 31 * MIN, false, 999L, 0.0))
      q.processAllAvailable()
      got() shouldBe Seq(
        (1L, Some(101L), Some(2.5)), // 10min probe: latest right <= 10min
        (2L, Some(101L), Some(2.5)), // 13min probe
        (3L, None, None),            // key B never saw an admissible right
        (4L, Some(101L), Some(2.5))) // 16min probe: 4min right was pruned, 101 kept
    } finally q.stop()
  }

  it("asOfJoinStream agrees with the batch asOfJoin on a replayed stream") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import StreamingIngest.AsOfIn
    // deterministic pseudo-random interleaving over 3 keys
    val events = (1 to 120).map { i =>
      val h = math.abs((i * 2654435761L) % 997)
      val key = "k" + (h % 3)
      val isLeft = h % 2 == 0
      // +1: an event AT epoch 0 sits exactly on the initial watermark
      // and is discarded as late — a test artifact, not a real shape
      AsOfIn(key, (h % 50 + 1) * 1000L, isLeft, i.toLong, (h % 7).toDouble)
    }
    val input = MemoryStream[AsOfIn]
    val q = StreamingIngest.asOfJoinStream(
      input.toDS().withWatermark("event_time", "1 hour"))
      .writeStream.format("memory").queryName("asof_t2")
      .outputMode(OutputMode.Append()).start()
    try {
      // 1 h delay: NOTHING is ever late, so the arbitrary interleaving
      // only exercises buffering, not watermark drops
      events.grouped(17).foreach { g => input.addData(g: _*); q.processAllAvailable() }
      // flush in two data batches: the first advances the watermark past
      // every probe, the second runs each key's state fn under it
      Seq("k0", "k1", "k2").foreach { k =>
        input.addData(AsOfIn(k, 4000000L, false, 9000L, 0.0)) }
      q.processAllAvailable()
      Seq("k0", "k1", "k2").foreach { k =>
        input.addData(AsOfIn(k, 4100000L, false, 9001L, 0.0)) }
      q.processAllAvailable()
      val streamed = spark.table("asof_t2")
        .select($"leftId", $"rightId").as[(Long, Option[Long])]
        .collect().toMap
      // batch truth over the same rows (dedupe right ties by max id like the stream)
      val lefts = events.filter(_.isLeft).toDF()
        .select($"key", $"id".as("left_id"), $"ts".as("lt"))
      val rights = events.filterNot(_.isLeft).toDF()
        .groupBy($"key", $"ts".as("rt"))
        .agg(org.apache.spark.sql.functions.max($"id").as("right_id"))
      val expected = graft.operators.TemporalJoins.asOfJoin(
          lefts, rights, Seq("key"), "lt", "rt")
        .select($"left_id", $"right_id").as[(Long, Option[Long])]
        .collect().toMap
      streamed shouldBe expected
    } finally q.stop()
  }

  it("debounceStream suppresses bursts event-time-correctly and agrees " +
      "with the batch operator on a replayed stream") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import StreamingIngest.{DebounceIn, DebounceOut}
    val MIN = 60000L
    val input = MemoryStream[DebounceIn]
    val q = StreamingIngest.debounceStream(
      input.toDS().withWatermark("event_time", "2 minutes"),
      gapMs = 5 * MIN)
      .writeStream.format("memory").queryName("debounce_t1")
      .outputMode(OutputMode.Append()).start()
    def got() = spark.table("debounce_t1").as[DebounceOut]
      .collect().map(o => (o.key, o.id)).sortBy(_._2).toSeq
    try {
      // burst head at t=10min arrives FIRST; an out-of-order EARLIER
      // event at t=9min (still above the watermark, 8min) arrives in
      // the next batch and must become the burst head instead
      // (event-time order, not arrival order)
      input.addData(DebounceIn("u", 10 * MIN, 2L))
      q.processAllAvailable()
      input.addData(DebounceIn("u", 9 * MIN, 1L))
      q.processAllAvailable()
      // advance the watermark past both, then a separated new burst
      input.addData(DebounceIn("u", 20 * MIN, 3L))
      q.processAllAvailable()
      input.addData(DebounceIn("u", 30 * MIN, 4L))
      q.processAllAvailable()
      input.addData(DebounceIn("u", 40 * MIN, 5L),
        DebounceIn("v", 40 * MIN, 6L))
      q.processAllAvailable()
      // id1 (9min) opens the burst; id2 (10min, gap 1min) suppressed;
      // id3 (20min, gap 10min from the RAW 10min event) is a new head
      got() shouldBe Seq(("u", 1L), ("u", 3L), ("u", 4L))
      // replay parity: the decided prefix equals the batch operator
      val replay = Seq((1L, 9 * MIN), (2L, 10 * MIN), (3L, 20 * MIN),
        (4L, 30 * MIN))
        .map { case (id, t) => ("u", id, "e", t) }
        .toDF("user_id", "event_id", "event_type", "epoch_ms")
      val batchIds = graft.pipeline.Behavior.debounce(replay,
          gapMs = 5 * MIN, keyCols = Seq("user_id", "event_type"))
        .select("event_id").as[Long].collect().sorted.toSeq
      batchIds shouldBe Seq(1L, 3L, 4L)
    } finally q.stop()
  }

  it("sessionizeStream (native session_window) matches the batch " +
      "sessionizer") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val MIN = 60000L
    val input = MemoryStream[(Long, Long)] // (user_id, ms)
    val sessions = StreamingIngest.sessionizeStream(
      input.toDF().toDF("user_id", "epoch_ms"),
      gap = "30 minutes", watermark = "10 minutes")
    val q = sessions.writeStream.format("memory").queryName("sesswin_t1")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: one 3-event session then a separated singleton;
      // user 2: one singleton
      input.addData((1L, 0L), (1L, 10 * MIN))
      q.processAllAvailable()
      // (1, 25min) lands in a LATER batch and must EXTEND the open
      // session (15-min gap < 30)
      input.addData((1L, 25 * MIN), (1L, 90 * MIN), (2L, 90 * MIN))
      q.processAllAvailable()
      input.addData((1L, 500 * MIN)) // advance watermark to flush
      q.processAllAvailable()
      val streamed = spark.table("sesswin_t1")
        .select(col("user_id"), col("session_start_ms"),
          col("session_end_ms"), col("n_events"))
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      // the first session closed (3 events spanning two micro-batches'
      // worth of state merging, extent = observed events); later
      // sessions may still be open depending on the final watermark
      streamed should contain((1L, 0L, 25 * MIN, 3L))
      // batch q31-style sessionizer agrees on the same data
      val batch = Seq((1L, 1L, 0L), (1L, 2L, 10 * MIN), (1L, 3L, 25 * MIN),
        (1L, 4L, 90 * MIN), (2L, 5L, 90 * MIN), (1L, 6L, 500 * MIN))
        .toDF("user_id", "event_id", "epoch_ms")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("epoch_ms"), col("event_id"))
      val sess = batch.withColumn("prev", lag(col("epoch_ms"), 1).over(w))
        .withColumn("new_sess", when(col("prev").isNull ||
          col("epoch_ms") - col("prev") > 30 * MIN, 1L).otherwise(0L))
        .withColumn("session_num", sum(col("new_sess")).over(w))
        .groupBy(col("user_id"), col("session_num"))
        .agg(count(lit(1)).as("n"))
      sess.filter(col("user_id") === 1L && col("session_num") === 1L)
        .select("n").as[Long].head() shouldBe 3L
    } finally q.stop()
  }

  it("Hll.registers runs unchanged as a streaming update-mode agg and " +
      "lands on the batch registers (mergeable-register property)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[Long]
    // the register table IS a (bucket, max) aggregation, so streaming
    // update mode maintains it incrementally with zero extra code
    val q = graft.sketch.Hll.registers(
        input.toDF().toDF("k"), col("k").cast("string"), m = 64)
      .writeStream.format("memory").queryName("hll_t1")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(1L to 300L: _*)
      q.processAllAvailable()
      input.addData(201L to 500L: _*) // overlap: max is idempotent
      q.processAllAvailable()
      // update mode re-emits changed buckets: latest row per bucket
      val streamed = spark.table("hll_t1")
        .groupBy(col("bucket")).agg(max(col("max_rho")).as("max_rho"))
        .as[(Long, Long)].collect().toMap
      val batch = graft.sketch.Hll.registers(
          (1L to 500L).toDF("k"), col("k").cast("string"), m = 64)
        .as[(Long, Long)].collect().toMap
      streamed shouldBe batch
    } finally q.stop()
  }

  it("Cms.registers runs unchanged as a streaming update-mode agg and " +
      "lands on the batch registers (sum-mergeable property)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[Long]
    val q = graft.sketch.Cms.registers(
        input.toDF().toDF("k"), col("k").cast("string"),
        depth = 4, width = 32)
      .writeStream.format("memory").queryName("cms_t1")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(1L to 200L: _*)
      q.processAllAvailable()
      input.addData((1L to 100L) ++ (201L to 300L): _*) // re-counts
      q.processAllAvailable()
      // counts only grow: last emission per slot == max over emissions
      val streamed = spark.table("cms_t1")
        .groupBy(col("depth"), col("slot"))
        .agg(max(col("cnt")).as("cnt"))
        .as[(Int, Long, Long)].collect()
        .map { case (d, s, c) => ((d, s), c) }.toMap
      val batch = graft.sketch.Cms.registers(
          ((1L to 200L) ++ (1L to 100L) ++ (201L to 300L)).toDF("k"),
          col("k").cast("string"), depth = 4, width = 32)
        .as[(Int, Long, Long)].collect()
        .map { case (d, s, c) => ((d, s), c) }.toMap
      streamed shouldBe batch
    } finally q.stop()
  }

  it("applyTakedownStream drops manifest ids from every micro-batch") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[(Long, String)]
    val manifest = Seq(2L, 4L).toDF("doc_id")
    val q = graft.streaming.StreamingIngest.applyTakedownStream(
        input.toDF().toDF("doc_id", "text"), manifest)
      .writeStream.format("memory").queryName("takedown_t1")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "a"), (2L, "b"), (3L, "c"))
      q.processAllAvailable()
      input.addData((4L, "d"), (5L, "e"))
      q.processAllAvailable()
      spark.table("takedown_t1").select(col("doc_id"))
        .as[Long].collect().sorted shouldBe Array(1L, 3L, 5L)
    } finally q.stop()
  }

  it("Bloom.setBits runs unchanged as a streaming update-mode distinct " +
      "and lands on the batch bits (OR-mergeable property)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val input = MemoryStream[String]
    // the bit table IS a distinct over exploded positions — an
    // update-mode aggregation Structured Streaming maintains as-is
    val q = graft.sketch.Bloom.setBits(
        input.toDF().toDF("k"), col("k"), m = 512, k = 3)
      .writeStream.format("memory").queryName("bloom_t1")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData((1 to 100).map(i => s"w$i"): _*)
      q.processAllAvailable()
      input.addData((51 to 150).map(i => s"w$i"): _*) // overlap: OR
      q.processAllAvailable()
      val streamed = spark.table("bloom_t1")
        .select(col("bit")).distinct().as[Long].collect().sorted
      val batch = graft.sketch.Bloom.setBits(
          (1 to 150).map(i => s"w$i").toDF("k"), col("k"), m = 512, k = 3)
        .as[Long].collect().sorted
      streamed shouldBe batch
    } finally q.stop()
  }
}

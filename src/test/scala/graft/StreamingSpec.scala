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
      got.columns.toSet shouldBe
        Set("subject", "epoch_ms", "finding_seq", "node_attrs", "links", "tz")
    } finally q.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.model.{FoundLink, FoundNode, Findings, LinkState}
import graft.operators.PolicyOverwrite
import graft.pipeline.{Behavior, Resample}
import graft.sources.History
import graft.streaming.StreamingIngest
import graft.time.Interval

/** Round-6 hardening: floor-division bucketing for negative epochs,
  * empty-input gapFill, the Weaver driver-buffer spill bound, the
  * layout-aware Spider read path, and as-of stream state expiry. */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  describe("floor-division bucketing (oracle `//` parity)") {
    it("Buckets.floorDiv floors for negative epochs where `div` truncates") {
      val df = Seq(-1L, -86400000L, -86400001L, 0L, 1L, 86400000L)
        .toDF("ms")
      val got = df.select(col("ms"),
        graft.time.Buckets.floorDiv("ms", 86400000L).as("day"))
        .as[(Long, Long)].collect().toMap
      got shouldBe Map(
        -1L -> -1L, -86400000L -> -1L, -86400001L -> -2L,
        0L -> 0L, 1L -> 0L, 86400000L -> 1L)
    }

    it("cohortRetention weeks floor for pre-1970 timestamps") {
      val week = 604800000L
      // user 1 first seen in week -1, active again in week 0 → offset 1
      val ev = Seq((1L, -5L), (1L, 3L)).toDF("user_id", "epoch_ms")
      Behavior.cohortRetention(ev)
        .as[(Long, Long, Long)].collect().toSet shouldBe
          Set((-1L, 0L, 1L), (-1L, 1L, 1L))
    }
  }

  describe("Resample.gapFill") {
    it("returns an empty frame on empty input (no NPE on the max bucket)") {
      val ev = Seq.empty[(Long, Long, Double, Long)]
        .toDF("user_id", "event_id", "value", "ms")
      val got = Resample.gapFill(ev, "user_id", "ms", "value", "event_id")
      got.count() shouldBe 0L
      got.columns.toSeq shouldBe Seq("key", "bucket", "value", "is_observed")
    }
  }

  describe("Weaver spill bound") {
    it("spills the driver buffer past the threshold; snapshot unchanged") {
      def mk(i: Int) = FoundNode(s"n${i % 5}", 1000L + i, Map.empty,
        Seq(FoundLink(s"n${(i + 1) % 5}", LinkState.ToTarget, Map.empty)), 0)
      val small = new Weaver(spark) // default threshold: all in memory
      val spilly = new Weaver(spark, spillThreshold = 7)
      (0 until 40).foreach { i => small.addFoundNode(mk(i)); spilly.addFoundNode(mk(i)) }
      def canon(g: graft.model.SnapshotGraph) =
        (g.nodes.collect()
          .map(r => (r.getString(0), String.valueOf(r.get(2)))).sorted.toSeq,
          g.links.collect().map(r => (r.getString(0), r.getString(1),
            r.getLong(3))).sorted.toSeq)
      canon(spilly.getSnapshot()) shouldBe canon(small.getSnapshot())
    }
  }

  describe("layout-aware Spider read path") {
    def fn(subject: String, at: String, seq: Long) =
      FoundNode(subject, ts(at), Map.empty,
        Seq(FoundLink("x", LinkState.ToTarget, Map.empty)), seq)

    it("detects a subject-bucketed catalog table and reads it " +
        "Exchange-free into retention (the default path, not a side door)") {
      val table = "graft_spider_bucketed_t1"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      History.appendBucketed(Findings.fromSeq(spark, Seq(
        fn("n1", "2024-01-10T05:00", 0), fn("n1", "2024-01-12T05:00", 1),
        fn("n2", "2024-02-01T05:00", 2))), table, numBuckets = 4)
      try {
        History.isBucketedTable(spark, table) shouldBe true
        History.isBucketedTable(spark, "/tmp/not/a/table") shouldBe false
        val spider = Spider(spark, table)
        // retention over the spider's OWN read path: no Exchange — the
        // bucketed scan pre-partitions by subject (the reference makes
        // its byNodeId JanusGraph index the default read path the same
        // way, janusgraph-conf/net-spider-index.groovy:18-34)
        val retained = graft.operators.Weave.retainFindings(
          spider.readFindings(Interval.whole), PolicyOverwrite)
        retained.count() shouldBe 2
        retained.queryExecution.executedPlan.toString should
          not include "Exchange"
        // full facade: getSnapshot + append + clearAll route to the table
        val g = spider.getSnapshotSimple(Seq("n1"))
        g.nodes.collect().map(_.getString(0)).sorted.toSeq shouldBe
          Seq("n1", "x")
        spider.addFoundNodes(Seq(fn("n3", "2024-03-01T00:00", 3)))
        spider.readFindings(Interval.whole).count() shouldBe 4
        spider.clearAll()
        spark.catalog.tableExists(table) shouldBe false
      } finally spark.sql(s"DROP TABLE IF EXISTS $table")
    }

    it("reads a z-ordered (non-day-partitioned) dir with interval filter") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_spider_z").toString + "/t"
      val findings = Findings.fromSeq(spark, Seq(
        fn("n1", "2024-01-10T05:00", 0), fn("n1", "2024-01-12T05:00", 1),
        fn("n2", "2024-02-01T05:00", 2)))
      History.writeZOrdered(findings, dir, numFiles = 2)
      val janOnly = History.read(spark, dir, Interval(
        graft.time.IntervalEnd(Some(ts("2024-01-01T00:00")), true),
        graft.time.IntervalEnd(Some(ts("2024-01-31T23:59")), true)))
      janOnly.count() shouldBe 2
      val spider = Spider(spark, dir)
      spider.getSnapshotSimple(Seq("n1")).nodes
        .collect().map(_.getString(0)).sorted.toSeq shouldBe Seq("n1", "x")
      History.clear(spark, dir)
    }
  }

  describe("repetitionStats (Gopher filters)") {
    it("computes exact char coverage of top 2-grams and dup 3-grams") {
      val docs = Seq(
        (1L, "a bb a bb a"), // 2-grams: "a bb"x2 "bb a"x2; 3-grams: "a bb a"x2 "bb a bb"x1
        (2L, "hello"),       // single token: no grams
        (3L, "x y z"))       // all grams unique
        .toDF("doc_id", "text")
      val got = graft.text.TextOps.repetitionStats(docs)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      got shouldBe Seq(
        // tok_chars=7; top2: tie at cnt=2 → lexicographically smaller
        // "a bb", chars=2*3=6; dup3: "a bb a" cnt=2, chars=2*4=8
        (1L, 7L, 6L, 8L),
        (2L, 5L, 0L, 0L),
        (3L, 3L, 2L, 0L)) // top2 = "x y" (cnt 1, smallest), chars=2
    }
  }

  describe("dedupIncrement") {
    it("keeps only batch min-id docs absent from the existing corpus") {
      val existing = Seq((10L, "X"), (11L, "Y")).toDF("doc_id", "text")
      val incoming = Seq(
        (1L, "X"), // duplicates existing → dropped
        (2L, "Z"), // new, min-id of the Z pair → kept
        (3L, "Z"), // in-batch duplicate → dropped
        (4L, "W")  // new → kept
      ).toDF("doc_id", "text")
      graft.dedup.Dedup.dedupIncrement(existing, incoming)
        .as[Long].collect().sorted.toSeq shouldBe Seq(2L, 4L)
    }
  }

  describe("twoHopCounts") {
    it("counts nodes at exactly distance 2") {
      // path a-b-c-d: exactly-2 pairs are (a,c) and (b,d), both ways
      val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("s", "t")
      graft.operators.Motifs.twoHopCounts(path)
        .as[(String, Long)].collect().sorted.toSeq shouldBe
          Seq(("a", 1L), ("b", 1L), ("c", 1L), ("d", 1L))
      // triangle: every 2-path endpoint is also a direct neighbor
      val tri = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("s", "t")
      graft.operators.Motifs.twoHopCounts(tri).count() shouldBe 0L
    }
  }

  describe("nearDupSearch (asymmetric query set vs corpus)") {
    it("finds exact dups of queries and respects the Jaccard threshold") {
      val text1 = "alpha beta gamma delta epsilon zeta eta theta"
      val text2 = "one two three four five six seven eight nine"
      val corpus = Seq(
        (100L, text1),                  // exact dup of query 1
        (101L, text2 + " ten eleven"),  // superset of query 2
        (102L, "totally different words here nothing shared at all"))
        .toDF("doc_id", "text")
      val queries = Seq((1L, text1), (2L, text2)).toDF("doc_id", "text")
      val got = graft.dedup.Dedup.nearDupSearch(corpus, queries)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // query 1 ↔ 100: identical 6 shingles → jaccard 1 ≥ 0.5
      got.map(r => (r._1, r._2)) should contain((1L, 100L))
      got.find(r => r._1 == 1L && r._2 == 100L).get shouldBe
        (1L, 100L, 6L, 6L, 6L)
      // no pair against the unrelated doc
      got.map(_._2) should not contain 102L
    }
  }

  describe("unificationLog (Weaver.hs:186-189 per-pair decision lines)") {
    it("reports per-pair sample and unified counts with the rendered line") {
      import graft.model.{FoundLink, FoundNode, Findings, LinkState}
      // n1 observes n2 twice, n2 observes n1 once → 3 samples, 1 winner
      val findings = Findings.fromSeq(spark, Seq(
        FoundNode("n1", 1000L, Map.empty,
          Seq(FoundLink("n2", LinkState.Bidirectional, Map.empty)), 0),
        FoundNode("n1", 2000L, Map.empty,
          Seq(FoundLink("n2", LinkState.Bidirectional, Map.empty)), 1),
        FoundNode("n2", 1500L, Map.empty,
          Seq(FoundLink("n1", LinkState.Bidirectional, Map.empty)), 2)))
      // PolicyAppend keeps all three samples visible to the unifier
      val log = graft.operators.Weave.unificationLog(findings,
        graft.operators.PolicyAppend)
        .as[(String, String, Long, Long, String)].collect().toSeq
      log shouldBe Seq(("n1", "n2", 3L, 1L,
        "Unify link [n1]-[n2]: from 3 samples to 1 samples"))
    }
  }

  describe("asOfJoinStream right-only state expiry") {
    it("drops idle right-only keys past the retention horizon") {
      implicit val sql = spark.sqlContext
      import StreamingIngest.AsOfIn
      val MIN = 60000L
      val input = MemoryStream[AsOfIn]
      // 2-minute retention: rights older than wm - 2min with no pending
      // probes are dropped, so a later probe finds NO match
      val q = StreamingIngest.asOfJoinStream(
        input.toDS().withWatermark("event_time", "1 minute"),
        rightRetentionMs = 2 * MIN)
        .writeStream.format("memory").queryName("asof_r6")
        .outputMode(OutputMode.Append()).start()
      try {
        // key A: one right at 1min, then silence
        input.addData(AsOfIn("A", 1 * MIN, isLeft = false, 100L, 1.5))
        q.processAllAvailable()
        // unrelated key advances the watermark to 9min (> 1min + 2min
        // retention); the next batch fires A's expiry sweep timeout
        input.addData(AsOfIn("B", 10 * MIN, isLeft = false, 200L, 9.9))
        q.processAllAvailable()
        input.addData(AsOfIn("B", 10 * MIN, isLeft = false, 201L, 9.9))
        q.processAllAvailable()
        // probe A at 15min (above the 9min watermark, so not late):
        // A's right expired → no match
        input.addData(AsOfIn("A", 15 * MIN, isLeft = true, 1L, 0.0))
        q.processAllAvailable()
        // advance the watermark past the probe so it emits
        input.addData(AsOfIn("B", 30 * MIN, isLeft = false, 202L, 9.9))
        q.processAllAvailable()
        input.addData(AsOfIn("B", 31 * MIN, isLeft = false, 203L, 9.9))
        q.processAllAvailable()
        val got = spark.table("asof_r6")
          .select($"leftId", $"rightId")
          .as[(Long, Option[Long])].collect().toSeq
        got shouldBe Seq((1L, None))
      } finally q.stop()
    }

    it("retains rights within the horizon (default behavior unchanged)") {
      implicit val sql = spark.sqlContext
      import StreamingIngest.AsOfIn
      val MIN = 60000L
      val input = MemoryStream[AsOfIn]
      val q = StreamingIngest.asOfJoinStream(
        input.toDS().withWatermark("event_time", "1 minute"),
        rightRetentionMs = 60 * MIN)
        .writeStream.format("memory").queryName("asof_r6b")
        .outputMode(OutputMode.Append()).start()
      try {
        // identical schedule to the expiry test, wider retention
        input.addData(AsOfIn("A", 1 * MIN, isLeft = false, 100L, 1.5))
        q.processAllAvailable()
        input.addData(AsOfIn("B", 10 * MIN, isLeft = false, 200L, 9.9))
        q.processAllAvailable()
        input.addData(AsOfIn("B", 10 * MIN, isLeft = false, 201L, 9.9))
        q.processAllAvailable()
        input.addData(AsOfIn("A", 15 * MIN, isLeft = true, 1L, 0.0))
        q.processAllAvailable()
        input.addData(AsOfIn("B", 30 * MIN, isLeft = false, 202L, 9.9))
        q.processAllAvailable()
        input.addData(AsOfIn("B", 31 * MIN, isLeft = false, 203L, 9.9))
        q.processAllAvailable()
        val got = spark.table("asof_r6b")
          .select($"leftId", $"rightId")
          .as[(Long, Option[Long])].collect().toSeq
        got shouldBe Seq((1L, Some(100L)))
      } finally q.stop()
    }
  }
}

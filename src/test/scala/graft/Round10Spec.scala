package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.util.BoundedCollect

/** Round-10 hardening: the ObjectHashAggregate fallback-threshold scope.
  * The session raises the threshold to 16384 for fixed-arity buffers
  * (Tables.sessionConfs); document-sized collectors must therefore not
  * plan as hash aggregates at all — BoundedCollect streams one group's
  * buffer at a time. */
class Round10Spec extends SparkSpec {

  /** Max shuffle-read records of any single task during `body` — the
    * per-task width a skewed key inflates. Bus drained via the
    * Round8Spec sentinel-job trick (waitUntilEmpty is private). */
  private class MaxTaskReadListener extends SparkListener {
    val maxRead = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile var sentinelSeen = false
    override def onJobStart(j: SparkListenerJobStart): Unit =
      if (j.properties != null && "round10-sentinel" ==
          j.properties.getProperty("spark.jobGroup.id"))
        sentinelSeen = true
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) {
        val r = t.taskMetrics.shuffleReadMetrics.recordsRead
        maxRead.getAndUpdate(x => math.max(x, r))
      }
  }

  private def maxTaskReadDuring(body: => Unit): Long = {
    val l = new MaxTaskReadListener
    spark.sparkContext.addSparkListener(l)
    try {
      body
      spark.sparkContext.setJobGroup("round10-sentinel", "drain barrier")
      try spark.range(1).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!l.sentinelSeen && System.nanoTime() < deadline)
        Thread.sleep(10)
      l.maxRead.get()
    } finally spark.sparkContext.removeSparkListener(l)
  }

  describe("dedup family under a 30%-hot skewed key") {
    // 600 docs; 180 (30%) carry the same 8-token boilerplate sentence,
    // whose 6 k=3 shingles each occur in 180 docs — far past every cap.
    // Two planted true near-dup pairs: (1,2) share a 20-token span of
    // otherwise-unique text; (3,4) likewise AND both carry the hot
    // sentence (cap must not mask a real dup that also has boilerplate).
    lazy val hotSentence =
      "click here to accept all cookies on this site"
    def uniq(id: Long, n: Int, tag: String) =
      (0 until n).map(p => s"u${tag}_${id}_$p").mkString(" ")
    lazy val sharedSpan =
      (0 until 20).map(p => s"planted_common_$p").mkString(" ")
    lazy val sharedSpanB =
      (0 until 20).map(p => s"planted_hotdup_$p").mkString(" ")
    lazy val skewDocs = {
      import spark.implicits._
      (0L until 600L).map { id =>
        val hot = id % 10 < 3 // 30% of docs
        val body = id match {
          case 1L | 2L => s"${uniq(id, 6, "pre")} $sharedSpan ${uniq(id, 6, "post")}"
          case 3L | 4L =>
            s"${uniq(id, 6, "pre")} $sharedSpanB ${uniq(id, 6, "post")} $hotSentence"
          case _ if hot => s"${uniq(id, 12, "a")} $hotSentence ${uniq(id, 12, "b")}"
          case _ => uniq(id, 30, "c")
        }
        (id, body)
      }.toDF("doc_id", "text")
    }

    it("sharedSpanPairs: hot shingles never feed the match join; " +
        "per-task width stays bounded") {
      var rows: Array[org.apache.spark.sql.Row] = Array.empty
      val cappedWidth = maxTaskReadDuring {
        rows = graft.dedup.Dedup.sharedSpanPairs(skewDocs,
          minSpanTokens = 8, maxOcc = 64).collect()
      }
      val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      // exactly the planted pairs: boilerplate-only overlap (any two of
      // the 180 hot docs share the full 8-token sentence, span ≥ the
      // threshold if it were counted) must NOT produce a pair
      pairs shouldBe Set((1L, 2L), (3L, 4L))
      rows.foreach { r => r.getLong(2) should be >= 20L }
      // the hot key inflates no task: an uncapped control run over the
      // same fixture pays a quadratic hot-pair blowup (~16k pairs x ~7
      // shingle matches) in the island window's shuffle; the cap must
      // keep the max per-task width at least 2x below it (AQE coalesces
      // the small common shuffles into single tasks, so the shared
      // baseline dominates the capped number — the blowup still at
      // least doubles the uncapped one)
      var ctrl: Long = 0
      val uncappedWidth = maxTaskReadDuring {
        ctrl = graft.dedup.Dedup.sharedSpanPairs(skewDocs,
          minSpanTokens = 8, maxOcc = 1000000).count()
      }
      ctrl should be >= (180L * 179L / 2) // hot pairs all qualify
      cappedWidth should be > 0L
      uncappedWidth should be >= cappedWidth * 2
      info(s"max per-task shuffle-read records: capped=$cappedWidth, " +
        s"uncapped control=$uncappedWidth")
    }

    it("contaminationCounts: the skew cap drops boilerplate evidence, " +
        "keeps true contamination") {
      import spark.implicits._
      val test = Seq(
        (1000L, s"fresh one ${hotSentence} fresh two"), // boilerplate only
        (1001L, s"${uniq(7L, 30, "c")}"),               // copies doc 7
        (1002L, "totally novel text with no overlap at all")
      ).toDF("doc_id", "text")
      val capped = graft.dedup.Dedup.contaminationCounts(skewDocs, test,
          maxShingleFreq = Some(64L))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      // hot-sentence shingles are dropped from the train side: the
      // boilerplate-only test doc reports NO contaminating docs
      capped.get(1000L) shouldBe None
      // the true copy still reports its source
      capped(1001L)._1 should be >= 1L
      capped.get(1002L) shouldBe None
      // uncapped control: the same boilerplate doc implicates ~180
      // train docs — the skew (and the false-evidence class) the cap
      // exists to remove
      val uncapped = graft.dedup.Dedup.contaminationCounts(skewDocs, test)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      uncapped(1000L) should be >= 180L
    }

    it("minhashCandidatePairs: a 30%-hot token does not explode the " +
        "band buckets") {
      val n = graft.dedup.Dedup.minhashCandidatePairs(skewDocs).count()
      // 180 docs share the sentence but differ in everything else, so
      // their signatures differ and banding must NOT produce the
      // ~16k-pair hot-bucket blowup; only genuinely similar docs
      // (the planted pairs, plus a handful of band collisions) collide
      n should be < 100L
    }
  }

  describe("BoundedCollect.sortedGather") {

    it("matches sort_array(collect_list) on a multi-partition fixture " +
        "with duplicate order keys") {
      import spark.implicits._
      // (id, freq, shingle): duplicate (freq, shingle) pairs and
      // deliberately shuffled input order across many partitions
      val rows = for {
        id <- 0L until 50L
        j <- 0 until 20
      } yield (id, (j * 7 % 5).toLong, s"sh${(j * 13) % 9}")
      val df = spark.createDataset(
          new scala.util.Random(42).shuffle(rows.toList))
        .toDF("id", "freq", "shingle").repartition(7)
      val got = BoundedCollect.sortedGather(df, Seq("id"),
          Seq("freq", "shingle"), "shingle", "shingles")
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val want = df.groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("freq"), col("shingle"))))
          .as("ranked"))
        .select(col("id"), col("ranked.shingle"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      got shouldBe want
      got.keySet should have size 50
    }

    it("plans no ObjectHashAggregate and holds one group at a time " +
        "(doc-sized buffers never enter the 16k-group hash map)") {
      import spark.implicits._
      val df = (0L until 10L).flatMap(id =>
          (0 until 100).map(p => (id, p.toLong, s"line$p")))
        .toDF("id", "pos", "line")
      val gathered = BoundedCollect.sortedGather(df, Seq("id"),
        Seq("pos"), "line", "lines")
      gathered.queryExecution.executedPlan.toString should not include
        "ObjectHashAggregate"
      // the buffer-bounding shape sits in the RDD lineage behind the
      // ExistingRDD scan: hash repartition on the key (a shuffle), then
      // a spillable partition-local sort feeding the streaming fold
      gathered.rdd.toDebugString should include("ShuffledRowRDD")
      // the rebuilt operator's whole plan carries no hash aggregate for
      // the doc-sized rebuild either (its only aggregates are the
      // line-frequency counts, which are scalar-buffered)
      val docs = (0L until 10L)
        .map(id => (id, (0 until 50).map(p => s"l$p").mkString("\n")))
        .toDF("doc_id", "text")
      val rb = graft.text.TextOps.removeBoilerplate(docs, minDf = 3)
      val rbPlan = rb.queryExecution.executedPlan.toString
      rbPlan should not include "ObjectHashAggregate"
    }

    it("keeps the three rebuilt operators value-identical on a " +
        "large-document corpus") {
      import spark.implicits._
      // 20 docs x 2000 lines — each group's buffer is genuinely
      // document-sized; a boilerplate line lands in every doc
      val docs = (0L until 20L).map { id =>
        val lines = (0 until 2000).map {
          case p if p % 100 == 0 => "COOKIE BANNER"
          case p => s"doc$id line$p"
        }
        (id, lines.mkString("\n"))
      }.toDF("doc_id", "text")
      val cleaned = graft.text.TextOps.removeBoilerplate(docs, minDf = 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3)))
      cleaned should have size 20
      cleaned.foreach { case (_, clean, nLines, nKept) =>
        nLines shouldBe 2000L
        nKept shouldBe 1980L
        clean should not include "COOKIE BANNER"
      }
      // line ORDER survives the rebuild
      val c0 = cleaned.find(_._1 == 0L).get._2.split("\n")
      c0.take(3) shouldBe Array("doc0 line1", "doc0 line2", "doc0 line3")

      // BPE encode round-trips token order through the bounded gather
      val tiny = Seq((0L, "ab ab ra ca da bra ab"), (1L, "ra ra ab"),
          (9L, "ab")).toDF("doc_id", "text")
      val merges = graft.text.Bpe.learnMerges(tiny, numMerges = 4,
          minCount = 1L)
        .orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val enc = graft.text.Bpe.encode(tiny, merges)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      enc.keySet shouldBe Set(0L, 1L, 9L)
      val ids0 = enc(0L)
      ids0 should not be empty
      // word-level structure survives: doc0 = "ab ab ra ca da bra ab" —
      // its first and last words are "ab", whose id sequence doc9
      // pins down; both ends of doc0 must carry it (order preserved
      // through the gather)
      val perWord = enc(9L)
      perWord should not be empty
      ids0.take(perWord.size) shouldBe perWord
      ids0.takeRight(perWord.size) shouldBe perWord
    }
  }
}

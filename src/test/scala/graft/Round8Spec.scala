package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Round-8 hardening: gate builders must be LAZY — constructing a
  * query plan from SparkEntry.queries runs zero Spark jobs (the
  * verdict's q83/q92 finding: thresholds derived from corpus counts
  * belong inside the plan as 1×1 scalar summaries, not driver-side
  * `count()` actions). The two-pass operators (packing, deterministic
  * shuffle, skyline) are exempt by design — their algorithms are
  * multi-job — so this pins exactly the threshold-scalar class.
  */
class Round8Spec extends SparkSpec {

  private class JobCounter extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var sentinelSeen = false
    override def onJobStart(j: SparkListenerJobStart): Unit =
      if (j.properties != null &&
          "round8-sentinel" == j.properties.getProperty("spark.jobGroup.id"))
        sentinelSeen = true
      else jobs.incrementAndGet()
  }

  private def jobsDuring(body: => Unit): Int = {
    val l = new JobCounter
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // The listener bus is async (and its waitUntilEmpty is
      // private[spark]): run one tagged sentinel job AFTER the body —
      // bus ordering guarantees any builder-triggered JobStart events
      // are delivered before the sentinel's, so once the sentinel is
      // seen the counter holds exactly the builder's job count.
      spark.sparkContext.setJobGroup("round8-sentinel", "drain barrier")
      try spark.range(1).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!l.sentinelSeen && System.nanoTime() < deadline)
        Thread.sleep(10)
      l.jobs.get()
    } finally spark.sparkContext.removeSparkListener(l)
  }

  describe("threshold-scalar gates build lazily") {
    val sf = "/root/testdata/sf0.001"

    // Opening a parquet table itself can run a footer/listing job, so
    // the yardstick is a known-lazy gate over the same table: building
    // q83/q92 must run exactly as many jobs as building q16 — i.e.
    // the threshold derivation adds ZERO jobs.
    it("q83_heavy_hitters builds with no more jobs than a lazy gate") {
      val base = jobsDuring { SparkEntry.queries("q16_text_quality")(spark, sf) }
      val n = jobsDuring { SparkEntry.queries("q83_heavy_hitters")(spark, sf) }
      n shouldBe base
    }

    it("q92_pmi builds with no more jobs than a lazy gate") {
      val base = jobsDuring { SparkEntry.queries("q16_text_quality")(spark, sf) }
      val n = jobsDuring { SparkEntry.queries("q92_pmi")(spark, sf) }
      n shouldBe base
    }

    it("frequentTokensFrac matches the absolute-threshold form") {
      import spark.implicits._
      val docs = (0L until 200L).map { i =>
        val words =
          (if (i % 3 == 0) Seq("common") else Seq.empty) ++
          (if (i % 20 == 0) Seq(s"rare$i") else Seq.empty) ++
          Seq("the", s"w${i % 7}")
        (i, words.mkString(" "))
      }.toDF("doc_id", "text")
      val frac = graft.sketch.Frequent
        .frequentTokensFrac(docs, minDocFrac = 0.05)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val abs = graft.sketch.Frequent
        .frequentTokens(docs, math.ceil(0.05 * 200).toLong)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      frac shouldBe abs
      frac.map(_._1) should contain("common")
    }

    it("pmiComponentsFrac matches the absolute-threshold form") {
      import spark.implicits._
      val docs = (0L until 100L).map { i =>
        // a,b: df=50 (in band [20,80]); c: df=25 (in band); z: df=4
        // (below); u_i: df=1 (below). Pair counts a∧b=50, a∧c=b∧c=25.
        val words =
          (if (i % 2 == 0) Seq("a", "b") else Seq.empty) ++
          (if (i % 4 == 0) Seq("c") else Seq.empty) ++
          (if (i % 30 == 0) Seq("z") else Seq.empty) ++
          Seq(s"u$i")
        (i, words.mkString(" "))
      }.toDF("doc_id", "text")
      val frac = graft.text.Cooccur
        .pmiComponentsFrac(docs, 0.2, 0.8, 0.05)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      val abs = graft.text.Cooccur.pmiComponents(docs,
        minDf = math.ceil(0.2 * 100).toLong,
        maxDf = math.floor(0.8 * 100).toLong,
        minPairCount = math.ceil(0.05 * 100).toLong)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      frac shouldBe abs
      frac.map(t => (t._1, t._2)) should contain(("a", "b"))
    }
  }
}

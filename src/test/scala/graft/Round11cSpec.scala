package graft

import org.apache.spark.sql.functions._

/** Round-11 additions, third batch: incremental near-dup cluster
  * maintenance (the daily-ingest quotient-graph CC).
  */
class Round11cSpec extends SparkSpec {
  import graft.dedup.Dedup

  describe("Dedup.clusterIncrementFromPairs / applyIncrement") {

    it("covers all four delta lanes and equals a full rebuild " +
        "(join-existing, touch-singleton, batch-only, bridge-merge)") {
      import spark.implicits._
      // existing corpus clusters: {1,2} label 1, {5,6} label 5;
      // corpus docs 3, 4 are unlabeled singletons.
      val existing = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
        .toDF("id", "cluster")
      // batch-internal pair: 102-103 (new batch-only cluster)
      val bb = Seq((102L, 103L)).toDF("id1", "id2")
      // batch→corpus: 100 joins cluster 1 (via member 2), 101 touches
      // singleton 3, 104 bridges clusters 1 and 5 (via members 2, 6).
      val bc = Seq((100L, 2L), (101L, 3L), (104L, 2L), (104L, 6L))
        .toDF("qid", "did")
      val delta = Dedup.clusterIncrementFromPairs(bb, bc, existing)

      delta.batchLabels.as[(Long, Long)].collect().toSet shouldBe Set(
        (100L, 1L), (101L, 3L), (102L, 102L), (103L, 102L), (104L, 1L))
      delta.relabels.as[(Long, Long)].collect().toSet shouldBe
        Set((5L, 1L))
      delta.touchedLabels.as[(Long, Long)].collect().toSet shouldBe
        Set((3L, 3L))

      val applied = Dedup.applyIncrement(existing, delta)
        .as[(Long, Long)].collect().toSet
      // full rebuild over the union pair set (corpus pairs that
      // produced `existing` + the batch round's bb/bc pairs)
      val unionPairs = Seq((1L, 2L), (5L, 6L), (100L, 2L), (101L, 3L),
        (104L, 2L), (104L, 6L), (102L, 103L)).toDF("id1", "id2")
      val rebuilt = Dedup.clusterLabelsStar(unionPairs)
        .as[(Long, Long)].collect().toSet
      applied shouldBe rebuilt
      // the bridge merged {1,2,5,6,100,104} under label 1
      applied shouldBe Set(
        (1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L), (100L, 1L), (104L, 1L),
        (3L, 3L), (101L, 3L),
        (102L, 102L), (103L, 102L))
      // doc 4 (never in a pair) stays unlabeled in both
      applied.map(_._1) should not contain 4L
    }

    it("no-op batch (no candidate pairs) leaves existing labels " +
        "unchanged") {
      import spark.implicits._
      val existing = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster")
      val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
      val emptyBc = Seq.empty[(Long, Long)].toDF("qid", "did")
      val delta = Dedup.clusterIncrementFromPairs(empty, emptyBc, existing)
      delta.batchLabels.count() shouldBe 0L
      delta.relabels.count() shouldBe 0L
      delta.touchedLabels.count() shouldBe 0L
      Dedup.applyIncrement(existing, delta)
        .as[(Long, Long)].collect().toSet shouldBe Set((1L, 1L), (2L, 1L))
    }
  }

  describe("Dedup.clusterIncrement (persistent-index daily flow)") {

    it("increment-maintained labels equal a full re-cluster of the " +
        "union (LSH index candidates + in-batch banding)") {
      import spark.implicits._
      val tA = "alpha beta gamma delta epsilon zeta eta theta"
      val tB = "one two three four five six seven eight nine"
      val tC = "completely different text with no shared shingles here"
      val corpus = Seq(
        (1L, tA), (2L, tA), // existing cluster {1,2}
        (3L, tB),           // unlabeled singleton
        (4L, tC)            // unlabeled singleton, never touched
      ).toDF("doc_id", "text")
      val batch = Seq(
        (100L, tA),         // joins cluster 1
        (101L, tB),         // touches singleton 3
        (102L, "fresh unique content nobody else wrote today at all"),
        (103L, "fresh unique content nobody else wrote today at all")
      ).toDF("doc_id", "text")

      val idxDir = java.nio.file.Files
        .createTempDirectory("graft_clinc_idx").toString
      Dedup.writeLshIndex(corpus, idxDir)
      val existing =
        Dedup.clusterLabelsStar(Dedup.minhashCandidatePairs(corpus))
      val delta = Dedup.clusterIncrement(spark, idxDir, batch, existing)
      val applied = Dedup.applyIncrement(existing, delta)
        .as[(Long, Long)].collect().toSet

      val rebuilt = Dedup.clusterLabelsStar(
        Dedup.minhashCandidatePairs(corpus.unionByName(batch)))
        .as[(Long, Long)].collect().toSet
      applied shouldBe rebuilt
      // sanity on the lanes: 100 joined {1,2}; 3 got touched by 101;
      // the batch twins formed their own cluster; 4 stayed unlabeled
      applied should contain allOf ((100L, 1L), (3L, 3L), (101L, 3L),
        (102L, 102L), (103L, 102L))
      applied.map(_._1) should not contain 4L
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.util.BoundedCollect

/** Round-10 hardening: the ObjectHashAggregate fallback-threshold scope.
  * The session raises the threshold to 16384 for fixed-arity buffers
  * (Tables.sessionConfs); document-sized collectors must therefore not
  * plan as hash aggregates at all — BoundedCollect streams one group's
  * buffer at a time. */
class Round10Spec extends SparkSpec {

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

package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{IncrementalAgg, Quality}
import graft.text.Cooccur

/** Quality audit, incremental aggregate-state merge, PMI components. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  describe("Quality") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((10L, 1L), (11L, 2L), (12L, 9L), (13L, 9L))
      .toDF("id", "fk")

    it("fkCheck counts orphans; fkViolations returns the rows") {
      Quality.fkCheck("fk", child, "fk", parent, "pk")
        .as[(String, Long)].head() shouldBe ("fk", 2L)
      Quality.fkViolations(child, "fk", parent, "pk")
        .select("id").as[Long].collect().sorted shouldBe Array(12L, 13L)
    }

    it("uniqueCheck counts extra rows, 0 on unique and empty inputs") {
      val dups = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
      Quality.uniqueCheck("u", dups, Seq("k"))
        .as[(String, Long)].head() shouldBe ("u", 3L)
      Quality.uniqueCheck("u", parent, Seq("pk"))
        .as[(String, Long)].head() shouldBe ("u", 0L)
    }

    it("audit unions named checks into one report") {
      val report = Quality.audit(Seq(
        Quality.notNullCheck("nn", Seq(Some(1), None, None).toDF("v"), "v"),
        Quality.predicateCheck("pos", Seq(-1, 2, -3).toDF("v"), col("v") > 0)))
        .as[(String, Long)].collect().toSet
      report shouldBe Set(("nn", 2L), ("pos", 2L))
    }
  }

  describe("IncrementalAgg") {
    it("merge of per-shard partials equals the one-shot aggregate, for any sharding") {
      val rows = (1 to 200).map(i =>
        (s"g${i % 3}", (i % 7).toString, i.toLong * 11 % 97))
      val df = rows.toDF("g", "shard", "v")
      val merged = IncrementalAgg.mergeStates(
        IncrementalAgg.partialStates(df, Seq("g"), "shard", "v"), Seq("g"))
        .select(col("g"), col("n"), col("sum_v").cast("long"),
          col("min_v"), col("max_v"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val direct = rows.groupBy(_._1).map { case (g, rs) =>
        (g, rs.size.toLong, rs.map(_._3).sum, rs.map(_._3).min,
          rs.map(_._3).max)
      }.toSet
      merged shouldBe direct
      // a different sharding yields the identical totals
      val merged2 = IncrementalAgg.mergeStates(
        IncrementalAgg.partialStates(
          df.withColumn("shard", (col("v") % 2).cast("string")),
          Seq("g"), "shard", "v"), Seq("g"))
        .select(col("g"), col("n"), col("sum_v").cast("long"),
          col("min_v"), col("max_v"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      merged2 shouldBe direct
    }
  }

  describe("Cooccur") {
    it("pmiComponents matches hand-counted doc co-occurrence in the band") {
      // 10 docs; "alpha" in all 10 (above band), "beta" in 5, "gamma"
      // in 4 of beta's 5, "rare" in 1 (below band)
      val docs = (1 to 10).map { i =>
        val words = Seq("alpha") ++
          (if (i <= 5) Seq("beta") else Nil) ++
          (if (i >= 2 && i <= 5) Seq("gamma") else Nil) ++
          (if (i == 1) Seq("rare") else Nil)
        (i.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      val got = Cooccur.pmiComponents(docs, minDf = 2, maxDf = 8,
        minPairCount = 2)
        .as[(String, String, Long, Long, Long)].collect().toSet
      got shouldBe Set(("beta", "gamma", 4L, 5L, 4L))
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.CollectCapped.collectCapped

/** collect_capped: bounded-memory grouped collection — full array when
  * the group holds at most `cap` non-null elements, NULL past the cap.
  * The repartition(7) variants force serialize/deserialize + merge of
  * partial buffers across shuffle (the ObjectHashAggregate partial
  * path), not just the single-partition update loop. */
class AggExpressionsSpec extends SparkSpec {
  import spark.implicits._

  describe("CollectCapped") {
    it("returns the full group below the cap and NULL above it") {
      val df = Seq(
        ("a", 1), ("a", 2), ("a", 3),
        ("b", 10), ("b", 11), ("b", 12), ("b", 13),
        ("c", 7)).toDF("k", "v")
      val got = df.repartition(7, col("v"))
        .groupBy("k").agg(collectCapped(col("v"), 3).as("vs"))
        .collect().map(r => r.getString(0) ->
          Option(r.getSeq[Int](1)).map(_.sorted)).toMap
      got("a") shouldBe Some(Seq(1, 2, 3))
      got("b") shouldBe None // 4 > cap → NULL, not a truncated list
      got("c") shouldBe Some(Seq(7))
    }

    it("skips nulls like collect_list and counts only non-null values") {
      val df = Seq(("a", Some(1)), ("a", None), ("a", Some(2)),
        ("a", None)).toDF("k", "v")
      val got = df.repartition(7)
        .groupBy("k").agg(collectCapped(col("v"), 2).as("vs"))
        .collect()(0).getSeq[Int](1).sorted
      got shouldBe Seq(1, 2) // the two nulls don't count toward cap=2
    }

    it("collects struct elements across shuffled partials") {
      val df = (1 to 5).map(i => ("k", i, i * 10)).toDF("k", "id", "pos")
      val got = df.repartition(7, col("id"))
        .groupBy("k")
        .agg(collectCapped(struct(col("id"), col("pos")), 10).as("occs"))
        .select(explode(col("occs")).as("o"))
        .select(col("o.id"), col("o.pos"))
        .as[(Int, Int)].collect().sorted
      got shouldBe (1 to 5).map(i => (i, i * 10))
    }

    it("plans as ObjectHashAggregate (not the sort-based fallback path)") {
      // the physical operator class, not performance: a regression in
      // sessionConfs (objectHashAggregate.sortBased.fallbackThreshold)
      // would silently re-route every grouped-collection to sort-agg
      val plan = Seq(("a", 1), ("b", 2)).toDF("k", "v")
        .groupBy("k").agg(collectCapped(col("v"), 4).as("vs"))
        .queryExecution.executedPlan.toString
      plan should include("ObjectHashAggregate")
      spark.conf.get(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
        .toInt should be >= 16384
    }

    it("a far-over-cap group stays NULL (overflow survives merges)") {
      val df = (1 to 10000).map(i => ("hot", i)).toDF("k", "v")
        .unionByName(Seq(("cold", 1)).toDF("k", "v"))
      val got = df.repartition(13, col("v"))
        .groupBy("k").agg(collectCapped(col("v"), 64).as("vs"))
        .collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
      got("hot") shouldBe true
      got("cold") shouldBe false
    }
  }
}

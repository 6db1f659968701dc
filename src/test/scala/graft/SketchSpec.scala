package graft

import org.apache.spark.sql.functions._
import graft.sketch.Hll
import graft.pipeline.Profile

/** HLL estimate accuracy + register-merge law; Profile null semantics. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  describe("Hll") {
    it("estimates within the standard error envelope (m=256 → ~6.5% σ)") {
      for (n <- Seq(500L, 20000L)) {
        val ids = spark.range(0, n).select(col("id").cast("string").as("k"))
        val est = Hll.estimate(Hll.registers(ids, col("k")))
          .select("estimate").as[Double].head()
        math.abs(est - n) / n should be < 0.2 // 3σ
      }
    }

    it("small-range correction keeps tiny cardinalities near-exact") {
      val ids = spark.range(0, 30).select(col("id").cast("string").as("k"))
      val est = Hll.estimate(Hll.registers(ids, col("k")))
        .select("estimate").as[Double].head()
      math.abs(est - 30) / 30.0 should be < 0.15
    }

    it("registers are duplicate-insensitive and merge by element-wise max") {
      val a = spark.range(0, 1000).select(col("id").cast("string").as("k"))
      val b = spark.range(500, 1500).select(col("id").cast("string").as("k"))
      val whole = Hll.registers(a.unionByName(b), col("k"))
      // shard registers, then merge = groupBy max — must equal the
      // one-shot registers over the (dup-containing) union
      val merged = Hll.registers(a, col("k"))
        .unionByName(Hll.registers(b, col("k")))
        .groupBy("bucket").agg(max("max_rho").as("max_rho"))
      merged.as[(Long, Long)].collect().toMap shouldBe
        whole.as[(Long, Long)].collect().toMap
    }
  }

  describe("Profile") {
    it("counts nulls and distincts per column in one pass") {
      val df = Seq(
        (Some(1), Some("a")), (Some(1), None), (None, Some("b")),
        (Some(2), Some("a"))).toDF("x", "s")
      val p = Profile.profile(df, Seq("x", "s"))
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      p("x") shouldBe ((4L, 1L, 2L))
      p("s") shouldBe ((4L, 1L, 2L))
    }
  }
}

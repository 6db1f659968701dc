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

    it("registers maintain incrementally over a stream (update-mode agg)") {
      implicit val sql = spark.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val input = MemoryStream[String]
      val q = Hll.registers(input.toDF().select(col("value").as("k")), col("k"))
        .writeStream.format("memory").queryName("hll_stream")
        .outputMode("update").start()
      try {
        input.addData((0 until 700).map(_.toString): _*)
        q.processAllAvailable()
        input.addData((500 until 1200).map(_.toString): _*)
        q.processAllAvailable()
        // update-mode sink holds every emitted version: the latest per
        // bucket (= max) must equal the one-shot batch registers
        val streamed = spark.table("hll_stream")
          .groupBy("bucket").agg(max("max_rho").as("max_rho"))
          .as[(Long, Long)].collect().toMap
        val batch = Hll.registers(
          spark.range(0, 1200).select(col("id").cast("string").as("k")),
          col("k")).as[(Long, Long)].collect().toMap
        streamed shouldBe batch
      } finally q.stop()
    }

    it("grouped registers equal per-group one-shot sketches") {
      val df = spark.range(0, 3000).select(
        (col("id") % 3).cast("string").as("g"), col("id").cast("string").as("k"))
      val grouped = Hll.registersBy(df, col("k"), Seq("g"))
        .as[(String, Long, Long)].collect().toSet
      val perGroup = (0 until 3).flatMap { g =>
        Hll.registers(df.filter(col("g") === g.toString), col("k"))
          .as[(Long, Long)].collect().map { case (b, r) => (g.toString, b, r) }
      }.toSet
      grouped shouldBe perGroup
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

  describe("Cms") {
    it("never undercounts, and bounds overcount by εN on a zipf-ish stream") {
      // key i appears ~1000/i times
      val stream = spark.range(1, 51).select(col("id"),
          explode(sequence(lit(1), (lit(1000) / col("id")).cast("int")))
            .as("rep"))
        .select(concat(lit("k"), col("id")).as("k"))
      val n = stream.count()
      val regs = graft.sketch.Cms.registers(stream, col("k"))
      val truth = stream.groupBy("k").count()
      val est = graft.sketch.Cms.estimate(regs,
        truth.select("k"), "k")
      val joined = est.join(truth, "k")
        .select(col("k"), col("est"), col("count")).as[(String, Long, Long)]
        .collect()
      joined.foreach { case (_, e, t) =>
        e should be >= t                       // CMS never undercounts
        e - t should be <= (math.E / 512 * n).toLong + 1 // εN envelope
      }
    }

    it("shard registers merge by element-wise sum") {
      val a = spark.range(0, 400).select(col("id").cast("string").as("k"))
      val b = spark.range(200, 600).select(col("id").cast("string").as("k"))
      val whole = graft.sketch.Cms.registers(a.unionByName(b), col("k"))
      val merged = graft.sketch.Cms.registers(a, col("k"))
        .unionByName(graft.sketch.Cms.registers(b, col("k")))
        .groupBy("depth", "slot").agg(sum("cnt").as("cnt"))
      merged.as[(Int, Long, Long)].collect().toSet shouldBe
        whole.as[(Int, Long, Long)].collect().toSet
    }
  }

  describe("Histogram") {
    it("quantile estimates land within one bin width of the exact percentile") {
      val df = spark.range(0, 10000).select(
        (pmod(hash(col("id")), lit(1000)).cast("double")).as("v"))
      val regs = graft.sketch.Histogram.registers(df, col("v"), 0.0, 1000.0, 50)
      val exact = df.selectExpr(
        "percentile(v, array(0.25, 0.5, 0.9)) as p").head().getSeq[Double](0)
      val est = graft.sketch.Histogram.quantiles(regs,
        Seq(0.25, 0.5, 0.9), 0.0, 1000.0, 50)
      est.map(_._2).zip(exact).foreach { case (e, x) =>
        math.abs(e - x) should be <= 20.0 // one bin width
      }
    }

    it("routes out-of-range values to the tail bins, drops nothing") {
      val df = Seq(-5.0, 0.0, 9.99, 10.0, 25.0).toDF("v")
      val regs = graft.sketch.Histogram.registers(df, col("v"), 0.0, 10.0, 2)
        .as[(Long, Long)].collect().toMap
      regs shouldBe Map(-1L -> 1L, 0L -> 1L, 1L -> 1L, 2L -> 2L)
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

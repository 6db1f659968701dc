package graft

import org.apache.spark.sql.functions._
import graft.operators.{ShortestPaths, TemporalJoins}

/** TemporalJoins (as-of, binned range) + ShortestPaths edge cases the
  * oracle gate can't reach: strict mode, equal-instant ties, empty
  * sides, multi-bin intervals, keyless (pure) range joins, unreachable
  * nodes, zero-weight edges. */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    ("A", 10L, 1), ("A", 20L, 2), ("A", 30L, 3), ("B", 15L, 4))
    .toDF("sym", "t", "trade_id")
  private def quotes = Seq(
    ("A", 5L, 100), ("A", 20L, 200), ("A", 25L, 250), ("C", 1L, 999))
    .toDF("sym", "qt", "px")

  describe("asOfJoin") {
    it("matches the latest right row at-or-before each left row") {
      val r = TemporalJoins.asOfJoin(trades, quotes, Seq("sym"), "t", "qt")
        .select("trade_id", "px").as[(Int, Option[Int])]
        .collect().toMap
      r shouldBe Map(1 -> Some(100), // qt=5 precedes t=10
        2 -> Some(200),              // inclusive: qt=20 == t=20
        3 -> Some(250),
        4 -> None)                   // sym B has no quotes at all
    }

    it("strict mode excludes the equal instant") {
      val r = TemporalJoins.asOfJoin(trades, quotes, Seq("sym"), "t", "qt",
          strict = true)
        .select("trade_id", "px").as[(Int, Option[Int])]
        .collect().toMap
      r(2) shouldBe Some(100) // qt=20 no longer admissible at t=20
      r(3) shouldBe Some(250) // 25 < 30 still is
    }

    it("breaks equal-instant right ties by the greatest tieBreak") {
      val dupQuotes = Seq(("A", 10L, 1, 7), ("A", 10L, 2, 9), ("A", 10L, 3, 8))
        .toDF("sym", "qt", "qid", "px")
      val r = TemporalJoins.asOfJoin(
        Seq(("A", 12L, 1)).toDF("sym", "t", "trade_id"), dupQuotes,
        Seq("sym"), "t", "qt", tieBreak = Seq("qid"))
      r.select("qid", "px").as[(Int, Int)].collect().toSeq shouldBe
        Seq((3, 8))
    }

    it("left rows keep all their columns; empty right yields all-null payload") {
      val r = TemporalJoins.asOfJoin(trades,
        quotes.filter(col("px") < 0), Seq("sym"), "t", "qt")
      r.count() shouldBe 4
      r.filter(col("px").isNotNull).count() shouldBe 0
      r.columns.toSeq shouldBe Seq("sym", "t", "trade_id", "px")
    }

    it("rejects colliding payload column names") {
      an[IllegalArgumentException] should be thrownBy
        TemporalJoins.asOfJoin(trades,
          quotes.withColumnRenamed("px", "trade_id"), Seq("sym"), "t", "qt")
    }
  }

  describe("rangeJoin") {
    // intervals: [0,25) spans bins 0-2, [10,20) sits inside bin 1, empty [30,30)
    def iv = Seq((1, 0L, 25L), (2, 10L, 20L), (3, 30L, 30L))
      .toDF("iv_id", "lo", "hi")
    def pts = Seq((10, 0L), (11, 9L), (12, 10L), (13, 19L),
      (14, 24L), (15, 25L)).toDF("pt_id", "p")

    it("matches exactly the containment pairs, each once (multi-bin intervals)") {
      val r = TemporalJoins.rangeJoin(iv, pts, Seq.empty,
          "lo", "hi", "p", binWidth = 10L)
        .select("iv_id", "pt_id").as[(Int, Int)].collect().toSeq.sorted
      r shouldBe Seq((1, 10), (1, 11), (1, 12), (1, 13), (1, 14),
        (2, 12), (2, 13))
      // half-open: p=25 not in [0,25); empty interval 3 matches nothing
    }

    it("respects equi-keys alongside the range") {
      val ivK = iv.withColumn("k", col("iv_id") % 2)
      val ptsK = pts.withColumn("k", col("pt_id") % 2)
      val r = TemporalJoins.rangeJoin(ivK, ptsK, Seq("k"),
          "lo", "hi", "p", binWidth = 10L)
        .select("iv_id", "pt_id").as[(Int, Int)].collect().toSeq.sorted
      r shouldBe Seq((1, 11), (1, 13), (2, 12))
    }

    it("agrees with the naive theta join on random data") {
      val ivR = spark.range(0, 40).select(col("id").as("iv_id"),
        (pmod(hash(col("id")), lit(97))).cast("long").as("lo"))
        .withColumn("hi", col("lo") + pmod(hash(col("iv_id") + 1000), lit(23)).cast("long"))
      val ptsR = spark.range(0, 200).select(col("id").as("pt_id"),
        pmod(hash(col("id") + 7), lit(120)).cast("long").as("p"))
      val binned = TemporalJoins.rangeJoin(ivR, ptsR, Seq.empty,
          "lo", "hi", "p", binWidth = 8L)
        .select("iv_id", "pt_id").as[(Long, Long)].collect().toSeq.sorted
      val naive = ivR.join(ptsR,
          col("p") >= col("lo") && col("p") < col("hi"))
        .select("iv_id", "pt_id").as[(Long, Long)].collect().toSeq.sorted
      binned shouldBe naive
    }
  }

  describe("ShortestPaths.sssp") {
    it("computes exact weighted distances; unreachable nodes are absent") {
      // a-b-c chain with a costly shortcut a-c; d-e disconnected
      val edges = ShortestPaths.undirected(Seq(
        ("a", "b", 2L), ("b", "c", 2L), ("a", "c", 10L), ("d", "e", 1L))
        .toDF("u", "v", "w"))
      val d = ShortestPaths.sssp(edges, "a")
        .as[(String, Long)].collect().toMap
      d shouldBe Map("a" -> 0L, "b" -> 2L, "c" -> 4L)
    }

    it("takes the min across duplicate edge statements and directions") {
      val edges = ShortestPaths.undirected(Seq(
        ("a", "b", 5L), ("b", "a", 3L), ("a", "b", 9L))
        .toDF("u", "v", "w"))
      edges.count() shouldBe 2 // one canonical pair, both directions
      ShortestPaths.sssp(edges, "b").as[(String, Long)]
        .collect().toMap shouldBe Map("b" -> 0L, "a" -> 3L)
    }

    it("handles zero-weight edges (still terminates)") {
      val edges = ShortestPaths.undirected(Seq(
        ("a", "b", 0L), ("b", "c", 1L)).toDF("u", "v", "w"))
      ShortestPaths.sssp(edges, "a").as[(String, Long)]
        .collect().toMap shouldBe Map("a" -> 0L, "b" -> 0L, "c" -> 1L)
    }
  }

  describe("intervalOverlapJoin (q138)") {
    import graft.operators.TemporalJoins

    def a(rows: (String, Long, Long, Long)*) =
      rows.toDF("k", "a_id", "a_lo", "a_hi")
    def b(rows: (String, Long, Long, Long)*) =
      rows.toDF("k", "b_id", "b_lo", "b_hi")
    def join(l: org.apache.spark.sql.DataFrame,
        r: org.apache.spark.sql.DataFrame, w: Long) =
      TemporalJoins.intervalOverlapJoin(l, r, Seq("k"),
        "a_lo", "a_hi", "b_lo", "b_hi", w)
        .select("k", "a_id", "b_id").as[(String, Long, Long)]
        .collect().sorted.toSeq

    it("emits each overlapping pair exactly once even when both " +
        "intervals span many bins (canonical-bin dedup, no distinct)") {
      // [0, 100) × [50, 170) with binWidth 10: a covers 10 bins,
      // b covers 12, they share bins 5..9 — still ONE output row
      join(a(("k", 1L, 0L, 100L)), b(("k", 2L, 50L, 170L)), 10L) shouldBe
        Seq(("k", 1L, 2L))
    }

    it("half-open semantics: touching endpoints do not overlap; empty " +
        "intervals match nothing") {
      join(a(("k", 1L, 0L, 50L), ("k", 2L, 70L, 70L)),
        b(("k", 3L, 50L, 60L), ("k", 4L, 60L, 80L)), 25L) shouldBe Seq.empty
    }

    it("respects equi-keys and agrees with the naive theta join on " +
        "random data") {
      val rnd = new scala.util.Random(7)
      val la = a((0 until 120).map { i =>
        val lo = rnd.nextInt(500).toLong
        (s"k${i % 3}", i.toLong, lo, lo + rnd.nextInt(80).toLong)
      }: _*)
      val rb = b((0 until 120).map { i =>
        val lo = rnd.nextInt(500).toLong
        (s"k${i % 3}", i.toLong, lo, lo + rnd.nextInt(80).toLong)
      }: _*)
      val binned = join(la, rb, 32L)
      val naive = la.join(rb, Seq("k"))
        .filter(col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi") &&
          col("a_hi") > col("a_lo") && col("b_hi") > col("b_lo"))
        .select("k", "a_id", "b_id").as[(String, Long, Long)]
        .collect().sorted.toSeq
      binned shouldBe naive
      naive should not be empty
    }
  }
}

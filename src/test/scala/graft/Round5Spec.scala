package graft

import org.apache.spark.sql.functions._
import graft.sketch.{Bloom, Frequent}
import graft.dedup.Dedup
import graft.pipeline.{Behavior, Stats}
import graft.operators.Pareto

/** Round-5 operators: Bloom filter, exact heavy hitters, substring-span
  * dedup, behavioral analytics, exact regression components, skyline. */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  describe("Bloom") {
    it("has no false negatives and a bounded false-positive rate") {
      val members = spark.range(0, 1000).select(col("id").cast("string").as("k"))
      val bits = Bloom.setBits(members, col("k"), m = 16384, k = 4)
      // every member passes
      Bloom.filterMaybeContains(members, bits, col("k"), m = 16384, k = 4)
        .count() shouldBe 1000L
      // non-members: FP rate ≈ (1 − e^(−kn/m))^k ≈ 0.24% at n/m = 1/16;
      // assert well under 5%
      val probes = spark.range(100000, 110000)
        .select(col("id").cast("string").as("k"))
      val fp = Bloom.filterMaybeContains(probes, bits, col("k"),
        m = 16384, k = 4).count()
      fp.toDouble / 10000 should be < 0.05
    }

    it("sharded filters merge by union-distinct to the one-shot filter") {
      val a = spark.range(0, 500).select(col("id").cast("string").as("k"))
      val b = spark.range(500, 1000).select(col("id").cast("string").as("k"))
      val all = spark.range(0, 1000).select(col("id").cast("string").as("k"))
      val merged = Bloom.setBits(a, col("k")).union(Bloom.setBits(b, col("k")))
        .distinct().as[Long].collect().sorted
      Bloom.setBits(all, col("k")).as[Long].collect().sorted shouldBe merged
    }

    it("prefilterJoin returns exactly the plain join's rows") {
      val big = spark.range(0, 5000).select(col("id").as("key"),
        (col("id") * 7).as("payload"))
      val small = spark.range(0, 5000).filter(col("id") % 83 === 0)
        .select(col("id").as("key"), (col("id") + 1).as("dim"))
      val expected = big.join(small, Seq("key"))
        .select("key", "payload", "dim").as[(Long, Long, Long)]
        .collect().sorted
      Bloom.prefilterJoin(big, small, "key")
        .select("key", "payload", "dim").as[(Long, Long, Long)]
        .collect().sorted shouldBe expected
    }
  }

  describe("Frequent") {
    it("CMS-pruned heavy hitters equal the exact groupBy-HAVING result") {
      // skewed stream: key i appears i times for i in 1..60
      val rows = (1 to 60).flatMap(i => Seq.fill(i)(i.toString))
      val df = rows.toDF("k")
      val got = Frequent.frequentKeys(df, col("k"), minFreq = 40)
        .as[(String, Long)].collect().toSet
      val want = rows.groupBy(identity).collect {
        case (k, v) if v.size >= 40 => (k, v.size.toLong)
      }.toSet
      got shouldBe want
      want should not be empty
    }
  }

  describe("Dedup.sharedSpanPairs") {
    // ten filler docs with disjoint vocabularies, plus two docs sharing
    // one literal 9-token span
    val span = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val docs = Seq(
      (1L, s"intro words here $span closing remark one"),
      (2L, s"different lead $span other tail entirely words"),
      (3L, "unrelated text about nothing shared with anyone at all"),
      (4L, "more filler completely disjoint vocabulary for this doc")
    ).toDF("doc_id", "text")

    it("finds the exact shared span length between the two documents") {
      val got = Dedup.sharedSpanPairs(docs, minSpanTokens = 8)
        .as[(Long, Long, Long)].collect()
      got shouldBe Array((1L, 2L, 9L))
    }

    it("stays empty below the threshold and for disjoint docs") {
      Dedup.sharedSpanPairs(docs, minSpanTokens = 10).count() shouldBe 0L
    }

    it("the occurrence cap splits runs through ubiquitous shingles") {
      // make the middle shingle of the span ubiquitous: 5 extra docs
      // repeat "delta echo foxtrot" so its occ exceeds the cap of 7
      val noisy = docs.union(
        (10L to 14L).map(i => (i, "delta echo foxtrot " * 3)).toSeq
          .toDF("doc_id", "text"))
      val spans = Dedup.sharedSpanPairs(noisy, minSpanTokens = 3,
          maxOcc = 7)
        .filter(col("id1") === 1L && col("id2") === 2L)
        .select("max_span_tokens").as[Long].collect()
      // the 9-token run breaks where capped shingles drop out: the
      // longest surviving fragment is shorter than 9 but ≥ 3
      spans.length shouldBe 1
      spans.head should be < 9L
      spans.head should be >= 3L
    }
  }

  describe("Dedup.containmentPairs") {
    it("finds a short doc quoted in a long one — the pair Jaccard's " +
        "length filter rejects") {
      val quote = "alpha bravo charlie delta echo foxtrot"
      val docs = Seq(
        (1L, quote), // 4 shingles, all inside doc 2
        (2L, s"lead in words then $quote and a very long tail of many " +
          "extra unrelated tokens stretching the container document"),
        (3L, "entirely disjoint vocabulary for the third document here"))
        .toDF("doc_id", "text")
      val got = Dedup.containmentPairs(docs, thresholdPpm = 800000L)
        .select("id_contained", "id_container").as[(Long, Long)]
        .collect().toSeq
      got shouldBe Seq((1L, 2L)) // asymmetric: 2 is NOT contained in 1
      // and Jaccard at any reasonable threshold misses the pair
      Dedup.ngramJaccardPairs(docs, threshold = 0.5).count() shouldBe 0L
    }
  }

  describe("Behavior") {
    it("transitions counts only within-session consecutive steps") {
      val ev = Seq(
        // user 1: a→b (2 min), b→c (10 min), session break, c→a ignored
        (1L, 1L, "a", 0L),
        (1L, 2L, "b", 120000L),
        (1L, 3L, "c", 720000L),
        (1L, 4L, "a", 720000L + 1800001L),
        // user 2: one lonely event — no steps
        (2L, 5L, "a", 0L)
      ).toDF("user_id", "event_id", "event_type", "epoch_ms")
      val got = Behavior.transitions(ev)
        .as[(String, String, Long)].collect().toSet
      got shouldBe Set(("a", "b", 1L), ("b", "c", 1L))
    }

    it("debounce keeps one row per chained burst, per (key, kind)") {
      val ev = Seq(
        // burst: 0, +4min, +8min (each within 5min of the previous) —
        // only the first survives even though 8min > gap from start
        (1L, 1L, "err", 0L), (1L, 2L, "err", 240000L),
        (1L, 3L, "err", 480000L),
        // new burst after a 10-min silence
        (1L, 4L, "err", 1200000L),
        // other kind is an independent stream
        (1L, 5L, "ok", 100000L))
        .toDF("user_id", "event_id", "event_type", "epoch_ms")
      Behavior.debounce(ev, gapMs = 300000L)
        .select("event_id").as[Long].collect().sorted shouldBe
          Array(1L, 4L, 5L)
    }

    it("cohort retention: offset 0 equals cohort size") {
      val week = 604800000L
      val ev = Seq(
        (1L, 0L), (1L, week + 1), (1L, 3 * week),   // cohort 0, offsets 0,1,3
        (2L, 2L), (2L, 3 * week + 5),                // cohort 0, offsets 0,3
        (3L, week), (3L, 2 * week)                   // cohort 1, offsets 0,1
      ).toDF("user_id", "epoch_ms")
      val got = Behavior.cohortRetention(ev)
        .as[(Long, Long, Long)].collect().toSet
      got shouldBe Set(
        (0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 2L),
        (1L, 0L, 1L), (1L, 1L, 1L))
    }
  }

  describe("Resample.gapFill") {
    it("carries the last value into gaps; later keys span less") {
      val day = 86400000L
      val ev = Seq(
        // user 1: days 0 and 3 observed (two obs on day 0 — later wins)
        (1L, 1L, 10.0, 100L), (1L, 2L, 11.0, 200L),
        (1L, 3L, 30.0, 3 * day + 5),
        // user 2: born on day 2
        (2L, 4L, 99.0, 2 * day))
        .toDF("user_id", "event_id", "value", "ms")
      val got = graft.pipeline.Resample.gapFill(ev,
        "user_id", "ms", "value", "event_id")
        .as[(Long, Long, Double, Boolean)].collect().toSet
      got shouldBe Set(
        (1L, 0L, 11.0, true), (1L, 1L, 11.0, false),
        (1L, 2L, 11.0, false), (1L, 3L, 30.0, true),
        (2L, 2L, 99.0, true), (2L, 3L, 99.0, false))
    }
  }

  describe("Stats.regressionComponents") {
    it("matches the hand-computed sufficient statistics and slope") {
      val df = Seq(("g", 1L, 2L), ("g", 2L, 4L), ("g", 3L, 7L))
        .toDF("grp", "x", "y")
      val r = Stats.regressionComponents(df, Seq("grp"), col("x"), col("y"))
        .as[(String, Long, Double, Double, Double, Double, Double, Double)]
        .head()
      // n=3, Σx=6, Σy=13, Σx²=14, Σxy=31
      r shouldBe (("g", 3L, 6.0, 13.0, 14.0, 31.0,
        3.0 * 31 - 6 * 13,   // 15
        3.0 * 14 - 36))      // 6  → slope 2.5
    }

    it("sigmaOutliers flags exactly the >3σ rows, integer-exact") {
      // group g: 20 values of 10 plus one spike of 1000
      val vals = Seq.fill(20)(10L) :+ 1000L
      val df = vals.zipWithIndex
        .map { case (v, i) => ("g", i.toLong, v) }.toDF("g", "id", "v")
      val flagged = Stats.sigmaOutliers(df, Seq("g"), col("v"))
        .select("id", "v").as[(Long, Long)].collect().toSeq
      flagged shouldBe Seq((20L, 1000L))
      // hand check: n=21, μ≈57.1, σ≈210.5 → only the spike exceeds 3σ
      val n = vals.size.toDouble
      val mu = vals.sum / n
      val sd = math.sqrt(vals.map(v => (v - mu) * (v - mu)).sum / (n * n) * n)
      vals.count(v => math.abs(v - mu) > 3 * sd) shouldBe 1
    }

    it("exactQuantiles / winsorize clip to the discrete group quantiles") {
      // 1..100 in one group: p05 (lower discrete) = 5, p95 = 95
      val df = (1L to 100L).map(("g", _)).toDF("g", "v")
      Stats.exactQuantiles(df, Seq("g"), col("v"), Seq(50000L, 950000L))
        .as[(String, Long, Long)].head() shouldBe ("g", 5L, 95L)
      val w = Stats.winsorize(df, Seq("g"), col("v"))
      w.agg(min(col("clipped")), max(col("clipped")))
        .as[(Long, Long)].head() shouldBe ((5L, 95L))
      w.filter(col("v") === 50L).select("clipped").as[Long]
        .head() shouldBe 50L // interior values untouched
    }

    it("weightedMedian picks the lower weighted median, ties pooled") {
      // g1: values 1(w3), 2(w1), 5(w2) → total 6, cum(1)=3 <6/2·2? 2·3≥6 ✓ → 1
      // g2: 10(w1), 20(w1), 20(w1), 30(w1) → total 4, cum(10)=1, cum(20)=3 → 20
      val df = Seq(
        ("g1", 1L, 3L), ("g1", 2L, 1L), ("g1", 5L, 2L),
        ("g2", 10L, 1L), ("g2", 20L, 1L), ("g2", 20L, 1L), ("g2", 30L, 1L))
        .toDF("g", "v", "w")
      Stats.weightedMedian(df, Seq("g"), col("v"), col("w"))
        .as[(String, Long)].collect().toSet shouldBe
          Set(("g1", 1L), ("g2", 20L))
    }
  }

  describe("Pareto.skyline2") {
    it("equals the brute-force dominance filter, across partitions") {
      // deterministic pseudo-random points, forced through many small
      // partitions so the cross-partition prefix seed is exercised
      val pts = (1 to 500).map { i =>
        val x = (i * 2654435761L) % 1000
        val y = (i * 40503L) % 1000
        (x, y)
      }
      val df = pts.toDF("x", "y").repartition(13)
      val got = Pareto.skyline2(df, col("x"), col("y"))
        .as[(Long, Long)].collect().toSet
      val distinct = pts.distinct
      val want = distinct.filter { case (x, y) =>
        !distinct.exists { case (a, b) =>
          a >= x && b >= y && (a > x || b > y) }
      }.toSet
      got shouldBe want
      want.size should be > 1
    }

    it("a single all-dominating point yields a singleton skyline") {
      val df = Seq((1L, 1L), (2L, 3L), (5L, 9L), (4L, 2L))
        .toDF("x", "y")
      Pareto.skyline2(df, col("x"), col("y"))
        .as[(Long, Long)].collect().toSet shouldBe Set((5L, 9L))
    }
  }
}

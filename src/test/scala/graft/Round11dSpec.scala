package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Layout, Privacy}
import graft.sketch.{Bloom, Kmv}
import graft.text.{Decontaminate, Memorization}
import graft.dedup.Dedup

/** Round-11 fourth batch: privacy audit, memorization audit, Bloom
  * prefilter fix, KMV sketch, z-order layout, takedown propagation. */
class Round11dSpec extends SparkSpec {

  describe("Privacy.kAnonymityAudit") {
    import spark.implicits._
    // (zip, age) QI; salary sensitive. Group A: 3 rows 2 salaries;
    // group B: 1 row; group C: 4 rows 4 salaries.
    val rows = Seq(
      ("94110", 30, 100), ("94110", 30, 100), ("94110", 30, 200),
      ("94110", 31, 50),
      ("10001", 40, 10), ("10001", 40, 20), ("10001", 40, 30),
      ("10001", 40, 40)
    ).toDF("zip", "age", "salary")

    it("flags sub-k groups and sub-l groups, passes the rest") {
      val bad = Privacy.kAnonymityAudit(rows, Seq("zip", "age"),
        "salary", k = 3, l = 3).collect()
      val byKey = bad.map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3)))).toMap
      // A: n=3 passes k but 2 distinct salaries < l=3 → flagged
      byKey(("94110", 30)) shouldBe ((3L, 2L))
      // B: n=1 < k → flagged
      byKey(("94110", 31)) shouldBe ((1L, 1L))
      // C passes both
      byKey.keySet should not contain (("10001", 40))
    }

    it("summary reports achieved k and rows at risk") {
      val s = Privacy.kAnonymitySummary(rows, Seq("zip", "age"),
        "salary", k = 3, l = 3).collect()(0)
      s.getLong(0) shouldBe 3L // n_groups
      s.getLong(1) shouldBe 2L // n_violating
      s.getLong(2) shouldBe 1L // rows_at_risk (only sub-k group B)
      s.getLong(3) shouldBe 1L // min_group_n = achieved k
    }

    it("suppression leaves a k-anonymous remainder, null QI handled") {
      val withNull = rows.unionByName(
        Seq((null.asInstanceOf[String], 99, 1)).toDF("zip", "age", "salary"))
      val kept = Privacy.suppressSmallGroups(withNull, Seq("zip", "age"), 3)
      kept.count() shouldBe 7L // drops group B (1 row) and the null row
      val sizes = kept.groupBy("zip", "age").count()
        .select(min("count")).collect()(0).getLong(0)
      sizes should be >= 3L
    }
  }

  describe("Memorization") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown dog sits"),
      (3L, "the quick brown cat naps the quick brown cat naps"),
      (4L, "entirely unique words here")
    ).toDF("doc_id", "text")

    it("repeatedNgrams counts distinct docs and raw occurrences") {
      val r = Memorization.repeatedNgrams(docs, n = 3, minDocs = 3)
        .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      // 'the quick brown' in docs 1,2,3; doc 3 has it twice → 4 occ
      r should contain(("the quick brown", 3L, 4L))
      // 'quick brown cat' only in doc 3 (twice) → below minDocs
      r.map(_._1) should not contain "quick brown cat"
    }

    it("exposure scores docs by repeated-gram share") {
      val e = Memorization.exposure(docs, n = 3, minDocs = 3).collect()
        .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2)))).toMap
      e(1L)._2 shouldBe 1L // one distinct repeated gram
      e(4L) shouldBe ((2L, 0L)) // no repeated grams, still reported
    }
  }

  describe("Bloom.filterMaybeContains (repeated-key fix)") {
    import spark.implicits._
    it("keeps every true member even when a key repeats across rows") {
      val members = Seq("a", "a", "a", "b", "b").toDF("k")
      val bits = Bloom.setBits(Seq("a", "b").toDF("k"), col("k"), 256, 3)
      Bloom.filterMaybeContains(members, bits, col("k"), 256, 3)
        .count() shouldBe 5L
    }
    it("overlapReportBloom equals the exact overlapReport") {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 7 =!= 0)
      val bench = docs.filter(col("doc_id") % 7 === 0)
      val exact = Decontaminate.overlapReport(corpus, bench, n = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val bloom = Decontaminate
        .overlapReportBloom(corpus, bench, n = 2, m = 2048, kHash = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      bloom shouldBe exact
      exact.length should be > 0
    }
  }

  describe("Kmv sketch") {
    import spark.implicits._
    val df = (1 to 200).map(i => (s"g${i % 3}", s"v${i % 40}"))
      .toDF("g", "v")

    it("registers are the k smallest distinct hashes, deterministic") {
      val r1 = Kmv.registers(df, Seq("g"), col("v"), k = 8)
      val r2 = Kmv.registers(df.repartition(7), Seq("g"), col("v"), k = 8)
      r1.collect().map(r => (r.getString(0), r.getLong(1))).sorted shouldBe
        r2.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      r1.groupBy("g").count().collect()
        .foreach(_.getLong(1) should be <= 8L)
    }

    it("merge law: registers(A ∪ B) == merge(registers(A), registers(B))") {
      val a = df.filter(col("v").substr(2, 2).cast("int") % 2 === 0)
      val b = df.filter(col("v").substr(2, 2).cast("int") % 2 =!= 0)
      val whole = Kmv.registers(df, Seq("g"), col("v"), k = 8)
        .select("g", "h").collect().map(r => (r.getString(0), r.getLong(1)))
      val merged = Kmv.merge(
        Kmv.registers(a, Seq("g"), col("v"), k = 8).unionByName(
          Kmv.registers(b, Seq("g"), col("v"), k = 8)),
        Seq("g"), k = 8)
        .select("g", "h").collect().map(r => (r.getString(0), r.getLong(1)))
      merged.sorted shouldBe whole.sorted
    }

    it("small groups estimate exactly; estimator tracks true distinct") {
      val regs = Kmv.registers(df, Seq("g"), col("v"), k = 64)
      val est = Kmv.distinctEstimates(regs, Seq("g"), k = 64).collect()
        .map(r => (r.getString(0), r.getDouble(3))).toMap
      // each group holds < 64 distinct values → register count IS exact
      val truth = df.select("g", "v").distinct().groupBy("g").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      truth.foreach { case (g, n) => est(g) shouldBe n.toDouble }
    }

    it("pairwiseOverlap: identical sets → ppm 1e6, disjoint → 0, " +
        "difference counts partition the union") {
      val same = Seq(("a", "x1"), ("a", "x2"), ("a", "x3"),
        ("b", "x1"), ("b", "x2"), ("b", "x3"),
        ("c", "y1"), ("c", "y2")).toDF("g", "v")
      val regs = Kmv.registers(same, Seq("g"), col("v"), k = 8)
      val o = Kmv.pairwiseOverlap(regs, "g", k = 8).collect()
        .map(r => ((r.getString(0), r.getString(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6)))).toMap
      o(("a", "b")) shouldBe ((3L, 3L, 0L, 0L, 1000000L))
      o(("a", "c")) shouldBe ((5L, 0L, 3L, 2L, 0L))
    }
  }

  describe("Layout (z-order)") {
    import spark.implicits._

    it("zorderKey interleaves bits (worked 2-D example)") {
      // x=0b101=5, y=0b011=3 → key bits x@even y@odd:
      // i0: x1→b0, y1→b1; i1: x0→b2, y1→b3; i2: x1→b4, y0→b5
      // = 0b011011 = 27
      val r = Seq((5L, 3L)).toDF("x", "y")
        .select(Layout.zorderKey(Seq(col("x"), col("y")), 3).as("z"))
        .collect()(0).getLong(0)
      r shouldBe 27L
    }

    it("scaleToBits maps [lo,hi] onto [0, 2^bits) with clamping") {
      val out = Seq(0L, 50L, 100L, 200L).toDF("x")
        .select(Layout.scaleToBits(col("x"), lit(0L), lit(100L), 8).as("s"))
        .collect().map(_.getLong(0))
      out shouldBe Array(0L, 127L, 255L, 255L)
    }

    it("writeZOrdered produces non-overlapping z-ranges per file") {
      val dir = java.nio.file.Files
        .createTempDirectory("zorder").toString
      val df = spark.range(0, 4096).select(
        (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
      Layout.writeZOrdered(df, s"$dir/t", "x", "y",
        0L, 63L, 0L, 63L, bits = 6, numFiles = 8)
      val back = spark.read.parquet(s"$dir/t")
      back.count() shouldBe 4096L
      // re-derive each file's z-range; ranges must not overlap
      val ranges = back
        .withColumn("z", Layout.zorderKey2(col("x"), lit(0L), lit(63L),
          col("y"), lit(0L), lit(63L), 6))
        .withColumn("f", input_file_name())
        .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      ranges.length should be > 1
      ranges.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) => lo2 should be > hi1
        case _ =>
      }
    }

    it("zBucketStats buckets are tight rectangles on BOTH dims") {
      val df = spark.range(0, 4096).select(
        (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
      val stats = Layout.zBucketStats(df, "x", "y",
        bits = 6, prefixBits = 4).collect()
      stats.length shouldBe 16
      stats.foreach { r =>
        val (xmin, xmax) = (r.getLong(2), r.getLong(3))
        val (ymin, ymax) = (r.getLong(4), r.getLong(5))
        // a 4-bit prefix of a 6+6-bit key = 16x16 tiles
        (xmax - xmin) should be <= 16L
        (ymax - ymin) should be <= 16L
      }
    }
  }

  describe("Stats drift buckets + PSI") {
    import spark.implicits._
    import graft.pipeline.Stats
    it("bucket counts, shares, and the identical-distribution zero") {
      val a = Seq(10L, 20L, 110L, 120L).toDF("v")
      val bkts = Stats.driftBuckets(a, a, "v", 100L).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      bkts(0L) shouldBe ((2L, 2L, 500000L, 500000L))
      bkts(1L) shouldBe ((2L, 2L, 500000L, 500000L))
      Stats.psi(Stats.driftBuckets(a, a, "v", 100L))
        .collect()(0).getDouble(0) shouldBe 0.0 +- 1e-12
    }
    it("a vanished bucket contributes a large finite PSI term") {
      val a = Seq(10L, 20L, 110L, 120L).toDF("v")
      val b = Seq(10L, 20L, 30L, 40L).toDF("v")
      val p = Stats.psi(Stats.driftBuckets(a, b, "v", 100L))
        .collect()(0).getDouble(0)
      p should be > 0.25 // "shifted" band: half the mass moved buckets
      p.isInfinite shouldBe false
    }
    it("null values are excluded before bucketing — never an " +
        "unmergeable NULL bucket, shares over non-null rows") {
      val a = Seq(Some(10L), None, Some(110L)).toDF("v")
      val b = Seq(Some(20L), None, None).toDF("v")
      val rows = Stats.driftBuckets(a, b, "v", 100L).collect()
      // no NULL bucket row at all (the old shape emitted TWO — one
      // per side — because the equality merge can't match NULL keys)
      rows.foreach(r => r.isNullAt(0) shouldBe false)
      val bkts = rows.map(r => (r.getLong(0), (r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      bkts(0L) shouldBe ((1L, 1L, 500000L, 1000000L))
      bkts(1L) shouldBe ((1L, 0L, 500000L, 0L))
      bkts.size shouldBe 2
    }
  }

  describe("ORC roundtrip (built-in columnar sibling of parquet)") {
    it("writes and reads back documents losslessly with pushdown on") {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("orc").toString
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
      docs.write.mode("overwrite").orc(s"$dir/docs")
      val back = spark.read.orc(s"$dir/docs")
      back.count() shouldBe docs.count()
      back.filter(col("lang") === "en").count() shouldBe
        docs.filter(col("lang") === "en").count()
      val plan = back.filter(col("doc_id") > 10)
        .queryExecution.executedPlan.toString
      plan should include("PushedFilters")
    }
  }

  describe("Cms.joinSizeEstimate") {
    import spark.implicits._
    import graft.sketch.Cms
    it("never undercounts; collision-free geometry is exact") {
      val a = Seq("k1", "k1", "k2", "k3").toDF("k")
      val b = Seq("k1", "k2", "k2", "k9").toDF("k")
      // true |A join B| = 2*1 (k1) + 1*2 (k2) = 4
      val est = Cms.joinSizeEstimate(
        Cms.registers(a, col("k"), depth = 4, width = 4096),
        Cms.registers(b, col("k"), depth = 4, width = 4096))
        .collect()(0).getDecimal(0).longValueExact()
      est should be >= 4L
      est shouldBe 4L // 5 keys in 4096 slots: no collisions
    }
    it("empty PROBE side also estimates zero (depths from either side)") {
      val a = Seq("k1", "k2").toDF("k")
      val est = Cms.joinSizeEstimate(
        Cms.registers(a.filter(col("k") === "nope"), col("k"),
          depth = 4, width = 64),
        Cms.registers(a, col("k"), depth = 4, width = 64))
        .collect()(0)
      est.isNullAt(0) shouldBe false
      est.getDecimal(0).longValueExact() shouldBe 0L
    }
    it("empty build side estimates zero, not null") {
      val a = Seq("k1", "k2").toDF("k")
      val b = a.filter(col("k") === "nope")
      val est = Cms.joinSizeEstimate(
        Cms.registers(a, col("k"), depth = 4, width = 64),
        Cms.registers(b, col("k"), depth = 4, width = 64))
        .collect()(0)
      est.isNullAt(0) shouldBe false
      est.getDecimal(0).longValueExact() shouldBe 0L
    }
    it("estimate dominates the exact join size on real keys") {
      val a = (1L to 500L).toDF("k")
      val b = (250L to 1000L).flatMap(x => Seq(x, x)).toDF("k")
      val exact = a.join(b, Seq("k")).count()
      val est = Cms.joinSizeEstimate(
        Cms.registers(a, col("k"), depth = 4, width = 512),
        Cms.registers(b, col("k"), depth = 4, width = 512))
        .collect()(0).getDecimal(0).longValueExact()
      est should be >= exact
    }
  }

  describe("RetrievalEval") {
    import spark.implicits._
    import graft.similarity.RetrievalEval
    // q1: relevant at ranks 2,3 of 3 rels; q2: nothing relevant in
    // top-k; q3: relevant at rank 1, the only rel.
    val results = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L),
      (3L, 30L, 1L), (3L, 31L, 2L)).toDF("qid", "nid", "rank")
    val rels = Seq((1L, 11L), (1L, 12L), (1L, 99L),
      (2L, 98L), (3L, 30L)).toDF("qid", "nid")

    it("perQuery: exact integer MRR/precision/recall") {
      val m = RetrievalEval.perQuery(results, rels, k = 3).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
      m(1L) shouldBe ((2L, 3L, 2L, 500000L, 666666L, 666666L))
      m(2L) shouldBe ((0L, 1L, 0L, 0L, 0L, 0L))
      m(3L) shouldBe ((1L, 1L, 1L, 1000000L, 333333L, 1000000L))
    }

    it("summary: truncating means over queries") {
      val s = RetrievalEval.summary(
        RetrievalEval.perQuery(results, rels, k = 3)).collect()(0)
      s.getLong(0) shouldBe 3L // n_queries
      s.getLong(1) shouldBe 3L // n_hits
      s.getLong(2) shouldBe 500000L // (500000+0+1000000)/3
    }

    it("summary of an EMPTY perQuery frame is the zero row, not NULLs") {
      val s = RetrievalEval.summary(
        RetrievalEval.perQuery(results.filter(col("qid") < 0L),
          rels, k = 3)).collect()(0)
      (0 until 5).foreach(i => s.isNullAt(i) shouldBe false)
      s.getLong(0) shouldBe 0L
      s.getLong(1) shouldBe 0L
      s.getLong(2) shouldBe 0L
      s.getLong(3) shouldBe 0L
      s.getLong(4) shouldBe 0L
    }

    it("ndcg and perQuery are invariant to duplicated qrels rows") {
      val dupRels = rels.unionByName(rels)
      val n1 = RetrievalEval.ndcg(results, rels, k = 3).collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toMap
      val n2 = RetrievalEval.ndcg(results, dupRels, k = 3).collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toMap
      n1.foreach { case (q, v) => n2(q) shouldBe v +- 1e-12 }
      val m1 = RetrievalEval.perQuery(results, rels, k = 3).collect()
        .map(r => (r.getLong(0), r.getLong(4))).toMap
      val m2 = RetrievalEval.perQuery(results, dupRels, k = 3).collect()
        .map(r => (r.getLong(0), r.getLong(4))).toMap
      m1 shouldBe m2
    }

    it("ndcg: perfect single-rel ranking scores 1.0, misses 0.0") {
      val n = RetrievalEval.ndcg(results, rels, k = 3).collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toMap
      n(3L) shouldBe 1.0 +- 1e-12
      n(2L) shouldBe 0.0
      // q1: DCG = 1/log2(3) + 1/log2(4); IDCG = 1 + 1/log2(3) + 1/log2(4)
      val dcg = 1.0 / (math.log(3) / math.log(2)) + 0.5
      val idcg = 1.0 + dcg
      n(1L) shouldBe (dcg / idcg) +- 1e-12
    }
  }

  describe("Csv.parseWithQuarantine") {
    import spark.implicits._
    import graft.io.Csv
    val schema = new org.apache.spark.sql.types.StructType()
      .add("id", "long").add("name", "string").add("score", "int")

    it("routes good, short, and type-broken lines correctly") {
      val lines = Seq(
        "1,alice,10", // good
        "2,bob", // short: score null-fills, NOT corrupt-marked
        "x,carol,30", // bad long: corrupt record
        "4,dave,notanint", // bad int: corrupt record
        "5,eve,50" // good
      ).toDF("line")
      val parsed = Csv.parseWithQuarantine(lines, schema,
        required = Seq("id", "name", "score"))
      val (good, quarantine) = Csv.route(parsed)
      good.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .sorted shouldBe Array((1L, "alice", 10), (5L, "eve", 50))
      quarantine.as[String].collect().sorted shouldBe
        Array("2,bob", "4,dave,notanint", "x,carol,30")
      // conservation: ok + quarantined == input
      parsed.count() shouldBe 5L
    }

    it("quoted separators parse; corrupt-name collision avoided") {
      val s2 = new org.apache.spark.sql.types.StructType()
        .add("_corrupt", "string").add("v", "string")
      val lines = Seq("a,\"x,y\"").toDF("line")
      val parsed = Csv.parseWithQuarantine(lines, s2, required = Seq("v"))
      parsed.select("v").as[String].collect() shouldBe Array("x,y")
      parsed.select("ok").as[Boolean].collect() shouldBe Array(true)
    }
  }

  describe("Dedup.takedownManifest") {
    import spark.implicits._
    it("propagates seeds through clusters; lone seeds keep NULL cluster") {
      val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
        (11L, 10L)).toDF("id", "cluster")
      val seeds = Seq(2L, 99L).toDF("doc_id")
      val m = Dedup.takedownManifestFromLabels(labels, seeds)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
        .sortBy(_._1)
      m shouldBe Array((1L, 1L, "neardup"), (2L, 1L, "seed"),
        (3L, 1L, "neardup"), (99L, -1L, "seed"))
    }
    it("applyTakedown removes exactly the manifest") {
      val docs = Seq((1L, "a"), (2L, "b"), (5L, "c")).toDF("doc_id", "text")
      val manifest = Seq((1L, 1L, "seed")).toDF("doc_id", "cluster", "reason")
      Dedup.applyTakedown(docs, manifest).collect()
        .map(_.getLong(0)).sorted shouldBe Array(2L, 5L)
    }
  }
}

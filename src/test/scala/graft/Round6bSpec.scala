package graft

import org.apache.spark.sql.functions._
import graft.text.{Bpe, Chunker, Decontaminate, Pii}

/** Round-6 additions: PII detect/redact, benchmark decontamination,
  * sliding-window chunking, distributed BPE vocabulary induction, and
  * SemDeDup (cluster-confined semantic dedup). */
class Round6bSpec extends SparkSpec {
  import spark.implicits._

  describe("Pii (codegen regexp detect + redact)") {
    it("counts and redacts emails, IPv4s, and phones") {
      val df = Seq((1L,
        "mail a@b.co or x.y+z@ex.org, host 10.0.0.1 up, call +44-123-4567 now"),
        (2L, "no pii here at all")).toDF("doc_id", "text")
      val byId = Pii.piiStats(df).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      byId(1L) shouldBe ((2L, 1L, 1L))
      byId(2L) shouldBe ((0L, 0L, 0L))
      val red = Pii.redactDocs(df).as[(Long, String)].collect().toMap
      red(1L) shouldBe
        "mail <EMAIL> or <EMAIL>, host <IP> up, call <PHONE> now"
      red(2L) shouldBe "no pii here at all"
    }

    it("a dotted-quad 'email' domain is not an email (letter TLD " +
        "required); its IP still redacts") {
      val df = Seq((1L, "x user@10.0.0.1 y")).toDF("doc_id", "text")
      Pii.redactDocs(df).as[(Long, String)].collect().head._2 shouldBe
        "x user@<IP> y"
    }
  }

  describe("Decontaminate (benchmark n-gram overlap)") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix alpha beta gamma suffix words"),  // shares 1 3-gram
      (2L, "completely unrelated text with nothing shared here"),
      (3L, "beta gamma delta and alpha beta gamma too")) // shares 2
      .toDF("doc_id", "text")

    it("reports distinct shared-gram counts for contaminated docs only") {
      Decontaminate.overlapReport(corpus, bench, n = 3)
        .as[(Long, Long)].collect().toMap shouldBe
          Map(1L -> 1L, 3L -> 2L)
    }

    it("decontaminate drops exactly the flagged docs") {
      Decontaminate.decontaminate(corpus, bench, n = 3)
        .select("doc_id").as[Long].collect().toSeq shouldBe Seq(2L)
    }
  }

  describe("Chunker (sliding token windows)") {
    it("emits stepped windows with a short tail and provenance") {
      val df = Seq((7L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"))
        .toDF("doc_id", "text")
      val got = Chunker.chunk(df, chunkSize = 4, overlap = 2)
        .as[(Long, Long, Long, Long, String)].collect().toSeq.sortBy(_._2)
      got shouldBe Seq(
        (7L, 0L, 0L, 4L, "t1 t2 t3 t4"),
        (7L, 1L, 2L, 4L, "t3 t4 t5 t6"),
        (7L, 2L, 4L, 4L, "t5 t6 t7 t8"),
        (7L, 3L, 6L, 4L, "t7 t8 t9 t10"),
        (7L, 4L, 8L, 2L, "t9 t10"))
    }

    it("a doc shorter than one chunk yields exactly one window") {
      val df = Seq((1L, "only two")).toDF("doc_id", "text")
      Chunker.chunk(df, chunkSize = 16, overlap = 4)
        .as[(Long, Long, Long, Long, String)].collect().toSeq shouldBe
          Seq((1L, 0L, 0L, 2L, "only two"))
    }
  }

  describe("Bpe (distributed tokenizer training)") {
    it("mergePair merges greedily left-to-right without re-merging") {
      val words = Seq(("aaa", 1L)).toDF("word", "cnt")
      val got = Bpe.mergePair(Bpe.initSymbols(words), "a", "a")
        .select("syms").as[Seq[String]].collect().head
      got shouldBe Seq("aa", "a")
    }

    it("learns the classic low/lower/newest/widest merge sequence") {
      // Sennrich et al. 2016 running example (no </w> marker):
      // counts low:5, lower:2, newest:6, widest:3
      val docs = Seq((1L,
        (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
         Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
        .toDF("doc_id", "text")
      val merges = Bpe.learnMerges(docs, numMerges = 4)
        .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
      merges shouldBe Seq(
        (0L, "e", "s", 9L),   // es: newest 6 + widest 3 (tie with st → lex)
        (1L, "es", "t", 9L),  // est
        (2L, "l", "o", 7L),   // lo: low 5 + lower 2 (tie with ow → lex)
        (3L, "lo", "w", 7L))
      // segmentation with the learned merges reproduces the subwords
      val seg = Bpe.segment(docs, merges.map(m => (m._2, m._3)))
        .as[(String, Long, Seq[String])].collect()
        .map(r => r._1 -> r._3).toMap
      seg("low") shouldBe Seq("low")
      seg("newest") shouldBe Seq("n", "e", "w", "est")
      seg("widest") shouldBe Seq("w", "i", "d", "est")
      seg("lower") shouldBe Seq("low", "e", "r")
    }

    it("stops early when no pair reaches minCount") {
      val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
      Bpe.learnMerges(docs, numMerges = 10, minCount = 2L)
        .count() shouldBe 0L
    }
  }

  describe("LSH disk index (writeLshIndex / searchLshIndex)") {
    it("index-backed search equals nearDupSearch on both candidate paths") {
      val t1 = "alpha beta gamma delta epsilon zeta eta theta"
      val t2 = "one two three four five six seven eight nine"
      val corpus = Seq((100L, t1), (101L, t2 + " ten eleven"),
        (102L, "totally different words here nothing shared at all"))
        .toDF("doc_id", "text")
      val queries = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      val expect = graft.dedup.Dedup.nearDupSearch(corpus, queries)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val dir = java.nio.file.Files.createTempDirectory("lsh_idx").toString
      graft.dedup.Dedup.writeLshIndex(corpus, dir)
      // pushdown path (candidates fit the In() cap)...
      graft.dedup.Dedup.searchLshIndex(spark, dir, queries)
        .as[(Long, Long, Long, Long, Long)].collect().toSet shouldBe expect
      // ...and the distributed semi-join fallback (cap = 0)
      graft.dedup.Dedup.searchLshIndex(spark, dir, queries,
          maxCandidateIds = 0)
        .as[(Long, Long, Long, Long, Long)].collect().toSet shouldBe expect
      expect.map(r => (r._1, r._2)) should contain((1L, 100L))
    }
  }

  describe("Buckets.intDiv (integral division past 2^53)") {
    it("stays exact where double division rounds") {
      // 2^60 + 1 over 2: double math yields 2^59, intDiv (2^60+1) div 2
      val big = (1L << 60) + 1L
      val got = Seq((big, 2L)).toDF("a", "b")
        .select(graft.time.Buckets.intDiv(col("a"), col("b")).as("d"))
        .as[Long].collect().head
      got shouldBe big / 2
    }
  }

  describe("QualityModel (integer linear quality classifier)") {
    it("scores bias + weighted integer features, thresholds per token") {
      val df = Seq((1L, "the the zz"), (2L, "99")).toDF("doc_id", "text")
      // doc 1: f_tok=3 f_uniq=2 f_stop=2 f_digit=0 f_chars=10
      // doc 2: f_tok=1 f_uniq=1 f_stop=0 f_digit=2 f_chars=2
      val byId = graft.text.QualityModel.scoreLinear(df,
        Map("f_tok" -> 2L, "f_uniq" -> 3L, "f_stop" -> 5L,
          "f_digit" -> -4L, "f_chars" -> 1L),
        bias = 10L, thresholdPpm = 4000000L).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      // doc1: 10+6+6+10+0+10 = 42; 42 >= 4*3 → keep
      byId(1L) shouldBe ((42L, true))
      // doc2: 10+2+3+0-8+2 = 9; 9 >= 4*1 → keep
      byId(2L) shouldBe ((9L, true))
    }

    it("rejects unknown feature names eagerly") {
      val df = Seq((1L, "x")).toDF("doc_id", "text")
      an[IllegalArgumentException] should be thrownBy
        graft.text.QualityModel.scoreLinear(df, Map("nope" -> 1L))
    }
  }

  describe("Mixture (data-mixture planner)") {
    it("computes downsample rates and epoch factors per stratum") {
      // en: 6 toks, zh: 2 toks; budget 8 (the corpus total)
      val df = Seq(("en", "a b c"), ("en", "d e f"), ("zh", "g h"))
        .toDF("lang", "text")
      val got = graft.pipeline.Mixture.plan(df,
        Map("en" -> 250000L, "zh" -> 750000L))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
      // en: want 2 of 6 → keep 333333 ppm, 1 epoch
      got("en") shouldBe ((6L, 2L, 333333L, 1L))
      // zh: want 6 of 2 → keep capped at 1e6, 3 epochs
      got("zh") shouldBe ((2L, 6L, 1000000L, 3L))
    }

    it("gives absent strata target 0 and honors an explicit budget") {
      val df = Seq(("en", "a b"), ("xx", "c d")).toDF("lang", "text")
      val got = graft.pipeline.Mixture.plan(df, Map("en" -> 1000000L),
          budgetTokens = Some(10L))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
      got("en") shouldBe ((2L, 10L, 1000000L, 5L))
      got("xx") shouldBe ((2L, 0L, 0L, 0L))
    }
  }

  describe("shuffleDeterministic (reproducible pre-training permutation)") {
    it("assigns a dense 0-based permutation, identical across re-runs") {
      val df = (1L to 50L).map(i => (i, s"d$i")).toDF("doc_id", "x")
      val a = graft.pipeline.PipelineOps.shuffleDeterministic(df)
        .select("doc_id", "shuffle_idx").as[(Long, Long)].collect()
      a.map(_._2).sorted shouldBe (0L until 50L)
      // not the identity order (it IS a shuffle)
      a.sortBy(_._2).map(_._1).toSeq should not be (1L to 50L)
      val b = graft.pipeline.PipelineOps.shuffleDeterministic(
          df.repartition(7))
        .select("doc_id", "shuffle_idx").as[(Long, Long)].collect()
      b.toSet shouldBe a.toSet  // partitioning-independent
    }
  }

  describe("Urls (host extraction, caps, blocklists)") {
    it("normalizes hosts and returns null for non-URLs") {
      val df = Seq(
        (1L, "https://www.Example.COM/path?q=1"),
        (2L, "http://sub.site.org:8080/x"),
        (3L, "ftp+ssh://www.w.net"),
        (4L, "not a url"),
        (5L, "www.bare.com/no-scheme"))
        .toDF("doc_id", "url")
      df.select(col("doc_id"), graft.text.Urls.host(col("url")))
        .as[(Long, Option[String])].collect().toMap shouldBe Map(
          1L -> Some("example.com"), 2L -> Some("sub.site.org"),
          3L -> Some("w.net"), 4L -> None, 5L -> None)
    }

    it("caps per host deterministically and blocklists exactly") {
      val df = (1L to 10L).map(i =>
        (i, s"https://host${i % 2}.com/p$i")).toDF("doc_id", "url")
      val capped = graft.text.Urls.capPerHost(df, n = 2)
      capped.groupBy("host").count().as[(String, Long)].collect()
        .toMap.values.toSet shouldBe Set(2L)
      // identical on re-run (hash order, not rand)
      graft.text.Urls.capPerHost(df, n = 2).select("doc_id")
        .as[Long].collect().sorted shouldBe
          capped.select("doc_id").as[Long].collect().sorted
      graft.text.Urls.blocklistFilter(df, Seq("host0.com"))
        .select(graft.text.Urls.host(col("url"))).distinct()
        .as[String].collect().toSeq shouldBe Seq("host1.com")
    }
  }

  describe("randomized cross-checks (seeded)") {
    it("mergePair matches a local reference fold on random symbol runs") {
      val rnd = new scala.util.Random(42)
      def refMerge(syms: List[String], l: String,
          r: String): List[String] = syms match {
        case a :: b :: rest if a == l && b == r =>
          (a + b) :: refMerge(rest, l, r)
        case a :: rest => a :: refMerge(rest, l, r)
        case Nil => Nil
      }
      val cases = (1 to 40).map { i =>
        val word = (1 to (1 + rnd.nextInt(8)))
          .map(_ => ('a' + rnd.nextInt(2)).toChar).mkString
        (i.toLong, word)
      }
      val words = cases.map { case (i, w) => (w + i, 1L) }  // unique
        .toDF("word", "cnt")
      // merge the ('a','b') pair; words end in digits so uniqueness
      // never affects the a/b prefix being tested
      val got = graft.text.Bpe
        .mergePair(graft.text.Bpe.initSymbols(words), "a", "b")
        .as[(String, Long, Seq[String])].collect()
        .map(r => r._1 -> r._3).toMap
      cases.foreach { case (i, w) =>
        val full = w + i
        got(full) shouldBe refMerge(full.map(_.toString).toList, "a", "b")
      }
    }

    it("chunk windows cover every token with the arithmetic chunk count") {
      val rnd = new scala.util.Random(7)
      val docs = (1 to 30).map { i =>
        (i.toLong, (1 to (1 + rnd.nextInt(40))).map(j => s"t$j")
          .mkString(" "))
      }.toDF("doc_id", "text")
      val step = 5  // chunkSize 8, overlap 3
      val got = graft.text.Chunker.chunk(docs, chunkSize = 8, overlap = 3)
        .as[(Long, Long, Long, Long, String)].collect()
        .groupBy(_._1)
      docs.as[(Long, String)].collect().foreach { case (id, text) =>
        val n = text.split(" ").length
        val chunks = got(id).sortBy(_._2)
        chunks.length shouldBe (n + step - 1) / step  // ceil(n/step)
        // coverage: every token index in [0, n) falls in some window
        val covered = chunks.flatMap(c =>
          c._3 until math.min(c._3 + 8, n)).toSet
        covered shouldBe (0 until n).map(_.toLong).toSet
        // provenance: n_toks matches the window clamp
        chunks.foreach(c => c._4 shouldBe math.min(c._3 + 8, n) - c._3)
      }
    }
  }

  describe("LSH index search plan (pushdown pinned)") {
    it("bounded candidates reach the shingle scan as an In() filter") {
      val corpus = Seq((100L, "alpha beta gamma delta epsilon"),
        (101L, "one two three four five six"))
        .toDF("doc_id", "text")
      val dir = java.nio.file.Files
        .createTempDirectory("lsh_plan").toString
      graft.dedup.Dedup.writeLshIndex(corpus, dir)
      val out = graft.dedup.Dedup.searchLshIndex(spark, dir,
        Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"))
      // materialize-off would keep the full plan; here the search ran
      // eagerly, so assert on the *shingle scan* of a fresh pushdown
      // read the same way searchLshIndex builds it
      val shingleScan = spark.read.parquet(s"$dir/shingles")
        .filter(col("id").isin(100L, 101L))
      shingleScan.queryExecution.executedPlan.toString should
        include("PushedFilters: [In(id")
      out.count() should be >= 1L
    }
  }

  describe("edge cases: null text and zero-token strata") {
    it("null-text rows flow through the text operators without crashing") {
      val df = Seq((1L, "some words"), (2L, null))
        .toDF("doc_id", "text")
      // chunker: null tokens filter out
      graft.text.Chunker.chunk(df).select("doc_id")
        .as[Long].collect().toSeq shouldBe Seq(1L)
      // piiStats: null counts for the null row, no exception
      graft.text.Pii.piiStats(df).count() shouldBe 2L
      // NgramLm: null doc reports zeros via the coalesce path
      graft.text.NgramLm.docComponents(df,
          graft.text.NgramLm.bigramCounts(df))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r._2).toMap.apply(2L) shouldBe 0L
    }

    it("a zero-token stratum plans to 0 instead of dividing by zero") {
      val df = Seq(("en", 1L, "a b"), ("xx", 2L, "")).toDF(
        "lang", "doc_id", "text")
      val plan = graft.pipeline.Mixture.plan(df,
        Map("en" -> 500000L, "xx" -> 500000L))
      plan.as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._4, r._5)).toMap
        .apply("xx") shouldBe ((0L, 0L))
      // and applyPlan emits nothing for it
      graft.pipeline.Mixture.applyPlan(
          df.select(col("lang"), col("doc_id")), plan)
        .filter(col("lang") === "xx").count() shouldBe 0L
    }
  }

  describe("Bpe.encode (tokenize the corpus with learned merges)") {
    it("emits ordered dense subword ids consistent with the vocab") {
      val docs = Seq((1L,
        (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
         Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
        .toDF("doc_id", "text")
      val merges = graft.text.Bpe.learnMerges(docs, numMerges = 4)
        .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
        .map(m => (m._2, m._3))
      val seg = graft.text.Bpe.segment(docs, merges)
      val v = graft.text.Bpe.vocab(seg)
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> r._2).toMap
      // vocab ranked by weighted count desc then sym: est (9·1=newest6
      // +widest3), low (5+2=7 as "low"), e/n/w/... spot-check ordering
      v.keySet should contain allOf ("est", "low", "e", "n", "w")
      val ids = graft.text.Bpe.encode(docs, merges)
        .filter(col("doc_id") === 1L)
        .as[(Long, Seq[Long])].collect().head._2
      // doc 1 = 16 words; token count: low→1 sym, lower→3 ("low","e","r"),
      // newest→4 ("n","e","w","est"), widest→4 ("w","i","d","est")
      // ⇒ 5·1 + 2·3 + 6·4 + 3·4 = 47 ids
      ids.length shouldBe 47
      // first word is "low" → its single id must be vocab("low")
      ids.head shouldBe v("low")
    }
  }

  describe("ShardWriter (train-ready output + manifest)") {
    it("round-trips data by stratum and reports an accurate manifest") {
      val packed = Seq(
        ("en", 0L, 1L, 30L), ("en", 0L, 2L, 30L), ("en", 1L, 3L, 10L),
        ("zh", 0L, 4L, 20L))
        .toDF("lang", "bin", "doc_id", "n_tokens")
      val dir = java.nio.file.Files.createTempDirectory("shards").toString
      val manifest = graft.pipeline.ShardWriter.writeShards(packed, dir)
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      manifest("en") shouldBe ((2L, 3L, 70L))
      manifest("zh") shouldBe ((1L, 1L, 20L))
      graft.pipeline.ShardWriter.readStratum(spark, dir, "en")
        .count() shouldBe 3L
    }
  }

  describe("ingestDocStream (streaming daily-ingest chain)") {
    it("redacts, quality-gates, and dedups a doc stream") {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.OutputMode
      implicit val sql = spark.sqlContext
      val input = MemoryStream[(Long, String, Long)]
      val q = graft.streaming.StreamingIngest.ingestDocStream(
          input.toDF().toDF("doc_id", "text", "epoch_ms"),
          weights = Map("f_tok" -> 1L), thresholdPpm = 1000000L)
        .writeStream.format("memory").queryName("ingest_r6")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(
          (1L, "good words mail a@b.co here", 1000L),
          (2L, "good words mail a@b.co here", 2000L),  // dup of 1
          (3L, "", 3000L))                             // 0 tokens → dropped
        q.processAllAvailable()
        val out = spark.table("ingest_r6")
          .select("doc_id", "text").as[(Long, String)].collect().toSeq
        out.map(_._1) shouldBe Seq(1L)
        out.head._2 shouldBe "good words mail <EMAIL> here"
      } finally q.stop()
    }
  }

  describe("review-fix behaviors pinned") {
    it("ingestDocStream keeps docs that differ only in their PII spans") {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.OutputMode
      implicit val sql = spark.sqlContext
      val input = MemoryStream[(Long, String, Long)]
      val q = graft.streaming.StreamingIngest.ingestDocStream(
          input.toDF().toDF("doc_id", "text", "epoch_ms"),
          weights = Map("f_tok" -> 1L), thresholdPpm = 1000000L)
        .writeStream.format("memory").queryName("ingest_pii_r6")
        .outputMode(OutputMode.Append()).start()
      try {
        // identical AFTER redaction, distinct raw → batch (q121) keeps
        // both, so the stream must too (dedup runs on raw text first)
        input.addData(
          (1L, "mail a@b.co here", 1000L),
          (2L, "mail c@d.co here", 2000L))
        q.processAllAvailable()
        spark.table("ingest_pii_r6").select("doc_id")
          .as[Long].collect().sorted shouldBe Seq(1L, 2L)
      } finally q.stop()
    }

    it("ingestDocStream benchmark grams drop contaminated docs") {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.OutputMode
      implicit val sql = spark.sqlContext
      val input = MemoryStream[(Long, String, Long)]
      val q = graft.streaming.StreamingIngest.ingestDocStream(
          input.toDF().toDF("doc_id", "text", "epoch_ms"),
          weights = Map("f_tok" -> 1L), thresholdPpm = 1000000L,
          benchGrams = Seq("alpha beta gamma"))
        .writeStream.format("memory").queryName("ingest_bench_r6")
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(
          (1L, "prefix alpha beta gamma suffix", 1000L),  // contaminated
          (2L, "clean words entirely here", 2000L),
          (3L, "ab", 3000L))  // shorter than one gram — kept
        q.processAllAvailable()
        spark.table("ingest_bench_r6").select("doc_id")
          .as[Long].collect().sorted shouldBe Seq(2L, 3L)
      } finally q.stop()
    }

    it("Mixture.plan surfaces target strata absent from the corpus") {
      val df = Seq(("en", "a b")).toDF("lang", "text")
      val got = graft.pipeline.Mixture.plan(df,
          Map("en" -> 500000L, "tyop" -> 500000L))
        .as[(String, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r._2).toMap
      got.keySet shouldBe Set("en", "tyop")
      got("tyop") shouldBe 0L
    }

    it("Bpe.encode with a fixedVocab keeps ids stable; empty docs " +
        "emit empty arrays") {
      val train = Seq((1L, "low low newest")).toDF("doc_id", "text")
      val fixed = graft.text.Bpe.vocab(graft.text.Bpe.segment(train, Nil))
      val batch = Seq((9L, "low"), (10L, "")).toDF("doc_id", "text")
      val got = graft.text.Bpe.encode(batch, Nil, fixedVocab = Some(fixed))
        .as[(Long, Seq[Long])].collect().toMap
      val vmap = fixed.as[(String, Long, Long)].collect()
        .map(r => r._1 -> r._2).toMap
      got(9L) shouldBe "low".map(c => vmap(c.toString))
      got(10L) shouldBe Seq.empty
    }
  }

  describe("NgramLm (count-LM quality components)") {
    it("counts rare occurrences and treats model-absent grams as cnt 0") {
      val corpus = Seq((1L, "a b a b a b"), (2L, "a b c")).toDF("doc_id", "text")
      // model: "a b"×4, "b a"×2, "b c"×1
      val model = graft.text.NgramLm.bigramCounts(corpus)
      model.as[(String, Long)].collect().toMap shouldBe
        Map("a b" -> 4L, "b a" -> 2L, "b c" -> 1L)
      val got = graft.text.NgramLm
        .docComponents(corpus, model, rareBelow = 3L)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      // doc1: 5 bigrams: ab,ba,ab,ba,ab → rare = the 2 "b a"; sum = 3·4+2·2
      got(1L) shouldBe ((5L, 2L, 16L))
      // doc2: ab(4), bc(1) → 1 rare; sum 5
      got(2L) shouldBe ((2L, 1L, 5L))
      // scoring NEW docs against the old model: absent gram = rare, cnt 0
      val newDocs = Seq((9L, "z z"), (10L, "solo")).toDF("doc_id", "text")
      val nd = graft.text.NgramLm.docComponents(newDocs, model)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      nd(9L) shouldBe ((1L, 1L, 0L))
      nd(10L) shouldBe ((0L, 0L, 0L))   // < 2 tokens → all zero
    }
  }

  describe("pii_redact SQL function (GraftExtensions)") {
    it("is callable from SQL after register()") {
      graft.functions.GraftExtensions.register(spark)
      spark.sql("SELECT pii_redact('mail a@b.co ip 10.0.0.1 tel " +
          "+44-123-4567') AS r")
        .as[String].collect().head shouldBe
          "mail <EMAIL> ip <IP> tel <PHONE>"
    }
  }

  describe("Mixture.applyPlan (materialized mixture)") {
    it("emits full epochs plus a hash-drawn remainder epoch") {
      val df = Seq(("en", 1L, "a b"), ("en", 2L, "c d"), ("zh", 3L, "e f"))
        .toDF("lang", "doc_id", "text")
      // en: 4 toks, zh: 2; budget 6. en target 1/3 → want 2 (downsample);
      // zh target 2/3 → want 4 = 2 full epochs of its 2 toks
      val plan = graft.pipeline.Mixture.plan(df,
        Map("en" -> 333333L, "zh" -> 666666L))
      val out = graft.pipeline.Mixture.applyPlan(
          df.select(col("lang"), col("doc_id")), plan)
        .as[(String, Long, Long)].collect().toSeq
      // zh doc 3 must appear at least its 1 full epoch (want 3 of 2
      // toks → full = 1, remainder by draw); copies are 0-based
      val zh = out.filter(_._1 == "zh")
      zh.map(_._3).min shouldBe 0L
      zh.size should (be >= 1 and be <= 2)
      // en downsample: full = 0, so each en doc appears 0 or 1 times
      val en = out.filter(_._1 == "en")
      en.groupBy(_._2).values.foreach(_.size shouldBe 1)
      // deterministic: second run identical
      graft.pipeline.Mixture.applyPlan(
          df.select(col("lang"), col("doc_id")), plan)
        .as[(String, Long, Long)].collect().toSeq
        .sorted shouldBe out.sorted
    }
  }

  describe("appendLshIndex (daily index maintenance)") {
    it("append(B) to index(A) searches identically to index(A ∪ B)") {
      val t1 = "alpha beta gamma delta epsilon zeta eta theta"
      val a = Seq((100L, t1),
        (102L, "totally different words here nothing shared at all"))
        .toDF("doc_id", "text")
      val b = Seq((200L, t1 + " iota"),
        (201L, "more unrelated filler content beyond sharing"))
        .toDF("doc_id", "text")
      val queries = Seq((1L, t1)).toDF("doc_id", "text")
      val incDir = java.nio.file.Files
        .createTempDirectory("lsh_inc").toString
      graft.dedup.Dedup.writeLshIndex(a, incDir)
      graft.dedup.Dedup.appendLshIndex(b, incDir)
      val fullDir = java.nio.file.Files
        .createTempDirectory("lsh_full").toString
      graft.dedup.Dedup.writeLshIndex(a.unionByName(b), fullDir)
      val inc = graft.dedup.Dedup.searchLshIndex(spark, incDir, queries)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val full = graft.dedup.Dedup.searchLshIndex(spark, fullDir, queries)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      inc shouldBe full
      inc.map(_._2) should contain allOf (100L, 200L)
    }
  }

  describe("Skew (pre-shuffle key audit)") {
    it("summarizes the per-key count distribution with a deterministic top") {
      // keys: a×4, b×4, c×1, d×1 → top tie (a,b) breaks to 'a'
      val df = (Seq.fill(4)("a") ++ Seq.fill(4)("b") ++ Seq("c", "d"))
        .toDF("k")
      val r = graft.pipeline.Skew.report(df, "k").collect().head
      r.getLong(0) shouldBe 10L           // n_rows
      r.getLong(1) shouldBe 4L            // n_keys
      r.getLong(2) shouldBe 4L            // max_cnt
      r.getLong(3) shouldBe 1L            // p50: cum 2/4 at cnt=1
      r.getLong(4) shouldBe 4L            // p90
      r.getLong(5) shouldBe 4L            // p99
      r.getString(6) shouldBe "a"         // top_key (tie → smallest)
      r.getLong(7) shouldBe 4L            // top_cnt
      r.getLong(8) shouldBe 400000L       // top_share_ppm
    }
  }

  describe("semDedup (cluster-confined semantic dedup)") {
    it("drops exact/near duplicates, keeps the min id and distinct vectors") {
      def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
      val emb = Seq(
        (0L, v(1, 0, 0, 0)),
        (1L, v(1, 0.001, 0, 0)),   // near-dup of 0
        (2L, v(1, 0, 0.002, 0)),   // near-dup of 0
        (3L, v(0, 1, 0, 0)),       // distinct
        (4L, v(0, 0, 1, 0)))       // distinct
        .toDF("vec_id", "embedding")
      val keep = graft.similarity.Similarity
        .semDedup(emb, eps = 0.99, centroidStride = 5, kmeansIters = 1)
        .as[(Long, Boolean)].collect().toMap
      keep shouldBe Map(0L -> true, 1L -> false, 2L -> false,
        3L -> true, 4L -> true)
    }
  }
}

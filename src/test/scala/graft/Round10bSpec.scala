package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Mixture
import graft.text.{Bm25, Html}

/** Round-10 additions: temperature mixture targets, anchor-text
  * extraction, BM25 scoring. */
class Round10bSpec extends SparkSpec {

  private def corpus(counts: Map[String, Int]) = {
    import spark.implicits._
    counts.toSeq.map { case (lang, n) =>
      (lang.hashCode.toLong, lang, ("tok " * n).trim)
    }.toDF("doc_id", "lang", "text")
  }

  describe("Mixture.temperatureTargets") {
    it("α = 0.5 apportions sqrt shares to exactly 1e6 ppm " +
        "(largest remainder, hand-checked)") {
      // tokens 100/400/900 → sqrt micro-weights 10e6/20e6/30e6 →
      // shares 1/6, 1/3, 1/2 → bases 166666/333333/500000, deficit 1
      // to the largest remainder (stratum a)
      val t = Mixture.temperatureTargets(
        corpus(Map("a" -> 100, "b" -> 400, "c" -> 900, "d" -> 0)))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      t.keySet shouldBe Set("a", "b", "c") // zero-token stratum dropped
      t("a") shouldBe ((100L, 10000000L, 166667L))
      t("b") shouldBe ((400L, 20000000L, 333333L))
      t("c") shouldBe ((900L, 30000000L, 500000L))
      t.values.map(_._3).sum shouldBe 1000000L
    }

    it("α = 1 keeps natural proportions; lower α flattens toward " +
        "uniform; ppm always sums to 1e6") {
      val docs = corpus(Map("big" -> 1600, "small" -> 100))
      def ppm(alpha: Double): Map[String, Long] =
        Mixture.temperatureTargets(docs, alpha)
          .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      val natural = ppm(1.0)
      natural("big") shouldBe 941176L +- 1 // 1600/1700
      val flat = ppm(0.5) // 40:10 → 800000/200000
      flat("small") shouldBe 200000L
      val flatter = ppm(0.25)
      flatter("small") should be > flat("small")
      Seq(natural, flat, flatter).foreach(_.values.sum shouldBe 1000000L)
    }

    it("feeds planWithTargets: derived ppm targets plan per-stratum " +
        "want/keep/epochs like the map-driven plan") {
      val docs = corpus(Map("a" -> 100, "b" -> 400, "c" -> 900))
      val targets = Mixture.temperatureTargets(docs)
      val p = Mixture.planWithTargets(docs, targets,
          budgetTokens = Some(1400L))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      // want = floor(1400 · ppm / 1e6)
      p("a")._2 shouldBe 233L // 1400·166667/1e6
      p("b")._2 shouldBe 466L
      p("c")._2 shouldBe 700L
      // a is under-represented (want 233 > actual 100) → epochs 3
      p("a")._4 shouldBe 3L
      // c is over-represented → keep rate 700/900
      p("c")._3 shouldBe 777777L
    }
  }

  describe("Html.anchors") {
    it("extracts (url, text) pairs, collapses whitespace, keeps " +
        "href-less anchors, skips nested-markup anchors") {
      import spark.implicits._
      val html = "<p><a href=\"https://X.com/a\">First  link</a>" +
        "<A HREF='http://y.com'>two\nlines</A>" +
        "<a name=\"x\">no href</a>" +
        "<a href=\"/rel\"><b>nested</b></a></p>"
      val out = Seq(html).toDF("html")
        .select(explode(Html.anchors(col("html"))).as("a"))
        .select(col("a.url"), col("a.text")).collect()
        .map(r => (r.getString(0), r.getString(1)))
      out shouldBe Array(
        ("https://X.com/a", "First link"),
        ("http://y.com", "two lines"),
        ("", "no href"))
    }
  }

  describe("Bm25") {
    def fixture = {
      import spark.implicits._
      Seq(
        (1L, "spark spark table"),
        (2L, "spark table table fast"),
        (3L, "table fast row")).toDF("doc_id", "text")
    }

    it("components are the hand-computed integer ppm pieces") {
      val c = Bm25.components(fixture, Seq("spark"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6))).toMap
      // N=3, T=10, df(spark)=2; d1: tf=2, dl=3 →
      // stf = 2·2.2/(2 + 1.2·(0.25 + 0.75·3/(10/3))) = 4.4/3.11
      c(1L) shouldBe ((2L, 2L, 3L, 1414790L, 600000L))
      // d2: tf=1, dl=4 → 2.2/(1 + 1.2·(0.25 + 0.9·... )) exact:
      // floor(1e6·22·1·10 / (10·10 + 3·10 + 9·4·3)) = floor(2.2e8/238)
      c(2L) shouldBe ((1L, 2L, 4L, 924369L, 600000L))
      c.keySet shouldBe Set(1L, 2L) // d3 matches no term
    }

    it("scores match the double-precision formula; topK ranks by it") {
      val s = Bm25.scores(fixture, Seq("spark"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
      val avgdl = 10.0 / 3
      def stf(tf: Double, dl: Double) =
        tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      s(1L) shouldBe (idf * stf(2, 3)) +- 1e-12
      s(2L) shouldBe (idf * stf(1, 4)) +- 1e-12
      val top = Bm25.topK(fixture, Seq("spark"), k = 1).collect()
      top.map(_.getLong(0)) shouldBe Array(1L)
    }

    it("multi-term scores sum per-term contributions") {
      val s = Bm25.scores(fixture, Seq("spark", "row"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      s.keySet shouldBe Set(1L, 2L, 3L)
      val sSpark = Bm25.scores(fixture, Seq("spark"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // docs matching only "spark" score identically with the larger
      // term set (df of each term is per-term, independent)
      s(1L) shouldBe sSpark(1L) +- 1e-12
      s(3L) should be > 0.0
    }
  }

  describe("Chunker.chunkCdc") {
    // deterministic varied tokens — enough hash diversity that the
    // divisor-8 cut actually fires several times in 60 tokens
    def words(n: Int, salt: String = "") =
      (0 until n).map(i => s"w$salt${i * 7 % 97}").mkString(" ")

    it("chunks tile the document exactly; boundaries are the md5 cut") {
      import spark.implicits._
      val docs = Seq((1L, words(60)), (2L, "one two")).toDF("doc_id", "text")
      val out = graft.text.Chunker.chunkCdc(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val d1 = out.filter(_._1 == 1L).sortBy(_._2)
      d1.length should be > 1 // the cut fired at least once
      // chunks tile [0, 60): consecutive, non-overlapping, complete
      d1.head._3 shouldBe 0L
      d1.sliding(2).foreach { case Array(a, b) =>
        b._3 shouldBe (a._3 + a._4)
      }
      d1.map(_._4).sum shouldBe 60L
      // a doc shorter than the window is one whole chunk
      val d2 = out.filter(_._1 == 2L)
      d2 shouldBe Array((2L, 0L, 0L, 2L))
    }

    it("chunk hashes are revision-stable: a head insertion re-aligns " +
        "every chunk past the edit (fixed-size chunking re-aligns none)") {
      import spark.implicits._
      val base = words(60)
      val edited = "inserted tokens here " + base
      val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
      def hashes(id: Long, df: org.apache.spark.sql.DataFrame) =
        df.filter(col("doc_id") === id).select(col("chunk_md5"))
          .collect().map(_.getString(0)).toSet
      val cdc = graft.text.Chunker.chunkCdc(docs)
      val c1 = hashes(1L, cdc); val c2 = hashes(2L, cdc)
      // all but the first (edited) chunk of the original survive
      (c1 intersect c2).size should be >= c1.size - 1
      // fixed-size chunking loses every chunk to the 3-token shift
      val fixed = graft.text.Chunker.chunk(docs, chunkSize = 16,
        overlap = 0).withColumn("chunk_md5", md5(col("chunk_text")))
      val f1 = hashes(1L, fixed); val f2 = hashes(2L, fixed)
      (f1 intersect f2) shouldBe empty
    }
  }

  describe("PipelineOps.leakageSafeSplit") {
    it("a transitive near-dup chain lands atomically in one split; " +
        "unpaired docs split independently by their own draw") {
      import spark.implicits._
      val docs = (1L to 200L).map(i => (i, s"doc $i"))
        .toDF("doc_id", "text")
      // chain 1-2-3 (no direct 1-3 edge) + pair 10-11
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
        .toDF("id1", "id2")
      val out = graft.pipeline.PipelineOps.leakageSafeSplit(docs, pairs,
          Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L))
        .select(col("doc_id"), col("rep"), col("split"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
        .toMap
      out.size shouldBe 200
      // the chain shares rep 1 and a single split
      Seq(1L, 2L, 3L).map(out(_)._1).toSet shouldBe Set(1L)
      Seq(1L, 2L, 3L).map(out(_)._2).toSet.size shouldBe 1
      out(11L)._1 shouldBe 10L
      out(11L)._2 shouldBe out(10L)._2
      // singletons are their own rep
      out(50L)._1 shouldBe 50L
      // expected shares roughly hold over 200 mostly-singleton docs
      val train = out.values.count(_._2 == "train")
      train.toDouble / 200 shouldBe 0.8 +- 0.12
      // determinism: a re-run assigns identically
      val again = graft.pipeline.PipelineOps.leakageSafeSplit(docs, pairs,
          Seq("train" -> 800000L, "val" -> 100000L, "test" -> 100000L))
        .select(col("doc_id"), col("split"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      out.map { case (k, v) => k -> v._2 } shouldBe again
    }
  }

  describe("Similarity.mutualKnnTopics") {
    val dir = "/root/testdata/sf0.001"
    def haveData = java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/embeddings.parquet"))

    it("topics are reciprocal-edge components: every member's topic is " +
        "the component min; sizes agree; one-way edges excluded") {
      assume(haveData)
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val knn = graft.similarity.Similarity.ivfTopK(emb, k = 3, nprobe = 2)
        .select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val mutual = knn.filter { case (a, b) => a < b && knn((b, a)) }
      val topics = graft.similarity.Similarity.mutualKnnTopics(emb)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      mutual should not be empty
      // membership = exactly the vertices of the mutual graph
      topics.map(_._1).toSet shouldBe
        mutual.flatMap(p => Seq(p._1, p._2))
      // local union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      mutual.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      topics.foreach { case (id, topic, _) => topic shouldBe find(id) }
      val sizes = topics.groupBy(_._2).map { case (t, g) => t -> g.length }
      topics.foreach { case (_, t, sz) => sz shouldBe sizes(t) }
    }
  }

  describe("Stats.rankBlend") {
    it("blends by competition ranks — immune to monotone rescaling, " +
        "ties share ranks") {
      import spark.implicits._
      val df = Seq((1L, 10L, 5L), (2L, 20L, 5L), (3L, 30L, 1L))
        .toDF("doc_id", "a", "b")
      val out = graft.pipeline.Stats.rankBlend(df,
          Seq("a" -> 2L, "b" -> 1L))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("rnk_a"), r.getAs[Long]("rnk_b"),
            r.getAs[Long]("blend"))).toMap
      out(1L) shouldBe ((1L, 2L, 4L))
      out(2L) shouldBe ((2L, 2L, 6L))
      out(3L) shouldBe ((3L, 1L, 7L))
      // monotone rescale of a signal leaves the blend unchanged
      val scaled = df.withColumn("a", col("a") * 1000L - 7L)
      val out2 = graft.pipeline.Stats.rankBlend(scaled,
          Seq("a" -> 2L, "b" -> 1L))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("blend")).toMap
      out.map { case (k, v) => k -> v._3 } shouldBe out2
    }
  }

  describe("fertility stats / embedding health") {
    it("fertilityStats counts UTF-8 bytes vs chars vs tokens per " +
        "stratum") {
      import spark.implicits._
      val docs = Seq(("de", "über ön"), ("de", "ascii two"),
        ("en", "plain")).toDF("lang", "text")
      val out = graft.text.TextOps.fertilityStats(docs)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5))).toMap
      // "über ön": 7 chars, 2 non-ascii → 9 bytes; "ascii two": 9/9
      out("de") shouldBe ((2L, 18L, 16L, 2L, 4L))
      out("en") shouldBe ((1L, 5L, 5L, 0L, 1L))
    }

    it("healthAudit flags NaN, zero-norm, and wrong-dim vectors; " +
        "healthy vectors carry their exact rounded norm") {
      import spark.implicits._
      val emb = Seq(
        (1L, Array(3.0f, 4.0f)),
        (2L, Array(0.0f, 0.0f)),
        (3L, Array(Float.NaN, 1.0f)),
        (4L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
      val out = graft.similarity.Similarity.healthAudit(emb,
          expectDims = 2)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))
        .toMap
      out(1L) shouldBe ((0L, 0L, 5.0, false))
      out(2L) shouldBe ((0L, 2L, 0.0, true))
      out(3L)._1 shouldBe 1L
      out(3L)._4 shouldBe true
      out(4L)._4 shouldBe true // 3 dims ≠ expected 2
    }
  }

  describe("Bitext.comparablePairs") {
    it("pairs cross-language docs on shared rare tokens only; hot " +
        "tokens and same-language pairs never join") {
      import spark.implicits._
      val docs = Seq(
        (1L, "en", "the acme42 report zkey common common"),
        (2L, "de", "der acme42 bericht zkey common"),
        (3L, "en", "the acme42 other zkey thing"), // en–en with 2: no pair
        (4L, "fr", "le common texte"), // only hot/solo tokens
        (5L, "de", "einzig unique here")) // df-1 tokens pair nothing
        .toDF("doc_id", "lang", "text")
      // make "common" hot (df > maxDf) via filler docs sharing it
      val filler = (100L to 120L).map(i => (i, "xx", s"common filler$i"))
        .toDF("doc_id", "lang", "text")
      val out = graft.text.Bitext.comparablePairs(
          docs.unionByName(filler), minShared = 2, maxDf = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      // acme42 (df 3) + zkey (df 3) shared by (1,2), (1→3 same lang
      // excluded), (2,3 de–en: shares acme42+zkey → pair!)
      out.toSet shouldBe Set((1L, 2L, 2L), (2L, 3L, 2L))
    }
  }

  describe("Html.mainContent") {
    it("drops link-dense nav and short footers, keeps prose incl. " +
        "inline markup and entities") {
      import spark.implicits._
      val html = "<nav><a href='/1'>Home page</a> <a href='/2'>About " +
        "us page</a></nav>" +
        "<p>This is the real &amp; <b>main</b> body of the page, " +
        "long enough to keep.</p>" +
        "<div>Short.</div>" +
        "<p>Second paragraph with one <a href='/x'>link</a> inside " +
        "a lot of surrounding prose text.</p>"
      val out = Seq(html).toDF("html")
        .select(graft.text.Html.mainContent(col("html")).as("mc"))
        .select("mc.content", "mc.n_blocks", "mc.n_kept").collect()(0)
      out.getLong(1) shouldBe 4L
      out.getLong(2) shouldBe 2L
      out.getString(0) shouldBe
        "This is the real & main body of the page, long enough to " +
        "keep. Second paragraph with one link inside a lot of " +
        "surrounding prose text."
    }
  }

  describe("Dedup.lshPlan") {
    it("picks the cheapest banding meeting recall AND fp bounds; " +
        "infeasible budgets return None") {
      val p = graft.dedup.Dedup.lshPlan(threshold = 0.8).get
      // hand-walked: r≤3 violate fp(0.3)≤0.05; r=4 needs b=6 →
      // 24 hashes, recall .9576, fp .0476
      p.rowsPerBand shouldBe 4
      p.bands shouldBe 6
      p.hashes shouldBe 24
      p.recallAtThreshold should be >= 0.95
      p.fpAtNoise should be <= 0.05
      // the planned curve really is the S-curve formula
      p.recallAtThreshold shouldBe
        (1.0 - math.pow(1.0 - math.pow(0.8, 4), 6)) +- 1e-12
      // a 4-hash budget cannot meet both constraints at t=0.8
      graft.dedup.Dedup.lshPlan(0.8, maxHashes = 4) shouldBe None
      // the q23 default (4 bands × 4 rows) is what the planner picks
      // when the fp bound is relaxed to its fp level
      val loose = graft.dedup.Dedup.lshPlan(0.8, targetRecall = 0.85,
        maxFp = 0.4).get
      loose.hashes should be <= 16
    }
  }

  describe("TextOps readability / line shape") {
    it("readabilityColumns counts words, sentences, syllables " +
        "(vowel runs, min 1 per token)") {
      import spark.implicits._
      val df = Seq("Hello world. Strengths shy! ok").toDF("text")
      val out = df.select(
        graft.text.TextOps.readabilityColumns(col("text")): _*)
        .collect()(0)
      out.getLong(0) shouldBe 5L // words
      out.getLong(1) shouldBe 3L // sentences
      // hello=2 world=1 strengths=1 shy=1(y) ok=1
      out.getLong(2) shouldBe 6L
      // no terminators → one sentence
      Seq("no terminator here").toDF("text")
        .select(graft.text.TextOps.readabilityColumns(col("text")): _*)
        .collect()(0).getLong(1) shouldBe 1L
    }

    it("lineShapeColumns drops blank lines and counts bullet starts " +
        "and ellipsis ends") {
      import spark.implicits._
      val text = "title\n\n- item one\n* item two\nbody text\n" +
        "to be continued...\nwrap…\n  \nlast"
      val out = Seq(text).toDF("text")
        .select(graft.text.TextOps.lineShapeColumns(col("text")): _*)
        .collect()(0)
      out.getLong(0) shouldBe 7L
      out.getLong(1) shouldBe 2L
      out.getLong(2) shouldBe 2L
    }
  }

  describe("PipelineOps.sampleWeightedNPerStratum") {
    it("keeps n per stratum preferring heavy rows, deterministically, " +
        "excluding zero weights") {
      import spark.implicits._
      // one stratum: 200 rows; 10 heavy rows (w=20) vs 190 light (w=1)
      val df = (1L to 200L).map(i =>
          (i, "s", if (i <= 10) 20L else if (i <= 195) 1L else 0L))
        .toDF("doc_id", "lang", "w")
      val out = graft.pipeline.PipelineOps
        .sampleWeightedNPerStratum(df, 10, Seq("lang"), "w", "doc_id")
        .collect().map(r => r.getLong(1) -> r.getLong(2))
      out.length shouldBe 10
      out.map(_._2).sorted shouldBe (1L to 10L).toArray
      // heavy rows carry ~51% of total mass (200/390) and should take
      // a clear majority of the 10 slots
      out.count(_._1 <= 10L) should be >= 4
      // zero-weight rows never selected
      out.map(_._1).foreach(_ should be <= 195L)
      // determinism across partitionings
      val again = graft.pipeline.PipelineOps
        .sampleWeightedNPerStratum(df.repartition(13), 10, Seq("lang"),
          "w", "doc_id")
        .collect().map(r => r.getLong(1) -> r.getLong(2))
      out.sortBy(_._2) shouldBe again.sortBy(_._2)
    }
  }

  describe("Stats.decayedCounts") {
    it("weights events by 2^(maxBuckets - halfLifeBucket), clamps old " +
        "and future events, and is exact/mergeable") {
      import spark.implicits._
      val ref = 1000000L; val hl = 100L
      val df = Seq(
        ("a", 1000000L), // age 0 → bucket 0 → weight 2^4
        ("a", 999900L),  // age 100 → bucket 1 → 2^3
        ("a", 999899L),  // age 101 → bucket 1 → 2^3
        ("a", 1000050L), // FUTURE → clamp to bucket 0 → 2^4
        ("b", 999000L),  // age 1000 → bucket 10 → clamp 4 → 2^0
        ("b", 0L))       // ancient → clamp → 2^0
        .toDF("k", "ms")
      val out = graft.pipeline.Stats.decayedCounts(df, Seq("k"), "ms",
          refMs = ref, halfLifeMs = hl, maxBuckets = 4)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      out("a") shouldBe ((4L, 16L + 8L + 8L + 16L, 1000050L))
      out("b") shouldBe ((2L, 2L, 999000L))
    }
  }

  describe("Similarity ivf maxCentroids cap") {
    val dir = "/root/testdata/sf0.001"
    it("pins the centroid count; capped search is exact within its " +
        "probed lists and stays self-consistent") {
      assume(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/embeddings.parquet")))
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val capped = graft.similarity.Similarity
        .ivfAssign(emb, maxCentroids = Some(2))
      capped.select(col("centroid")).distinct().count() should be <= 2L
      // uncapped uses more centroids on this corpus
      graft.similarity.Similarity.ivfAssign(emb)
        .select(col("centroid")).distinct().count() should be > 2L
      // search under the cap: neighbors come from the probed lists and
      // cosines are exact — spot-check against brute force per query
      val brute = graft.similarity.Similarity
        .bruteTopK(emb, k = 10, maxQueryId = 20L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      val ivf = graft.similarity.Similarity
        .ivfTopK(emb, k = 3, nprobe = 2, maxQueryId = 20L,
          maxCentroids = Some(2))
        .collect()
      ivf should not be empty
      ivf.foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        // any (qid, nid) also in the brute top-10 must carry the SAME
        // exact cosine (the cap restricts candidates, never the math)
        brute.get(key).foreach(_ shouldBe r.getDouble(2))
      }
    }
  }

  describe("Similarity.truncationRecall") {
    val dir = "/root/testdata/sf0.001"
    it("full-dim recall is exactly 1; a short prefix loses recall but " +
        "stays useful") {
      assume(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/embeddings.parquet")))
      val emb = graft.sources.Tables.embeddings(spark, dir)
      val r = graft.similarity.Similarity
        .truncationRecall(emb, Seq(64, 8), k = 3)
        .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
      r(64L) shouldBe 1.0
      r(8L) should be < 1.0
      r(8L) should be > 0.01
    }
  }

  describe("streaming JSONL front door") {
    it("quarantine routing composes with the streaming ingest chain: " +
        "bad lines quarantined, cross-batch dups dropped by state") {
      implicit val sql = spark.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.OutputMode
      import spark.implicits._
      val input = MemoryStream[String]
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("text", "string")
        .add("epoch_ms", "long")
      val parsed = graft.io.Jsonl.parseWithQuarantine(
        input.toDF().withColumnRenamed("value", "line"), schema,
        required = Seq("doc_id", "text"))
      val (good, bad) = graft.io.Jsonl.route(parsed)
      val chain = graft.streaming.StreamingIngest.ingestDocStream(
        good, weights = Map("f_tok" -> 1L))
      val q1 = chain.writeStream.format("memory").queryName("jsonl_good")
        .outputMode(OutputMode.Append()).start()
      val q2 = bad.writeStream.format("memory").queryName("jsonl_bad")
        .outputMode(OutputMode.Append()).start()
      try {
        def line(id: Long, text: String, ms: Long) =
          s"""{"doc_id":$id,"text":"$text","epoch_ms":$ms}"""
        input.addData(line(1, "alpha beta gamma", 1000),
          line(2, "alpha beta gamma", 2000), // same content → deduped
          """{"doc_id":3,"text":"broken""")  // malformed → quarantine
        q1.processAllAvailable(); q2.processAllAvailable()
        input.addData(line(4, "alpha beta gamma", 3000), // dup ACROSS batches
          line(5, "fresh second batch", 4000),
          """{"text":"no id"}""")            // wrong shape → quarantine
        q1.processAllAvailable(); q2.processAllAvailable()
        val goodIds = spark.table("jsonl_good")
          .select(col("doc_id")).collect().map(_.getLong(0)).sorted
        goodIds shouldBe Array(1L, 5L)
        spark.table("jsonl_bad").count() shouldBe 2L
      } finally { q1.stop(); q2.stop() }
    }
  }

  describe("TextOps.phraseSearch") {
    it("finds every occurrence incl. overlaps, normalizes like the " +
        "tokenizer, and emits nothing for non-matching or short docs") {
      import spark.implicits._
      val docs = Seq(
        (1L, "alpha beta alpha beta alpha"),
        (2L, "Beta,  ALPHA! beta"),
        (3L, "x x x"),
        (4L, "gamma delta"),
        (5L, "alpha")).toDF("doc_id", "text")
      def hits(phrase: String) =
        graft.text.TextOps.phraseSearch(docs, phrase).collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      hits("alpha beta") shouldBe
        Map(1L -> ((2L, 0L)), 2L -> ((1L, 1L)))
      hits("Beta  alpha?") shouldBe
        Map(1L -> ((2L, 1L)), 2L -> ((1L, 0L)))
      hits("x x") shouldBe Map(3L -> ((2L, 0L))) // overlapping: 0 and 1
      hits("x x")(3L)._1 shouldBe 2L
      hits("absent phrase") shouldBe empty
    }
  }

  describe("Robots") {
    import graft.text.Robots

    it("parseStarRules honors group boundaries, shared headers, " +
        "comments, case, and empty-prefix Disallow") {
      val body =
        """# site robots
          |User-agent: gptbot
          |Disallow: /
          |
          |User-agent: backup-bot
          |User-agent: *
          |# shared group
          |ALLOW: /public
          |disallow: /private   # inline comment
          |Crawl-delay: 10
          |Disallow:
          |
          |User-agent: other
          |Disallow: /elsewhere
          |""".stripMargin
      Robots.parseStarRules(body) shouldBe Seq(
        true -> "/public", false -> "/private")
    }

    it("sitemapLocs extracts trimmed <loc> URLs case-insensitively; " +
        "Urls.path keeps case and drops query/fragment") {
      import spark.implicits._
      val xml = "<urlset><url><loc>\n  https://a.com/One/Two?x=1#f " +
        "</loc></url><url><LOC>http://b.com</LOC></url></urlset>"
      val locs = Seq(xml).toDF("xml")
        .select(explode(Robots.sitemapLocs(col("xml"))).as("url"))
        .collect().map(_.getString(0))
      locs shouldBe Array("https://a.com/One/Two?x=1#f", "http://b.com")
      val paths = Seq(xml).toDF("xml")
        .select(explode(Robots.sitemapLocs(col("xml"))).as("url"))
        .select(graft.text.Urls.path(col("url"))).collect()
        .map(_.getString(0))
      paths shouldBe Array("/One/Two", "")
    }

    it("matchUrls: longest prefix wins, Allow wins ties, no match " +
        "defaults to allowed") {
      import spark.implicits._
      val urls = Seq(("h", "/doc/pub/1"), ("h", "/doc/priv/2"),
        ("h", "/tie/3"), ("h", "/free/4"), ("other", "/doc/priv/5"))
        .toDF("host", "path")
      val rules = Seq(("h", true, "/doc/pub"), ("h", false, "/doc/"),
        ("h", true, "/tie"), ("h", false, "/tie"))
        .toDF("host", "allow", "prefix")
      val out = Robots.matchUrls(urls, rules).collect()
        .map(r => r.getString(1) -> r.getBoolean(2)).toMap
      out shouldBe Map("/doc/pub/1" -> true, "/doc/priv/2" -> false,
        "/tie/3" -> true, "/free/4" -> true,
        "/doc/priv/5" -> true) // other host has no rules
    }
  }

  describe("TableDiff.contentDiff") {
    it("classifies retained/edited/moved/added/removed by content " +
        "hash, not id") {
      import spark.implicits._
      val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"),
        (4L, "delta")).toDF("doc_id", "text")
      val v2 = Seq((1L, "alpha"),        // retained
        (2L, "beta CHANGED"),            // edited
        (30L, "gamma"),                  // 3 → moved_out, 30 → moved_in
        (5L, "epsilon"))                 // added; 4 → removed
        .toDF("doc_id", "text")
      val out = graft.operators.TableDiff.contentDiff(v1, v2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      out shouldBe Map(1L -> "retained", 2L -> "edited",
        3L -> "moved_out", 30L -> "moved_in",
        4L -> "removed", 5L -> "added")
    }
  }

  describe("PipelineOps.negativeSamples") {
    it("never samples the anchor or an excluded pair, spreads probes " +
        "across the ring, and is deterministic") {
      import spark.implicits._
      val ids = (1L to 50L).toDF("doc_id")
      val excl = Seq((1L, 2L), (3L, 4L), (10L, 20L)).toDF("id1", "id2")
      val out = graft.pipeline.PipelineOps.negativeSamples(ids, excl, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      out.foreach { case (a, n, _) =>
        n should not be a
        Set((a, n), (n, a)).intersect(
          Set((1L, 2L), (3L, 4L), (10L, 20L))) shouldBe empty
      }
      // near-complete emission: ≤ 6 probes lost to the 3 exclusion pairs
      out.length should be >= 50 * 3 - 6
      // every anchor present; slots within 1..3
      out.map(_._1).distinct.length shouldBe 50
      out.map(_._3).toSet shouldBe Set(1L, 2L, 3L)
      // broad coverage: many distinct ids serve as negatives
      out.map(_._2).distinct.length should be >= 25
      val again = graft.pipeline.PipelineOps
        .negativeSamples(ids.repartition(7), excl, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      out.sorted shouldBe again.sorted
    }
  }

  describe("Fusion.rrfFuse") {
    it("fuses by reciprocal rank: agreement beats a single first " +
        "place; single-ranker docs still score; ties break to low nid") {
      import spark.implicits._
      // ranker A: d1 > d2 > d3;  ranker B: d2 > d1 (d3 absent from B)
      val a = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L))
        .toDF("qid", "nid", "rank")
      val b = Seq((0L, 2L, 1L), (0L, 1L, 2L)).toDF("qid", "nid", "rank")
      val f = graft.similarity.Fusion.rrfFuse(Seq(a, b))
        .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // d1: ⌊1e6/61⌋+⌊1e6/62⌋ = 16393+16129; d2: ⌊1e6/62⌋+⌊1e6/61⌋ —
      // identical sums → tie → d1 (lower nid) first
      f(1L)._1 shouldBe (16393L + 16129L)
      f(2L)._1 shouldBe f(1L)._1
      f(1L)._2 shouldBe 1L
      f(2L)._2 shouldBe 2L
      // d3 appears only in A at rank 3
      f(3L) shouldBe ((1000000L / 63L, 3L))
    }
  }

  describe("Warc") {
    import graft.sources.Warc

    it("round-trips payloads byte-exactly: multibyte UTF-8 lengths, " +
        "embedded blank lines, null texts dropped") {
      import spark.implicits._
      val docs = Seq(
        (1L, "plain ascii payload"),
        (2L, "café naïve 世界"), // bytes > chars
        (3L, "first para\n\nsecond para\r\nthird"),
        (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory("warc_spec").toString
      Warc.write(docs, dir)
      val back = Warc.read(spark, dir).collect()
        .map(r => r.getAs[String]("record_id") ->
          (r.getAs[Long]("content_length"), r.getAs[String]("payload"),
            r.getAs[Boolean]("truncated"), r.getAs[String]("warc_type")))
        .toMap
      back.keySet shouldBe Set("urn:graft:1", "urn:graft:2", "urn:graft:3")
      back("urn:graft:2")._1 shouldBe
        "café naïve 世界"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
      back.values.foreach { case (_, _, truncated, wt) =>
        truncated shouldBe false
        wt shouldBe "resource"
      }
      back("urn:graft:2")._2 shouldBe "café naïve 世界"
      back("urn:graft:3")._2 shouldBe "first para\n\nsecond para\r\nthird"
    }

    it("flags a record whose payload is shorter than its declared " +
        "Content-Length instead of corrupting neighbors") {
      val dir = java.nio.file.Files.createTempDirectory("warc_bad")
      val bad = "WARC/1.0\r\nWARC-Type: resource\r\n" +
        "WARC-Record-ID: urn:x:bad\r\nContent-Length: 9999\r\n\r\n" +
        "short\r\n" +
        "WARC/1.0\r\nWARC-Type: resource\r\n" +
        "WARC-Record-ID: urn:x:ok\r\nContent-Length: 4\r\n\r\n" +
        "good\r\n"
      java.nio.file.Files.writeString(dir.resolve("f.warc"), bad)
      val back = Warc.read(spark, dir.toString).collect()
        .map(r => r.getAs[String]("record_id") ->
          (r.getAs[Boolean]("truncated"), r.getAs[String]("payload")))
        .toMap
      back("urn:x:bad")._1 shouldBe true
      back("urn:x:ok") shouldBe ((false, "good"))
    }

    it("keepBestPerCluster elects the max-score member across a " +
        "TRANSITIVE chain; ties break to the lowest id; singletons " +
        "survive") {
      import spark.implicits._
      val docs = Seq(
        (1L, 5L), (2L, 9L), (3L, 7L), // chain 1-2-3: 2 wins
        (10L, 4L), (11L, 4L),         // tie: 10 wins
        (50L, 0L))                    // singleton
        .toDF("doc_id", "score")
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
      val kept = graft.dedup.Dedup.keepBestPerCluster(docs, pairs, "score")
        .select(col("doc_id"), col("cluster")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      kept shouldBe Map(2L -> 1L, 10L -> 10L, 50L -> 50L)
    }

    it("Jsonl.parseWithQuarantine routes malformed AND wrong-shape " +
        "lines to quarantine with the raw line; counts always add up") {
      import spark.implicits._
      val lines = Seq(
        """{"doc_id":1,"lang":"en","text":"good line"}""",
        """{"doc_id":2,"lang":"de","text":"truncat""",   // malformed
        """{"lang":"fr","text":"no id"}""",              // required null
        """{"doc_id":4,"lang":null,"text":"null lang ok"}""",
        """not json at all""").toDF("line")
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("lang", "string").add("text", "string")
      val parsed = graft.io.Jsonl.parseWithQuarantine(lines, schema,
        required = Seq("doc_id", "text"))
      val (good, bad) = graft.io.Jsonl.route(parsed)
      good.count() + bad.count() shouldBe 5L
      good.select(col("doc_id")).collect().map(_.getLong(0)).sorted shouldBe
        Array(1L, 4L) // null lang is fine — lang is not required
      val rawBad = bad.collect().map(_.getString(0)).toSet
      rawBad shouldBe Set(
        """{"doc_id":2,"lang":"de","text":"truncat""",
        """{"lang":"fr","text":"no id"}""",
        """not json at all""")
      good.columns.toSeq shouldBe Seq("doc_id", "lang", "text")
    }

    it("reads records from MANY part files (the distributed layout " +
        "write produces) into one frame") {
      import spark.implicits._
      val docs = (1L to 40L).map(i => (i, s"payload number $i"))
        .toDF("doc_id", "text").repartition(8)
      val dir = java.nio.file.Files.createTempDirectory("warc_many").toString
      Warc.write(docs, dir)
      val parts = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("part-"))
      parts should be > 1
      val back = Warc.read(spark, dir)
      back.count() shouldBe 40L
      back.select(col("payload")).collect().map(_.getString(0)).toSet shouldBe
        (1L to 40L).map(i => s"payload number $i").toSet
    }
  }
}

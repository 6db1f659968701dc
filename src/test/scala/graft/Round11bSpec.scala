package graft

import org.apache.spark.sql.functions._

/** Round-11 additions: link-prediction counts, degree histogram,
  * lexical diversity, token-run stutter, vocab OOV audit, robots
  * crawl-delay, and the sampled-pair calibration stats. */
class Round11bSpec extends SparkSpec {

  describe("Motifs.linkPredictionCounts") {

    it("square: the two diagonals, 2 common neighbors, degree 2 each; " +
        "adjacent pairs never appear") {
      import spark.implicits._
      val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
        .toDF("s", "t")
      val got = graft.operators.Motifs.linkPredictionCounts(edges)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      got shouldBe Set(("a", "c", 2L, 2L, 2L), ("b", "d", 2L, 2L, 2L))
    }

    it("triangle: every pair adjacent, so no candidates") {
      import spark.implicits._
      val edges = Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("s", "t")
      graft.operators.Motifs.linkPredictionCounts(edges).count() shouldBe 0L
    }

    it("star: leaf pairs share exactly the hub; hub degree counted " +
        "from the full graph") {
      import spark.implicits._
      val edges = Seq(("h", "l1"), ("h", "l2"), ("h", "l3")).toDF("s", "t")
      val got = graft.operators.Motifs.linkPredictionCounts(edges)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      got shouldBe Set(
        ("l1", "l2", 1L, 1L, 1L), ("l1", "l3", 1L, 1L, 1L),
        ("l2", "l3", 1L, 1L, 1L))
    }

    it("duplicate and reversed raw edges dedup before counting") {
      import spark.implicits._
      val edges = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"))
        .toDF("s", "t")
      val got = graft.operators.Motifs.linkPredictionCounts(edges)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      got shouldBe Set(("a", "c", 1L, 1L, 1L))
    }
  }

  describe("GraphAudit.degreeHistogram") {

    it("hand-computed buckets on a hub fan-in") {
      import spark.implicits._
      // hub h -> 5 leaves; leaves l1..l5 each -> z  (z indeg 5, h outdeg 5)
      val edges = (1 to 5).map(i => ("h", s"l$i")) ++
        (1 to 5).map(i => (s"l$i", "z"))
      val df = edges.toDF("src", "dst")
      val got = graft.operators.GraphAudit.degreeHistogram(df)
        .collect().map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      // out: h deg 5 (bucket 3), l1..l5 deg 1 (bucket 1)
      got(("out", 3L)) shouldBe ((1L, 5L, 5L))
      got(("out", 1L)) shouldBe ((5L, 1L, 1L))
      // in: l1..l5 deg 1 (bucket 1), z deg 5 (bucket 3)
      got(("in", 1L)) shouldBe ((5L, 1L, 1L))
      got(("in", 3L)) shouldBe ((1L, 5L, 5L))
      got.size shouldBe 4
    }

    it("self-loops and duplicates drop; empty graph → empty histogram") {
      import spark.implicits._
      val edges = Seq(("a", "a"), ("a", "b"), ("a", "b")).toDF("src", "dst")
      val got = graft.operators.GraphAudit.degreeHistogram(edges)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      got shouldBe Set(("out", 1L, 1L), ("in", 1L, 1L))
      graft.operators.GraphAudit.degreeHistogram(
        Seq(("x", "x")).toDF("src", "dst")).count() shouldBe 0L
    }
  }

  describe("TextOps.lexicalStats") {

    it("hand counts incl. a token-free doc") {
      import spark.implicits._
      val docs = Seq(
        (1L, "the cat and the dog and the bird"),
        (2L, "a a a"),
        (3L, "!!! ---"),
        (4L, "unique words only here")).toDF("doc_id", "text")
      val got = graft.text.TextOps.lexicalStats(docs)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // doc1: the×3 cat and×2 dog bird → 8 tokens, 5 types, 3 hapax
      got(1L) shouldBe ((8L, 5L, 3L))
      got(2L) shouldBe ((3L, 1L, 0L))
      got(3L) shouldBe ((0L, 0L, 0L))
      got(4L) shouldBe ((4L, 4L, 4L))
    }
  }

  describe("TextOps.maxTokenRun") {

    it("hand cases: empty, no repeats, run mid/at-end, " +
        "case/punct normalization") {
      import spark.implicits._
      val docs = Seq(
        (1L, ""), (2L, "a b c"), (3L, "x go go go y"),
        (4L, "end end"), (5L, "The THE the! rest"),
        (6L, "a bb a")).toDF("doc_id", "text")
      val got = docs.select(col("doc_id"),
          graft.text.TextOps.maxTokenRun(col("text")).as("r"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe Map(1L -> 0L, 2L -> 1L, 3L -> 3L, 4L -> 2L,
        5L -> 3L, 6L -> 1L)
    }
  }

  describe("TextOps.oovStats") {

    it("hand vocab: counts, distinct OOV types, token-free doc zeros") {
      import spark.implicits._
      val docs = Seq(
        (1L, "the cat sat on the mat"),
        (2L, "zz yy zz"),
        (3L, "...")).toDF("doc_id", "text")
      val vocab = Seq("the", "cat", "on").toDF("token")
      val got = graft.text.TextOps.oovStats(docs, vocab)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // doc1: 6 tokens; OOV sat, mat → 2 occurrences, 2 types
      got(1L) shouldBe ((6L, 2L, 2L))
      got(2L) shouldBe ((3L, 3L, 2L))
      got(3L) shouldBe ((0L, 0L, 0L))
    }
  }

  describe("Robots crawl-delay") {

    it("parseStarDelay: first star value wins; non-star groups, " +
        "junk, fractional and oversized values ignored; comments " +
        "neutral inside a header block") {
      import graft.text.Robots.parseStarDelay
      parseStarDelay("User-agent: *\nCrawl-delay: 5\n") shouldBe Some(5L)
      parseStarDelay(
        "User-agent: *\nCrawl-delay: 5\nCrawl-delay: 9\n") shouldBe Some(5L)
      parseStarDelay(
        "User-agent: bot\nCrawl-delay: 9\n\nUser-agent: *\nDisallow: /\n"
      ) shouldBe None
      parseStarDelay("User-agent: *\nCrawl-delay: fast\n") shouldBe None
      parseStarDelay("User-agent: *\nCrawl-delay: 1.5\n") shouldBe None
      parseStarDelay("User-agent: *\nCrawl-delay: 1234567890\n") shouldBe None
      parseStarDelay("User-agent: a\n# note\nUser-agent: *\n" +
        "Crawl-delay: 3\n") shouldBe Some(3L)
      parseStarDelay("User-agent: *\nCrawl-delay: 7 # fast\n") shouldBe
        Some(7L)
      parseStarDelay("") shouldBe None
    }

    it("delaysTable keeps a NULL row for hosts without a star delay") {
      import spark.implicits._
      val bodies = Seq(
        ("a.com", "User-agent: *\nCrawl-delay: 4\n"),
        ("b.com", "User-agent: bot\nCrawl-delay: 9\n"))
        .toDF("host", "body")
      val got = graft.text.Robots.delaysTable(bodies)
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      got shouldBe Map("a.com" -> Some(4L), "b.com" -> None)
    }
  }

  describe("Pii.cardStats / luhnSum") {

    it("valid PANs pass, off-by-one fails, 17+ digit runs are not " +
        "candidates, boundaries respected") {
      import spark.implicits._
      val docs = Seq(
        (1L, "pay 4111111111111111 now"),          // valid 16 (Visa test)
        (2L, "pay 4111111111111112 now"),          // invalid
        (3L, "id 12345678901234567890 here"),      // 20 digits: no \b cut
        (4L, "amex 378282246310005 ok"),           // valid 15
        (5L, "short 123456789012 run"),            // 12 digits: too short
        (6L, "x4111111111111111 glued"),           // letter glue: \b still
                                                   // splits letter→digit? no:
                                                   // \w\w boundary absent
        (7L, "two 4111111111111111 and 4012888888881881")) // both valid
        .toDF("doc_id", "text")
      val (nc, nv) = graft.text.Pii.cardStats(col("text"))
      val got = docs.select(col("doc_id"), nc.as("c"), nv.as("v"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      got(1L) shouldBe ((1L, 1L))
      got(2L) shouldBe ((1L, 0L))
      got(3L) shouldBe ((0L, 0L))
      got(4L) shouldBe ((1L, 1L))
      got(5L) shouldBe ((0L, 0L))
      got(6L) shouldBe ((0L, 0L)) // x4111… : no word boundary before 4
      got(7L) shouldBe ((2L, 2L))
    }
  }

  describe("Communities.modularityComponents") {

    it("two triangles + bridge: hand stats and Q") {
      import spark.implicits._
      val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
        ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d")).toDF("src", "dst")
      val labels = Seq(("a", "A"), ("b", "A"), ("c", "A"),
        ("d", "B"), ("e", "B"), ("f", "B")).toDF("id", "label")
      val comp = graft.operators.Communities
        .modularityComponents(edges, labels)
      val got = comp.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      got("A") shouldBe ((3L, 3L, 7L, 7L))
      got("B") shouldBe ((3L, 3L, 7L, 7L))
      graft.operators.Communities.modularity(comp) shouldBe
        (2.0 * (3.0 / 7 - 0.25)) +- 1e-12
    }

    it("unlabeled endpoints become singleton labels; reversed dups " +
        "dedup") {
      import spark.implicits._
      val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
      val labels = Seq(("a", "A")).toDF("id", "label")
      val got = graft.operators.Communities
        .modularityComponents(edges, labels)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      got("A") shouldBe ((1L, 0L, 1L, 1L))
      got("b") shouldBe ((1L, 0L, 1L, 1L))
    }
  }

  describe("Urls.featureColumns") {

    it("hand URLs: digits, depths, params, port, unparseable") {
      import spark.implicits._
      val urls = Seq(
        (1L, "https://sub1.ex2.example.com:8080/a/b/c?x=1&y=2#f"),
        (2L, "http://example.com"),
        (3L, "not a url")).toDF("id", "url")
      val got = urls.select((col("id") +:
          graft.text.Urls.featureColumns(col("url"))): _*)
        .collect().map(r => r.getLong(0) -> r).toMap
      val r1 = got(1L)
      // host sub1.ex2.example.com: digits 2, labels 4
      r1.getLong(1) shouldBe 2L; r1.getLong(2) shouldBe 4L
      r1.getLong(3) shouldBe 3L; r1.getLong(4) shouldBe 6L // /a/b/c
      r1.getLong(5) shouldBe 2L; r1.getLong(6) shouldBe 1L
      val r2 = got(2L)
      r2.getLong(1) shouldBe 0L; r2.getLong(2) shouldBe 2L
      r2.getLong(3) shouldBe 0L; r2.getLong(4) shouldBe 0L
      r2.getLong(5) shouldBe 0L; r2.getLong(6) shouldBe 0L
      val r3 = got(3L)
      r3.isNullAt(1) shouldBe true; r3.isNullAt(2) shouldBe true
      r3.getLong(3) shouldBe 0L; r3.getLong(4) shouldBe 0L
      r3.getLong(5) shouldBe 0L; r3.getLong(6) shouldBe 0L
    }
  }

  describe("Similarity.sampledPairStats") {

    it("pairs are consecutive ranks within md5 buckets, values match " +
        "a local fold, and the draw is repartition-invariant") {
      import spark.implicits._
      val n = 60
      val vecs = (0 until n).map(i =>
        (i.toLong, Array.tabulate(4)(j => (i * 4 + j).toFloat / 10f)))
      val df = vecs.toDF("vec_id", "embedding")
      val got = graft.similarity.Similarity
        .sampledPairStats(df, buckets = 8)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
      got should not be empty
      // local recomputation
      val byId = vecs.toMap
      def md5b(id: Long): Long = {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Long.parseLong(h.substring(0, 8), 16) % 8
      }
      val expectPairs = (0L until n.toLong).groupBy(md5b)
        .values.flatMap { ids =>
          val s = ids.sorted
          s.zip(s.drop(1))
        }.toSet
      got.keySet shouldBe expectPairs
      got.foreach { case ((a, b), (dot, na2, nb2)) =>
        val (va, vb) = (byId(a), byId(b))
        def r6(x: Double) =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
        dot shouldBe r6(va.zip(vb).foldLeft(0.0) { case (acc, (x, y)) =>
          acc + x.toDouble * y.toDouble }) +- 1e-9
        na2 shouldBe r6(va.foldLeft(0.0)((acc, x) =>
          acc + x.toDouble * x.toDouble)) +- 1e-9
        nb2 shouldBe r6(vb.foldLeft(0.0)((acc, x) =>
          acc + x.toDouble * x.toDouble)) +- 1e-9
      }
      // partitioning independence
      val re = graft.similarity.Similarity
        .sampledPairStats(df.repartition(7), buckets = 8)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
      re shouldBe got
    }
  }
}

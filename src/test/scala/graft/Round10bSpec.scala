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
}

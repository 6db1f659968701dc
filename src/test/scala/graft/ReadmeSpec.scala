package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model._
import graft.operators._
import graft.query.{GetSnapshot, Query}

/** The reference's README executed as a test (its `test-readme/` tier,
  * README.md:68 "this README is also a test script") — every executable
  * walkthrough re-expressed against the Spark engine:
  *
  *  1. "basic" (README.md:94-208): two switch findings → snapshot from
  *     switch1 → the exact node/link/timestamp expectations, plus the
  *     GraphML rendering step;
  *  2. "weaver" (README.md:235-321): the in-memory quick-start —
  *     newWeaver policyOverwrite, pure addFoundNode, getSnapshot
  *     unifyToOne;
  *  3. "interval" (README.md:441-499): querying the past excludes
  *     newer findings;
  *  4. "multi-link" (README.md:502-605): two port-distinguished links
  *     between one switch pair via the link sub-ID unifier, plus the
  *     README's "without the sub-ID you get one link" remark;
  *  5. "merge-link-attrs" (README.md:615-746): the SignalStrengths
  *     mergeSamples exemplar — each end observes its own RX signal
  *     strength; a custom list-valued merge combines BOTH ends'
  *     attributes into one link whose at_source/at_dest orientation
  *     follows the latest base sample;
  *  plus the repo README's own pipeline-cookbook snippets.
  */
class ReadmeSpec extends SparkSpec {

  private def fl(target: String, attrs: Map[String, String] = Map.empty) =
    FoundLink(target, LinkState.Bidirectional, attrs)
  private def fn(subject: String, at: String, links: Seq[FoundLink],
      seq: Long) =
    FoundNode(subject, ts(at), Map.empty, links, seq)

  it("basic walkthrough — two findings, snapshot from switch1 " +
      "(README.md:94-208)") {
    val finding1 = fn("switch1", "2018-08-20T12:53:38",
      Seq(fl("switch2"), fl("switch3")), seq = 1)
    val finding2 = fn("switch2", "2018-08-20T13:00:22",
      Seq(fl("switch4"), fl("switch1")), seq = 2)
    val findings = Findings.fromSeq(spark, Seq(finding1, finding2))
    import spark.implicits._
    val g = GetSnapshot(spark, findings, Query(Seq("switch1")))

    val nodes = g.nodes.collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .sortBy(_._1).toSeq
    nodes shouldBe Seq(
      ("switch1", Some(ts("2018-08-20T12:53:38"))),
      ("switch2", Some(ts("2018-08-20T13:00:22"))),
      ("switch3", None),
      ("switch4", None))

    val links = g.links.collect()
      .map { r =>
        val (s, d) = (r.getString(0), r.getString(1))
        (Seq(s, d).min, Seq(s, d).max, r.getLong(3))
      }.sortBy(t => (t._1, t._2)).toSeq
    links shouldBe Seq(
      ("switch1", "switch2", ts("2018-08-20T13:00:22")),
      ("switch1", "switch3", ts("2018-08-20T12:53:38")),
      ("switch2", "switch4", ts("2018-08-20T13:00:22")))

    // the README's final step renders the snapshot as GraphML
    val xml = graft.io.GraphMl.write(g)
    xml should include("<graphml")
    Seq("switch1", "switch2", "switch3", "switch4").foreach(sw =>
      xml should include(s"""<node id="$sw">"""))
  }

  it("time-interval walkthrough — querying the past excludes newer " +
      "findings (README.md:441-499)") {
    // switch1 first saw only switch2; 20 seconds later also switch3
    val finding1 = fn("switch1", "2018-11-30T00:16:40",
      Seq(fl("switch2")), seq = 1)
    val finding2 = fn("switch1", "2018-11-30T00:17:00",
      Seq(fl("switch2"), fl("switch3")), seq = 2)
    val findings = Findings.fromSeq(spark, Seq(finding1, finding2))
    import spark.implicits._
    // query interval: -inf <= t <= 2018-11-30T00:16:50
    val g = GetSnapshot(spark, findings, Query(Seq("switch1"),
      interval = graft.time.Interval(
        graft.time.IntervalEnd(None, inclusive = true),
        graft.time.IntervalEnd(Some(ts("2018-11-30T00:16:50")),
          inclusive = true))))
    // map linkNodeTuple raw_links `shouldBe` [("switch1", "switch2")]
    g.links.collect().map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("switch1", "switch2"))
  }

  it("pipeline cookbook snippets run as written (README 'Pipeline cookbook')") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.{TemporalJoins, TableDiff}
    import graft.sketch.Hll
    import graft.pipeline.{Funnel, Profile}
    val trades = Seq(("A", 10L, 1)).toDF("sym", "t", "tid")
    val quotes = Seq(("A", 5L, 100)).toDF("sym", "qt", "px")
    TemporalJoins.asOfJoin(trades, quotes, Seq("sym"),
      leftTime = "t", rightTime = "qt").count() shouldBe 1
    val windows = Seq((7L, 0L, 86400000L)).toDF("wid", "lo", "hi")
    val events = Seq((7L, 1L, 500L)).toDF("wid", "event_id", "ms")
    TemporalJoins.rangeJoin(windows, events, Seq("wid"),
      lo = "lo", hi = "hi", pt = "ms", binWidth = 86400000L)
      .count() shouldBe 1
    val ev = Seq((1L, "view", 10L), (1L, "click", 20L))
      .toDF("user_id", "event_type", "ms")
    Hll.registersBy(ev, col("user_id").cast("string"), Seq("event_type"))
      .count() shouldBe 2
    Funnel.funnel(ev, Seq("view", "click", "purchase"))
      .select("funnel_stage").as[Long].head() shouldBe 2L
    val before = Seq(("a", "b", "up", 1.0)).toDF("subject", "target", "link_state", "value")
    val after = Seq(("a", "b", "down", 1.0)).toDF("subject", "target", "link_state", "value")
    TableDiff.diff(before, after, keys = Seq("subject", "target"),
      compare = Seq("link_state", "value"))
      .select("change").as[String].head() shouldBe "changed"
    Profile.profile(before, Seq("subject")).count() shouldBe 1

    // round-5 additions
    import graft.sketch.{Bloom, Frequent}
    import graft.pipeline.{Quality, Scd}
    import graft.text.Fuzzy
    val bigFacts = spark.range(0, 100).select(col("id").as("key"))
    val smallDim = Seq((3L, "x"), (7L, "y")).toDF("key", "name")
    Bloom.prefilterJoin(bigFacts, smallDim, "key").count() shouldBe 2
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a d"))
      .toDF("doc_id", "text")
    Frequent.frequentTokens(docs, minDocFreq = 3)
      .select("token").as[String].collect() shouldBe Array("a")
    val dim = Scd.build(
      Seq((1L, "view", 10L, 1L)).toDF("user_id", "event_type", "ms", "event_id"),
      "user_id", "event_type", "ms", "event_id")
    val batch = Seq((1L, "click", 20L, 2L))
      .toDF("user_id", "event_type", "ms", "event_id")
    Scd.applyBatch(dim, batch, "user_id", "event_type", "ms", "event_id")
      .count() shouldBe 2
    val customer = Seq((1L, "c")).toDF("c_custkey", "c_name")
    val orders = Seq((10L, 1L), (11L, 9L)).toDF("o_orderkey", "o_custkey")
    Quality.audit(Seq(
      Quality.fkCheck("orders_fk", orders, "o_custkey", customer, "c_custkey"),
      Quality.uniqueCheck("pk", customer, Seq("c_custkey"))))
      .as[(String, Long)].collect().toSet shouldBe
        Set(("orders_fk", 1L), ("pk", 0L))
    val vocab = Seq("cold", "old", "zebra").toDF("word")
    Fuzzy.fuzzyPairs(vocab, "word", maxDist = 2)
      .select("w1", "w2").as[(String, String)].collect() shouldBe
        Array(("cold", "old"))

    // round-10 additions
    import graft.pipeline.{Mixture, PipelineOps}
    import graft.dedup.Dedup
    import graft.text.{Robots, TextOps}
    import graft.similarity.Fusion
    val corpus = Seq((1L, "en", "alpha beta"), (2L, "en", "alpha beta"),
      (3L, "de", "gamma delta")).toDF("doc_id", "lang", "text")
    Mixture.planWithTargets(corpus, Mixture.temperatureTargets(corpus))
      .count() shouldBe 2
    val dupPairs = Seq((1L, 2L)).toDF("id1", "id2")
    val split = PipelineOps.leakageSafeSplit(corpus, dupPairs,
      Seq("train" -> 900000L, "test" -> 100000L))
    split.filter(col("doc_id") <= 2).select("split").distinct()
      .count() shouldBe 1 // the cluster moved atomically
    val scoredDocs = corpus.withColumn("score", col("doc_id") % 2)
    Dedup.keepBestPerCluster(scoredDocs, dupPairs, "score")
      .select("doc_id").as[Long].collect().sorted shouldBe
        Array(1L, 3L) // score 1 beats score 0 in the cluster
    val keywordRanking = Seq((0L, 1L, 1L), (0L, 3L, 2L))
      .toDF("qid", "nid", "rank")
    val vectorRanking = Seq((0L, 3L, 1L), (0L, 1L, 2L))
      .toDF("qid", "nid", "rank")
    Fusion.rrfFuse(Seq(keywordRanking, vectorRanking))
      .count() shouldBe 2
    val urls = Seq(("h.com", "/private/x"), ("h.com", "/pub"))
      .toDF("host", "path")
    val robotsBodies = Seq(("h.com",
      "User-agent: *\nDisallow: /private\n")).toDF("host", "body")
    Robots.matchUrls(urls, Robots.rulesTable(robotsBodies))
      .filter(col("allowed")).select("path").as[String]
      .collect() shouldBe Array("/pub")
    TextOps.phraseSearch(corpus, "alpha beta").count() shouldBe 2
  }

  it("SignalStrengths mergeSamples — both ends' signals on one link " +
      "(README.md:615-746)") {
    // switch1 and switch2 each observe their own received signal
    // strength on the SAME physical link
    val finding1 = fn("switch1", "2018-09-17T12:57:50",
      Seq(fl("switch2", Map("rssi" -> "-4.3"))), seq = 1)
    val finding2 = fn("switch2", "2018-09-17T13:03:08",
      Seq(fl("switch1", Map("rssi" -> "-5.5"))), seq = 2)

    // the README's `merger`: base = latest sample overall; attach the
    // lo/hi signals oriented to the base's (source, destination)
    val merger = (lo: Column, hi: Column) => {
      val llink = ListMergeUnifier.latest(lo)
      val rlink = ListMergeUnifier.latest(hi)
      val base = ListMergeUnifier.latestOfBoth(lo, hi)
      val fromLo = llink.isNotNull &&
        base("sample_seq") === llink("sample_seq")
      val lsignal = llink("link_attrs")("rssi")
      val rsignal = rlink("link_attrs")("rssi")
      when(base.isNotNull, struct(
        base("subject").as("subject"),
        base("target").as("target"),
        base("link_state").as("link_state"),
        base("epoch_ms").as("epoch_ms"),
        map(lit("at_source"), when(fromLo, lsignal).otherwise(rsignal),
          lit("at_dest"), when(fromLo, rsignal).otherwise(lsignal))
          .as("link_attrs"),
        base("sample_seq").as("sample_seq"),
        base("tz").as("tz")))
    }

    val findings = Findings.fromSeq(spark, Seq(finding1, finding2))
    import spark.implicits._
    val g = GetSnapshot(spark, findings,
      Query(Seq("switch1"), unifier = new ListMergeUnifier(merger)))

    val links = g.links.collect()
    links.length shouldBe 1 // README: length raw_links `shouldBe` 1
    val l = links.head
    // linkNodeTuple got_link `shouldBe` ("switch2", "switch1")
    (l.getString(0), l.getString(1)) shouldBe ("switch2", "switch1")
    l.getLong(3) shouldBe ts("2018-09-17T13:03:08")
    // sourceNodeRxSignal / destNodeRxSignal expectations: the signal at
    // the source (switch2) is -5.5, at the destination (switch1) -4.3
    val attrs = l.getMap[String, String](4).toMap
    attrs shouldBe Map("at_source" -> "-5.5", "at_dest" -> "-4.3")
  }

  it("Weaver quick-start — snapshot on memory, no store " +
      "(README.md:235-321)") {
    // newWeaver policyOverwrite; two findings added as pure ops;
    // getSnapshot unifyToOne — all samples between a pair become one
    // link (the StdUnifier default with no sub-ID).
    val w = new Weaver(spark)
    w.addFoundNode(fn("switch1", "2018-08-20T12:53:38",
        Seq(fl("switch2"), fl("switch3")), seq = 0))
      .addFoundNode(fn("switch2", "2018-08-20T13:00:22",
        Seq(fl("switch4"), fl("switch1")), seq = 0))
    val g = w.getSnapshot()
    // map nodeId got_nodes `shouldBe` [switch1..switch4]
    g.nodes.collect().map(_.getString(0)).sorted.toSeq shouldBe
      Seq("switch1", "switch2", "switch3", "switch4")
    // map linkNodePair got_links `shouldBe` the three swap-insensitive
    // pairs
    g.links.collect()
      .map { r =>
        val (s, d) = (r.getString(0), r.getString(1))
        (Seq(s, d).min, Seq(s, d).max)
      }.sorted.toSeq shouldBe
      Seq(("switch1", "switch2"), ("switch1", "switch3"),
        ("switch2", "switch4"))
  }

  it("multi-link walkthrough — two port-distinguished links between " +
      "one switch pair (README.md:502-605)") {
    // one finding: switch1 sees switch2 over TWO physical links,
    // distinguished only by Ports(sport, tport)
    val finding1 = fn("switch1", "2018-09-13T12:43:10", Seq(
      fl("switch2", Map("sport" -> "Gi0/0", "tport" -> "Gi0/12")),
      fl("switch2", Map("sport" -> "Gi0/1", "tport" -> "Gi0/13"))),
      seq = 1)
    val findings = Findings.fromSeq(spark, Seq(finding1))
    import spark.implicits._
    // linkSubIdWithPorts: the swap-immune Pair((subject, sport),
    // (target, tport)) — stated as (least, greatest) of the two
    // endpoint|port strings, the reference's Pair Eq/Ord semantics
    val withPorts = new StdUnifier(subId = Seq(
      least(concat_ws("|", col("subject"), col("link_attrs")("sport")),
        concat_ws("|", col("target"), col("link_attrs")("tport"))),
      greatest(concat_ws("|", col("subject"), col("link_attrs")("sport")),
        concat_ws("|", col("target"), col("link_attrs")("tport")))))
    val g = GetSnapshot(spark, findings,
      Query(Seq("switch1"), unifier = withPorts))
    val links = g.links.collect()
    // length raw_links `shouldBe` 2, both ("switch1","switch2")
    links.length shouldBe 2
    links.map(r => (r.getString(0), r.getString(1))).toSeq shouldBe
      Seq(("switch1", "switch2"), ("switch1", "switch2"))
    // linkAttributes shouldMatchList [Ports Gi0/0 Gi0/12, Gi0/1 Gi0/13]
    links.map(_.getMap[String, String](4).toMap).toSet shouldBe Set(
      Map("sport" -> "Gi0/0", "tport" -> "Gi0/12"),
      Map("sport" -> "Gi0/1", "tport" -> "Gi0/13"))
    // ...and WITHOUT the sub-ID the result collapses to ONE link
    // (README: "the result would contain just one link")
    GetSnapshot(spark, findings, Query(Seq("switch1")))
      .links.count() shouldBe 1L
  }
}

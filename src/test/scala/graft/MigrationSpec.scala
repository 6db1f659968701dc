package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.operators._
import graft.query.{GetSnapshot, Query}
import graft.time.{Interval, IntervalEnd}

/** MIGRATION.md EXECUTED (round-14 verdict item 6): the reference runs
  * its README as a test (net-spider/test-readme/); ReadmeSpec covers
  * the reference's README, but graft's own migration guide was prose
  * only. Each test here corresponds to one MIGRATION.md table and
  * CALLS every graft-side symbol that table cites, so a claim in the
  * doc that stops compiling (or stops behaving) fails CI instead of
  * silently rotting. Keep this spec and MIGRATION.md in sync: a row
  * added there gets a call added here.
  */
class MigrationSpec extends SparkSpec {

  private def fl(t: String, s: String = LinkState.ToTarget) =
    FoundLink(t, s, Map.empty)
  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // a small woven graph several analytics rows share
  private lazy val chainGraph: SnapshotGraph = {
    val w = new Weaver(spark)
    w.addFoundNode(FoundNode("r", 100L, Map.empty, Seq(fl("m"))))
      .addFoundNode(FoundNode("m", 100L, Map.empty, Seq(fl("l"))))
    w.getSnapshot()
  }

  describe("MIGRATION.md §Engines") {
    it("Weaver: addFoundNode / markAsVisited / getSnapshot, spill past " +
        "spillThreshold instead of growing the driver buffer") {
      val w = new Weaver(spark, spillThreshold = 2)
      w.addFoundNode(FoundNode("n1", 100L, Map.empty, Seq(fl("n2"))))
        .addFoundNode(FoundNode("n2", 100L, Map.empty, Nil))
        .addFoundNode(FoundNode("n1", 50L, Map.empty, Nil)) // spilled batch 2
        .markAsVisited("lonely")
      val g = w.getSnapshot(new StdUnifier())
      // overwrite policy: n1's LATEST finding (100, with link) wins even
      // though the 50 finding arrived after the spill flush
      g.nodes.collect().map(_.getString(0)).sorted.toSeq shouldBe
        Seq("lonely", "n1", "n2")
      g.links.count() shouldBe 1
      w.close()
    }

    it("Spider over a parquet history dir: addFoundNodes / " +
        "getSnapshotSimple / getSnapshot / readFindings / clearAll") {
      val dir = tmp("mig_spider") + "/h"
      val sp = Spider(spark, dir)
      sp.addFoundNodes(Seq(
        FoundNode("a", ts("2024-01-10T00:00"), Map.empty, Seq(fl("b")), 0),
        FoundNode("b", ts("2024-01-15T00:00"), Map.empty, Seq(fl("c")), 1)))
      sp.readFindings(Interval.whole).count() shouldBe 2
      sp.getSnapshotSimple(Seq("a")).nodes.count() shouldBe 3
      sp.getSnapshot(Query(Seq("b"))).nodes.count() shouldBe 2
      sp.clearAll()
      new java.io.File(dir).exists() shouldBe false
    }

    it("Spider over a subject-bucketed catalog table: the SAME facade " +
        "detects the EXISTING layout and reads/appends through it") {
      val table = "mig_bucketed_history"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      // the bucketed layout is created by History.appendBucketed (the
      // scale refinement); the facade then detects and uses it
      graft.sources.History.appendBucketed(
        model.Findings.fromSeq(spark, Seq(
          FoundNode("a", 100L, Map.empty, Seq(fl("b")), 0))), table)
      graft.sources.History.isBucketedTable(spark, table) shouldBe true
      val sp = Spider(spark, table)
      sp.addFoundNodes(Seq(
        FoundNode("b", 200L, Map.empty, Nil, 1)))
      sp.readFindings(Interval.whole).count() shouldBe 2
      sp.getSnapshotSimple(Seq("a")).nodes.count() shouldBe 2
      sp.clearAll()
      graft.sources.History.isBucketedTable(spark, table) shouldBe false
    }
  }

  describe("MIGRATION.md §Query") {
    val dir = tmp("mig_query") + "/h"
    lazy val sp = {
      val s = Spider(spark, dir)
      s.addFoundNodes(Seq(
        FoundNode("n1", 100L, Map.empty, Seq(fl("n2")), 0),
        FoundNode("n2", 200L, Map.empty, Seq(fl("n3")), 1),
        FoundNode("n2", 300L, Map.empty, Seq(fl("n3")), 2),
        FoundNode("n3", 400L, Map.empty, Nil, 3)))
      s
    }

    it("defQuery / startsFrom / timeInterval with per-bound " +
        "inclusivity and +-inf via None") {
      val q = Query(Seq("n1"),
        interval = Interval(IntervalEnd(None, true), // -inf
          IntervalEnd(Some(250L), false))) // ..< 250 exclusive
      val g = sp.getSnapshot(q)
      // n2's 300 finding is filtered; its 200 finding (within) wins
      g.links.filter(col("source_node") === "n2").count() shouldBe 1
    }

    it("foundNodePolicy PolicyOverwrite / PolicyAppend / PolicyKeepN") {
      sp.getSnapshot(Query(Seq("n1"), policy = PolicyOverwrite))
        .nodes.count() shouldBe 3
      sp.getSnapshot(Query(Seq("n1"), policy = PolicyAppend))
        .nodes.count() shouldBe 3
      sp.getSnapshot(Query(Seq("n1"), policy = PolicyKeepN(1)))
        .nodes.count() shouldBe 3
    }

    it("unifyLinkSamples = unifier; maxHops bounds the traversal " +
        "(nodes past the horizon surface as boundary)") {
      val g = sp.getSnapshot(Query(Seq("n1"),
        unifier = new StdUnifier(), maxHops = Some(1)))
      g.nodes.filter(col("node_id") === "n3")
        .select(col("is_on_boundary"))
        .collect()(0).getBoolean(0) shouldBe true
    }

    it("GetSnapshot.ofStarts: data-derived start sets never touch the " +
        "driver") {
      import spark.implicits._
      val g = GetSnapshot.ofStarts(spark, sp.readFindings(Interval.whole),
        Seq("n1").toDF("node_id"), Query(Seq.empty[String]))
      g.nodes.count() shouldBe 3
    }

    it("node-id type generic: Spider[Long] runs the identical pipeline " +
        "over BIGINT ids") {
      val ldir = tmp("mig_long") + "/h"
      val lsp = new Spider[Long](spark, ldir)(
        org.apache.spark.sql.Encoders.scalaLong)
      val findings = spark.range(1).selectExpr(
        "1L AS subject", "100L AS epoch_ms", "0L AS finding_seq",
        "map('k', 'v') AS node_attrs",
        "array(named_struct('target', 2L, 'link_state', 'to_target', " +
          "'link_attrs', map('k', 'v'))) AS links")
      lsp.addFoundNodes(findings)
      lsp.getSnapshotSimple(Seq(1L)).nodes.count() shouldBe 2
      lsp.clearAll()
    }
  }

  describe("MIGRATION.md §Unifiers") {
    // both ends corroborate both ports — keeps the reference's
    // negation rule (an end's NEWER finding that omits a link negates
    // it) out of the way of what each row demonstrates
    val samples = Seq(
      FoundNode("h", 100L, Map.empty,
        Seq(FoundLink("p", LinkState.ToTarget, Map("port" -> "1")),
          FoundLink("p", LinkState.ToTarget, Map("port" -> "2")))),
      FoundNode("p", 150L, Map.empty,
        Seq(FoundLink("h", LinkState.ToSubject, Map("port" -> "1")),
          FoundLink("h", LinkState.ToSubject, Map("port" -> "2")))))

    def weave(u: LinkUnifier): SnapshotGraph = {
      val w = new Weaver(spark)
      samples.foreach(w.addFoundNode)
      w.getSnapshot(u)
    }

    it("unifyToOne -> new StdUnifier()") {
      weave(new StdUnifier()).links.count() shouldBe 1
    }
    it("unifyToMany getKey -> StdUnifier(subId = Seq(<Column>))") {
      weave(new StdUnifier(subId = Seq(col("link_attrs")("port"))))
        .links.count() shouldBe 2
    }
    it("negatesLinkSample disabled -> StdUnifier(negation = false)") {
      weave(new StdUnifier(negation = false)).links.count() shouldBe 1
    }
    it("UnifyStdConfig.mergeSamples -> ListMergeUnifier over BOTH " +
        "ends' sorted sample lists (latest / latestOfBoth helpers)") {
      weave(new ListMergeUnifier((lo, hi) =>
        ListMergeUnifier.latestOfBoth(lo, hi))).links.count() shouldBe 1
      // latest of the HI side (p, the newest observer) — picking the LO
      // side would surface a sample p's newer finding rightfully negates
      weave(new ListMergeUnifier((_, hi) =>
        ListMergeUnifier.latest(hi))).links.count() shouldBe 1
    }
    it("RPL unifiers exist as LinkUnifier values") {
      (graft.rpl.Rpl.DioUnifier: LinkUnifier) should not be null
      (graft.rpl.Rpl.daoUnifier: LinkUnifier) should not be null
    }
  }

  describe("MIGRATION.md §Formats / sinks") {
    it("writeGraphML -> GraphMl.write; distributed twin assembles " +
        "byte-identically") {
      val doc = io.GraphMl.write(chainGraph)
      doc should include ("<graphml")
      val d = tmp("mig_graphml")
      io.GraphMl.writeDistributed(chainGraph, d)
      io.GraphMl.assembleDistributed(spark, d) shouldBe doc
    }
    it("Pangraph -> folded into GraphML; Gexf.write / writeDistributed " +
        "added") {
      val doc = io.Gexf.write(chainGraph)
      doc should include ("<gexf")
      val d = tmp("mig_gexf")
      io.Gexf.writeDistributed(chainGraph, d)
    }
    it("JSON wire docs round-trip: writeFoundNodes/readFoundNodes, " +
        "writeSnapshot/readSnapshot") {
      val findings = Findings.fromSeq(spark, Seq(
        FoundNode("a", 100L, Map("k" -> "v"), Seq(fl("b")), 0,
          Some(Tz(540, false, "JST")))))
      val docs = io.Json.writeFoundNodes(findings)
      val back = io.Json.readFoundNodes(docs)
      back.count() shouldBe 1
      back.select("subject").collect()(0).getString(0) shouldBe "a"
      val (nd, ld) = io.Json.writeSnapshot(chainGraph)
      val g2 = io.Json.readSnapshot(nd, ld)
      g2.nodes.count() shouldBe chainGraph.nodes.count()
      g2.links.count() shouldBe chainGraph.links.count()
    }
    it("Contiki-NG logs -> rpl.ContikiNg.readLogs; compact IPv6 + " +
        "prefix graft -> rpl.Ipv6") {
      val fix = "/root/reference/net-spider-rpl/test/data/cooja.log"
      if (!new java.io.File(fix).exists()) cancel("fixture missing")
      val (dio, dao) = rpl.ContikiNg.readLogs(spark, fix,
        rpl.ContikiNg.CoojaHead)
      dio.count() shouldBe 1
      dao.count() shouldBe 1
      rpl.Ipv6.decodeCompact("6G-4fdf") shouldBe Some("::4fdf")
      rpl.Ipv6.setNonLocalPrefix("fd00::212:1199:eebb:62c4",
        "fe80::212:1199:bbcc:4fdf") shouldBe Some("fd00::212:1199:bbcc:4fdf")
    }
  }

  describe("MIGRATION.md §CLI") {
    it("RplCli accepts the reference grammar: -s/-f/-t/-d/--filter, " +
        "i/x interval ends") {
      val base = Array("out.graphml", "cooja")
      rpl.RplCli.parseArgs(base ++ Array(
        "-s", "fd00::1", "-f", "i2019-01-01T00:00:00",
        "-t", "x2019-01-02T00:00:00", "--filter", "latest"))
        .isRight shouldBe true
      rpl.RplCli.parseArgs(base ++ Array("-f", "-inf", "-t", "+inf"))
        .isRight shouldBe true
      rpl.RplCli.parseArgs(base ++ Array("--filter", "keep:3"))
        .isRight shouldBe true
    }
  }

  describe("MIGRATION.md §Analytics") {
    // tiny directed triangle + tail: r->m->l plus m->r and l->r
    lazy val edges = {
      import spark.implicits._
      Seq(("r", "m"), ("m", "l"), ("m", "r"), ("l", "r"))
        .toDF("src", "dst")
    }

    it("BFS / DODAG depth: Bfs.reachable and GraphxOps.pregelBfs") {
      import spark.implicits._
      Bfs.reachable(edges.select(col("src"), col("dst")),
        Seq("r").toDF("node_id")).count() shouldBe 3
      GraphxOps.pregelBfs(chainGraph, "r").count() shouldBe 3
    }
    it("DODAG root + summary: rpl.Rpl.getRoot / dodagSummary") {
      rpl.Rpl.getRoot(chainGraph, rootIsSource = true) shouldBe Right("r")
      rpl.Rpl.dodagSummary(chainGraph).count() shouldBe 1
    }
    it("connected components: Dedup.clusterLabels(Star) and " +
        "GraphxOps.connectedComponents") {
      graft.dedup.Dedup.clusterLabelsStar(
        edges.select(col("src").as("id1"), col("dst").as("id2")))
        .select(col("cluster")).distinct().count() shouldBe 1
      GraphxOps.connectedComponents(chainGraph)
        .select(col("component")).distinct().count() shouldBe 1
    }
    it("PageRank / TrustRank / weighted / HITS / GraphX pageRank") {
      import spark.implicits._
      PageRank.pageRank(edges, 3).count() shouldBe 3
      PageRank.personalizedPageRank(edges, Seq("r").toDF("id"), 3)
        .count() shouldBe 3
      PageRank.pageRankWeighted(edges.withColumn("w", lit(2L)), 3)
        .count() shouldBe 3
      Hits.hits(edges, 2).count() shouldBe 3
      GraphxOps.pageRank(chainGraph, 5).count() shouldBe 3
    }
    it("triangles, clustering coefficient, k-core/k-truss (Motifs)") {
      val pairs = edges.select(col("src").as("id1"), col("dst").as("id2"))
      Motifs.triangles(pairs).count() shouldBe 1
      Motifs.clusteringCoefficients(pairs).count() shouldBe 3
      Motifs.kCoreNodes(pairs, 2).count() shouldBe 3
      Motifs.kTrussNodes(pairs, 2).count() shouldBe 3
    }
    it("centralities at scale: HyperBall harmonic/closeness/effective " +
        "diameter") {
      HyperBall.harmonicCentralities(edges, 2).count() shouldBe 3
      HyperBall.closenessCentralities(edges, 2).count() shouldBe 3
      HyperBall.effectiveDiameter(edges, 4) should be >= 1
    }
    it("link-graph health: GraphAudit.linkGraphAudit sufficient stats") {
      val audit = GraphAudit.linkGraphAudit(edges)
      audit.count() shouldBe 1
      audit.select("n_reciprocal").collect()(0).getLong(0) shouldBe 2L
    }
  }
}

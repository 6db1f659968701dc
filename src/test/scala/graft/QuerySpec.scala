package graft

import org.apache.spark.sql.functions._
import graft.model._
import graft.operators._
import graft.query.{GetSnapshot, Query}
import graft.time.{Interval, IntervalEnd}

/** Link row for the BIGINT-id cases (top level so Spark finds a TypeTag). */
case class LLink(target: Long, link_state: String,
    link_attrs: Map[String, String])

/** Traversal + interval + policy interplay, mirroring the reference's
  * server-only cases (net-spider/test/ServerTest/Snapshot.hs:97-265) and
  * the `traverses` corpus (SnapshotTestCase.hs:811-821). */
class QuerySpec extends SparkSpec {

  private implicit val stringEnc: org.apache.spark.sql.Encoder[String] =
    org.apache.spark.sql.Encoders.STRING

  private def linkTo(n: String) = FoundLink(n, LinkState.ToTarget, Map.empty)
  private def node(n: String, atMin: String, links: Seq[String], seq: Long = 0) =
    FoundNode(n, ts(s"2018-12-01T01:$atMin"), Map("o" -> "y"),
      links.map(linkTo), seq)
  private def nodeMs(n: String, ms: Long, links: Seq[String]) =
    FoundNode(n, ms, Map("o" -> "y"), links.map(linkTo), 0)

  private val intervalFns = Seq(
    node("n1", "10", Seq("n2"), 0), node("n1", "20", Seq("n2", "n3"), 1),
    node("n1", "30", Nil, 2), node("n1", "40", Seq("n3"), 3),
    node("n2", "15", Nil, 4), node("n2", "25", Seq("n4"), 5),
    node("n2", "35", Seq("n4", "n3", "n5"), 6),
    node("n3", "10", Seq("n4", "n2"), 7), node("n3", "30", Seq("n4"), 8),
    node("n4", "05", Nil, 9), node("n4", "15", Seq("n1"), 10),
    node("n4", "25", Seq("n1", "n5"), 11), node("n4", "35", Nil, 12))

  private val policyFns = Seq(
    nodeMs("n1", 10, Seq("n2")), nodeMs("n1", 20, Seq("n3")),
    nodeMs("n1", 30, Seq("n2")),
    nodeMs("n2", 15, Seq("n1")), nodeMs("n2", 25, Seq("n4")),
    nodeMs("n2", 35, Seq("n4", "n1")),
    nodeMs("n3", 17, Nil), nodeMs("n3", 27, Seq("n1", "n4")),
    nodeMs("n3", 37, Nil),
    nodeMs("n4", 8, Seq("n2")), nodeMs("n4", 18, Nil),
    nodeMs("n4", 28, Seq("n2", "n3")))

  private val noNeg = new StdUnifier(negation = false)
  private val bySubject =
    new StdUnifier(subId = Seq(col("subject")), negation = false)

  private def run(fns: Seq[FoundNode], q: Query[String]) = {
    val g = GetSnapshot(spark, Findings.fromSeq(spark, fns), q)
    val nodes = g.nodes.collect()
      .map(r => (r.getString(0), r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        !r.isNullAt(3)))
      .sortBy(_._1).toSeq
    val links = g.links.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    (nodes, links)
  }

  private def end(s: String, inclusive: Boolean) =
    IntervalEnd(Some(ts(s"2018-12-01T01:$s")), inclusive)

  describe("GetSnapshot traversal") {
    it("missing start node ⇒ empty graph") {
      val (ns, ls) = run(Seq(node("n1", "10", Seq("n2"))),
        Query(startsFrom = Seq("nope")))
      ns shouldBe empty
      ls shouldBe empty
    }
    it("empty startsFrom ⇒ empty graph") {
      val (ns, ls) = run(Seq(node("n1", "10", Seq("n2"))),
        Query[String](startsFrom = Nil))
      ns shouldBe empty
      ls shouldBe empty
    }
    it("disconnected component is not visited") {
      val (ns, _) = run(
        Seq(node("n1", "10", Seq("n2")), node("n9", "10", Seq("n8"))),
        Query(startsFrom = Seq("n1")))
      ns.map(_._1) shouldBe Seq("n1", "n2")
    }
    it("loop network terminates and covers the cycle") {
      val (ns, ls) = run(
        Seq(node("n1", "10", Seq("n2")), node("n2", "11", Seq("n3")),
          node("n3", "12", Seq("n1"))),
        Query(startsFrom = Seq("n1"), unifier = noNeg))
      ns.map(_._1) shouldBe Seq("n1", "n2", "n3")
      ls.map(l => (l._1, l._2)) shouldBe
        Seq(("n1", "n2"), ("n2", "n3"), ("n3", "n1"))
    }
    it("maxHops bounds the traversal; horizon nodes become boundary") {
      val (ns, _) = run(
        Seq(node("n1", "10", Seq("n2")), node("n2", "11", Seq("n3")),
          node("n3", "12", Seq("n4"))),
        Query(startsFrom = Seq("n1"), maxHops = Some(1), unifier = noNeg))
      // n1 (start) + n2 (1 hop) visited; n3 observed by n2 but past the
      // horizon ⇒ boundary.
      ns.map(n => (n._1, n._2)) shouldBe
        Seq(("n1", false), ("n2", false), ("n3", true))
    }
  }

  describe("GetSnapshot time interval (server corpus)") {
    it("only lower bound (exclusive)") {
      val (ns, ls) = run(intervalFns, Query(Seq("n1", "n2"),
        Interval(end("30", inclusive = false), IntervalEnd(None, true)),
        unifier = noNeg))
      ns.map(_._1) shouldBe Seq("n1", "n2", "n3", "n4", "n5")
      ns.map(!_._4) shouldBe Seq(false, false, true, false, true)
      ls shouldBe Seq(
        ("n1", "n3", ts("2018-12-01T01:40")),
        ("n2", "n3", ts("2018-12-01T01:35")),
        ("n2", "n4", ts("2018-12-01T01:35")),
        ("n2", "n5", ts("2018-12-01T01:35")))
    }
    it("only upper bound (exclusive)") {
      val (ns, ls) = run(intervalFns, Query(Seq("n1"),
        Interval(IntervalEnd(None, true), end("30", inclusive = false)),
        unifier = noNeg))
      ns.map(_._1) shouldBe Seq("n1", "n2", "n3", "n4", "n5")
      ns.map(!_._4) shouldBe Seq(false, false, false, false, true)
      ls shouldBe Seq(
        ("n1", "n2", ts("2018-12-01T01:20")),
        ("n1", "n3", ts("2018-12-01T01:20")),
        ("n2", "n4", ts("2018-12-01T01:25")),
        ("n3", "n2", ts("2018-12-01T01:10")),
        ("n3", "n4", ts("2018-12-01T01:10")),
        ("n4", "n1", ts("2018-12-01T01:25")),
        ("n4", "n5", ts("2018-12-01T01:25")))
    }
    it("only upper bound (inclusive)") {
      val (ns, ls) = run(intervalFns, Query(Seq("n3"),
        Interval(IntervalEnd(None, true), end("30", inclusive = true)),
        unifier = noNeg))
      ns.map(_._1) shouldBe Seq("n1", "n3", "n4", "n5")
      ns.map(!_._4) shouldBe Seq(false, false, false, true)
      ls shouldBe Seq(
        ("n3", "n4", ts("2018-12-01T01:30")),
        ("n4", "n1", ts("2018-12-01T01:25")),
        ("n4", "n5", ts("2018-12-01T01:25")))
    }
    it("both bounded") {
      val (ns, ls) = run(intervalFns, Query(Seq("n2"),
        Interval(end("20", inclusive = false), end("25", inclusive = true)),
        unifier = noNeg))
      ns.map(_._1) shouldBe Seq("n1", "n2", "n4", "n5")
      ns.map(!_._4) shouldBe Seq(true, false, false, true)
      ls shouldBe Seq(
        ("n2", "n4", ts("2018-12-01T01:25")),
        ("n4", "n1", ts("2018-12-01T01:25")),
        ("n4", "n5", ts("2018-12-01T01:25")))
    }
  }

  describe("GetSnapshot policy × interval (server corpus)") {
    it("policyOverwrite with timeInterval") {
      val (ns, ls) = run(policyFns, Query(Seq("n1"),
        Interval(IntervalEnd(None, true), IntervalEnd(Some(27), true)),
        policy = PolicyOverwrite, unifier = bySubject))
      ls shouldBe Seq(("n1", "n3", 20L), ("n3", "n1", 27L), ("n3", "n4", 27L))
      ns.map(_._1) shouldBe Seq("n1", "n3", "n4")
      ns.map(!_._4) shouldBe Seq(false, false, false)
    }
    it("policyAppend with timeInterval") {
      val (ns, ls) = run(policyFns, Query(Seq("n1"),
        Interval(IntervalEnd(Some(15), true), IntervalEnd(Some(30), true)),
        policy = PolicyAppend, unifier = bySubject))
      ls shouldBe Seq(
        ("n1", "n2", 30L), ("n1", "n3", 20L), ("n2", "n1", 15L),
        ("n2", "n4", 25L), ("n3", "n1", 27L), ("n3", "n4", 27L),
        ("n4", "n2", 28L), ("n4", "n3", 28L))
      ns.map(_._1) shouldBe Seq("n1", "n2", "n3", "n4")
      ns.map(!_._4) shouldBe Seq(false, false, false, false)
    }
  }

  describe("Generic node-id types (reference Int-id precedent, " +
      "ServerTest/Attributes.hs:105-106)") {
    // The weave/BFS/unify pipeline is schema-agnostic over the id type;
    // run the traversal corpus with BIGINT ids end to end.
    def lfn(subject: Long, atMin: Int, targets: Seq[Long], seq: Long = 0) =
      (subject, ts(f"2018-12-01T01:$atMin%02d"), seq,
        Map("o" -> "y"),
        targets.map(t => LLink(t, LinkState.ToTarget, Map.empty)))

    it("BFS + weave + boundary over BIGINT ids") {
      import spark.implicits._
      val findings = Seq(
        lfn(1L, 10, Seq(2L)),
        lfn(2L, 20, Seq(3L)),
        lfn(10L, 30, Seq(11L))) // disconnected island
        .toDF("subject", "epoch_ms", "finding_seq", "node_attrs", "links")
      // negation off: node 2's newer finding omits 1 and would (correctly)
      // negate the 1→2 link — the negation case is pinned separately below
      val g = GetSnapshot(spark, findings, Query(Seq(1L), unifier = noNeg))
      g.nodes.schema("node_id").dataType shouldBe
        org.apache.spark.sql.types.LongType
      val ns = g.nodes.collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.isNullAt(2)))
        .sortBy(_._1)
      // 1,2 visited with findings; 3 reached but finding-less ⇒ visited
      // bare (null ts, reference markAsVisited); island 10/11 unreachable
      ns shouldBe Seq((1L, false, false), (2L, false, false),
        (3L, false, true))
      val ls = g.links.collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      ls shouldBe Seq((1L, 2L), (2L, 3L))
      // with a 1-hop horizon, 3 stays unvisited and surfaces as boundary
      val bounded = GetSnapshot(spark, findings,
        Query(Seq(1L), maxHops = Some(1), unifier = noNeg))
      bounded.nodes.collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1) shouldBe
        Seq((1L, false), (2L, false), (3L, true))
    }

    it("negation + latest-per-pair semantics hold for BIGINT ids") {
      import spark.implicits._
      val findings = Seq(
        lfn(1L, 10, Seq(2L), seq = 1),
        lfn(2L, 20, Nil, seq = 2)) // newer empty re-observation negates
        .toDF("subject", "epoch_ms", "finding_seq", "node_attrs", "links")
      val g = GetSnapshot(spark, findings, Query(Seq(1L, 2L)))
      g.links.collect() shouldBe empty
      g.nodes.collect().map(_.getLong(0)).sorted shouldBe Seq(1L, 2L)
    }
  }

  describe("GetSnapshot.ofStarts (DataFrame start set)") {
    it("matches the Seq-based path bit for bit") {
      val fns = intervalFns
      val q = Query(Seq("n1", "n2"), unifier = noNeg)
      val viaSeq = GetSnapshot(spark, Findings.fromSeq(spark, fns), q)
      val viaDf = GetSnapshot.ofStarts(spark, Findings.fromSeq(spark, fns),
        spark.createDataset(Seq("n1", "n2"))(stringEnc).toDF("node_id"),
        q.copy(startsFrom = Nil))
      viaDf.nodes.collect().map(_.toString).sorted.toSeq shouldBe
        viaSeq.nodes.collect().map(_.toString).sorted.toSeq
      viaDf.links.collect().map(_.toString).sorted.toSeq shouldBe
        viaSeq.links.collect().map(_.toString).sorted.toSeq
    }
  }

  describe("Interval parsing") {
    it("parses i/x prefixes and ±inf") {
      Interval.parseEnd("x2019-10-09T12:03:22") shouldBe
        Some(IntervalEnd(Some(1570622602000L), false))
      Interval.parseEnd("i+inf") shouldBe Some(IntervalEnd(None, true))
      Interval.parseEnd("-inf") shouldBe Some(IntervalEnd(None, true))
      Interval.parseEnd("2019-10-09T12:03:22") shouldBe
        Some(IntervalEnd(Some(1570622602000L), true))
    }
    it("relaxed timestamp formats (reference doctest matrix)") {
      import graft.time.TimeParse
      TimeParse.parseMs("2018-10-11T11:20:10") shouldBe Some(1539256810000L)
      TimeParse.parseMs("2018-10-11 11:20:10") shouldBe Some(1539256810000L)
      TimeParse.parseMs("2015-03-23 03:33Z") shouldBe Some(1427081580000L)
      TimeParse.parseMs("1999-01-05 20:34:44.211+09:00") shouldBe
        Some(915536084211L)
      TimeParse.parseMs("2007/08/20T22:25-07:00") shouldBe Some(1187673900000L)
    }
  }
}

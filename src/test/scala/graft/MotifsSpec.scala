package graft

import org.apache.spark.sql.functions._
import graft.operators.Motifs

/** Triangle motif counting: known fixtures + degree-oriented variant
  * equivalence on seeded random graphs. */
class MotifsSpec extends SparkSpec {

  private def triples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sorted.toSeq

  it("enumerates each triangle exactly once (K4 has 4)") {
    import spark.implicits._
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d")).toDF("s", "t")
    val ts = triples(Motifs.triangles(k4))
    ts shouldBe Seq(("a", "b", "c"), ("a", "b", "d"), ("a", "c", "d"),
      ("b", "c", "d"))
    // every K4 node sits on 3 of the 4 triangles
    Motifs.triangleCounts(k4).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq shouldBe
      Seq(("a", 3L), ("b", 3L), ("c", 3L), ("d", 3L))
  }

  it("ignores edge duplication, orientation and self-loops") {
    import spark.implicits._
    val messy = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
      ("a", "a"), ("a", "b")).toDF("s", "t")
    triples(Motifs.triangles(messy)) shouldBe Seq(("a", "b", "c"))
  }

  it("clustering coefficients: cliques are 1, paths are 0, hubs between") {
    import spark.implicits._
    // K3 {a,b,c} + pendant d on a: deg(a)=3, T(a)=1 → 2/(3·2) = 1/3
    val g = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"))
      .toDF("s", "t")
    val got = Motifs.clusteringCoefficients(g).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    got shouldBe Seq(
      ("a", 3L, 1L, 2.0 / 6.0),
      ("b", 2L, 1L, 1.0),
      ("c", 2L, 1L, 1.0),
      ("d", 1L, 0L, 0.0))
  }

  it("kCore peels to the maximal min-degree subgraph") {
    import spark.implicits._
    // K4 {a,b,c,d} with a tail c—e—f: 3-core = K4 (peeling f removes
    // e's support transitively)
    val g = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("c", "e"), ("e", "f")).toDF("s", "t")
    Motifs.kCoreNodes(g, 3).collect().map(_.getString(0)).sorted.toSeq shouldBe
      Seq("a", "b", "c", "d")
    // 2-core still excludes the dangling path e—f
    Motifs.kCoreNodes(g, 2).collect().map(_.getString(0)).sorted.toSeq shouldBe
      Seq("a", "b", "c", "d")
    // 5-core is empty
    Motifs.kCoreNodes(g, 5).collect() shouldBe empty
  }

  it("kTruss peels by triangle support, with cascades") {
    import spark.implicits._
    // K4 {a,b,c,d} + tail c—e—f: every K4 edge closes 2 triangles
    val g = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("c", "e"), ("e", "f")).toDF("s", "t")
    Motifs.kTrussNodes(g, 4).collect().map(_.getString(0)).sorted.toSeq shouldBe
      Seq("a", "b", "c", "d")
    // 3-truss also keeps only the clique (tail edges close nothing)
    Motifs.kTrussNodes(g, 3).collect().map(_.getString(0)).sorted.toSeq shouldBe
      Seq("a", "b", "c", "d")
    // 5-truss needs support 3: empty
    Motifs.kTrussEdges(g, 5).collect() shouldBe empty
    // 2-truss = the whole graph, INCLUDING triangle-free edges
    Motifs.kTrussNodes(g, 2).collect().map(_.getString(0)).sorted.toSeq shouldBe
      Seq("a", "b", "c", "d", "e", "f")
    // cascade: two triangles sharing edge b—c — at k=4 the shared
    // edge's support-2 survives round 1 but its triangles are gone,
    // so round 2 empties the graph
    val diamond = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
      ("c", "d")).toDF("s", "t")
    Motifs.kTrussEdges(diamond, 4).collect() shouldBe empty
    Motifs.kTrussNodes(diamond, 3).collect()
      .map(_.getString(0)).sorted.toSeq shouldBe Seq("a", "b", "c", "d")
  }

  it("kCore matches a naive driver-side peeling on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    (0 until 2).foreach { _ =>
      val n = 18
      val raw = (0 until 50).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
      }.filter(p => p._1 != p._2)
      def naive(k: Int): Set[String] = {
        var edges = raw.map(p =>
          if (p._1 < p._2) p else p.swap).distinct
        var changed = true
        while (changed) {
          val deg = edges.flatMap(e => Seq(e._1, e._2))
            .groupBy(identity).map { case (id, xs) => id -> xs.size }
          val keep = deg.filter(_._2 >= k).keySet
          val next = edges.filter(e => keep(e._1) && keep(e._2))
          changed = next.size != edges.size
          edges = next
        }
        edges.flatMap(e => Seq(e._1, e._2)).toSet
      }
      val df = raw.toDF("s", "t")
      Seq(2, 3).foreach { k =>
        Motifs.kCoreNodes(df, k).collect().map(_.getString(0)).toSet shouldBe
          naive(k)
      }
    }
  }

  it("degree-oriented enumeration matches the id-ordered one on seeded " +
      "random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    (0 until 3).foreach { _ =>
      val n = 20
      val pairs = (0 until 80).map { _ =>
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}")
      }.toDF("s", "t")
      val plain = triples(Motifs.triangles(pairs))
      val orient = triples(Motifs.trianglesDegreeOriented(pairs))
      orient shouldBe plain
      plain.distinct.length shouldBe plain.length // each exactly once
    }
  }
}

package graft

import graft.operators.GraphAudit

/** Link-graph audit: hand-computed sufficient statistics, the
  * reciprocity semantics, and the ratio edge cases. */
class GraphAuditSpec extends SparkSpec {

  private def audit(edges: Seq[(String, String)]) = {
    import spark.implicits._
    GraphAudit.linkGraphAudit(edges.toDF("src", "dst"))
  }

  describe("GraphAudit.linkGraphAudit") {

    it("matches hand-computed statistics on a small graph") {
      // a<->b reciprocal pair, a->c, c->d; duplicate + self edges drop
      val g = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"),
        ("a", "b"), ("d", "d"))
      val r = audit(g).collect()(0)
      // outdeg: a=2 b=1 c=1; indeg: b=1 a=1 c=1 d=1
      // per-edge (x,y): ab=(2,1) ba=(1,1) ac=(2,1) cd=(1,1)
      r.getLong(0) shouldBe 4L // n_edges
      r.getLong(1) shouldBe 2L // n_reciprocal (both directions count)
      r.getLong(2) shouldBe 6L // sum_x
      r.getLong(3) shouldBe 4L // sum_y
      r.getLong(4) shouldBe 6L // sum_xy
      r.getLong(5) shouldBe 10L // sum_xx
      r.getLong(6) shouldBe 4L // sum_yy
    }

    it("ratios: reciprocity fraction, and None assortativity when a " +
        "variance is zero") {
      val g = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"))
      val (recip, assort) = GraphAudit.ratios(audit(g))
      recip shouldBe 0.5
      assort shouldBe None // every indeg is 1: zero y-variance
    }

    it("ratios: a spam-farm shape (low-out sources, one high-in sink) " +
        "is disassortative") {
      // 5 outdeg-1 pages all pointing at one sink (x=1, y=5), plus an
      // organic outdeg-3 hub to fresh targets (x=3, y=1): hand
      // covariance is negative
      val g = (1 to 5).map(i => (s"s$i", "money")) ++
        Seq(("h", "a"), ("h", "b"), ("h", "c"))
      val (recip, assortOpt) = GraphAudit.ratios(audit(g))
      recip shouldBe 0.0
      assortOpt.get should be < 0.0 // disassortative, as spam farms are
    }

    it("is empty-graph safe") {
      val (recip, assort) = GraphAudit.ratios(
        audit(Seq(("x", "x")))) // self-loop only -> zero edges
      recip shouldBe 0.0
      assort shouldBe None
    }
  }
}

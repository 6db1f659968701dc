package graft

import graft.operators.TableDiff

/** Keyed diff classification, incl. null-safe payload comparison. */
class TableDiffSpec extends SparkSpec {
  import spark.implicits._

  it("classifies added/removed/changed and drops identical rows") {
    val before = Seq((1, Some("a"), 1.0), (2, Some("b"), 2.0),
      (3, Some("c"), 3.0), (4, None: Option[String], 4.0))
      .toDF("k", "s", "v")
    val after = Seq((2, Some("b"), 2.0),   // identical → dropped
      (3, Some("c"), 9.0),                 // value changed
      (4, None: Option[String], 4.0),      // identical incl. null payload
      (5, Some("e"), 5.0))                 // new
      .toDF("k", "s", "v")
    val d = TableDiff.diff(before, after, Seq("k"), Seq("s", "v"))
      .select("k", "change").as[(Int, String)].collect().toMap
    d shouldBe Map(1 -> "removed", 3 -> "changed", 5 -> "added")
  }

  it("null-to-value payload transitions count as changed, not identical") {
    val before = Seq((1, None: Option[String])).toDF("k", "s")
    val after = Seq((1, Some("x"))).toDF("k", "s")
    val d = TableDiff.diff(before, after, Seq("k"), Seq("s"))
      .select("k", "change", "s_old", "s_new")
      .as[(Int, String, Option[String], Option[String])].collect().toSeq
    d shouldBe Seq((1, "changed", None, Some("x")))
  }
}

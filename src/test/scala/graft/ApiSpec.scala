package graft

import org.apache.spark.sql.SparkSession
import graft.model._
import graft.query.Query
import graft.time.{Interval, IntervalEnd}

/** User-facing facades (Weaver / Spider) + SQL function registration. */
class ApiSpec extends SparkSpec {

  private def fl(t: String, s: String) = FoundLink(t, s, Map.empty)

  it("Weaver accumulates and weaves, with markAsVisited") {
    val w = new Weaver(spark)
    w.addFoundNode(FoundNode("n1", 100L, Map.empty,
        Seq(fl("n2", LinkState.ToTarget))))
      .addFoundNode(FoundNode("n1", 200L, Map.empty, Nil))
      .markAsVisited("lonely")
    val g = w.getSnapshot()
    g.nodes.collect().map(r => (r.getString(0), r.getBoolean(1)))
      .sortBy(_._1).toSeq shouldBe
      Seq(("lonely", false), ("n1", false))
    // overwrite policy: the 200 finding (no links) wins; n2 disappears
    g.links.count() shouldBe 0
  }

  it("Spider appends to history and answers interval queries") {
    val dir = java.nio.file.Files.createTempDirectory("graft_spider").toString + "/h"
    val sp = Spider(spark, dir)
    sp.addFoundNodes(Seq(
      FoundNode("a", ts("2024-01-10T00:00"), Map.empty,
        Seq(fl("b", LinkState.ToTarget)), 0),
      FoundNode("b", ts("2024-01-15T00:00"), Map.empty,
        Seq(fl("c", LinkState.ToTarget)), 1)))
    val whole = sp.getSnapshotSimple(Seq("a"))
    whole.nodes.count() shouldBe 3
    // restrict interval to before b's finding: b is still reached by the
    // traversal so it is bare-visited (null ts, NOT boundary — the
    // server-corpus semantics), and c disappears entirely
    val early = sp.getSnapshot(Query(Seq("a"), Interval(
      IntervalEnd(None, true),
      IntervalEnd(Some(ts("2024-01-12T00:00")), true))))
    early.nodes.collect().map(r =>
        (r.getString(0), r.getBoolean(1), r.isNullAt(2)))
      .sortBy(_._1).toSeq shouldBe
      Seq(("a", false, false), ("b", false, true))
    sp.clearAll()
    new java.io.File(dir).exists() shouldBe false
  }

  it("vector_dot is SQL-callable after registration") {
    graft.functions.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    got shouldBe 11.0
  }

  it("collect_capped is SQL-callable after registration") {
    graft.functions.GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT k, collect_capped(v, 2) AS vs FROM VALUES
        |  ('a', 1), ('a', 2), ('b', 1), ('b', 2), ('b', 3) t(k, v)
        |GROUP BY k""".stripMargin)
      .collect().map(r => r.getString(0) ->
        Option(r.getSeq[Int](1)).map(_.sorted)).toMap
    rows("a") shouldBe Some(Seq(1, 2))
    rows("b") shouldBe None // 3 > cap → NULL
  }

  it("nfc_normalize is SQL-callable after registration") {
    graft.functions.GraftExtensions.register(spark)
    val got = spark.sql("SELECT nfc_normalize('éclair') AS n")
      .collect()(0).getString(0)
    got shouldBe "éclair"
  }

  it("predict_lang is SQL-callable after registration") {
    graft.functions.GraftExtensions.register(spark)
    spark.sql("SELECT predict_lang('the cat sat on the mat') AS l")
      .collect()(0).getString(0) shouldBe "en"
    spark.sql("SELECT predict_lang('der hund und die katze') AS l")
      .collect()(0).getString(0) shouldBe "de"
  }

  it("simhash60 and word_shingles are SQL-callable after registration") {
    graft.functions.GraftExtensions.register(spark)
    val sh = spark.sql(
      "SELECT word_shingles(array('a', 'b', 'c', 'a', 'b', 'c'), 3) AS s")
      .collect()(0).getSeq[String](0)
    sh shouldBe Seq("a b c", "b c a", "c a b")
    val h = spark.sql(
      "SELECT simhash60(array('tok1', 'tok2')) AS h")
      .collect()(0).getLong(0)
    // matches the column-API result
    import spark.implicits._
    val viaCol = Seq("tok1 tok2").toDF("text")
      .select(graft.dedup.Dedup.simhash(org.apache.spark.sql.functions.col("text")))
      .collect()(0).getLong(0)
    h shouldBe viaCol
  }
}

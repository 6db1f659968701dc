package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Engine-side text ops not fully covered by the oracle gate: redaction
  * on synthetic PII, TF-IDF weighting, winnowing fingerprints. */
class TextOpsSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*) = {
    spark.createDataFrame(rows).toDF("doc_id", "text")
  }

  it("fused asciiTokens is element- and schema-identical to the " +
      "chained lower/split/filter form (incl. unicode-lowercase corners)") {
    import spark.implicits._
    // corpus parity
    val docs = graft.sources.Tables.documents(spark,
      "/root/testdata/sf0.01").select(col("text"))
    docs.select(TextOps.tokens(col("text")).as("a"),
        TextOps.tokensChained(col("text")).as("b"))
      .filter(!(col("a") <=> col("b"))).count() shouldBe 0L
    // adversarial: Kelvin sign lowercases to ASCII k, dotted İ emits
    // an ASCII i + combining dot, multi-byte separators, digits-only,
    // empty, all-separator, emoji, null
    val edge = Seq("Hello, WORLD!42", "KELVIN degrees",
      "İstanbul", "café naïve", "漢字123漢字",
      "", "!!! --- ???", "a", "9", "😀x😀", "MiXeD_case-2024",
      "  spaces  tabs\t\tnewlines\n\n", null.asInstanceOf[String])
      .toDF("text")
    val cmp = edge.select(TextOps.tokens(col("text")).as("a"),
      TextOps.tokensChained(col("text")).as("b"))
    cmp.schema("a").dataType shouldBe cmp.schema("b").dataType
    cmp.collect().foreach { r =>
      val a = if (r.isNullAt(0)) null else r.getSeq[String](0)
      val b = if (r.isNullAt(1)) null else r.getSeq[String](1)
      a shouldBe b
    }
    // the Kelvin corner specifically: the fused walk must see the
    // POST-lowercase bytes (k is a token char; the raw sign is not)
    Seq("K9").toDF("text")
      .select(TextOps.tokens(col("text")))
      .collect()(0).getSeq[String](0) shouldBe Seq("k9")
  }

  it("predictedLangCodegen matches the column-form parity oracle on the corpus") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark,
      "/root/testdata/sf0.01").select(col("doc_id"), col("text"))
    val cmp = docs.select(
      graft.text.TextOps.predictedLang(col("text")).as("a"),
      graft.text.TextOps.predictedLangCodegen(col("text")).as("b"))
    cmp.filter(col("a") =!= col("b")).count() shouldBe 0L
    // edge cases: shared markers ("la"/"un" are es AND fr), ties, CJK
    // override, empty, no markers at all
    val edge = Seq("la la la un un", "le la les et des", "mixed 漢字 text",
      "", "zzz qqq 123", "the der le el the der le el")
      .toDF("text")
    val e = edge.select(
      graft.text.TextOps.predictedLang(col("text")).as("a"),
      graft.text.TextOps.predictedLangCodegen(col("text")).as("b"))
    e.collect().foreach(r => r.getString(0) shouldBe r.getString(1))
  }

  it("redact masks emails and digit runs; count matches") {
    val docs = docsOf(
      (1L, "contact bob@example.com or call 5551234567 now"),
      (2L, "clean text with small 123 number"))
    val out = docs.select(col("doc_id"),
      TextOps.redact(col("text")).as("r"),
      TextOps.redactionCount(col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1).toSeq
    out(0)._2 shouldBe "contact <EMAIL> or call <NUM> now"
    out(0)._3 shouldBe 2
    out(1)._2 shouldBe "clean text with small 123 number" // 3 digits < 6
    out(1)._3 shouldBe 0
  }

  it("removeBoilerplate drops cross-document lines, preserves order " +
      "and blanks") {
    import spark.implicits._
    val banner = "Accept cookies to continue"
    val docs = Seq(
      (1L, s"alpha\n$banner\nbeta\n\ngamma"),
      (2L, s"$banner\ndelta"),
      (3L, s"  $banner  \nepsilon"), // trims to the same boilerplate
      (4L, "zeta\neta")).toDF("doc_id", "text")
    val got = graft.text.TextOps.removeBoilerplate(docs, minDf = 3)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    got shouldBe Seq(
      (1L, "alpha\nbeta\n\ngamma", 5L, 4L),
      (2L, "delta", 2L, 1L),
      (3L, "epsilon", 2L, 1L),
      (4L, "zeta\neta", 2L, 2L))
    // below the document-frequency bar nothing is removed
    graft.text.TextOps.removeBoilerplate(docs, minDf = 4)
      .select("n_kept").collect().map(_.getLong(0)).sum shouldBe 11L
  }

  it("tfidf weights rare tokens above common ones") {
    val docs = docsOf(
      (1L, "alpha common"), (2L, "beta common"), (3L, "gamma common"))
    val w = TextOps.tfidf(docs).collect()
      .map(r => (r.getString(1), r.getDouble(4))).toMap
    w("common") shouldBe 0.0 +- 1e-12 // in every doc → idf ln(1) = 0
    w("alpha") should be > 1.0 // ln(3) ≈ 1.0986
  }

  it("winnowing fingerprints are stable and shared across near-identical docs") {
    val docs = docsOf(
      (1L, "a b c d e f g h i j k l m n"),
      (2L, "a b c d e f g h i j k l m n"), // identical
      (3L, "totally different words entirely here and there"))
    val fps = docs.select(col("doc_id"),
      TextOps.winnowing(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    fps(1L) shouldBe fps(2L)
    fps(1L).intersect(fps(3L)) shouldBe empty
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.text.{Dsir, TextOps}

/** DSIR importance resampling (q126 gates the integer components; the
  * float log-weight fold and the Gumbel top-k draw are pinned here) and
  * the global keep-first line dedup (q127's engine side on hand-checked
  * fixtures). */
class DsirSpec extends SparkSpec {

  // wide feature space for the hand-checked fixtures (collision-free at
  // ~20 grams), narrower for the corpus resample draw (collisions are
  // the at-scale regime the gate exercises at 4096)
  private val B = 65536
  private val Bcorpus = 4096

  private def docsOf(rows: (Long, String)*) =
    spark.createDataFrame(rows).toDF("doc_id", "text")

  it("components carry exact per-(doc,bucket) counts vs both models") {
    // target corpus speaks "alpha beta", raw adds "zz qq" noise docs
    val target = docsOf((100L, "alpha beta alpha beta"))
    val raw = docsOf(
      (1L, "alpha beta alpha beta"),
      (2L, "zz qq zz qq"),
      (3L, "x")) // < 2 tokens: no rows
    val comp = Dsir.components(raw, Dsir.model(target, B),
      Dsir.model(raw, B), B).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    comp.filter(_._1 == 3L) shouldBe empty
    // doc 1 == the target doc: every bucket it touches has t_cnt ==
    // its own n_occ (the target model IS this doc's grams)
    comp.filter(_._1 == 1L).foreach { case (_, _, nOcc, tCnt, _) =>
      tCnt shouldBe nOcc }
    // doc 2's grams never occur in the target model
    comp.filter(_._1 == 2L).foreach { case (_, _, _, tCnt, _) =>
      tCnt shouldBe 0L }
    // raw counts include every occurrence: doc 1's buckets have r_cnt
    // == n_occ (nothing else shares them), total occurrence mass is
    // conserved across buckets
    comp.filter(_._1 == 1L).foreach { case (_, _, nOcc, _, rCnt) =>
      rCnt shouldBe nOcc }
    comp.map(_._3).sum shouldBe 6L // 3 bigrams in each 4-token doc
  }

  it("componentsSelf equals the three-pass composition on the corpus") {
    val docs = Tables0.documents.select(col("doc_id"), col("text"))
    val pred = col("doc_id") % 7 === 0
    val a = Dsir.componentsSelf(docs, pred, Bcorpus)
    val b = Dsir.components(docs,
      Dsir.model(docs.filter(pred), Bcorpus),
      Dsir.model(docs, Bcorpus), Bcorpus)
    a.exceptAll(b).count() shouldBe 0L
    b.exceptAll(a).count() shouldBe 0L
  }

  it("logWeights rank target-like docs above off-distribution docs") {
    val target = docsOf(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "the quick brown cat naps under the warm sun"))
    val raw = docsOf(
      (1L, "the quick brown fox naps under the lazy sun"), // target-like
      (2L, "zz qq ww ee rr tt yy uu ii oo"), // off-distribution
      (3L, "the quick brown fox jumps over the lazy dog")) // exact match
    val tm = Dsir.model(target, B)
    val rm = Dsir.model(raw, B)
    val comp = Dsir.components(raw, tm, rm, B)
    val w = Dsir.logWeights(comp, tm, rm, B).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    w(3L) should be > w(2L)
    w(1L) should be > w(2L)
    w(3L) should be > w(1L) // exact target copy beats partial overlap
  }

  it("resample is deterministic, partition-invariant, and honors k") {
    val docs = Tables0.documents.select(col("doc_id"), col("text"))
    val target = docs.filter(col("doc_id") % 7 === 0)
    val tm = Dsir.model(target, Bcorpus)
    val rm = Dsir.model(docs, Bcorpus)
    val w = Dsir.logWeights(Dsir.components(docs, tm, rm, Bcorpus),
      tm, rm, Bcorpus)
    val a = Dsir.resample(docs, w, k = 25).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    val b = Dsir.resample(docs.repartition(13), w, k = 25)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    a.length shouldBe 25
    a shouldBe b
    // the draw is ∝ weight: the always-upweighted exact target docs
    // (doc_id % 7 == 0 scores its own model) should be over-represented
    val frac = a.count(_ % 7 == 0).toDouble / 25
    val base = docs.filter(col("doc_id") % 7 === 0).count().toDouble /
      docs.count()
    frac should be > base
  }

  it("dedupLinesGlobal keeps first occurrences, blanks, full docs") {
    val nl = "\n"
    val docs = docsOf(
      (1L, s"alpha${nl}beta${nl}alpha"), // intra-doc repeat dropped
      (2L, s"beta${nl}${nl}gamma"), // beta lost to doc 1; blank kept
      (3L, "beta"), // loses its only line
      (4L, ""), // empty text = one blank line
      (5L, s"  beta  ${nl}delta")) // trims to beta → lost
    val out = TextOps.dedupLinesGlobal(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    out(1L) shouldBe (("alpha\nbeta", 3L, 2L))
    out(2L) shouldBe (("\ngamma", 3L, 2L))
    out(3L) shouldBe (("", 1L, 0L))
    out(4L) shouldBe (("", 1L, 1L)) // the blank line survives
    out(5L) shouldBe (("delta", 2L, 1L))
  }

  it("dedupLinesGlobal is partition-invariant on the corpus") {
    val docs = Tables0.documents.select(col("doc_id"), col("text"))
    val a = TextOps.dedupLinesGlobal(docs)
    val b = TextOps.dedupLinesGlobal(docs.repartition(17))
    a.exceptAll(b).count() shouldBe 0L
    b.exceptAll(a).count() shouldBe 0L
    // conservation: kept lines never exceed input lines, and the
    // distinct non-blank line count is preserved exactly once each
    val lines = docs.select(posexplode(split(col("text"), "\n"))
      .as(Seq("pos", "line")))
    val distinctNonBlank = lines.select(trim(col("line")).as("l"))
      .filter(col("l") =!= "").distinct().count()
    val blanks = lines.filter(trim(col("line")) === "").count()
    a.agg(sum(col("n_kept"))).collect()(0).getLong(0) shouldBe
      (distinctNonBlank + blanks)
  }

  private object Tables0 {
    def documents = graft.sources.Tables.documents(spark,
      "/root/testdata/sf0.001")
  }
}

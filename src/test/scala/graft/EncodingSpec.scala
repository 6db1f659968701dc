package graft

import org.apache.spark.sql.functions._
import graft.text.Encoding

/** Mojibake repair pinned against the REAL defect: encode UTF-8,
  * mis-decode as windows-1252 (the ftfy problem class), repair, expect
  * the original back for every table-covered character. */
class EncodingSpec extends SparkSpec {

  private def garble(s: String): String =
    new String(s.getBytes("UTF-8"), "windows-1252")

  private def fix(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Encoding.fixMojibake(col("t"))).head.getString(0)
  }

  describe("Encoding.fixMojibake") {

    it("inverts a windows-1252 mis-decode for every table entry") {
      val intended = Encoding.MojibakeTable.map(_._2).mkString(" ")
      garble(intended) should not be intended // the defect is real
      fix(garble(intended)) shouldBe intended
    }

    it("inverts mixed prose and leaves clean text alone") {
      // note: no U+201D — its cp1252 garble involves undefined byte
      // 0x9D, the documented-unfixable class
      val prose = "café résumé — “naïve‘ quotes… São Paulo · 25° «ok»"
      fix(garble(prose)) shouldBe prose
      val clean = "plain ascii text, nothing to fix"
      garble(clean) shouldBe clean
      fix(clean) shouldBe clean
    }

    it("mojibakeScore counts repaired characters and is 0 on clean text") {
      import spark.implicits._
      val rows = Seq(garble("café"), "clean", garble("â is fine — yes…"))
        .toDF("t")
        .select(Encoding.mojibakeScore(col("t")).as("s"))
        .collect().map(_.getInt(0))
      // "café" garbles to "cafÃ©" (5 chars) → fixed 4 chars → score 1
      rows(0) shouldBe 1
      rows(1) shouldBe 0
      rows(2) should be > 0
    }

    it("binary-junk audit counts controls, U+FFFD, and printable ASCII") {
      import spark.implicits._
      val rows = Seq(
        "plain text", // clean: every char printable ASCII
        "a\u0000\u0007bc\u001bde\u007f", // NUL BEL ESC DEL: 4 controls
        "tab\tand\nnewline\rok", // \t \n \r are NOT counted as controls
        "bad \ufffd\ufffd seq", // 2 replacement chars
        "caf\u00e9 \u4e2d\u6587") // non-ASCII prose: e-acute + 2 CJK
        .toDF("t")
        .select(Encoding.controlCount(col("t")).as("c"),
          Encoding.replacementCount(col("t")).as("r"),
          Encoding.printableAsciiCount(col("t")).as("p"),
          org.apache.spark.sql.functions.length(col("t")).as("n"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getInt(3)))
      rows(0) shouldBe ((0L, 0L, 10L, 10))
      rows(1) shouldBe ((4L, 0L, 5L, 9))
      rows(2) shouldBe ((0L, 0L, 15L, 18))
      rows(3) shouldBe ((0L, 2L, 8L, 10))
      rows(4) shouldBe ((0L, 0L, 4L, 7))
    }
  }
}

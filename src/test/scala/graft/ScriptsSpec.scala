package graft

import graft.text.Scripts
import org.apache.spark.sql.functions._

/** text/Scripts: per-script character counts + dominant script (q134).
  * The gate corpus is Latin-heavy, so the non-Latin ranges and the
  * tiebreak are pinned here. */
class ScriptsSpec extends SparkSpec {

  it("counts characters per script range and picks the dominant by " +
      "(count desc, table order asc)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello Straße café"), // latin incl. extended letters
      (2L, "привет мир"), // cyrillic
      (3L, "日本語のテスト 漢字"), // cjk (kana + han)
      (4L, "한국어 텍스트"), // hangul
      (5L, "Ελληνικά"), // greek
      (6L, "مرحبا بالعالم"), // arabic
      (7L, "mix мир mix"), // latin 7 > cyrillic 3
      (8L, "ab мир"), // tie 2–3? latin 2, cyrillic 3 → cyrillic
      (9L, "12345 !!!"), // nothing: all zero → first entry wins
      (10L, "ой ab")) // tie latin 2 = cyrillic 2 → table order: latin
      .toDF("doc_id", "text")
    val prof = Scripts.scriptProfile(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    prof(1L).getAs[String]("dominant") shouldBe "latin"
    prof(1L).getAs[Long]("n_latin") shouldBe 15L // ß, é counted
    prof(2L).getAs[String]("dominant") shouldBe "cyrillic"
    prof(3L).getAs[String]("dominant") shouldBe "cjk"
    prof(3L).getAs[Long]("n_cjk") shouldBe 9L
    prof(4L).getAs[String]("dominant") shouldBe "hangul"
    prof(5L).getAs[String]("dominant") shouldBe "greek"
    prof(6L).getAs[String]("dominant") shouldBe "arabic"
    prof(7L).getAs[String]("dominant") shouldBe "latin"
    prof(8L).getAs[String]("dominant") shouldBe "cyrillic"
    prof(9L).getAs[String]("dominant") shouldBe "latin"
    prof(9L).getAs[Long]("n_latin") shouldBe 0L
    prof(10L).getAs[String]("dominant") shouldBe "latin"
  }
}

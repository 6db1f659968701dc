package graft

import graft.text.Blocklist

/** Blocklist phrase matching: whole-word in-order semantics, shared
  * tokenization on both sides, and the keep-side complement. */
class BlocklistSpec extends SparkSpec {

  private def docsDf(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
  }

  private def phrasesDf(ps: Seq[(Long, String)]) = {
    import spark.implicits._
    ps.toDF("phrase_id", "phrase")
  }

  describe("Blocklist.matches") {

    val docs = Seq(
      (1L, "a cat dog runs home"),
      (2L, "the cat dogs run"), // 'dogs' != 'dog': whole-word only
      (3L, "CAT, dog!"), // case/punct-insensitive via tokenization
      (4L, "dog cat"), // order matters: no match
      (5L, "entirely unrelated words"))

    it("matches whole-word token sequences only, case/punct-free") {
      val got = Blocklist.matches(docsDf(docs),
          phrasesDf(Seq((10L, "cat dog"))))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe Set((1L, 10L), (3L, 10L))
    }

    it("handles multi-phrase lists, zero-hit phrases, and duplicate-" +
        "normalization phrase variants") {
      val got = Blocklist.matches(docsDf(docs), phrasesDf(Seq(
          (10L, "cat dog"), (11L, "zebra phrase"),
          (12L, "Cat; DOG"), // normalizes identically to 10
          (13L, "unrelated words"))))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe Set((1L, 10L), (3L, 10L), (1L, 12L), (3L, 12L),
        (5L, 13L))
    }

    it("emits at most one row per (doc, phrase) even with repeats") {
      val rep = Seq((1L, "bad words and bad words and bad words"))
      val got = Blocklist.matches(docsDf(rep),
          phrasesDf(Seq((1L, "bad words"))))
        .collect()
      got.length shouldBe 1
    }

    it("matches a naive docs-x-phrases containment check on seeded " +
        "random word soup") {
      val rnd = new scala.util.Random(41)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
        "zeta", "eta", "theta")
      def soup(len: Int) =
        Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val docs = (1L to 40L).map(i => (i, soup(6 + rnd.nextInt(10))))
      val phrases = (1L to 12L).map(i => (i, soup(1 + rnd.nextInt(3))))
      val naive = for {
        (did, text) <- docs
        (pid, p) <- phrases
        if (" " + text + " ").contains(" " + p + " ")
      } yield (did, pid)
      val got = Blocklist.matches(docsDf(docs), phrasesDf(phrases))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe naive.toSet
      naive should not be empty // the check must actually exercise hits
    }

    it("filterClean returns exactly the complement") {
      val phrases = phrasesDf(Seq((10L, "cat dog")))
      val clean = Blocklist.filterClean(docsDf(docs), phrases)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      clean shouldBe Set(2L, 4L, 5L)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Scd
import graft.text.Fuzzy

/** SCD2 incremental history and symmetric-delete fuzzy matching. */
class ScdFuzzySpec extends SparkSpec {
  import spark.implicits._

  private def asSet(df: org.apache.spark.sql.DataFrame) = df
    .select(col("key"), col("state"), col("valid_from"), col("valid_to"),
      col("is_current"))
    .as[(String, String, Long, Option[Long], Boolean)].collect().toSet

  describe("Scd") {
    it("build collapses consecutive repeats into chained intervals") {
      val ev = Seq(
        ("u", "a", 10L, 1L), ("u", "a", 20L, 2L), ("u", "b", 30L, 3L),
        ("u", "a", 40L, 4L), ("v", "x", 5L, 5L))
        .toDF("k", "st", "ts", "seq")
      asSet(Scd.build(ev, "k", "st", "ts", "seq")) shouldBe Set(
        ("u", "a", 10L, Some(30L), false),
        ("u", "b", 30L, Some(40L), false),
        ("u", "a", 40L, None, true),
        ("v", "x", 5L, None, true))
    }

    it("applyBatch equals the one-shot build, repeat-start included") {
      // deterministic pseudo-random stream over 6 keys / 3 states
      val all = (1 to 300).map { i =>
        (s"k${i % 6}", s"s${(i * 2654435761L) % 3}", i.toLong * 10, i.toLong)
      }.toDF("k", "st", "ts", "seq")
      val (old, batch) =
        (all.filter(col("ts") <= 1500), all.filter(col("ts") > 1500))
      val applied = Scd.applyBatch(Scd.build(old, "k", "st", "ts", "seq"),
        batch, "k", "st", "ts", "seq")
      asSet(applied) shouldBe asSet(Scd.build(all, "k", "st", "ts", "seq"))
    }

    it("a batch touching no existing key appends fresh histories") {
      val dim = Scd.build(Seq(("u", "a", 1L, 1L)).toDF("k", "st", "ts", "seq"),
        "k", "st", "ts", "seq")
      val out = Scd.applyBatch(dim,
        Seq(("w", "z", 9L, 2L)).toDF("k", "st", "ts", "seq"),
        "k", "st", "ts", "seq")
      asSet(out) shouldBe Set(
        ("u", "a", 1L, None, true), ("w", "z", 9L, None, true))
    }
  }

  describe("Fuzzy") {
    it("deletionNeighborhood enumerates exactly the ≤d-deletion variants") {
      val got = Seq("abc").toDF("w")
        .select(Fuzzy.deletionNeighborhood(col("w"), 2).as("v"))
        .as[Seq[String]].head().toSet
      got shouldBe Set("abc", "ab", "ac", "bc", "a", "b", "c")
    }

    it("fuzzyPairs equals the brute-force levenshtein join") {
      val words = Seq("cold", "old", "bolt", "hot", "rod", "red", "new",
        "ring", "rings", "kings", "widget", "gadget", "zebra")
      val df = words.toDF("word")
      val got = Fuzzy.fuzzyPairs(df, "word", maxDist = 2)
        .as[(String, String, Long)].collect().toSet
      def lev(a: String, b: String): Int = {
        val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        dp(a.length)(b.length)
      }
      val want = (for {
        a <- words; b <- words if a < b
        d = lev(a, b) if d <= 2
      } yield (a, b, d.toLong)).toSet
      got shouldBe want
      want.size should be > 3
    }

    it("entityIds links transitively through the fuzzy graph and " +
        "labels singletons with themselves (q142)") {
      import spark.implicits._
      // nose~rose~rosy chain: dist(nose,rosy)=2 > 1 yet all three
      // share the entity (transitivity is the contract); cat is alone
      val words = Seq("rose", "rosy", "nose", "cat", "rose", "", null)
        .toDF("word")
      val got = graft.text.Fuzzy.entityIds(words, "word", maxDist = 1)
        .collect().map(r => (r.getString(0), r.getString(1))).sorted
      got shouldBe Seq(("cat", "cat"), ("nose", "nose"),
        ("rose", "nose"), ("rosy", "nose"))
    }

    it("levenshtein counts CHARACTERS, not bytes — the engine-side " +
        "unicode contract (DuckDB's is byte-based, so the q94 gate " +
        "constrains its oracle-checked domain to ASCII)") {
      import spark.implicits._
      val words = Seq("widget", "wídget", "stähl", "steel").toDF("word")
      val pairs = graft.text.Fuzzy.fuzzyPairs(words, "word", maxDist = 2)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      // one SUBSTITUTION apart regardless of UTF-8 byte width
      pairs should contain (("widget", "wídget", 1L))
      // stähl→steel: 2 substitutions at character level (ä→e, h→e...
      // exactly 2: st[ä]h[l] vs st[e]e[l] — ä→e and h→e)
      pairs should contain (("steel", "stähl", 2L))
    }
  }
}

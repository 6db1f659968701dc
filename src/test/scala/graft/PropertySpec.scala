package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers
import graft.rpl.Ipv6
import graft.time.{Interval, IntervalEnd, TimeParse}

/** Randomized-property coverage of the pure kernels (no Spark session):
  * IPv6 codec, timestamp parsing, interval algebra. Seeded, 300 samples
  * per property. */
class PropertySpec extends AnyFunSpec with Matchers {

  private def samples[A](seed: Long)(gen: scala.util.Random => A): Seq[A] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(300)(gen(rnd))
  }

  describe("Ipv6") {
    it("format → parse is the identity on 128-bit values") {
      samples(1)(r => (r.nextLong(), r.nextLong())).foreach { case (hi, lo) =>
        val s = Ipv6.format(hi, lo)
        withClue(s) { Ipv6.parse(s) shouldBe Some((hi, lo)) }
      }
    }
    it("canonical is idempotent") {
      samples(2)(r => (r.nextLong(), r.nextLong())).foreach { case (hi, lo) =>
        val s = Ipv6.format(hi, lo)
        Ipv6.canonical(s) shouldBe Some(s)
      }
    }
    it("setNonLocalPrefix preserves the interface id") {
      samples(3)(r => (r.nextLong(), r.nextLong(), r.nextLong()))
        .foreach { case (ph, h, l) =>
          val subject = Ipv6.format(ph, 1L)
          val addr = Ipv6.format(h, l)
          val out = Ipv6.setNonLocalPrefix(subject, addr).get
          Ipv6.parse(out).get._2 shouldBe l
        }
    }
    it("sparse zero-run addresses compress and round-trip") {
      samples(4) { r =>
        // mostly-zero groups exercise the :: compression logic hard
        val gs = Array.fill(8)(if (r.nextInt(4) == 0) r.nextInt(0x10000) else 0)
        def half(i: Int) = gs.slice(i, i + 4)
          .foldLeft(0L)((a, g) => (a << 16) | g)
        (half(0), half(4))
      }.foreach { case (hi, lo) =>
        val s = Ipv6.format(hi, lo)
        withClue(s) { Ipv6.parse(s) shouldBe Some((hi, lo)) }
      }
    }
  }

  describe("TimeParse") {
    it("round-trips epoch millis through ISO format") {
      samples(5)(r => math.abs(r.nextLong()) % 4102444800000L).foreach { ms =>
        val iso = java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS"))
        withClue(iso) { TimeParse.parseMs(iso) shouldBe Some(ms) }
      }
    }
  }

  describe("Interval") {
    it("secUpTo bounds are inclusive and length-consistent") {
      samples(6)(r => (math.abs(r.nextLong()) % (1L << 40),
        math.abs(r.nextLong()) % 86400L)).foreach { case (end, len) =>
        val i = Interval.secUpTo(len, end)
        i.lower shouldBe IntervalEnd(Some(end - len * 1000), true)
        i.upper shouldBe IntervalEnd(Some(end), true)
      }
    }
    it("secSince/secUntil flip the far bound's inclusivity") {
      samples(7)(r => (math.abs(r.nextLong()) % (1L << 40),
        1L + math.abs(r.nextLong()) % 86400L, r.nextBoolean()))
        .foreach { case (ms, len, inc) =>
          val since = Interval.secSince(len, IntervalEnd(Some(ms), inc))
          since.upper shouldBe IntervalEnd(Some(ms + len * 1000), !inc)
          val until = Interval.secUntil(len, IntervalEnd(Some(ms), inc))
          until.lower shouldBe IntervalEnd(Some(ms - len * 1000), !inc)
        }
    }
    it("parseEnd handles i/x prefixes for generated timestamps") {
      samples(8)(r => 100000000000L +
        math.abs(r.nextLong()) % 4000000000000L).foreach { ms0 =>
        val ms = ms0 / 1000 * 1000
        val iso = java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC)
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
        Interval.parseEnd("x" + iso).map(_.inclusive) shouldBe Some(false)
        Interval.parseEnd("i" + iso).map(_.inclusive) shouldBe Some(true)
        Interval.parseEnd(iso).flatMap(_.ms) shouldBe Some(ms)
      }
    }
  }
}

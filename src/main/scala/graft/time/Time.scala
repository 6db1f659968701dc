package graft.time

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.model.Tz

/** Relaxed ISO8601-ish timestamp parsing + interval algebra, matching the
  * reference's `NetSpider.Timestamp.parseTimestamp`
  * (net-spider/src/NetSpider/Timestamp.hs:234-252: `-`/`/` date delims,
  * space or `T` separator, optional seconds and fraction, optional
  * `Z`/`±hh:mm` zone) and `NetSpider.Interval`
  * (Interval.hs:38-54, textual ends with `i`/`x` prefixes and `±inf`,
  * Interval.hs:82-136).
  */
object TimeParse {
  private val Re =
    """(\d{4})[-/](\d{1,2})[-/](\d{1,2})[ T](\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d{1,9}))?)?(Z|[+-]\d{2}:?\d{2})?""".r

  /** Parse into (epochMs, optional zone). Zoneless strings are UTC
    * (the reference treats them as zone-unknown; epoch math matches). */
  def parse(s: String): Option[(Long, Option[Tz])] = s.trim match {
    case Re(y, mo, d, h, mi, sec, frac, zone) =>
      val secs = Option(sec).map(_.toInt).getOrElse(0)
      val ms = Option(frac).map(f => (f + "00").take(3).toInt).getOrElse(0)
      val offsetMin = Option(zone) match {
        case Some("Z") => Some(0)
        case Some(z) =>
          val clean = z.replace(":", "")
          val sign = if (clean.startsWith("-")) -1 else 1
          Some(sign * (clean.substring(1, 3).toInt * 60 + clean.substring(3, 5).toInt))
        case None => None
      }
      val ldt = java.time.LocalDateTime.of(
        y.toInt, mo.toInt, d.toInt, h.toInt, mi.toInt, secs, ms * 1000000)
      val off = java.time.ZoneOffset.ofTotalSeconds(offsetMin.getOrElse(0) * 60)
      val epoch = ldt.toInstant(off).toEpochMilli
      Some((epoch, offsetMin.map(m => Tz(m, summerOnly = false,
        if (m == 0) "UTC" else f"${if (m < 0) "-" else "+"}${math.abs(m) / 60}%02d:${math.abs(m) % 60}%02d"))))
    case _ => None
  }

  def parseMs(s: String): Option[Long] = parse(s).map(_._1)
}

/** Epoch bucketing with FLOOR-division semantics. Spark's `div`
  * truncates toward zero while the DuckDB oracles' `//` floors; the two
  * diverge for negative (pre-1970) epoch values. `pmod` is non-negative
  * for a positive width, so `(ms - pmod(ms, w)) div w` is exactly
  * `floor(ms / w)` for all signs — integer-exact and codegen-friendly. */
object Buckets {
  /** floor(`colName` / `width`) as an integer column; `colName` must be
    * a resolvable column/SQL expression name. */
  def floorDiv(colName: String, width: Long): Column =
    expr(s"(($colName) - pmod($colName, ${width}L)) div ${width}L")

  /** `a div b` (truncating INTEGER division) over Column operands —
    * Spark's `/` on longs is DOUBLE division, inexact past 2⁵³; this
    * stays integral end-to-end. For non-negative operands truncation
    * equals floor, matching the oracles' `//`. */
  def intDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.Shim.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftshim.Shim.expression(a),
        org.apache.spark.sql.graftshim.Shim.expression(b)))
}

/** One end of an interval: None = infinite. */
case class IntervalEnd(ms: Option[Long], inclusive: Boolean)

/** Time interval over epoch-ms with per-bound inclusivity
  * (Interval.hs:38-54). */
case class Interval(lower: IntervalEnd, upper: IntervalEnd) {
  /** Compile to a filter predicate over an epoch-ms column — each finite
    * bound becomes one comparison that pushes down to the parquet scan
    * (the reference's gFilterFoundNodeByTime,
    * Spider/Internal/Graph.hs:157-172). */
  def predicate(c: Column): Column = {
    val lo = lower.ms.map(m => if (lower.inclusive) c >= m else c > m)
    val hi = upper.ms.map(m => if (upper.inclusive) c <= m else c < m)
    (lo, hi) match {
      case (Some(a), Some(b)) => a && b
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) => lit(true)
    }
  }
  def isWhole: Boolean = lower.ms.isEmpty && upper.ms.isEmpty
}

object Interval {
  val whole: Interval =
    Interval(IntervalEnd(None, true), IntervalEnd(None, true))

  /** Parse one textual end (Interval.hs:82-108): optional `i`(inclusive,
    * default) / `x`(exclusive) prefix, then a timestamp or `+inf`/`-inf`. */
  def parseEnd(s: String): Option[IntervalEnd] = {
    val (inclusive, rest) = s.headOption match {
      case Some('i') if !s.startsWith("inf") => (true, s.tail)
      case Some('x') => (false, s.tail)
      case _ => (true, s)
    }
    rest match {
      case "+inf" | "-inf" => Some(IntervalEnd(None, inclusive))
      case t => TimeParse.parseMs(t).map(ms => Some(IntervalEnd(Some(ms), inclusive))).getOrElse(None)
    }
  }

  def parse(lower: String, upper: String): Option[Interval] =
    for (lo <- parseEnd(lower); hi <- parseEnd(upper))
      yield Interval(lo, hi)

  /** secUpTo (Interval.hs:142-145): length-s interval up to `end`,
    * inclusive both ends. */
  def secUpTo(lenSec: Long, endMs: Long): Interval =
    Interval(IntervalEnd(Some(endMs - lenSec * 1000), true),
      IntervalEnd(Some(endMs), true))

  /** secSince (Interval.hs:161-165): length-s interval from `start`;
    * the far end's inclusivity flips. */
  def secSince(lenSec: Long, start: IntervalEnd): Interval =
    start.ms match {
      case Some(ms) => Interval(start,
        IntervalEnd(Some(ms + lenSec * 1000), !start.inclusive))
      case None => Interval(IntervalEnd(Some(0), false), IntervalEnd(Some(0), false))
    }

  /** secUntil (Interval.hs:181-185). */
  def secUntil(lenSec: Long, end: IntervalEnd): Interval =
    end.ms match {
      case Some(ms) => Interval(
        IntervalEnd(Some(ms - lenSec * 1000), !end.inclusive), end)
      case None => Interval(IntervalEnd(Some(0), false), IntervalEnd(Some(0), false))
    }
}

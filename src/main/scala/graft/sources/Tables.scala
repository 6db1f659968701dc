package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All timestamp columns are normalized to an additional `*_ms` BIGINT
  * epoch-millisecond column on demand — the engine's native time
  * representation is epoch-ms (see graft.model.Timestamp), matching the
  * reference's `Timestamp.epochTime` (net-spider/src/NetSpider/Timestamp.hs:58-65).
  *
  * Scale posture: these are plain parquet scans; filters and column pruning
  * push down to the scan (verify with .explain — PushedFilters/ReadSchema).
  */
object Tables {
  /** Session confs every graft entry point must set at build time.
    * nanosAsLong: events.parquet carries TIMESTAMP(NANOS) which Spark 4
    * refuses by default; read nanos as BIGINT and convert explicitly
    * (epochMs). Set once at SparkSession construction — NOT per-read —
    * so table loads have no hidden session side effects (ADVICE r01). */
  val sessionConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // ObjectHashAggregate (collect_list / collect_capped / max_by-struct
    // plans) falls back to SORT-based aggregation after only 128
    // in-memory groups by default — every grouped-collection operator
    // here (shingle occurrence lists, minhash signatures, k-means
    // coordinate gathers) has far more groups per partition than that
    // and was silently paying a full sort per exchange. The raised
    // threshold is SCOPED to fixed-arity buffers: every grouped
    // collector still planned as a hash aggregate is bounded by
    // collect_capped's cap or fixed arity (16 sigs, 64 dims, m=8 PQ
    // codes), so 16k groups × a-few-KB worst case stays well inside
    // executor memory. Collectors whose buffer is DOCUMENT-sized (line
    // rebuilds, per-doc token ids, per-doc shingle lists) go through
    // graft.util.BoundedCollect.sortedGather instead: past a bounded
    // row probe they stream one group's buffer at a time regardless of
    // this threshold (below it the input itself bounds task memory and
    // the fast hash plan is kept).
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "16384")

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame   = read(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** Epoch milliseconds of a time column, matching DuckDB's epoch_ms on the
    * same parquet (the driver's oracle). Handles both real timestamp
    * columns (µs precision; session tz pinned to UTC) and BIGINT
    * nanosecond columns produced by nanosAsLong. Integer division — a
    * double round-trip would lose precision above 2^53 ns. */
  def epochMs(df: DataFrame, colName: String): org.apache.spark.sql.Column =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType => expr(s"$colName div 1000000")
      case _ => unix_millis(col(colName).cast(TimestampType))
    }

  /** Interval predicate pushed down on the RAW time column (not the
    * derived epoch_ms) so it reaches the parquet scan as a pushable
    * filter — at 100 TB this is row-group/partition pruning vs a full
    * scan. ms bounds are exact under integer scaling: for BIGINT nanos,
    * `ts div 1e6 >= lo ⇔ ts >= lo*1e6` and `ts div 1e6 < hi ⇔ ts < hi*1e6`. */
  def tsRangeFilter(df: DataFrame, colName: String, loMs: Long, hiMs: Long): DataFrame =
    df.schema(colName).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.filter(col(colName) >= loMs * 1000000L &&
          col(colName) < hiMs * 1000000L)
      case _ =>
        df.filter(unix_millis(col(colName).cast(TimestampType)) >= loMs &&
          unix_millis(col(colName).cast(TimestampType)) < hiMs)
    }

  /** Exact money arithmetic for oracle parity: cast to DECIMAL before
    * summing so Spark and DuckDB agree bit-for-bit regardless of
    * floating-point association order, then surface as DOUBLE. */
  def exactSum(c: org.apache.spark.sql.Column, scale: Int = 4): org.apache.spark.sql.Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")
}

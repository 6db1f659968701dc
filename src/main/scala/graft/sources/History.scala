package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{FoundNodePolicy, Weave}
import graft.time.Interval

/** Findings history table management (SURVEY §7.1-3) — the Spark-first
  * replacement for the reference's Gremlin write path (S11
  * `addFoundNode`, Spider.hs:131-158) and `clearAll` (S12):
  *
  *  - storage is an APPEND-ONLY parquet table partitioned by the UTC
  *    date of `epoch_ms` — the VNode/VFoundNode/edge decomposition is a
  *    Gremlin storage artifact and is NOT replicated; nodes are a
  *    derived view;
  *  - "get-or-make node" upserts disappear: appends are blind (no
  *    round-trips — the reference's slow-insert problem, CLI.hs:85-88),
  *    and identity is resolved at read time;
  *  - interval reads prune partitions via the `day` partition column
  *    AND push the ms-range filter to the scan.
  *
  * At 100 TB: date partitioning bounds every interval query to its
  * partitions; within a partition, parquet row-group stats on epoch_ms
  * prune further. Compaction/bucketing by subject is an optional layout
  * refinement for subject-heavy workloads.
  */
object History {

  /** Append findings (canonical schema) to the history table. */
  def append(findings: DataFrame, tableDir: String): Unit =
    findings
      .withColumn("day", to_date(timestamp_millis(col("epoch_ms"))))
      .write.partitionBy("day").mode(SaveMode.Append).parquet(tableDir)

  /** S12 clearAll. */
  def clear(spark: SparkSession, tableDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** Read findings within an interval; the day partition filter derived
    * from the ms bounds prunes whole partitions before the scan.
    * Layout-aware: a z-ordered dir ([[writeZOrdered]]) has no `day=`
    * partitions — there the interval predicate alone pushes to the scan
    * and the z-sort makes the per-file epoch_ms min/max stats tight, so
    * row-group pruning replaces partition pruning. */
  def read(spark: SparkSession, tableDir: String,
      interval: Interval = Interval.whole): DataFrame = {
    val df = spark.read.parquet(tableDir)
    val hasDay = df.columns.contains("day")
    val withMs =
      if (interval.isWhole) df
      else {
        val pruned =
          if (!hasDay) df
          else (interval.lower.ms, interval.upper.ms) match {
            case (lo, hi) =>
              val loD = lo.map(ms => col("day") >=
                to_date(timestamp_millis(lit(ms))))
              val hiD = hi.map(ms => col("day") <=
                to_date(timestamp_millis(lit(ms))))
              (loD ++ hiD).foldLeft(df)((d, p) => d.filter(p))
          }
        pruned.filter(interval.predicate(col("epoch_ms")))
      }
    if (hasDay) withMs.drop("day") else withMs
  }

  /** True iff `name` resolves to a catalog table whose bucketing spec
    * covers `subject` — the layout [[appendBucketed]] writes. Paths and
    * unknown tables return false. */
  def isBucketedTable(spark: SparkSession, name: String): Boolean =
    scala.util.Try {
      spark.catalog.tableExists(name) && {
        val ident = spark.sessionState.sqlParser.parseTableIdentifier(name)
        spark.sessionState.catalog.getTableMetadata(ident)
          .bucketSpec.exists(_.bucketColumnNames.contains("subject"))
      }
    }.getOrElse(false)

  /** Policy-retained view (P2 applied at read). */
  def readRetained(spark: SparkSession, tableDir: String,
      interval: Interval, policy: FoundNodePolicy): DataFrame =
    Weave.retainFindings(read(spark, tableDir, interval), policy)

  /** Small-file compaction for the append-only history table. Blind
    * streaming/CLI appends land one parquet file per batch per day;
    * after N appends an interval read opens N files per partition —
    * the classic small-file tax (driver listing + per-file open cost
    * dominate the actual scan at 100 TB). Rewrites each day partition
    * into `filesPerDay` files via a staging directory + atomic-ish
    * swap: write staged, move old out, move staged in, delete old —
    * readers never see a partially-compacted partition directory.
    * Content is unchanged (byte-for-byte row multiset).
    *
    * Crash safety: the two renames are not atomic TOGETHER — a failure
    * between rename(day, old) and rename(staged, day) leaves the day's
    * data only under the hidden `.compact_old_*` dir. Each run therefore
    * RECOVERS first: any orphaned `.compact_old_*` whose `day=` dir is
    * missing is renamed back before compaction proceeds. Single-writer
    * assumption PER DAY PARTITION: a blind append landing in a day dir
    * between its two renames would be dropped with it — so a table with
    * a LIVE writer must compact only CLOSED days. That is what
    * `beforeDay` is for (the daily-ops shape at 100 TB: the streaming
    * sink appends to today's partition while yesterday-and-older
    * compact): pass an ISO date and only `day=` partitions strictly
    * BEFORE it are rewritten; appends to `beforeDay` or later never
    * race the swap. HistoryLifecycleSpec drives exactly this interleave
    * (live streaming writer + closed-day compaction) and asserts
    * byte-identical query results and surviving partition pruning. */
  def compact(spark: SparkSession, tableDir: String,
      filesPerDay: Int = 1, beforeDay: Option[String] = None): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return
    // recover any day partition stranded by a previous crashed compact
    fs.listStatus(root)
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(".compact_old_day="))
      .foreach { s =>
        val day = new org.apache.hadoop.fs.Path(root,
          s.getPath.getName.stripPrefix(".compact_old_"))
        if (!fs.exists(day)) { fs.rename(s.getPath, day); () }
      }
    // drop stale staging dirs from crashed runs (their day dir is intact)
    fs.listStatus(root)
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(".compact_staging_"))
      .foreach(s => fs.delete(s.getPath, true))
    val days = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
      // day= names are ISO dates, so the lexicographic compare IS the
      // date compare; the open partition (>= beforeDay) is never swapped
      .filter(s => beforeDay.forall(b =>
        s.getPath.getName.stripPrefix("day=") < b))
      .map(_.getPath)
    days.foreach { dayPath =>
      val staged = new org.apache.hadoop.fs.Path(
        root, s".compact_staging_${dayPath.getName}")
      spark.read.parquet(dayPath.toString)
        .repartition(filesPerDay)
        .write.mode(SaveMode.Overwrite).parquet(staged.toString)
      val old = new org.apache.hadoop.fs.Path(
        root, s".compact_old_${dayPath.getName}")
      if (fs.exists(old)) fs.delete(old, true)
      fs.rename(dayPath, old)
      fs.rename(staged, dayPath)
      fs.delete(old, true)
      // drop the _SUCCESS marker so the partition dir holds data only
      val marker = new org.apache.hadoop.fs.Path(dayPath, "_SUCCESS")
      if (fs.exists(marker)) fs.delete(marker, false)
      ()
    }
  }

  /** Subject-bucketed layout (optional refinement for subject-heavy
    * workloads — SURVEY §7.4-8): a catalog table bucketed+sorted by
    * `subject`, so per-node aggregations (policy retention, node
    * summaries) and subject-keyed joins read pre-partitioned buckets and
    * skip the shuffle entirely. At 100 TB that deletes the largest
    * exchange of the snapshot pipeline. */
  def appendBucketed(findings: DataFrame, tableName: String,
      numBuckets: Int = 64): Unit = {
    // appending to an existing table must match ITS bucket count —
    // `numBuckets` only applies on first creation
    val spark = findings.sparkSession
    val buckets = scala.util.Try {
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(tableName)
      spark.sessionState.catalog.getTableMetadata(ident)
        .bucketSpec.map(_.numBuckets)
    }.toOption.flatten.getOrElse(numBuckets)
    findings.write
      .bucketBy(buckets, "subject")
      .sortBy("subject")
      .format("parquet")
      .mode(SaveMode.Append)
      .saveAsTable(tableName)
  }

  /** Read the subject-bucketed catalog table written by
    * [[appendBucketed]], optionally interval-filtered (the ms predicate
    * still pushes to the scan). The scan reports hash-partitioning on
    * `subject`, so every subject-keyed aggregation downstream — policy
    * retention, node summaries, the snapshot pipeline's subject
    * shuffle — runs with NO Exchange. Feed the result straight into
    * `GetSnapshot.ofStarts` / [[graft.operators.Weave.snapshot]]. */
  def readBucketed(spark: SparkSession, tableName: String,
      interval: Interval = Interval.whole): DataFrame = {
    val df = spark.table(tableName)
    if (interval.isWhole) df
    else df.filter(interval.predicate(col("epoch_ms")))
  }

  /** Policy-retained view over the bucketed table: the retention
    * aggregation consumes the bucket partitioning directly —
    * shuffle-free (asserted by HistorySpec's plan check). */
  def readBucketedRetained(spark: SparkSession, tableName: String,
      interval: Interval, policy: FoundNodePolicy): DataFrame =
    Weave.retainFindings(readBucketed(spark, tableName, interval), policy)

  /** Derived nodes view: distinct ids observed as subject or target. */
  def nodesView(findings: DataFrame): DataFrame =
    findings.select(col("subject").as("node_id"))
      .union(findings.select(explode(col("links.target")).as("node_id")))
      .distinct()

  /** 64-bit Z-VALUE (Morton code) interleaving a 32-bit subject hash
    * with 32 bits of coarse time (epoch minutes) — pure bit-twiddling
    * column expressions, codegen-friendly. */
  def zValue(subject: org.apache.spark.sql.Column,
      epochMs: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def spread(c: org.apache.spark.sql.Column) = {
      // interleave zeros between the low 32 bits (classic Morton spread)
      var x = c.bitwiseAND(lit(0xffffffffL))
      x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000ffff0000ffffL))
      x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00ff00ff00ff00ffL))
      x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
      x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
      x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    val h = conv(substring(md5(subject.cast("string")), 1, 8), 16, 10)
      .cast("long")
    // epoch minutes: double division is exact here (ms < 2^53)
    val t = floor(epochMs / lit(60000L)).cast("long")
      .bitwiseAND(lit(0xffffffffL))
    spread(h).bitwiseOR(shiftleft(spread(t), 1))
  }

  /** Z-ORDERED history layout: range-partition + sort the findings by
    * the Morton code of (subject, time), so each parquet file covers a
    * compact rectangle of the (subject, time) plane — row-group min/max
    * stats then prune BOTH subject-selective and interval-selective
    * scans, which neither date partitioning (time-only) nor subject
    * bucketing (subject-only) achieves alone. The standard lakehouse
    * multi-dimensional clustering technique, as plain Spark: one range
    * exchange + per-partition sort, no table format required. File
    * z-ranges are pairwise disjoint by construction (range
    * partitioning) — asserted by HistorySpec. */
  def writeZOrdered(findings: DataFrame, tableDir: String,
      numFiles: Int = 32): Unit = {
    val withZ = findings.withColumn("__z",
      zValue(col("subject"), col("epoch_ms")))
    withZ
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(tableDir)
  }
}

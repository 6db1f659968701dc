package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core relational building blocks of the snapshot computation, each a pure
  * DataFrame→DataFrame function so Catalyst sees one declarative plan.
  *
  * Input convention — a *link-sample* DataFrame (the reference's
  * `LinkSample`, net-spider/src/NetSpider/Unify.hs:47-55):
  *   subject STRING, target STRING, link_state STRING,
  *   epoch_ms BIGINT, sample_seq BIGINT (deterministic tie-break)
  * plus arbitrary extra attribute columns that ride along.
  *
  * Scale notes: every op below is a single shuffle (groupBy/window on the
  * pair key or node key) or shuffle-free projection; no collect, no
  * driver-side loops. Pair canonicalization uses least/greatest so the
  * undirected-link group key (the reference's swap-insensitive `Pair`,
  * net-spider/src/NetSpider/Pair.hs:20-30) is a plain shuffle key.
  */
object LinkOps {

  /** Swap-insensitive pair key columns (reference `Pair n`). */
  def pairLo(subject: Column, target: Column): Column = least(subject, target)
  def pairHi(subject: Column, target: Column): Column = greatest(subject, target)

  /** P2 / A2 / A3 — latest row per key with a deterministic tie-break.
    * One shuffle on `keys`; realized as max_by over a struct so it stays a
    * hash aggregation with map-side partial aggregation (no sort, unlike
    * row_number window). `ordCols` orders lexicographically (e.g. ts, seq).
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], ordCols: Seq[String]): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val ord = struct(ordCols.map(col).toIndexedSeq: _*)
    val won = df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(max_by(payload, ord).as("w"))
    won.select(df.columns.map(c => won("w").getField(c).as(c)).toIndexedSeq: _*)
  }

  /** A1 default unifier (`unifyToOne`, Unify.hs:112-116 with default
    * `latestLinkSample` merge, Unify.hs:153-157, 196-200): per
    * swap-insensitive pair (and optional sub-id columns), keep the latest
    * sample. `unused` samples PARTICIPATE in the merge (a newer empty
    * observation can win and thereby delete the link) — they are dropped
    * only afterwards by [[materializeLinks]]. */
  def unifyLatest(samples: DataFrame, subIdCols: Seq[String] = Nil): DataFrame = {
    val withPair = samples
      .withColumn("pair_lo", pairLo(col("subject"), col("target")))
      .withColumn("pair_hi", pairHi(col("subject"), col("target")))
    latestPerKey(withPair, Seq("pair_lo", "pair_hi") ++ subIdCols,
        Seq("epoch_ms", "sample_seq"))
      .drop("pair_lo", "pair_hi")
  }

  /** P3 — LinkState→link materialization (Weaver.hs:191-203):
    * unused ⇒ dropped; to_target ⇒ (subject,target) directed;
    * to_subject ⇒ (target,subject) directed; bidirectional ⇒
    * (subject,target) undirected. Keeps all other columns. */
  def materializeLinks(unified: DataFrame): DataFrame = {
    val keep = unified.columns.filterNot(Set("subject", "target", "link_state"))
    unified
      .filter(col("link_state") =!= "unused")
      .select(
        (Seq(
          when(col("link_state") === "to_subject", col("target"))
            .otherwise(col("subject")).as("source_node"),
          when(col("link_state") === "to_subject", col("subject"))
            .otherwise(col("target")).as("dest_node"),
          (col("link_state") =!= "bidirectional").as("is_directed")
        ) ++ keep.map(col)).toIndexedSeq: _*)
  }

  /** J4 — boundary nodes (Weaver.hs:125-129): ids referenced as link
    * targets but never observed as subjects. Anti-join; Catalyst broadcasts
    * the smaller side automatically, and at scale the distinct-ids frames
    * are tiny relative to the findings table. */
  def boundaryNodes(samples: DataFrame): DataFrame = {
    val visited = samples.select(col("subject").as("node_id")).distinct()
    samples.select(col("target").as("node_id")).distinct()
      .join(visited, Seq("node_id"), "left_anti")
  }

  /** J5 — SeqID relabel (SeqID.hs:42-109): arbitrary node ids → dense
    * 0-based longs, deterministically (ordered by id), with the mapping
    * usable for reverse lookup.
    *
    * Scale path (ADVICE r01): a row_number over a global unpartitioned
    * Window funnels every distinct id through ONE partition — wrong when
    * the vertex set itself is large (one node per user/device at 100 TB).
    * Instead: distinct → range-partitioned sort → zipWithIndex, which
    * assigns globally dense ids with only per-partition counting (one
    * lightweight job to compute partition offsets), never concentrating
    * the data on a single task. */
  def seqIds(nodeIds: DataFrame): DataFrame = {
    val idCol = nodeIds.columns.head
    val spark = nodeIds.sparkSession
    val distinctSorted = nodeIds.distinct().sort(col(idCol))
    val schema = org.apache.spark.sql.types.StructType(
      distinctSorted.schema.fields :+
        org.apache.spark.sql.types.StructField("seq_id",
          org.apache.spark.sql.types.LongType, nullable = false))
    val rows = distinctSorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rows, schema)
  }
}

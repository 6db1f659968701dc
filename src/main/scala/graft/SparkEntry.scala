package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators.{EventGraph, LinkOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator family from SURVEY.md §2 over
  * the driver's synthetic parquet tables; `oracleSql` states the identical
  * semantics in DuckDB SQL for the hash-compare gate. Column names and
  * value determinism (decimal-exact sums, explicit tie-breaks) are part of
  * the contract.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full snapshot-link unification over the events-derived graph. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_a1_unify_latest")(spark, "/root/testdata/sf0.001")

  /** Interval bounds used by q01 (P1): [2024-01-10, 2024-01-20) UTC. */
  private val LoMs = 1704844800000L
  private val HiMs = 1705708800000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1 — time-interval predicate with mixed inclusivity
    // (Spider/Internal/Graph.hs:157-172): >= lower, < upper.
    "q01_p1_interval" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.select(col("event_id"), col("user_id"), col("event_type"),
          Tables.epochMs(ev, "ts").as("epoch_ms"))
        .filter(col("epoch_ms") >= LoMs && col("epoch_ms") < HiMs)
    }),

    // P2/A3 — latest observation per node (policyOverwrite,
    // Weaver.hs:82-88): max_by with deterministic (ts, id) tie-break.
    "q02_p2_latest_per_node" -> ((s, d) => {
      val ev0 = Tables.events(s, d)
      val ev = ev0.select(
        col("user_id"), col("event_id"), col("event_type"), col("value"),
        Tables.epochMs(ev0, "ts").as("epoch_ms"))
      LinkOps.latestPerKey(ev, Seq("user_id"), Seq("epoch_ms", "event_id"))
        .select(col("user_id"), col("epoch_ms").as("last_ms"),
          col("event_type").as("last_type"), col("value").as("last_value"))
    }),

    // A1+A2+P3 — default link unification (latest per swap-insensitive
    // pair, Unify.hs:153-157) then LinkState materialization
    // (Weaver.hs:191-203).
    "q03_a1_unify_latest" -> ((s, d) => {
      val samples = EventGraph.linkSamples(s, d)
      LinkOps.materializeLinks(LinkOps.unifyLatest(samples))
        .select("source_node", "dest_node", "is_directed", "epoch_ms")
    }),

    // J4 — boundary nodes: link targets never observed as subjects
    // (Weaver.hs:125-129).
    "q04_j4_boundary" -> ((s, d) =>
      LinkOps.boundaryNodes(EventGraph.linkSamples(s, d))),

    // A4 — graphTimestamp: max over the snapshot (Snapshot.hs:40-50).
    "q05_a4_graph_ts" -> ((s, d) =>
      EventGraph.linkSamples(s, d)
        .agg(max(col("epoch_ms")).as("graph_ts"),
             count(lit(1)).as("n_samples"))),

    // A9-analogue relational core: grouped exact aggregation (the engine's
    // hash-agg path) with decimal-exact money math.
    "q06_agg_pricing" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Tables.exactSum(col("l_quantity"), 2).as("sum_qty"),
          Tables.exactSum(col("l_extendedprice"), 2).as("sum_base_price"),
          count(lit(1)).as("count_order"))
    }),

    // J1 — small-dimension broadcast join chain (link↔node analogue,
    // Weaver.hs:178-190): fact × two dims, aggregated per nation.
    "q07_j1_dim_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      val nat = Tables.nation(s, d)
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_items"),
             Tables.exactSum(col("l_extendedprice"), 2).as("sum_price"))
    }),

    // J5 — SeqID relabel: dense deterministic ids for all graph nodes
    // (SeqID.hs:42-109).
    "q08_j5_seqid" -> ((s, d) => {
      val samples = EventGraph.linkSamples(s, d)
      val ids = samples.select(col("subject").as("node_id"))
        .union(samples.select(col("target").as("node_id")))
      LinkOps.seqIds(ids)
    })
  )

  def oracleSql: Map[String, String] = {
    val cte = EventGraph.oracleCte
    Map(
      "q01_p1_interval" ->
        s"""SELECT event_id, user_id, event_type, epoch_ms(ts) AS epoch_ms
           |FROM events
           |WHERE epoch_ms(ts) >= $LoMs AND epoch_ms(ts) < $HiMs""".stripMargin,

      // Window orders by ms-truncated epoch_ms(ts) — NOT raw ts — so the
      // oracle uses the engine's native millisecond ordering even when two
      // findings of a node differ only in sub-ms digits (ADVICE r01).
      "q02_p2_latest_per_node" ->
        """SELECT user_id, epoch_ms(ts) AS last_ms, event_type AS last_type,
          |       value AS last_value
          |FROM (SELECT *, row_number() OVER
          |        (PARTITION BY user_id
          |         ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
          |      FROM events) WHERE rn = 1""".stripMargin,

      "q03_a1_unify_latest" ->
        s"""WITH samples AS ($cte),
           |won AS (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY least(subject, target), greatest(subject, target)
           |    ORDER BY epoch_ms DESC, sample_seq DESC) AS rn
           |  FROM samples)
           |SELECT CASE WHEN link_state = 'to_subject' THEN target ELSE subject END AS source_node,
           |       CASE WHEN link_state = 'to_subject' THEN subject ELSE target END AS dest_node,
           |       link_state <> 'bidirectional' AS is_directed,
           |       epoch_ms
           |FROM won WHERE rn = 1 AND link_state <> 'unused'""".stripMargin,

      "q04_j4_boundary" ->
        s"""WITH samples AS ($cte)
           |SELECT DISTINCT target AS node_id FROM samples
           |WHERE target NOT IN (SELECT subject FROM samples)""".stripMargin,

      "q05_a4_graph_ts" ->
        s"""WITH samples AS ($cte)
           |SELECT max(epoch_ms) AS graph_ts, count(*) AS n_samples FROM samples""".stripMargin,

      "q06_agg_pricing" ->
        """SELECT l_returnflag, l_linestatus,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
          |  COUNT(*) AS count_order
          |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

      "q07_j1_dim_join" ->
        """SELECT n_name, COUNT(*) AS n_items,
          |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
          |FROM lineitem
          |JOIN supplier ON l_suppkey = s_suppkey
          |JOIN nation ON s_nationkey = n_nationkey
          |GROUP BY n_name""".stripMargin,

      "q08_j5_seqid" ->
        s"""WITH samples AS ($cte),
           |ids AS (SELECT DISTINCT node_id FROM (
           |  SELECT subject AS node_id FROM samples
           |  UNION ALL SELECT target FROM samples))
           |SELECT node_id,
           |       row_number() OVER (ORDER BY node_id) - 1 AS seq_id
           |FROM ids""".stripMargin
    )
  }
}

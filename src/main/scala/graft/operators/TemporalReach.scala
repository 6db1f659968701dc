package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TIME-RESPECTING reachability over a timestamped edge list — the
  * canonical temporal-graph query (Holme & Saramäki 2012): node v is
  * temporally reachable from a start s when a path s → … → v exists
  * whose edge timestamps are NON-DECREASING (information can only flow
  * forward in time). On the history graph this answers "from s's
  * observation at t₀, how far could its state have propagated?" — a
  * question the static BFS ([[Bfs]]) over-approximates, because it
  * happily chains a newer edge into an older one.
  *
  * Computes EARLIEST-ARRIVAL times (Wu et al. 2014, VLDB — earliest-
  * arrival temporal paths): frontier rounds carry (node, earliest
  * arrival); each round joins the frontier to edges with `edge_ts ≥
  * arrival`, takes min arrival per target, and keeps only targets whose
  * arrival IMPROVED — monotone, so it terminates without a visited-set
  * diameter bound. The join is an equi-join on the node key with the
  * time bound as a residual predicate; per-round lineage is cut like
  * every iterative operator here (optional reliable checkpoint dir).
  *
  * Arrival at a target = the edge's timestamp (state arrives when the
  * edge is observed); starts begin at `startTs`.
  */
object TemporalReach {

  /** Returns (node_id, arrival_ms): earliest arrival per temporally
    * reachable node. `edges` columns: (src, dst, edge_ms). */
  def earliestArrival(edges: DataFrame, starts: DataFrame,
      startTs: Long = Long.MinValue,
      maxHops: Option[Int] = None,
      checkpointDir: Option[String] = None): DataFrame = {
    import graft.util.Checkpoints.cut
    val e = edges.toDF("src", "dst", "edge_ms").distinct().persist()
    var best = cut(starts.toDF("node_id").distinct()
      .withColumn("arrival_ms", lit(startTs)), checkpointDir)
    var frontier = best
    var level = 0
    var done = frontier.isEmpty
    while (!done) {
      level += 1
      if (maxHops.exists(level > _)) done = true
      else {
        val reached = e
          .join(frontier, e("src") === frontier("node_id") &&
            col("edge_ms") >= col("arrival_ms"))
          .groupBy(col("dst").as("node_id"))
          .agg(min(col("edge_ms")).as("arrival_ms"))
        // keep only strict improvements (first arrival, or earlier
        // than the best known) — monotone ⇒ fixpoint without a
        // diameter-sized visited structure
        val improved = cut(reached.as("r")
          .join(best.as("b"), col("r.node_id") === col("b.node_id"),
            "left_outer")
          .filter(col("b.node_id").isNull ||
            col("r.arrival_ms") < col("b.arrival_ms"))
          .select(col("r.node_id").as("node_id"),
            col("r.arrival_ms").as("arrival_ms")), checkpointDir)
        if (improved.isEmpty) done = true
        else {
          best = cut(best.as("b")
            .join(improved.as("i"), col("b.node_id") === col("i.node_id"),
              "left_anti")
            .unionByName(improved), checkpointDir)
          frontier = improved
        }
      }
    }
    e.unpersist()
    best
  }
}

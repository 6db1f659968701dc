package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed min-hop BFS over a directed edge list — the engine's
  * reachability restriction (the reference's Gremlin
  * `repeat(out("finds"))` traversal, Spider.hs:284-287) and the base of
  * DODAG depth analytics (Analyze.hs:136-151).
  *
  * Iterative frontier expansion: each round is one join of the (distinct,
  * persisted) edge list against the current frontier plus an anti-join
  * against the visited set — all distributed, no driver-side adjacency.
  * Frontiers are localCheckpointed each round to cut lineage growth (the
  * classic iterative-Spark trap). Rounds = graph diameter, each round's
  * shuffle is proportional to the frontier, not the graph.
  *
  * At 100 TB the edge list derived from findings is the distilled
  * adjacency (distinct node pairs), orders of magnitude smaller than the
  * findings table; it is persisted once and reused across rounds.
  */
object Bfs {

  /** Returns (node_id, hops): minimum hop distance from any start node,
    * following src→dst edges. Starts not present in `edges` still appear
    * at hops 0 if `includeUnknownStarts`.
    *
    * `checkpointDir = Some(dir)` switches the per-round lineage cuts
    * from executor-local blocks to reliable checkpoints (see
    * [[graft.util.Checkpoints]]) — required for fault tolerance on
    * preemptible clusters; the local default is right for local[n]. */
  def reachable(edges: DataFrame, starts: DataFrame,
      maxHops: Option[Int] = None,
      checkpointDir: Option[String] = None): DataFrame = {
    import graft.util.Checkpoints.cut
    val e = edges.toDF("src", "dst").distinct().persist()
    var visited = cut(starts.toDF("node_id").distinct()
      .withColumn("hops", lit(0)), checkpointDir)
    var frontier = visited
    var level = 0
    var done = frontier.isEmpty
    while (!done) {
      level += 1
      if (maxHops.exists(level > _)) done = true
      else {
        val next = cut(e
          .join(frontier, e("src") === frontier("node_id"))
          .select(col("dst").as("node_id")).distinct()
          .join(visited, Seq("node_id"), "left_anti")
          .withColumn("hops", lit(level)), checkpointDir)
        if (next.isEmpty) done = true
        else {
          visited = cut(visited.union(next), checkpointDir)
          frontier = next
        }
      }
    }
    e.unpersist()
    visited
  }
}

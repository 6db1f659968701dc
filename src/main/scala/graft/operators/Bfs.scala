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
    * at hops 0.
    *
    * `checkpointDir = Some(dir)` switches the per-round lineage cuts
    * from executor-local blocks to reliable checkpoints (see
    * [[graft.util.Checkpoints]]) — required for fault tolerance on
    * preemptible clusters; the local default is right for local[n].
    *
    * Runtime adaptation (the `TemporalReach.earliestArrival` /
    * `GraphxOps.clusterLabelsStar` discipline): each distributed round
    * costs ~2 scheduler round-trips (frontier join + convergence probe)
    * REGARDLESS of frontier size — a fixed per-diameter tax that
    * dominates on small graphs at every cluster scale. When the DISTINCT
    * edge frame fits in one task (`limit(n+1).collect()` probe, which
    * doubles as the edge fetch) and the start set does too, the whole
    * BFS runs driver-locally in round-synchronous order — bit-identical
    * output: same level-synchronous expansion, same maxHops cut, and
    * min-hop labels are unique regardless of work order. Past
    * `localEdgeThreshold` (or with it ≤ 0, or when the id columns'
    * types don't unify for boxed-equality matching) the distributed
    * frontier loop runs as before. */
  def reachable(edges: DataFrame, starts: DataFrame,
      maxHops: Option[Int] = None,
      checkpointDir: Option[String] = None,
      localEdgeThreshold: Int = 1 << 20): DataFrame = {
    import graft.util.Checkpoints.cut
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
    // Canonical id type BEFORE any collect: the local path matches node
    // ids by boxed equality, so int/long-mixed endpoints would silently
    // match nothing where the distributed joins coerce. Same rule as
    // TemporalReach: equal types pass through, mixed integrals unify to
    // long, anything else skips the local path (the distributed joins'
    // coercion remains the behavior of record there).
    def integral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val types = Seq(edges.schema(0).dataType, edges.schema(1).dataType,
      starts.schema(0).dataType)
    val idT: Option[DataType] =
      if (types.distinct.size == 1) Some(types.head)
      else if (types.forall(integral)) Some(LongType)
      else None
    val e0raw = edges.toDF("src", "dst")
    val e0 = idT.fold(e0raw)(t => e0raw.select(
      col("src").cast(t).as("src"), col("dst").cast(t).as("dst")))
      .distinct()
    val startsC = idT.fold(starts.toDF("node_id"))(t =>
      starts.toDF("node_id").select(col("node_id").cast(t).as("node_id")))
    val probe =
      if (localEdgeThreshold <= 0 || idT.isEmpty) null
      else e0.limit(localEdgeThreshold + 1).collect()
    if (probe != null && probe.length <= localEdgeThreshold) {
      val ss = startsC.distinct().limit(localEdgeThreshold + 1).collect()
      if (ss.length <= localEdgeThreshold)
        return localBfs(edges.sparkSession, idT.get, probe,
          ss.map(_.get(0)), maxHops)
    }
    val e = e0.persist()
    var visited = cut(startsC.distinct()
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

  /** Driver-local level-synchronous BFS — the small-graph path of
    * [[reachable]]. Identical semantics: distinct starts at hops 0,
    * each level's newly reached set = out-neighbors of the frontier
    * minus everything already labeled, maxHops cuts after that many
    * expansion rounds. */
  private def localBfs(spark: org.apache.spark.sql.SparkSession,
      idT: org.apache.spark.sql.types.DataType,
      edgeRows: Array[org.apache.spark.sql.Row],
      starts: Array[Any], maxHops: Option[Int]): DataFrame = {
    val adj = new java.util.HashMap[Any, Array[Any]]()
    edgeRows.groupBy(_.get(0)).foreach { case (s, rows) =>
      adj.put(s, rows.map(_.get(1)))
    }
    val hops = new java.util.LinkedHashMap[Any, Int]()
    starts.foreach { s => if (!hops.containsKey(s)) hops.put(s, 0) }
    var frontier: Array[Any] = starts.distinct
    var level = 0
    while (frontier.nonEmpty && !maxHops.exists(level + 1 > _)) {
      level += 1
      val next = new java.util.LinkedHashMap[Any, Unit]()
      frontier.foreach { v =>
        val out = adj.get(v)
        if (out != null) out.foreach { d =>
          if (!hops.containsKey(d) && !next.containsKey(d)) next.put(d, ())
        }
      }
      val nf = new Array[Any](next.size)
      var i = 0
      val it = next.keySet.iterator
      while (it.hasNext) { val d = it.next(); hops.put(d, level); nf(i) = d; i += 1 }
      frontier = nf
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node_id", idT),
      org.apache.spark.sql.types.StructField("hops",
        org.apache.spark.sql.types.IntegerType, nullable = false)))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    hops.forEach { (v, h) =>
      rows.add(org.apache.spark.sql.Row(v, h)): Unit
    }
    spark.createDataFrame(rows, schema)
  }
}

package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.SnapshotGraph
import graft.operators._
import graft.time.Interval

/** The query object (net-spider/src/NetSpider/Query.hs:47-80): start
  * nodes + time interval + retention policy + unifier, plus a maxHops
  * bound the reference left as a TODO (Spider.hs:254).
  *
  * Generic over the node-id type `N`, like the reference's `Query n na la`
  * (tested there with Int ids, test/ServerTest/Attributes.hs:105-106):
  * every downstream operator (Weave/Bfs/LinkOps) is schema-agnostic over
  * the id column's type, so any orderable Spark-encodable id works —
  * STRING, BIGINT, INT, …  An `Encoder[N]` is required where the start
  * list becomes a DataFrame (GetSnapshot). */
case class Query[N](
    startsFrom: Seq[N],
    interval: Interval = Interval.whole,
    policy: FoundNodePolicy = PolicyOverwrite,
    unifier: LinkUnifier = new StdUnifier(),
    maxHops: Option[Int] = None)

/** getSnapshot (Spider.hs:175-185) re-expressed for Spark: instead of a
  * per-start Gremlin traversal with client-side weaving, the whole
  * pipeline is declarative — interval filter (pushes to the scan) →
  * policy retention → distributed BFS restriction → weave.
  *
  * Ordering matters and matches the reference (risk §7.4-3): the interval
  * filter runs BEFORE policy retention (a node's "latest" finding is the
  * latest WITHIN the interval, ServerTest/Snapshot.hs:228-265), and
  * retention runs before link explode.
  *
  * BFS: iterative frontier expansion over the distinct edge list
  * (subject→target of retained findings — the traversal direction of the
  * reference's `out("finds")` steps, Spider/Internal/Graph.hs:177-178).
  * Each iteration is one small self-join on the edge list; the edge list
  * is the only shuffled input and is orders of magnitude smaller than the
  * findings table. Frontiers are localCheckpointed every few rounds so
  * the lineage doesn't grow unboundedly (classic iterative-Spark
  * pitfall). Nodes reached but owning no in-interval findings are still
  * "visited" (the reference's markAsVisited for bare `vn` rows,
  * Spider.hs:194-226) — they appear with null timestamp, NOT as boundary
  * nodes. With maxHops set, nodes just past the horizon stay unvisited
  * and therefore surface as boundary nodes.
  */
object GetSnapshot {

  def apply[N: org.apache.spark.sql.Encoder](
      spark: SparkSession, findings: DataFrame, query: Query[N]): SnapshotGraph =
    ofStarts(spark, findings,
      spark.createDataset(query.startsFrom).toDF("node_id"), query)

  /** Same pipeline with the start set as a DataFrame (one id column) —
    * the scale path when starts are derived from data rather than a
    * driver-side list (e.g. "all loaded subjects"): the start set never
    * materializes on the driver, it stays a semi-join input.
    * `query.startsFrom` is ignored. */
  def ofStarts(spark: SparkSession, findings: DataFrame,
      startsDf: DataFrame, query: Query[_]): SnapshotGraph = {
    val filtered =
      if (query.interval.isWhole) findings
      else findings.filter(query.interval.predicate(col("epoch_ms")))
    // persisted: the retained frame feeds FOUR consumers (node summary,
    // BFS edge list, reachable findings, bare-visited) — without the
    // persist each consumer re-runs the findings scan + retention
    // aggregation. Stays cached for the life of the returned (lazy)
    // SnapshotGraph; MEMORY_AND_DISK, so it spills rather than OOMs.
    val retained = Weave.retainFindings(filtered, query.policy).persist()

    val starts = startsDf.toDF("node_id").distinct()

    // Known nodes: anything present in the graph as subject or target.
    // A start node that is absent contributes nothing (missing start ⇒
    // empty graph, SnapshotTestCase.hs:811-821).
    val subjects = retained.select(col("subject").as("node_id")).distinct()
    val targets = retained
      .select(explode(col("links.target")).as("node_id")).distinct()
    val known = subjects.union(targets).distinct()

    val edges = retained
      .select(col("subject").as("src"),
        explode(col("links.target")).as("dst"))
    val visited = Bfs.reachable(edges,
        starts.join(known, Seq("node_id"), "left_semi"), query.maxHops)
      .select("node_id")

    val reachableFindings = retained
      .join(visited.withColumnRenamed("node_id", "subject"),
        Seq("subject"), "left_semi")
    // Visited nodes without in-interval findings still need a row.
    val bare = visited.join(
      reachableFindings.select(col("subject").as("node_id")).distinct(),
      Seq("node_id"), "left_anti")
    Weave.snapshot(reachableFindings, PolicyAppend /* already retained */,
      query.unifier, extraVisited = Some(bare))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.model.{FoundNode, Findings, SnapshotGraph}
import graft.operators.{FoundNodePolicy, LinkUnifier, PolicyOverwrite, StdUnifier, Weave}
import graft.query.{GetSnapshot, Query}
import graft.sources.History
import graft.time.Interval

/** User-facing facades matching the reference's two engines, so a
  * net-spider user can switch 1:1:
  *
  *  - [[Weaver]] — the pure in-memory engine
  *    (net-spider/src/NetSpider/Weaver.hs): accumulate findings, then
  *    compute a whole-graph snapshot (no traversal, no interval).
  *  - [[Spider]] — the store-backed engine
  *    (net-spider/src/NetSpider/Spider.hs): findings live in the
  *    date-partitioned history table; queries traverse from start nodes
  *    within a time interval.
  */
class Weaver(spark: SparkSession,
    policy: FoundNodePolicy = PolicyOverwrite) {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[FoundNode]
  private val visited = scala.collection.mutable.LinkedHashSet.empty[String]

  /** Weaver.hs addFoundNode. Assigns insertion order as findingSeq so
    * equal-timestamp ties break like the reference's insert order. */
  def addFoundNode(fn: FoundNode): this.type = {
    buf += fn.copy(findingSeq = buf.size.toLong)
    this
  }

  /** Weaver.hs markAsVisited. */
  def markAsVisited(nodeId: String): this.type = { visited += nodeId; this }

  /** Weaver.hs getSnapshot. */
  def getSnapshot(unifier: LinkUnifier = new StdUnifier()): SnapshotGraph = {
    import spark.implicits._
    val extra = if (visited.isEmpty) None
      else Some(visited.toSeq.toDF("node_id"))
    Weave.snapshot(Findings.fromSeq(spark, buf.toSeq), policy, unifier, extra)
  }
}

class Spider(spark: SparkSession, historyDir: String) {

  /** Spider.hs addFoundNode — a blind append (no get-or-make round
    * trips; identity resolves at read). */
  def addFoundNodes(fns: Seq[FoundNode]): Unit =
    History.append(Findings.fromSeq(spark, fns), historyDir)

  def addFoundNodes(findings: DataFrame): Unit =
    History.append(findings, historyDir)

  /** Spider.hs clearAll. */
  def clearAll(): Unit = History.clear(spark, historyDir)

  /** Spider.hs getSnapshot: interval filter → policy retention → BFS
    * from startsFrom → weave. */
  def getSnapshot(query: Query): SnapshotGraph =
    GetSnapshot(spark, History.read(spark, historyDir, query.interval)
        .drop("day"),
      // interval already applied by the pruned read
      query.copy(interval = Interval.whole))

  def getSnapshotSimple(startsFrom: Seq[String]): SnapshotGraph =
    getSnapshot(Query(startsFrom))
}

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

/** Generic over the node-id type `N` like the reference's `Spider n na fla`
  * (Int-id precedent: net-spider/test/ServerTest/Attributes.hs:105-106).
  * `Spider(spark, dir)` via the companion keeps the common STRING-id case
  * inference-friendly; `new Spider[Long](...)` (with an Encoder in scope)
  * runs the identical pipeline over BIGINT ids. */
class Spider[N](spark: SparkSession, historyDir: String)(
    implicit enc: org.apache.spark.sql.Encoder[N]) {

  /** Spider.hs addFoundNode — a blind append (no get-or-make round
    * trips; identity resolves at read). The Seq overload speaks the
    * String-id [[FoundNode]] model; other id types append canonical
    * findings DataFrames directly. */
  def addFoundNodes(fns: Seq[FoundNode])(implicit ev: N =:= String): Unit =
    History.append(Findings.fromSeq(spark, fns), historyDir)

  def addFoundNodes(findings: DataFrame): Unit =
    History.append(findings, historyDir)

  /** Spider.hs clearAll. */
  def clearAll(): Unit = History.clear(spark, historyDir)

  /** Spider.hs getSnapshot: interval filter → policy retention → BFS
    * from startsFrom → weave. */
  def getSnapshot(query: Query[N]): SnapshotGraph =
    GetSnapshot(spark, History.read(spark, historyDir, query.interval)
        .drop("day"),
      // interval already applied by the pruned read
      query.copy(interval = Interval.whole))

  def getSnapshotSimple(startsFrom: Seq[N]): SnapshotGraph =
    getSnapshot(Query(startsFrom))
}

object Spider {
  /** The common STRING-node-id spider (the reference CLI's shape). */
  def apply(spark: SparkSession, historyDir: String): Spider[String] =
    new Spider[String](spark, historyDir)(
      org.apache.spark.sql.Encoders.STRING)
}

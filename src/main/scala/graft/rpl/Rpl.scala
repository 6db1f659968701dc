package graft.rpl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.SnapshotGraph
import graft.operators.{Bfs, LinkUnifier, StdUnifier}

/** RPL domain logic: DIO/DAO unifier strategies, DIO+DAO graph combine,
  * and DODAG analytics — re-expressed as DataFrame transforms.
  *
  * net-spider-rpl/src/NetSpider/RPL/{DIO,DAO,Combined}.hs and
  * net-spider-rpl-cli/src/NetSpider/RPL/CLI/Analyze.hs.
  */
object Rpl {

  /** NeighborType total order (DIO.hs:110-120: PreferredParent <
    * ParentCandidate < OtherNeighbor). */
  def ntRank(c: Column): Column =
    when(c === "preferred_parent", 0)
      .when(c === "parent_candidate", 1)
      .otherwise(2)

  /** A6 — DAO unifier (daoUnifierConf, DAO.hs:134-136): the standard
    * latest-merge with negation off. */
  def daoUnifier: LinkUnifier = new StdUnifier(negation = false)

  /** A5 — DIO unifier (dioUnifierConf, DIO.hs:254-279): per pair take each
    * side's latest sample; the "main" side is the one whose neighborType is
    * smaller (ties → the lo side, a deterministic refinement of the
    * reference's list-order tie); output attrs carry source_* from the
    * main side and dest_* from the other (withKeyPrefix, DIO.hs:237-243).
    * Never negates. One hash aggregation, no shuffle beyond the pair key.
    */
  object DioUnifier extends LinkUnifier {
    override def unify(samples: DataFrame, nodes: DataFrame): DataFrame = {
      val keyed = samples
        .withColumn("pair_lo", least(col("subject"), col("target")))
        .withColumn("pair_hi", greatest(col("subject"), col("target")))
      // max_by with a map-free ordering key: Spark cannot ORDER structs
      // containing MAP columns, so the payload rides in max_by's value
      // slot; rows failing `cond` get a null ordering key and are skipped.
      def sideAgg(cond: Column) = max_by(
        struct(col("epoch_ms"), col("sample_seq"), col("subject"),
          col("target"), col("link_state"), col("link_attrs")),
        when(cond, struct(col("epoch_ms"), col("sample_seq"))))
      val merged = keyed.groupBy(col("pair_lo"), col("pair_hi"))
        .agg(sideAgg(col("subject") === col("pair_lo")).as("lo"),
          sideAgg(col("subject") === col("pair_hi")).as("hi"))
      def prefixed(prefix: String, attrs: Column): Column =
        map_from_arrays(
          transform(map_keys(attrs), k => concat(lit(prefix), k)),
          map_values(attrs))
      val loMain = col("hi").isNull ||
        (col("lo").isNotNull &&
          ntRank(col("lo.link_attrs")("neighbor_type")) <=
            ntRank(col("hi.link_attrs")("neighbor_type")))
      val main = when(loMain, col("lo")).otherwise(col("hi"))
      val other = when(loMain, col("hi")).otherwise(col("lo"))
      merged.select(
        col("pair_lo"), col("pair_hi"), main.as("m"), other.as("o"))
        .select(
          col("m.subject").as("subject"),
          col("m.target").as("target"),
          col("m.link_state").as("link_state"),
          col("m.epoch_ms").as("epoch_ms"),
          col("m.sample_seq").as("sample_seq"),
          when(col("o").isNull, prefixed("source_", col("m.link_attrs")))
            .otherwise(map_concat(
              prefixed("source_", col("m.link_attrs")),
              prefixed("dest_", col("o.link_attrs")))).as("link_attrs"))
    }
  }

  /** `dio://[addr]` / `dao://[addr]` → `addr` (FindingID.hs:90-102 codec,
    * Combined's ipv6Only projection). */
  def ipv6Of(c: Column): Column = regexp_extract(c, "\\[(.*)\\]", 1)

  /** J3 — combine DIO and DAO snapshot graphs on IPv6 identity
    * (combineGraphs, Combined.hs:103-147):
    * nodes: per address, DIO attrs = latest non-null DIO side, DAO attrs =
    * latest non-null DAO side; representative row (ts, boundary) = the
    * latest node that HAS attributes, else the latest overall.
    * links: tagged union (link_type = dio|dao), endpoints re-keyed. */
  def combineGraphs(dio: SnapshotGraph, dao: SnapshotGraph): SnapshotGraph = {
    def side(g: SnapshotGraph, tag: String) = g.nodes.select(
      ipv6Of(col("node_id")).as("node_id"),
      col("is_on_boundary"), col("epoch_ms"), col("node_attrs"),
      lit(tag).as("side"))
    val all = side(dio, "dio").unionByName(side(dao, "dao"))
    // ordering key: ts (nulls lowest), then side for a deterministic
    // tie-break; map-valued attrs ride in max_by's value slot (Spark
    // cannot ORDER structs containing MAPs)
    val ordKey = struct(coalesce(col("epoch_ms"), lit(Long.MinValue)),
      col("side"))
    val rep = struct(col("is_on_boundary"), col("epoch_ms"),
      col("node_attrs"))
    val nodes = all.groupBy(col("node_id")).agg(
      max_by(col("node_attrs"), when(col("side") === "dio" &&
        col("node_attrs").isNotNull, ordKey)).as("dio_attrs"),
      max_by(col("node_attrs"), when(col("side") === "dao" &&
        col("node_attrs").isNotNull, ordKey)).as("dao_attrs"),
      max_by(rep, when(col("node_attrs").isNotNull, ordKey)).as("rep_attr"),
      max_by(rep, ordKey).as("rep_any"))
      .select(col("node_id"),
        when(col("rep_attr").isNotNull, col("rep_attr.is_on_boundary"))
          .otherwise(col("rep_any.is_on_boundary")).as("is_on_boundary"),
        when(col("rep_attr").isNotNull, col("rep_attr.epoch_ms"))
          .otherwise(col("rep_any.epoch_ms")).as("epoch_ms"),
        when(col("dio_attrs").isNull && col("dao_attrs").isNull,
          lit(null).cast("map<string,string>"))
          .when(col("dio_attrs").isNull, col("dao_attrs"))
          .when(col("dao_attrs").isNull, col("dio_attrs"))
          .otherwise(map_concat(col("dio_attrs"), col("dao_attrs")))
          .as("node_attrs"))
    def tagLinks(g: SnapshotGraph, tag: String) = g.links.select(
      ipv6Of(col("source_node")).as("source_node"),
      ipv6Of(col("dest_node")).as("dest_node"),
      col("is_directed"), col("epoch_ms"),
      map_concat(map(lit("link_type"), lit(tag)), col("link_attrs"))
        .as("link_attrs"))
    SnapshotGraph(nodes,
      tagLinks(dio, "dio").unionByName(tagLinks(dao, "dao")))
  }

  /** A9/A11 — root detection (getRoot, Analyze.hs:116-134).
    * rootIsSource: true = no incoming edges define the root (DIO);
    * false = no outgoing edges (DAO storing mode uses source roots too,
    * but the CLI queries DAO graphs with RootSource via reversed edges).
    * Returns Right(rootId) or Left(error). The candidate set is one
    * aggregate over the (small) snapshot — fine to collect. */
  def getRoot(graph: SnapshotGraph, rootIsSource: Boolean = true): Either[String, String] = {
    val links = graph.links
    val (parentEnd, childEnd) =
      if (rootIsSource) ("dest_node", "source_node")
      else ("source_node", "dest_node")
    val nodes = graph.nodes.select(col("node_id"))
    val parentDeg = links.groupBy(col(parentEnd).as("node_id"))
      .agg(count(lit(1)).as("parent_num"))
    val childDeg = links.groupBy(col(childEnd).as("node_id"))
      .agg(count(lit(1)).as("child_num"))
    val cands = nodes
      .join(parentDeg, Seq("node_id"), "left")
      .join(childDeg, Seq("node_id"), "left")
      .filter(coalesce(col("parent_num"), lit(0L)) === 0)
      .select(col("node_id"), coalesce(col("child_num"), lit(0L)).as("child_num"))
    // Classification as ONE aggregate over the full candidate set (no
    // truncating collect — a capped candidate list can misclassify
    // single-root vs multi-root on large degenerate graphs):
    //   n = 0            → no parent-less node
    //   n = 1            → that node is the root
    //   exactly one candidate with children → it is the root, the rest
    //                      are orphans (reference getRoot tolerates them)
    //   none with children → orphans only;  several → ambiguous
    val r = cands.agg(
      count(lit(1)).as("n"),
      count(when(col("child_num") > 0, 1)).as("n_connected"),
      min(col("node_id")).as("only"),
      min(when(col("child_num") > 0, col("node_id"))).as("connected_root"))
      .collect()(0)
    val n = r.getLong(0)
    val nConnected = r.getLong(1)
    if (n == 0) Left("The graph has no node that has no parent.")
    else if (n == 1) Right(r.getString(2))
    else if (nConnected == 1) Right(r.getString(3))
    else if (nConnected == 0) Left("The graph contains orphan nodes only.")
    else Left("The graph contains multiple root candidates.")
  }

  /** A10/A11 — DODAG summary (DODAGAttributes, Analyze.hs:39-92): node
    * count, edge count, max BFS depth from the root, graph timestamp. */
  def dodagSummary(graph: SnapshotGraph, rootIsSource: Boolean = true): DataFrame = {
    val spark = graph.nodes.sparkSession
    import spark.implicits._
    val root = getRoot(graph, rootIsSource)
    val rootId = root.toOption
    val edges =
      if (rootIsSource)
        graph.links.select(col("source_node"), col("dest_node"))
      else graph.links.select(col("dest_node"), col("source_node"))
    val depth: Long = rootId match {
      case Some(r) =>
        Bfs.reachable(edges, Seq(r).toDF("node_id"))
          .agg(max(col("hops"))).collect()(0).getInt(0).toLong
      case None => 0L
    }
    val nodeNum = graph.nodes.agg(count(lit(1)).as("node_num"))
    val edgeNum = graph.links.agg(count(lit(1)).as("edge_num"))
    val ts = graph.nodes.select(col("epoch_ms"))
      .unionByName(graph.links.select(col("epoch_ms")))
      .agg(max(col("epoch_ms")).as("graph_ts"))
    nodeNum.crossJoin(edgeNum).crossJoin(ts)
      .withColumn("depth", lit(depth))
      .withColumn("root", lit(rootId.orNull))
      .withColumn("root_error", lit(root.left.toOption.orNull))
  }
}

package graft.io

import graft.model.SnapshotGraph

/** GraphML sink (the reference's NetSpider.GraphML.Writer,
  * net-spider/src/NetSpider/GraphML/Writer.hs:199-366): key-table
  * discovery with per-key type inference, XML escaping, meta-attributes
  * `@timestamp`/`@timestamp_str`/`@is_on_boundary`, per-edge `directed`.
  *
  * Snapshot graphs are small relative to the findings table (they are the
  * distilled network state), so the writer collects to the driver — the
  * same stance as the reference. For snapshots too big to collect, use
  * [[writeDistributed]] which saves nodes/links as JSON part files
  * (beyond-parity scale escape, SURVEY §7.4-8).
  */
object GraphMl {

  private def esc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '"' => "&quot;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case c => c.toString
  }

  private def tsStr(ms: Long): String =
    java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(ms), java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS"))

  /** GraphML attr.type inference for generic string-valued attributes:
    * long / double / boolean when every non-null value parses, else
    * string (the reference gets types from its AttrValue sum,
    * GraphML/Attribute.hs:29-35; the generic map path must infer). */
  private def inferType(values: Seq[String]): String = {
    def all(p: String => Boolean) = values.nonEmpty && values.forall(p)
    if (all(v => v.nonEmpty && v.forall(c => c.isDigit || c == '-') &&
        scala.util.Try(v.toLong).isSuccess)) "long"
    else if (all(v => scala.util.Try(v.toDouble).isSuccess)) "double"
    else if (all(v => v == "true" || v == "false")) "boolean"
    else "string"
  }

  def write(graph: SnapshotGraph): String = {
    import org.apache.spark.sql.functions.{col, lit}
    def withTz(df: org.apache.spark.sql.DataFrame) =
      if (df.columns.contains("tz")) df
      else df.withColumn("tz", lit(null).cast(graft.model.Findings.tzType))
    val nodes = withTz(graph.nodes).select(
      col("node_id"), col("is_on_boundary"), col("epoch_ms"),
      col("node_attrs"), col("tz")).collect()
    val links = withTz(graph.links).select(
      col("source_node"), col("dest_node"), col("is_directed"),
      col("epoch_ms"), col("link_attrs"), col("tz")).collect()

    def attrsOf(r: org.apache.spark.sql.Row, i: Int): Map[String, String] =
      if (r.isNullAt(i)) Map.empty
      else r.getMap[String, String](i).toMap

    val nodeHasTz = nodes.exists(!_.isNullAt(4))
    val linkHasTz = links.exists(!_.isNullAt(5))

    val nodeUserKeys = nodes.flatMap(attrsOf(_, 3).keys).distinct.sorted
    val linkUserKeys = links.flatMap(attrsOf(_, 4).keys).distinct.sorted
    def typeOf(domain: String, key: String): String = domain match {
      case "node" => inferType(nodes.flatMap(attrsOf(_, 3).get(key)).toSeq)
      case _ => inferType(links.flatMap(attrsOf(_, 4).get(key)).toSeq)
    }

    // key table: node keys then edge keys, d0.. (Writer.hs:199-246)
    val keyDefs = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String)]
    def defKey(domain: String, name: String, tpe: String): String = {
      val id = s"d${keyDefs.size}"
      keyDefs += ((id, domain, name, tpe))
      id
    }
    val nTs = defKey("node", "@timestamp", "long")
    val nTsStr = defKey("node", "@timestamp_str", "string")
    val nBound = defKey("node", "@is_on_boundary", "boolean")
    val nTzKeys = if (nodeHasTz) Some((
      defKey("node", "@tz_offset_min", "int"),
      defKey("node", "@tz_summer_only", "boolean"),
      defKey("node", "@tz_name", "string"))) else None
    val nUser = nodeUserKeys.map(k => k -> defKey("node", k, typeOf("node", k))).toMap
    val eTs = defKey("edge", "@timestamp", "long")
    val eTsStr = defKey("edge", "@timestamp_str", "string")
    val eTzKeys = if (linkHasTz) Some((
      defKey("edge", "@tz_offset_min", "int"),
      defKey("edge", "@tz_summer_only", "boolean"),
      defKey("edge", "@tz_name", "string"))) else None
    val eUser = linkUserKeys.map(k => k -> defKey("edge", k, typeOf("edge", k))).toMap

    def tzData(sb: StringBuilder, r: org.apache.spark.sql.Row, i: Int,
        keys: Option[(String, String, String)]): Unit =
      keys.foreach { case (kOff, kSum, kName) =>
        if (!r.isNullAt(i)) {
          val tz = r.getStruct(i)
          sb ++= s"""    <data key="$kOff">${tz.getInt(0)}</data>\n"""
          sb ++= s"""    <data key="$kSum">${tz.getBoolean(1)}</data>\n"""
          sb ++= s"""    <data key="$kName">${esc(tz.getString(2))}</data>\n"""
        }
      }

    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<graphml xmlns=\"http://graphml.graphdrawing.org/xmlns\"\n"
    sb ++= " xmlns:xsi=\"http://www.w3.org/2001/XMLSchema-instance\"\n"
    sb ++= " xsi:schemaLocation=\"http://graphml.graphdrawing.org/xmlns http://graphml.graphdrawing.org/xmlns/1.0/graphml.xsd\">\n"
    keyDefs.foreach { case (id, domain, name, tpe) =>
      sb ++= s"""<key id="$id" for="$domain" attr.name="${esc(name)}" attr.type="$tpe"/>\n"""
    }
    sb ++= "<graph edgedefault=\"directed\">\n"
    nodes.sortBy(_.getString(0)).foreach { r =>
      sb ++= s"""  <node id="${esc(r.getString(0))}">\n"""
      if (!r.isNullAt(2)) {
        sb ++= s"""    <data key="$nTs">${r.getLong(2)}</data>\n"""
        sb ++= s"""    <data key="$nTsStr">${tsStr(r.getLong(2))}</data>\n"""
      }
      tzData(sb, r, 4, nTzKeys)
      attrsOf(r, 3).toSeq.sortBy(_._1).foreach { case (k, v) =>
        sb ++= s"""    <data key="${nUser(k)}">${esc(v)}</data>\n"""
      }
      sb ++= s"""    <data key="$nBound">${r.getBoolean(1)}</data>\n"""
      sb ++= "  </node>\n"
    }
    links.sortBy(r => (r.getString(0), r.getString(1))).foreach { r =>
      sb ++= s"""  <edge source="${esc(r.getString(0))}" target="${esc(r.getString(1))}" directed="${r.getBoolean(2)}">\n"""
      sb ++= s"""    <data key="$eTs">${r.getLong(3)}</data>\n"""
      sb ++= s"""    <data key="$eTsStr">${tsStr(r.getLong(3))}</data>\n"""
      tzData(sb, r, 5, eTzKeys)
      attrsOf(r, 4).toSeq.sortBy(_._1).foreach { case (k, v) =>
        sb ++= s"""    <data key="${eUser(k)}">${esc(v)}</data>\n"""
      }
      sb ++= "  </edge>\n"
    }
    sb ++= "</graph>\n"
    sb ++= "</graphml>\n"
    sb.toString
  }

  /** Scale escape: write nodes/links as JSON part files instead of one
    * in-memory document. */
  def writeDistributed(graph: SnapshotGraph, outDir: String): Unit = {
    graph.nodes.write.mode("overwrite").json(s"$outDir/nodes")
    graph.links.write.mode("overwrite").json(s"$outDir/links")
  }
}

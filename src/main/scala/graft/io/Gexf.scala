package graft.io

import graft.model.SnapshotGraph

/** GEXF 1.3 sink (Gephi's native graph format) — a beyond-parity
  * alternative to [[GraphMl]] for visualization workflows. Same
  * attribute discovery/typing lattice as the GraphML writer (shared
  * helpers), same driver-side stance: snapshots are the distilled
  * network state, small relative to the findings table.
  *
  * Shape notes vs GraphML: GEXF declares typed `attributes` blocks per
  * class, node/edge attribute values ride in `attvalues`, mixed
  * directedness is per-edge `type`, and timestamps map to the reserved
  * node/edge attributes `ts_ms` (epoch ms) and `boundary`.
  */
object Gexf {

  private def gexfType(t: String): String = t match {
    case "long" => "long"
    case "double" => "double"
    case "boolean" => "boolean"
    case _ => "string"
  }

  def write(graph: SnapshotGraph): String = {
    import GraphMl.{esc, attrsOf, valueType, combineTypes}
    val nodes = GraphMl.selectNodes(graph).collect()
    val links = GraphMl.selectLinks(graph).collect()

    val nodeKeys = nodes.flatMap(attrsOf(_, 3).keys).distinct.sorted.toSeq
    val linkKeys = links.flatMap(attrsOf(_, 4).keys).distinct.sorted.toSeq
    def keyTypes(keys: Seq[String], rows: Array[org.apache.spark.sql.Row],
        i: Int): Seq[(String, String)] =
      keys.map(k => k ->
        combineTypes(rows.flatMap(attrsOf(_, i).get(k)).map(valueType)))
    val nTypes = keyTypes(nodeKeys, nodes, 3)
    val lTypes = keyTypes(linkKeys, links, 4)
    // attribute ids: 0 = ts_ms, 1 = boundary (nodes) / 0 = ts_ms (edges),
    // user keys follow in sorted order
    val nIds = nodeKeys.zipWithIndex.map { case (k, i) => k -> (i + 2) }.toMap
    val lIds = linkKeys.zipWithIndex.map { case (k, i) => k -> (i + 1) }.toMap

    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    sb ++= "<gexf xmlns=\"http://gexf.net/1.3\" version=\"1.3\">\n"
    sb ++= "<graph defaultedgetype=\"directed\">\n"
    sb ++= "<attributes class=\"node\">\n"
    sb ++= "  <attribute id=\"0\" title=\"ts_ms\" type=\"long\"/>\n"
    sb ++= "  <attribute id=\"1\" title=\"boundary\" type=\"boolean\"/>\n"
    nTypes.foreach { case (k, t) =>
      sb ++= s"""  <attribute id="${nIds(k)}" title="${esc(k)}" type="${gexfType(t)}"/>\n"""
    }
    sb ++= "</attributes>\n"
    sb ++= "<attributes class=\"edge\">\n"
    sb ++= "  <attribute id=\"0\" title=\"ts_ms\" type=\"long\"/>\n"
    lTypes.foreach { case (k, t) =>
      sb ++= s"""  <attribute id="${lIds(k)}" title="${esc(k)}" type="${gexfType(t)}"/>\n"""
    }
    sb ++= "</attributes>\n"
    sb ++= "<nodes>\n"
    nodes.sortBy(_.getString(0)).foreach { r =>
      val id = esc(r.getString(0))
      sb ++= s"""  <node id="$id" label="$id">\n"""
      sb ++= "    <attvalues>\n"
      if (!r.isNullAt(2))
        sb ++= s"""      <attvalue for="0" value="${r.getLong(2)}"/>\n"""
      sb ++= s"""      <attvalue for="1" value="${r.getBoolean(1)}"/>\n"""
      attrsOf(r, 3).toSeq.sortBy(_._1).foreach { case (k, v) =>
        sb ++= s"""      <attvalue for="${nIds(k)}" value="${esc(v)}"/>\n"""
      }
      sb ++= "    </attvalues>\n"
      sb ++= "  </node>\n"
    }
    sb ++= "</nodes>\n"
    sb ++= "<edges>\n"
    links.sortBy(r => (r.getString(0), r.getString(1))).zipWithIndex
      .foreach { case (r, i) =>
        val tpe = if (r.getBoolean(2)) "directed" else "undirected"
        sb ++= s"""  <edge id="$i" source="${esc(r.getString(0))}" target="${esc(r.getString(1))}" type="$tpe">\n"""
        sb ++= "    <attvalues>\n"
        sb ++= s"""      <attvalue for="0" value="${r.getLong(3)}"/>\n"""
        attrsOf(r, 4).toSeq.sortBy(_._1).foreach { case (k, v) =>
          sb ++= s"""      <attvalue for="${lIds(k)}" value="${esc(v)}"/>\n"""
        }
        sb ++= "    </attvalues>\n"
        sb ++= "  </edge>\n"
      }
    sb ++= "</edges>\n"
    sb ++= "</graph>\n</gexf>\n"
    sb.toString
  }
}

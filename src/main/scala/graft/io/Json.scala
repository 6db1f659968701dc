package graft.io

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model.{FoundLink, FoundNode, Tz}
import graft.time.TimeParse

/** JSON wire codec matching the reference's aeson format (S8):
  * snake_case field names (Found.hs:82-89), Timestamp as
  * string-or-object (Timestamp.hs:76-101), FoundNode/FoundLink docs as
  * in FoundSpec.hs:28-46, snapshot docs as in SnapshotSpec.hs:20-46.
  *
  * Attribute payloads are user-typed in the reference (open typeclass);
  * the generic engine keeps them as MAP<STRING,STRING>. On read, object
  * payloads become maps (scalar leaves stringified), scalar payloads
  * become {"value": ...}, and `[]` (the unit attribute) becomes empty.
  */
object Json {

  /** Findings DataFrame → wire-format JSON strings (tz fields are
    * emitted only when present — to_json omits nulls). */
  def writeFoundNodes(findings: DataFrame): Dataset[String] = {
    val spark = findings.sparkSession
    import spark.implicits._
    val withTz = graft.model.Findings.ensureTz(findings)
    withTz.select(to_json(struct(
      col("subject").as("subject_node"),
      struct(col("epoch_ms").as("epoch_time"),
        col("tz.offsetMin").as("tz_offset_min"),
        col("tz.summerOnly").as("tz_summer_only"),
        col("tz.name").as("tz_name")).as("found_at"),
      col("node_attrs"),
      transform(col("links"), l => struct(
        l.getField("target").as("target_node"),
        l.getField("link_state").as("link_state"),
        l.getField("link_attrs").as("link_attrs"))).as("neighbor_links")
    ))).as[String]
  }

  /** Snapshot graph → (nodes JSON, links JSON) wire docs. Timestamp
    * objects carry the tz fields when present (Timestamp.hs:76-101 emits
    * tz_offset_min/tz_summer_only/tz_name in snapshot docs too; to_json
    * omits the fields when tz is null, keeping tz-less docs unchanged). */
  def writeSnapshot(graph: graft.model.SnapshotGraph): (Dataset[String], Dataset[String]) = {
    val spark = graph.nodes.sparkSession
    import spark.implicits._
    def tsStruct(df: DataFrame) =
      if (df.columns.contains("tz"))
        struct(col("epoch_ms").as("epoch_time"),
          col("tz.offsetMin").as("tz_offset_min"),
          col("tz.summerOnly").as("tz_summer_only"),
          col("tz.name").as("tz_name"))
      else struct(col("epoch_ms").as("epoch_time"))
    val nodes = graph.nodes.select(to_json(struct(
      col("node_id"),
      col("is_on_boundary"),
      when(col("epoch_ms").isNotNull, tsStruct(graph.nodes)).as("timestamp"),
      col("node_attrs")))).as[String]
    val links = graph.links.select(to_json(struct(
      col("source_node"),
      col("dest_node"),
      col("is_directed"),
      tsStruct(graph.links).as("timestamp"),
      col("link_attrs")))).as[String]
    (nodes, links)
  }

  // ---- reading (reference-tolerant) ----

  private def attrsOf(n: JsonNode): Map[String, String] =
    if (n == null || n.isNull || n.isMissingNode) Map.empty
    else if (n.isObject) {
      val it = n.properties().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> (if (e.getValue.isTextual) e.getValue.asText
        else e.getValue.toString)
      }
      b.result()
    } else if (n.isArray && n.size() == 0) Map.empty // unit attribute ()
    else Map("value" -> (if (n.isTextual) n.asText else n.toString))

  /** Timestamp node: object {epoch_time, tz_*} or relaxed-ISO string. */
  private def tsOf(n: JsonNode): Option[(Long, Option[Tz])] =
    if (n == null || n.isNull || n.isMissingNode) None
    else if (n.isObject) {
      val ms = n.get("epoch_time").asLong()
      val tz = Option(n.get("tz_offset_min")).map(o =>
        Tz(o.asInt(),
          Option(n.get("tz_summer_only")).exists(_.asBoolean()),
          Option(n.get("tz_name")).map(_.asText()).getOrElse("")))
      Some((ms, tz))
    } else if (n.isTextual) TimeParse.parse(n.asText())
    else if (n.isNumber) Some((n.asLong(), None))
    else None

  /** Wire-format snapshot node/link docs → snapshot DataFrames
    * (symmetric with writeSnapshot; SnapshotSpec.hs doc shapes). */
  def readSnapshot(nodeDocs: Dataset[String],
      linkDocs: Dataset[String]): graft.model.SnapshotGraph = {
    val spark = nodeDocs.sparkSession
    import spark.implicits._
    val nodes = nodeDocs.mapPartitions { it =>
      val mapper = new ObjectMapper()
      it.flatMap { line =>
        try {
          val r = mapper.readTree(line)
          val id = r.get("node_id")
          val ts = tsOf(r.get("timestamp"))
          Some((
            if (id.isTextual) id.asText else id.toString,
            Option(r.get("is_on_boundary")).exists(_.asBoolean()),
            ts.map(_._1),
            if (r.get("node_attrs") == null || r.get("node_attrs").isNull) None
            else Some(attrsOf(r.get("node_attrs"))),
            ts.flatMap(_._2)))
        } catch { case _: Exception => None }
      }
    }.toDF("node_id", "is_on_boundary", "epoch_ms", "node_attrs", "tz")
    val links = linkDocs.mapPartitions { it =>
      val mapper = new ObjectMapper()
      it.flatMap { line =>
        try {
          val r = mapper.readTree(line)
          def str(f: String) = {
            val n = r.get(f)
            if (n.isTextual) n.asText else n.toString
          }
          tsOf(r.get("timestamp")).map { case (ms, tz) =>
            (str("source_node"), str("dest_node"),
              Option(r.get("is_directed")).exists(_.asBoolean()),
              ms, attrsOf(r.get("link_attrs")), tz)
          }
        } catch { case _: Exception => None }
      }
    }.toDF("source_node", "dest_node", "is_directed", "epoch_ms",
      "link_attrs", "tz")
    graft.model.SnapshotGraph(nodes, links)
  }

  /** Wire-format FoundNode docs → canonical findings DataFrame.
    * Malformed docs are dropped (count them upstream if needed). */
  def readFoundNodes(docs: Dataset[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parsed = docs.mapPartitions { it =>
      val mapper = new ObjectMapper()
      it.zipWithIndex.flatMap { case (line, i) =>
        try {
          val root = mapper.readTree(line)
          val subject = root.get("subject_node")
          val subjectStr =
            if (subject.isTextual) subject.asText else subject.toString
          tsOf(root.get("found_at")).map { case (ms, tz) =>
            val links = Option(root.get("neighbor_links")).toSeq
              .flatMap { arr =>
                (0 until arr.size()).map { j =>
                  val l = arr.get(j)
                  val t = l.get("target_node")
                  FoundLink(
                    if (t.isTextual) t.asText else t.toString,
                    l.get("link_state").asText(),
                    attrsOf(l.get("link_attrs")))
                }
              }
            FoundNode(subjectStr, ms, attrsOf(root.get("node_attrs")),
              links, i.toLong, tz)
          }
        } catch { case _: Exception => None }
      }
    }
    graft.model.Findings.toCanonical(parsed)
  }
}

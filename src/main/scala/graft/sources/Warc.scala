package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500, the CommonCrawl container) read/write — the ingest
  * boundary of every web-scale corpus pipeline: crawls arrive as WARC,
  * everything downstream ([[graft.text.Html]], quality, dedup) wants a
  * (record, payload) table.
  *
  * Read side is DISTRIBUTED over intra-file splits: Hadoop's
  * TextInputFormat with `textinputformat.record.delimiter` set to the
  * record sentinel splits one multi-GB WARC across tasks at arbitrary
  * byte offsets and re-aligns each split on the next sentinel — the
  * property that makes a 1 000-executor scan of a crawl dump trivially
  * parallel with no up-front indexing. Per-record parsing (header
  * block, then exactly Content-Length payload BYTES — UTF-8-aware, not
  * chars) is a typed map: imperative per-record logic, the same
  * mapPartitions discipline as the ContikiNg log source.
  *
  * Caveat (shared with every sentinel-split WARC reader): a payload
  * that itself contains the `WARC/1.0\r\n` sentinel splits early; the
  * Content-Length check then marks the record `truncated = true`
  * instead of silently corrupting it — callers route flagged records
  * to a slow whole-file path when exactness matters.
  */
object Warc {

  val Sentinel = "WARC/1.0\r\n"

  /** One parsed record: declared id/type pulled out of the header map
    * for convenience, payload cut to exactly Content-Length bytes,
    * `truncated` when fewer bytes were present (corrupt record or an
    * embedded sentinel). */
  case class WarcRecord(record_id: String, warc_type: String,
      headers: Map[String, String], content_length: Long,
      payload: String, truncated: Boolean)

  /** Serialize docs as WARC resource records and write them as one
    * WARC part file per partition (plain text, CRLF line ends,
    * Content-Length in UTF-8 bytes — [[read]]'s exact contract). Null
    * texts are dropped (a WARC record's payload length must be
    * stated). Pure column expressions + the text writer: distributed,
    * no driver assembly. */
  def write(docs: DataFrame, outDir: String, idCol: String = "doc_id",
      textCol: String = "text"): Unit =
    docs.filter(col(textCol).isNotNull)
      .select(concat(
        lit(Sentinel),
        lit("WARC-Type: resource\r\n"),
        lit("WARC-Record-ID: urn:graft:"), col(idCol).cast("string"),
        lit("\r\n"),
        lit("Content-Length: "), octet_length(col(textCol)).cast("string"),
        lit("\r\n\r\n"),
        col(textCol), lit("\r\n")).as("value"))
      .write.mode("overwrite").text(outDir)

  /** Distributed WARC scan: sentinel-delimited record split (parallel
    * WITHIN files), header-block parse, byte-exact payload cut. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", Sentinel)
    val raw = spark.sparkContext.newAPIHadoopFile(path,
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text], conf)
      .map(_._2.toString)
      .filter(_.trim.nonEmpty)
    spark.createDataset(raw)(Encoders.STRING)
      .map { rec =>
        val sep = rec.indexOf("\r\n\r\n")
        val (head, rest) =
          if (sep < 0) (rec, "") else (rec.substring(0, sep), rec.substring(sep + 4))
        val headers = head.split("\r\n").iterator
          .map(_.split(": ", 2))
          .collect { case Array(k, v) => k -> v }
          .toMap
        val declared = headers.get("Content-Length")
          .flatMap(_.toLongOption).getOrElse(0L)
        val bytes = rest.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = math.min(declared, bytes.length.toLong).toInt
        val payload = new String(bytes, 0, n,
          java.nio.charset.StandardCharsets.UTF_8)
        WarcRecord(
          headers.getOrElse("WARC-Record-ID", ""),
          headers.getOrElse("WARC-Type", ""),
          headers, declared, payload,
          truncated = bytes.length < declared)
      }(Encoders.product[WarcRecord])
      .toDF()
  }
}

package graft.util

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** Memory-bounded grouped ordered gather — the safe plan shape for
  * collectors whose per-group payload is bounded by DOCUMENT size rather
  * than fixed arity (line rebuilds, per-doc token-id rebuilds, per-doc
  * shingle lists).
  *
  * Why not `groupBy(...).agg(sort_array(collect_list(...)))`: the
  * session raises `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * to 16384 ([[graft.sources.Tables.sessionConfs]]) so the engine's
  * FIXED-ARITY grouped collectors (16-element minhash signatures,
  * 64-dim coordinate gathers, `collect_capped`) never pay a sort per
  * exchange. Under that threshold a doc-sized collect_list can hold up
  * to 16384 document-sized buffers per task before the sort fallback
  * engages — an OOM class on large-document corpora. This operator
  * instead plans `repartition(key) → sortWithinPartitions(key, order)`
  * (both spill-safe) and streams each partition with a run-length fold
  * that materializes exactly ONE group's payload at a time, so peak
  * aggregation memory is max(single document), independent of the
  * session threshold and of how many groups land in a task.
  *
  * Semantics: equivalent to
  * `groupBy(keyCols).agg(sort_array(collect_list(struct(orderCols…, payload))).payload)`
  * for NON-NULL payloads with distinct-or-payload-tied order keys (the
  * three call sites satisfy both: positions are unique per group, and
  * the shingle gather orders by the payload itself). Note collect_list
  * drops null payloads while this gather keeps them — do not use it
  * where payloads can be null and the drop is load-bearing.
  */
object BoundedCollect {

  /** Gather `payloadCol` per `keyCols` group, ordered by `orderCols`
    * ascending (nulls first, matching both sort_array and SQL ASC), as
    * an array column `outCol`. Output columns: keyCols :+ outCol. */
  def sortedGather(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[String], payloadCol: String,
      outCol: String): DataFrame = {
    require(keyCols.nonEmpty && !keyCols.contains(outCol),
      s"outCol $outCol must not collide with key columns $keyCols")
    val spark = df.sparkSession
    val proj = df.select((keyCols ++ orderCols :+ payloadCol).map(col): _*)
    val schema = proj.schema
    val nk = keyCols.length
    val payloadIdx = schema.length - 1
    val outSchema = StructType(
      schema.fields.take(nk) :+
        StructField(outCol, ArrayType(schema.fields(payloadIdx).dataType,
          containsNull = true)))
    val sorted = proj
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    val gathered = sorted.rdd.mapPartitions { rows =>
      val it = rows.buffered
      new Iterator[Row] {
        override def hasNext: Boolean = it.hasNext
        override def next(): Row = {
          val head = it.head
          val key: IndexedSeq[Any] = (0 until nk).map(head.get)
          val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
          while (it.hasNext && (0 until nk).forall(i =>
              java.util.Objects.equals(it.head.get(i), key(i))))
            buf += it.next().get(payloadIdx)
          Row.fromSeq(key :+ buf.toSeq)
        }
      }
    }
    spark.createDataFrame(gathered, outSchema)
  }
}

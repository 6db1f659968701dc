package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Bounded-memory grouped collection: `collect_capped(e, cap)` returns
  * `array_agg(e)` when the group has at most `cap` non-null elements and
  * NULL otherwise — and, unlike `collect_list(...)` + `size(...) <= cap`,
  * it never BUFFERS more than `cap` elements per group in any partial
  * aggregation state.
  *
  * Why a custom aggregate (SURVEY §7.3 preference order): the
  * group-then-pair shape of shingle/bucket candidate generation
  * (dedup.Dedup.sharedSpanPairs) wants each key's occurrence list in one
  * row, but a plain collect_list of a stop-phrase shingle's occurrences
  * is unbounded state — exactly the skew that kills a 100 TB job. The
  * cap is part of the SEMANTICS there (hot keys are excluded by
  * definition), so overflow-to-null both bounds memory and implements
  * the operator: once a partial buffer has seen cap+1 elements it stops
  * storing and only counts, so a billion-occurrence shingle costs one
  * counter per map task, not a billion-element array anywhere.
  *
  * Nulls are skipped (collect_list semantics). Element order within the
  * array is not defined (grouping order); callers must be
  * order-insensitive, as all pair generators are.
  */
case class CollectCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CollectCapped.Buf]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(cap > 0, s"collect_capped cap must be positive, got $cap")

  override def prettyName: String = "collect_capped"
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)

  override def createAggregationBuffer(): CollectCapped.Buf =
    new CollectCapped.Buf(0L, ArrayBuffer.empty[Any])

  override def update(b: CollectCapped.Buf, input: InternalRow): CollectCapped.Buf = {
    val v = child.eval(input)
    if (v != null) {
      b.n += 1L
      // store at most cap elements: if the group overflows the result is
      // NULL regardless, so the tail never needs to exist anywhere
      if (b.n <= cap) b.items += InternalRow.copyValue(v)
    }
    b
  }

  override def merge(b: CollectCapped.Buf, o: CollectCapped.Buf): CollectCapped.Buf = {
    b.n += o.n
    if (b.n <= cap) b.items ++= o.items else b.items.clear()
    b
  }

  override def eval(b: CollectCapped.Buf): Any =
    if (b.n > cap) null else new GenericArrayData(b.items.toArray)

  @transient private lazy val projection = UnsafeProjection.create(
    Array[DataType](LongType, dataType))

  override def serialize(b: CollectCapped.Buf): Array[Byte] = {
    val stored: Array[Any] =
      if (b.n > cap) Array.empty[Any] else b.items.toArray
    val arr = new GenericArrayData(stored)
    projection.apply(InternalRow.apply(b.n, arr)).getBytes
  }

  override def deserialize(bytes: Array[Byte]): CollectCapped.Buf = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val n = row.getLong(0)
    val items = ArrayBuffer.empty[Any]
    if (n <= cap) {
      val arr = row.getArray(1)
      var i = 0
      val m = arr.numElements()
      while (i < m) {
        items += InternalRow.copyValue(arr.get(i, child.dataType))
        i += 1
      }
    }
    new CollectCapped.Buf(n, items)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectCapped =
    copy(child = newChild)
}

object CollectCapped {
  /** Mutable aggregation state: total non-null count seen, plus at most
    * `cap` stored elements (cleared on overflow). */
  final class Buf(var n: Long, val items: ArrayBuffer[Any])

  /** Column API: `collectCapped(e, cap)` — array of the group's values,
    * or NULL when the group has more than `cap` of them. */
  def collectCapped(e: Column, cap: Int): Column =
    Shim.column(CollectCapped(Shim.expression(e), cap).toAggregateExpression())
}

/** Element-wise max over fixed-width `array<tinyint>` register vectors —
  * the grouped merge of PACKED HyperLogLog sketches
  * ([[graft.operators.HyperBall]] carries each node's ball as ONE
  * m-byte array instead of m (id, bucket, rho) rows, so the per-hop
  * edge join emits one row per edge rather than m).
  *
  * Why a custom aggregate (SURVEY §7.3 preference order): Spark has
  * `zip_with(a, b, greatest)` for two arrays in one row but no GROUPED
  * element-wise reduction over an array column; `collect_list` + a
  * fold would buffer every neighbor's vector per group — unbounded on
  * a hub node. This buffer is a single m-byte array regardless of
  * group size, partials merge map-side like any max, and serialization
  * is the raw register bytes.
  *
  * Nulls are skipped (max semantics); input arrays must all have
  * exactly `m` elements — enforced, because a silent length mismatch
  * would mis-align every register after the short one. */
case class RegisterMax(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(m > 0, s"register_max width must be positive, got $m")

  // analysis-time type check: a non-byte array child (the natural
  // array<int> from an un-cast transform) must fail with a clear
  // error, not a runtime ClassCastException or a silent getByte misread
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(ByteType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"register_max expects array<tinyint> registers, got " +
              other.sql)
    }

  override def prettyName: String = "register_max"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == m,
        s"register_max($m) got a ${arr.numElements()}-element vector")
      var i = 0
      while (i < m) {
        val x = arr.getByte(i)
        if (x > b(i)) b(i) = x
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (o(i) > b(i)) b(i) = o(i)
      i += 1
    }
    b
  }

  override def eval(b: Array[Byte]): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(b)

  // the buffer IS its wire form: m raw register bytes
  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): RegisterMax =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RegisterMax =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): RegisterMax =
    copy(child = newChild)
}

object RegisterMax {
  /** Column API: `registerMax(regs, m)` — the element-wise max of the
    * group's m-byte register vectors. */
  def registerMax(e: Column, m: Int): Column =
    Shim.column(RegisterMax(Shim.expression(e), m).toAggregateExpression())
}

package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Bottom-k aggregate for ANY orderable input type — the generic
  * companion to [[BottomKLongs]] (which stays the fast path for integral
  * ids: primitive heap, no boxing). The r18 verdict's residual defect:
  * [[graft.ops.BottomK.perKey]]'s phase-1 `collect_list` accumulated
  * EVERY row of a (key, map-partition) group in one aggregation buffer
  * before `array_sort`+`slice` truncated it — bounded by a map
  * partition, but still O(partition-rows) state on a degenerate key
  * where BottomKLongs holds a k-heap. This aggregate closes that: the
  * buffer is a size-≤k max-heap over Spark's interpreted ordering for
  * the input type (binary/UTF8 for strings — the exact order the old
  * window's `orderBy(id)` and collect_list+array_sort used), so
  * per-group state is O(k) on BOTH the map and reduce side, merges are
  * O(k), and the shuffle carries ≤ k values per key per map partition.
  * Keep-lowest semantics are identical, so gated hashes are unchanged.
  *
  * Values are copied on insert (UTF8String/binary evals share buffers)
  * and serialized through an [[UnsafeProjection]] of the child type —
  * the same machinery Spark's own collect aggregates use.
  */
case class BottomKAny(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]]
  with UnaryLike[Expression] {

  require(k >= 1, s"bottom_k_any requires k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)
  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_any"

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val proj =
    UnsafeProjection.create(Array(child.dataType))

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](ord)

  private def insert(buf: mutable.PriorityQueue[Any], x: Any): Unit =
    if (buf.size < k) buf.enqueue(x)
    else if (ord.lt(x, buf.head)) { buf.dequeue(); buf.enqueue(x) }

  override def update(buf: mutable.PriorityQueue[Any],
      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) insert(buf, InternalRow.copyValue(v))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[Any],
      other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ord))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    val row = new GenericInternalRow(1)
    buf.foreach { v =>
      row.update(0, v)
      val u = proj(row)
      dos.writeInt(u.getSizeInBytes)
      dos.write(u.getBytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val dis = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    while (dis.available() > 0) {
      val n = dis.readInt()
      val b = new Array[Byte](n)
      dis.readFully(b)
      val u = new UnsafeRow(1)
      u.pointTo(b, n)
      insert(buf, InternalRow.copyValue(u.get(0, child.dataType)))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): BottomKAny =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BottomKAny =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BottomKAny =
    copy(child = newChild)
}

object BottomKAny {

  /** Column API ([[BottomKLongs.bottomK]]'s registry pattern). */
  def bottomK(spark: SparkSession, id: Column, k: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bottom_k_any",
      exprs => BottomKAny(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    call_function("graft_bottom_k_any", id, lit(k))
  }
}

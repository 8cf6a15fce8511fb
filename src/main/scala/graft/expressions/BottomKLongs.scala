package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bottom-k aggregate: the k SMALLEST non-null long values of a group, as
  * a sorted-ascending array. The point versus
  * `row_number().over(Window.partitionBy(key).orderBy(id)) <= k` is the
  * partial-aggregation bound: the window formulation materializes and
  * sorts EVERY row of a key inside one task before truncating — a
  * fully-degenerate key (all n rows sharing one LSH bucket, one collapsed
  * embedding cell) funnels the whole group through a single task. This
  * buffer holds AT MOST k values per (partition, key) on the map side and
  * merges are O(k), so the shuffle carries ≤ k values per key per map
  * partition and no task ever sees an unbounded group. The keep-lowest
  * semantics are identical (deterministic in the value order), so gated
  * hashes are unchanged when a window cap is replaced by this.
  *
  * Buffer is a max-heap of size ≤ k (evict the largest when full);
  * serialization is the packed long array.
  */
case class BottomKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"bottom_k_longs requires k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bottom_k_longs requires a bigint input, got ${t.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_longs"

  override def createAggregationBuffer(): mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long]

  private def insert(buf: mutable.PriorityQueue[Long], x: Long): Unit =
    if (buf.size < k) buf.enqueue(x)
    else if (x < buf.head) { buf.dequeue(); buf.enqueue(x) }

  override def update(buf: mutable.PriorityQueue[Long],
      input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[Long],
      other: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Long]): Any =
    new GenericArrayData(buf.toArray.sorted)

  override def serialize(buf: mutable.PriorityQueue[Long]): Array[Byte] = {
    val arr = buf.toArray
    val bb = java.nio.ByteBuffer.allocate(8 * arr.length)
    arr.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = mutable.PriorityQueue.empty[Long]
    while (bb.hasRemaining) insert(buf, bb.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): BottomKLongs =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BottomKLongs =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BottomKLongs =
    copy(child = newChild)
}

object BottomKLongs {

  /** Column API (DotProduct's registry pattern): `bottomK(spark, id, k)`
    * aggregates to the sorted array of the k smallest ids.
    */
  def bottomK(spark: SparkSession, id: Column, k: Int): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bottom_k",
      exprs => BottomKLongs(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
    call_function("graft_bottom_k", id, lit(k))
  }
}

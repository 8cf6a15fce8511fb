package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain(key, filter)` over a pre-built `util.sketch.BloomFilter`,
  * as a native codegen expression. The filter rides along as a foldable
  * binary literal and is deserialized ONCE per executor (transient lazy),
  * so the per-row cost is a few hash probes inside whole-stage codegen —
  * the membership prune that cuts a 100 TB probe side down before its
  * shuffle, with false positives removed by the exact join that follows
  * (see `graft.ops.BloomPrune`).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"might_contain requires (bigint, foldable binary), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(
      new ByteArrayInputStream(right.eval().asInstanceOf[Array[Byte]]))

  override def nullSafeEval(key: Any, bytesUnused: Any): Any =
    filter.mightContainLong(key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev,
      (key, _) => s"${ev.value} = $bf.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {

  /** Column API: `key` must be bigint; the filter is serialized into the
    * plan as a literal (executors get it with the task binary — same
    * distribution path as a broadcast hint's small side).
    */
  def mightContain(spark: SparkSession, key: Column, filter: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_contains",
      exprs => BloomMightContain(exprs(0), exprs(1)), "built-in")
    call_function("graft_bloom_contains", key, lit(out.toByteArray))
  }
}

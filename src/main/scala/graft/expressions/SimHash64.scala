package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** SimHash over pre-hashed token features: each of the 64 output bits is the
  * sign of Σ±1 across the input hashes' corresponding bits. Near-duplicate
  * documents land within a small Hamming distance of each other.
  *
  * Implemented as a native Catalyst expression (not a Scala UDF) so it
  * participates in whole-stage codegen: `doGenCode` emits a static call —
  * no boxing, no serialization penalty, stays inside the generated loop.
  * Row-local: a 100 TB corpus simhashes with zero shuffles.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Static so generated code can call it directly. Null elements count as
    * hash 0 (their bits vote -1 uniformly) — tokenizers shouldn't produce
    * them, but codegen must not NPE if one slips through.
    */
  def compute(hashes: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = if (hashes.isNullAt(i)) 0L else hashes.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column API: simhash of an array<long> of feature hashes. Registered
    * through the session's FunctionRegistry (the public route to inject a
    * custom Expression into a plan — Column no longer wraps Expressions
    * directly in Spark 4's Classic/Connect split).
    */
  def simhash64(spark: SparkSession, hashedTokens: Column): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash64", exprs => SimHash64(exprs.head), "built-in")
    call_function("graft_simhash64", hashedTokens)
  }

  /** Hamming distance between two simhashes (bit_count is codegen'd). */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}

package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonicalization step a multilingual
  * corpus pipeline runs before hashing/dedup: visually-identical text can
  * arrive composed (é) or decomposed (e + U+0301), and every downstream
  * content hash, shingle and join key diverges on the difference. Spark
  * ships no normalization builtin; this wraps `java.text.Normalizer`
  * (the JDK's Unicode implementation, same standard DuckDB's
  * nfc_normalize implements — which is what lets the oracle gate it) as
  * a native codegen expression: a static call inside the generated loop,
  * no UDF boxing. Row-local, zero shuffle at any scale.
  *
  * ASCII fast path: `Normalizer.isNormalized` is O(n) with no
  * allocation for already-NFC text (the overwhelming majority of a real
  * corpus), so the normalize-allocate cost is paid only by rows that
  * need it.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static so generated code calls it directly. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column-API entry through the session FunctionRegistry (the public
    * route to inject a custom Expression — the DotProduct pattern).
    */
  def nfc(spark: org.apache.spark.sql.SparkSession,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc", exprs => NfcNormalize(exprs.head), "built-in")
    org.apache.spark.sql.functions.call_function("graft_nfc", c)
  }
}

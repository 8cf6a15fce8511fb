package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 60-bit sha256-derived hash ([[Hashing.sha60]]) as ONE native
  * expression instead of the conv(substring(sha2(x, 256), 1, 15), 16, 10)
  * composition. The value is identical by construction — the first 15 hex
  * chars of sha256 ARE the first 60 bits of the digest, so
  * big-endian(bytes[0..7]) >>> 4 equals conv's parse of the hex prefix —
  * but the composition pays, per row: a fresh MessageDigest instance
  * (commons-codec), a 64-char hex-encode allocation, a substring copy,
  * conv's per-character radix parse, and a string→long cast. On the
  * MinHash/SimHash/bootstrap hot paths this expression is evaluated
  * millions of times per query; the one-pass form (thread-local digest,
  * no intermediate strings) is the §4.1 "prefer codegen built-ins" move
  * applied to our own hash. Sha60Spec pins equality against the original
  * composition on adversarial inputs.
  */
case class Sha60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sha60 requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sha60"

  override def nullSafeEval(input: Any): Any =
    Sha60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Sha60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Sha60 =
    copy(child = newChild)
}

object Sha60 {

  /** One SHA-256 instance per thread: MessageDigest.getInstance is a
    * provider lookup + allocation and digest() leaves the instance reset,
    * so reuse is safe and saves the dominant constant cost on short
    * inputs.
    */
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  /** Static so generated code calls it directly. First 60 bits of the
    * digest, as a non-negative long — exactly the value of the first 15
    * hex chars under base-16 → base-10 conversion.
    */
  def compute(s: UTF8String): Long = {
    val d = digests.get().digest(s.getBytes)
    (((d(0) & 0xffL) << 56) |
      ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) |
      ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) |
      (d(7) & 0xffL)) >>> 4
  }
}

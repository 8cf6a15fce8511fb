package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.StringType

import graft.expressions.{DotProduct, NfcNormalize, Sha60, SimHash64}

/** graft's SQL surface: the native Catalyst expressions exposed as SQL
  * functions, so `spark.sql("... graft_dot(a, b) ...")` works the same as
  * the Column API.
  *
  * Two registration paths, same builders:
  *
  *  - [[GraftExtensions]] — a `SparkSessionExtensions` injector for
  *    cluster deployment (`spark.sql.extensions=graft.plans.GraftExtensions`
  *    in spark-defaults); functions exist in every session from startup.
  *  - [[GraftFunctions.register]] — per-session registration for an
  *    already-running session (tests, notebooks).
  */
object GraftFunctions {

  /** sha60 as the native [[Sha60]] expression (r20; value identical to the
    * old conv(substr(sha2(...), 1, 15), 16, 10) composition — Sha60Spec
    * pins the equality). The cast keeps the SQL surface accepting any
    * input type, exactly like `Hashing.sha60`.
    */
  private def sha60Expr(e: Expression): Expression =
    Sha60(Cast(e, StringType))

  /** (name, builder) for every graft SQL function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "graft_simhash64" -> (exprs => SimHash64(exprs.head)),
    "graft_sha60" -> (exprs => sha60Expr(exprs.head)),
    "graft_nfc" -> (exprs => NfcNormalize(exprs.head)))

  /** Register all graft functions + optimizer rules into a live session.
    * `extraOptimizations` is idempotence-guarded: repeated registration
    * (every gated query calls this) must not stack duplicate rules. The
    * check-then-append is synchronized — concurrent register() calls on
    * the same session (parallel query threads) must not interleave the
    * check and the append and stack duplicates.
    */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    GraftFunctions.synchronized {
      if (!spark.experimental.extraOptimizations.contains(BoundedLevenshtein))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ BoundedLevenshtein
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    ext.injectOptimizerRule(_ => BoundedLevenshtein)
  }
}

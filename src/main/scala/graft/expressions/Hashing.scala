package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Cross-engine-reproducible feature hashing.
  *
  * `xxhash64` is the fast engine-internal hash, but no other engine can
  * recompute it — which keeps any query built on it out of the external
  * SQL oracle gate. `sha60` derives a 60-bit non-negative int64 from the
  * first 15 hex chars of sha256, which every engine can reproduce:
  *
  *   Spark : graft.expressions.Sha60 (≡ conv(substring(sha2(x, 256), 1, 15), 16, 10)::long)
  *   DuckDB: ('0x' || substr(sha256(x), 1, 15))::BIGINT
  *
  * Use `sha60` wherever a query's correctness oracle must recompute the
  * hashes; keep `xxhash64` on engine-internal paths where speed wins.
  */
object Hashing {

  /** 60-bit sha256-derived hash of the (string-cast) input. Non-negative,
    * so modular arithmetic downstream never hits sign-dependent `%`.
    *
    * Routed through the native [[Sha60]] expression (r20): the original
    * conv∘substring∘sha2 composition allocated a fresh MessageDigest, a
    * 64-char hex string, a substring and a radix-parse per row — pure
    * constant overhead on the millions-of-rows MinHash/bootstrap paths.
    * Values are bit-identical (Sha60Spec pins the equality); the
    * composition remains as the sessionless fallback so Column
    * construction never requires an active session.
    */
  def sha60(c: Column): Column =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
      case Some(s) =>
        s.sessionState.functionRegistry.createOrReplaceTempFunction(
          "graft_sha60", exprs => Sha60(Cast(exprs.head, StringType)), "built-in")
        call_function("graft_sha60", c.cast("string"))
      case None =>
        conv(substring(sha2(c.cast("string"), 256), 1, 15), 16, 10).cast("long")
    }

  /** The DuckDB expression computing exactly [[sha60]] — kept next to the
    * Spark form so the two can never drift apart silently.
    */
  def sha60Sql(expr: String): String =
    s"('0x' || substr(sha256($expr), 1, 15))::BIGINT"
}

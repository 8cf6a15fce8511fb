package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-reproducible feature hashing.
  *
  * `xxhash64` is the fast engine-internal hash, but no other engine can
  * recompute it — which keeps any query built on it out of the external
  * SQL oracle gate. `sha60` derives a 60-bit non-negative int64 from the
  * first 15 hex chars of sha256, which every engine can reproduce:
  *
  *   Spark : conv(substring(sha2(x, 256), 1, 15), 16, 10)::long
  *   DuckDB: ('0x' || substr(sha256(x), 1, 15))::BIGINT
  *
  * Use `sha60` wherever a query's correctness oracle must recompute the
  * hashes; keep `xxhash64` on engine-internal paths where speed wins.
  */
object Hashing {

  /** 60-bit sha256-derived hash of the (string-cast) input. Non-negative,
    * so modular arithmetic downstream never hits sign-dependent `%`.
    */
  def sha60(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 1, 15), 16, 10).cast("long")

  /** The DuckDB expression computing exactly [[sha60]] — kept next to the
    * Spark form so the two can never drift apart silently.
    */
  def sha60Sql(expr: String): String =
    s"('0x' || substr(sha256($expr), 1, 15))::BIGINT"
}

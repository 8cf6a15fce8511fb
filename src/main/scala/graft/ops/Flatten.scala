package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Struct flattening (SURVEY.md §2.2 P1/P2). The reference flattens JSON
  * either by hand-written dict comprehensions (biilwerk_contracts.py:124-170)
  * or `pd.json_normalize(max_level=5)` (churn_reasons.py:68). Here both are
  * pure projections — schema-driven, zero-copy under Tungsten.
  */
object Flatten {

  /** P2 — generic auto-flatten: every nested struct field becomes a
    * top-level column named `parent<sep>child`, depth-first, preserving
    * declaration order. Arrays/maps are left intact (explode is a separate,
    * row-multiplying decision — see Nested).
    */
  def flatten(df: DataFrame, sep: String = "_", maxLevel: Int = 5): DataFrame = {
    def expand(schema: StructType, path: Seq[String], level: Int): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        val p = path :+ f.name
        f.dataType match {
          case s: StructType if level < maxLevel => expand(s, p, level + 1)
          case _ => Seq(col(p.map(n => s"`$n`").mkString(".")).as(p.mkString(sep)))
        }
      }
    df.select(expand(df.schema, Nil, 0): _*)
  }

  /** P1/P2 over a JSON-string column: parse with an explicit schema (the
    * engine pins schemas; autodetect is for exploration only — SURVEY.md
    * §1.3), then surface chosen fields. Missing fields are NULL-safe by
    * construction, replicating the reference's `.get(k, default)` chains.
    */
  def fromJsonCols(df: DataFrame, jsonCol: String, ddl: String,
      keep: Seq[String]): DataFrame = {
    val parsed = df.withColumn("__j", from_json(col(jsonCol), DataType.fromDDL(ddl)))
    keep.foldLeft(parsed)((d, k) => d.withColumn(k, col(s"__j.$k"))).drop("__j")
  }
}

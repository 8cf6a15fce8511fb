package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks (the dbt-test / great-expectations shape a
  * warehouse ELT pipeline runs after every load): declarative rules →
  * one violations row per rule. Row rules (not-null, accepted values,
  * ranges) evaluate in a SINGLE pass — one aggregate with a
  * sum(when(violation)) per rule, never one scan per rule; at 100 TB the
  * difference is rules× the corpus. Uniqueness is not a row predicate and
  * aggregates separately (one shuffle on the key).
  */
object Dq {

  final case class Rule(name: String, violation: Column)

  /** (rule, n_violations) for every row rule — one scan, one aggregate. */
  def rowViolations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r =>
      sum(when(r.violation, 1L).otherwise(0L)).as(r.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(map(
      rules.flatMap(r => Seq(lit(r.name), col(r.name))): _*))
      .as(Seq("rule", "n_violations")))
  }

  /** (rule, n_violations) where a violation is a KEY appearing more than
    * once — the primary-key test. One shuffle on the key; the count is
    * the number of excess rows (total − distinct keys), matching dbt's
    * "rows that share a key with another row minus one canonical".
    */
  def uniquenessViolations(df: DataFrame, name: String,
      keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(lit(name).as("rule"),
        coalesce(sum(col("__n") - 1), lit(0L)).as("n_violations"))
}

package graft.maintain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract validation ("expectations"): named boolean rules evaluated
  * over a table, reported as per-rule violation counts and rates — the
  * admission gate a lake runs before publishing a snapshot (the
  * Great-Expectations/dbt-test shape, engine-side).
  *
  * Cost model matches [[graft.text.CorpusFilters.c4Summary]]: every rule is
  * a codegen'd predicate inside ONE map-side partial aggregate; the reduce
  * ships a single row of longs no matter how many rows were validated. At
  * 100 TB this is a pure scan — the cheapest full-table audit there is;
  * run it per partition-delta rather than per full table when snapshots
  * are incremental.
  *
  * `violation_rate` is one IEEE division of two exact longs (bit-stable).
  */
object Expectations {

  /** One row per rule: (rule, n_rows, n_violations, violation_rate).
    * Rule columns must be null-safe booleans (null counts as a violation —
    * a contract a row can't be shown to satisfy is a violation).
    */
  def validate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    // an empty rule list would generate stack(0, ) — an opaque SQL parse
    // error at execution time; fail clearly at call time instead
    require(rules.nonEmpty, "Expectations.validate requires at least one rule")
    val aggs = rules.map { case (name, cond) =>
      sum(when(coalesce(cond, lit(false)), 0L).otherwise(1L)).as(s"v_$name")
    } :+ count(lit(1)).as("n_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (name, _) => s"'$name', v_$name" }.mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)")
      .select(col("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations").cast("double") / col("n_rows")).as("violation_rate"))
  }
}

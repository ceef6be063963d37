package graft.maintain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural integrity audits — the relational-health companions to the
  * per-row [[Expectations]] contract:
  *
  *  - functional-dependency checks (`lhs → rhs` — does each lhs value map
  *    to exactly one rhs value?),
  *  - referential integrity (child keys with no parent — the "dropped
  *    dimension partition" detector),
  *  - key uniqueness (duplicate primary keys).
  *
  * Each is a single aggregate or anti-join on the checked key: one shuffle,
  * map-side combined, output proportional to violations (or one row) — the
  * audits stay metadata-cheap at any table size.
  */
object Integrity {

  /** lhs groups that map to more than one rhs value (FD violations),
    * with their distinct-rhs counts.
    */
  def fdViolatingGroups(df: DataFrame, lhs: String, rhs: String): DataFrame =
    df.groupBy(col(lhs))
      .agg(countDistinct(col(rhs)).as("n_distinct_rhs"))
      .filter(col("n_distinct_rhs") > 1)

  /** Child rows whose key has no match in the parent (orphans). */
  def orphans(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")

  /** Key values that occur more than once (primary-key duplicates). */
  def duplicateKeys(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Second (and last) Spark-internal bridge, sibling of
  * [[BatchAsStream]]: wrap an already-analyzed `LogicalPlan` fragment
  * back into a `DataFrame` so an optimizer rule can EXECUTE a bounded
  * side plan (the broadcast-side key collect of join-driven file
  * skipping). `Dataset.ofRows` is `private[sql]`, hence the package;
  * this is the standard third-party shape (Delta Lake's whole codebase
  * lives under `org.apache.spark.sql.delta` for exactly this access).
  */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Catalyst `Expression` → user-facing `Column` (`ExpressionUtils
    * .column` is `private[sql]`): the SQL-DML rules carry an analyzed
    * condition/assignment out of one plan and re-resolve it by NAME
    * against the warehouse's own read — the caller has already
    * swapped attribute references for `UnresolvedAttribute`s.
    */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}

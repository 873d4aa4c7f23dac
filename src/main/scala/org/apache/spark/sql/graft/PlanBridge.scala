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

  /** CatalogManager access (`sessionState.catalogManager` is
    * `private[sql]`): the view DDL/read wiring needs to ask "is this
    * name a registered graft catalog" and "what is the current
    * catalog/namespace" at parse/resolution time.
    */
  def catalogOf(spark: org.apache.spark.sql.SparkSession, name: String)
      : Option[org.apache.spark.sql.connector.catalog.CatalogPlugin] = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    try Some(s.sessionState.catalogManager.catalog(name))
    catch { case _: Exception => None }
  }

  def currentCatalogName(spark: org.apache.spark.sql.SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager.currentCatalog.name()

  def currentNamespace(spark: org.apache.spark.sql.SparkSession): Array[String] =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager.currentNamespace
}

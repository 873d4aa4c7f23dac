package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.execution.datasources.DataSource
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation

import graft.sources.GraftTable

/** Streaming reads through catalog names —
  * `spark.readStream.table("graft.ns.t")` — completing the Delta-CDF
  * UX the batch catalog opened: the same name a batch query SELECTs
  * from is now a streaming source, no warehouse root or format string
  * anywhere in user code.
  *
  * Resolution-splice shape, sibling of [[CatalogReadRule]]: the
  * analyzer resolves the table through [[graft.sources.GraftCatalog]]
  * into a `StreamingRelationV2` over a [[GraftTable]]; this rule swaps
  * it for the V1 `graft-changes` change-feed source
  * ([[graft.streaming.ChangeFeedProvider]]) FILTERED to insert rows
  * and projected back to the table's columns — so a streaming table
  * read serves appended rows per commit (the Delta `readStream.table`
  * semantics: appends stream, updates/deletes don't), with the change
  * feed's offset/checkpoint machinery (offset = committed snapshot
  * version, per-trigger cost bounded by the commits in the window)
  * reused verbatim. A `MicroBatchStream` re-implementation would have
  * to re-plan what `Warehouse.changes` already plans — this splice is
  * the whole point of the V1 source's computed-DataFrame contract.
  *
  * Options pass through (`spark.readStream.option(...)`):
  * `startingVersion` picks the first version whose changes are served
  * (1 = replay the whole retained history as batch 0); default =
  * future commits only, the change feed's "latest" stance. Columns
  * added by `ALTER TABLE ADD COLUMN` but not yet materialized by any
  * write null-fill, same as the batch read.
  *
  * `readChangeFeed=true` (the Delta CDF option, round 18): serve ALL
  * row kinds — inserts, the rows a DV commit deleted, an update as
  * its delete(old) + insert(new) pair — with the feed's `_change_type`,
  * `_commit_version` and `_commit_timestamp` (the manifest's
  * self-contained commit wall-clock; null for pre-label commits)
  * columns appended to the table schema, instead of
  * the insert-only filtered/projected view. Subscribers that need
  * update/delete visibility no longer drop to the `graft_changes`
  * TVF; the same checkpoint/offset machinery applies (offsets =
  * committed snapshot versions), so exactly-once restart holds for
  * CDF streams too.
  */
final class CatalogStreamRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case s: StreamingRelationV2 if s.table.isInstanceOf[GraftTable] =>
      val t = s.table.asInstanceOf[GraftTable]
      import scala.jdk.CollectionConverters._
      val passthrough = s.extraOptions.asCaseSensitiveMap().asScala
      val opts = Map(
        "root" -> t.wh.rootDir,
        "table" -> t.bareName) ++
        passthrough
          .filter { case (k, _) => k.equalsIgnoreCase("startingVersion") }
          .map { case (_, v) => "startingVersion" -> v }
      val cdf = passthrough
        .find { case (k, _) => k.equalsIgnoreCase("readChangeFeed") }
        .exists { case (_, v) => v.equalsIgnoreCase("true") }
      val ds = DataSource(spark,
        className = classOf[graft.streaming.ChangeFeedProvider].getName,
        options = opts)
      val v1 = StreamingRelation(ds)
      val changeType = v1.output.find(_.name == "_change_type").getOrElse(
        throw new IllegalStateException(
          "graft-changes schema lost its _change_type column"))
      // rebind to the V2 relation's attribute ids; a prop-added column
      // the feed doesn't carry yet null-fills with its declared type
      def rebound = s.output.map { o =>
        v1.output.find(_.name == o.name) match {
          case Some(inner) => Alias(inner, o.name)(exprId = o.exprId)
          case None => Alias(Literal(null, o.dataType), o.name)(exprId = o.exprId)
        }
      }
      if (cdf) {
        // unfiltered: every change row, CDF meta columns appended.
        // This node is the plan ROOT at `.table()` analysis, so the
        // widened output IS the stream's schema (the Delta
        // readChangeFeed contract).
        val meta = v1.output.filter(a =>
          a.name == "_change_type" || a.name == "_commit_version" ||
            a.name == "_commit_timestamp")
        Project(rebound ++ meta, v1)
      } else
        Project(rebound, Filter(EqualTo(changeType, Literal("insert")), v1))
  }
}

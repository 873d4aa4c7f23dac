package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analysis-time splice for [[graft.sources.GraftCatalog]] reads — the
  * Delta-extension shape: the catalog resolves NAMES (so
  * `graft.wh.orders` parses, SHOW TABLES works, writes fall back to
  * V1), and this rule swaps each resolved `DataSourceV2Relation` over
  * a [[graft.sources.GraftTable]] for the warehouse's one V1 read
  * plan. Everything the Scala read surface has — merge-on-read
  * deletes, auto-skip enrollment, metadata-aggregate collapse,
  * join-driven skipping — applies to catalog SQL for free, because it
  * IS the same plan.
  *
  * The splice keeps the V2 relation's output attributes (an alias per
  * column, pinned to the original exprIds) so references above the
  * relation stay bound. Write commands' TARGET relations are left
  * untouched — the V1Write fallback owns those — while reads inside a
  * write's query are still spliced (INSERT INTO ... SELECT FROM
  * graft.…).
  */
final class CatalogReadRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val writeTargets = plan.collect { case w: V2WriteCommand => w.table }
    plan.transformUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.GraftTable] &&
            !writeTargets.exists(_ eq r) =>
        val inner = r.table.asInstanceOf[graft.sources.GraftTable]
          .snapshot.queryExecution.analyzed
        Project(r.output.zip(inner.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId)
        }, inner)
    }
  }
}

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
    val writeTargets: Seq[LogicalPlan] =
      plan.collect { case w: V2WriteCommand => Seq(w.table) }.flatten ++
      // row-level DML targets stay V2 relations too: CatalogDmlRule
      // (same post-hoc batch, registered after this rule) rewrites the
      // whole command onto the warehouse's delete/update/upsert paths —
      // splicing the target here first would hide it. A MERGE's SOURCE
      // is not excluded: it reads through the normal splice.
      plan.collect {
        case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable =>
          d.table.collect { case r: DataSourceV2Relation => r }
        case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
          u.table.collect { case r: DataSourceV2Relation => r }
        case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
          m.targetTable.collect { case r: DataSourceV2Relation => r }
        // ADD CONSTRAINT's validation scan: CatalogDmlRule rewrites the
        // whole command onto Warehouse.addCheckConstraint (which runs
        // its own validation); splicing here would leave an
        // AddCheckConstraint no physical strategy can plan
        case a: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint =>
          a.child.collect { case r: DataSourceV2Relation => r }
      }.flatten
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

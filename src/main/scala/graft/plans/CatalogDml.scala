package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.PlanBridge

import graft.sources.{GraftTable, Warehouse}

/** SQL DML over catalog tables — `DELETE FROM` / `UPDATE` / `MERGE
  * INTO graft.<ns>.<t>` resolved onto the warehouse's own row-level
  * commit paths, the reference's S8/S9 repository surface
  * (base_repository.py:55-61) in its native SQL spelling. The Delta
  * pre-row-level-API shape: a post-hoc resolution rule swaps each
  * resolved command for a RunnableCommand that drives the engine's
  * Scala API —
  *
  *  - `DELETE FROM t WHERE c` → [[Warehouse.deleteRows]]: a
  *    deletion-vector commit, O(hits) sidecar + O(header) manifest
  *    delta, never a rewrite — any deterministic row-local predicate
  *    works (no V1-Filter translatability ceiling);
  *  - `UPDATE t SET ... WHERE c` → [[Warehouse.updateRows]]: ONE
  *    atomic commit carrying both the rewritten rows and the old
  *    positions' DV entries, cost ∝ updated rows;
  *  - `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET
  *    * WHEN NOT MATCHED THEN INSERT *` → [[Warehouse.upsert]] keyed
  *    on the ON-clause equalities (partition-scoped when the table is
  *    partitioned, with the moved-key assertion ON — the SQL surface
  *    prefers loud over fast-but-stale); `WHEN MATCHED THEN DELETE`
  *    (alone) → the S9 anti-join delete; EVERY other legal MERGE shape
  *    — conditional `WHEN MATCHED AND <cond>`, partial `UPDATE SET col
  *    = expr`, multiple WHEN branches, `WHEN NOT MATCHED BY SOURCE
  *    [UPDATE|DELETE]`, `WITH SCHEMA EVOLUTION` (the analyzer ALTERs
  *    through the catalog's metadata-only AddColumn path, enabled by
  *    the table's AUTOMATIC_SCHEMA_EVOLUTION capability) →
  *    [[Warehouse.mergeRows]], one atomic merge-on-read commit, cost ∝
  *    touched rows.
  *
  * What remains out: correlated subqueries INSIDE merge clauses and
  * non-equi ON conditions — those fail LOUDLY at analysis with the
  * unsupported shape named, never a silent fallback (the
  * negative-shape specs pin this). DELETE/UPDATE subquery conditions
  * (IN / EXISTS, correlated on equalities) decorrelate onto the keyed
  * paths below.
  *
  * Expressions cross plans by NAME: the analyzed condition's
  * attribute references become `UnresolvedAttribute`s and re-resolve
  * against the warehouse read inside the command — the same frame the
  * engine's Scala callers filter, so SQL and Scala DML cannot drift.
  */
object CatalogDml {

  /** The one GraftTable relation under alias/projection wrappers. */
  def graftTarget(p: LogicalPlan): Option[(DataSourceV2Relation, GraftTable)] =
    p match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable => Some((r, t))
        case _             => None
      }
      case SubqueryAlias(_, child) => graftTarget(child)
      case _                       => None
    }

  /** Inline `With`/CommonExpressionRef nodes (the analyzer's BETWEEN
    * and friends): substituting unresolved attributes INSIDE a
    * CommonExpressionDef breaks `withNewChildren` (it re-derives the
    * def's dataType), so the shared expression is expanded first —
    * re-evaluation is fine, these conditions run once per row in a
    * DV/update scan, not in a tight codegen loop.
    */
  private def inlineWith(e: Expression): Expression = e.transformUp {
    case w: org.apache.spark.sql.catalyst.expressions.With =>
      val byId = w.defs.map(d => d.id -> d.child).toMap
      w.child.transformUp {
        case r: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef
            if byId.contains(r.id) => byId(r.id)
      }
  }

  /** Re-target an expression by column name: every attribute of
    * `target` becomes an UnresolvedAttribute, so the expression
    * resolves against the warehouse's own read plan. Subqueries and
    * attributes from OTHER plans (correlations) are rejected loudly.
    */
  def byName(e: Expression, target: Seq[Attribute]): Expression = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      s"graft SQL DML does not support subqueries in conditions: $e")
    val ids = target.map(_.exprId).toSet
    inlineWith(e).transform {
      case a: AttributeReference =>
        require(ids.contains(a.exprId),
          s"graft SQL DML condition references a non-target column: ${a.name}")
        UnresolvedAttribute.quoted(a.name)
    }
  }

  def cond(e: Expression, target: Seq[Attribute]): Column =
    PlanBridge.columnOf(byName(e, target))

  /** Re-target a MERGE clause expression for the
    * [[Warehouse.mergeRows]] join frame: target attributes by bare
    * name, source attributes under the `_src_` prefix. Anything else
    * (a third plan's attribute, a subquery) is rejected loudly.
    */
  def mergeCond(e: Expression, target: Seq[Attribute],
      source: Seq[Attribute]): Column = {
    require(!e.exists(_.isInstanceOf[SubqueryExpression]),
      s"graft SQL MERGE does not support subqueries in clauses: $e")
    val tIds = target.map(_.exprId).toSet
    val sById = source.map(a => a.exprId -> a.name).toMap
    PlanBridge.columnOf(inlineWith(e).transform {
      case a: AttributeReference =>
        if (tIds.contains(a.exprId)) UnresolvedAttribute.quoted(a.name)
        else sById.get(a.exprId) match {
          case Some(n) => UnresolvedAttribute.quoted(s"_src_$n")
          case None => throw new UnsupportedOperationException(
            s"graft SQL MERGE clause references a column from neither " +
            s"target nor source: ${a.name}")
        }
    })
  }

  /** Decorrelate an analyzed correlated subquery whose correlation is
    * a conjunction of bare `targetCol = <inner expr>` equalities in a
    * top-level Filter — the `EXISTS (SELECT ... WHERE s.k = t.k AND
    * <inner preds>)` / correlated-`IN` family. Returns the subquery
    * plan with the correlated conjuncts STRIPPED plus the
    * (targetName, innerExpr) pairs; the caller semi-joins the target
    * on those pairs — exactly the relational meaning of the EXISTS.
    * None = a correlation shape this equality-decorrelation can't
    * express (non-equi, correlated under an Aggregate, an outer ref
    * inside a computed expression) — the caller fails loudly, never
    * silently approximates.
    */
  def decorrelateEq(plan: LogicalPlan, target: Seq[Attribute])
      : Option[(LogicalPlan, Seq[NamedExpression], Seq[(String, Expression)])] = {
    import org.apache.spark.sql.catalyst.expressions.{And, OuterReference}
    val tIds = target.map(_.exprId).toSet
    def peel(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => peel(c)
      case other               => other
    }
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case x         => Seq(x)
    }
    val (projList, filt) = peel(plan) match {
      case Project(pl, f: Filter)              => (pl, Some(f))
      case Project(pl, SubqueryAlias(_, f: Filter)) => (pl, Some(f))
      case f: Filter                           => (f.output, Some(f))
      case _                                   => (Nil, None)
    }
    filt.flatMap { case Filter(cond, child) =>
      val (corr, rest) = split(cond)
        .partition(_.exists(_.isInstanceOf[OuterReference]))
      val pairs = corr.map {
        case EqualTo(OuterReference(a: AttributeReference), inner)
            if tIds.contains(a.exprId) &&
              !inner.exists(_.isInstanceOf[OuterReference]) =>
          Some(a.name -> inner)
        case EqualTo(inner, OuterReference(a: AttributeReference))
            if tIds.contains(a.exprId) &&
              !inner.exists(_.isInstanceOf[OuterReference]) =>
          Some(a.name -> inner)
        case _ => None
      }
      val names = pairs.flatten.map(_._1)
      if (corr.isEmpty || pairs.exists(_.isEmpty) ||
          names.distinct.length != names.length) None
      else {
        val inner = rest.reduceOption(And).map(Filter(_, child)).getOrElse(child)
        Some((inner, projList.toSeq, pairs.flatten))
      }
    }
  }

  /** Analyzed assignments → (target column name, re-targeted value). */
  def mergeAssigns(assigns: Seq[Assignment], target: Seq[Attribute],
      source: Seq[Attribute]): Map[String, Column] =
    assigns.map { a =>
      a.key match {
        case k: AttributeReference if target.exists(_.exprId == k.exprId) =>
          k.name -> mergeCond(a.value, target, source)
        case other => throw new UnsupportedOperationException(
          s"graft SQL MERGE assigns top-level target columns only, " +
          s"got: $other")
      }
    }.toMap
}

/** ALTER TABLE ADD CONSTRAINT ... CHECK — Spark plans this as
  * `AddCheckConstraint` (a validation scan over the target plus the
  * catalog alter), whose physical strategy expects a V2 scan relation
  * the graft splice replaces; this command runs the SAME contract
  * through the warehouse instead: `addCheckConstraint` validates every
  * existing row (one column-pruned scan) and refuses loudly with
  * examples before recording the constraint.
  */
final case class GraftAddConstraintCommand(wh: Warehouse, table: String,
    cname: String, predicateSql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    wh.addCheckConstraint(table, cname, predicateSql)
    Seq.empty
  }
}

/** DELETE FROM — a deletion-vector commit (`op=delete`). */
final case class GraftDeleteCommand(wh: Warehouse, table: String,
    condition: Column) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    wh.deleteRows(table, condition)
    Seq.empty
  }
}

/** UPDATE — one atomic rewrite+DV commit (`op=update`). */
final case class GraftUpdateCommand(wh: Warehouse, table: String,
    condition: Column, assignments: Seq[(String, Column)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    wh.updateRows(table, condition, assignments.toMap)
    Seq.empty
  }
}

/** UPDATE keyed by a subquery (`WHERE k IN (SELECT ...)`): the
  * subquery becomes the key frame of `Warehouse.updateRowsKeyed` —
  * same one-commit atomicity, hits found by semi-join instead of a
  * predicate.
  */
final case class GraftUpdateKeyedCommand(wh: Warehouse, table: String,
    @transient source: LogicalPlan, keyCols: Seq[String],
    assignments: Seq[(String, Column)]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    wh.updateRowsKeyed(table, PlanBridge.ofRows(spark, source), keyCols,
      assignments.toMap)
    Seq.empty
  }
}

/** DELETE keyed by a subquery-derived key frame (correlated `EXISTS`
  * / correlated `IN` after equality-decorrelation): the frame drives
  * `Warehouse.deleteRowsKeyed` — a DV commit (O(hits) sidecar, never
  * a rewrite), the right cost model for the selective hit sets these
  * correlated shapes express. (The uncorrelated `IN` delete keeps the
  * S9 anti-join REWRITE: its key set is unbounded, so the rewrite's
  * cost model is the right one there.)
  */
final case class GraftDeleteKeyedCommand(wh: Warehouse, table: String,
    @transient source: LogicalPlan, keyCols: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    wh.deleteRowsKeyed(table, PlanBridge.ofRows(spark, source), keyCols)
    Seq.empty
  }
}

/** MERGE (upsert shape) — `Warehouse.upsert` on the ON-clause keys. */
final case class GraftMergeUpsertCommand(wh: Warehouse, table: String,
    @transient source: LogicalPlan, keyCols: Seq[String],
    partitionCols: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    wh.upsert(table, PlanBridge.ofRows(spark, source), keyCols,
      partitionCols = partitionCols,
      assertPartitionStable = partitionCols.nonEmpty)
    Seq.empty
  }
}

/** MERGE (matched-update-only shape): source restricted to rows whose
  * keys EXIST in the target (one semi-join against the table's key
  * projection), then the keyed upsert — not-matched source rows are
  * dropped, exactly `WHEN MATCHED THEN UPDATE SET *` alone.
  */
final case class GraftMergeUpdateOnlyCommand(wh: Warehouse, table: String,
    @transient source: LogicalPlan, keyCols: Seq[String],
    partitionCols: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val src = PlanBridge.ofRows(spark, source)
    val existing = wh.read(table)
      .select(keyCols.map(org.apache.spark.sql.functions.col): _*).distinct()
    wh.upsert(table, src.join(existing, keyCols, "left_semi"), keyCols,
      partitionCols = partitionCols,
      assertPartitionStable = partitionCols.nonEmpty)
    Seq.empty
  }
}

/** MERGE (not-matched-insert-only shape): source anti-joined against
  * the target's keys, appended — `WHEN NOT MATCHED THEN INSERT *`
  * alone, the idempotent-ingest spelling (re-running the same MERGE
  * inserts nothing new).
  */
final case class GraftMergeInsertOnlyCommand(wh: Warehouse, table: String,
    @transient source: LogicalPlan, keyCols: Seq[String],
    partitionCols: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val src = PlanBridge.ofRows(spark, source)
    val existing = wh.read(table)
      .select(keyCols.map(org.apache.spark.sql.functions.col): _*).distinct()
    val fresh = src.join(existing, keyCols, "left_anti")
    if (partitionCols.nonEmpty) wh.appendEvolved(table, fresh, partitionCols)
    else wh.append(table, fresh)
    Seq.empty
  }
}

/** MERGE (general form) — [[Warehouse.mergeRows]]: conditional and
  * partial-assignment matched/not-matched actions plus `WHEN NOT
  * MATCHED BY SOURCE`, executed as ONE atomic merge-on-read commit
  * (rewritten/inserted rows in a new version dir + old positions'
  * deletion-vector entries), cost ∝ touched rows. The shapes the star
  * fast-paths above can't express land here instead of failing.
  */
final case class GraftMergeGenericCommand(wh: Warehouse, table: String,
    @transient source: LogicalPlan,
    keyPairs: Seq[(String, String)],
    matched: Seq[Warehouse.MergeClause],
    notMatched: Seq[Warehouse.MergeInsertClause],
    notMatchedBySource: Seq[Warehouse.MergeClause])
    extends LeafRunnableCommand {
  // the Delta MERGE metrics convention: one row of affected counts
  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_updated_rows",
      org.apache.spark.sql.types.LongType, nullable = false)(),
    AttributeReference("num_deleted_rows",
      org.apache.spark.sql.types.LongType, nullable = false)(),
    AttributeReference("num_inserted_rows",
      org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (u, d, i) = wh.mergeRows(table, PlanBridge.ofRows(spark, source),
      keyPairs, matched, notMatched, notMatchedBySource)
    Seq(Row(u, d, i))
  }
}

/** MERGE (delete shape) — the S9 anti-join delete on the ON keys. */
final case class GraftMergeDeleteCommand(wh: Warehouse, table: String,
    @transient source: LogicalPlan, keyCols: Seq[String])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    wh.delete(table,
      PlanBridge.ofRows(spark, source)
        .select(keyCols.map(org.apache.spark.sql.functions.col): _*)
        .distinct(), keyCols)
    Seq.empty
  }
}

final class CatalogDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import CatalogDml._

  private def fail(shape: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft SQL DML: unsupported shape — $shape")

  /** The ON clause as (targetKey, sourceKey) name pairs: a conjunction
    * of target-attr = source-attr equalities, nothing else.
    */
  private def keyPairs(on: Expression, target: Seq[Attribute],
      source: Seq[Attribute]): Seq[(String, String)] = {
    val tIds = target.map(_.exprId).toSet
    val sIds = source.map(_.exprId).toSet
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        split(l) ++ split(r)
      case x => Seq(x)
    }
    split(on).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tIds.contains(a.exprId) && sIds.contains(b.exprId) =>
        (a.name, b.name)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if tIds.contains(a.exprId) && sIds.contains(b.exprId) =>
        (a.name, b.name)
      case other => fail(s"MERGE ON must be a conjunction of " +
        s"target-column = source-column equalities, got: $other")
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a: org.apache.spark.sql.catalyst.plans.logical.AddCheckConstraint =>
      val t = a.child.collect {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
          r.table.asInstanceOf[GraftTable]
      }
      t.headOption match {
        case Some(g) =>
          val ck = a.checkConstraint
          if (ck.userProvidedCharacteristic.enforced.contains(false))
            fail("NOT ENFORCED CHECK constraints: graft enforces every " +
              "declared CHECK — drop the NOT ENFORCED clause")
          GraftAddConstraintCommand(g.wh, tableName(g),
            ck.userProvidedName, ck.condition)
        case None => a
      }
    case d @ DeleteFromTable(target, cond) if d.resolved =>
      graftTarget(target) match {
        // `DELETE FROM t WHERE k IN (<uncorrelated subquery>)` — the
        // reference's N+1 anti-join family (J5) in SQL: the subquery
        // becomes the key frame of the S9 anti-join delete (a rewrite,
        // not a DV commit — the key set is unbounded, so the rewrite's
        // cost model is the right one). Null subquery keys never match
        // the anti-join, exactly IN's null semantics for deletes.
        case Some((rel, t)) => cond match {
          case in: org.apache.spark.sql.catalyst.expressions.InSubquery
              if in.values.length == 1 &&
                in.values.head.isInstanceOf[AttributeReference] &&
                rel.output.exists(_.exprId ==
                  in.values.head.asInstanceOf[AttributeReference].exprId) &&
                in.query.outerAttrs.isEmpty =>
            val a = in.values.head.asInstanceOf[AttributeReference]
            val sub = in.query.plan
            GraftMergeDeleteCommand(t.wh, tableName(t),
              Project(Seq(org.apache.spark.sql.catalyst.expressions
                .Alias(sub.output.head, a.name)()), sub), Seq(a.name))
          // correlated EXISTS: equality-decorrelated onto the keyed
          // DV-delete (`deleteRowsKeyed`) — the semi-join on the
          // correlated pairs IS the EXISTS
          case ex: org.apache.spark.sql.catalyst.expressions.Exists
              if ex.outerAttrs.nonEmpty =>
            CatalogDml.decorrelateEq(ex.plan, rel.output) match {
              case Some((inner, _, pairs)) =>
                GraftDeleteKeyedCommand(t.wh, tableName(t),
                  Project(pairs.map { case (n, e) =>
                    org.apache.spark.sql.catalyst.expressions.Alias(e, n)()
                  }, inner), pairs.map(_._1))
              case None => fail("DELETE WHERE EXISTS: correlation must " +
                "be a conjunction of targetCol = <inner expr> equalities " +
                "in the subquery's Filter")
            }
          // correlated IN: the IN value pairs with the subquery output,
          // the correlated equalities join alongside it
          case in: org.apache.spark.sql.catalyst.expressions.InSubquery
              if in.values.length == 1 &&
                in.values.head.isInstanceOf[AttributeReference] &&
                rel.output.exists(_.exprId ==
                  in.values.head.asInstanceOf[AttributeReference].exprId) &&
                in.query.outerAttrs.nonEmpty =>
            val a = in.values.head.asInstanceOf[AttributeReference]
            CatalogDml.decorrelateEq(in.query.plan, rel.output) match {
              case Some((inner, projList, pairs))
                  if projList.nonEmpty && !pairs.exists(_._1 == a.name) =>
                val valueExpr = projList.head match {
                  case al: org.apache.spark.sql.catalyst.expressions.Alias =>
                    al.child
                  case ne => ne
                }
                GraftDeleteKeyedCommand(t.wh, tableName(t),
                  Project(org.apache.spark.sql.catalyst.expressions
                      .Alias(valueExpr, a.name)() +:
                    pairs.map { case (n, e) =>
                      org.apache.spark.sql.catalyst.expressions.Alias(e, n)()
                    }, inner), a.name +: pairs.map(_._1))
              case _ => fail("DELETE WHERE <col> IN (correlated subquery): " +
                "correlation must be a conjunction of targetCol = <inner " +
                "expr> equalities in the subquery's Filter, with key names " +
                "distinct from the IN column")
            }
          case _ =>
            GraftDeleteCommand(t.wh, tableName(t),
              CatalogDml.cond(cond, rel.output))
        }
        case None => d
      }

    case u @ UpdateTable(target, assignments, cond) if u.resolved =>
      graftTarget(target) match {
        case Some((rel, t)) =>
          val assigns = assignments.map { a =>
            a.key match {
              case k: AttributeReference
                  if rel.output.exists(_.exprId == k.exprId) =>
                k.name -> CatalogDml.cond(a.value, rel.output)
              case other => fail(s"UPDATE SET supports top-level target " +
                s"columns only, got: $other")
            }
          }
          cond match {
            // WHERE k IN (<uncorrelated subquery>): the DELETE-shape
            // key-frame route, one atomic keyed-update commit
            case Some(in: org.apache.spark.sql.catalyst.expressions.InSubquery)
                if in.values.length == 1 &&
                  in.values.head.isInstanceOf[AttributeReference] &&
                  rel.output.exists(_.exprId ==
                    in.values.head.asInstanceOf[AttributeReference].exprId) &&
                  in.query.outerAttrs.isEmpty =>
              val a = in.values.head.asInstanceOf[AttributeReference]
              val sub = in.query.plan
              GraftUpdateKeyedCommand(t.wh, tableName(t),
                Project(Seq(org.apache.spark.sql.catalyst.expressions
                  .Alias(sub.output.head, a.name)()), sub),
                Seq(a.name), assigns)
            // correlated EXISTS / IN: same equality-decorrelation as
            // DELETE, onto the one-commit keyed-update path
            case Some(ex: org.apache.spark.sql.catalyst.expressions.Exists)
                if ex.outerAttrs.nonEmpty =>
              CatalogDml.decorrelateEq(ex.plan, rel.output) match {
                case Some((inner, _, pairs)) =>
                  GraftUpdateKeyedCommand(t.wh, tableName(t),
                    Project(pairs.map { case (n, e) =>
                      org.apache.spark.sql.catalyst.expressions.Alias(e, n)()
                    }, inner), pairs.map(_._1), assigns)
                case None => fail("UPDATE WHERE EXISTS: correlation must " +
                  "be a conjunction of targetCol = <inner expr> equalities " +
                  "in the subquery's Filter")
              }
            case Some(in: org.apache.spark.sql.catalyst.expressions.InSubquery)
                if in.values.length == 1 &&
                  in.values.head.isInstanceOf[AttributeReference] &&
                  rel.output.exists(_.exprId ==
                    in.values.head.asInstanceOf[AttributeReference].exprId) &&
                  in.query.outerAttrs.nonEmpty =>
              val a = in.values.head.asInstanceOf[AttributeReference]
              CatalogDml.decorrelateEq(in.query.plan, rel.output) match {
                case Some((inner, projList, pairs))
                    if projList.nonEmpty && !pairs.exists(_._1 == a.name) =>
                  val valueExpr = projList.head match {
                    case al: org.apache.spark.sql.catalyst.expressions.Alias =>
                      al.child
                    case ne => ne
                  }
                  GraftUpdateKeyedCommand(t.wh, tableName(t),
                    Project(org.apache.spark.sql.catalyst.expressions
                        .Alias(valueExpr, a.name)() +:
                      pairs.map { case (n, e) =>
                        org.apache.spark.sql.catalyst.expressions.Alias(e, n)()
                      }, inner), a.name +: pairs.map(_._1), assigns)
                case _ => fail("UPDATE WHERE <col> IN (correlated " +
                  "subquery): correlation must be a conjunction of " +
                  "targetCol = <inner expr> equalities in the subquery's " +
                  "Filter, with key names distinct from the IN column")
              }
            case _ =>
              val c = cond.map(CatalogDml.cond(_, rel.output))
                .getOrElse(org.apache.spark.sql.functions.lit(true))
              GraftUpdateCommand(t.wh, tableName(t), c, assigns)
          }
        case None => u
      }

    case m: MergeIntoTable if m.resolved =>
      graftTarget(m.targetTable) match {
        case Some((rel, t)) =>
          val keys = keyPairs(m.mergeCondition, rel.output,
            m.sourceTable.output)
          if (keys.isEmpty) fail("MERGE ON with no key equality")
          // the general form: every clause translated for the
          // mergeRows join frame (target bare / source `_src_`-
          // prefixed), first-match-wins order preserved. Schema
          // evolution needs no handling here — the analyzer's
          // ResolveMergeIntoSchemaEvolution already ALTERed the table
          // (our metadata-only AddColumn path) and re-expanded the
          // stars against the widened schema, and mergeRows null-fills
          // prop-added columns before any write materializes them.
          def generic(): LogicalPlan = {
            def clause(a: MergeAction): Warehouse.MergeClause = a match {
              case UpdateAction(c, assigns, _) =>
                Warehouse.MergeUpdateClause(
                  c.map(CatalogDml.mergeCond(_, rel.output, m.sourceTable.output)),
                  CatalogDml.mergeAssigns(assigns, rel.output, m.sourceTable.output))
              case DeleteAction(c) =>
                Warehouse.MergeDeleteClause(
                  c.map(CatalogDml.mergeCond(_, rel.output, m.sourceTable.output)))
              case other => fail(s"MERGE action not supported: $other")
            }
            def insClause(a: MergeAction): Warehouse.MergeInsertClause = a match {
              case InsertAction(c, assigns) =>
                Warehouse.MergeInsertClause(
                  c.map(CatalogDml.mergeCond(_, rel.output, m.sourceTable.output)),
                  CatalogDml.mergeAssigns(assigns, rel.output, m.sourceTable.output))
              case other => fail(s"MERGE NOT MATCHED action not supported: $other")
            }
            GraftMergeGenericCommand(t.wh, tableName(t), m.sourceTable,
              keys, m.matchedActions.map(clause),
              m.notMatchedActions.map(insClause),
              m.notMatchedBySourceActions.map(clause))
          }
          val parts = Option(t.properties.get("partition_cols"))
            .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
          // source projected to the TARGET's column names via the ON
          // pairing for keys and name identity for the rest — the
          // upsert unions by position over the target schema
          def sourceAs(cols: Seq[String]): LogicalPlan = {
            val byTargetName = keys.toMap
            val projections = cols.map { c =>
              val srcName = byTargetName.getOrElse(c, c)
              m.sourceTable.output.find(_.name.equalsIgnoreCase(srcName)).getOrElse(
                fail(s"MERGE source has no column '$srcName' for target " +
                  s"column '$c' (star actions pair columns by name)"))
            }.zip(cols).map { case (attr, c) =>
              org.apache.spark.sql.catalyst.expressions.Alias(attr, c)()
            }
            Project(projections, m.sourceTable)
          }
          if (m.withSchemaEvolution || m.notMatchedBySourceActions.nonEmpty)
            generic()
          else (m.matchedActions, m.notMatchedActions) match {
            // the canonical upsert: UPDATE SET * + INSERT *
            case (Seq(ua: UpdateAction), Seq(ia: InsertAction))
                if ua.condition.isEmpty && ia.condition.isEmpty &&
                  starLike(ua.assignments, rel.output, m.sourceTable.output, keys) &&
                  starLike(ia.assignments, rel.output, m.sourceTable.output, keys) =>
              GraftMergeUpsertCommand(t.wh, tableName(t),
                sourceAs(rel.output.map(_.name)), keys.map(_._1), parts)
            // matched-update only: not-matched source rows dropped
            case (Seq(ua: UpdateAction), Seq())
                if ua.condition.isEmpty &&
                  starLike(ua.assignments, rel.output, m.sourceTable.output, keys) =>
              GraftMergeUpdateOnlyCommand(t.wh, tableName(t),
                sourceAs(rel.output.map(_.name)), keys.map(_._1), parts)
            // not-matched-insert only: the idempotent ingest shape
            case (Seq(), Seq(ia: InsertAction))
                if ia.condition.isEmpty &&
                  starLike(ia.assignments, rel.output, m.sourceTable.output, keys) =>
              GraftMergeInsertOnlyCommand(t.wh, tableName(t),
                sourceAs(rel.output.map(_.name)), keys.map(_._1), parts)
            // delete-matching: WHEN MATCHED THEN DELETE, nothing else
            case (Seq(da: DeleteAction), Seq()) if da.condition.isEmpty =>
              GraftMergeDeleteCommand(t.wh, tableName(t),
              {
                val byTargetName = keys.toMap
                Project(keys.map { case (tk, sk) =>
                  val attr = m.sourceTable.output.find(_.name.equalsIgnoreCase(sk))
                    .getOrElse(fail(s"MERGE source has no column '$sk'"))
                  org.apache.spark.sql.catalyst.expressions.Alias(attr, tk)()
                }, m.sourceTable)
              }, keys.map(_._1))
            // every other legal shape — conditional actions, partial
            // assignments, multiple WHEN branches — takes the general
            // merge-on-read path
            case _ => generic()
          }
        case None => m
      }
  }

  /** Star-shaped assignments: every target column assigned exactly
    * from the source attribute of the same (or ON-paired) name — the
    * aligned form the analyzer expands `UPDATE SET *` / `INSERT *`
    * into. The NAME check is load-bearing (r17 advice): `sourceAs`
    * projects the source BY NAME, so an explicit non-star assignment
    * like `SET v = s.other_v` where the source also has a column `v`
    * must NOT pass — it would silently execute as `SET *`. Key columns
    * pair through the ON clause; everything else pairs by identical
    * name. Shapes that fail this route to the generic merge path, not
    * the star fast-path.
    */
  private def starLike(assigns: Seq[Assignment], target: Seq[Attribute],
      source: Seq[Attribute], keys: Seq[(String, String)]): Boolean = {
    val sIds = source.map(_.exprId).toSet
    val srcNameFor = keys.toMap // target key name -> ON-paired source name
    assigns.forall { a =>
      (a.key, a.value) match {
        case (k: AttributeReference, v: AttributeReference) =>
          target.exists(_.exprId == k.exprId) && sIds.contains(v.exprId) &&
            v.name.equalsIgnoreCase(srcNameFor.getOrElse(k.name, k.name))
        case _ => false
      }
    }
  }

  private def tableName(t: GraftTable): String = t.bareName
}

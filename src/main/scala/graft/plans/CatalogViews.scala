package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, UpCast}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.{GraftCatalog, GraftView}

/** SQL VIEWS on the graft catalog. Spark 4.1 ships the [[org.apache
  * .spark.sql.connector.catalog.ViewCatalog]] API but wires NO
  * analyzer or DDL support to it in OSS (`ResolveSessionCatalog`
  * refuses every view statement outside the session catalog, and
  * nothing calls `loadView`) — connectors bring their own wiring, the
  * Iceberg extension-parser approach. This module is that wiring:
  *
  *  - [[GraftViewParser]] (injectParser): rewrites parsed view DDL
  *    targeting a graft catalog — CREATE [OR REPLACE] VIEW, DROP
  *    VIEW, SHOW VIEWS, ALTER VIEW SET/UNSET TBLPROPERTIES, ALTER
  *    VIEW RENAME, ALTER VIEW AS — into runnable commands against
  *    [[GraftCatalog]]'s ViewCatalog surface, BEFORE the analyzer's
  *    session-catalog refusal can fire.
  *  - [[CatalogViewReadRule]] (injectResolutionRule): expands an
  *    `UnresolvedRelation` naming a stored view into its parsed
  *    query, with (a) the authored-time catalog/namespace context
  *    re-qualified onto unqualified names in the text, (b) authored
  *    column aliases applied by name, (c) the authored schema bound
  *    via `UpCast` (SCHEMA COMPENSATION semantics: safe widenings
  *    pass, narrowings fail loudly), and (d) a cycle guard carried on
  *    a tree tag. The expansion is ordinary analysis — every graft
  *    read optimization applies to the expanded plan unchanged.
  *
  * Scope: views are addressed by an EXPLICIT ≥2-part name (`graft.ns
  * .v`, or `ns.v` when the current catalog is a graft catalog) —
  * 1-part names stay with the session's temp-view machinery.
  */
object CatalogViews {
  /** Is `name` a registered graft catalog? Conf-gated so unrelated
    * catalogs are never instantiated from the parser path.
    */
  def graftCatalog(spark: SparkSession, name: String): Option[GraftCatalog] =
    if (!spark.conf.getOption(s"spark.sql.catalog.$name")
        .exists(_.contains("GraftCatalog"))) None
    else PlanBridge.catalogOf(spark, name).collect { case g: GraftCatalog => g }

  /** Resolve a multipart name to (catalogName, catalog, ns, view):
    * 3-part explicit, or 2-part under a current graft catalog.
    */
  def target(spark: SparkSession, parts: Seq[String])
      : Option[(String, GraftCatalog, String, String)] = parts match {
    case Seq(c, ns, v) => graftCatalog(spark, c).map((c, _, ns, v))
    case Seq(ns, v) =>
      val cur = PlanBridge.currentCatalogName(spark)
      graftCatalog(spark, cur).map((cur, _, ns, v))
    case _ => None
  }

  def ident(ns: String, v: String): Identifier =
    Identifier.of(Array(ns), v)

  private[plans] val ExpansionPath =
    TreeNodeTag[Seq[String]]("graftViewExpansionPath")
}

final class GraftViewParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  import CatalogViews._

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))

  private def nameOf(child: LogicalPlan): Option[Seq[String]] = child match {
    case u: UnresolvedIdentifier  => Some(u.nameParts)
    case u: UnresolvedView        => Some(u.multipartIdentifier)
    case u: UnresolvedTableOrView => Some(u.multipartIdentifier)
    case _                        => None
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case c: CreateView =>
      nameOf(c.child).flatMap(target(spark, _)) match {
        case Some((cat, _, ns, v)) =>
          val text = c.originalText.getOrElse(
            throw new IllegalArgumentException(
              s"CREATE VIEW $cat.$ns.$v needs the view text (originalText)"))
          val mode = c.viewSchemaMode.toString
          if (mode != "BINDING" && mode != "COMPENSATION")
            throw new UnsupportedOperationException(
              s"graft views support SCHEMA BINDING/COMPENSATION only, " +
              s"got $mode")
          GraftCreateViewCommand(cat, ns, v, text,
            c.userSpecifiedColumns, c.comment, c.properties,
            c.allowExisting, c.replace)
        case None => c
      }
    case d: DropView =>
      nameOf(d.child).flatMap(target(spark, _)) match {
        case Some((cat, _, ns, v)) => GraftDropViewCommand(cat, ns, v, d.ifExists)
        case None                  => d
      }
    case s: ShowViews => s.namespace match {
      case n: UnresolvedNamespace => n.multipartIdentifier match {
        case Seq(c, ns) if graftCatalog(spark, c).isDefined =>
          GraftShowViewsCommand(c, ns, s.pattern, s.output)
        case Seq(ns)
            if graftCatalog(spark, PlanBridge.currentCatalogName(spark))
              .isDefined =>
          GraftShowViewsCommand(PlanBridge.currentCatalogName(spark), ns,
            s.pattern, s.output)
        case _ => s
      }
      case _ => s
    }
    case s: SetViewProperties =>
      nameOf(s.child).flatMap(target(spark, _)) match {
        case Some((cat, _, ns, v)) =>
          GraftAlterViewPropsCommand(cat, ns, v,
            s.properties.toSeq.map { case (k, pv) =>
              ("set", k, pv) })
        case None => s
      }
    case u: UnsetViewProperties =>
      nameOf(u.child).flatMap(target(spark, _)) match {
        case Some((cat, _, ns, v)) =>
          GraftAlterViewPropsCommand(cat, ns, v,
            u.propertyKeys.map(k => ("unset", k, "")))
        case None => u
      }
    case r: RenameTable if r.isView =>
      nameOf(r.child).flatMap(target(spark, _)) match {
        case Some((cat, _, ns, v)) =>
          val to = r.newName match {
            case Seq(c2, ns2, v2) if c2 == cat && ns2 == ns => v2
            case Seq(ns2, v2) if ns2 == ns                  => v2
            case Seq(v2)                                    => v2
            case other => throw new UnsupportedOperationException(
              s"graft RENAME VIEW stays within one namespace, " +
              s"got ${other.mkString(".")}")
          }
          GraftRenameViewCommand(cat, ns, v, to)
        case None => r
      }
    case a: AlterViewAs =>
      nameOf(a.child).flatMap(target(spark, _)) match {
        case Some((cat, _, ns, v)) =>
          GraftAlterViewAsCommand(cat, ns, v, a.originalText)
        case None => a
      }
    case other => other
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** CREATE [OR REPLACE] VIEW — analyzes the view text once (schema +
  * output names are authored-time metadata the reads bind against),
  * then stores the definition through the ViewCatalog surface.
  */
final case class GraftCreateViewCommand(catalogName: String, ns: String,
    view: String, text: String,
    userSpecifiedColumns: Seq[(String, Option[String])],
    comment: Option[String], props: Map[String, String],
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = CatalogViews.graftCatalog(spark, catalogName).get
    val id = CatalogViews.ident(ns, view)
    if (cat.viewExists(id)) {
      if (replace) cat.dropView(id)
      else if (allowExisting) return Seq.empty
      else throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(id)
    }
    val analyzed = PlanBridge.ofRows(spark,
      spark.sessionState.sqlParser.parseQuery(text))
    val queryCols = analyzed.schema.fieldNames
    val aliases: Array[String] =
      if (userSpecifiedColumns.isEmpty) Array.empty
      else {
        require(userSpecifiedColumns.length == queryCols.length,
          s"CREATE VIEW $view: ${userSpecifiedColumns.length} column " +
          s"aliases for ${queryCols.length} query columns")
        userSpecifiedColumns.map(_._1).toArray
      }
    val schema = StructType(analyzed.schema.fields.zipWithIndex.map {
      case (f, i) => if (aliases.isEmpty) f else f.copy(name = aliases(i))
    })
    val comments: Array[String] =
      if (userSpecifiedColumns.isEmpty) Array.empty
      else userSpecifiedColumns.map(_._2.orNull).toArray
    val allProps = props ++ comment.map("comment" -> _)
    cat.createView(new ViewInfo(id, text, catalogName, Array(ns), schema,
      queryCols, aliases, comments,
      scala.jdk.CollectionConverters.MapHasAsJava(allProps).asJava))
    Seq.empty
  }
}

final case class GraftDropViewCommand(catalogName: String, ns: String,
    view: String, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = CatalogViews.graftCatalog(spark, catalogName).get
    val existed = cat.dropView(CatalogViews.ident(ns, view))
    if (!existed && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        CatalogViews.ident(ns, view))
    Seq.empty
  }
}

final case class GraftShowViewsCommand(catalogName: String, ns: String,
    pattern: Option[String], override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = CatalogViews.graftCatalog(spark, catalogName).get
    val re = pattern.map(p =>
      java.util.regex.Pattern.compile(p.replace("*", ".*"),
        java.util.regex.Pattern.CASE_INSENSITIVE))
    cat.listViews(ns).toSeq
      .filter(i => re.forall(_.matcher(i.name).matches()))
      .map(i => Row(ns, i.name, false))
  }
}

final case class GraftAlterViewPropsCommand(catalogName: String, ns: String,
    view: String, changes: Seq[(String, String, String)])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = CatalogViews.graftCatalog(spark, catalogName).get
    cat.alterView(CatalogViews.ident(ns, view), changes.map {
      case ("set", k, v)   => ViewChange.setProperty(k, v)
      case ("unset", k, _) => ViewChange.removeProperty(k)
      case other => throw new IllegalStateException(s"bad change $other")
    }: _*)
    Seq.empty
  }
}

final case class GraftRenameViewCommand(catalogName: String, ns: String,
    from: String, to: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = CatalogViews.graftCatalog(spark, catalogName).get
    cat.renameView(CatalogViews.ident(ns, from), CatalogViews.ident(ns, to))
    Seq.empty
  }
}

/** ALTER VIEW ... AS — replace the definition, keeping properties. */
final case class GraftAlterViewAsCommand(catalogName: String, ns: String,
    view: String, text: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val cat = CatalogViews.graftCatalog(spark, catalogName).get
    val id = CatalogViews.ident(ns, view)
    val old = cat.loadView(id).asInstanceOf[GraftView]
    cat.dropView(id)
    try {
      GraftCreateViewCommand(catalogName, ns, view, text, Nil, None,
        old.props, allowExisting = false, replace = false).run(spark)
    } catch { case e: Throwable =>
      // restore the old definition: ALTER must not half-drop
      cat.createView(new ViewInfo(id, old.sql, old.cat, old.ns,
        old.viewSchema, old.queryCols, old.aliases, old.comments,
        scala.jdk.CollectionConverters.MapHasAsJava(old.props).asJava))
      throw e
    }
    Seq.empty
  }
}

/** Post-hoc view expansion — see [[CatalogViews]]. A stored view
  * resolves (via GraftCatalog.loadTable) to a marker
  * [[graft.sources.GraftViewTable]]; this rule replaces that relation
  * with the view's parsed, context-qualified, alias-applied,
  * schema-bound definition — fully analyzed by a NESTED analysis
  * pass (the CatalogReadRule splice mechanism), so inner graft
  * tables, nested views, and every read optimization compose. Output
  * attributes are re-aliased onto the marker relation's exprIds so
  * references above stay bound.
  */
final class CatalogViewReadRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import CatalogViews._

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
        if r.table.isInstanceOf[graft.sources.GraftViewTable] =>
      val vt = r.table.asInstanceOf[graft.sources.GraftViewTable]
      val inner = expand(vt)
      Project(r.output.zip(inner.output).map { case (o, n) =>
        Alias(n, o.name)(exprId = o.exprId)
      }, inner)
  }

  private def expand(vt: graft.sources.GraftViewTable): LogicalPlan = {
    val view = vt.view
    val key = vt.name()
    val path = CatalogViewReadRule.expansionStack.get()
    if (path.contains(key))
      throw new IllegalStateException(
        s"view cycle: ${(path :+ key).mkString(" -> ")}")
    val parsed = spark.sessionState.sqlParser.parseQuery(view.sql)
    // re-qualify unqualified names with the authored-time context so
    // `FROM orders` inside the text keeps meaning the same table
    // wherever the view is read from
    val viewCat = Option(view.cat).filter(_.nonEmpty)
      .getOrElse(vt.catalogName)
    val viewNs = Option(view.ns).filter(_.nonEmpty).map(_.toSeq)
      .getOrElse(vt.ident.namespace.toSeq)
    val qualified = parsed.transformDown {
      case u: UnresolvedRelation => u.multipartIdentifier match {
        case Seq(one)     => UnresolvedRelation(viewCat +: viewNs :+ one,
          u.options, u.isStreaming)
        case Seq(n2, one) => UnresolvedRelation(Seq(viewCat, n2, one),
          u.options, u.isStreaming)
        case _            => u
      }
    }
    val withAliases =
      if (view.aliases.nonEmpty && !view.aliases.sameElements(view.queryCols))
        Project(view.queryCols.zip(view.aliases).map { case (q, a) =>
          Alias(UnresolvedAttribute.quoted(q), a)()
        }.toSeq, qualified)
      else qualified
    // SCHEMA COMPENSATION: bind the authored schema by name; UpCast
    // lets safe widenings through and fails loudly on a narrowing or
    // a dropped column — a view never silently changes shape
    val bound = Project(view.viewSchema.fields.map(f =>
      Alias(UpCast(UnresolvedAttribute.quoted(f.name), f.dataType),
        f.name)()).toSeq, withAliases)
    // nested FULL analysis (resolution + post-hoc splices, this rule
    // included — recursion is how nested views expand), scoped by the
    // cycle stack
    CatalogViewReadRule.expansionStack.set(path :+ key)
    try PlanBridge.ofRows(spark,
      SubqueryAlias(key, bound)).queryExecution.analyzed
    finally CatalogViewReadRule.expansionStack.set(path)
  }
}

object CatalogViewReadRule {
  private[plans] val expansionStack = new ThreadLocal[Seq[String]] {
    override def initialValue(): Seq[String] = Nil
  }
}

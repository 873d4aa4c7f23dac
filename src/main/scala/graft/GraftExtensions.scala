package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension injecting the engine's native Catalyst functions
  * at session construction — the Spark-provided extension point for
  * exactly this:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * makes `graft_rolling_hash`, `graft_rolling_hash2`, `graft_vec_dot`
  * and `graft_shingles3` available to a PURE-SQL user (spark-sql,
  * Thrift server, notebook SQL cells) with no Scala call anywhere —
  * plus the `graft_changes(root, table, fromV, toV)` TABLE function,
  * the change feed's SQL surface (see `graft.sources.ChangesTvf`).
  * The lazy `NativeExprs.register` / `ChangesTvf.register` paths
  * remain for sessions built without the config — each reads the same
  * builder as its injection, so the two paths cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.NativeExprs.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
    ext.injectTableFunction((FunctionIdentifier(graft.sources.ChangesTvf.name),
      graft.sources.ChangesTvf.info, graft.sources.ChangesTvf.builder))
    ext.injectTableFunction((FunctionIdentifier(graft.sources.TableTvf.name),
      graft.sources.TableTvf.info, graft.sources.TableTvf.builder))
    ext.injectTableFunction((FunctionIdentifier(graft.sources.StatsTvf.name),
      graft.sources.StatsTvf.info, graft.sources.StatsTvf.builder))
    ext.injectTableFunction((FunctionIdentifier(graft.sources.HistoryTvf.name),
      graft.sources.HistoryTvf.info, graft.sources.HistoryTvf.builder))
    // automatic data skipping: Filter-over-manifest-scan plans prune
    // files by footer stats / blooms (graft.plans.AutoSkip). The lazy
    // twin is AutoSkip.install, run by every manifest Warehouse
    // constructor — same rule instance semantics, so the paths can't
    // drift.
    ext.injectOptimizerRule(_ => new graft.plans.MetaAggRule)
    ext.injectOptimizerRule(_ => new graft.plans.AutoSkipRule)
    ext.injectOptimizerRule(_ => new graft.plans.JoinSkipRule)
    // catalog reads (spark.sql.catalog.<name>=graft.sources.GraftCatalog)
    // splice the warehouse's V1 read plan over the resolved V2 relation
    // at analysis — the catalog half of the Delta-style pairing. No
    // lazy twin: catalog SQL requires this extension, exactly like
    // Delta's session extension requirement.
    ext.injectPostHocResolutionRule(s => new graft.plans.CatalogReadRule(s))
    // SQL DML (DELETE/UPDATE/MERGE on catalog tables) onto the
    // warehouse's row-level commit paths — must run AFTER the read
    // rule (same batch, registration order), which leaves DML targets
    // un-spliced for exactly this rule to consume.
    ext.injectPostHocResolutionRule(s => new graft.plans.CatalogDmlRule(s))
    // streaming reads through catalog names (readStream.table) splice
    // to the graft-changes V1 source filtered to insert rows
    ext.injectPostHocResolutionRule(s => new graft.plans.CatalogStreamRule(s))
    // SQL views on the graft catalog: OSS Spark ships the ViewCatalog
    // API with no analyzer/DDL wiring — the parser rewrite routes view
    // DDL onto GraftCatalog's ViewCatalog surface before the session-
    // catalog refusal can fire, and the resolution rule expands stored
    // views at read (see plans/CatalogViews.scala)
    ext.injectParser((s, delegate) => new graft.plans.GraftViewParser(s, delegate))
    ext.injectResolutionRule(s => new graft.plans.CatalogViewReadRule(s))
  }
}

package graft.plans

import java.util.{Collections, WeakHashMap => JWeakHashMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Join-driven automatic file skipping — the dynamic-partition-pruning
  * analogue for the warehouse's footer-stat/bloom file pruning.
  *
  * The star shape the reference runs hottest (fact filtered through a
  * dimension — `financial_data JOIN financial_items ... WHERE
  * element_id IN (...)`, financial_data_repository.py:21-33) carries
  * no literal predicate on the fact side, so [[AutoSkipRule]] has
  * nothing to extract: the filter lives on the dim. This rule closes
  * that gap. When an Inner/LeftSemi equi-join's one side is a
  * registered manifest scan and the OTHER side is broadcast-small (by
  * the optimizer's own size estimate against
  * `autoBroadcastJoinThreshold` — the same signal that will broadcast
  * it anyway), it EXECUTES that side's key projection (bounded:
  * distinct, capped at [[JoinSkip.maxKeys]]), feeds the collected keys
  * to the warehouse's existing equality prune (chunk headers → footer
  * stats → per-column blooms) as an `InPred`, and swaps the fact
  * relation's index for the pruned view — exactly what a caller
  * hand-wiring `readEquals`/the bloom-semi path gets, now automatic.
  *
  * Cost/safety rails, each load-bearing:
  *  - the join node itself always stays — pruning is a fast path, the
  *    join is the row-level truth (same residual discipline as the
  *    Filter in AutoSkipRule);
  *  - the dim side must be estimated under the broadcast threshold,
  *    must not be streaming, and its collected DISTINCT key count is
  *    capped: one over the cap abandons (memoized, so the probe runs
  *    once per dim plan instance, not once per fixpoint iteration);
  *  - the fact scan must be registered (manifest read) and span
  *    enough files ([[JoinSkip.minFiles]]) for pruning to matter —
  *    commit-internal joins over small tables skip the machinery;
  *  - null keys are dropped from the probe set (an equi-join never
  *    matches null); a dim that yields ZERO keys prunes the fact to
  *    zero files — the join output is provably empty;
  *  - re-entrancy is depth-guarded: executing the dim side re-enters
  *    the optimizer, where this rule may fire again one level down
  *    but never deeper.
  *
  * At 100 TB this is the difference between a dashboard's star join
  * reading the whole fact table and reading the handful of files the
  * dimension's keys can live in.
  */
object JoinSkip {
  /** Abandon pruning when the dim yields more distinct keys: the
    * per-value prune probes (and the IN-list the residual join
    * semantically is) stop paying past this.
    */
  val maxKeys = 128

  /** Don't bother pruning scans smaller than this many files. */
  val minFiles = 8

  // dim-plan instance → collected external key values (None = probed
  // and abandoned: over cap, un-collectible type, execution failure).
  // Weak keys: the plan dies with its query; identity reuse across
  // fixpoint iterations is exactly the reuse we want, and structural
  // equality cannot alias different snapshots (each read's relation
  // holds its own FileIndex instance).
  private val keyCache =
    Collections.synchronizedMap(new JWeakHashMap[LogicalPlan, Option[Seq[Any]]]())

  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** Collect the dim side's distinct, non-null join keys as prune
    * values (litValue-normalized externals), or None when the probe
    * abandons. Executes a bounded side query — guarded by the caller.
    */
  private[plans] def dimKeys(spark: SparkSession, dim: LogicalPlan,
      key: Attribute): Option[Seq[Any]] = {
    val cached = keyCache.get(dim)
    if (cached != null) return cached
    val r: Option[Seq[Any]] =
      try {
        // project by ATTRIBUTE (exprId), not name — dim outputs can
        // carry duplicate names through self-joins
        val df = org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
          Project(Seq(key), dim))
        val rows = df.distinct().limit(maxKeys + 1).collect()
        if (rows.length > maxKeys) None
        else {
          val vals = rows.toSeq.filterNot(_.isNullAt(0)).map { row =>
            AutoSkip.litValue(Literal(row.get(0))) match {
              case Some(v) => v
              case None    => return cache(dim, None)
            }
          }
          Some(vals)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    cache(dim, r)
  }

  private def cache(dim: LogicalPlan, v: Option[Seq[Any]]): Option[Seq[Any]] = {
    keyCache.put(dim, v)
    v
  }

  /** The single LogicalRelation under Project/Filter wrappers — and
    * under a LeftAnti join's LEFT side (the merge-on-read deletion-
    * vector shape). Descending the anti-join is sound for this rule's
    * use: it prunes files whose key range can't contain any dim key,
    * and those rows produce no output through the parent Inner/
    * LeftSemi join regardless of what the anti-join would have
    * subtracted.
    */
  private[plans] def scanUnder(p: LogicalPlan): Option[LogicalRelation] =
    p match {
      case lr: LogicalRelation => Some(lr)
      case Project(_, child)   => scanUnder(child)
      case Filter(_, child)    => scanUnder(child)
      case Join(l, _, org.apache.spark.sql.catalyst.plans.LeftAnti, _, _) =>
        scanUnder(l)
      case _                   => None
    }

  private[plans] def withDepth[T](f: => Option[T]): Option[T] = {
    if (depth.get >= 2) return None
    depth.set(depth.get + 1)
    try f finally depth.set(depth.get - 1)
  }
}

final class JoinSkipRule extends Rule[LogicalPlan] {
  import JoinSkip._

  private def enabled: Boolean =
    conf.getConfString("spark.graft.joinSkip.enabled", "true") == "true"

  /** Try to prune `fact`'s scan from `dim`'s keys; None = no change. */
  private def pruneSide(fact: LogicalPlan, dim: LogicalPlan,
      cond: Seq[Expression]): Option[LogicalPlan] = {
    val lr = scanUnder(fact).getOrElse(return None)
    val hfs = lr.relation match {
      case h: HadoopFsRelation => h
      case _                   => return None
    }
    val loc = hfs.location
    val base = loc match {
      case p: PrunedFileIndex => p.orig
      case o                  => o
    }
    val hook = AutoSkip.lookup(base).getOrElse(return None)
    if (base.rootPaths.size < minFiles) return None
    if (dim.isStreaming) return None
    // a non-deterministic dim (rand() sampling, a UDF with state)
    // could collect one key set at plan time and produce another at
    // execution — pruning on it would be wrong, not just slow
    if (dim.exists(_.expressions.exists(!_.deterministic))) return None
    val thr = conf.autoBroadcastJoinThreshold
    if (thr <= 0 || dim.stats.sizeInBytes > thr) return None
    // one equi-pair whose fact side is the relation's own attribute
    val pair = cond.collectFirst {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if lr.output.exists(_.exprId == a.exprId) &&
            dim.output.exists(_.exprId == b.exprId) => (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if lr.output.exists(_.exprId == a.exprId) &&
            dim.output.exists(_.exprId == b.exprId) => (a, b)
    }.getOrElse(return None)
    val (factKey, dimKey) = pair
    withDepth {
      dimKeys(SparkSession.active, dim, dimKey)
    }.flatMap { keys =>
      val fp = "join:" + factKey.name + ":" +
        AutoSkip.fingerprint(Seq(AutoSkip.InPred(factKey.name, keys)))
      loc match {
        case p: PrunedFileIndex if p.fps(fp) => None // converged
        case _ =>
          val keptAbs: Set[String] =
            if (keys.isEmpty) Set.empty // empty dim ⇒ provably empty join
            else AutoSkip.prunedSet(hook,
              Seq(AutoSkip.InPred(factKey.name, keys))).getOrElse(return None)
          val keep = AutoSkip.normFiles(loc).iterator
            .filter(keptAbs.contains).toSet
          val prior = loc match {
            case p: PrunedFileIndex => p.fps
            case _                  => Set.empty[String]
          }
          val idx = new PrunedFileIndex(base, keep, prior + fp)
          val nrel = hfs.copy(location = idx)(hfs.sparkSession)
          Some(fact.transformUp {
            case l: LogicalRelation if l eq lr => l.copy(relation = nrel)
          })
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, jt, Some(cond), hint)
          if jt == Inner || jt == LeftSemi =>
        val conjs = splitConjunctivePredicates(cond)
        pruneSide(left, right, conjs) match {
          case Some(nl) => Join(nl, right, jt, Some(cond), hint)
          case None if jt == Inner =>
            pruneSide(right, left, conjs) match {
              case Some(nr) => Join(left, nr, jt, Some(cond), hint)
              case None     => j
            }
          case None => j
        }
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] =
    e match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case x         => Seq(x)
    }
}

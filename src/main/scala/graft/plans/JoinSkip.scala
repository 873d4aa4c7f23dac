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
  *    must not be streaming, must be ANALYSIS-PINNED (every leaf a
  *    LocalRelation/Range/HadoopFsRelation whose listing was captured
  *    at analysis — a mutable relation's keys could drift between
  *    plan and execution, and pruning on stale keys would be wrong
  *    results), and its collected DISTINCT key count is capped: over
  *    the cap the probe degrades to the keys' [min, max] as a range
  *    predicate (one extra bounded agg) — a range-clustered fact
  *    still prunes under a 10k-key dim. All outcomes are memoized per
  *    dim plan instance, not per fixpoint iteration;
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
  /** Key-list cap: past this many distinct dim keys the per-value
    * prune probes (and the IN-list the residual join semantically is)
    * stop paying — the probe FALLS BACK to the keys' [min, max] as a
    * range predicate (one extra bounded agg), which still prunes a
    * range-clustered fact under a 10k-key dim.
    */
  val maxKeys = 128

  /** Don't bother pruning scans smaller than this many files. */
  val minFiles = 8

  /** Probe outcome for one dim plan instance. */
  private[plans] sealed trait Probe
  /** ≤ maxKeys distinct non-null keys, litValue-normalized. */
  private[plans] final case class Keys(vals: Seq[Any]) extends Probe
  /** Over-cap dim: the keys' inclusive [min, max] instead. */
  private[plans] final case class KeyRange(lo: Any, hi: Any) extends Probe
  /** Probed and abandoned (un-collectible type, execution failure). */
  private[plans] case object Abandoned extends Probe

  // dim-plan instance → (key exprId → probe outcome): one dim may be
  // probed on several join keys (composite-key stars). Weak keys: the
  // plan dies with its query; identity reuse across fixpoint
  // iterations is exactly the reuse we want, and structural equality
  // cannot alias different snapshots (each read's relation holds its
  // own FileIndex instance).
  private val keyCache = Collections.synchronizedMap(
    new JWeakHashMap[LogicalPlan, scala.collection.concurrent.TrieMap[Long, Probe]]())

  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** Probe the dim side: its distinct non-null join keys when they fit
    * the cap, else their [min, max] range. Executes one (or, over-cap,
    * two) bounded side queries — guarded by the caller.
    */
  private[plans] def dimProbe(spark: SparkSession, dim: LogicalPlan,
      key: Attribute): Probe = {
    val perKey = {
      val m = keyCache.get(dim)
      if (m != null) m
      else {
        val fresh = scala.collection.concurrent.TrieMap[Long, Probe]()
        keyCache.put(dim, fresh)
        fresh
      }
    }
    val hit = perKey.get(key.exprId.id)
    if (hit.isDefined) return hit.get
    val r: Probe =
      try {
        // project by ATTRIBUTE (exprId), not name — dim outputs can
        // carry duplicate names through self-joins; aliased to a fixed
        // name so the fallback agg below needs no name-parsing
        val df = org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
          Project(Seq(Alias(key, "__graft_jk")(exprId = key.exprId)), dim))
        val rows = df.distinct().limit(maxKeys + 1).collect()
        if (rows.length > maxKeys) {
          // range fallback: min/max over the SAME bounded side (the
          // broadcast-threshold guard already bounded its size)
          import org.apache.spark.sql.functions.{max => fmax, min => fmin}
          val mm = df.agg(fmin(df("__graft_jk")), fmax(df("__graft_jk"))).head()
          if (mm.isNullAt(0) || mm.isNullAt(1)) Keys(Nil) // all-null keys
          else (AutoSkip.litValue(Literal(mm.get(0))),
              AutoSkip.litValue(Literal(mm.get(1)))) match {
            case (Some(lo), Some(hi)) => KeyRange(lo, hi)
            case _                    => Abandoned
          }
        } else {
          val vals = rows.toSeq.filterNot(_.isNullAt(0)).map { row =>
            AutoSkip.litValue(Literal(row.get(0))) match {
              case Some(v) => v
              case None    => return cache(dim, key, Abandoned)
            }
          }
          Keys(vals)
        }
      } catch { case scala.util.control.NonFatal(_) => Abandoned }
    cache(dim, key, r)
  }

  private def cache(dim: LogicalPlan, key: Attribute, v: Probe): Probe = {
    val m = keyCache.get(dim)
    if (m != null) m.put(key.exprId.id, v)
    v
  }

  /** The dim side is safe to EXECUTE AT PLAN TIME only when its key
    * set cannot drift between planning and execution: every leaf must
    * be an analysis-pinned relation — in-memory rows, a Range, or a
    * file scan whose listing was captured at analysis
    * (HadoopFsRelation). A mutable DSv2/JDBC-style relation re-reads
    * its source at execution: keys collected now could miss rows that
    * exist then, and pruning on them would drop MATCHING fact files —
    * wrong results, not just a slow plan. (Same reasoning as the
    * non-deterministic-expression guard in the caller.)
    */
  private[plans] def pinnedDim(p: LogicalPlan): Boolean =
    p.collectLeaves().forall {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _: org.apache.spark.sql.catalyst.plans.logical.OneRowRelation => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Range => true
      case lr: LogicalRelation => lr.relation.isInstanceOf[HadoopFsRelation]
      case _ => false
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
    // plan-time execution demands an analysis-pinned dim: a mutable
    // relation's keys could differ at execution time (see pinnedDim)
    if (!pinnedDim(dim)) return None
    val thr = conf.autoBroadcastJoinThreshold
    if (thr <= 0 || dim.stats.sizeInBytes > thr) return None
    // every equi-pair whose fact side is the relation's own attribute;
    // a composite-key star contributes one prunable predicate per pair
    // (conjunction — a file must admit EVERY join key's value set).
    // Probe cost is bounded: ≤2 pairs probed, each ≤2 small dim jobs.
    val pairs = cond.collect {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if lr.output.exists(_.exprId == a.exprId) &&
            dim.output.exists(_.exprId == b.exprId) => (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if lr.output.exists(_.exprId == a.exprId) &&
            dim.output.exists(_.exprId == b.exprId) => (a, b)
    }.take(2)
    if (pairs.isEmpty) return None
    withDepth {
      val probes = pairs.map { case (factKey, dimKey) =>
        factKey -> dimProbe(SparkSession.active, dim, dimKey)
      }.filterNot(_._2 == Abandoned)
      if (probes.isEmpty) None else Some(probes)
    }.flatMap { probes =>
      val emptyJoin = probes.exists {
        case (_, Keys(keys)) => keys.isEmpty // any empty key set ⇒ no matches
        case _               => false
      }
      val preds = probes.map {
        case (factKey, Keys(keys))       => AutoSkip.InPred(factKey.name, keys)
        case (factKey, KeyRange(lo, hi)) =>
          AutoSkip.RangePred(factKey.name, Some(lo), Some(hi))
        case (_, Abandoned)              => return None
      }
      val fp = "join:" + preds.map(_.column).mkString(",") + ":" +
        AutoSkip.fingerprint(preds)
      loc match {
        case p: PrunedFileIndex if p.fps(fp) => None // converged
        case _ =>
          val keptAbs: Set[String] =
            if (emptyJoin) Set.empty // empty dim ⇒ provably empty join
            else AutoSkip.prunedSet(hook, preds).getOrElse(return None)
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

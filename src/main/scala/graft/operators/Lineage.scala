package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Storage bookkeeping for iterative lineage-truncation loops
  * (ConnectedComponents, PageRank). `Dataset.localCheckpoint` persists
  * the materialized rows OUTSIDE the CacheManager, so
  * `Dataset.unpersist` on the returned frame frees nothing — each
  * round's MEMORY_AND_DISK blocks would linger until the ContextCleaner
  * happens to GC the RDD, accumulating executor storage over a
  * long-diameter run (the regression an explicit persist/unpersist
  * discipline avoids). The fix: hold the checkpointed Dataset's
  * underlying RDD and `unpersist` IT when the round is replaced.
  */
private[operators] object Lineage {

  /** The RDD an eager `localCheckpoint` persisted: the returned
    * Dataset's plan is exactly `LogicalRDD(checkpointedRdd)`. Returns
    * None if Spark's plan shape ever changes — callers then fall back
    * to ContextCleaner GC (slow, never wrong).
    */
  def ckptRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _                                            => None
    }

  /** Free a replaced round's checkpoint blocks (non-blocking). Safe
    * only once every consumer of the round has been EAGERLY
    * materialized — an unpersisted local checkpoint cannot be
    * recomputed (its lineage is gone).
    */
  def free(prev: Option[RDD[_]]): Unit =
    prev.foreach(_.unpersist(blocking = false))
}

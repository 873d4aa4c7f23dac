package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Count + size-capped value list in ONE aggregation pass — the
  * bounded-buffer primitive behind the n-gram-Jaccard stop-shingle cap
  * (queries.Dedup d2): group the exploded (shingle → doc) stream by
  * shingle, keep the exact group count AND at most `cap`+1 docs.
  *
  * Each collected value is a (doc_id, payload) pair; d2 rides the
  * document's distinct-shingle count in the payload so the Jaccard
  * denominator never needs a join back to a second corpus scan (the
  * size join re-evaluated the scan + shingle expression once per side).
  *
  * Why not collect_list + filter: collect_list's buffer is unbounded,
  * so a boilerplate shingle appearing in 10⁶ documents materializes a
  * 10⁶-element buffer (map-side AND reduce-side) only for the df-cap
  * filter to discard the group. Here the buffer stops growing at
  * cap+1 elements — enough to prove the group exceeds the cap — while
  * the count stays exact, so hot keys cost O(cap) memory however
  * skewed the stream. Partial aggregation (merge) is cap-respecting
  * concat + count sum, so map-side combine applies.
  *
  * Truncation never loses data for SURVIVING groups: only groups with
  * count > cap are ever truncated, and the caller drops exactly those.
  */
class CappedDocListAgg(cap: Int)
    extends Aggregator[(Long, Long), (Long, List[(Long, Long)]), (Long, Seq[(Long, Long)])] {

  override def zero: (Long, List[(Long, Long)]) = (0L, Nil)

  override def reduce(b: (Long, List[(Long, Long)]), x: (Long, Long)): (Long, List[(Long, Long)]) =
    // b._1 == list length while below the cap, so no O(n) size() call
    if (b._1 <= cap) (b._1 + 1, x :: b._2) else (b._1 + 1, b._2)

  override def merge(a: (Long, List[(Long, Long)]), b: (Long, List[(Long, Long)])): (Long, List[(Long, Long)]) = {
    val docs =
      if (a._2.lengthCompare(cap + 1) >= 0) a._2
      else (a._2 ++ b._2).take(cap + 1)
    (a._1 + b._1, docs)
  }

  override def finish(b: (Long, List[(Long, Long)])): (Long, Seq[(Long, Long)]) = (b._1, b._2)

  override def bufferEncoder: Encoder[(Long, List[(Long, Long)])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, List[(Long, Long)])]()
  override def outputEncoder: Encoder[(Long, Seq[(Long, Long)])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[(Long, Long)])]()
}

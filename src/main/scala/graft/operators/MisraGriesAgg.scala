package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitter sketch (Misra & Gries 1982;
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012):
  * a bounded map of ≤ k counters whose final key set is a GUARANTEED
  * superset of every item with true frequency > N/(k+1) — the
  * candidate pass of scalable exact heavy-hitters (x32), where the
  * full-vocabulary shuffle of the naive groupBy is replaced by one
  * k-sized summary per partition merged on the driver side of the
  * partial agg.
  *
  * Eviction is batched (Demaine et al. 2002 style): the buffer grows
  * to 2k, then one compress subtracts the (k+1)-th largest stored
  * count from every entry and drops the non-positives. Each compress
  * subtracts δ from ≥ k+1 entries' true mass, so the total undercount
  * is ≤ N/(k+1) — the classic MG bound — at O(k log k) per ≥ k
  * insertions (amortized O(log k) per row) instead of O(k) per miss.
  * merge() is union-sum followed by the same compress, which is
  * exactly the PODS-2012 mergeable-summary operation and preserves
  * the bound under arbitrary merge trees (Spark's partial-agg tree).
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  private def compress(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      // (k+1)-th largest stored count; subtracting it zeroes at least
      // size-k entries, so the result has ≤ k keys
      val cut = m.values.toArray.sortWith(_ > _).apply(k)
      m.collect { case (t, c) if c - cut > 0 => t -> (c - cut) }
    }

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], t: String): Map[String, Long] = {
    val u = m.updated(t, m.getOrElse(t, 0L) + 1L)
    if (u.size > 2 * k) compress(u) else u
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    compress(b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    })

  // deterministic candidate order (the driver collects this bounded
  // list); counts are NOT emitted — they are MG lower bounds, not
  // exact, and must never reach a hash-compared surface
  override def finish(m: Map[String, Long]): Seq[String] =
    compress(m).keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

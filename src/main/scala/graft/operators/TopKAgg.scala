package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-buffer per-group top-k by (score DESC, id ASC) — the
  * scale-correct replacement for `row_number().over(partitionBy(g)
  * .orderBy(score.desc, id))` + `filter(rank <= k)`: the window shape
  * sort-shuffles EVERY scored row into its group's partition (at a
  * 10⁹-row corpus, millions of rows per query sorted to keep 10),
  * while this aggregator keeps a k-element sorted buffer per group
  * with map-side combine, so exactly k rows per group cross the
  * shuffle. Output order IS rank order; ties break to the smaller id,
  * identical to the window's (score DESC, id ASC).
  *
  * The buffer is an insertion-sorted List capped at k — O(k) per row
  * with k ≤ ~100; for larger k a bounded heap would replace it.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  // java.lang.Double.compare, not >: a NaN score (e.g. a zero-norm
  // embedding's 0/0 cosine) must rank as LARGEST, matching how the
  // replaced row_number window (and DuckDB) order doubles — with raw
  // >, a NaN at the buffer tail made !better(x, b.last) true for every
  // candidate and silently froze the buffer at the first k rows seen
  private def better(p: (Double, Long), q: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(p._1, q._1)
    c > 0 || (c == 0 && p._2 < q._2)
  }

  private def insert(b: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    // not in the top k: common case at high row counts, O(1) reject
    if (b.lengthCompare(k) >= 0 && !better(x, b.last)) b
    else {
      val (above, below) = b.span(better(_, x))
      (above ::: x :: below).take(k)
    }

  override def zero: List[(Double, Long)] = Nil
  override def reduce(b: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    insert(b, x)
  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  /** `scored(q_id, <scoreCol>, vec_id)` → `(q_id, rank, vec_id,
    * <scoreCol>)` with rank 1..k per q_id by (score DESC, vec_id ASC)
    * — row-identical to the row_number window form, k shuffled rows
    * per group instead of all of them. The aggregator's buffer is
    * already in rank order, so rank = position in the exploded list.
    */
  def rank(scored: DataFrame, k: Int, scoreCol: String): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    val topk = udaf(new TopKAgg(k))
    scored.groupBy($"q_id").agg(topk(col(scoreCol), $"vec_id").as("top"))
      .select($"q_id", posexplode($"top"))
      .select($"q_id", ($"pos" + 1).cast("long").as("rank"),
        $"col._2".as("vec_id"), $"col._1".as(scoreCol))
  }
}

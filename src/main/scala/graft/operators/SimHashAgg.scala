package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed SimHash aggregator: folds 60-bit token hashes into the
  * per-bit majority buffer in one pass. Replaces the 60-column
  * SUM(CASE WHEN shiftright(h,j)&1 ...) formulation — same math, but
  * one fixed-width Array[Int] aggregation buffer per document instead
  * of a 60-wide aggregate schema and a giant codegen'd project.
  * Partial aggregation is elementwise add, so map-side combine applies
  * and the shuffle carries `bits` ints per group regardless of
  * document length (the MinHashAgg sketch shape; cf. Charikar's
  * SimHash, STOC 2002).
  *
  * Bit j of the result is 1 iff the running sum of (+1 if bit j of the
  * token hash is set, else -1) is >= 0 — identical to the DuckDB
  * oracle's range(60)-join formulation, tie (sum == 0) ⇒ 1.
  */
class SimHashAgg(bits: Int) extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](bits)

  override def reduce(buf: Array[Int], h: Long): Array[Int] = {
    var j = 0
    while (j < bits) {
      if (((h >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
      j += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < bits) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var out = 0L
    var j = 0
    while (j < bits) { if (buf(j) >= 0) out |= (1L << j); j += 1 }
    out
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

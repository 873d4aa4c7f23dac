package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator (the UDAF surface — SURVEY.md
  * §2.9 notes custom aggregates enter with the extension operators):
  * folds shingle fingerprints into a `numPerm`-wide signature of
  * per-permutation minima. Partial aggregation is the elementwise-min
  * merge, so map-side combine applies and the shuffle carries one
  * fixed-width buffer per group regardless of document length —
  * exactly the sketch shape that scales to 100 TB.
  *
  * Permutation family matches queries.Dedup: h_i(x) = (a_i*x + b_i)
  * mod P with a_i, b_i from the fixed LCG over the permutation index.
  */
class MinHashAgg(numPerm: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  private val P = 1000000007L

  private def h(perm: Int, x: Long): Long = {
    // normalize into [0, P) first: a*x with a < P only stays inside
    // Long for x < ~2^33, and inputs are arbitrary Longs (e.g. hash60)
    val xm = java.lang.Math.floorMod(x, P)
    ((((perm + 1) * 2654435761L + 1013904223L) % P * xm
      + ((perm + 1) * 1779033703L + 2246822519L) % P) % P)
  }

  override def zero: Array[Long] = Array.fill(numPerm)(Long.MaxValue)

  override def reduce(buf: Array[Long], fp: Long): Array[Long] = {
    var i = 0
    while (i < numPerm) {
      val v = h(i, fp)
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerm) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

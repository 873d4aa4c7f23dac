package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the text-analysis and dedup
  * query families. Everything here is pure Catalyst expression work
  * (codegen-friendly, no UDFs) and has an exact DuckDB mirror used by
  * the oracle SQL — see queries/Text.scala.
  *
  * Hash discipline: engine-builtin hashes (xxhash64, murmur) differ
  * across engines, so content fingerprints use an explicit polynomial
  * rolling hash over code points — same elementary integer ops on both
  * engines ⇒ bit-identical results, while still being a real rolling
  * hash (Rabin–Karp style) usable for fingerprinting at scale.
  */
object TextOps {

  /** Non-empty whitespace tokens. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Code points of a string, 1 element per character (ascii() in Spark
    * returns the code point of the first char — applied per 1-char
    * substring). Empty string ⇒ empty array (sequence(1,0) would count
    * DOWN in Spark, so guard explicitly).
    */
  def codePoints(s: Column): Column =
    when(length(s) === 0, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), length(s)),
        i => ascii(s.substr(i, lit(1))).cast("bigint")))

  /** Polynomial rolling hash: fold (acc*base + c) % mod over code
    * points. base*acc stays < 2^63 for mod ≤ ~7e16, so the arithmetic
    * is exact under ANSI mode.
    */
  def rollingHash(s: Column, base: Long = 131L, mod: Long = 1000000007L): Column =
    aggregate(codePoints(s), lit(0L),
      (acc, c) => (acc * base + c) % mod)

  /** 60-bit token hash: two independent rolling hashes packed as
    * fp1 + fp2 * 2^30 (each fp < 2^30). Used by SimHash.
    */
  def hash60(s: Column): Column =
    rollingHash(s, 131L, 1000000007L) +
      rollingHash(s, 137L, 998244353L) * lit(1073741824L)

  /** Distinct word n-gram shingles joined by '_'. Guarded so docs with
    * fewer than n tokens yield an empty array (Spark's sequence counts
    * down when start > stop).
    */
  def distinctShingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val grams = transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws("_", (0 until n).map(k => element_at(toks, i + k)): _*))
    array_distinct(when(size(toks) < n, array().cast("array<string>"))
      .otherwise(grams))
  }

  /** Exact double dot product: left-fold of elementwise products, same
    * op order as the DuckDB mirror (list_reduce over list_transform) ⇒
    * bit-identical doubles.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm via the same fold. */
  def norm(a: Column): Column = sqrt(dot(a, a))
}

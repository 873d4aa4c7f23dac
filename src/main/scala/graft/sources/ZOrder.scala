package graft.sources

import graft.functions.NativeExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping.
  *
  * A table range-clustered on ONE column prunes beautifully on that
  * column and not at all on any other; interleaving the BITS of
  * per-column quantile ranks gives every clustered column locality
  * proportional to 2^-(bits/k), so the footer-stats skipping layer
  * (Warehouse.readSkipping) prunes on ANY of them. This is the same
  * layout idea Delta OSS's OPTIMIZE ZORDER BY implements.
  *
  * Scale shape: one `approxQuantile` pass (a distributed sketch; the
  * driver receives ≤ 2^bits boundaries per column — bytes, not rows),
  * then a pure codegen'd projection (binary-search bucket + bit
  * interleave — no UDFs), then ONE repartitionByRange shuffle on the
  * z-value. That single shuffle is the cost of the layout; it buys
  * every subsequent range scan on any clustered column a file-list
  * pruned by ~2^-(bits/k). Quantile buckets (not min/max scaling) keep
  * the curve balanced under skew — each bucket holds ~1/2^bits of the
  * rows regardless of the value distribution.
  *
  * Nulls: a null in any clustered column yields a null z-value; range
  * partitioning groups those together (nulls first), which is exactly
  * the "null block" a reader pruning on values skips.
  */
object ZOrder {

  /** Cluster `df` into `numFiles` z-ordered output partitions on
    * `cols` (numeric or castable-to-double). `bits` quantile bits per
    * column (default 8 → 256 buckets/column).
    */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 8): DataFrame = {
    require(cols.size >= 2, "z-order needs ≥2 columns (use repartitionByRange for 1)")
    require(bits >= 1 && bits * cols.size <= 62, s"bits=$bits × ${cols.size} cols must fit a long")
    val spark = df.sparkSession
    val dcols = cols.map(c => s"_zd_$c")
    val dd = cols.foldLeft(df)((d, c) => d.withColumn(s"_zd_$c", col(c).cast("double")))
    // one distributed sketch pass for ALL columns' quantile boundaries
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val bounds = dd.stat.approxQuantile(dcols.toArray, probs, 0.001)
    val buckets: Seq[Column] = dcols.zip(bounds).map { case (c, b) =>
      NativeExprs.sortedBucket(spark, col(c), b.distinct.sorted).cast("long")
    }
    // interleave: bit i of column j lands at position i*k + j — round-
    // robin so every column's high bits rank equally in the sort key
    val k = cols.size
    val z = (0 until bits).flatMap { i =>
      buckets.zipWithIndex.map { case (bc, j) =>
        shiftleft(shiftright(bc, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_.bitwiseOR(_))
    dd.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop(dcols :+ "_z": _*)
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Superlinear-scale probe for the pair-heavy catalog family
  * (d2/d7/d20/m37/m39): generate an f× scaled copy of the tables those
  * queries read, time the SAME catalog code on 1× and f×, and print
  * one JSON line per (query, factor) so the fitted exponent
  * ln(t_f/t_1)/ln(f) can be recorded in SCALE.md — converting the
  * "blocked/banded/capped ⇒ ~linear" design claims from argued to
  * measured.
  *
  * Scaling model = MORE data, not denser data: each extra copy is a
  * disjoint shard — documents get every WORD prefixed with a
  * copy-specific tag (a bijective vocabulary rename: every
  * within-copy pairwise Jaccard/shingle relation is preserved
  * EXACTLY, so the copy reproduces the base's dup/near-dup structure
  * verbatim, while cross-copy token overlap is zero), and
  * orders/lineitem offset their order/customer/part key spaces per
  * copy (per-customer degrees and per-edge supports stay EXACTLY the
  * base's — the realistic growth mode; hot-key degeneracy is
  * separately pinned by the hub-corpus specs). A measured
  * exponent ≈ 1 therefore means the operator's cost tracks corpus
  * size; ≫ 1 means a pair generator is leaking quadratic work.
  *
  *   runMain graft.ScaleProbe <baseSfDir> <workDir> <factor> <q1,q2,...>
  */
object ScaleProbe {

  def scaleTables(spark: SparkSession, baseDir: String, outDir: String,
      factor: Int): Unit = {
    import spark.implicits._
    val docs = Tables.load(spark, baseDir, "documents")
    val orders = Tables.load(spark, baseDir, "orders")
    val lineitem = Tables.load(spark, baseDir, "lineitem")
    val idS = docs.agg(max($"doc_id")).head.getLong(0) + 1
    val okS = orders.agg(max($"o_orderkey")).head.getLong(0) + 1
    val ckS = orders.agg(max($"o_custkey")).head.getLong(0) + 1
    val pkS = lineitem.agg(max($"l_partkey")).head.getLong(0) + 1

    def copies(df: DataFrame)(mutate: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(c => mutate(df, c)).reduce(_.unionByName(_))

    copies(docs) { (d, c) =>
      val shifted = d.withColumn("doc_id", $"doc_id" + lit(c * idS))
      if (c == 0) shifted
      else shifted.withColumn("text",
        regexp_replace($"text", "(\\S+)", s"zc$c" + "$1"))
    }.repartition(8 * factor)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    copies(orders) { (d, c) =>
      d.withColumn("o_orderkey", $"o_orderkey" + lit(c * okS))
        .withColumn("o_custkey", $"o_custkey" + lit(c * ckS))
    }.repartition(8 * factor)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    copies(lineitem) { (d, c) =>
      d.withColumn("l_orderkey", $"l_orderkey" + lit(c * okS))
        .withColumn("l_partkey", $"l_partkey" + lit(c * pkS))
    }.repartition(16 * factor)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
  }

  def main(args: Array[String]): Unit = {
    val Array(baseDir, workDir, factorS, queriesS) = args.take(4)
    val factor = factorS.toInt
    val queries = queriesS.split(',').toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = s"$workDir/x$factor"
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      val t0 = System.nanoTime()
      scaleTables(spark, baseDir, dir, factor)
      System.err.println(f"[scaleprobe] generated x$factor in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    queries.foreach { q =>
      val secs = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[scaleprobe] $q x$factor rows=$n ${s}%.2fs")
        s
      }
      println(f"""{"query":"$q","factor":$factor,"sec":${secs.min}%.3f}""")
    }
    spark.stop()
  }
}

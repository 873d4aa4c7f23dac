package graft

import graft.plans.PrunedFileIndex
import graft.sources.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Join-driven automatic file skipping (graft.plans.JoinSkipRule): a
  * star join whose filter lives on the DIM side must prune the fact's
  * files from the dim's collected join keys — no literal predicate on
  * the fact anywhere — and the pruned join must return exactly what
  * the unpruned join returns.
  */
class JoinSkipSpec extends SparkSpec {

  private def mk(tag: String): Warehouse = {
    val tmp = java.nio.file.Files.createTempDirectory(tag).toString
    new Warehouse(spark, tmp, manifest = true)
  }

  /** 10k fact rows in 8 contiguous-range files on fk. */
  private def fact() = {
    import spark.implicits._
    spark.range(0, 10000).toDF("fk")
      .withColumn("v", ($"fk" * 3).cast("double"))
      .repartitionByRange(8, $"fk")
      .sortWithinPartitions($"fk")
  }

  private def prunedCounts(df: DataFrame): (Int, Int) = {
    val hits = df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case hfs: HadoopFsRelation => hfs.location match {
          case p: PrunedFileIndex =>
            Some((p.inputFiles.length, p.orig.inputFiles.length))
          case _ => None
        }
        case _ => None
      }
    }.flatten
    if (hits.isEmpty) (-1, -1)
    else (hits.map(_._1).sum, hits.map(_._2).sum)
  }

  test("join-skip: dim-filtered star join prunes the fact scan") {
    import spark.implicits._
    val wh = mk("graft-joinskip1")
    wh.atomicPublish("fact", fact())
    // dim keys 100..104 all live in the FIRST of 8 range files
    val dim = spark.range(0, 500).toDF("dk")
      .withColumn("tag", ($"dk" % 7).cast("long"))
    val q = wh.read("fact")
      .join(dim.where($"dk".between(100, 104)), $"fk" === $"dk")
    val (kept, total) = prunedCounts(q)
    assert(total === 8 && kept <= 1, s"dim keys span 1 file, kept $kept of $total")
    assert(q.orderBy("fk").select("fk").as[Long].collect() ===
      (100L to 104L).toArray)
  }

  test("join-skip: composes with deletion vectors and left-semi") {
    import spark.implicits._
    val wh = mk("graft-joinskip2")
    wh.atomicPublish("fact", fact())
    wh.deleteRows("fact", col("fk") % 2 === 0)
    val dim = spark.range(2000, 2010).toDF("dk")
    val inner = wh.read("fact").join(dim, $"fk" === $"dk")
    val (ki, ti) = prunedCounts(inner)
    assert(ti === 8 && ki <= 1, s"kept $ki of $ti")
    assert(inner.orderBy("fk").select("fk").as[Long].collect() ===
      (2000L until 2010L).filter(_ % 2 != 0).toArray)

    val semi = wh.read("fact").join(dim, $"fk" === $"dk", "left_semi")
    val (ks, tss) = prunedCounts(semi)
    assert(tss === 8 && ks <= 1, s"semi kept $ks of $tss")
    assert(semi.count() === 5)
  }

  test("join-skip: over-cap dims fall back to a key range; empty dim prunes everything") {
    import spark.implicits._
    val wh = mk("graft-joinskip3")
    wh.atomicPublish("fact", fact())
    // > maxKeys distinct keys SCATTERED across the whole domain: the
    // range fallback [0, 9998] overlaps every file — nothing dropped,
    // nothing wrong
    val wide = spark.range(0, 10000, 2).toDF("dk")
    val qw = wh.read("fact").join(wide, $"fk" === $"dk")
    val (kw, tw) = prunedCounts(qw)
    assert(kw === tw, s"scattered over-cap dim must drop nothing, kept $kw of $tw")
    assert(qw.count() === 5000)

    // > maxKeys distinct keys CLUSTERED in one file's range: the
    // min/max fallback still prunes the range-clustered fact — the
    // leg the flat key-cap abandon used to give up on
    val clustered = spark.range(1300, 1600).toDF("dk") // 300 keys > cap
    val qc = wh.read("fact").join(clustered, $"fk" === $"dk")
    val (kc, tc) = prunedCounts(qc)
    // range-partition boundaries are sample-approximate: the 300-key
    // window can straddle one boundary, never more
    assert(tc === 8 && kc <= 2, s"clustered over-cap dim kept $kc of $tc")
    assert(qc.count() === 300)

    // empty dim: the join output is provably empty — zero files planned
    val empty = spark.range(0, 500).toDF("dk").where($"dk" < 0)
    val qe = wh.read("fact").join(empty, $"fk" === $"dk")
    val (ke, te) = prunedCounts(qe)
    assert(te === 8 && ke === 0, s"empty dim kept $ke of $te")
    assert(qe.count() === 0)
  }

  test("join-skip: composite-key joins prune on the conjunction of pairs") {
    import spark.implicits._
    val wh = mk("graft-joinskip7")
    // g tracks the file: repartitionByRange on fk puts g = fk/1250
    // whole into one file each
    wh.atomicPublish("fact",
      spark.range(0, 10000).toDF("fk")
        .withColumn("g", ($"fk" / 1250).cast("long"))
        .withColumn("v", ($"fk" * 3).cast("double"))
        .repartitionByRange(8, $"fk").sortWithinPartitions($"fk"))
    // first key OVER-CAP and spanning everything (range fallback keeps
    // all); second key a single value — only the conjunction prunes
    val dim = spark.range(0, 200).toDF("j")
      .select(($"j" * 50).as("dk"), lit(2L).as("dg"))
    val q = wh.read("fact").join(dim, $"fk" === $"dk" && $"g" === $"dg")
    val (kept, total) = prunedCounts(q)
    assert(total === 8 && kept <= 2,
      s"second-pair prune must carry the composite join, kept $kept of $total")
    // truth: fk multiple of 50 AND fk/1250 == 2 → fk in [2500, 3750)
    assert(q.orderBy("fk").select("fk").as[Long].collect() ===
      (2500L until 3750L by 50).toArray)
  }

  test("join-skip: non-pinned dim leaves (RDD-backed) are not probed") {
    import spark.implicits._
    val wh = mk("graft-joinskip5")
    wh.atomicPublish("fact", fact())
    // an RDD-backed dim is opaque to the pinned-leaf allowlist: the
    // conservative guard must leave the plan untouched (probing a
    // relation whose contents the planner cannot prove stable between
    // plan- and execution-time is the wrong-results shape ADVICE r16
    // flagged for mutable sources)
    val rdd = sc.parallelize(Seq(100L, 101L, 102L)).map(org.apache.spark.sql.Row(_))
    val dim = spark.createDataFrame(rdd,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("dk",
          org.apache.spark.sql.types.LongType))))
    val q = wh.read("fact").join(dim, $"fk" === $"dk")
    assert(prunedCounts(q) === ((-1, -1)), "RDD dim must not prune")
    assert(q.count() === 3)
  }

  test("join-skip fuzz: pruned results always equal unpruned (seeded sweep)") {
    import spark.implicits._
    val wh = mk("graft-joinskip6")
    wh.atomicPublish("fact", fact())
    val rnd = new scala.util.Random(17)
    (1 to 8).foreach { _ =>
      val lo = rnd.nextInt(10000)
      val width = 1 + rnd.nextInt(400) // spans the key cap both ways
      val dim = spark.range(lo.toLong, (lo + width).toLong).toDF("dk")
      val on = wh.read("fact").join(dim, $"fk" === $"dk")
        .agg(count(lit(1)), sum($"v")).head()
      val off = {
        spark.conf.set("spark.graft.joinSkip.enabled", "false")
        try wh.read("fact").join(dim, $"fk" === $"dk")
          .agg(count(lit(1)), sum($"v")).head()
        finally spark.conf.set("spark.graft.joinSkip.enabled", "true")
      }
      assert(on === off, s"window [$lo, ${lo + width}) diverged: $on vs $off")
    }
  }

  test("join-skip: literal WHERE on the fact composes with the dim prune") {
    import spark.implicits._
    val wh = mk("graft-joinskip4")
    wh.atomicPublish("fact", fact())
    // fact filter keeps files 1-2; dim keys live in file 1 — the two
    // rules intersect survivors instead of fighting the fixpoint
    val dim = spark.range(1500, 1520).toDF("dk")
    val q = wh.read("fact").where($"fk" >= 1000L && $"fk" <= 3000L)
      .join(dim, $"fk" === $"dk")
    val (kept, total) = prunedCounts(q)
    assert(total === 8 && kept <= 1, s"kept $kept of $total")
    assert(q.orderBy("fk").select("fk").as[Long].collect() ===
      (1500L until 1520L).toArray)
  }
}

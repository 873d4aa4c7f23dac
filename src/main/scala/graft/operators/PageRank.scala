package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list (Page et al. 1999) in INTEGER
  * micro-units: total rank mass is `scale` (default 10^12), every step
  * is integer math — rank DIV out-degree per edge, (num·x) DIV den
  * damping — so partial-agg sums are order-independent and results are
  * bit-reproducible across runs, partitionings, and engines (the
  * property graft's DuckDB oracles hash-check; floats would make the
  * sum order-dependent).
  *
  * Scale shape: per iteration one ranks⋈edges equi-join (shuffle on
  * src) and one dst-keyed partial agg — the same steering pattern as
  * ConnectedComponents, with a KNOWN trip count. The edge list (with
  * its precomputed out-degrees) is cached once; each round's rank
  * frame is an eager localCheckpoint — ranks are referenced by the
  * next round's join AND the dangling/base arithmetic, so an
  * un-truncated plan would double per round (the 2^rounds explosion
  * the ConnectedComponents property test caught).
  *
  * Dangling nodes (no out-edges) leak their mass each round rather
  * than redistributing it — the common simplification; total mass is
  * then non-conserved but deterministic. Supply a dangling-free graph
  * (or add self-loops) when conservation matters.
  */
object PageRank {

  /** edges: two Long columns (src, dst), directed. Returns
    * (node, pr) — every node that appears as a src or dst, with its
    * integer micro-unit rank after `iterations` power iterations at
    * damping `dampNum/dampDen` (default 85/100).
    */
  def run(edges: DataFrame, iterations: Int, srcCol: String = "src",
      dstCol: String = "dst", scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val out = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // cache the join side once: (src, dst, outdeg), pre-partitioned on
    // src — every iteration's join reuses this partitioning
    val withDeg = e.join(out, "src").repartition(col("src")).persist()
    val n = nodes.count() // one scalar: sizes pr0 and the base term
    val pr0 = scale / n
    val base = (pr0 * (dampDen - dampNum)) / dampDen
    var pr = nodes.select(col("node"), lit(pr0).as("pr"))
    // previous truncation's checkpoint blocks (see Lineage: unpersist
    // on the Dataset itself frees nothing)
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    for (i <- 1 to iterations) {
      val inflow = withDeg.join(pr, withDeg("src") === pr("node"))
        .select(col("dst"), expr("pr DIV outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inflow"))
      val next = pr.select(col("node"))
        .join(inflow, pr("node") === inflow("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampNum * coalesce(inflow, CAST(0 AS BIGINT)))" +
            s" DIV $dampDen")).as("pr"))
      // periodic truncation: the plan doubles per round (pr referenced
      // twice), so cut it every 4th round — ≤2^4 plan nodes between
      // cuts, and short runs (the common 3-iteration case) stay a
      // single lazy plan with no materialization jobs at all
      pr = if (i % 4 == 0 && i < iterations) {
        val ck = next.localCheckpoint(true)
        Lineage.free(prevCkpt) // rounds between cuts read the NEW blocks
        prevCkpt = Lineage.ckptRdd(ck)
        ck
      } else next
    }
    // materialize the result BEFORE dropping the edge cache (the same
    // discipline as ConnectedComponents): a lazy return would recompute
    // every iteration against an uncached edge list
    val result = pr.localCheckpoint(true)
    Lineage.free(prevCkpt) // result is materialized; mid-run blocks free
    withDeg.unpersist()
    result
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * clustering step a near-dup pipeline needs AFTER candidate pairs:
  * (a,b) similarity pairs → components → keep one document per
  * component (reference pipelines emit pairs; dedup decisions need the
  * transitive closure: a~b, b~c ⇒ {a,b,c} is one duplicate cluster).
  *
  * Algorithm: label propagation to fixpoint ("hash-to-min") — each
  * round every node takes the min label over itself and its neighbors;
  * converged when no label changes. Each round is one shuffle join +
  * one partial-aggregated min — no driver data, the driver only steers
  * the loop off a one-row aggregate. Rounds = component diameter;
  * near-dup clusters are near-cliques, so 2-3 rounds in practice
  * (worst case a path graph — at 100 TB pair the rounds with
  * large-star/small-star contraction, Kiveris et al. 2014).
  *
  * Scale shape: the edge list is cached pre-partitioned on the probe
  * key `m`, so when labels outgrow the broadcast threshold and every
  * round becomes a shuffle join, the (much larger) edge side reuses
  * its cached partitioning instead of re-shuffling per round; round 1
  * is fused into initialization (labels start at min(self, neighbors)
  * — against identity labels the join is a no-op, so the fused
  * aggregate saves a full round).
  */
object ConnectedComponents {

  /** edges: two Long columns (endpoint ids), undirected, self-loops and
    * duplicates tolerated. Returns (node, component) with component =
    * min node id in the connected component.
    *
    * `dedupEdges = false` skips the defensive `.distinct()` — one full
    * shuffle of the edge list — when the caller guarantees edges are
    * already unique with a < b (an LSH candidate generator's
    * `.distinct()` output qualifies: the two union directions can then
    * never collide). Duplicate edges only cost redundant min-work per
    * round, they never change the fixpoint, so this is a pure
    * performance contract.
    */
  def run(edges: DataFrame, aCol: String = "a", bCol: String = "b",
      maxRounds: Int = 50, dedupEdges: Boolean = true): DataFrame = {
    val both = edges.select(col(aCol).as("n"), col(bCol).as("m"))
      .union(edges.select(col(bCol).as("n"), col(aCol).as("m")))
    val sym = (if (dedupEdges) both.distinct() else both)
      .repartition(col("m"))
      .persist()
    if (sym.isEmpty) {
      // zero candidate pairs: the convergence probe below would read a
      // null decimal off the empty aggregate — return the empty
      // (node, component) frame directly
      sym.unpersist()
      return sym.select(col("n").as("node"), col("m").as("component")).limit(0)
    }
    // round 1 fused into init: against identity labels, pulling
    // neighbor labels is just min over the neighbor ids themselves
    var labels = sym.groupBy(col("n"))
      .agg(least(min(col("m")), col("n")).as("lbl"))
      .persist()
    var rounds = 1
    var converged = false
    // the PREVIOUS round's checkpoint blocks — Dataset.unpersist is a
    // no-op on a localCheckpoint'd frame (see Lineage), so each round
    // frees its predecessor's RDD directly once the new round is
    // eagerly materialized
    var prevCkpt: Option[org.apache.spark.rdd.RDD[_]] = None
    // convergence via the label-sum invariant: labels are per-node
    // non-increasing (min of self + neighbors), so the exact decimal
    // sum is strictly decreasing until fixpoint and equal AT it — one
    // partial-aggregated scan per round instead of a join + count.
    // Seeded from the fused round so a diameter-1 component (a clique —
    // the common near-dup cluster) converges after one join round.
    var prevSum: Option[java.math.BigDecimal] = Some(
      labels.agg(sum(col("lbl").cast("decimal(38,0)")).as("s")).head().getDecimal(0))
    while (!converged && rounds < maxRounds) {
      // each node pulls its neighbors' labels, keeps the min incl. own
      val neigh = sym.join(labels.withColumnRenamed("n", "m"), "m")
        .select(col("n"), col("lbl"))
      // localCheckpoint, not persist: `labels` is referenced TWICE per
      // round (the neighbor join and the union), so an un-truncated
      // logical plan doubles every round — a long-diameter graph (a
      // path) makes round ~15's plan tree 2^15 nodes and AQE's
      // explain-string rendering alone OOMs the driver. Eager local
      // checkpoint materializes the round AND cuts the lineage, so
      // every round carries a constant-size plan. (Same durability
      // trade as the final checkpoint below — executor-local blocks,
      // re-run the job on executor loss.)
      val next = labels.unionByName(neigh)
        .groupBy(col("n")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint(true)
      val labelSum = next
        .agg(sum(col("lbl").cast("decimal(38,0)")).as("s"))
        .head().getDecimal(0)
      labels.unpersist() // frees the init persist (round 1); no-op after
      Lineage.free(prevCkpt) // prior round's blocks — next is materialized
      prevCkpt = Lineage.ckptRdd(next)
      labels = next
      rounds += 1
      converged = prevSum.exists(_.compareTo(labelSum) == 0)
      prevSum = Some(labelSum)
    }
    // cut lineage before releasing the loop's caches: the returned frame
    // must not re-run every propagation round when the caller acts on
    // it, and leaving the final round persisted would leak cache across
    // repeated runs (localCheckpoint is single-job durability — for a
    // multi-tenant cluster, write to a checkpoint dir instead)
    val out = labels.localCheckpoint(true)
    labels.unpersist()
    Lineage.free(prevCkpt) // last round's blocks — out is its own copy
    sym.unpersist()
    out.withColumnRenamed("n", "node").withColumnRenamed("lbl", "component")
  }
}

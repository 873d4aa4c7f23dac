package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF coarse-quantizer codebook: Lloyd's k-means over cosine
  * similarity, DataFrame-only — no RDDs, no driver-side vectors, so
  * the same code trains on 10³ or 10¹⁰ rows.
  *
  * Shapes chosen for 100 TB:
  * - assignment is `crossJoin(broadcast(codebook))` → argmax via
  *   `max_by` PARTIAL AGGREGATION, not `row_number` over a window: the
  *   window shape sort-shuffles the full n×|C| expansion, max_by
  *   combines map-side and shuffles ONE row per vector (the
  *   Extract.itemCandidates min_by rationale).
  * - re-centering is posexplode → groupBy(c_id, dim) → avg: the
  *   per-dimension partial sums combine map-side too, so a cluster of
  *   10⁹ members costs |C|·dim aggregate rows, never a wide buffer.
  * - the codebook stays a DataFrame end to end; only its (tiny)
  *   broadcast copies move.
  *
  * Determinism: centroid components are rounded to 6 decimals and
  * stored as FLOAT. A distributed average's float-sum ORDER varies run
  * to run (and engine to engine), but only in the last ulps — far
  * below the rounding quantum — so the rounded codebook, and every
  * assignment computed from it, is reproducible. This is what lets
  * sim2's DuckDB oracle re-derive the identical codebook in SQL.
  * Clusters that lose every member drop out (standard Lloyd's
  * degeneracy; k shrinks rather than resurrecting a cluster
  * nondeterministically).
  */
object IvfCodebook {

  private def ndot(e: DataFrame)(a: Column, b: Column): Column =
    graft.functions.NativeExprs.dot(e.sparkSession, a, b)

  /** Nearest-centroid id per vector. Ties at equal cosine break to the
    * smallest c_id (struct(ccos, -c_id) lexicographic max — identical
    * to a window's (ccos DESC, c_id ASC) with one row shuffled per
    * vector instead of |C|).
    *
    * e: (vec_id, embedding, nrm); cents: (c_id, c_emb, c_nrm).
    */
  def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val dot = ndot(e) _
    e.crossJoin(broadcast(cents))
      .select($"vec_id", $"c_id",
        (dot($"embedding", $"c_emb") / ($"nrm" * $"c_nrm")).as("ccos"))
      .groupBy($"vec_id")
      .agg(max_by($"c_id", struct($"ccos", (-$"c_id").as("nc"))).as("c_id"))
  }

  /** `iters` Lloyd's rounds from `init` (c_id, c_emb, c_nrm): assign
    * every vector to its nearest centroid, re-center each cluster as
    * the rounded per-dimension mean (see class doc for why rounded).
    */
  def train(e: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val dot = ndot(e) _
    var cents = init
    for (_ <- 1 to iters) {
      cents = assign(e, cents).join(e, "vec_id")
        .select($"c_id", posexplode($"embedding"))
        .groupBy($"c_id", $"pos")
        .agg(avg($"col".cast("double")).as("v"))
        .groupBy($"c_id")
        .agg(array_sort(collect_list(struct($"pos", $"v"))).as("pv"))
        .select($"c_id",
          transform($"pv", x => round(x.getField("v"), 6).cast("float")).as("c_emb"))
        .select($"c_id", $"c_emb", sqrt(dot($"c_emb", $"c_emb")).as("c_nrm"))
    }
    cents
  }

  /** Skew guard for within-cluster pairwise work (SemDeDup d8): a
    * cluster wider than `cap` is deterministically split into
    * ceil(w/cap) sub-cells by a multiplicative hash of vec_id, so the
    * worst-case pairwise cost drops from w² to ~cap·w. Pairs whose
    * members land in different sub-cells are lost — the documented
    * recall trade-off, the d7 band-bucket cap at the embedding level;
    * the alternative (re-running the quantizer on the giant cluster's
    * members with a finer codebook) preserves recall at the cost of a
    * second training pass. Clusters at or under the cap keep one cell
    * (c_sub = 0), so the guard is free until it binds. The hash is the
    * same engine-neutral multiplicative mix as m12's stratified
    * sampler, so an oracle can reproduce the split exactly.
    */
  def subdivide(assigned: DataFrame, cap: Int): DataFrame = {
    val s = assigned.sparkSession
    import s.implicits._
    val widths = assigned.groupBy($"c_id").agg(count(lit(1)).as("c_w"))
    assigned.join(broadcast(widths), "c_id")
      .withColumn("c_sub", pmod(
        pmod($"vec_id" * 2654435761L + 1013904223L, lit(4294967296L)),
        expr(s"(c_w + ${cap - 1}) DIV $cap")))
      .drop("c_w")
  }

  /** IVF probe: each query ranks the codebook, scans only its top-
    * `nprobe` centroids' posting lists, and keeps its `k` best matches
    * by exact cosine. The query side is tiny (a window there is fine);
    * the corpus side only ever moves one row per (probed-list member).
    * Returns (q_id, rank, vec_id, cos).
    *
    * queries: (q_id, q_emb, q_nrm); `assigned` from assign(e, cents).
    */
  def topk(e: DataFrame, queries: DataFrame, cents: DataFrame,
      assigned: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dot = ndot(e) _
    val probes = queries
      .crossJoin(broadcast(cents))
      .select($"q_id", $"q_emb", $"q_nrm", $"c_id",
        (dot($"q_emb", $"c_emb") / ($"q_nrm" * $"c_nrm")).as("ccos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"q_id").orderBy($"ccos".desc, $"c_id")))
      .filter($"rn" <= nprobe)
      .select($"q_id", $"q_emb", $"q_nrm", $"c_id")
    val cand = probes.join(assigned, "c_id")
      .filter($"vec_id" =!= $"q_id")
      .join(e.select($"vec_id", $"embedding", $"nrm"), "vec_id")
      .select($"q_id", $"vec_id",
        (dot($"q_emb", $"embedding") / ($"q_nrm" * $"nrm")).as("cos"))
      .distinct()
    // bounded top-k aggregation, not a row_number window: k rows per
    // query cross the shuffle instead of every probed candidate
    TopKAgg.rank(cand, k, "cos")
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Similarity search over the `embeddings` table (Array[Float], 64-d).
  *
  * sim1 is the exact baseline: brute-force cosine top-k for a fixed
  * query set — one broadcast of the (tiny) query side, one scan of the
  * corpus, a per-query top-k window on an already-small intermediate.
  *
  * sim2 is the scale path: IVF-style coarse quantization — a codebook
  * trained with Lloyd's iterations (operators.IvfCodebook, seeded by
  * the deterministic every-50th sample), every vector assigned to its
  * nearest centroid (broadcast codebook), a query probes its top-8
  * centroids and only scans those posting lists. At 100 TB the corpus
  * is partitioned by centroid id, so a probe touches nprobe/|C| of the
  * data.
  */
object Sim {

  /** DuckDB mirror of TextOps.dot — exact double left-fold. */
  def duckDot(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a)+1),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y)""".stripMargin

  /** Codegen'd dot product (NativeExprs) — bit-identical to
    * TextOps.dot, pinned by NativeExprsSpec.
    */
  private def ndot(s: SparkSession, a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = graft.functions.NativeExprs.dot(s, a, b)

  private def withNorm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "embeddings")
      .select($"vec_id", $"label", $"embedding",
        sqrt(ndot(s, $"embedding", $"embedding")).as("nrm"))
  }

  /** Spark side of the shared trained-codebook prelude: 2 Lloyd's
    * rounds from the deterministic every-50th seed, plus the final
    * assignment. The codebook is persisted — it is tiny and feeds
    * multiple plan branches.
    */
  private def trainedCodebook(s: SparkSession, e: DataFrame): (DataFrame, DataFrame) = {
    import s.implicits._
    val init = e.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("c_id"), $"embedding".as("c_emb"), $"nrm".as("c_nrm"))
    val cents = graft.operators.IvfCodebook.train(e, init, 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (cents, graft.operators.IvfCodebook.assign(e, cents))
  }

  /** Oracle side of the same prelude: CTEs `n` (normed embeddings),
    * `c0` (seed), two Lloyd's rounds (a1,m1,c1 / a2,m2,c2) and
    * `assigned` + final codebook `c2` — the SQL mirror, CTE for CTE, of
    * trainedCodebook. Reproducible across engines because centroids are
    * rounded to 6 decimals (see IvfCodebook's class doc).
    */
  private def codebookCtes: String = {
    def assignCte(cents: String): String =
      s"""(SELECT vec_id, c_id FROM (
        SELECT e.vec_id, c.c_id, row_number() OVER (PARTITION BY e.vec_id
          ORDER BY ${duckDot("e.embedding", "c.c_emb")} / (e.nrm * c.c_nrm) DESC, c.c_id) AS rn
        FROM n e CROSS JOIN $cents c)
      WHERE rn = 1)"""
    def recenterCtes(a: String, m: String, c: String): String =
      s"""$m AS (
        SELECT a.c_id, r.j, avg(CAST(e.embedding[r.j + 1] AS DOUBLE)) AS v
        FROM $a a JOIN n e USING (vec_id) CROSS JOIN range(64) r(j)
        GROUP BY a.c_id, r.j),
      $c AS (
        SELECT c_id, c_emb, sqrt(${duckDot("c_emb", "c_emb")}) AS c_nrm FROM (
          SELECT c_id, list(CAST(round(v, 6) AS FLOAT) ORDER BY j) AS c_emb
          FROM $m GROUP BY c_id))"""
    s"""n AS (
      SELECT vec_id, embedding,
        sqrt(${duckDot("embedding", "embedding")}) AS nrm
      FROM embeddings),
    c0 AS (
      SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
      FROM n WHERE vec_id % 50 = 0),
    a1 AS ${assignCte("c0")},
    ${recenterCtes("a1", "m1", "c1")},
    a2 AS ${assignCte("c1")},
    ${recenterCtes("a2", "m2", "c2")},
    assigned AS ${assignCte("c2")}"""
  }

  val all: Seq[Q] = Seq(

    // ---- brute-force cosine top-k (exact ANN baseline) -----------------
    Q("sim1_brute_topk",
      (s, dir) => {
        import s.implicits._
        val e = withNorm(s, dir)
        val q = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
        val scored = e.join(broadcast(q), $"vec_id" =!= $"q_id")
          .select($"q_id", $"vec_id",
            (ndot(s, $"q_emb", $"embedding") / ($"q_nrm" * $"nrm")).as("cos"))
        // bounded top-k aggregation (operators.TopKAgg), not a
        // row_number window: the window sort-shuffles the full n×q
        // scored stream; the aggregator combines map-side and ships k
        // rows per query
        graft.operators.TopKAgg.rank(scored, 10, "cos")
          .orderBy($"q_id", $"rank")
      },
      Some(s"""WITH n AS (
          SELECT vec_id, embedding,
            sqrt(${duckDot("embedding", "embedding")}) AS nrm
          FROM embeddings)
        SELECT q_id, rank, vec_id, cos FROM (
          SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
            ${duckDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm) AS cos,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm) DESC,
                e.vec_id) AS rank
          FROM n q JOIN n e ON q.vec_id < 10 AND e.vec_id <> q.vec_id)
        WHERE rank <= 10 ORDER BY q_id, rank""")),

    // ---- IVF-bucketed ANN: train codebook → assign → probe → rank ------
    // The codebook is TRAINED (2 Lloyd's rounds from the deterministic
    // every-50th seed) via operators.IvfCodebook: assignment is the
    // max_by partial-agg argmax (one shuffled row per vector, never a
    // window over the n×|C| expansion), re-centering a per-dimension
    // partial-agg mean, and centroids are rounded to 6 decimals so the
    // distributed float-sum order can't leak into assignments — which
    // is what lets the oracle below re-derive the identical codebook in
    // SQL (c0→a1→m1→c1→a2→m2→c2 mirrors train(e, init, 2) CTE for CTE).
    Q("sim2_ivf_topk",
      (s, dir) => {
        import s.implicits._
        val e = withNorm(s, dir)
        val (cents, assigned) = trainedCodebook(s, e)
        val queries = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
        graft.operators.IvfCodebook.topk(e, queries, cents, assigned, 8, 10)
          .orderBy($"q_id", $"rank")
      },
      Some(s"""WITH $codebookCtes,
        probes AS (
          SELECT q_id, c_id FROM (
            SELECT q.vec_id AS q_id, c.c_id, row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.embedding", "c.c_emb")} / (q.nrm * c.c_nrm) DESC, c.c_id) AS rn
            FROM n q CROSS JOIN c2 c WHERE q.vec_id < 10)
          WHERE rn <= 8),
        cand AS (
          SELECT DISTINCT p.q_id, a.vec_id,
            ${duckDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm) AS cos
          FROM probes p JOIN assigned a ON p.c_id = a.c_id AND a.vec_id <> p.q_id
          JOIN n q ON q.vec_id = p.q_id JOIN n e ON e.vec_id = a.vec_id)
        SELECT q_id, rank, vec_id, cos FROM (
          SELECT q_id, vec_id, cos, row_number() OVER (PARTITION BY q_id
            ORDER BY cos DESC, vec_id) AS rank FROM cand)
        WHERE rank <= 10 ORDER BY q_id, rank""")),

    // ---- SemDeDup: semantic dedup via trained-codebook clustering ------
    // The SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540): k-means
    // cluster the embeddings, then compare pairs ONLY within a cluster
    // and drop every vector that is ≥ tau cosine-similar to a
    // lower-id member of its cluster. The cluster assignment is what
    // makes it scale: pairwise work is Σ|cluster|² instead of n², and
    // the within-cluster join is an equi-join on (c_id, c_sub) —
    // shuffle by cluster, exactly how the corpus would be partitioned
    // at 100 TB. The c_sub cell comes from IvfCodebook.subdivide, the
    // skew guard that bounds a GIANT cluster's pairwise cost at
    // ~cap·w instead of w² (non-binding on this corpus — every cluster
    // is under the cap, so c_sub = 0 everywhere; DedupSimSpec proves
    // the binding case on a single-cluster corpus).
    Q("d8_semdedup",
      (s, dir) => {
        import s.implicits._
        val e = withNorm(s, dir)
        val (_, assigned) = trainedCodebook(s, e)
        val m = graft.operators.IvfCodebook.subdivide(assigned, 200)
          .join(e.select($"vec_id", $"embedding", $"nrm"), "vec_id")
        val a = m.select($"c_id", $"c_sub", $"vec_id".as("a_id"),
          $"embedding".as("a_emb"), $"nrm".as("a_nrm"))
        val b = m.select($"c_id", $"c_sub", $"vec_id".as("b_id"),
          $"embedding".as("b_emb"), $"nrm".as("b_nrm"))
        val dup = a.join(b, Seq("c_id", "c_sub"))
          .filter($"a_id" < $"b_id")
          .filter((ndot(s, $"a_emb", $"b_emb") / ($"a_nrm" * $"b_nrm")) >= 0.35)
          .select($"b_id".as("vec_id")).distinct()
          .withColumn("dup", lit(true))
        m.join(dup, Seq("vec_id"), "left")
          .select($"vec_id", $"c_id",
            coalesce(!$"dup", lit(true)).as("kept"))
          .orderBy($"vec_id")
      },
      Some(s"""WITH $codebookCtes,
        w AS (
          SELECT c_id, CAST(count(*) AS BIGINT) AS c_w
          FROM assigned GROUP BY c_id),
        m AS (
          SELECT a.vec_id, a.c_id,
            ((a.vec_id * 2654435761 + 1013904223) % 4294967296)
              % ((w.c_w + 199) // 200) AS c_sub,
            e.embedding, e.nrm
          FROM assigned a JOIN w USING (c_id) JOIN n e USING (vec_id)),
        dup AS (
          SELECT DISTINCT b.vec_id
          FROM m a JOIN m b ON a.c_id = b.c_id AND a.c_sub = b.c_sub
            AND a.vec_id < b.vec_id
          WHERE ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.35)
        SELECT m.vec_id, m.c_id, d.vec_id IS NULL AS kept
        FROM m LEFT JOIN dup d ON m.vec_id = d.vec_id
        ORDER BY m.vec_id""")),

    // ---- scalar-quantized ANN: int8 codes + asymmetric distance --------
    // The memory scale path: 8-bit scalar quantization stores each
    // dimension as round((x−mn)/(mx−mn)·255) against per-dimension
    // corpus min/max — a 4× smaller corpus than float32 (the difference
    // between an in-memory and a spilling posting list at 100 TB), with
    // queries kept full-precision and ranked against the DEQUANTIZED
    // corpus (asymmetric distance, the SQ counterpart of IVF-ADC in
    // Jégou et al. 2011). Params are one 64-dim min/max row: a
    // partial-agg per-dimension pass, broadcast back as a one-row cross
    // join (the x10 shape — no collect). All quantization math is the
    // same double-op sequence on both engines, and codes/dequantized
    // values are exact, so the oracle reproduces it bit-for-bit.
    Q("sim3_sq_topk",
      (s, dir) => {
        import s.implicits._
        val e = withNorm(s, dir)
        val params = e.select(posexplode($"embedding"))
          .groupBy($"pos")
          .agg(min($"col".cast("double")).as("mn"), max($"col".cast("double")).as("mx"))
          .groupBy()
          .agg(array_sort(collect_list(struct($"pos", $"mn", $"mx"))).as("pp"))
          .select(transform($"pp", x => x.getField("mn")).as("mns"),
            transform($"pp", x => x.getField("mx")).as("mxs"))
        // quantize + dequantize in one expression: what an SQ index
        // materializes is (codes, params); ranking sees mn + q/255·(mx−mn)
        val dq = e.crossJoin(broadcast(params))
          .select($"vec_id",
            transform(sequence(lit(0), lit(63)), i => {
              val mn = element_at($"mns", i + 1)
              val mx = element_at($"mxs", i + 1)
              val x = element_at($"embedding", i + 1).cast("double")
              val denom = when(mx === mn, lit(1.0)).otherwise(mx - mn)
              (mn + round((x - mn) / denom * 255, 0) / 255 * (mx - mn)).cast("float")
            }).as("demb"))
          .select($"vec_id", $"demb", sqrt(ndot(s, $"demb", $"demb")).as("dnrm"))
        val q = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
        val scored = dq.join(broadcast(q), $"vec_id" =!= $"q_id")
          .select($"q_id", $"vec_id",
            (ndot(s, $"q_emb", $"demb") / ($"q_nrm" * $"dnrm")).as("score"))
        // bounded top-k aggregation (see sim1) — k rows per query
        graft.operators.TopKAgg.rank(scored, 10, "score")
          .orderBy($"q_id", $"rank")
      },
      Some(s"""WITH n AS (
          SELECT vec_id, embedding,
            sqrt(${duckDot("embedding", "embedding")}) AS nrm
          FROM embeddings),
        p AS (
          SELECT r.j, min(CAST(embedding[r.j + 1] AS DOUBLE)) AS mn,
            max(CAST(embedding[r.j + 1] AS DOUBLE)) AS mx
          FROM n CROSS JOIN range(64) r(j) GROUP BY r.j),
        params AS (
          SELECT list(mn ORDER BY j) AS mns, list(mx ORDER BY j) AS mxs FROM p),
        dq AS (
          SELECT vec_id, list_transform(range(1, 65), i ->
            CAST(mns[i] + round((CAST(embedding[i] AS DOUBLE) - mns[i])
              / (CASE WHEN mxs[i] = mns[i] THEN 1.0 ELSE mxs[i] - mns[i] END)
              * 255) / 255 * (mxs[i] - mns[i]) AS FLOAT)) AS demb
          FROM n CROSS JOIN params),
        dqn AS (
          SELECT vec_id, demb, sqrt(${duckDot("demb", "demb")}) AS dnrm FROM dq),
        q AS (
          SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm
          FROM n WHERE vec_id < 10)
        SELECT q_id, rank, vec_id, score FROM (
          SELECT q.q_id, e.vec_id,
            ${duckDot("q.q_emb", "e.demb")} / (q.q_nrm * e.dnrm) AS score,
            row_number() OVER (PARTITION BY q.q_id
              ORDER BY ${duckDot("q.q_emb", "e.demb")} / (q.q_nrm * e.dnrm) DESC,
                e.vec_id) AS rank
          FROM q CROSS JOIN dqn e WHERE e.vec_id <> q.q_id)
        WHERE rank <= 10 ORDER BY q_id, rank"""))
  )
}

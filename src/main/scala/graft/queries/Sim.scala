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
  *
  * sim3 and sim4 are the memory scale paths: sim3 stores int8 scalar-
  * quantized vectors (4× smaller, near-lossless ranking), sim4 stores
  * 8 product-quantization sub-codes per vector (~32× smaller) and
  * re-ranks an ADC shortlist with full-precision vectors (the FAISS
  * IVFPQ+refine shape; recall floors pinned in DedupSimSpec).
  */
object Sim {

  /** DuckDB mirror of TextOps.dot — exact double left-fold. */
  def duckDot(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, len($a)+1),
       |  i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y)""".stripMargin

  /** DuckDB mirror of sim4's squared-L2: the dot identity
    * `(sd − 2·⟨a,b⟩) + cd` with precomputed self-dots, the same three
    * elementary double ops in the same order as the Spark side — a
    * fold-of-squared-diffs HOF would be CodegenFallback on Spark's
    * side (interpreted per row on the n×|C| training expansion), while
    * the inner product is the codegen'd NativeExprs.dot.
    */
  def duckL2(sd: String, a: String, b: String, cd: String): String =
    s"""($sd - 2.0 * ${duckDot(a, b)}) + $cd"""

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

  /** Oracle of the IVF nprobe=8 top-10 probe — shared by sim2 (in-query
    * training) and sim5 (probe of the PERSISTED index): the rounded
    * codebook makes both runs re-derive identical centroids, so one SQL
    * mirror serves both.
    */
  private def ivfTopkOracle: String = ivfTopkOracleFrom("assigned", "")

  /** The probe oracle with a pluggable posting-list source: sim2/sim5
    * probe `assigned` verbatim; sim9 probes the postings AFTER a
    * delete, expressed as the extra CTE `kept`.
    */
  private def ivfTopkOracleFrom(src: String, extraCte: String): String =
    s"""WITH $codebookCtes,$extraCte
        probes AS (
          SELECT q_id, c_id FROM (
            SELECT q.vec_id AS q_id, c.c_id, row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.embedding", "c.c_emb")} / (q.nrm * c.c_nrm) DESC, c.c_id) AS rn
            FROM n q CROSS JOIN c2 c WHERE q.vec_id < 10)
          WHERE rn <= 8),
        cand AS (
          SELECT DISTINCT p.q_id, a.vec_id,
            ${duckDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm) AS cos
          FROM probes p JOIN $src a ON p.c_id = a.c_id AND a.vec_id <> p.q_id
          JOIN n q ON q.vec_id = p.q_id JOIN n e ON e.vec_id = a.vec_id)
        SELECT q_id, rank, vec_id, cos FROM (
          SELECT q_id, vec_id, cos, row_number() OVER (PARTITION BY q_id
            ORDER BY cos DESC, vec_id) AS rank FROM cand)
        WHERE rank <= 10 ORDER BY q_id, rank"""

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
      Some(ivfTopkOracle)),

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
        WHERE rank <= 10 ORDER BY q_id, rank""")),

    // ---- product-quantized ANN: per-subspace codebooks + ADC -----------
    // Product quantization (Jégou, Douze, Schmid 2011, "Product
    // Quantization for Nearest Neighbor Search"): split the 64-d vector
    // into 8 subspaces of 8 dims, train an independent codebook per
    // subspace (one Lloyd's round from the deterministic every-50th
    // seed, squared-L2 assignment — PQ's metric — with rounded
    // centroids, the sim2 reproducibility recipe), and encode each
    // vector as 8 sub-codes. That is the extreme memory scale path:
    // 8 small codes per vector (vs 64 int8 for sim3's SQ, 256 bytes
    // for float32) — at 100 TB the codes table is ~1/32 the corpus and
    // the per-subspace codebooks are a broadcast-size lookup. Ranking
    // is asymmetric distance (ADC) THROUGH PER-SUBSPACE LOOKUP TABLES
    // (Jégou 2011 §5.2): per query, an 8×|C| table of partial dots
    // lut(ss,c) = ⟨q_ss, c_emb⟩ is built from queries × codebook (both
    // broadcast-size); a candidate's score is then EIGHT table adds —
    // one per stored sub-code — so the corpus-wide scan touches only
    // the codes table, never a reconstructed 64-float vector. The
    // adds are explicit left-associated column sums (d0+d1+…+d7), a
    // fixed ss-order float sequence the DuckDB oracle replays
    // bit-for-bit (no cross-engine float-sum ambiguity); the
    // candidate's norm comes from the same tables (cd self-dots,
    // summed in the same order). All pairwise training work is
    // (vector × broadcast codebook); argmin is a min_by partial agg
    // (one shuffled row per sub-vector, never a window over the n×|C|
    // expansion).
    Q("sim4_pq_topk",
      (s, dir) => {
        import s.implicits._
        val e = withNorm(s, dir)
        // (vec_id, ss, semb): 8 sub-vectors of 8 dims per vector;
        // persisted — it feeds the train assignment, the re-center,
        // and the encode pass
        val sub = e.select($"vec_id", $"embedding",
            explode(sequence(lit(0), lit(7))).as("ss"))
          .select($"vec_id", $"ss",
            slice($"embedding", $"ss" * 8 + 1, lit(8)).as("semb"))
          .select($"vec_id", $"ss", $"semb",
            ndot(s, $"semb", $"semb").as("sd"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // squared L2 via the dot identity (sd − 2⟨a,b⟩) + cd with the
        // self-dots precomputed per sub-vector / per centroid: the
        // hot n×|C| expression is the codegen'd NativeExprs.dot (a
        // zip_with/aggregate fold would be CodegenFallback —
        // interpreted per row). Mirrored op-for-op by duckL2.
        // Nearest sub-centroid per (vec_id, ss); ties break to the
        // smallest c_id (struct(d, c_id) lexicographic min — identical
        // to a window's (d ASC, c_id ASC) with one row shuffled per
        // sub-vector instead of |C|)
        def assignTo(cents: DataFrame): DataFrame =
          sub.join(broadcast(cents), "ss")
            .select($"vec_id", $"ss", $"c_id",
              (($"sd" - lit(2.0) * ndot(s, $"semb", $"c_emb")) + $"cd").as("d"))
            .groupBy($"vec_id", $"ss")
            .agg(min_by($"c_id", struct($"d", $"c_id")).as("c_id"))
        val c0 = sub.filter($"vec_id" % 25 === 0)
          .select($"ss", $"vec_id".as("c_id"), $"semb".as("c_emb"),
            $"sd".as("cd"))
        // one Lloyd's round: per-dimension partial-agg mean, rounded
        // to 6 decimals (see IvfCodebook's class doc for why the
        // rounding makes the distributed avg engine-reproducible)
        val c1 = assignTo(c0).join(sub, Seq("vec_id", "ss"))
          .select($"ss", $"c_id", posexplode($"semb"))
          .groupBy($"ss", $"c_id", $"pos")
          .agg(avg($"col".cast("double")).as("v"))
          .groupBy($"ss", $"c_id")
          .agg(array_sort(collect_list(struct($"pos", $"v"))).as("pv"))
          .select($"ss", $"c_id",
            transform($"pv", x => round(x.getField("v"), 6).cast("float")).as("c_emb"))
          .select($"ss", $"c_id", $"c_emb", ndot(s, $"c_emb", $"c_emb").as("cd"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // the CODES table — what physically exists corpus-wide at
        // scale: 8 small (ss, c_id) codes per vector. Re-clustered by
        // vec_id so all 8 sub-codes of a vector share a partition:
        // the LUT probe below is then a broadcast join and the
        // per-candidate combine finishes MAP-SIDE — one narrow
        // shuffle of the codes table, one combined row per
        // (query, candidate) crossing the final exchange.
        val codes = assignTo(c1).repartition($"vec_id")
        val q = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
        // stage 1 — LUT-based ADC shortlist (R=50): per-query tables
        // of per-subspace partial dots (8×|C| rows per query, built
        // from two broadcast-size frames); a candidate's approximate
        // score is 8 table adds in fixed ss order. Within-cluster
        // fine order is beyond an 8-byte code's resolution, so PQ's
        // production role is candidate generation, not final ranking.
        val lut = q.crossJoin(broadcast(c1))
          .select($"q_id", $"q_nrm", $"ss", $"c_id",
            ndot(s, slice($"q_emb", $"ss" * 8 + 1, lit(8)), $"c_emb").as("pd"),
            $"cd")
        // exactly one LUT row matches each (code row × query), so each
        // sum() below folds a single value — exact, order-free; the
        // cross-subspace association is the explicit d0+d1+…+d7 chain
        val pair = codes.join(broadcast(lut), Seq("ss", "c_id"))
          .filter($"vec_id" =!= $"q_id")
          .groupBy($"q_id", $"vec_id", $"q_nrm")
          .agg(
            (0 to 7).map(i => sum(when($"ss" === i, $"pd")).as(s"d$i")).head,
            ((1 to 7).map(i => sum(when($"ss" === i, $"pd")).as(s"d$i")) ++
              (0 to 7).map(i => sum(when($"ss" === i, $"cd")).as(s"t$i"))): _*)
        val dsum = (1 to 7).foldLeft(col("d0"))((a, i) => a + col(s"d$i"))
        val tsum = (1 to 7).foldLeft(col("t0"))((a, i) => a + col(s"t$i"))
        val adc = pair.select($"q_id", $"vec_id",
          (dsum / ($"q_nrm" * sqrt(tsum))).as("adc"))
        val shortlist = graft.operators.TopKAgg.rank(adc, 50, "adc")
          .select($"q_id", $"vec_id")
        // stage 2 — exact re-rank of the shortlist with full-precision
        // vectors (the FAISS IVFPQ "refine" stage): at scale the wide
        // float32 rows are fetched for R candidates per query — the
        // codes table alone is scanned corpus-wide
        val rer = shortlist
          .join(e.select($"vec_id", $"embedding", $"nrm"), "vec_id")
          .join(broadcast(q), Seq("q_id"))
          .select($"q_id", $"vec_id",
            (ndot(s, $"q_emb", $"embedding") / ($"q_nrm" * $"nrm")).as("score"))
        // bounded top-k aggregation (see sim1) — k rows per query
        graft.operators.TopKAgg.rank(rer, 10, "score")
          .orderBy($"q_id", $"rank")
      },
      Some(s"""WITH n AS (
          SELECT vec_id, embedding,
            sqrt(${duckDot("embedding", "embedding")}) AS nrm
          FROM embeddings),
        sub AS (
          SELECT vec_id, r.ss,
            list_slice(embedding, r.ss * 8 + 1, (r.ss + 1) * 8) AS semb,
            ${duckDot(
              "list_slice(embedding, r.ss * 8 + 1, (r.ss + 1) * 8)",
              "list_slice(embedding, r.ss * 8 + 1, (r.ss + 1) * 8)")} AS sd
          FROM n CROSS JOIN range(8) r(ss)),
        c0 AS (
          SELECT ss, vec_id AS c_id, semb AS c_emb, sd AS cd
          FROM sub WHERE vec_id % 25 = 0),
        a1 AS (
          SELECT vec_id, ss, c_id FROM (
            SELECT s.vec_id, s.ss, c.c_id,
              row_number() OVER (PARTITION BY s.vec_id, s.ss
                ORDER BY ${duckL2("s.sd", "s.semb", "c.c_emb", "c.cd")}, c.c_id) AS rn
            FROM sub s JOIN c0 c USING (ss))
          WHERE rn = 1),
        m1 AS (
          SELECT a.ss, a.c_id, r.j, avg(CAST(s.semb[r.j + 1] AS DOUBLE)) AS v
          FROM a1 a JOIN sub s USING (vec_id, ss) CROSS JOIN range(8) r(j)
          GROUP BY a.ss, a.c_id, r.j),
        c1 AS (
          SELECT ss, c_id, c_emb, ${duckDot("c_emb", "c_emb")} AS cd FROM (
            SELECT ss, c_id,
              list(CAST(round(v, 6) AS FLOAT) ORDER BY j) AS c_emb
            FROM m1 GROUP BY ss, c_id)),
        codes AS (
          SELECT vec_id, ss, c_id FROM (
            SELECT s.vec_id, s.ss, c.c_id,
              row_number() OVER (PARTITION BY s.vec_id, s.ss
                ORDER BY ${duckL2("s.sd", "s.semb", "c.c_emb", "c.cd")}, c.c_id) AS rn
            FROM sub s JOIN c1 c USING (ss))
          WHERE rn = 1),
        q AS (
          SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm
          FROM n WHERE vec_id < 10),
        lut AS (
          SELECT q.q_id, q.q_nrm, c.ss, c.c_id,
            ${duckDot(
              "list_slice(q.q_emb, c.ss * 8 + 1, (c.ss + 1) * 8)",
              "c.c_emb")} AS pd,
            c.cd
          FROM q CROSS JOIN c1 c),
        pair AS (
          SELECT l.q_id, k.vec_id, l.q_nrm,
            ${(0 to 7).map(i =>
              s"sum(CASE WHEN l.ss = $i THEN l.pd END) AS d$i").mkString(", ")},
            ${(0 to 7).map(i =>
              s"sum(CASE WHEN l.ss = $i THEN l.cd END) AS t$i").mkString(", ")}
          FROM codes k JOIN lut l USING (ss, c_id)
          WHERE k.vec_id <> l.q_id
          GROUP BY l.q_id, k.vec_id, l.q_nrm),
        short AS (
          SELECT q_id, vec_id FROM (
            SELECT q_id, vec_id,
              row_number() OVER (PARTITION BY q_id
                ORDER BY ${(1 to 7).foldLeft("d0")((a, i) => s"($a + d$i)")}
                  / (q_nrm * sqrt(${(1 to 7).foldLeft("t0")((a, i) => s"($a + t$i)")})) DESC,
                  vec_id) AS rn
            FROM pair)
          WHERE rn <= 50),
        rr AS (
          SELECT s.q_id, s.vec_id,
            ${duckDot("q.q_emb", "e.embedding")} / (q.q_nrm * e.nrm) AS score
          FROM short s JOIN q ON q.q_id = s.q_id
          JOIN n e ON e.vec_id = s.vec_id)
        SELECT q_id, rank, vec_id, score FROM (
          SELECT q_id, vec_id, score,
            row_number() OVER (PARTITION BY q_id
              ORDER BY score DESC, vec_id) AS rank
          FROM rr)
        WHERE rank <= 10 ORDER BY q_id, rank""")),

    // ---- probe of the PERSISTED IVF index (the production ANN shape) ---
    // sim2 trains and probes in one plan; a real 100 TB deployment
    // trains ONCE, persists the model artifact — the codebook and the
    // posting lists — as tables, and serves every query from the
    // stored index (the d11 pattern, applied to ANN). Here the
    // codebook + postings are published through the manifest Warehouse
    // and read back before probing: what's probed went through
    // parquet, so the query proves the round-trip preserves the exact
    // centroids (floats survive parquet bit-exactly; the rounded
    // codebook then makes the oracle shared with sim2 hash-exact).
    // Per-query serving cost is nprobe posting lists + a bounded
    // TopKAgg — independent of corpus size once the index exists.
    Q("sim5_index_topk",
      (s, dir) => {
        import s.implicits._
        val e = withNorm(s, dir)
        val (cents, assigned) = trainedCodebook(s, e)
        val wh = graft.sources.Scratch.warehouse(s, "ivfidx")
        // independent tables: overlap the two publish jobs (guide 2.6)
        wh.atomicPublishAll(Seq(
          "ivf_centroids" -> cents, "ivf_postings" -> assigned))
        val queries = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
        graft.operators.IvfCodebook.topk(e, queries,
          wh.read("ivf_centroids"), wh.read("ivf_postings"), 8, 10)
          .orderBy($"q_id", $"rank")
      },
      Some(ivfTopkOracle)),

    // ---- index DELETION propagated through the served IVF index --------
    // sim5's persisted index, minus k vectors, still serving: the
    // doomed ids are dropped from the POSTING LISTS via the warehouse's
    // S9 anti-join delete and the probe reruns against the surviving
    // index. The codebook stays FROZEN — deletion must not retrain
    // (the same frozen-codebook contract the streaming indexer keeps);
    // a deleted vector simply stops being a candidate, so every probe
    // result is exactly what the same codebook yields over the reduced
    // posting lists — which is what the oracle computes (full-corpus
    // codebook CTEs, `kept` postings). Cost ∝ |postings|, no corpus
    // rescan; the probe's per-query cost is unchanged.
    Q("sim9_index_delete",
      (s, dir) => {
        import s.implicits._
        val e = withNorm(s, dir)
        val (cents, assigned) = trainedCodebook(s, e)
        val wh = graft.sources.Scratch.warehouse(s, "ivfdel")
        // independent tables: overlap the two publish jobs (guide 2.6)
        wh.atomicPublishAll(Seq(
          "ivf_centroids" -> cents, "ivf_postings" -> assigned))
        // doomed: deterministic ~1/7 of the corpus, disjoint from the
        // query ids (deleting a query is a different op — the queries
        // here are external probes, not corpus members)
        val doomed = wh.read("ivf_postings")
          .filter($"vec_id" % 7 === 0 && $"vec_id" >= 10)
          .select($"vec_id")
        wh.delete("ivf_postings", doomed, Seq("vec_id"))
        val queries = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
        graft.operators.IvfCodebook.topk(e, queries,
          wh.read("ivf_centroids"), wh.read("ivf_postings"), 8, 10)
          .orderBy($"q_id", $"rank")
      },
      Some(ivfTopkOracleFrom("kept", """
        kept AS (SELECT vec_id, c_id FROM assigned
          WHERE vec_id % 7 <> 0 OR vec_id < 10),"""))),

    // ---- MERGE-ON-READ IVF deletion: tombstones, no posting rewrite ----
    // sim9's fold republishes the posting lists — x28/x30's trade-off,
    // vector-side: at 100 TB the delete should cost |deleted|, not a
    // postings rewrite. The tombstone table publishes alone; the probe
    // anti-joins it (broadcast) into the posting-list read before
    // candidate generation — IvfCodebook.topk is unchanged, the
    // tombstoned frame just IS its `assigned` input. Same frozen
    // codebook, same oracle as sim9: the driver hash-proves both
    // deletion strategies serve the identical index.
    Q("sim10_ivf_tombstone",
      (s, dir) => {
        import s.implicits._
        val e = withNorm(s, dir)
        val (cents, assigned) = trainedCodebook(s, e)
        val wh = graft.sources.Scratch.warehouse(s, "ivfts")
        // independent tables: overlap the two publish jobs (guide 2.6)
        wh.atomicPublishAll(Seq(
          "ivf_centroids" -> cents, "ivf_postings" -> assigned))
        val doomed = wh.read("ivf_postings")
          .filter($"vec_id" % 7 === 0 && $"vec_id" >= 10)
          .select($"vec_id")
        wh.atomicPublish("ivf_tombstones", doomed)
        val served = wh.read("ivf_postings")
          .join(broadcast(wh.read("ivf_tombstones")), Seq("vec_id"), "left_anti")
        val queries = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
        graft.operators.IvfCodebook.topk(e, queries,
          wh.read("ivf_centroids"), served, 8, 10)
          .orderBy($"q_id", $"rank")
      },
      Some(ivfTopkOracleFrom("kept", """
        kept AS (SELECT vec_id, c_id FROM assigned
          WHERE vec_id % 7 <> 0 OR vec_id < 10),"""))),

    // ---- corpus cartography: per-cluster profile -----------------------
    // The data-mixing view SemDeDup/cluster-curation pipelines decide
    // from: assign every embedding to the trained codebook and profile
    // each semantic cluster against document metadata (volume, char
    // mass, language spread) — the table a curator reads to up/down-
    // weight regions of the corpus. Shape: the sim2 training prelude,
    // one embeddings⋈documents equi-join on the shared id, one
    // partial-agg groupBy |C| — no new shuffle structure; at 100 TB
    // the profile is a |C|-row table from one corpus pass.
    Q("sim6_cluster_profile",
      (s, dir) => {
        import s.implicits._
        val e = withNorm(s, dir)
        val (_, assigned) = trainedCodebook(s, e)
        val docs = Tables.load(s, dir, "documents")
          .select($"doc_id", $"lang", $"n_chars")
        assigned.join(docs, assigned("vec_id") === docs("doc_id"))
          .groupBy($"c_id")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_chars").cast("long").as("total_chars"),
            count_distinct($"lang").as("n_langs"),
            min($"doc_id").as("min_doc"))
          .orderBy($"c_id")
      },
      Some(s"""WITH $codebookCtes
        SELECT a.c_id, count(*) AS n_docs,
          CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
          count(DISTINCT d.lang) AS n_langs,
          CAST(min(d.doc_id) AS BIGINT) AS min_doc
        FROM assigned a JOIN documents d ON a.vec_id = d.doc_id
        GROUP BY a.c_id ORDER BY a.c_id""")),

    // ---- per-dimension embedding profile (index health) ----------------
    // Corpus-level embedding diagnostics — per-dimension min/max/mean —
    // the signal that catches dead dimensions, scale drift, and
    // normalization bugs before they poison an ANN index. posexplode
    // streams (dim, value) pairs into ONE partial-agg shuffle keyed by
    // dimension (64 keys, map-side combined): linear scan, no collect,
    // constant-size result regardless of corpus size. Mean follows the
    // house round(avg, 6) discipline (x14); min/max are
    // order-independent and exact.
    Q("sim7_dim_profile",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "embeddings")
          .select(posexplode($"embedding").as(Seq("pos", "v")))
          .groupBy($"pos".cast("long").as("dim"))
          .agg(count(lit(1)).as("n"),
            min($"v".cast("double")).as("mn"),
            max($"v".cast("double")).as("mx"),
            round(avg($"v".cast("double")), 6).as("mean"))
          .orderBy($"dim")
      },
      Some("""WITH e AS (
          SELECT unnest(range(0, len(embedding))) AS dim,
            unnest(embedding) AS v
          FROM embeddings)
        SELECT dim, count(*) AS n,
          min(CAST(v AS DOUBLE)) AS mn, max(CAST(v AS DOUBLE)) AS mx,
          round(avg(CAST(v AS DOUBLE)), 6) AS mean
        FROM e GROUP BY dim ORDER BY dim""")),

    // ---- ANN recall@10 — index QUALITY on the driver surface -----------
    // Every ANN deployment reports recall before anyone trusts the
    // index; DedupSimSpec pins recall floors in tests, and this entry
    // puts the NUMBER itself under the correctness gate: per query,
    // how many of the exact brute-force top-10 the nprobe=8 IVF probe
    // returned. Both lists are deterministic (cosine ties break by
    // vec_id on both engines; the rounded codebook re-derives
    // identically in SQL), so recall is exact-comparable — a changed
    // tie-break, codebook drift, or a posting-list bug moves it. Cost
    // is sim1 + sim2's plans plus one equi-join of two 10k-row lists;
    // at 100 TB the brute side runs on a fixed evaluation sample, the
    // standard recall-eval shape.
    Q("sim8_recall",
      (s, dir) => {
        import s.implicits._
        val e = withNorm(s, dir)
        val q = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
        val scored = e.join(broadcast(q), $"vec_id" =!= $"q_id")
          .select($"q_id", $"vec_id",
            (ndot(s, $"q_emb", $"embedding") / ($"q_nrm" * $"nrm")).as("cos"))
        val brute = graft.operators.TopKAgg.rank(scored, 10, "cos")
          .select($"q_id", $"vec_id")
        val (cents, assigned) = trainedCodebook(s, e)
        val ivf = graft.operators.IvfCodebook.topk(e, q, cents, assigned, 8, 10)
          .select($"q_id", $"vec_id")
        brute.join(ivf, Seq("q_id", "vec_id"))
          .groupBy($"q_id").agg(count(lit(1)).as("n_hits"))
          .select($"q_id", $"n_hits",
            round($"n_hits".cast("double") / 10.0, 2).as("recall_at_10"))
          .orderBy($"q_id")
      },
      Some(s"""WITH $codebookCtes,
        probes AS (
          SELECT q_id, c_id FROM (
            SELECT q.vec_id AS q_id, c.c_id, row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.embedding", "c.c_emb")} / (q.nrm * c.c_nrm) DESC, c.c_id) AS rn
            FROM n q CROSS JOIN c2 c WHERE q.vec_id < 10)
          WHERE rn <= 8),
        icand AS (
          SELECT DISTINCT p.q_id, a.vec_id,
            ${duckDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm) AS cos
          FROM probes p JOIN assigned a ON p.c_id = a.c_id AND a.vec_id <> p.q_id
          JOIN n q ON q.vec_id = p.q_id JOIN n e ON e.vec_id = a.vec_id),
        ivf AS (
          SELECT q_id, vec_id FROM (
            SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
              ORDER BY cos DESC, vec_id) AS rank FROM icand)
          WHERE rank <= 10),
        brute AS (
          SELECT q_id, vec_id FROM (
            SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
              row_number() OVER (PARTITION BY q.vec_id
                ORDER BY ${duckDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm) DESC,
                  e.vec_id) AS rank
            FROM n q JOIN n e ON q.vec_id < 10 AND e.vec_id <> q.vec_id)
          WHERE rank <= 10)
        SELECT q_id, CAST(count(*) AS BIGINT) AS n_hits,
          round(CAST(count(*) AS DOUBLE) / 10.0, 2) AS recall_at_10
        FROM brute JOIN ivf USING (q_id, vec_id)
        GROUP BY q_id ORDER BY q_id""")),

    // ---- recall/nprobe curve — the tuning surface as a driver row ------
    // sim8 pins recall at ONE operating point; this entry sweeps
    // nprobe ∈ {1,2,4,8} and reports mean recall@10 at each — the
    // curve an operator actually reads to pick the probe budget
    // (recall climbs with nprobe, cost is nprobe/|C| of the corpus per
    // query; the knee is the setting). Everything is exact-comparable
    // for the same reason as sim8 (rounded codebook, deterministic
    // tie-breaks), so a regression anywhere on the curve — not just at
    // nprobe=8 — moves a hashed number. The brute-force reference and
    // the posting lists are computed ONCE and persisted; each sweep
    // point reuses them, so the sweep costs 4 probe plans over the
    // same assignment, not 4 rebuilds.
    Q("sim11_nprobe_sweep",
      (s, dir) => {
        import s.implicits._
        val e = withNorm(s, dir)
        val q = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
        val scored = e.join(broadcast(q), $"vec_id" =!= $"q_id")
          .select($"q_id", $"vec_id",
            (ndot(s, $"q_emb", $"embedding") / ($"q_nrm" * $"nrm")).as("cos"))
        val brute = graft.operators.TopKAgg.rank(scored, 10, "cos")
          .select($"q_id", $"vec_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val (cents, assigned0) = trainedCodebook(s, e)
        val assigned = assigned0
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        Seq(1, 2, 4, 8).map { np =>
          graft.operators.IvfCodebook.topk(e, q, cents, assigned, np, 10)
            .select($"q_id", $"vec_id")
            .join(brute, Seq("q_id", "vec_id"))
            .agg(count(lit(1)).as("n_hits"))
            .select(lit(np).as("nprobe"), $"n_hits",
              round($"n_hits".cast("double") / 100.0, 2).as("mean_recall"))
        }.reduce(_.unionByName(_)).orderBy($"nprobe")
      },
      Some(s"""WITH $codebookCtes,
        nps(np) AS (VALUES (1), (2), (4), (8)),
        probes AS (
          SELECT np, q_id, c_id FROM (
            SELECT nps.np, q.vec_id AS q_id, c.c_id,
              row_number() OVER (PARTITION BY nps.np, q.vec_id
                ORDER BY ${duckDot("q.embedding", "c.c_emb")} / (q.nrm * c.c_nrm) DESC,
                  c.c_id) AS rn
            FROM n q CROSS JOIN c2 c CROSS JOIN nps WHERE q.vec_id < 10)
          WHERE rn <= np),
        icand AS (
          SELECT DISTINCT p.np, p.q_id, a.vec_id,
            ${duckDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm) AS cos
          FROM probes p JOIN assigned a ON p.c_id = a.c_id AND a.vec_id <> p.q_id
          JOIN n q ON q.vec_id = p.q_id JOIN n e ON e.vec_id = a.vec_id),
        ivf AS (
          SELECT np, q_id, vec_id FROM (
            SELECT np, q_id, vec_id, row_number() OVER (PARTITION BY np, q_id
              ORDER BY cos DESC, vec_id) AS rank FROM icand)
          WHERE rank <= 10),
        brute AS (
          SELECT q_id, vec_id FROM (
            SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
              row_number() OVER (PARTITION BY q.vec_id
                ORDER BY ${duckDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm) DESC,
                  e.vec_id) AS rank
            FROM n q JOIN n e ON q.vec_id < 10 AND e.vec_id <> q.vec_id)
          WHERE rank <= 10)
        SELECT np AS nprobe, CAST(count(*) AS BIGINT) AS n_hits,
          round(CAST(count(*) AS DOUBLE) / 100.0, 2) AS mean_recall
        FROM ivf JOIN brute USING (q_id, vec_id)
        GROUP BY np ORDER BY np""")),

    // ---- MMR diversified re-ranking of a retrieval shortlist -----------
    // Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998):
    // after top-k retrieval, greedily pick results that balance
    // relevance against redundancy — argmax λ·rel(c) − (1−λ)·max_{s∈S}
    // sim(c,s) — so a near-dup of an already-picked result loses to a
    // fresh one. The scale split is the point: the DISTRIBUTED part is
    // candidate generation (cosine scoring all n vectors, bounded
    // TopKAgg shortlist of 20) and the 380-row pairwise sim join among
    // candidates; the greedy loop then runs on the driver over that
    // BOUNDED shortlist (k²=400 doubles — the serve paths' bounded-
    // probe discipline; no per-pick Spark job). Every double on the
    // hash surface and inside the greedy comparison is the same
    // elementary-op sequence on both engines (ndot ≡ duckDot, pinned
    // by sim1), so the oracle's recursive-CTE greedy picks the
    // identical sequence.
    Q("sim12_mmr_rerank",
      (s, dir) => {
        import s.implicits._
        val e = withNorm(s, dir)
        val q = e.filter($"vec_id" === 0)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
        val scored = e.join(broadcast(q), $"vec_id" =!= $"q_id")
          .select($"q_id", $"vec_id",
            (ndot(s, $"q_emb", $"embedding") / ($"q_nrm" * $"nrm")).as("cos"))
        val cand = graft.operators.TopKAgg.rank(scored, 20, "cos")
          .select($"vec_id", $"cos")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cvec = cand.join(e, "vec_id")
          .select($"vec_id", $"embedding", $"nrm")
        val pairs = cvec.as("a").join(cvec.as("b"),
            col("a.vec_id") =!= col("b.vec_id"))
          .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
            (ndot(s, col("a.embedding"), col("b.embedding"))
              / (col("a.nrm") * col("b.nrm"))).as("sim"))
        // bounded driver-side greedy: 20 rel scores + 380 pairwise sims
        val rel = cand.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val sim = pairs.collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
        // 0.3 as a LITERAL, never 1 - 0.7: the subtraction rounds to
        // 0.30000000000000004 and the greedy would score with a
        // different double than the oracle's 0.3
        val lam = 0.7; val mu = 0.3
        val picked = scala.collection.mutable.ArrayBuffer[Long]()
        while (picked.size < 5) {
          val best = rel.keys.filterNot(picked.contains).minBy { c =>
            val ms = picked.map(p => sim((c, p))).maxOption.getOrElse(0.0)
            // negate score for minBy; tie → smaller id (second key)
            (-(lam * rel(c) - mu * ms), c)
          }
          picked += best
        }
        picked.toSeq.zipWithIndex.map { case (v, i) =>
          (i + 1L, v, rel(v))
        }.toDF("rank", "vec_id", "rel").orderBy($"rank")
      },
      Some(s"""WITH RECURSIVE n AS (
          SELECT vec_id, embedding,
            sqrt(${duckDot("embedding", "embedding")}) AS nrm
          FROM embeddings),
        qv AS (SELECT * FROM n WHERE vec_id = 0),
        cand AS (
          SELECT e.vec_id,
            ${duckDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm) AS rel
          FROM n e, qv q WHERE e.vec_id <> 0
          ORDER BY rel DESC, e.vec_id LIMIT 20),
        pair AS (
          SELECT a.vec_id AS a_id, b.vec_id AS b_id,
            ${duckDot("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) AS sim
          FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
          JOIN n na ON na.vec_id = a.vec_id
          JOIN n nb ON nb.vec_id = b.vec_id),
        sel AS (
          SELECT 0 AS step, CAST([] AS BIGINT[]) AS picked
          UNION ALL
          SELECT step + 1, list_append(picked, (
              SELECT c.vec_id FROM cand c
              WHERE NOT list_contains(picked, c.vec_id)
              ORDER BY 0.7 * c.rel - 0.3 * COALESCE((
                  SELECT max(p.sim) FROM pair p
                  WHERE p.a_id = c.vec_id
                    AND list_contains(picked, p.b_id)), 0.0) DESC,
                c.vec_id
              LIMIT 1))
          FROM sel WHERE step < 5)
        SELECT CAST(u.i AS BIGINT) AS rank, picked[u.i] AS vec_id, c.rel
        FROM (SELECT picked FROM sel WHERE step = 5) f,
          unnest(range(1, 6)) AS u(i)
        JOIN cand c ON c.vec_id = picked[u.i]
        ORDER BY rank""")),

    // ---- Matryoshka truncation probe: recall of prefix-dim search ----
    // The MRL question (Kusupati et al. 2022): how much of the top-10
    // neighborhood survives when vectors truncate to their first 16
    // dims (the cheap-first-pass / reranking configuration)? Both
    // rankings run the sim1 machinery — bounded TopKAgg, broadcast
    // query side, (score, id) total order — and the per-query overlap
    // joins the two 10-row lists (k² work per query, corpus-free).
    // Every dot/norm is the same left-fold elementary-op sequence on
    // both engines (the sim1 determinism argument), so overlap counts
    // sit on the hash gate exactly. At 100 TB the truncated pass is
    // the scan-cost lever: 4× fewer bytes per candidate.
    Q("sim14_mrl_overlap",
      (s, dir) => {
        import s.implicits._
        val e = Tables.load(s, dir, "embeddings")
          .select($"vec_id", $"embedding",
            slice($"embedding", 1, 16).as("emb16"))
        val withN = e.select($"vec_id", $"embedding", $"emb16",
          sqrt(ndot(s, $"embedding", $"embedding")).as("nrm"),
          sqrt(ndot(s, $"emb16", $"emb16")).as("nrm16")).persist()
        val q = withN.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
            $"emb16".as("q_emb16"), $"nrm".as("q_nrm"),
            $"nrm16".as("q_nrm16"))
        val joined = withN.join(broadcast(q), $"vec_id" =!= $"q_id").persist()
        val full = graft.operators.TopKAgg.rank(
          joined.select($"q_id", $"vec_id",
            (ndot(s, $"q_emb", $"embedding") / ($"q_nrm" * $"nrm")).as("cos")),
          10, "cos")
        val trunc = graft.operators.TopKAgg.rank(
          joined.select($"q_id", $"vec_id",
            (ndot(s, $"q_emb16", $"emb16") / ($"q_nrm16" * $"nrm16")).as("cos")),
          10, "cos")
        full.select($"q_id", $"vec_id")
          .join(trunc.select($"q_id", $"vec_id", lit(1L).as("m")),
            Seq("q_id", "vec_id"), "left")
          .groupBy($"q_id")
          .agg(coalesce(sum($"m"), lit(0L)).as("overlap10"))
          .orderBy($"q_id")
      },
      Some(s"""WITH n AS (
          SELECT vec_id, embedding, embedding[1:16] AS emb16,
            sqrt(${duckDot("embedding", "embedding")}) AS nrm,
            sqrt(list_reduce(list_transform(range(1, 17),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
              (x, y) -> x + y)) AS nrm16
          FROM embeddings),
        fullr AS (SELECT q_id, vec_id FROM (
          SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm)
                DESC, e.vec_id) AS rank
          FROM n q JOIN n e ON q.vec_id < 10 AND e.vec_id <> q.vec_id)
          WHERE rank <= 10),
        truncr AS (SELECT q_id, vec_id FROM (
          SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.emb16", "e.emb16")} / (q.nrm16 * e.nrm16)
                DESC, e.vec_id) AS rank
          FROM n q JOIN n e ON q.vec_id < 10 AND e.vec_id <> q.vec_id)
          WHERE rank <= 10)
        SELECT f.q_id, CAST(count(t.vec_id) AS BIGINT) AS overlap10
        FROM fullr f LEFT JOIN truncr t
          ON f.q_id = t.q_id AND f.vec_id = t.vec_id
        GROUP BY f.q_id ORDER BY f.q_id""")),

    // ---- Filtered vector search: metadata predicate inside the scan --
    // The filtered-ANN shape every vector store is judged on: top-5
    // neighbors restricted to candidates sharing the query's label.
    // The label equality is part of the JOIN KEY — candidates shuffle
    // by label, so each query scores only its own partition of the
    // corpus (pre-filter, the efficient plan) rather than searching
    // globally and discarding (post-filter, which wastes k on
    // filtered-out hits and can return fewer than k). At 100 TB with
    // a label-partitioned layout this becomes partition pruning: the
    // scan itself skips every other label's files. Scores ride the
    // sim1 determinism argument onto the hash gate.
    Q("sim16_filtered_ann",
      (s, dir) => {
        import s.implicits._
        val e = withNorm(s, dir)
        val q = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"label", $"embedding".as("q_emb"),
            $"nrm".as("q_nrm"))
        val scored = e.join(broadcast(q), Seq("label"))
          .filter($"vec_id" =!= $"q_id")
          .select($"q_id", $"vec_id",
            (ndot(s, $"q_emb", $"embedding") / ($"q_nrm" * $"nrm")).as("cos"))
        graft.operators.TopKAgg.rank(scored, 5, "cos")
          .orderBy($"q_id", $"rank")
      },
      Some(s"""WITH n AS (
          SELECT vec_id, label, embedding,
            sqrt(${duckDot("embedding", "embedding")}) AS nrm
          FROM embeddings)
        SELECT q_id, rank, vec_id, cos FROM (
          SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
            ${duckDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm) AS cos,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.embedding", "e.embedding")} /
                (q.nrm * e.nrm) DESC, e.vec_id) AS rank
          FROM n q JOIN n e ON q.vec_id < 10 AND e.label = q.label
            AND e.vec_id <> q.vec_id)
        WHERE rank <= 5 ORDER BY q_id, rank""")),

    // ---- Two-stage serve: truncated-dim shortlist, full-dim rerank ---
    // The production retrieval pattern sim14 motivates: a cheap first
    // pass over the 16-dim prefixes shortlists 50 candidates per
    // query (4× less scan per candidate at 100 TB), then ONLY those
    // 50 are re-scored at full precision for the final top-10. Both
    // stages ride the bounded TopKAgg (k rows per query cross the
    // shuffle, never the corpus); the rerank joins 50 rows per query
    // back to their full vectors — k-bounded work, the serve paths'
    // discipline. The oracle replays the exact two-stage pipeline, so
    // the hash pins the real served answer (including any recall loss
    // vs brute force — sim8/sim14 measure that; this row pins what
    // the serving tier actually returns).
    Q("sim15_two_stage_rerank",
      (s, dir) => {
        import s.implicits._
        val e = Tables.load(s, dir, "embeddings")
          .select($"vec_id", $"embedding",
            slice($"embedding", 1, 16).as("emb16"))
        val withN = e.select($"vec_id", $"embedding", $"emb16",
          sqrt(ndot(s, $"embedding", $"embedding")).as("nrm"),
          sqrt(ndot(s, $"emb16", $"emb16")).as("nrm16")).persist()
        val q = withN.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"),
            $"emb16".as("q_emb16"), $"nrm".as("q_nrm"),
            $"nrm16".as("q_nrm16"))
        val shortlist = graft.operators.TopKAgg.rank(
          withN.join(broadcast(q), $"vec_id" =!= $"q_id")
            .select($"q_id", $"vec_id",
              (ndot(s, $"q_emb16", $"emb16") /
                ($"q_nrm16" * $"nrm16")).as("cos")),
          50, "cos")
        val rerank = shortlist.select($"q_id", $"vec_id")
          .join(withN.select($"vec_id", $"embedding", $"nrm"), "vec_id")
          .join(broadcast(q.select($"q_id", $"q_emb", $"q_nrm")), "q_id")
          .select($"q_id", $"vec_id",
            (ndot(s, $"q_emb", $"embedding") / ($"q_nrm" * $"nrm"))
              .as("cos"))
        graft.operators.TopKAgg.rank(rerank, 10, "cos")
          .orderBy($"q_id", $"rank")
      },
      Some(s"""WITH n AS (
          SELECT vec_id, embedding, embedding[1:16] AS emb16,
            sqrt(${duckDot("embedding", "embedding")}) AS nrm,
            sqrt(list_reduce(list_transform(range(1, 17),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
              (x, y) -> x + y)) AS nrm16
          FROM embeddings),
        shortlist AS (SELECT q_id, vec_id FROM (
          SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.emb16", "e.emb16")} / (q.nrm16 * e.nrm16)
                DESC, e.vec_id) AS r
          FROM n q JOIN n e ON q.vec_id < 10 AND e.vec_id <> q.vec_id)
          WHERE r <= 50),
        rr AS (SELECT s.q_id, s.vec_id,
            ${duckDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm)
              AS cos,
            row_number() OVER (PARTITION BY s.q_id
              ORDER BY ${duckDot("q.embedding", "e.embedding")} /
                (q.nrm * e.nrm) DESC, s.vec_id) AS rank
          FROM shortlist s
          JOIN n e ON e.vec_id = s.vec_id
          JOIN n q ON q.vec_id = s.q_id)
        SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos
        FROM rr WHERE rank <= 10 ORDER BY q_id, rank""")),

    // ---- Per-label centroids: the embedding-drift monitor -------------
    // The statistic an embedding pipeline tracks between model
    // versions: the per-label mean vector, plus each label's drift
    // from the global centroid. posexplode flattens (label, dim, v)
    // row-locally — no vector ever materializes driver-side — and the
    // per-(label, dim) mean partial-aggregates before one shuffle of
    // labels × 64 dims, however many vectors feed it. Means and the
    // drift round to 6 decimals (the x14 ulp argument for reordered
    // float sums); the drift is |label-mean − global-mean| computed
    // FROM THE ROUNDED means, so both engines derive it from
    // hash-identical inputs.
    Q("sim13_centroid_drift",
      (s, dir) => {
        import s.implicits._
        val flat = Tables.load(s, dir, "embeddings")
          .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
          .select($"label", $"dim", $"v".cast("double").as("v"))
        val byLabel = flat.groupBy($"label", $"dim")
          .agg(count(lit(1)).as("n"), round(avg($"v"), 6).as("centroid"))
        val global = flat.groupBy($"dim")
          .agg(round(avg($"v"), 6).as("gcentroid"))
        byLabel.join(broadcast(global), "dim")
          .select($"label", $"dim", $"n", $"centroid",
            round(abs($"centroid" - $"gcentroid"), 6).as("drift"))
          .orderBy($"label", $"dim")
      },
      Some("""WITH flat AS (
          SELECT label, CAST(i - 1 AS INT) AS dim,
            CAST(embedding[i] AS DOUBLE) AS v
          FROM embeddings CROSS JOIN range(1, 65) t(i)
          WHERE i <= len(embedding)),
        bl AS (SELECT label, dim, count(*) AS n,
            round(avg(v), 6) AS centroid
          FROM flat GROUP BY 1, 2),
        g AS (SELECT dim, round(avg(v), 6) AS gcentroid
          FROM flat GROUP BY 1)
        SELECT label, bl.dim, n, centroid,
          round(abs(centroid - gcentroid), 6) AS drift
        FROM bl JOIN g ON bl.dim = g.dim
        ORDER BY label, bl.dim"""))
  )
}

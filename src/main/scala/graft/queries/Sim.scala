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
        val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
        scored.withColumn("rank", row_number().over(w))
          .filter($"rank" <= 10)
          .select($"q_id", $"rank".cast("long").as("rank"), $"vec_id", $"cos")
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
        val init = e.filter($"vec_id" % 50 === 0)
          .select($"vec_id".as("c_id"), $"embedding".as("c_emb"), $"nrm".as("c_nrm"))
        // tiny frame feeding two plan branches (assignment + probes):
        // persist so training runs once, not once per branch
        val cents = graft.operators.IvfCodebook.train(e, init, 2)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val assigned = graft.operators.IvfCodebook.assign(e, cents)
        val queries = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
        graft.operators.IvfCodebook.topk(e, queries, cents, assigned, 8, 10)
          .orderBy($"q_id", $"rank")
      },
      Some {
        // one Lloyd's round in SQL: assign to nearest centroid, then
        // re-center as the rounded per-dimension mean (list rebuilt in
        // dimension order, FLOAT like the Spark side)
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
        s"""WITH n AS (
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
        assigned AS ${assignCte("c2")},
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
        WHERE rank <= 10 ORDER BY q_id, rank"""
      })
  )
}

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
  * sim2 is the scale path: IVF-style coarse quantization — every vector
  * is assigned to its nearest centroid (broadcast centroid table), a
  * query probes its top-8 centroids and only scans those posting lists.
  * At 100 TB the corpus is partitioned by centroid id, so a probe
  * touches nprobe/|C| of the data; here centroids are a deterministic
  * sample (every 50th vector) standing in for a k-means codebook.
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

    // ---- IVF-bucketed ANN: assign → probe top-NPROBE centroids → rank --
    Q("sim2_ivf_topk",
      (s, dir) => {
        import s.implicits._
        val NPROBE = 8
        val e = withNorm(s, dir)
        val cents = e.filter($"vec_id" % 50 === 0)
          .select($"vec_id".as("c_id"), $"embedding".as("c_emb"), $"nrm".as("c_nrm"))
        // assign every vector to its nearest centroid (broadcast join).
        // Argmax via max_by partial aggregation, NOT row_number over a
        // window: the window shape sort-shuffles the full n×|C|
        // expansion; max_by combines map-side, shuffling ONE row per
        // vector (same rationale as Extract.itemCandidates' min_by
        // pivot). Tie-break = smallest c_id at equal cosine, encoded as
        // struct(ccos, -c_id) lexicographic max — identical to the
        // window's (ccos DESC, c_id ASC).
        val assigned = e.crossJoin(broadcast(cents))
          .select($"vec_id", $"c_id",
            (ndot(s, $"embedding", $"c_emb") / ($"nrm" * $"c_nrm")).as("ccos"))
          .groupBy($"vec_id")
          .agg(max_by($"c_id", struct($"ccos", (-$"c_id").as("nc"))).as("c_id"))
        // queries probe their top-NPROBE centroids
        val probes = e.filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding".as("q_emb"), $"nrm".as("q_nrm"))
          .crossJoin(broadcast(cents))
          .select($"q_id", $"q_emb", $"q_nrm", $"c_id",
            (ndot(s, $"q_emb", $"c_emb") / ($"q_nrm" * $"c_nrm")).as("ccos"))
          .withColumn("rn", row_number().over(
            Window.partitionBy($"q_id").orderBy($"ccos".desc, $"c_id")))
          .filter($"rn" <= NPROBE)
          .select($"q_id", $"q_emb", $"q_nrm", $"c_id")
        // scan only the probed posting lists
        val cand = probes.join(assigned, "c_id")
          .filter($"vec_id" =!= $"q_id")
          .join(e.select($"vec_id", $"embedding", $"nrm"), "vec_id")
          .select($"q_id", $"vec_id",
            (ndot(s, $"q_emb", $"embedding") / ($"q_nrm" * $"nrm")).as("cos"))
          .distinct()
        val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
        cand.withColumn("rank", row_number().over(w))
          .filter($"rank" <= 10)
          .select($"q_id", $"rank".cast("long").as("rank"), $"vec_id", $"cos")
          .orderBy($"q_id", $"rank")
      },
      Some(s"""WITH n AS (
          SELECT vec_id, embedding,
            sqrt(${duckDot("embedding", "embedding")}) AS nrm
          FROM embeddings),
        cents AS (
          SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm
          FROM n WHERE vec_id % 50 = 0),
        assigned AS (
          SELECT vec_id, c_id FROM (
            SELECT e.vec_id, c.c_id, row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${duckDot("e.embedding", "c.c_emb")} / (e.nrm * c.c_nrm) DESC, c.c_id) AS rn
            FROM n e CROSS JOIN cents c)
          WHERE rn = 1),
        probes AS (
          SELECT q_id, c_id FROM (
            SELECT q.vec_id AS q_id, c.c_id, row_number() OVER (PARTITION BY q.vec_id
              ORDER BY ${duckDot("q.embedding", "c.c_emb")} / (q.nrm * c.c_nrm) DESC, c.c_id) AS rn
            FROM n q CROSS JOIN cents c WHERE q.vec_id < 10)
          WHERE rn <= 8),
        cand AS (
          SELECT DISTINCT p.q_id, a.vec_id,
            ${duckDot("q.embedding", "e.embedding")} / (q.nrm * e.nrm) AS cos
          FROM probes p JOIN assigned a ON p.c_id = a.c_id AND a.vec_id <> p.q_id
          JOIN n q ON q.vec_id = p.q_id JOIN n e ON e.vec_id = a.vec_id)
        SELECT q_id, rank, vec_id, cos FROM (
          SELECT q_id, vec_id, cos, row_number() OVER (PARTITION BY q_id
            ORDER BY cos DESC, vec_id) AS rank FROM cand)
        WHERE rank <= 10 ORDER BY q_id, rank"""))
  )
}

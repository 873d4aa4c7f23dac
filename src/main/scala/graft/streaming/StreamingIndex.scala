package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.NativeExprs
import graft.operators.IvfCodebook
import graft.sources.Warehouse

/** Continuous vector indexing: the streaming composition of the
  * persisted IVF index (sim5). Each micro-batch of (vec_id, embedding)
  * vectors is assigned to its nearest centroid of the FROZEN codebook —
  * read from the centroids table and broadcast, exactly sim2's
  * `max_by` partial-agg assignment — and lands in the vectors table
  * and the postings table by keyed upsert. ANN queries (sim5's probe)
  * see a monotonically growing index; the codebook itself never
  * changes inside the stream.
  *
  * Scale shape: per-batch work is |batch| × |codebook| codegen'd dot
  * products plus two keyed upserts — independent of index size;
  * nothing ever rescans the vectors table. Codebook drift is a
  * MAINTENANCE concern, deliberately outside the stream: retrain on a
  * sample, publish new centroids, rebuild postings — each step a
  * table publish whose commit CAS races the stream the same way
  * compaction does (absorbed by the bounded retry below).
  *
  * Exactly-once: redelivery recomputes the same assignment (the
  * decision depends only on the frozen codebook and the batch), and
  * both commits are keyed upserts on vec_id — re-applying a batch is
  * a no-op. Vectors commit first: the crash window leaves a vector
  * unsearchable (missing posting) until redelivery heals it, never a
  * posting pointing at a vector that was lost.
  */
object StreamingIndex {

  /** Batch-side assignment, exposed for direct testing and one-shot
    * backfills: (vec_id, c_id) postings for `batch` against `cents`.
    */
  def postingsOf(batch: DataFrame, cents: DataFrame): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    val normed = batch.withColumn("nrm",
      sqrt(NativeExprs.dot(s, $"embedding", $"embedding")))
    IvfCodebook.assign(normed, cents)
  }

  /** Start the continuous indexer over a streaming (vec_id, embedding)
    * frame. `vectorsTable`, `postingsTable` and `centroidsTable` must
    * already exist in `wh` (seed them from a trained codebook, as
    * sim5 does).
    */
  def indexIngest(vecs: DataFrame, wh: Warehouse, vectorsTable: String,
      postingsTable: String, centroidsTable: String, checkpoint: String,
      commitRetries: Int = 2,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vecs.writeStream
      .queryName("ivf-index-ingest")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          def retrying(commit: => Unit): Unit = {
            var attempt = 0
            var done = false
            while (!done) {
              try { commit; done = true }
              catch {
                case e: java.util.ConcurrentModificationException =>
                  if (attempt >= commitRetries) throw e
                  attempt += 1
              }
            }
          }
          // same per-batch cache discipline as StreamingDedup: persist
          // what this batch references twice, drain everything the
          // batch created once its commits land
          val sc = batch.sparkSession.sparkContext
          val before = sc.getPersistentRDDs.keySet
          val b = batch.persist()
          try {
            val postings = postingsOf(b, wh.read(centroidsTable))
            retrying(wh.upsert(vectorsTable, b, Seq("vec_id")))
            retrying(wh.upsert(postingsTable, postings, Seq("vec_id")))
          } finally {
            b.unpersist()
            val after = sc.getPersistentRDDs
            after.keySet.diff(before).foreach(id =>
              after.get(id).foreach(_.unpersist(false)))
          }
        }
      }
      .start()

  /** CDC-style continuous index MAINTENANCE: a stream of
    * (vec_id, embedding, op) change events — op "u" upserts (frozen-
    * codebook assignment + keyed upsert, exactly `indexIngest`), op
    * "d" DELETES the id from the index via the warehouse's anti-join
    * delete (sim9's batch op, applied per micro-batch). A key with
    * both ops in ONE batch converges on the delete (upserts apply
    * first — the tombstone-wins reading of an unordered CDC batch).
    *
    * Commit order per batch: upserts land vectors-then-postings (a
    * crash leaves a vector unsearchable, never a dangling posting);
    * deletes land postings-then-vectors (a half-deleted doc stops
    * being SERVED before its data goes — the probe never surfaces
    * it). Both directions heal on redelivery: every op is a keyed
    * upsert or anti-join delete, idempotent by construction, so
    * re-applying a batch is a no-op — the exactly-once story is
    * unchanged from `indexIngest`.
    *
    * Scale shape: per-batch cost is |batch| assignment dots + four
    * keyed publishes bounded by |batch| and the touched partitions —
    * nothing rescans the index; deletes cost one anti-join over the
    * two tables, the same shape as the batch path.
    */
  def indexMaintain(changes: DataFrame, wh: Warehouse, vectorsTable: String,
      postingsTable: String, centroidsTable: String, checkpoint: String,
      commitRetries: Int = 2,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    changes.writeStream
      .queryName("ivf-index-maintain")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          def retrying(commit: => Unit): Unit = {
            var attempt = 0
            var done = false
            while (!done) {
              try { commit; done = true }
              catch {
                case e: java.util.ConcurrentModificationException =>
                  if (attempt >= commitRetries) throw e
                  attempt += 1
              }
            }
          }
          val sc = batch.sparkSession.sparkContext
          val before = sc.getPersistentRDDs.keySet
          val b = batch.persist()
          try {
            val ups = b.filter(col("op") === "u")
              .select(col("vec_id"), col("embedding"))
            val dels = b.filter(col("op") === "d").select(col("vec_id"))
            if (!ups.isEmpty) {
              val postings = postingsOf(ups, wh.read(centroidsTable))
              retrying(wh.upsert(vectorsTable, ups, Seq("vec_id")))
              retrying(wh.upsert(postingsTable, postings, Seq("vec_id")))
            }
            if (!dels.isEmpty) {
              retrying(wh.delete(postingsTable, dels, Seq("vec_id")))
              retrying(wh.delete(vectorsTable, dels, Seq("vec_id")))
            }
          } finally {
            b.unpersist()
            val after = sc.getPersistentRDDs
            after.keySet.diff(before).foreach(id =>
              after.get(id).foreach(_.unpersist(false)))
          }
        }
      }
      .start()
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.queries.Dedup
import graft.sources.Warehouse

/** Continuous near-dup-gated corpus ingest: the streaming composition
  * of the persisted LSH index (d11) and the incremental probe (d9).
  * Each micro-batch of (doc_id, text) documents is probed against the
  * index TABLE — never against corpus text, which is not even read —
  * and only documents that near-dup neither the corpus nor a
  * smaller-id batch member are admitted. Admitted documents land in
  * the corpus table AND their own index rows land in the index table,
  * so the next micro-batch probes a fresh index: the stream maintains
  * its own dedup state as a queryable warehouse table instead of
  * unbounded executor state.
  *
  * Scale shape (100 TB corpus, continuous ingest): per-batch work is
  * |batch| shingling + signature passes plus a band-key equi-join
  * against the index — ∝ batch size and collision rate, independent
  * of corpus size. The admitted fraction is appended, so the index
  * grows by exactly the accepted rows; nothing ever rescans the
  * corpus.
  *
  * Exactly-once: the checkpoint makes redelivery at-least-once, and
  * both commits are keyed upserts on doc_id, so re-applying a batch
  * is a no-op. A crash between the corpus commit and the index commit
  * heals on redelivery: the probe decision depends only on the index
  * (unchanged), so the same accept set is recomputed and both upserts
  * converge. A batch redelivered after BOTH commits re-probes against
  * an index that now contains its own accepted docs — self-pairs are
  * excluded by id, and the accept rule depends only on ids and the
  * pair set, so the decision is unchanged and the upserts are no-ops.
  */
object StreamingDedup {

  /** The batch-side accept decision, exposed for direct testing and
    * for one-shot backfills: drop every batch document that is ≥ tau
    * Jaccard-similar to an already-indexed document or to ANY
    * smaller-id batch member (the deterministic set policy of d8's
    * `kept` — no order-dependent greedy chains).
    */
  def acceptedOf(batch: DataFrame, index: DataFrame, tau: Double): DataFrame = {
    val s = batch.sparkSession
    import s.implicits._
    val pairs = Dedup.incrementalPairsAgainstIndex(index, batch, tau)
    // orient each pair both ways; x is dropped when the partner is
    // corpus-resident or an earlier batch member. Corpus ids showing
    // up as x are harmless — the anti-join below only removes batch
    // rows.
    val sym = pairs.select($"a_id".as("x"), $"b_id".as("y"))
      .unionByName(pairs.select($"b_id".as("x"), $"a_id".as("y")))
    val dup = sym
      .join(index.select($"doc_id".as("y"), lit(true).as("in_corpus")),
        Seq("y"), "left")
      .filter(coalesce($"in_corpus", lit(false)) || $"y" < $"x")
      .select($"x".as("doc_id")).distinct()
    batch.join(dup, Seq("doc_id"), "left_anti")
  }

  /** Start the gated ingest over a streaming (doc_id, text) frame.
    * `corpusTable` and `indexTable` must already exist in `wh` (seed
    * them with `atomicPublish` + `Dedup.buildLshIndex`); tau is the
    * Jaccard admit threshold. Commit CAS losses against a concurrent
    * maintenance publisher are absorbed `commitRetries` times per
    * table (the sinkToWarehouse rationale), then propagated loudly.
    */
  def dedupIngest(docs: DataFrame, wh: Warehouse, corpusTable: String,
      indexTable: String, tau: Double, checkpoint: String,
      commitRetries: Int = 2,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .queryName("dedup-gated-ingest")
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
          // The probe pipeline persists intermediates internally
          // (incrementalPairsAgainstIndex/buildLshIndex cache the
          // shingled and signature frames they reference twice). In a
          // one-shot batch query that cache dies with the job; in a
          // CONTINUOUS stream it would accumulate per micro-batch —
          // so drain every cache entry this batch created once its
          // commits are done. foreachBatch bodies run serially per
          // query, so the before/after diff is exactly this batch's.
          // (CacheManager keeps plan-level metadata for the drained
          // entries — bytes, not blocks, and per-batch plans never
          // recur, so nothing can re-materialize them.)
          val sc = batch.sparkSession.sparkContext
          val before = sc.getPersistentRDDs.keySet
          val b = batch.persist()
          try {
            val accepted = acceptedOf(b, wh.read(indexTable), tau).persist()
            // corpus first, index second: the crash window between
            // them leaves the doc invisible to the NEXT probe, which
            // at worst re-accepts the same content under redelivery —
            // the reverse order could reject a document whose text
            // never reached the corpus
            retrying(wh.upsert(corpusTable, accepted, Seq("doc_id")))
            retrying(wh.upsert(indexTable, Dedup.buildLshIndex(accepted),
              Seq("doc_id")))
          } finally {
            b.unpersist()
            val after = sc.getPersistentRDDs
            (after.keySet.diff(before)).foreach(id =>
              after.get(id).foreach(_.unpersist(false)))
          }
        }
      }
      .start()
}

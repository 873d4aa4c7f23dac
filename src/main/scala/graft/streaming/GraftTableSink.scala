package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.sources.Warehouse

/** Structured Streaming SINK into a manifest Warehouse table —
  * `df.writeStream.format("graft-table")` — the write-side twin of
  * [[ChangeFeedSource]] (reference analogue: the repository
  * bulk-insert/merge write paths in utils/repositories/
  * base_repository.py:55-61, lifted to a continuous writer). Together
  * they close the loop: a table can be both the head and the tail of
  * a streaming pipeline with exactly-once semantics at BOTH ends.
  *
  * EXACTLY-ONCE: Structured Streaming re-offers the in-flight
  * micro-batch after a crash (its own commit log records a batch only
  * after `addBatch` returns), so an at-least-once sink duplicates
  * exactly that batch. This sink runs every batch through
  * `Warehouse.commitIfNewEpoch(table, appId, batchId)` — the Delta
  * `txnAppId`/`txnVersion` protocol: the (appId, epoch) tag rides the
  * manifest HEADER, atomic with the data, and a replayed epoch is
  * skipped without touching the table. The appId defaults to the
  * query's checkpoint location (stable across restarts; `runId` is
  * not) and can be pinned explicitly with `txnAppId` for
  * checkpoint-migration scenarios.
  *
  * Modes (option `mode`, default from the query's OutputMode):
  *  - `append`   — `Warehouse.append`: O(delta) manifest commit, the
  *                 current hive layout preserved; first batch CREATES
  *                 the table (partitioned per `.partitionBy`).
  *  - `upsert`   — `Warehouse.upsert` keyed on option `keys` (comma-
  *                 separated): the streaming MERGE shape (CDC
  *                 ingestion) as one atomic commit per batch.
  *  - `complete` — full-snapshot replace via `atomicPublish`: the
  *                 natural pairing with OutputMode.Complete streaming
  *                 aggregates (each trigger emits the whole result).
  *  - `cdc`      — the batch IS a change feed (`_change_type` ∈
  *                 insert|delete, `_commit_version` — exactly what
  *                 `readStream.option("readChangeFeed","true")`
  *                 serves): collapse to the LAST change per key, then
  *                 apply as ONE atomic `mergeRows` commit (matched
  *                 delete → DELETE, matched insert → UPDATE SET *,
  *                 unmatched insert → INSERT *). Chaining the CDF
  *                 source into this mode replicates a table
  *                 EXACTLY-ONCE end to end — the Delta "merge the
  *                 change feed in foreachBatch" recipe as a
  *                 first-class sink. Requires `keys` unique per row
  *                 in the upstream table (the CDC identity).
  *
  * CONTENTION: append rebases automatically; upsert/complete abort
  * loudly on a concurrent foreign commit (their outputs are computed
  * from the base snapshot). The stream then fails and its restart
  * replays the batch — the epoch check keeps that exactly-once.
  *
  * 100 TB stance: `addBatch` re-wraps the micro-batch's already-
  * planned RDD as a batch frame (BatchAsStream.rebatch) and hands it
  * to the ordinary DISTRIBUTED write paths — no driver
  * materialization, no per-row sink state; the only driver work is
  * the manifest commit every batch already pays.
  */
class GraftTableSinkProvider extends StreamSinkProvider with DataSourceRegister {
  /** `writeStream.format("graft-table")` — registered through the
    * standard META-INF/services mechanism.
    */
  override def shortName(): String = "graft-table"

  override def createSink(ctx: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink =
    new GraftTableSink(ctx, parameters, partitionColumns, outputMode)
}

class GraftTableSink(ctx: SQLContext, parameters: Map[String, String],
    partitionColumns: Seq[String], outputMode: OutputMode)
    extends Sink {

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[GraftTableSink])

  private val root = parameters.getOrElse("root",
    throw new IllegalArgumentException(
      "graft-table sink: option 'root' (warehouse root) is required"))
  private val table = parameters.getOrElse("table",
    throw new IllegalArgumentException(
      "graft-table sink: option 'table' is required"))
  private val appId = parameters.get("txnAppId")
    .orElse(parameters.get("checkpointLocation"))
    .getOrElse(throw new IllegalArgumentException(
      "graft-table sink: exactly-once needs a stable writer identity — " +
      "set option 'checkpointLocation' (the default identity) or pin " +
      "option 'txnAppId' explicitly"))
  private val mode = parameters.get("mode").map(_.toLowerCase).getOrElse {
    if (outputMode == OutputMode.Complete()) "complete" else "append"
  }
  private val keys: Seq[String] = parameters.get("keys")
    .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
  require(Set("append", "upsert", "complete", "cdc").contains(mode),
    s"graft-table sink: unknown mode '$mode' (append | upsert | complete | cdc)")
  require(!Set("upsert", "cdc").contains(mode) || keys.nonEmpty,
    s"graft-table sink: mode=$mode requires option 'keys' (comma-separated)")

  private val wh = new Warehouse(ctx.sparkSession, root, manifest = true)

  override def addBatch(batchId: Long, data: DataFrame): Unit =
    Warehouse.prof(s"sink: addBatch($mode)")(addBatch0(batchId, data))

  private def addBatch0(batchId: Long, data: DataFrame): Unit = {
    val batch = org.apache.spark.sql.graft.BatchAsStream.rebatch(data)
    val ran = wh.commitIfNewEpoch(table, appId, batchId) {
      mode match {
        case "complete" =>
          wh.atomicPublish(table, batch, partitionColumns)
        case "upsert" =>
          wh.upsert(table, batch, keys, partitionColumns)
        case "append" =>
          if (!wh.exists(table)) wh.atomicPublish(table, batch, partitionColumns)
          else wh.append(table, batch)
        case "cdc" =>
          applyCdc(batch)
      }
    }
    if (!ran) log.info(
      s"graft-table sink: skipped replayed epoch $batchId for '$table' " +
      s"(appId=$appId already committed it)")
  }

  /** CDC apply: one micro-batch of change-feed rows → one atomic merge
    * commit. A batch can span several upstream commits touching the
    * same key (and an UPDATE is a delete+insert pair within one
    * commit), so the rows first collapse to the key's LAST state —
    * `_commit_version` descending, insert over delete within a version
    * — a window over the batch, cost ∝ batch. The merge itself is
    * `Warehouse.mergeRows`: touched-rows cost, never a table rewrite.
    */
  private def applyCdc(batch: DataFrame): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number, when}
    val metaCols = Set("_change_type", "_commit_version", "_commit_timestamp")
    require(Seq("_change_type", "_commit_version").forall(batch.columns.contains),
      "graft-table sink mode=cdc: the stream must carry _change_type and " +
      "_commit_version — read it with option(\"readChangeFeed\",\"true\")")
    val dataCols = batch.columns.filterNot(metaCols).toSeq
    require(keys.forall(dataCols.contains),
      s"graft-table sink mode=cdc: keys ${keys.mkString(",")} must be feed columns")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_commit_version").desc,
        when(col("_change_type") === "insert", 1).otherwise(0).desc)
    // PERSIST the collapsed per-key state (round 19): the merge
    // consumes its source TWICE (matched pairs, then the not-matched
    // anti-join+count), and this source's lineage is the whole CDC
    // feed — per-version manifest scans, DV joins and exceptAll churn
    // cancellation. Unpersisted, that feed executed once per consumer
    // (the measured bulk of a drain); cached, it runs once and both
    // merge passes read KB of collapsed rows. Cost ∝ batch, guide §5's
    // "reused AND expensive to recompute" case exactly.
    val last = batch.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(dataCols.map(col) :+ col("_change_type"): _*)
      .persist()
    try {
      if (!wh.exists(table)) {
        // first batch bootstraps the replica from the feed's net inserts
        wh.atomicPublish(table,
          last.where(col("_change_type") === "insert").drop("_change_type"),
          partitionColumns)
      } else {
        val assigns = dataCols.map(c => c -> col(s"_src_$c")).toMap
        wh.mergeRows(table, last, keys.map(k => k -> k),
          matched = Seq(
            Warehouse.MergeDeleteClause(
              Some(col("_src__change_type") === "delete")),
            Warehouse.MergeUpdateClause(None, assigns)),
          notMatched = Seq(Warehouse.MergeInsertClause(
            Some(col("_src__change_type") === "insert"), assigns)),
          notMatchedBySource = Nil)
      }
    } finally {
      last.unpersist()
      ()
    }
  }

  override def toString: String = s"GraftTableSink[$root/$table, mode=$mode]"
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** The one Spark-internal bridge the v1 streaming `Source` contract
  * forces: `MicroBatchExecution` asserts every `getBatch` result has
  * `isStreaming = true` on its leaf plan, and the only sanctioned way
  * to stamp that on an arbitrary computed DataFrame is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`,
  * which is `private[sql]` — hence this shim lives under
  * `org.apache.spark.sql`. This is the same bridge `FileStreamSource`
  * uses internally and the standard shape for third-party v1 sources
  * (Delta's early streaming source did exactly this). The RDD comes
  * from `queryExecution.toRdd`, so the batch plan stays LAZY — nothing
  * executes until the micro-batch itself runs.
  */
object BatchAsStream {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** Inverse bridge for the v1 streaming `Sink` contract: the
    * DataFrame handed to `addBatch` is planned by the running
    * stream's IncrementalExecution and still carries the streaming
    * flag, so handing it to a batch write path would trip the
    * UnsupportedOperationChecker. Re-wrap its ALREADY-PLANNED RDD as
    * a batch frame — the micro-batch plan executes exactly once, when
    * the sink's own write runs (the DeltaSink/ForeachBatchSink shape).
    */
  def rebatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Inverse stamp — re-marks a `getBatch` result as a batch frame so
    * it can be collected OUTSIDE a running stream. Test seam only: the
    * crash-replay and retention-race specs drive a Source's
    * getOffset/getBatch protocol directly (a live MicroBatchExecution
    * cannot schedule those interleavings deterministically) and then
    * need to assert on the served rows.
    */
  def unstamp(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    df.queryExecution.logical match {
      // reuse the stamped frame's UNDERLYING RDD — re-planning via
      // queryExecution.toRdd on the streaming-flagged frame would trip
      // the batch UnsupportedOperationChecker it exists to bypass
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        spark.internalCreateDataFrame(l.rdd, df.schema, isStreaming = false)
      case _ => df
    }
  }
}

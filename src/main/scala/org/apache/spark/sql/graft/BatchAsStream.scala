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
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are single parquet files under an sf-dir; at cluster scale
  * these would be partitioned datasets — the loader keeps that swap
  * localized here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val NanosKey = "spark.sql.legacy.parquet.nanosAsLong"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
      // outright. Read the raw int64 nanos and truncate to a microsecond
      // timestamp (exact integer arithmetic — `div`, not `/`). The conf
      // write is guarded so repeated loads don't churn session state.
      if (!spark.conf.getOption(NanosKey).contains("true"))
        spark.conf.set(NanosKey, "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}

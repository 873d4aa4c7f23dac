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
      // events.ts has shipped both as parquet TIMESTAMP(NANOS) — which
      // Spark 4 rejects outright unless read as raw int64 under
      // nanosAsLong — and as plain TIMESTAMP(MICROS) (no UTC flag →
      // Spark infers TIMESTAMP_NTZ). Never assume one physical type:
      // dispatch on what the scan actually produces, and normalize every
      // variant to TimestampType so downstream consumers (unix_micros,
      // watermarks, window()) see one stable type.
      //  - LongType: nanos under nanosAsLong → truncate to microseconds
      //    (exact integer arithmetic — `div`, not `/`);
      //  - TimestampNTZType: cast — the catalog runs sessions in UTC, so
      //    the wall-clock reinterpretation is value-identical to what
      //    the DuckDB oracle computes from the same naive column;
      //  - TimestampType: pass through.
      // The conf write is guarded so repeated loads don't churn session
      // state, and is harmless for micros data (it only affects NANOS
      // columns).
      if (!spark.conf.getOption(NanosKey).contains("true"))
        spark.conf.set(NanosKey, "true")
      val df = readOne(spark, s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else {
      readOne(spark, s"$sfDir/$name.parquet")
    }
  }

  /** Scale-adaptive compute spreading for per-row-EXPENSIVE pipelines
    * (shingling, tokenization, hashing): when the planned scan yields
    * fewer partitions than the session's shuffle parallelism — the
    * small-file / single-file corpus case, where a 64-perm MinHash
    * pass was measured running on 1-3 of 32 cores — round-robin
    * repartition up to that parallelism so the expression work uses
    * the machine (guide §2.5, "one huge unsplittable file: repartition
    * immediately after the read"). A corpus-scale input (at least as
    * many splits as the session parallelism) passes through UNTOUCHED,
    * so this never adds a shuffle where the scan already parallelizes;
    * round-robin keeps Spark's sort-before-repartition determinism.
    * Only worth it when downstream per-row work dwarfs one pass of
    * shuffle I/O over the rows — callers choose.
    */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n)
  }

  /** `spark.read.parquet(path)` minus the one-task schema-inference
    * JOB: the footer is read driver-side (ParquetSchema.infer — the
    * same conversion inference performs, honoring the live session
    * conf) and passed explicitly. Sound for the single-schema testdata
    * shapes (one file / one uniformly-written directory); falls back
    * to ordinary inference when no footer is readable. Saves one job +
    * scheduling gap per load call, hundreds of times per bench run.
    */
  private[graft] def readOne(spark: SparkSession, path: String): DataFrame =
    org.apache.spark.sql.graft.ParquetSchema.infer(spark, path) match {
      case Some(st) => spark.read.schema(st).parquet(path)
      case None     => spark.read.parquet(path)
    }
}

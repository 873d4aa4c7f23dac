package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.etl.{Ingest, Model, Standardize}
import graft.sources.{EdinetCsv, Warehouse}

/** Streaming variant of the §3.2 ingest: `readStream` over the EDINET
  * landing directory, `foreachBatch` running the same set-oriented
  * Ingest against the warehouse. `Trigger.AvailableNow` gives the
  * reference's "process everything landed, then stop" batch semantics;
  * a processing-time trigger turns the same code into continuous
  * incremental ingest. Checkpointing makes each file
  * exactly-once-per-batch, and the deterministic hash keys make
  * re-delivery idempotent anyway.
  */
object StreamingIngest {

  def start(
      spark: SparkSession,
      csvDir: String,
      wh: Warehouse,
      checkpoint: String,
      variant: EdinetCsv.Variant = EdinetCsv.Utf16Tab,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {

    val raw = spark.readStream
      .schema(Model.rawSchema)
      .option("header", "true")
      .option("sep", variant.sep)
      .option("encoding", variant.encoding)
      .option("multiLine", "true") // whole-file: charset + _rid order
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.csv")
      .option("maxFilesPerTrigger", "64")
      .csv(csvDir)

    // doc_id/_rid are derived inside foreachBatch: the micro-batch is a
    // plain DataFrame there (monotonically_increasing_id is not allowed
    // on streaming frames)
    raw.writeStream
      .queryName("edinet-ingest")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val staged = Standardize(EdinetCsv.withDocColumns(batch)).persist()
          try {
            val quarantine = new Ingest(spark, wh).runStaged(staged, strict = false)
            // quarantined docs must stay visible: persist them alongside
            // the warehouse tables (dropping the returned DF would make
            // duplicate/invalid filings vanish without a trace)
            if (!quarantine.isEmpty)
              wh.append("quarantine",
                quarantine.withColumn("batch_id",
                  org.apache.spark.sql.functions.lit(batchId)))
          } finally { staged.unpersist(); () }
        }
      }
      .start()
  }
}

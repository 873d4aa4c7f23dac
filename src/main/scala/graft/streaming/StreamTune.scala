package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Scale-adaptive partitioning for micro-batch streams.
  *
  * Stateful streaming disables AQE outright (Spark logs it at every
  * stream start), so a stream's shuffle AND state-store partition
  * count is whatever `spark.sql.shuffle.partitions` happens to be at
  * first batch — a constant tuned for neither the stream's rate nor
  * the local box. On the bench geometry (local[32], shuffle=32) every
  * KB-sized micro-batch paid 32 state-store instances per stateful
  * operator per trigger (a stream-stream join keeps FOUR stores per
  * partition), which round-18 measured as the dominant cost of the
  * streaming family: m33_stream_join 12.5 s at 32 state partitions vs
  * 3.9 s at 4, identical results. At cluster scale the same constant
  * is wrong in the opposite direction.
  *
  * This helper is the AQE-coalescing analogue for streams: derive the
  * partition count from the per-trigger INPUT SIZE (bytes /
  * `spark.graft.stream.bytesPerStatePartition`, default 64 MB — guide
  * §2.2's partition-sizing band), clamped to [1, session
  * shuffle.partitions]. A deployment that sized its session conf for
  * the cluster keeps it as the ceiling (big streams are untouched);
  * demonstrably tiny triggers stop paying per-partition fixed costs.
  * The count is pinned into the checkpoint by Spark at first batch,
  * exactly as if the operator had been sized by hand.
  */
object StreamTune {

  /** Total data-file bytes under `path`, recursively (driver-side
    * listing — the same listing the file stream source performs).
    */
  def dirBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(d: Path): Long =
      (try fs.listStatus(d).toSeq catch {
        case _: java.io.FileNotFoundException => Seq.empty
      }).map { st =>
        val n = st.getPath.getName
        if (n.startsWith(".") || n.startsWith("_")) 0L
        else if (st.isDirectory) walk(st.getPath)
        else st.getLen
      }.sum
    walk(p)
  }

  /** Scale-adaptive state/shuffle partition count for a stream whose
    * per-trigger input is ~`inputBytes` (see class doc).
    */
  def statePartitions(spark: SparkSession, inputBytes: Long): Int = {
    val per = spark.conf.getOption("spark.graft.stream.bytesPerStatePartition")
      .map(_.toLong).getOrElse(64L << 20)
    val ceiling = spark.sessionState.conf.numShufflePartitions
    math.max(1L, math.min(ceiling.toLong,
      (inputBytes + per - 1) / math.max(1L, per))).toInt
  }

  /** Run `body` — a FULL stream drain, `.start()` through
    * `awaitTermination()` — under `spark.sql.shuffle.partitions = n`,
    * restoring the previous value afterwards. The conf must span the
    * whole drain, not just `.start()`: MicroBatchExecution clones the
    * session (capturing the conf) on its own thread after `start()`
    * returns, so restoring early would race the clone.
    */
  def scoped[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    // At n == 1 every shuffle in the drain has a single partition, so
    // AQE has nothing to coalesce or skew-split — but it still splits
    // each batch action into one Spark job per query stage, and a
    // micro-batch drain is exactly the death-by-tiny-jobs regime where
    // the per-job driver latency (plan + schedule, measured 15-170 ms
    // per job on s51's drains) dominates the work itself. Disable it
    // for the drain's scope in that degenerate case only; any derived
    // n > 1 (a real per-trigger volume) keeps the session's AQE.
    val aqeKey = "spark.sql.adaptive.enabled"
    val old = spark.conf.getOption(key)
    val oldAqe = if (n == 1) spark.conf.getOption(aqeKey) else None
    spark.conf.set(key, n.toString)
    if (n == 1) spark.conf.set(aqeKey, "false")
    try body
    finally {
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
      if (n == 1) oldAqe match {
        case Some(v) => spark.conf.set(aqeKey, v)
        case None    => spark.conf.unset(aqeKey)
      }
    }
  }

  /** `scoped` with the partition count derived from a landing
    * directory — the file-source stream shape.
    */
  def scopedForDir[T](spark: SparkSession, landingDir: String)(body: => T): T =
    scoped(spark, statePartitions(spark, dirBytes(spark, landingDir)))(body)
}

package graft
import org.apache.spark.sql.SparkSession

/** Debug harness: run one catalog query by name (args: name sfDir). */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    // debug-harness knobs: mirror the bench's core/shuffle geometry
    // (SPARK_GRAFT_CPUS=32) or sweep it, without touching Bench
    val cpus = sys.env.getOrElse("SPARK_GRAFT_RUNONE_CPUS", "8")
    val shuf = sys.env.getOrElse("SPARK_GRAFT_RUNONE_SHUF", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.logging.maxLines", "-1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 3).foreach { i =>
      // per-run cold cache: queries that persist intermediates would
      // otherwise time the warm cache from run 1 (see Bench)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[runone] $name run$i rows=$n ${sec}%.2fs")
    }
    spark.stop()
  }
}

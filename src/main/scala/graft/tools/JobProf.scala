package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness: run one catalog query with a listener
  * that prints every Spark job's wall time, task count and call site —
  * the per-action decomposition RunOne/SINK_PROF can't see (args:
  * name sfDir [runs]). Mirrors the bench geometry via
  * SPARK_GRAFT_RUNONE_CPUS / _SHUF like RunOne.
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_RUNONE_CPUS", "32")
    val shuf = sys.env.getOrElse("SPARK_GRAFT_RUNONE_SHUF", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    @volatile var t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse(js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
            .getOrElse("?"))
        val nTasks = js.stageInfos.map(_.numTasks).sum
        starts.put(js.jobId, (System.nanoTime(), site, nTasks))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (s, site, nTasks) =>
          val now = System.nanoTime()
          System.out.println(String.format(java.util.Locale.ROOT,
            "[jobprof] t=%8.3f job=%-4d %8.3fs tasks=%-4d %s",
            Double.box((s - t0) / 1e9), Int.box(je.jobId),
            Double.box((now - s) / 1e9), Int.box(nTasks), site))
        }
      }
    })
    (1 to runs).foreach { i =>
      spark.catalog.clearCache()
      graft.sources.Scratch.clearAll()
      t0 = System.nanoTime()
      println(s"[jobprof] ===== run $i =====")
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[jobprof] $name run$i rows=$n ${sec}%.2fs")
    }
    spark.stop()
  }
}

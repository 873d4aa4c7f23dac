package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Measurement-only harness: run one catalog query with a job-level
  * listener and print every Spark job's wall time and description —
  * the decomposition RunOne's single number can't give. Test scope on
  * purpose: never ships.  args: name sfDir
  */
object ProfOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, d) =>
          rows.add((j.jobId, (System.nanoTime() - t0) / 1e9, d))
        }
      }
    })
    (1 to 2).foreach { i =>
      rows.clear()
      spark.catalog.clearCache()
      graft.sources.Scratch.clearAll()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val rs = rows.asScala.toSeq.sortBy(_._1)
      println(f"[profone] $name run$i rows=$n total=$sec%.2fs jobs=${rs.size}")
      if (i == 2) rs.foreach { case (id, s, d) =>
        println(f"[profjob] #$id%-4d $s%7.3fs  ${d.take(110)}")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off attribution profiler for the index-lifecycle drift
  * (VERDICT r10 "What's wrong #2"): times each phase of the
  * sim10-shaped publish cycle — parquet write, sidecar footer pass,
  * commit protocol, and the read-back — so a regression shows up AS A
  * PHASE, not a guess. `runMain graft.tools.PublishProfile <sfDir>`.
  */
object PublishProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      r
    }

    val e = graft.Tables.load(spark, sfDir, "embeddings")
    (1 to 3).foreach { round =>
      System.err.println(s"--- cycle $round ---")
      val tmp = java.nio.file.Files.createTempDirectory("pubprof").toString
      val wh = new graft.sources.Warehouse(spark, tmp, manifest = true)
      time("publish postings (full)") {
        wh.atomicPublish("p", e.select($"vec_id", ($"vec_id" % 64).as("c_id")))
      }
      time("publish tombstones") {
        wh.atomicPublish("t", e.filter($"vec_id" % 7 === 0).select($"vec_id"))
      }
      time("read + anti-join + count") {
        wh.read("p").join(broadcast(wh.read("t")), Seq("vec_id"), "left_anti")
          .count()
      }
      time("republish filtered") {
        wh.atomicPublish("p", wh.read("p").filter($"vec_id" % 3 =!= 0))
      }
      time("vacuum") { wh.vacuumOrphans("p") }
    }
    spark.stop()
  }
}

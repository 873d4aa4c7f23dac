package graft

/** Forked-JVM worker for the MULTI-PROCESS warehouse lifecycle fuzz:
  * each invocation is a real separate process with its own Spark
  * session, sharing nothing with its siblings but the table directory
  * — the setting where the commit protocol's cross-process claims
  * (gen-fenced pointer CAS, in-flight marker shields, chunk ref-count
  * GC, DV carry) actually have to hold.
  *
  * Key-space isolation makes the run model-checkable under true
  * concurrency: worker `id` mutates ONLY keys in
  * [id*100000, id*100000+width), tracks its own expected k→v map
  * through every op it COMMITS (CAS losers retry, so a committed op
  * is exactly one that made it into the history), and writes that map
  * as `worker_<id>.tsv` next to the warehouse on success. The test
  * then asserts the final table restricted to each worker's range
  * equals that worker's map — any cross-worker clobber (a commit
  * computed from a stale base wiping a racer's rows) or DV resurrect
  * shows up as a diff. Content-preserving GLOBAL ops (compact,
  * vacuum) are thrown into the mix; rollback is NOT (it rewrites
  * other workers' state by design — the single-process fuzz covers
  * it).
  *
  * args: <warehouseDir> <workerId> <seed> <nOps>
  * exit: 0 = done+journal written, 3 = exhausted retries, 2 = error.
  */
object WhFuzzCli {
  def main(args: Array[String]): Unit = {
    try {
      val Array(dir, idS, seedS, nOpsS) = args
      val id = idS.toInt
      val rnd = new scala.util.Random(seedS.toLong)
      val nOps = nOpsS.toInt
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val wh = new graft.sources.Warehouse(spark, dir, manifest = true,
        pointerStore = new graft.sources.GenFencedPointerStore,
        manifestChunkSize = 4)
      val base = id.toLong * 100000L
      def pOf(k: Long): String = s"p${k % 3}" // partition-stable per key
      def df(rows: Seq[(Long, Long)]) =
        rows.map { case (k, v) => (k, v, pOf(k)) }.toDF("k", "v", "p")
      var model = Map.empty[Long, Long]
      var nextKey = base

      // bounded retry: CAS losses and transient snapshot races (a
      // sibling's publish GC'ing the manifest between our resolve and
      // read) are EXPECTED under contention — the op re-reads fresh
      // state and re-derives. Anything surviving 40 attempts is a
      // livelock and fails the worker loudly.
      // Transient-under-contention failures, all LOUD by design:
      // CAS losses (CME), snapshot files GC'd mid-read by a sibling's
      // publish — the one-publish grace — surfacing as IOException
      // (incl. the strict DV loads), Spark-wrapped FAILED_READ_FILE,
      // or plan-time PATH_NOT_FOUND. Every one means "re-read the
      // fresh snapshot and re-derive", which is what the retry does.
      def transient(e: Throwable): Boolean = e match {
        case _: java.util.ConcurrentModificationException => true
        case _: java.io.IOException => true
        case e: org.apache.spark.SparkException =>
          val m = Option(e.getMessage).getOrElse("")
          m.contains("FAILED_READ_FILE") || m.contains("does not exist") ||
            Option(e.getCause).exists(transient)
        case e: org.apache.spark.sql.AnalysisException =>
          val m = Option(e.getMessage).getOrElse("")
          m.contains("PATH_NOT_FOUND") || m.contains("UNABLE_TO_INFER_SCHEMA")
        case _ => false
      }
      def retry[T](what: String)(body: => T): T = {
        var attempt = 0
        while (true) {
          try return body
          catch {
            case e: Throwable if transient(e) =>
              attempt += 1
              if (attempt >= 40) {
                System.err.println(s"[whfuzz-$id] $what exhausted: $e")
                sys.exit(3)
              }
              Thread.sleep(rnd.nextInt(40).toLong)
          }
        }
        throw new IllegalStateException("unreachable")
      }

      for (i <- 1 to nOps) {
        val op = rnd.nextInt(100)
        if (op < 35) { // append fresh keys
          val batch = (nextKey until nextKey + 4 + rnd.nextInt(6))
            .map(k => k -> k)
          nextKey = batch.last._1 + 1
          retry(s"append#$i")(wh.append("t", df(batch)))
          model ++= batch
        } else if (op < 65) { // scoped upsert: update + insert
          val upd = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(4))
            .map(k => k -> (model(k) + 1))
          val ins = (nextKey until nextKey + 1 + rnd.nextInt(3)).map(k => k -> k)
          nextKey += ins.size
          val rows = upd ++ ins
          retry(s"upsert#$i")(
            wh.upsert("t", df(rows), Seq("k"), Seq("p")))
          model ++= rows
        } else if (op < 85) { // row-level delete in OWN range only
          if (model.nonEmpty) {
            val ks = model.keys.toSeq.sorted
            val a = ks(rnd.nextInt(ks.size)); val b = a + 1 + rnd.nextInt(6)
            retry(s"delete#$i")(
              wh.deleteRows("t", $"k" >= a && $"k" < b))
            model = model.filter { case (k, _) => k < a || k >= b }
          }
        } else if (op < 93) { // content-preserving global maintenance
          try wh.maintain("t", smallFileLimit = 8)
          catch { case _: java.util.ConcurrentModificationException => () }
        } else {
          try { wh.vacuumOrphans("t"); () } catch { case _: Throwable => () }
        }
      }
      val out = new java.io.PrintWriter(s"$dir/worker_$id.tsv", "UTF-8")
      try model.toSeq.sorted.foreach { case (k, v) => out.println(s"$k\t$v") }
      finally out.close()
      spark.stop()
      sys.exit(0)
    } catch {
      case e: Throwable =>
        System.err.println(s"[whfuzz] fatal: $e")
        e.getStackTrace.take(8).foreach(t => System.err.println(s"  $t"))
        sys.exit(2)
    }
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan audit: prints the formatted physical plan of each catalog query
  * and checks the properties that matter at 100 TB — filters pushed to
  * the parquet scan, pruned read schemas, broadcast joins on dimension
  * sides, whole-stage codegen coverage.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var cartesian = List.empty[String]
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // EXECUTE first: under AQE the formatted plan only carries
      // `codegen id` / final join choices after the adaptive plan is
      // finalized — pre-execution explain was a codegen false-negative
      df.collect()
      val plan = df.queryExecution.explainString(FormattedMode)
      val props = Seq(
        "PushedFilters: [" -> plan.contains("PushedFilters: ["),
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"),
        "WholeStageCodegen" -> plan.contains("codegen id"),
        "CARTESIAN-PRODUCT" -> plan.contains("CartesianProduct"),
        "full-schema scan" -> {
          // a ReadSchema listing every table column suggests no pruning
          val rs = "ReadSchema: [^\n]*".r.findAllIn(plan).toSeq
          rs.exists(_.count(_ == ',') >= 8)
        })
      if (plan.contains("CartesianProduct")) cartesian ::= name
      println(s"===== $name " + "=" * (60 - name.length))
      println(props.collect { case (p, true) => p }.mkString("props: ", ", ", ""))
      if (sys.env.get("GRAFT_EXPLAIN_FULL").contains("1")) println(plan)
    }
    spark.stop()
    // hard gate: a CartesianProduct in a catalog query is a scale bug
    if (cartesian.nonEmpty) {
      System.err.println(s"FAIL: CartesianProduct in final plan of: ${cartesian.mkString(", ")}")
      sys.exit(1)
    }
  }
}

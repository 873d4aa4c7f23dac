package graft

import org.apache.spark.sql.functions._
import graft.functions.NativeExprs
import graft.operators.TextOps

/** The codegen expressions must be bit-identical to the interpreted
  * higher-order-function forms they replace (same fold order, same
  * arithmetic), on real testdata and on adversarial strings.
  */
class NativeExprsSpec extends SparkSpec {

  test("RollingHashExpr == TextOps.rollingHash on documents + edge cases") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"text".as("s"))
    val edge = Seq("", "a", "日本語のテキスト", "mixed 漢字 and ascii",
      "𠀋 surrogate pair", "tab\tand\nnewline").toDF("s")
    val all = docs.union(edge)
      .withColumn("hof", TextOps.rollingHash($"s"))
      .withColumn("native", NativeExprs.rollingHash(spark, $"s"))
      .filter($"hof" =!= $"native" ||
        ($"hof".isNull =!= $"native".isNull))
    assert(all.count() === 0)
  }

  test("FloatVecDotExpr == TextOps.dot on embeddings (bit-exact doubles)") {
    import spark.implicits._
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = e.select($"vec_id".as("a_id"), $"embedding".as("a"))
    val b = e.select($"vec_id".as("b_id"), $"embedding".as("b"))
    val pairs = a.join(b, $"a_id" < $"b_id" && $"a_id" < 30 && $"b_id" < 30)
      .withColumn("hof", TextOps.dot($"a", $"b"))
      .withColumn("native", NativeExprs.dot(spark, $"a", $"b"))
    // bit-exact: compare raw double bits, not tolerance
    val rows = pairs.select("hof", "native").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0))
        === java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("WordShinglesExpr == TextOps.distinctShingles on documents") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"text".as("s"))
    val edge = Seq("", "one", "one two", "a b c", "a  b   c d", " lead trail ",
      "x y z x y z x y z").toDF("s")
    val rows = docs.union(edge)
      .withColumn("hof", TextOps.distinctShingles($"s", 3))
      .withColumn("native", graft.functions.NativeExprs.shingles3(spark, $"s"))
      .select("hof", "native").collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0).toList === r.getSeq[String](1).toList)
    }
  }

  test("native expressions appear inside WholeStageCodegen") {
    import spark.implicits._
    val plan = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(NativeExprs.rollingHash(spark, $"text").as("h"))
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // '*(n)' marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1)"), plan)
  }
}

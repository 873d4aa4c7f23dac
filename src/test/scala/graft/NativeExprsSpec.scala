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

  test("Gram2StatsExpr == explode/groupBy 2-gram stats on documents") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"text".as("s"))
    val edge = Seq("", "one", "a b", "a a", "a a a", "x y x y x y",
      "  pad   ded  ", "a b a b c a b").toDF("s")
    val d = docs.union(edge)
      .select(monotonically_increasing_id().as("id"), TextOps.tokens($"s").as("toks"))
    // reference: the former explode + double-aggregate shape
    val ref = d.filter(size($"toks") >= 2)
      .select($"id", explode(transform(
        sequence(lit(0), size($"toks") - 2),
        i => concat_ws(" ", element_at($"toks", i + 1),
          element_at($"toks", i + 2)))).as("g2"))
      .groupBy($"id", $"g2").agg(count(lit(1)).as("c"))
      .groupBy($"id")
      .agg(sum($"c").as("n2"), max($"c").as("maxc"),
        sum(when($"c" > 1, $"c").otherwise(0L)).as("dupc"))
    val native = d.filter(size($"toks") >= 2)
      .select($"id", NativeExprs.gram2Stats(spark, $"toks").as("st"))
      .select($"id", $"st.n2".as("n2"), $"st.maxc".as("maxc"), $"st.dupc".as("dupc"))
    val refRows = ref.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val natRows = native.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(natRows.nonEmpty)
    assert(natRows === refRows)
    // < 2 tokens ⇒ all-zero struct (total function, no exception)
    val z = Seq(Seq.empty[String], Seq("solo")).toDF("toks")
      .select(NativeExprs.gram2Stats(spark, $"toks").as("st"))
      .select($"st.n2", $"st.maxc", $"st.dupc").collect()
    z.foreach(r => assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 0L, 0L))))
  }

  test("GraftExtensions injects the functions for a pure-SQL session") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions, not config("spark.sql.extensions", …): the
      // config-string form is a STATIC conf read from the
      // SparkContext, which this shared-context test would ignore;
      // withExtensions applies the same injector object directly
      // (the config path only adds a reflective instantiation)
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      // PURE SQL first — proves injection happened at construction,
      // with no NativeExprs.register call on this session
      val viaSql = s2.sql(
        """SELECT graft_rolling_hash('abc') AS h,
           graft_vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
                         array(CAST(3.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d,
           graft_shingles3('a b c d') AS s""").collect()(0)
      val expectedHash = "abc".foldLeft(0L)((acc, c) => (acc * 131 + c.toLong) % 1000000007L)
      assert(viaSql.getLong(0) === expectedHash)
      assert(viaSql.getDouble(1) === 1.5 * 3.0 + 2.0 * 0.5)
      assert(viaSql.getSeq[String](2) === Seq("a_b_c", "b_c_d"))
    } finally {
      // restore only — s2 is NOT stopped: SparkSession.stop()/close()
      // stops the shared SparkContext and would kill every remaining
      // suite. One extra session object per suite run is bounded; it
      // gets GC'd with its session state when unreferenced.
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
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

  test("sortedBucket == count of bounds strictly below v (property), and codegen matches eval") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    val gen = for {
      bs <- Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))
      v <- Gen.oneOf(Gen.chooseNum(-2e6, 2e6), Gen.oneOf(bs))
    } yield (bs.distinct.sorted.toArray, v)
    val prop = forAll(gen) { case (bounds, v) =>
      graft.functions.ZOrderHelper.bucket(v, bounds) == bounds.count(_ < v)
    }
    assert(SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop).passed)

    // the Column path (codegen'd SortedBucketExpr) agrees with the helper
    import spark.implicits._
    val bounds = Array(-10.0, 0.0, 3.5, 100.0)
    val vs = Seq(-11.0, -10.0, -1.0, 0.0, 2.0, 3.5, 99.9, 100.0, 101.0)
    val got = vs.toDF("v")
      .select(NativeExprs.sortedBucket(spark, $"v", bounds).as("b"))
      .as[Int].collect().toSeq
    assert(got === vs.map(v => graft.functions.ZOrderHelper.bucket(v, bounds)))
  }
}

package graft

import org.apache.spark.sql.functions._

/** Value- and plan-level pins for the round-7 breadth queries
  * (x22/x23/m25/sim7). The driver's DuckDB oracle is the exactness
  * gate; these tests pin the internal invariants the oracle can't see:
  * conservation laws (the spectrum must account for every token), the
  * bounded-fan-out pair construction, the metadata-only path agreeing
  * with a real scan, and the scale-critical plan shapes (map-side
  * partial aggregation, broadcast size joins).
  */
class BreadthSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("x22: spectrum conserves tokens and vocabulary") {
    import spark.implicits._
    val spec = run("x22_freq_spectrum").collect()
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(graft.operators.TextOps.tokens($"text")).as("t"))
    val total = toks.count()
    val vocab = toks.distinct().count()
    // sum(freq · n_terms) = total token count; sum(n_terms) = |vocab|
    assert(spec.map(r => r.getLong(0) * r.getLong(1)).sum === total)
    assert(spec.map(_.getLong(1)).sum === vocab)
    assert(spec.forall(_.getLong(0) >= 1))
  }

  test("x22: both aggregations combine map-side") {
    val df = run("x22_freq_spectrum")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("x23: pairs are ordered, jaccard bounded, no duplicates") {
    val rows = run("x23_source_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[String]("src_a")
      val b = r.getAs[String]("src_b")
      assert(a < b, s"unordered pair $a,$b")
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0, s"jaccard out of range: $j")
      assert(r.getAs[Long]("n_common") >= 1)
    }
    val pairs = rows.map(r =>
      (r.getAs[String]("src_a"), r.getAs[String]("src_b"))).toSet
    assert(pairs.size === rows.length)
  }

  test("x23: one source pair recomputes exactly from first principles") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val rows = run("x23_source_overlap").collect()
    val r0 = rows.head
    val (sa, sb) = (r0.getAs[String]("src_a"), r0.getAs[String]("src_b"))
    def gramsOf(src: String): Set[String] =
      docs.filter($"source" === src)
        .select(explode(graft.functions.NativeExprs.shingles3(spark, $"text")).as("g"))
        .distinct().as[String].collect().toSet
    val (ga, gb) = (gramsOf(sa), gramsOf(sb))
    val inter = (ga intersect gb).size.toLong
    assert(r0.getAs[Long]("n_common") === inter)
    assert(r0.getAs[Double]("jaccard") ===
      inter.toDouble / (ga.size + gb.size - inter))
  }

  test("x23: size joins broadcast; no cartesian, no sort-merge join") {
    val df = run("x23_source_overlap")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"size joins not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"a 20-row side sort-merged:\n$p")
  }

  test("m25: metadata-only numbers equal a real scan's") {
    import spark.implicits._
    val r = run("m25_meta_count").collect().head
    val docs = Tables.load(spark, dir, "documents")
    val scan = docs.agg(
      count(lit(1)), sum(when($"text".isNull, 1L).otherwise(0L)),
      min($"doc_id"), max($"doc_id"), min($"n_chars"), max($"n_chars"))
      .collect().head
    assert(r.getAs[Long]("n_rows") === scan.getLong(0))
    assert(r.getAs[Long]("null_text") === scan.getLong(1))
    assert(r.getAs[Long]("min_doc") === scan.getLong(2))
    assert(r.getAs[Long]("max_doc") === scan.getLong(3))
    assert(r.getAs[Long]("min_chars") === scan.getLong(4))
    assert(r.getAs[Long]("max_chars") === scan.getLong(5))
  }

  test("sim7: every dimension covers the corpus; bounds order; one partial agg") {
    val df = run("sim7_dim_profile")
    val rows = df.collect()
    val nVec = Tables.load(spark, dir, "embeddings").count()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("dim")).toSeq ===
      (0L until rows.length.toLong))
    rows.foreach { r =>
      assert(r.getAs[Long]("n") === nVec)
      val (mn, mx, mean) = (r.getAs[Double]("mn"), r.getAs[Double]("mx"),
        r.getAs[Double]("mean"))
      assert(mn <= mx)
      assert(mean >= mn - 1e-6 && mean <= mx + 1e-6)
    }
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_"), s"no map-side combine:\n$p")
  }

  test("x25/x26: BM25 ranks the rare term first; served == inline") {
    import spark.implicits._
    // semantic pin the hash oracle can't see: 'dup' is ~35× rarer
    // than the other query terms, so its rational idf dominates —
    // every doc that contains it must outrank every doc that doesn't
    // (scores of dup-less docs are bounded by the common terms'
    // near-zero idf). And the served path must reproduce the inline
    // fit row-for-row, score bits included.
    val inline = run("x25_bm25_topk").collect()
    assert(inline.length === 10)
    val withDup = inline.takeWhile(_.getAs[Long]("tf_dup") > 0)
    val nDupDocs = Tables.load(spark, dir, "documents")
      .select(explode(graft.operators.TextOps.tokens($"text")).as("t"),
        $"doc_id")
      .filter($"t" === "dup").select($"doc_id").distinct().count()
    assert(withDup.length === math.min(nDupDocs, 10L).toInt,
      s"a dup-less doc outranked a dup doc: ${inline.mkString("; ")}")
    assert(inline.map(_.getAs[Double]("score")).sliding(2)
      .forall(p => p(0) >= p(1)), "scores not descending")
    val served = run("x26_bm25_index_serve").collect()
    assert(served.toSeq === inline.toSeq,
      "served index diverged from the inline fit")
  }

  test("m29: sketch-only percentile lands within one bucket width of the exact quantile") {
    import spark.implicits._
    val est = graft.SparkEntry.queries("m29_sketch_percentiles")(spark, dir)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Double]("p")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("est_lo"))).toMap
    // exact discrete quantile: value at rank ceil(p·n) in the sorted
    // per-lang multiset (the m27 definition)
    val d = graft.Tables.load(spark, dir, "documents")
      .select($"lang", $"n_chars").as[(String, Long)].collect()
      .groupBy(_._1).map { case (l, vs) => l -> vs.map(_._2).sorted }
    est.foreach { case ((lang, p), (n, estLo)) =>
      val vs = d(lang)
      assert(n === vs.length.toLong, s"$lang: sketch total diverged")
      val exact = vs(math.ceil(p * vs.length).toInt - 1)
      assert(estLo <= exact && exact < estLo + 64,
        s"$lang p=$p: exact=$exact outside sketch bucket [$estLo, ${estLo + 64})")
    }
    assert(est.size >= 3, "expected at least one lang x three percentiles")
  }
}

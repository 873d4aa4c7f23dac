package graft

/** Plan-shape regression pins for flagship catalog queries: the
  * explain gate (graft.Explain / Verify) rejects catastrophic shapes
  * (CartesianProduct) catalog-wide; this spec pins the FINER
  * invariants that make specific queries scale — broadcast vs
  * sort-merge, map-side partial aggregation, column pruning reaching
  * the parquet scan, and the absence of per-row formatter work a
  * past regression reintroduced. Plans are inspected AFTER execution
  * so AQE's final (re-planned) shape is what's asserted.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("j1: dim side broadcasts; no sort-merge join") {
    val p = planOf("j1_bcast_join")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dim join fell back to SMJ:\n$p")
  }

  test("q1: aggregation combines map-side (partial_) before the shuffle") {
    val p = planOf("q1_agg")
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("m3: no per-row date formatter — month key is integer math") {
    val p = planOf("m3_month_agg")
    assert(!p.contains("date_format"),
      s"date_format back on the per-row path (the r5 0.36s regression):\n$p")
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("m4: JSON extraction scan prunes to the two needed columns") {
    val p = planOf("m4_json_extract")
    assert(!p.contains("user_id"),
      s"events scan reads unneeded columns (pruning lost):\n$p")
  }

  test("sim1: query side broadcasts; never a cartesian") {
    val p = planOf("sim1_brute_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
  }

  test("j5: existence probe is a broadcast anti-join") {
    val p = planOf("j5_anti_join")
    assert(p.contains("LeftAnti"), s"not an anti-join:\n$p")
    assert(p.contains("Broadcast"), s"anti-join not broadcast:\n$p")
  }

  test("d1: exact dedup groups on the fixed-width digest, map-side combined") {
    val p = planOf("d1_exact_dedup")
    assert(p.contains("md5"), s"digest key missing:\n$p")
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("d13: URL canonicalization stays codegen'd — no UDF eval in the plan") {
    val p = planOf("d13_url_dedup")
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"),
      s"canonicalizer fell out of codegen:\n$p")
    assert(p.contains("partial_"), s"no map-side combine on the canon groupBy:\n$p")
  }

  test("d10: bloom probe is the native expression — no UDF eval in the plan") {
    val p = planOf("d10_bloom_dedup")
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"),
      s"bloom probe fell back to a UDF (codegen broken at the gate filter):\n$p")
    assert(p.toLowerCase.contains("bloommightcontain") || p.contains("graft_bloom"),
      s"native bloom probe missing from the plan:\n$p")
  }

  test("x17/x18: model scoring never sorts the corpus — no Window; totals broadcast") {
    for (q <- Seq("x17_quality_classifier", "x18_lm_perplexity")) {
      val p = planOf(q)
      assert(!p.contains("Window"),
        s"$q: a window sort-shuffle replaced the row-local/agg shape:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
        s"$q: totals row is not broadcast:\n$p")
    }
  }

  test("x20/x21: persisted-model scoring joins broadcast; no corpus Window") {
    for (q <- Seq("x20_model_persist_score", "x21_lm_persist_score")) {
      val p = planOf(q)
      assert(!p.contains("Window"),
        s"$q: a window sort-shuffle crept into model scoring:\n$p")
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"$q: the loaded model table is not broadcast to the scoring scan:\n$p")
    }
  }

  test("m19: integer ranks — no float math on the iteration path") {
    val p = planOf("m19_pagerank")
    assert(p.contains("partial_"), s"inflow agg not map-side combined:\n$p")
    assert(!p.toLowerCase.contains("cast(pr"), // pr stays bigint end to end
      s"rank column cast off integer:\n$p")
  }

  test("d14: keeper selection is a max_by partial agg, not a per-cluster sort") {
    val p = planOf("d14_keep_best")
    assert(p.contains("max_by") || p.contains("partial_"),
      s"keeper arg-max lost partial aggregation:\n$p")
    assert(!p.contains("Window"), s"a window sort crept into keeper selection:\n$p")
  }

  test("j9: salted join plans as shuffle-hash on the (key, salt) pair") {
    // the hint must survive saltedJoin's projections: a broadcast here
    // would make the salt columns dead weight (broadcast joins have no
    // reducer skew), and a sort-merge would hand the skew problem to
    // AQE instead of exercising the explicit salting path
    val p = planOf("j9_skew_salted")
    assert(p.contains("ShuffledHashJoin"), s"salted join not shuffle-hash:\n$p")
    assert(p.contains("_salt"), s"salt key absent from the join:\n$p")
  }

  test("j10: co-bucketed sides scan without their own shuffle") {
    // the join keys' Exchanges must be satisfied by the bucketed
    // layout: no shuffle on either custkey — the only hash exchange
    // allowed is the tiny post-join groupBy's (on c_mktsegment; the
    // AQE dump can print that one per stage view).
    val p = planOf("j10_bucketed_join")
    assert(!"Exchange hashpartitioning\\((o_custkey|c_custkey)".r
        .findFirstIn(p).isDefined,
      s"bucketed join side re-shuffled on the join key:\n$p")
    assert(p.contains("Bucketed: true"),
      s"scan did not use the bucketed layout:\n$p")
  }

  test("x25: BM25 top-k is a heap merge, never a global sort or window") {
    // top-10 must plan as TakeOrderedAndProject (per-partition heads
    // + one driver merge); a Sort or Window here would total-order
    // the whole candidate set — the shape that dies first at 100 TB.
    // The query-term filter must also land BEFORE the tf aggregation
    // (only the 3 query terms' postings may shuffle).
    val p = planOf("x25_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k lost the heap-merge plan:\n$p")
    assert(!p.contains("Window"), s"a window crept into BM25 ranking:\n$p")
    assert(p.contains("dup"), s"query-term filter missing from the plan:\n$p")
  }

  test("x26: served BM25 pushes the query terms into the postings scan") {
    // the published index only pays off if the serve-side scan reads
    // the 3 query terms' posting rows and nothing else — the In()
    // predicate must reach the parquet reader, not evaluate post-scan;
    // and the top-k must stay a heap merge like x25's.
    val p = planOf("x26_bm25_index_serve")
    assert("PushedFilters: \\[In\\(term".r.findFirstIn(p).isDefined,
      s"query-term In() not pushed into the postings scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k lost the heap-merge plan:\n$p")
    assert(!p.contains("Window"), s"a window crept into served BM25:\n$p")
  }

  test("x27: batch serve pushes the UNION of all query terms into one postings scan") {
    // the batch's scale contract: ONE postings pass whose parquet
    // filter is the union of every query's terms (9 here) — not one
    // scan per query, and the In() must reach the reader. The
    // per-query top-5 window is fine (partitioned by query_id, never
    // a global sort); the heavy candidate set stays out of it because
    // the pivot aggregates per (query, doc) first.
    val p = planOf("x27_bm25_batch_serve")
    val in = "PushedFilters: \\[In\\(term, \\[([^\\]]*)\\]".r.findFirstMatchIn(p)
    assert(in.isDefined,
      s"union-of-terms In() not pushed into the postings scan:\n$p")
    assert(in.get.group(1).split(",").length === 9,
      s"pushed In() does not carry all 9 batch terms: ${in.get.group(1)}")
    // exactly one postings parquet scan carries the pushed union: the
    // index is read once for the whole batch (count the FINAL plan
    // only — an AQE explain repeats every scan in its initial-plan
    // section; ≤2 = postings + the filtered dict)
    val finalPlan = p.split("== Initial Plan ==").head
    assert("PushedFilters: \\[In\\(term".r.findAllIn(finalPlan).size <= 2,
      s"postings scanned more than once per batch:\n$p")
  }

  test("x28/sim9: index deletes keep the serve-side plan shapes") {
    // post-delete re-probes must serve exactly like their pre-delete
    // counterparts: pushed In() on the BM25 postings, heap-merge
    // top-k; the IVF probe keeps its bounded TopKAgg (objHashAggregate
    // carries the typed buffer) rather than degenerating into a
    // global window over all candidates.
    val bp = planOf("x28_bm25_index_delete")
    assert("PushedFilters: \\[In\\(term".r.findFirstIn(bp).isDefined,
      s"x28: query-term In() not pushed into the surviving postings scan:\n$bp")
    assert(bp.contains("TakeOrderedAndProject"),
      s"x28: top-k lost the heap-merge plan:\n$bp")
    val sp = planOf("sim9_index_delete")
    assert(!sp.contains("CartesianProduct"),
      s"sim9: cartesian crept into the post-delete probe:\n$sp")
  }

  test("q17/q4: SQL subqueries decorrelate to joins — no nested loop, no per-row re-execution") {
    val p17 = planOf("q17_corr_subquery")
    assert(!p17.contains("BroadcastNestedLoopJoin") && !p17.contains("CartesianProduct"),
      s"q17: correlated scalar subquery failed to decorrelate:\n$p17")
    // the threshold aggregate runs ONCE as a grouped aggregate joined
    // back on the correlation key — a scalar Subquery node surviving
    // into the physical plan would mean per-row re-execution
    assert(p17.contains("HashAggregate"), s"q17: no aggregate in plan:\n$p17")

    val p4 = planOf("q4_exists_subquery")
    assert(p4.contains("LeftSemi"), s"q4: EXISTS did not plan as a semi join:\n$p4")
    assert(!p4.contains("BroadcastNestedLoopJoin") && !p4.contains("CartesianProduct"),
      s"q4: EXISTS fell back to a nested loop:\n$p4")
  }

  test("q21: EXISTS/NOT-EXISTS collapse to ONE lineitem aggregate — no semi/anti self-joins") {
    val p = planOf("q21_semi_anti")
    // the whole decorrelation lives in a single groupBy(l_orderkey)
    // pass; a LeftSemi/LeftAnti on lineitem would mean the correlated
    // probes came back as extra full-table joins
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"),
      s"q21: correlated probes planned as semi/anti self-joins:\n$p")
    assert(p.contains("partial_"), s"q21: order stats not map-side combined:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"q21: supplier dim not broadcast:\n$p")
  }

  test("j11: interval overlap is explode + broadcast equi-join — never a nested loop") {
    val p = planOf("j11_interval_overlap")
    assert(p.contains("BroadcastHashJoin"),
      s"j11: heavy-hour dim not broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"j11: overlap predicate planned as a theta join:\n$p")
    assert(p.contains("Generate"), s"j11: bucket explode missing:\n$p")
  }

  test("x33: bloom probe prefilters the corpus shingles before the exact join") {
    val p = planOf("x33_bloom_decontaminate")
    assert(p.toLowerCase.contains("bloommightcontain") || p.contains("graft_bloom"),
      s"x33: native bloom probe not in the plan:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"),
      s"x33: UDF crept into the probe path:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"x33: exact confirm join not broadcast:\n$p")
  }

  test("j13: bloom runtime filter stays native — probe before the exchange, no UDF") {
    val p = planOf("j13_bloom_semi_pushdown")
    assert(p.toLowerCase.contains("bloommightcontain") || p.contains("graft_bloom"),
      s"j13: native bloom probe missing:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.toLowerCase.contains("scalaudf"),
      s"j13: probe fell back to a UDF:\n$p")
    assert(!p.contains("CartesianProduct"), s"j13: cartesian:\n$p")
  }

  test("m53/d21/sim16: the quadratic-risk rewrites never plan a cartesian") {
    // skyline = one sorted window (the NOT-EXISTS theta probe lives
    // only in the oracle); edit-distance join = variant equi-join;
    // filtered ANN = label equi-join with the query side broadcast
    for (q <- Seq("m53_skyline_2d", "d21_editdist_join", "sim16_filtered_ann")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: quadratic plan crept in:\n$p")
    }
    val sky = planOf("m53_skyline_2d")
    assert(sky.contains("Window"), s"skyline lost its window rewrite:\n$sky")
  }

  test("stats queries: moments partial-aggregate; dim-only windows never sort the fact") {
    // m58's five sufficient statistics must combine map-side (the
    // whole point of the closed form), and m61's rank window runs on
    // the customer AGGREGATE — an events/orders-sized Window would
    // mean the fact is being sorted
    val ols = planOf("m58_ols_trend")
    assert(ols.contains("partial_"), s"m58: moments not map-side combined:\n$ols")
    assert(!ols.contains("Window"), s"m58: a window crept into a pure aggregate:\n$ols")
    val gini = planOf("m61_gini_spend")
    assert(gini.contains("partial_"), s"m61: per-customer collapse not partial:\n$gini")
  }

  test("s25: merge-on-read scan anti-joins the deletion vector broadcast") {
    val p = planOf("s25_deletion_vectors")
    assert(p.contains("LeftAnti"), s"s25: MOR read lost its anti-join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"s25: deletion vector not broadcast (it is sized by deleted rows):\n$p")
  }

  test("m36: streaming sessions read back from the warehouse — no re-aggregation at read") {
    // the serve read is a plain scan + sort of the published sessions
    // table; session recomputation at read time would show as an
    // aggregate over the events source
    val p = planOf("m36_stream_sessions")
    assert(!p.contains("session_window"),
      s"m36: read path recomputes session windows:\n$p")
  }
}

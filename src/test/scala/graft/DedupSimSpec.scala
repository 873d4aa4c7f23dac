package graft

import graft.queries.{Dedup, Sim}

/** Cross-checks between the approximate and exact implementations of
  * the dedup / similarity families on the sf0.001 testdata:
  * MinHash+LSH must recover the exact n-gram Jaccard pairs, and the
  * IVF probe must reach high recall against brute force.
  */
class DedupSimSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir)

  test("minhash-lsh recovers exactly the true Jaccard>=0.5 pairs") {
    val exact = q("d2_ngram_jaccard").select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = q("d3_minhash_lsh").select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
  }

  test("simhash banding finds the hamming<=3 pairs (non-empty, symmetric-free)") {
    val pairs = q("d4_simhash").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) <= 3)
    }
  }

  test("IVF top-k recall >= 0.6 vs brute force at nprobe=8") {
    val brute = q("sim1_brute_topk").select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = q("sim2_ivf_topk").select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("exact dedup collapses the synthetic duplicate block") {
    val rows = q("d1_exact_dedup").collect()
    val dupGroups = rows.count(_.getAs[Long]("n_copies") >= 2)
    assert(dupGroups == 100) // 100 shifted copies → 100 groups of 2
  }
}

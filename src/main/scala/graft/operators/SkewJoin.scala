package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the big (skewed) side into `salt`
  * sub-keys and replicate the small side once per sub-key, so one hot
  * key's rows spread over `salt` reducers instead of one straggler
  * task. The join RESULT is identical to the plain join — salting only
  * changes physical distribution. (AQE's skew-join handles sort-merge
  * skew automatically; explicit salting remains the tool for skewed
  * shuffle-hash joins, skewed aggregations, and engines/plans AQE
  * doesn't cover.)
  */
object SkewJoin {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // right/full outer would emit one null-padded row PER REPLICA for
    // unmatched small-side keys — result no longer equals the plain join
    val jt = joinType.toLowerCase.replace("_", "")
    require(!Set("right", "rightouter", "full", "fullouter", "outer").contains(jt),
      s"saltedJoin does not support $joinType (small side is replicated)")
    // per-row bucket for the big side: any spread works (result is
    // salt-invariant); derived from partition+offset so it needs no
    // extra shuffle of its own
    val salted = big.withColumn("_salt",
      pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()), lit(salt.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence pair mining over (group, item) incidences — the
  * market-basket / co-click generator (catalog m37). The pair stream
  * is an equi-self-join on the group key (never a cartesian), but its
  * volume is Σ C(degree(g), 2): entirely controlled by per-group
  * degree, so ONE wholesale customer holding 10⁵ distinct parts emits
  * 5×10⁹ pairs while every normal basket emits dozens — the textbook
  * skew blow-up at 100 TB.
  *
  * `maxDegree` is the scale valve — the d7 capped-LSH discipline
  * applied to baskets, through the SAME bounded-buffer aggregate
  * (CappedDocListAgg): one shuffle groups the incidences with an
  * O(cap) buffer per group however hot the key, groups whose exact
  * count exceeds the cap are dropped WHOLE (a mega-basket is almost
  * pure noise for co-occurrence — everything co-occurs with
  * everything — exactly like a boilerplate LSH bucket), and pairs
  * explode row-locally from each survivor's ≤cap item array: total
  * pair volume is bounded by |groups|·C(cap, 2), no self-join, no
  * second scan, no broadcast of a group list. `None` keeps the exact
  * uncapped self-join form — the oracle-gated default at test scale.
  */
object CoPurchase {

  /** Distinct item pairs co-occurring in ≥ `minSupport` groups, with
    * the co-occurrence count as `n_<groupCol>`.
    *
    * @param incidences DISTINCT (group, item) rows, item castable to
    *                   long — caller dedups
    * @param maxDegree  drop groups with more than this many distinct
    *                   items before pairing; None = exact/uncapped
    */
  def pairs(incidences: DataFrame, groupCol: String, itemCol: String,
      minSupport: Long, maxDegree: Option[Int] = None): DataFrame = {
    val g = col(groupCol)
    val nCol = "n_" + groupCol
    val paired = maxDegree match {
      case None =>
        incidences.select(g, col(itemCol).as("p1"))
          .join(incidences.select(g, col(itemCol).as("p2")), Seq(groupCol))
          .filter(col("p1") < col("p2"))
          .select(col("p1"), col("p2"))
      case Some(cap) =>
        val capAgg = udaf(new CappedDocListAgg(cap))
        incidences
          .groupBy(g).agg(capAgg(col(itemCol).cast("long"), lit(0L)).as("gp"))
          .filter(col("gp._1") <= cap) // exact count: over-cap groups go whole
          .select(explode(col("gp._2")).as("a"), col("gp._2").as("items"))
          .select(col("a"), explode(col("items")).as("b"))
          .filter(col("a._1") < col("b._1"))
          .select(col("a._1").as("p1"), col("b._1").as("p2"))
    }
    paired.groupBy(col("p1"), col("p2")).agg(count(lit(1)).as(nCol))
      .filter(col(nCol) >= minSupport)
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One catalog entry: a Spark query over an sf-dir of parquet tables and
  * (optionally) an equivalent ANSI SQL statement the driver runs in DuckDB
  * on the same tables. `oracle = None` ⇒ driver records a rows-only check
  * (used for ops whose semantics aren't reproducible in portable SQL,
  * e.g. hash-seeded MinHash).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Exactness discipline for the DuckDB oracle (driver hash-compares
    * values): all money/measure doubles in the testdata are exact at 2
    * decimal places, so aggregation happens in DECIMAL(18,2) (exact, order
    * independent) and only the final result is cast back to double — the
    * same elementary-operation sequence on both engines yields
    * bit-identical doubles.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum rendered as double (order-insensitive, bit-stable
    * across engines).
    */
  def dsum(c: Column): Column = sum(dec2(c)).cast("double")
}

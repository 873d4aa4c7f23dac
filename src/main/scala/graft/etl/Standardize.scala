package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raw 9-column JP DataFrame → standardized staging DataFrame
  * (reference: data_mapper.py:11-52 — P1..P6 in SURVEY.md §2.2), as one
  * narrow projection: rename, strip the full-width-minus null marker,
  * split the mixed 値 column into (value Double, value_text, is_numeric).
  *
  * All pure column expressions — the whole transform stays in a single
  * whole-stage-codegen span and is applied per-partition with no
  * shuffle, so it scales linearly regardless of corpus size.
  */
object Standardize {

  /** doc_id/_rid bookkeeping columns added by the reader (kept if
    * present): `doc_id` identifies the filing, `_rid` preserves file
    * row order so "first match wins" semantics are deterministic under
    * parallelism (pandas iloc[0] has implicit file order; a distributed
    * scan does not).
    */
  def apply(raw: DataFrame): DataFrame = {
    val renamed = Model.renameMap.foldLeft(raw) {
      case (df, (jp, en)) => df.withColumnRenamed(jp, en)
    }
    renamed
      // P2: full-width minus (null marker) removed as a *substring*
      // (pandas str.replace regex=False) — "－" has no regex metachars
      .withColumn("original_value", regexp_replace(col("original_value"), "－", ""))
      // P3: to_numeric(errors="coerce") — non-numeric → null
      .withColumn("value", col("original_value").try_cast("double"))
      // P4: null predicate → flag
      .withColumn("is_numeric", col("value").isNotNull)
      // P5: conditional projection — keep original text only when
      // non-numeric
      .withColumn("value_text", when(!col("is_numeric"), col("original_value")))
      // P6: drop the staging source column
      .drop("original_value")
  }
}

package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Config-driven extraction from the standardized staging DataFrame to
  * the three dimension shapes (reference: data_mapper.py:102-348).
  *
  * The reference issues one point-query per mapped field per document
  * (_get_value: filter → iloc[0]). Here each mapping is ONE bounded
  * pivot over all documents at once — `groupBy(doc_id).pivot(element_id,
  * knownIds).agg(min_by(value, _rid))` — so extraction is a single
  * shuffle on doc_id however many documents are in flight, and
  * "first row in file order wins" is explicit via `_rid` (SURVEY.md
  * §2.4 A4).
  *
  * Error channel: the reference raises ValueError on a bad document and
  * aborts the whole ingest. Distributed parity: `strict=true` fails the
  * job via raise_error; `strict=false` routes bad documents to a
  * quarantine DataFrame and the good ones flow on (the 100 TB-friendly
  * default).
  */
object Extract {

  /** _get_value's rendered value: numeric hits become str(int(v)) —
    * decimals truncated (data_mapper.py:89, F7) — else value_text.
    */
  private def renderedValue = {
    val v = col("value")
    when(col("is_numeric"), v.cast("long").cast("string")).otherwise(col("value_text"))
  }

  /** One bounded pivot: doc_id × mapped fields. Requires `doc_id` and
    * `_rid` columns (added by the reader).
    */
  def mappingPivot(staged: DataFrame, mapping: Seq[(String, String)]): DataFrame = {
    val ids = mapping.map(_._2)
    val pivoted = staged
      .filter(col("element_id").isin(ids: _*))
      .select(col("doc_id"), col("element_id"), renderedValue.as("v"), col("_rid"))
      .groupBy(col("doc_id"))
      .pivot("element_id", ids)
      .agg(min_by(col("v"), col("_rid")))
    mapping.foldLeft(pivoted) { case (df, (field, id)) =>
      df.withColumnRenamed(id, field)
    }
  }

  /** Company dimension candidates: one row per doc with the four mapped
    * fields; rows missing required fields (edinet_code, company_name)
    * are flagged invalid (reference raises ValueError —
    * data_mapper.py:142-149).
    */
  def companyCandidates(staged: DataFrame, strict: Boolean = false): DataFrame = {
    val c = mappingPivot(staged, Model.companyMapping)
      .withColumn("_invalid",
        col("edinet_code").isNull || col("company_name").isNull)
    // strict: the raise must live on a column that survives pruning —
    // doc_id is consumed by every downstream join, so wrap it (a
    // dropped side-channel column would be optimized away silently)
    if (strict)
      c.withColumn("doc_id",
        when(col("_invalid"),
          raise_error(concat(lit("required company fields missing for doc "),
            col("doc_id"))))
          .otherwise(col("doc_id")))
    else c
  }

  /** Report dimension candidates: mapped fields + fiscal_year /
    * quarter_type derived from the cover-page period string (F1/F3/F4).
    * Invalid = missing or unparsable period (reference raises —
    * data_mapper.py:256-279). Uses the codegen column-expression forms;
    * Fns UDFs are the pinned reference semantics.
    */
  def reportCandidates(staged: DataFrame, strict: Boolean = false): DataFrame = {
    val fyq = col("fiscal_year_and_quarter")
    val r = mappingPivot(staged, Model.reportMapping)
      .withColumn("fiscal_year", Fns.fiscalYearExpr(fyq))
      .withColumn("quarter_type", Fns.quarterTypeExpr(fyq))
      .withColumn("_invalid",
        fyq.isNull || fyq === "" ||
          col("fiscal_year").isNull || col("quarter_type").isNull)
      .drop("fiscal_year_and_quarter")
    if (strict)
      r.withColumn("doc_id",
        when(col("_invalid"),
          raise_error(concat(lit("unparsable accounting period for doc "),
            col("doc_id"))))
          .otherwise(col("doc_id")))
    else r
  }

  /** Item-master candidates: financial rows only, deduped by element_id
    * with deterministic first-in-file-order-wins, category from
    * consolidated_type (reference: data_mapper.py:154-210 — P8, A1,
    * P11, P13).
    */
  def itemCandidates(staged: DataFrame): DataFrame =
    // first-wins via min_by AGGREGATION, not a row_number window: a
    // ubiquitous element_id (e.g. NetSales, present in every document)
    // would make the window's sort partition a straggler at scale,
    // while min_by partial-aggregates map-side to one candidate row
    // per (task, element) before the shuffle. _rid is unique, so the
    // winner is still deterministically the first row in file order.
    staged
      .filter(col("element_id").rlike(Model.financialElementPattern))
      .groupBy(col("element_id"))
      .agg(min_by(
        struct(col("item_name_jp"), col("unit_id"), col("consolidated_type")),
        col("_rid")).as("f"))
      .select(
        col("element_id"),
        col("f.item_name_jp").as("item_name"),
        col("f.unit_id").as("unit_type"),
        when(col("f.consolidated_type") === "連結", "Consolidated")
          .otherwise("Non-consolidated").as("category"))

  /** Fact rows: financial rows with duration flag and null-normalized
    * values (reference: data_mapper.py:300-332 — P12, P14, vectorized
    * P15; the reference's own "readability over performance" iterrows
    * loop becomes pure column expressions).
    */
  def factRows(staged: DataFrame): DataFrame =
    staged
      .filter(col("element_id").rlike(Model.financialElementPattern))
      .select(
        col("doc_id"),
        col("element_id"),
        when(col("context_id").contains("Duration"), "Duration")
          .otherwise("Instant").as("duration_type"),
        col("context_id"),
        col("period_type"),
        col("consolidated_type"),
        col("value"),
        col("value_text"),
        col("is_numeric"))
}

package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Typed record crossing the service boundary — field-for-field parity
  * with the reference's FinancialSummaryDTO
  * (utils/service/financial_service.py:33-50): company/period info,
  * raw financial metrics (million-yen scaled), computed profit rates.
  * P16 in SURVEY.md §2: `Dataset[FinancialSummary]` is the API edge.
  */
final case class FinancialSummary(
    company_name: String,
    period_name: String,
    fiscal_year: Option[Int],
    quarter_type: Option[String],
    net_sales: Option[Double],
    operating_income: Option[Double],
    ordinary_income: Option[Double],
    net_income: Option[Double],
    operation_profit_rate: Option[Double],
    ordinary_profit_rate: Option[Double],
    net_profit_rate: Option[Double])

/** The reference's flagship read path (§3.1): company → latest report →
  * summary facts → pivot → candidate coalesce → guarded profit-margin
  * ratios → million-yen scaling — as ONE lazy Catalyst plan instead of
  * 3 round-trip SQL queries + driver-side dict math
  * (financial_service.py:91-164).
  *
  * Shapes for scale: dims broadcast; the fact side is filtered by the
  * 11 candidate element_ids before any shuffle (predicate reaches the
  * parquet scan); the EAV→wide step is a bounded pivot (A4), and the
  * "first matching candidate" walk is a coalesce over pivot columns in
  * priority order (A3). `allCompanies` computes every company's summary
  * in the same single plan — the per-key variant is just a filter on
  * top, so the driver/Postgres N+1 of the reference disappears.
  */
object Summary {

  /** Latest report per company. Reference quirk preserved: ordered by
    * the STRING fiscal_year only, descending; quarter is NOT a
    * tiebreak (financial_report_repository.py:17-24, W1) — ties beyond
    * that resolved deterministically by report_id desc.
    */
  def latestReports(reports: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("company_id"))
      .orderBy(col("fiscal_year").desc, col("report_id").desc)
    reports.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  private def guardedRate(income: Column, netSales: Column): Column =
    when(income.isNotNull && income =!= 0 && netSales.isNotNull && netSales =!= 0,
      income / netSales * 100)

  /** All-companies financial summary: one row per company with the
    * latest report's KPIs. Joins are broadcast (dims are ~4k/~10k rows
    * in the reference's sizing; at 100 TB the fact table is the only
    * big side and it shuffles once on report_id for the pivot).
    */
  def allCompanies(
      companies: DataFrame,
      reports: DataFrame,
      fact: DataFrame,
      items: DataFrame): DataFrame = {

    val candidateIds = Model.summaryItems.flatMap(_._2)

    // fact ⋈ items (broadcast dim), filtered to the 11 candidate ids
    // BEFORE the shuffle — the IN-list prunes at the scan.
    val summaryFacts = fact
      .join(broadcast(items.select(col("item_id"), col("element_id"))), "item_id")
      .filter(col("element_id").isin(candidateIds: _*))

    // EAV → wide: bounded pivot. Values are wrapped in a struct so a
    // PRESENT-but-null observation is distinguishable from an ABSENT
    // element — the reference's candidate walk stops at the first
    // *present* key even when its value is None (dict membership,
    // financial_service.py:84-88). When one element has rows in several
    // contexts the reference keeps whichever the DB returned last
    // (order-dependent dict build); we pin a deterministic rule
    // instead: lexicographically-first context_id, which prefers
    // Current* over Prior* contexts.
    val wide = summaryFacts
      .groupBy(col("report_id"))
      .pivot("element_id", candidateIds)
      .agg(min_by(struct(col("value").as("v")), col("context_id")))

    // first-PRESENT-match walk per metric, in candidate priority order
    val metrics = Model.summaryItems.foldLeft(wide) { case (df, (field, cands)) =>
      val walk = cands.map(c => (col(s"`$c`").isNotNull, col(s"`$c`").getField("v")))
        .foldRight(lit(null).cast("decimal(20,0)")) {
          case ((present, v), els) => when(present, v).otherwise(els)
        }
      df.withColumn(field, walk)
    }.select(col("report_id") +: Model.summaryItems.map(f => col(f._1)): _*)

    val latest = latestReports(reports)

    broadcast(companies.select(
        col("company_id"), col("edinet_code"), col("company_name")))
      .join(latest.select(col("company_id"), col("report_id"),
        col("fiscal_year"), col("quarter_type")), "company_id")
      .join(metrics, Seq("report_id"), "left")
      .select(
        col("edinet_code"), col("company_name"),
        concat_ws(" ", col("fiscal_year"), col("quarter_type")).as("period_name"),
        col("fiscal_year").cast("int").as("fiscal_year"),
        col("quarter_type"),
        // rates computed BEFORE the million-yen scaling, matching the
        // reference's statement order
        guardedRate(col("operating_income").cast("double"),
          col("net_sales").cast("double")).as("operation_profit_rate"),
        guardedRate(col("ordinary_income").cast("double"),
          col("net_sales").cast("double")).as("ordinary_profit_rate"),
        guardedRate(col("net_income").cast("double"),
          col("net_sales").cast("double")).as("net_profit_rate"),
        // /1e6 display scaling (reference does this unguarded and would
        // raise on None; Spark null-propagates — documented difference)
        (col("net_sales").cast("double") / 1000000).as("net_sales"),
        (col("operating_income").cast("double") / 1000000).as("operating_income"),
        (col("ordinary_income").cast("double") / 1000000).as("ordinary_income"),
        (col("net_income").cast("double") / 1000000).as("net_income"))
  }

  /** Per-company, per-item time series ordered by period end —
    * find_by_series_by_company_and_time parity (J2/W2,
    * financial_data_repository.py:35-48), all companies in one plan
    * (filter on top for the point query).
    */
  def timeSeries(
      reports: DataFrame, fact: DataFrame, items: DataFrame,
      elementId: String): DataFrame =
    fact
      .select(col("report_id"), col("item_id"), col("value"))
      .join(broadcast(items.filter(col("element_id") === elementId)
        .select(col("item_id"), col("element_id"))), "item_id")
      .join(reports.select(col("report_id"), col("company_id"),
        col("fiscal_year"), col("quarter_type"), col("fiscal_year_end")), "report_id")
      .select(col("company_id"), col("element_id"), col("fiscal_year"),
        col("quarter_type"), col("fiscal_year_end"), col("value"))
      .orderBy(col("company_id"), col("fiscal_year_end"))

  /** Point lookup parity with get_financial_summary(edinet_code). */
  def forCompany(
      companies: DataFrame, reports: DataFrame, fact: DataFrame,
      items: DataFrame, edinetCode: String): DataFrame =
    allCompanies(companies, reports, fact, items)
      .filter(col("edinet_code") === edinetCode)

  /** Typed egress (P16): the DTO-parity `Dataset[FinancialSummary]`.
    * The lookup key (edinet_code) is consumed by the filter and is not
    * a DTO field, matching get_financial_summary's signature.
    */
  def summariesTyped(
      companies: DataFrame, reports: DataFrame, fact: DataFrame,
      items: DataFrame, edinetCode: Option[String] = None): Dataset[FinancialSummary] = {
    val all = allCompanies(companies, reports, fact, items)
    val scoped = edinetCode.map(c => all.filter(col("edinet_code") === c)).getOrElse(all)
    val s = scoped.sparkSession
    import s.implicits._
    val dtoOrder = Seq("company_name", "period_name", "fiscal_year", "quarter_type",
      "net_sales", "operating_income", "ordinary_income", "net_income",
      "operation_profit_rate", "ordinary_profit_rate", "net_profit_rate")
    scoped.select(dtoOrder.map(col): _*).as[FinancialSummary]
  }

  /** F6: display formatting parity with app/app.py:114-156 — profit
    * rates as "{:.2f}%" (NO thousands grouping: a rate ≥ 1000 renders
    * "1234.56%", where format_number alone would insert a comma);
    * money columns thousands-separated, None → "N/A". DELIBERATE
    * DEVIATION on money decimals: the reference renders f"{value:,}"
    * (no forced decimals — "43,858"); we render two fixed decimals
    * ("43,858.00") so a money column has one uniform shape regardless
    * of the stored value's int/float-ness. Presentation only;
    * ratios/scaling stay numeric in the DTO.
    */
  /** Chart egress parity with app/app.py:158-169: the reference
    * reshapes one company-period summary into a two-column frame
    * 項目 (metric label) / 金額 (float amount) — rows 売上高,
    * 営業利益, 経常利益, 純利益 in THAT insertion order (the Altair
    * bar chart renders sort=None) — and casts amounts to float. Here
    * the reshape is a row-local `stack` generator over the summary
    * frame (keyed by company+period so multi-period output stays
    * unambiguous), no shuffle, no state; `Cli summary --format json`
    * emits it as one JSON object per row, the machine-readable series
    * a chart frontend consumes in place of the Streamlit selectbox.
    * Null metrics stay null in JSON (the reference's None → chart gap).
    */
  def chartSeries(summary: DataFrame): DataFrame =
    summary.select(col("company_name"), col("period_name"),
      expr("""stack(4,
        '売上高', CAST(net_sales AS DOUBLE),
        '営業利益', CAST(operating_income AS DOUBLE),
        '経常利益', CAST(ordinary_income AS DOUBLE),
        '純利益', CAST(net_income AS DOUBLE)) AS (`項目`, `金額`)"""))

  def display(summary: DataFrame): DataFrame = {
    val rates = Seq("operation_profit_rate", "ordinary_profit_rate", "net_profit_rate")
    val money = Seq("net_sales", "operating_income", "ordinary_income", "net_income")
    val withRates = rates.foldLeft(summary)((df, c) =>
      df.withColumn(c, coalesce(
        concat(regexp_replace(format_number(col(c), 2), ",", ""), lit("%")),
        lit("N/A"))))
    money.foldLeft(withRates)((df, c) =>
      df.withColumn(c, coalesce(format_number(col(c), 2), lit("N/A"))))
  }
}

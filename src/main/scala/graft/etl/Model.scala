package graft.etl

import org.apache.spark.sql.types._

/** Fixed schemas: the 9-column EDINET XBRL-to-CSV contract and the
  * 4-table warehouse star schema (reference: utils/db_models.py:24-122,
  * sql/ddl.sql:107-256; column contract data_mapper.py:26-37).
  *
  * Schema discipline: explicit StructTypes at every edge — no
  * inference (SURVEY.md §1.3). The raw scan reads everything as
  * StringType (the reference's mixed 値 column) and typed columns are
  * derived in Standardize.
  */
object Model {

  /** Japanese header names of the raw EDINET CSV, in file order. */
  val rawJpColumns: Seq[String] = Seq(
    "要素ID", "項目名", "コンテキストID", "相対年度",
    "連結・個別", "期間・時点", "ユニットID", "単位", "値")

  /** JP → EN rename contract (data_mapper.py:26-37). */
  val renameMap: Map[String, String] = Map(
    "要素ID" -> "element_id",
    "項目名" -> "item_name_jp",
    "コンテキストID" -> "context_id",
    "相対年度" -> "fiscal_year_relative",
    "連結・個別" -> "consolidated_type",
    "期間・時点" -> "period_type",
    "ユニットID" -> "unit_id",
    "単位" -> "unit_name",
    "値" -> "original_value")

  /** Raw scan schema: all strings, JP names. */
  val rawSchema: StructType =
    StructType(rawJpColumns.map(c => StructField(c, StringType, nullable = true)))

  /** Warehouse: companies dimension. Hash surrogate keys replace the
    * reference's Postgres sequences (deterministic + retry-safe).
    */
  val companies: StructType = StructType(Seq(
    StructField("company_id", LongType, nullable = false),
    StructField("edinet_code", StringType, nullable = false),
    StructField("security_code", StringType, nullable = true),
    StructField("industry_code", StringType, nullable = true),
    StructField("company_name", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = true),
    StructField("updated_at", TimestampType, nullable = true)))

  val financialItems: StructType = StructType(Seq(
    StructField("item_id", LongType, nullable = false),
    StructField("element_id", StringType, nullable = false),
    StructField("item_name", StringType, nullable = false),
    StructField("category", StringType, nullable = true),
    StructField("unit_type", StringType, nullable = true),
    StructField("created_at", TimestampType, nullable = true),
    StructField("updated_at", TimestampType, nullable = true)))

  val financialReports: StructType = StructType(Seq(
    StructField("report_id", LongType, nullable = false),
    StructField("company_id", LongType, nullable = false),
    StructField("document_type", StringType, nullable = false),
    StructField("fiscal_year", StringType, nullable = false),
    StructField("quarter_type", StringType, nullable = true),
    StructField("fiscal_year_end", DateType, nullable = false),
    StructField("filing_date", DateType, nullable = true),
    StructField("created_at", TimestampType, nullable = true),
    StructField("updated_at", TimestampType, nullable = true)))

  /** Skinny EAV fact. value is Decimal(20,0) at rest (ddl.sql:228);
    * staging keeps Double for the to_numeric coercion semantics.
    */
  val financialData: StructType = StructType(Seq(
    StructField("data_id", LongType, nullable = false),
    StructField("report_id", LongType, nullable = false),
    StructField("item_id", LongType, nullable = false),
    StructField("duration_type", StringType, nullable = true),
    StructField("context_id", StringType, nullable = true),
    StructField("period_type", StringType, nullable = true),
    StructField("consolidated_type", StringType, nullable = true),
    StructField("value", DecimalType(20, 0), nullable = true),
    StructField("value_text", StringType, nullable = true),
    StructField("is_numeric", BooleanType, nullable = true),
    StructField("created_at", TimestampType, nullable = true),
    StructField("updated_at", TimestampType, nullable = true),
    // denormalized partition key (directory-level pruning at scale)
    StructField("fiscal_year", StringType, nullable = true)))

  /** Extraction mapping (config/config.toml:33-50) — field → element_id.
    * CONFIG-DRIVEN: loaded from graft-mapping.properties (overridable
    * via -Dgraft.mapping.path / GRAFT_MAPPING_PATH without recompiling),
    * matching the reference's config-not-code design. See MappingConfig.
    */
  private lazy val cfg = MappingConfig.default

  lazy val companyMapping: Seq[(String, String)] = cfg.company

  lazy val reportMapping: Seq[(String, String)] = cfg.report

  /** Summary-metric candidate lists, first match wins
    * (financial_service.py:54-75).
    */
  lazy val summaryItems: Seq[(String, Seq[String])] = cfg.summary

  /** Row filter marking financial-item rows (data_mapper.py:174-176). */
  lazy val financialElementPattern: String = cfg.financialElementPattern
}

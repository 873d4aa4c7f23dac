package graft

import org.apache.spark.sql.functions._
import graft.etl.{Ingest, Standardize, Summary}
import graft.sources.{EdinetCsv, Warehouse}

/** End-to-end ingest of the reference's REAL raw EDINET downloads
  * (/root/reference/download: 8 filings, UTF-16LE/tab, ISO dates,
  * ideographic-space cover-page periods) — the input the synthetic
  * fixtures approximated. Guards the two real-data traps the fixtures
  * missed: ISO dates (2023-12-31, not 2023/12/31) and U+3000 after
  * 自/至 in the accounting-period string (Python's \s matches it, Java
  * and RE2's ASCII \s do not).
  */
class RawFilingsSpec extends SparkSpec {

  private val rawDir = "/root/reference/download"

  test("real raw filings: per-file row counts match the reference reader") {
    assume(new java.io.File(rawDir).isDirectory)
    // counts pinned by pandas.read_csv(encoding='utf-16', sep='\t') on
    // the same files — a quoting/encoding mis-parse would drop or merge
    // rows silently under PERMISSIVE mode
    val counts = Standardize(EdinetCsv.readAuto(spark, rawDir))
      .groupBy(col("doc_id")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("S100SPIM") === 365L)
    assert(counts("S100SRF2") === 900L)
    assert(counts("S100SROW") === 368L)
    assert(counts.size === 8)
  }

  test("real raw filings ingest end-to-end: no quarantine, parsed periods and dates") {
    assume(new java.io.File(rawDir).isDirectory)
    val tmp = java.nio.file.Files.createTempDirectory("graft-wh-raw").toString
    val wh = new Warehouse(spark, tmp)
    val staged = Standardize(EdinetCsv.readAuto(spark, rawDir))
    val quarantine = new Ingest(spark, wh).runStaged(staged, strict = false)
    assert(quarantine.count() === 0,
      s"quarantined: ${quarantine.collect().mkString(", ")}")

    val companies = wh.read("companies").collect()
    assert(companies.length === 8)
    val banners = companies.find(_.getAs[String]("edinet_code") == "E00585").get
    assert(banners.getAs[String]("company_name") == "株式会社バナーズ")

    val reports = wh.read("financial_reports").collect()
    assert(reports.length === 8)
    reports.foreach { r =>
      assert(r.getAs[String]("fiscal_year") == "2023", r.toString)
      assert(r.getAs[String]("quarter_type") == "Q3", r.toString)
      assert(r.getAs[java.sql.Date]("fiscal_year_end").toString == "2023-12-31")
      assert(r.getAs[java.sql.Date]("filing_date").toString == "2024-02-09")
    }

    assert(wh.read("financial_data").count() > 0)
    // the flagship read path produces KPIs from the real filings
    val summaries = Summary.summariesTyped(
      wh.read("companies"), wh.read("financial_reports"),
      wh.read("financial_data"), wh.read("financial_items")).collect()
    assert(summaries.length === 8)
    assert(summaries.count(_.net_sales.isDefined) > 0)
  }
}

package graft

import java.nio.file.Files
import graft.etl.{Ingest, Summary}
import graft.sources.Warehouse

/** Full-path integration: a complete filing written as a real UTF-16LE
  * tab-separated file on disk → readAuto → standardize → extract →
  * warehouse → summary KPIs. This is the §3.2 lifecycle end-to-end.
  */
class IngestE2eSpec extends SparkSpec {

  test("two filings on disk → warehouse → per-company KPIs") {
    val csvDir = Files.createTempDirectory("filings").toString
    val whDir = Files.createTempDirectory("wh-e2e").toString
    Filings.write(csvDir, "S100AAAA", "E11111", "アルファ株式会社", 200000000L, 50000000L)
    Filings.write(csvDir, "S100BBBB", "E22222", "ベータ株式会社", 1000000000L, 100000000L)

    val wh = new Warehouse(spark, whDir)
    val quarantine = new Ingest(spark, wh).run(csvDir)
    assert(quarantine.count() === 0)

    val summaries = Summary.allCompanies(
        wh.read("companies"), wh.read("financial_reports"),
        wh.read("financial_data"), wh.read("financial_items"))
      .orderBy("edinet_code").collect()
    assert(summaries.length === 2)
    val alpha = summaries(0)
    assert(alpha.getAs[String]("company_name") === "アルファ株式会社")
    assert(alpha.getAs[String]("period_name") === "2023 Q3")
    assert(math.abs(alpha.getAs[Double]("net_sales") - 200.0) < 1e-9)
    assert(math.abs(alpha.getAs[Double]("operation_profit_rate") - 25.0) < 1e-9)
    val beta = summaries(1)
    assert(math.abs(beta.getAs[Double]("net_sales") - 1000.0) < 1e-9)
    assert(math.abs(beta.getAs[Double]("operation_profit_rate") - 10.0) < 1e-9)
  }
}

package graft

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}
import graft.etl.{Ingest, Summary}
import graft.sources.Warehouse

/** Full-path integration: a complete filing written as a real UTF-16LE
  * tab-separated file on disk → readAuto → standardize → extract →
  * warehouse → summary KPIs. This is the §3.2 lifecycle end-to-end.
  */
class IngestE2eSpec extends SparkSpec {

  private def writeFiling(dir: String, docId: String, edinet: String,
      name: String, netSales: Long, opIncome: Long): Unit = {
    val header = etl.Model.rawJpColumns
    val period = "第10期 第３四半期(自  2023年10月１日  至  2023年12月31日)"
    val rows = Seq(
      Seq("jpdei_cor:EDINETCodeDEI", "EDINETコード", "FilingDateInstant", "提出日時点", "その他", "時点", "－", "", edinet),
      Seq("jpcrp_cor:CompanyNameCoverPage", "会社名", "FilingDateInstant", "提出日時点", "その他", "時点", "－", "", name),
      Seq("jpcrp_cor:DocumentTitleCoverPage", "文書名", "FilingDateInstant", "提出日時点", "その他", "時点", "－", "", "四半期報告書"),
      Seq("jpcrp_cor:QuarterlyAccountingPeriodCoverPage", "四半期会計期間", "FilingDateInstant", "提出日時点", "その他", "時点", "－", "", period),
      Seq("jpdei_cor:CurrentPeriodEndDateDEI", "当会計期間終了日", "FilingDateInstant", "提出日時点", "その他", "時点", "－", "", "2023/12/31"),
      Seq("jpcrp_cor:FilingDateCoverPage", "提出日", "FilingDateInstant", "提出日時点", "その他", "時点", "－", "", "2024/2/9"),
      Seq("jppfs_cor:NetSales", "売上高", "CurrentYTDDuration", "当四半期累計期間", "連結", "期間", "JPY", "円", netSales.toString),
      Seq("jppfs_cor:OperatingIncome", "営業利益", "CurrentYTDDuration", "当四半期累計期間", "連結", "期間", "JPY", "円", opIncome.toString))
    val d = Paths.get(dir, docId, "XBRL_TO_CSV")
    Files.createDirectories(d)
    val content = (header.mkString("\t") +: rows.map(_.mkString("\t"))).mkString("\n")
    val bom = Array[Byte](0xFF.toByte, 0xFE.toByte)
    Files.write(d.resolve(s"jpcrp-$docId.csv"),
      bom ++ content.getBytes(Charset.forName("UTF-16LE")))
  }

  test("two filings on disk → warehouse → per-company KPIs") {
    val csvDir = Files.createTempDirectory("filings").toString
    val whDir = Files.createTempDirectory("wh-e2e").toString
    writeFiling(csvDir, "S100AAAA", "E11111", "アルファ株式会社", 200000000L, 50000000L)
    writeFiling(csvDir, "S100BBBB", "E22222", "ベータ株式会社", 1000000000L, 100000000L)

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

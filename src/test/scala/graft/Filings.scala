package graft

import java.nio.charset.Charset
import java.nio.file.{Files, Paths}

/** Shared test fixture: writes a complete synthetic filing as a real
  * EDINET-layout CSV file (UTF-16LE + BOM + tab, the raw-download
  * variant).
  */
object Filings {
  def write(dir: String, docId: String, edinet: String, name: String,
      netSales: Long, opIncome: Long,
      period: String = "第10期 第３四半期(自  2023年10月１日  至  2023年12月31日)",
      periodEnd: String = "2023/12/31"): Unit = {
    val header = etl.Model.rawJpColumns
    val rows = Seq(
      Seq("jpdei_cor:EDINETCodeDEI", "EDINETコード", "FilingDateInstant", "提出日時点", "その他", "時点", "－", "", edinet),
      Seq("jpcrp_cor:CompanyNameCoverPage", "会社名", "FilingDateInstant", "提出日時点", "その他", "時点", "－", "", name),
      Seq("jpcrp_cor:DocumentTitleCoverPage", "文書名", "FilingDateInstant", "提出日時点", "その他", "時点", "－", "", "四半期報告書"),
      Seq("jpcrp_cor:QuarterlyAccountingPeriodCoverPage", "四半期会計期間", "FilingDateInstant", "提出日時点", "その他", "時点", "－", "", period),
      Seq("jpdei_cor:CurrentPeriodEndDateDEI", "当会計期間終了日", "FilingDateInstant", "提出日時点", "その他", "時点", "－", "", periodEnd),
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
}

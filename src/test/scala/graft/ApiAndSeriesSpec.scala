package graft

import java.nio.file.{Files, Paths}
import graft.etl.{Ingest, Standardize, Summary}
import graft.sources.{EdinetApi, Warehouse}

/** Document-list source (S1/S6/P9/P10) and the time-series read path
  * (J2/W2), plus the streaming-ingest variant.
  */
class ApiAndSeriesSpec extends SparkSpec {

  private def writeLanding(dir: String): Unit = {
    val json = """{
      "metadata": {"title": "提出された書類を把握するためのAPI", "status": "200"},
      "results": [
        {"docID": "S100AAAA", "edinetCode": "E11111", "filerName": "アルファ株式会社",
         "docDescription": "四半期報告書－第10期第3四半期", "submitDateTime": "2024-02-09 09:00", "docTypeCode": "140"},
        {"docID": "S100XXXX", "edinetCode": "E33333", "filerName": "ガンマ株式会社",
         "docDescription": "有価証券報告書－第5期", "submitDateTime": "2024-02-09 10:00", "docTypeCode": "120"},
        {"docID": "S100BBBB", "edinetCode": "E22222", "filerName": "ベータ株式会社",
         "docDescription": "四半期報告書－第3期第2四半期", "submitDateTime": "2024-02-09 11:00", "docTypeCode": "140"}
      ]}"""
    Files.write(Paths.get(dir, "2024-02-09.json"), json.getBytes("UTF-8"))
  }

  test("document list: JSON landing scan + quarterly filter + docID lookup") {
    val dir = Files.createTempDirectory("landing").toString
    writeLanding(dir)
    val docs = EdinetApi.documentList(spark, dir)
    assert(docs.count() === 3)
    val quarterly = EdinetApi.quarterlyReports(docs)
    assert(quarterly.select("docID").collect().map(_.getString(0)).sorted
      === Array("S100AAAA", "S100BBBB"))
    assert(EdinetApi.docIdFor(docs, "ベータ株式会社") === "S100BBBB")
    intercept[NoSuchElementException] {
      EdinetApi.docIdFor(docs, "存在しない会社")
    }
  }

  test("fetcher: LandedFetcher resolves landed files, 404s missing ones") {
    val dir = Files.createTempDirectory("landing2").toString
    writeLanding(dir)
    Files.write(Paths.get(dir, "S100AAAA.zip"), Array[Byte](0x50, 0x4B))
    val fetcher: EdinetApi.Fetcher = new EdinetApi.LandedFetcher(spark, dir)
    // the fetched document-list path feeds the same distributed scan
    val landed = fetcher.fetchDocumentList(java.time.LocalDate.parse("2024-02-09"))
    assert(EdinetApi.documentList(spark, landed).count() === 3)
    assert(fetcher.fetchArchive("S100AAAA").endsWith("S100AAAA.zip"))
    // never-landed = the HTTP 404 analogue, loud
    intercept[java.io.FileNotFoundException] {
      fetcher.fetchDocumentList(java.time.LocalDate.parse("2024-02-10"))
    }
    intercept[java.io.FileNotFoundException] { fetcher.fetchArchive("S100ZZZZ") }
  }

  test("time series: per-company per-item ordered by period end") {
    import org.apache.spark.sql.functions._
    val tmp = Files.createTempDirectory("wh-ts").toString
    val wh = new Warehouse(spark, tmp)
    // two fiscal years of the same company via two filings
    def fixture(period: String, end: String, sales: String) = {
      import spark.implicits._
      Seq(
        ("jpdei_cor:EDINETCodeDEI", "c", "FilingDateInstant", "x", "その他", "時点", "－", "", "E55555"),
        ("jpcrp_cor:CompanyNameCoverPage", "c", "FilingDateInstant", "x", "その他", "時点", "－", "", "テスト社"),
        ("jpcrp_cor:DocumentTitleCoverPage", "c", "FilingDateInstant", "x", "その他", "時点", "－", "", "四半期報告書"),
        ("jpcrp_cor:QuarterlyAccountingPeriodCoverPage", "c", "FilingDateInstant", "x", "その他", "時点", "－", "", period),
        ("jpdei_cor:CurrentPeriodEndDateDEI", "c", "FilingDateInstant", "x", "その他", "時点", "－", "", end),
        ("jpcrp_cor:FilingDateCoverPage", "c", "FilingDateInstant", "x", "その他", "時点", "－", "", "2024/2/9"),
        ("jppfs_cor:NetSales", "売上高", "CurrentYTDDuration", "x", "連結", "期間", "JPY", "円", sales))
        .toDF(graft.etl.Model.rawJpColumns: _*)
    }
    val ing = new Ingest(spark, wh)
    val f1 = fixture("第9期 第３四半期(自 2022年10月1日 至 2022年12月31日)", "2022/12/31", "100")
      .withColumn("doc_id", lit("D1")).withColumn("_rid", monotonically_increasing_id())
    val f2 = fixture("第10期 第３四半期(自 2023年10月1日 至 2023年12月31日)", "2023/12/31", "200")
      .withColumn("doc_id", lit("D2")).withColumn("_rid", monotonically_increasing_id())
    ing.runStaged(Standardize(f1), strict = false)
    ing.runStaged(Standardize(f2), strict = false)

    val series = Summary.timeSeries(
        wh.read("financial_reports"), wh.read("financial_data"),
        wh.read("financial_items"), "jppfs_cor:NetSales")
      .collect()
    assert(series.length === 2)
    assert(series.map(_.getAs[java.sql.Date]("fiscal_year_end").toString).toSeq
      === Seq("2022-12-31", "2023-12-31"))
    assert(series.map(_.getAs[java.math.BigDecimal]("value").longValue()).toSeq
      === Seq(100L, 200L))
  }

  test("streaming ingest: AvailableNow processes landed filings into the warehouse") {
    val csvDir = Files.createTempDirectory("stream-filings").toString
    val whDir = Files.createTempDirectory("wh-stream").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    Filings.write(csvDir, "S100AAAA", "E11111", "アルファ株式会社", 200000000L, 50000000L)
    Filings.write(csvDir, "S100BBBB", "E22222", "ベータ株式会社", 1000000000L, 100000000L)

    val wh = new Warehouse(spark, whDir)
    val q = graft.streaming.StreamingIngest.start(spark, csvDir, wh, ckpt)
    q.awaitTermination(180000)
    assert(wh.read("companies").count() === 2)
    assert(wh.read("financial_reports").count() === 2)
  }
}

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

  test("fetcher: HttpFetcher lands list+zip through the same scan path; retries 5xx; 404s loudly") {
    // in-process stub server — zero egress; the fetcher only ever sees
    // the injected baseUrl
    val zipBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("XBRL_TO_CSV/jpcrp_test.csv"))
      z.write("dummy".getBytes("UTF-8")); z.closeEntry(); z.close()
      bos.toByteArray
    }
    val listJson = {
      val dir = Files.createTempDirectory("stub-src").toString
      writeLanding(dir)
      Files.readAllBytes(Paths.get(dir, "2024-02-09.json"))
    }
    val flakyHits = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: com.sun.net.httpserver.HttpExchange, code: Int,
        body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }
    server.createContext("/api/documents.json",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        if (q.contains("date=2024-02-09") && q.contains("type=2"))
          // first two hits fail 503 — the retry path must absorb them
          (if (flakyHits.incrementAndGet() <= 2) reply(ex, 503, Array.empty)
           else reply(ex, 200, listJson))
        else reply(ex, 404, Array.empty)
      })
    server.createContext("/api/documents/",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        if (ex.getRequestURI.getPath.endsWith("/S100AAAA"))
          reply(ex, 200, zipBytes)
        else reply(ex, 404, Array.empty)
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/api"
      val landing = Files.createTempDirectory("http-landing").toString
      val fetcher: EdinetApi.Fetcher = new EdinetApi.HttpFetcher(
        spark, base, landing, apiKey = Some("test-key"), retryBackoffMs = 10L)

      // 503, 503, 200 — landed through the retry, then the SAME
      // distributed landing scan as LandedFetcher
      val landed = fetcher.fetchDocumentList(java.time.LocalDate.parse("2024-02-09"))
      assert(flakyHits.get() === 3, "two 503s then success = 3 hits")
      assert(EdinetApi.documentList(spark, landed).count() === 3)
      assert(EdinetApi.docIdFor(EdinetApi.documentList(spark, landed),
        "ベータ株式会社") === "S100BBBB")

      // archive: byte-identical landing, member extractable
      val zp = fetcher.fetchArchive("S100AAAA")
      assert(Files.readAllBytes(Paths.get(zp)).toSeq === zipBytes.toSeq)
      val members = graft.sources.ZipExtract.extract(spark, landing)
      assert(members.count() === 1)

      // 404 parity with LandedFetcher, and nothing half-landed
      intercept[java.io.FileNotFoundException] {
        fetcher.fetchDocumentList(java.time.LocalDate.parse("2024-02-10"))
      }
      intercept[java.io.FileNotFoundException] { fetcher.fetchArchive("S100ZZZZ") }
      assert(!Files.exists(Paths.get(s"$landing/2024-02-10.json")))
      assert(!Files.exists(Paths.get(s"$landing/2024-02-10.json._tmp")))
    } finally server.stop(0)
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

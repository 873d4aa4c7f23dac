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

  test("runForDate: API → quarterly filter → ZIP landing → distributed ingest (import-script parity)") {
    // realistic filings zipped the way EDINET serves them
    val src = Files.createTempDirectory("filings-src").toString
    Filings.write(src, "S100AAAA", "E11111", "アルファ株式会社", 200000000L, 50000000L)
    Filings.write(src, "S100BBBB", "E22222", "ベータ株式会社", 1000000000L, 100000000L)
    def zipOf(docId: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      val member = s"XBRL_TO_CSV/jpcrp-$docId.csv"
      z.putNextEntry(new java.util.zip.ZipEntry(member))
      z.write(Files.readAllBytes(java.nio.file.Paths.get(src, docId, "XBRL_TO_CSV", s"jpcrp-$docId.csv")))
      z.closeEntry(); z.close()
      bos.toByteArray
    }
    val zips = Map("S100AAAA" -> zipOf("S100AAAA"), "S100BBBB" -> zipOf("S100BBBB"))
    val listJson = """{
      "metadata": {"title": "t", "status": "200"},
      "results": [
        {"docID": "S100AAAA", "edinetCode": "E11111", "filerName": "アルファ株式会社",
         "docDescription": "四半期報告書－第10期第3四半期", "submitDateTime": "2024-02-09 09:00", "docTypeCode": "140"},
        {"docID": "S100BBBB", "edinetCode": "E22222", "filerName": "ベータ株式会社",
         "docDescription": "四半期報告書－第3期第2四半期", "submitDateTime": "2024-02-09 10:00", "docTypeCode": "140"},
        {"docID": "S100MISS", "edinetCode": "E44444", "filerName": "欠落株式会社",
         "docDescription": "四半期報告書－第2期第1四半期", "submitDateTime": "2024-02-09 11:00", "docTypeCode": "140"},
        {"docID": "S100XXXX", "edinetCode": "E33333", "filerName": "ガンマ株式会社",
         "docDescription": "有価証券報告書－第5期", "submitDateTime": "2024-02-09 12:00", "docTypeCode": "120"}
      ]}""".getBytes("UTF-8")
    val archiveHits = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }
    server.createContext("/api/documents.json",
      (ex: com.sun.net.httpserver.HttpExchange) =>
        if (Option(ex.getRequestURI.getQuery).exists(_.contains("date=2024-02-09")))
          reply(ex, 200, listJson) else reply(ex, 404, Array.empty))
    server.createContext("/api/documents/",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        val id = ex.getRequestURI.getPath.split('/').last
        archiveHits.add(id)
        zips.get(id) match {
          case Some(b) => reply(ex, 200, b)
          case None    => reply(ex, 404, Array.empty)
        }
      })
    server.start()
    try {
      val work = Files.createTempDirectory("e2e-api").toString
      val fetcher = new graft.sources.EdinetApi.HttpFetcher(spark,
        s"http://127.0.0.1:${server.getAddress.getPort}/api",
        s"$work/landing", retryBackoffMs = 10L)
      val wh = new Warehouse(spark, s"$work/wh")
      val (ok, failed, quarantine) = new Ingest(spark, wh)
        .runForDate(fetcher, java.time.LocalDate.parse("2024-02-09"), work)

      assert(ok === Seq("S100AAAA", "S100BBBB"))
      assert(failed === Seq("S100MISS"),
        "a 404'd archive is reported and skipped, never aborts the date")
      assert(!archiveHits.contains("S100XXXX"),
        "non-quarterly filings must never be fetched (P9 filters first)")
      assert(quarantine.count() === 0)

      // the landed filings ingested through the full distributed path
      val summaries = Summary.allCompanies(
          wh.read("companies"), wh.read("financial_reports"),
          wh.read("financial_data"), wh.read("financial_items"))
        .orderBy("edinet_code").collect()
      assert(summaries.length === 2)
      assert(summaries(0).getAs[String]("company_name") === "アルファ株式会社")
      assert(math.abs(summaries(0).getAs[Double]("operation_profit_rate") - 25.0) < 1e-9)
      assert(math.abs(summaries(1).getAs[Double]("net_sales") - 1000.0) < 1e-9)
    } finally server.stop(0)
  }
}
